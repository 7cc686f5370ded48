"""Explicit StructTypes for the order data model (SURVEY §1.3–1.4).

The reference is schema-on-read (dict literals at
ecommerce-order-generator-function.py:89-107 and
ecommerce-order-processor.py:130-161); we declare the schemas the
reference only implies — the exact TODO its README.md:69 leaves open.

``order_date``/``created_at``/``processed_at`` stay STRING at the I/O
boundary (the reference writes ISO-8601 strings and re-parses on read,
processor:128); the pipeline parses to timestamp internally.
"""

from __future__ import annotations

from pyspark.sql import types as T

# items[] element — generator:58-67
ITEM_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.StringType(), False),
        T.StructField("product_name", T.StringType(), False),
        T.StructField("category", T.StringType(), False),
        T.StructField("quantity", T.IntegerType(), False),
        T.StructField("unit_price", T.DoubleType(), False),
        T.StructField("discount_percentage", T.IntegerType(), False),
        T.StructField("discount_amount", T.DoubleType(), False),
        T.StructField("subtotal", T.DoubleType(), False),
    ]
)

# Raw order — generator:89-107
RAW_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType(), True),
        T.StructField("order_date", T.StringType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("customer_email", T.StringType(), True),
        T.StructField("customer_city", T.StringType(), True),
        T.StructField("items", T.ArrayType(ITEM_SCHEMA), True),
        T.StructField("num_items", T.IntegerType(), True),
        T.StructField("total_quantity", T.IntegerType(), True),
        T.StructField("subtotal", T.DoubleType(), True),
        T.StructField("total_discount", T.DoubleType(), True),
        T.StructField("shipping_cost", T.DoubleType(), True),
        T.StructField("tax_rate", T.DoubleType(), True),
        T.StructField("tax_amount", T.DoubleType(), True),
        T.StructField("total_amount", T.DoubleType(), True),
        T.StructField("payment_method", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("created_at", T.StringType(), True),
    ]
)

# Raw + corrupt-record column for PERMISSIVE JSONL parse (processor:176-182)
RAW_ORDER_SCHEMA_PERMISSIVE = T.StructType(
    list(RAW_ORDER_SCHEMA.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
)

PROFIT_ANALYSIS_SCHEMA = T.StructType(
    [
        T.StructField("estimated_cost", T.DoubleType(), False),
        T.StructField("revenue", T.DoubleType(), False),
        T.StructField("profit", T.DoubleType(), False),
        T.StructField("margin_percentage", T.DoubleType(), False),
    ]
)

DISCOUNT_PATTERN_SCHEMA = T.StructType(
    [
        T.StructField("uses_discounts", T.BooleanType(), False),
        T.StructField("num_discounted_items", T.IntegerType(), False),
        T.StructField("avg_discount_percentage", T.DoubleType(), False),
        T.StructField("total_savings", T.DoubleType(), False),
    ]
)

PRODUCT_MIX_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("count", T.IntegerType(), False),
        T.StructField("quantity", T.IntegerType(), False),
        T.StructField("revenue", T.DoubleType(), False),
    ]
)

# Processed order — processor:130-161 (29 fields; dynamic category keys
# force product_mix to MapType, SURVEY §1.4)
PROCESSED_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType(), True),
        T.StructField("order_date", T.StringType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("customer_email", T.StringType(), True),
        T.StructField("customer_city", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("payment_method", T.StringType(), True),
        T.StructField("items", T.ArrayType(ITEM_SCHEMA), True),
        T.StructField("num_items", T.IntegerType(), True),
        T.StructField("total_quantity", T.IntegerType(), True),
        T.StructField("subtotal", T.DoubleType(), True),
        T.StructField("total_discount", T.DoubleType(), True),
        T.StructField("shipping_cost", T.DoubleType(), True),
        T.StructField("tax_amount", T.DoubleType(), True),
        T.StructField("total_amount", T.DoubleType(), True),
        T.StructField("order_value_class", T.StringType(), True),
        T.StructField("customer_segment", T.StringType(), True),
        T.StructField("delivery_priority", T.StringType(), True),
        T.StructField("profit_analysis", PROFIT_ANALYSIS_SCHEMA, True),
        T.StructField("discount_pattern", DISCOUNT_PATTERN_SCHEMA, True),
        T.StructField("product_mix", T.MapType(T.StringType(), PRODUCT_MIX_VALUE_SCHEMA), True),
        T.StructField("average_item_value", T.DoubleType(), True),
        T.StructField("discount_rate", T.DoubleType(), True),
        T.StructField("tax_rate_applied", T.DoubleType(), True),
        T.StructField("order_hour", T.IntegerType(), True),
        T.StructField("order_day_of_week", T.StringType(), True),
        T.StructField("is_weekend_order", T.BooleanType(), True),
        T.StructField("processed_at", T.StringType(), True),
        T.StructField("processor_version", T.StringType(), True),
    ]
)

# Product catalog dim — generator:17-28
CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.StringType(), False),
        T.StructField("product_name", T.StringType(), False),
        T.StructField("category", T.StringType(), False),
        T.StructField("product_group", T.StringType(), False),
        T.StructField("unit_price", T.DoubleType(), False),
    ]
)
