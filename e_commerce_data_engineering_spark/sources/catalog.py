"""Static product catalog dim (reference PRODUCTS_CATALOG,
ecommerce-order-generator-function.py:17-28) plus small value domains.

In Spark this is a tiny DataFrame and a natural broadcast-join side
(SURVEY §2.1 S7, §2.3 J1). Values mirror the reference verbatim — they
are the data contract, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import CATALOG_SCHEMA

# (product_id, product_name, category, product_group, unit_price)
PRODUCTS = [
    ("ELEC001", "iPhone 15 Pro", "Smartphones", "electronics", 1199.99),
    ("ELEC002", "Samsung Galaxy S24", "Smartphones", "electronics", 999.99),
    ("ELEC003", "MacBook Air M3", "Laptops", "electronics", 1499.99),
    ("ELEC004", "Dell XPS 15", "Laptops", "electronics", 1299.99),
    ("CLOT001", "Nike Air Max Sneakers", "Shoes", "clothing", 129.99),
    ("CLOT002", "Adidas Running Shoes", "Shoes", "clothing", 119.99),
]

CITIES = ["Paris", "Lyon", "Marseille", "Toulouse", "Nice"]  # generator:31
PAYMENT_METHODS = ["credit_card", "paypal", "apple_pay"]  # generator:34
PAYMENT_WEIGHTS = [0.7, 0.2, 0.1]  # generator:87
ORDER_STATUSES = ["pending", "confirmed", "shipped", "delivered", "cancelled"]  # generator:35
STATUS_WEIGHTS = [0.15, 0.4, 0.25, 0.15, 0.05]  # generator:86
EMAIL_DOMAINS = ["gmail.com", "yahoo.fr"]  # generator:45


def catalog_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(PRODUCTS, CATALOG_SCHEMA)
