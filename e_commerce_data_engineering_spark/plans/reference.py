"""Reference-semantics queries: the business rules of
lahda/E-commerce-data-Engineering (SURVEY §2.8 F1–F14, §2.2 P2)
re-applied to the star schema so the DuckDB oracle can check them.

The bit-exact parity against the reference's own ``process_order`` is
tested separately (tests/test_reference_parity.py); here the same
Column builders run at analytics scale. Note these queries use
``F.round`` (HALF_UP, = DuckDB ROUND) because the oracle is DuckDB;
the parity pipeline uses ``F.bround`` (= Python round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scalar
from ..sources.tables import load_table
from .money import dfrac, dmoney, fround, money_sum, sql_fround
from .registry import query


@query(
    "r01_order_value_class",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 1000 THEN 'premium'
                WHEN o_totalprice >= 500  THEN 'high_value'
                WHEN o_totalprice >= 100  THEN 'medium_value'
                ELSE 'low_value' END AS order_value_class,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1
    """,
    doc="Reference F1 (processor:18-26) threshold CASE applied to o_totalprice.",
)
def r01_order_value_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("order_value_class", scalar.classify_order_value(F.col("o_totalprice")))
        .groupBy("order_value_class")
        .agg(F.count("*").alias("n"), money_sum(dmoney("o_totalprice")).alias("revenue"))
    )


@query(
    "r02_customer_segment",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend,
               CAST(COUNT(*) AS BIGINT)                 AS n_orders
        FROM orders GROUP BY o_custkey
    )
    SELECT CASE WHEN n_orders >= 10 OR spend >= 1000 THEN 'vip'
                WHEN spend >= 300 THEN 'regular'
                ELSE 'occasional' END AS customer_segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM per_cust
    GROUP BY 1
    """,
    doc="Reference F2 (processor:29-35): vip/regular/occasional segmentation.",
)
def r02_customer_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(dmoney("o_totalprice")).alias("spend"), F.count("*").alias("n_orders")
    )
    return (
        per_cust.withColumn(
            "customer_segment",
            scalar.classify_customer_segment(F.col("n_orders"), F.col("spend")),
        )
        .groupBy("customer_segment")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "r03_delivery_priority",
    oracle="""
    SELECT CASE WHEN score >= 5 THEN 'urgent'
                WHEN score >= 3 THEN 'normal'
                ELSE 'standard' END AS delivery_priority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT (CASE WHEN o_totalprice >= 250000 THEN 3 ELSE 0 END
              + CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 2 ELSE 0 END
              + CASE WHEN o_orderstatus IN ('O', 'P') THEN 2 ELSE 0 END) AS score
        FROM orders
    ) t
    GROUP BY 1
    """,
    doc="Reference F3 (processor:88-102) additive-score priority, star-schema domains.",
)
def r03_delivery_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    score = (
        F.when(F.col("o_totalprice") >= 250000, 3).otherwise(0)
        + F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 2).otherwise(0)
        + F.when(F.col("o_orderstatus").isin("O", "P"), 2).otherwise(0)
    )
    prio = F.when(score >= 5, "urgent").when(score >= 3, "normal").otherwise("standard")
    return o.select(prio.alias("delivery_priority")).groupBy("delivery_priority").agg(
        F.count("*").alias("n")
    )


@query(
    "r04_validation_split",
    oracle="""
    SELECT valid, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT (o_totalprice > 0 AND o_orderkey IS NOT NULL AND n_items > 0
                AND ABS(line_total - CAST(o_totalprice AS DECIMAL(12,2))) * 2
                    <= CAST(o_totalprice AS DECIMAL(12,2))) AS valid
        FROM (
            SELECT o_orderkey, o_totalprice,
                   CAST(COUNT(l_orderkey) AS BIGINT) AS n_items,
                   COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                                * (1 + CAST(l_tax AS DECIMAL(4,2)))),
                            0) AS line_total
            FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderkey, o_totalprice
        ) agg
    ) v
    GROUP BY valid
    """,
    doc="Reference P2 (processor:105-119): 4-predicate validation split "
    "(positive total, non-null id, non-empty items, subtotal consistency).",
)
def r04_validation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    agg = (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count("l_orderkey").alias("n_items"),
            F.coalesce(
                F.sum(dmoney("l_extendedprice") * (1 - dfrac("l_discount")) * (1 + dfrac("l_tax"))),
                F.lit(0).cast("decimal(12,2)"),
            ).alias("line_total"),
        )
    )
    valid = (
        (F.col("o_totalprice") > 0)
        & F.col("o_orderkey").isNotNull()
        & (F.col("n_items") > 0)
        & (F.abs(F.col("line_total") - dmoney("o_totalprice")) * 2 <= dmoney("o_totalprice"))
    )
    return agg.select(valid.alias("valid")).groupBy("valid").agg(F.count("*").alias("n"))


@query(
    "r05_weekend_orders",
    oracle="""
    SELECT is_weekend_order, order_day_of_week, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT dayofweek(o_orderdate) IN (0, 6) AS is_weekend_order,
               strftime(o_orderdate, '%A')      AS order_day_of_week
        FROM orders
    ) t
    GROUP BY 1, 2
    """,
    doc="Reference F6/F7 (processor:157-158): weekday name + weekend flag; "
    "DuckDB dayofweek is 0=Sun..6=Sat vs Spark 1=Sun..7=Sat.",
)
def r05_weekend_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            scalar.is_weekend(F.col("o_orderdate")).alias("is_weekend_order"),
            scalar.day_name_english(F.col("o_orderdate")).alias("order_day_of_week"),
        )
        .groupBy("is_weekend_order", "order_day_of_week")
        .agg(F.count("*").alias("n"))
    )


@query(
    "r06_discount_pattern",
    oracle=f"""
    SELECT o_orderkey,
           CAST(n_discounted AS INTEGER) AS num_discounted_items,
           (n_discounted > 0)            AS uses_discounts,
           CASE WHEN n_discounted > 0
                THEN {sql_fround("CAST(disc_pct_sum AS DOUBLE) / n_discounted", 2)}
                ELSE 0.0 END             AS avg_discount_percentage,
           CAST(ROUND(savings, 2) AS DOUBLE) AS total_savings
    FROM (
        SELECT o_orderkey,
               CAST(COUNT(CASE WHEN l_discount > 0 THEN 1 END) AS BIGINT) AS n_discounted,
               SUM(CASE WHEN l_discount > 0 THEN CAST(l_discount AS DECIMAL(4,2)) * 100 END) AS disc_pct_sum,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS savings
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderkey
    ) t
    """,
    doc="Reference A4/discount_pattern (processor:70-85): per-order discount stats "
    "with conditional-average zero-guard.",
)
def r06_discount_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    l = load_table(spark, sf_dir, "lineitem")
    agg = (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.count(F.when(F.col("l_discount") > 0, F.lit(1))).alias("n_discounted"),
            F.sum(F.when(F.col("l_discount") > 0, dfrac("l_discount") * 100)).alias("disc_pct_sum"),
            F.sum(dmoney("l_extendedprice") * dfrac("l_discount")).alias("savings"),
        )
    )
    return agg.select(
        "o_orderkey",
        F.col("n_discounted").cast("int").alias("num_discounted_items"),
        (F.col("n_discounted") > 0).alias("uses_discounts"),
        F.when(
            F.col("n_discounted") > 0,
            fround(F.col("disc_pct_sum").cast("double") / F.col("n_discounted"), 2),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_discount_percentage"),
        F.round(F.col("savings"), 2).cast("double").alias("total_savings"),
    )


@query(
    "r07_profit_analysis",
    oracle=f"""
    SELECT o_orderkey,
           CAST(ROUND(cost_d, 2) AS DOUBLE)            AS estimated_cost,
           CAST(ROUND(revenue_d, 2) AS DOUBLE)         AS revenue,
           CAST(ROUND(revenue_d - cost_d, 2) AS DOUBLE) AS profit,
           CASE WHEN revenue_d > 0
                THEN {sql_fround("(CAST(revenue_d AS DOUBLE) - CAST(cost_d AS DOUBLE)) / CAST(revenue_d AS DOUBLE) * 100", 2)}
                ELSE 0.0 END AS margin_percentage
    FROM (
        SELECT o_orderkey,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(0.6 AS DECIMAL(2,1))) AS cost_d,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS revenue_d
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderkey
    ) t
    """,
    doc="Reference A2 profit rollup (processor:38-48): cost=60% of price, "
    "margin with div-0 guard.",
)
def r07_profit_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    l = load_table(spark, sf_dir, "lineitem")
    agg = (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.sum(dmoney("l_extendedprice") * F.lit("0.6").cast("decimal(2,1)")).alias("cost_d"),
            F.sum(dmoney("l_extendedprice") * (1 - dfrac("l_discount"))).alias("revenue_d"),
        )
    )
    return agg.select(
        "o_orderkey",
        F.round(F.col("cost_d"), 2).cast("double").alias("estimated_cost"),
        F.round(F.col("revenue_d"), 2).cast("double").alias("revenue"),
        F.round(F.col("revenue_d") - F.col("cost_d"), 2).cast("double").alias("profit"),
        F.when(
            F.col("revenue_d") > 0,
            fround(
                (F.col("revenue_d").cast("double") - F.col("cost_d").cast("double"))
                / F.col("revenue_d").cast("double")
                * 100,
                2,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("margin_percentage"),
    )
