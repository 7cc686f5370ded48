"""Core analytics query battery over the star schema (SURVEY §2.3–§2.8).

These are the Athena-replacement surface: joins (broadcast/semi/anti/
non-equi), aggregations (plain, distinct, rollup/cube, conditional),
windows (ranking, running frames, lag), sorts/top-k, and set ops — all
built-in DataFrame ops so Catalyst owns the physical strategy.

Scale notes baked into each builder:
* region/nation are fixed-size dims → always `F.broadcast`.
* top-k is `orderBy().limit(k)` → Catalyst rewrites to
  TakeOrderedAndProject (no global sort materialization).
* money aggregates go through exact DECIMAL and portable rounding
  (plans/money.py) so oracle hashes can't flip on float jitter.

Oracle strings are built from the ``sql_*`` twins in plans/money.py so
the Spark and DuckDB sides can't drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.tables import load_table
from .money import (
    dfrac,
    dmoney,
    money_avg,
    money_sum,
    sql_dfrac,
    sql_dmoney,
    sql_money_avg,
    sql_money_sum,
)
from .registry import query

_PRICE = sql_dmoney("l_extendedprice")
_QTY = sql_dmoney("l_quantity")
_DISC = sql_dfrac("l_discount")
_TAX = sql_dfrac("l_tax")
_TOTAL = sql_dmoney("o_totalprice")
_DISC_PRICE = f"{_PRICE} * (1 - {_DISC})"


# --------------------------------------------------------------------------
# Aggregation battery
# --------------------------------------------------------------------------

@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_money_sum(_QTY)}   AS sum_qty,
           {sql_money_sum(_PRICE)} AS sum_base_price,
           {sql_money_sum(_DISC_PRICE)} AS sum_disc_price,
           {sql_money_sum(f"{_DISC_PRICE} * (1 + {_TAX})")} AS sum_charge,
           {sql_money_avg(_QTY)}   AS avg_qty,
           {sql_money_avg(_PRICE)} AS avg_price,
           {sql_money_avg(_DISC)}  AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan-side filter + 8-agg groupBy (SURVEY §2.4 A5).",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = dmoney("l_extendedprice") * (1 - dfrac("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(dmoney("l_quantity")).alias("sum_qty"),
            money_sum(dmoney("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(disc_price * (1 + dfrac("l_tax"))).alias("sum_charge"),
            money_avg(dmoney("l_quantity")).alias("avg_qty"),
            money_avg(dmoney("l_extendedprice")).alias("avg_price"),
            money_avg(dfrac("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q02_filter_project",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND({_DISC_PRICE}, 2) AS DOUBLE) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2001-01-01' AND l_discount > 0.05
    """,
    doc="Projection+filter only — verifies parquet pushdown/pruning (SURVEY §2.2 P1).",
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter((F.col("l_shipdate") >= "2001-01-01") & (F.col("l_discount") > 0.05))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(dmoney("l_extendedprice") * (1 - dfrac("l_discount")), 2)
            .cast("double")
            .alias("net_price"),
        )
    )


@query(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_money_sum(_DISC_PRICE)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join, agg, top-10. Revenue is exact decimal "
    "so the top-10 cutoff is deterministic across engines.",
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o, l = (load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem"))
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < "1998-01-01")
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > "1998-01-01")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(dmoney("l_extendedprice") * (1 - dfrac("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q04_priority_with_returns",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= DATE '1994-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking): correlated EXISTS "
    "against the fact table — Catalyst rewrites it to a left-semi "
    "join, so the subquery costs one shuffle, not one probe per row.",
)
def q04_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= DATE '1994-01-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
          )
        GROUP BY o_orderpriority
        """
    )


@query(
    "q05_region_nation_revenue",
    oracle=f"""
    SELECT n_name,
           {sql_money_sum(_DISC_PRICE)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: 6-way join; fixed-size dims broadcast (SURVEY §2.3).",
)
def q05_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o, l, s, n, r = (
        load_table(spark, sf_dir, t)
        for t in ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1999-01-01"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        # nation/region are constant-size (25/5 rows at every SF) → broadcast.
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(money_sum(dmoney("l_extendedprice") * (1 - dfrac("l_discount"))).alias("revenue"))
    )


@query(
    "q06_mktsegment_revenue",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_money_sum(_TOTAL)}  AS total_revenue,
           {sql_money_avg(_TOTAL)}  AS avg_order_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Flagship (entry()): fact⋈dim join + revenue rollup per segment.",
)
def q06_mktsegment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum(dmoney("o_totalprice")).alias("total_revenue"),
            money_avg(dmoney("o_totalprice")).alias("avg_order_value"),
        )
    )


@query(
    "q07_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Distinct aggregation (expand+two-phase agg in Spark).",
)
def q07_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "q08_rollup",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL')   AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           CAST(COUNT(*) AS BIGINT)         AS n,
           {sql_money_sum(_TOTAL)}          AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="Hierarchical rollup (status → priority) with ALL totals.",
)
def q08_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), money_sum(dmoney("o_totalprice")).alias("revenue"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "revenue",
        )
    )


@query(
    "q09_cube",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(COUNT(*) AS BIGINT)      AS n,
           {sql_money_sum(_QTY)}         AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="Full cube over two dims with ALL totals.",
)
def q09_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), money_sum(dmoney("l_quantity")).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@query(
    "q10_conditional_agg",
    oracle=f"""
    SELECT l_returnflag,
           {sql_money_sum(f"CASE WHEN l_linestatus = 'O' THEN {_QTY} ELSE CAST(0 AS DECIMAL(12,2)) END")} AS qty_open,
           {sql_money_sum(f"CASE WHEN l_linestatus = 'F' THEN {_QTY} ELSE CAST(0 AS DECIMAL(12,2)) END")} AS qty_fulfilled,
           CAST(COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT) AS n_high_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Conditional (pivot-style) aggregation via CASE inside SUM/COUNT.",
)
def q10_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast("decimal(12,2)")
    return l.groupBy("l_returnflag").agg(
        money_sum(
            F.when(F.col("l_linestatus") == "O", dmoney("l_quantity")).otherwise(zero)
        ).alias("qty_open"),
        money_sum(
            F.when(F.col("l_linestatus") == "F", dmoney("l_quantity")).otherwise(zero)
        ).alias("qty_fulfilled"),
        F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("n_high_discount"),
    )


# --------------------------------------------------------------------------
# Joins beyond inner-equi
# --------------------------------------------------------------------------

@query(
    "q11_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
    doc="EXISTS → left_semi join (no fact columns materialized).",
)
def q11_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q12_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
    )
    """,
    doc="NOT EXISTS → left_anti join.",
)
def q12_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    fulfilled = o.filter(F.col("o_orderstatus") == "F")
    return c.join(fulfilled, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q13_outer_join_agg",
    oracle=f"""
    SELECT c_custkey,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(ROUND(COALESCE(SUM({_TOTAL}), 0), 2) AS DOUBLE) AS revenue
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    doc="Left outer join preserving customers with zero orders.",
)
def q13_outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(
                F.coalesce(F.sum(dmoney("o_totalprice")), F.lit(0).cast("decimal(12,2)")), 2
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "q14_range_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_shipped_30d
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate <  o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderpriority
    """,
    doc="Equi+range (non-equi) join: lineitems shipped within 30 days of order.",
)
def q14_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cond = (
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    return o.join(l, cond).groupBy("o_orderpriority").agg(F.count("*").alias("n_shipped_30d"))


# --------------------------------------------------------------------------
# Windows, sorts, top-k
# --------------------------------------------------------------------------

@query(
    "q15_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="Global top-k → TakeOrderedAndProject (no full sort).",
)
def q15_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "q16_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) t
    WHERE rn <= 3
    """,
    doc="Top-3 per customer via ROW_NUMBER window (SURVEY §2.5).",
)
def q16_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q17_window_running",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM({_TOTAL}) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS running_spend,
           CAST(COALESCE(DATE_DIFF('day',
               LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               o_orderdate), -1) AS INTEGER) AS days_since_prev
    FROM orders
    """,
    doc="Running cumulative frame + LAG. Decimal running sum: window "
    "aggregation internals (segment trees vs accumulation) differ "
    "between engines, so double would drift.",
)
def q17_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(dmoney("o_totalprice")).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
            2,
        )
        .cast("double")
        .alias("running_spend"),
        F.coalesce(
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)), F.lit(-1)
        ).alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# Set operations & scalar function surface
# --------------------------------------------------------------------------

@query(
    "q18_set_ops",
    oracle="""
    SELECT 'both_f_and_o' AS op, c FROM (
        SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'O'
    ) a
    UNION ALL
    SELECT 'f_only' AS op, c FROM (
        SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'F'
        EXCEPT
        SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'O'
    ) b
    """,
    doc="INTERSECT / EXCEPT / UNION ALL in one result (SURVEY §2.7).",
)
def q18_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c"))
    o_cust = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c"))
    both = f_cust.intersect(o_cust).select(F.lit("both_f_and_o").alias("op"), "c")
    f_only = f_cust.subtract(o_cust).select(F.lit("f_only").alias("op"), "c")
    return both.unionByName(f_only)


@query(
    "q19_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                         AS name_upper,
           CAST(LENGTH(c_name) AS INTEGER)       AS name_len,
           SUBSTRING(c_name, 1, 8)               AS name_prefix,
           CONCAT(c_mktsegment, ':', c_name)     AS tagged,
           REPLACE(c_name, 'Customer', 'Cust')   AS name_short,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key
    FROM customer
    """,
    doc="String scalar battery: upper/length/substring/concat/replace/lpad (§2.8).",
)
def q19_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
    )


@query(
    "q20_date_funcs",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER)    AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER)   AS order_month,
           CAST(COUNT(*) AS BIGINT)                           AS n,
           {sql_money_sum(_TOTAL)}                            AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
    doc="Date-part extraction + time-grouped aggregation (§2.8 F5–F7).",
)
def q20_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(F.count("*").alias("n"), money_sum(dmoney("o_totalprice")).alias("revenue"))
    )
