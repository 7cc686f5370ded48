"""TPC-H decision-support analogs, round-4 widening (q60–q66).

The remaining classic TPC-H shapes not yet covered by q01–q59, adapted
to the driver schema (no l_shipmode/l_commitdate/p_container — each
query notes its stand-in). What matters is the PLAN SHAPE each one
pins: top-k over a 4-way join (Q10), conditional aggregation over a
join (Q12), aggregate-vs-global-max (Q15), NOT-IN anti joins under a
distinct count (Q16), a correlated scalar subquery that Catalyst must
decorrelate to one aggregate + join (Q17), HAVING-IN semi join on a
grouped fact (Q18), and a nested IN chain (Q20).

Money discipline per plans/money.py: revenue aggregates go through
DECIMAL so sums are exact and order-independent on both engines;
quantity sums are integer-valued doubles (exact well below 2^53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.tables import load_table
from .money import dfrac, dmoney, fround, money_sum, sql_fround, sql_money_sum
from .registry import query

_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


@query(
    "q60_returned_item_customers",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_money_sum(_DISC_PRICE)} AS revenue
    FROM customer
    JOIN nation   ON n_nationkey = c_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): customers who "
    "returned the most revenue in a half-year window — a 4-way "
    "fact⋈dim join, decimal-exact revenue rollup, deterministic "
    "top-20 (revenue DESC with key tiebreak → TakeOrderedAndProject, "
    "no global sort). nation rides in as a broadcast dim.",
)
def q60_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, n, o, l = (
        load_table(spark, sf_dir, t) for t in ("customer", "nation", "orders", "lineitem")
    )
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
        )
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money_sum(dmoney("l_extendedprice") * (1 - dfrac("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q61_shipping_delay_priority",
    oracle="""
    SELECT delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
        SELECT o_orderpriority,
               CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'fast'
                    WHEN date_diff('day', o_orderdate, l_shipdate) < 90 THEN 'normal'
                    ELSE 'slow' END AS delay_bucket
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ) t
    GROUP BY delay_bucket
    """,
    doc="TPC-H Q12 shape (shipping modes / order priority): conditional "
    "aggregation over the fact⋈orders join. The schema has no "
    "l_shipmode/l_commitdate, so the mode dimension becomes ship-delay "
    "buckets (days from order to ship) — same plan: one join, one "
    "hash aggregate with two CASE sums, no second scan.",
)
def q61_shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay < 30, "fast").when(delay < 90, "normal").otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(bucket.alias("delay_bucket"), high.alias("_high"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("_high"), 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q62_top_revenue_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_money_sum(_DISC_PRICE)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape (top supplier): quarterly revenue per supplier "
    "(decimal-exact, so the max is unambiguous), then keep the "
    "supplier(s) equal to the global max — the scalar-subquery-"
    "against-own-aggregate pattern; the max joins back as a one-row "
    "broadcast, not a rescan per row.",
)
def q62_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        l.filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            money_sum(dmoney("l_extendedprice") * (1 - dfrac("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        s.join(revenue, s["s_suppkey"] == revenue["supplier_no"])
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q63_supplier_part_relationship",
    oracle="""
    SELECT p_brand, CAST(p_size AS INTEGER) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
      AND p_size <= 25
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship): COUNT DISTINCT "
    "suppliers per (brand, size) with a value NOT-IN filter and a "
    "subquery NOT-IN exclusion (suppliers in deficit standing in for "
    "the spec's complaint list). The NOT IN compiles to a left-anti "
    "join on a non-nullable key — one shuffle, no per-row probing.",
)
def q63_supplier_part_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        l.join(p, p["p_partkey"] == l["l_partkey"])
        .filter(~F.col("p_brand").isin("Brand#1", "Brand#2") & (F.col("p_size") <= 25))
        .join(bad, "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q64_small_quantity_revenue",
    oracle=f"""
    SELECT {sql_fround(f"CAST(SUM({_DISC_PRICE}) AS DOUBLE) / 7.0", 2)} AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#5'
      AND l.l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
    doc="TPC-H Q17 shape (small-quantity-order revenue): a CORRELATED "
    "SCALAR subquery — each line compares against half the average "
    "quantity of ITS part. Catalyst decorrelates it to one aggregate "
    "over lineitem joined back on l_partkey (one shuffle), never a "
    "per-row subquery execution. Quantities are integer-valued "
    "doubles, so the per-part AVG is exact and the threshold compare "
    "cannot flip between engines; revenue is decimal until the final "
    "division.",
)
def q64_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    # SQL keeps the correlated form so the DECORRELATION is what's tested
    df = spark.sql(
        """
        SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS _rev,
               COUNT(*) AS n_lines
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#5'
          AND l.l_quantity < (
              SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = l.l_partkey
          )
        """
    )
    return df.select(
        fround(F.col("_rev").cast("double") / F.lit(7.0), 2).alias("avg_yearly"),
        "n_lines",
    )


@query(
    "q65_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(total_qty AS DOUBLE) AS total_qty
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN (
        SELECT l_orderkey, SUM(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    ) big ON big.l_orderkey = o_orderkey
    """,
    doc="TPC-H Q18 shape (large-volume customers): orders whose total "
    "line quantity clears a threshold — the grouped-HAVING subquery "
    "joins back as a semi-style filter carrying its aggregate. One "
    "aggregation over the fact table, then two dim joins; quantity "
    "sums are integer-valued doubles (exact).",
)
def q65_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(big, big["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


@query(
    "q66_excess_stock_suppliers",
    oracle="""
    SELECT s_suppkey, s_name,
           (FLOOR(CAST(s_acctbal AS DOUBLE) * 100.0 + 0.5) / 100.0) AS s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 80
    )
    """,
    doc="TPC-H Q20 shape (potential part promotion): a nested IN chain "
    "— suppliers who shipped more than a threshold quantity of any "
    "'small'-named part. Both INs compile to left-semi joins (part "
    "filter pushes into the fact scan's build side); the grouped "
    "HAVING runs once, not per supplier.",
)
def q66_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    small_parts = p.filter(F.col("p_name").like("small%")).select(
        F.col("p_partkey").alias("l_partkey")
    )
    heavy = (
        l.join(small_parts, "l_partkey", "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 80)
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    return s.join(heavy, "s_suppkey", "left_semi").select(
        "s_suppkey", "s_name", fround(F.col("s_acctbal").cast("double"), 2).alias("s_acctbal")
    )


# ---------------------------------------------------------------------------
# q67 — market-basket association rules (co-purchase support/lift)
# ---------------------------------------------------------------------------

Q67_MIN_SUP = 3


@query(
    "q67_market_basket",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n_orders AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM items),
    item_cnt AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY p),
    pairs AS (
        SELECT a.p AS part_a, b.p AS part_b, CAST(COUNT(*) AS BIGINT) AS support
        FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING COUNT(*) >= {Q67_MIN_SUP}
    )
    SELECT part_a, part_b, support,
           {sql_fround("CAST(support AS DOUBLE) / ca.c", 6)} AS confidence_a_to_b,
           {sql_fround("CAST(support AS DOUBLE) * n.n / (ca.c * cb.c)", 6)} AS lift
    FROM pairs
    JOIN item_cnt ca ON ca.p = part_a
    JOIN item_cnt cb ON cb.p = part_b
    CROSS JOIN n_orders n
    """,
    doc=f"Market-basket association rules over co-purchased parts: "
    f"pair support (orders containing both), confidence P(b|a), and "
    f"lift support·N/(c_a·c_b), for pairs with support >= "
    f"{Q67_MIN_SUP} — the Apriori/FP-growth first level as plain "
    "relational algebra: one distinct (order, part) frame, a self "
    "equi-join on the order key (pair space = Sum(|basket|²), bounded "
    "by small baskets — the same discipline as g04's projection), and "
    "broadcast item-count/total dims. All measures are exact-integer "
    "ratios, floor-quantized identically on both engines.",
)
def q67_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n_orders = items.agg(F.countDistinct("o").alias("n"))
    item_cnt = items.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    a = items.select("o", F.col("p").alias("part_a"))
    b = items.select(F.col("o").alias("_o2"), F.col("p").alias("part_b"))
    pairs = (
        a.join(b, (a["o"] == b["_o2"]) & (a["part_a"] < b["part_b"]))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= Q67_MIN_SUP)
    )
    ca = item_cnt.select(F.col("p").alias("part_a"), F.col("c").alias("_ca"))
    cb = item_cnt.select(F.col("p").alias("part_b"), F.col("c").alias("_cb"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "support",
            fround(F.col("support").cast("double") / F.col("_ca"), 6).alias(
                "confidence_a_to_b"
            ),
            fround(
                F.col("support").cast("double") * F.col("n")
                / (F.col("_ca") * F.col("_cb")),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# q68 — RFM customer segmentation
# ---------------------------------------------------------------------------


@query(
    "q68_rfm_segments",
    oracle=f"""
    WITH base AS (
        SELECT o_custkey AS custkey,
               CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                              (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
                    AS BIGINT) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
                 AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT *,
               CAST(NTILE(5) OVER (ORDER BY recency_days DESC, custkey) AS BIGINT) AS r,
               CAST(NTILE(5) OVER (ORDER BY frequency, custkey) AS BIGINT) AS f,
               CAST(NTILE(5) OVER (ORDER BY monetary, custkey) AS BIGINT) AS m
        FROM base
    )
    SELECT r, f, m,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {sql_fround("CAST(SUM(CAST(monetary AS DECIMAL(16,2))) AS DOUBLE)", 2)}
             AS segment_revenue,
           CAST(MIN(recency_days) AS BIGINT) AS min_recency,
           CAST(MAX(recency_days) AS BIGINT) AS max_recency
    FROM scored GROUP BY r, f, m
    """,
    doc="RFM segmentation — the production version of the reference's "
    "threshold-based classify_customer_segment (processor:29-35): "
    "recency (days since last order, vs the corpus max date), "
    "frequency (order count), monetary (lifetime spend, exact DECIMAL "
    "sum) per customer, each scored 1-5 by NTILE over a TOTAL order "
    "(custkey tiebreak, so both engines assign identical quintiles), "
    "rolled up to the 125-cell segment grid with exact-decimal segment "
    "revenue. Three window passes over the small per-customer frame — "
    "the orders scan aggregates once; the windows never see raw "
    "orders. NOTE the global NTILE windows single-partition their "
    "input: exact quintiles need a total order. At 100 TB the "
    "equivalent plan computes the four R/F/M cut points once "
    "(percentile/approxQuantile — one aggregate) and buckets by "
    "broadcast comparison, trading exact equal-size quintiles for a "
    "shuffle-free scoring pass; this query keeps the exact form the "
    "oracle can replay.",
)
def q68_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    maxd = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("_maxd"))
    base = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "custkey",
            F.datediff(F.col("_maxd"), F.col("_last")).cast("bigint").alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    # single-partition NTILEs are intentional: exact quintile assignment
    # is a global sort by definition, and the input is one pre-aggregated
    # row per customer (not the fact table). At 100 TB the same segments
    # come from approx_percentile boundaries + a map-side bucket join
    # (the x02/x08 sketch path), trading exact edge ties for no sort.
    r = F.ntile(5).over(W.orderBy(F.col("recency_days").desc(), "custkey"))
    f_ = F.ntile(5).over(W.orderBy("frequency", "custkey"))
    m = F.ntile(5).over(W.orderBy("monetary", "custkey"))
    scored = base.select(
        "custkey",
        "recency_days",
        "monetary",
        r.cast("bigint").alias("r"),
        f_.cast("bigint").alias("f"),
        m.cast("bigint").alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).alias("n_customers"),
        fround(F.sum(F.col("monetary").cast("decimal(16,2)")).cast("double"), 2).alias(
            "segment_revenue"
        ),
        F.min("recency_days").alias("min_recency"),
        F.max("recency_days").alias("max_recency"),
    )


# ---------------------------------------------------------------------------
# q70 — per-column data-profiling summary
# ---------------------------------------------------------------------------

_Q70_COLS = (
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_returnflag",
    "l_linestatus",
)


def _q70_oracle() -> str:
    parts = []
    for c in _Q70_COLS:
        parts.append(
            f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_val,
               CAST(MAX({c}) AS VARCHAR) AS max_val
        FROM lineitem"""
        )
    return " UNION ALL ".join(parts)


@query(
    "q70_column_profile",
    oracle=_q70_oracle(),
    doc="Per-column data-profiling summary over lineitem (row count, "
    "nulls, exact distinct, min/max rendered as strings so numeric "
    "and categorical columns share one schema) — the profiling pass "
    "every ingestion runs before trusting a new feed, and the manual "
    "twin of ANALYZE TABLE's statistics (sources/tables.analyze_"
    "catalog feeds the CBO; this exposes the same facts as a "
    "queryable result). One aggregate per column over a shared scan; "
    "at 100 TB distinct counts switch to x01's approx_count_distinct "
    "— the exact form here is what the oracle can replay.",
)
def q70_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = None
    for c in _Q70_COLS:
        prof = li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_val"),
            F.max(c).cast("string").alias("max_val"),
        ).select(F.lit(c).alias("col_name"), "*")
        out = prof if out is None else out.unionByName(prof)
    return out


_Q71_SALT = 16  # fan-out factor for the hot-key pre-aggregate


@query(
    "q71_salted_skew_agg",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {sql_money_sum(_DISC_PRICE)} AS revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Skew-mitigated aggregation: l_returnflag has 3 values, so a "
    "naive groupBy lands the whole table on 3 reducers; this plan "
    "pre-aggregates on (flag, salt) with salt = pmod(l_orderkey, "
    f"{_Q71_SALT}) — deterministic, so re-runs are stable — then "
    "folds the partials on flag alone. The second shuffle moves "
    f"only 3×{_Q71_SALT} partial rows, so the hot keys fan out "
    "across the cluster while the result is bit-identical to the "
    "direct aggregate (the oracle IS the direct aggregate: DECIMAL "
    "partial sums re-fold exactly). This is the manual form of what "
    "AQE skew handling cannot do for aggregations (AQE splits skewed "
    "JOIN partitions only) — the pattern every 100 TB rollup on a "
    "low-cardinality dimension needs. Plan shape (two "
    "HashAggregate+Exchange pairs, tiny second exchange) is "
    "asserted in tests/test_plan_shapes.py.",
)
def q71_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dmoney("l_extendedprice") * (1 - dfrac("l_discount"))
    partial = li.groupBy(
        "l_returnflag", F.pmod(F.col("l_orderkey"), F.lit(_Q71_SALT)).alias("_salt")
    ).agg(
        F.count(F.lit(1)).alias("p_n"),
        F.sum(disc_price).alias("p_rev"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("p_n").alias("n_rows"),
        F.round(F.sum("p_rev"), 2).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q72 — consecutive-quarter growth streaks (gaps-and-islands over an
# AGGREGATE: the retention/expansion readout a revenue dashboard runs)
# ---------------------------------------------------------------------------

Q72_MIN_STREAK = 2  # at least 2 consecutive quarter-over-quarter rises
Q72_TOP = 50


@query(
    "q72_growth_streaks",
    oracle=f"""
    WITH q AS (
        SELECT o_custkey AS custkey,
               year(o_orderdate) * 4 + (month(o_orderdate) - 1) // 3 AS qi,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
                 AS rev
        FROM orders GROUP BY 1, 2
    ),
    flagged AS (
        SELECT custkey, qi,
               CASE WHEN LAG(qi)  OVER w = qi - 1
                     AND LAG(rev) OVER w < rev THEN 1 ELSE 0 END AS grew
        FROM q
        WINDOW w AS (PARTITION BY custkey ORDER BY qi)
    ),
    grown AS (
        SELECT custkey, qi,
               qi - ROW_NUMBER() OVER (PARTITION BY custkey ORDER BY qi) AS isl
        FROM flagged WHERE grew = 1
    ),
    streaks AS (
        SELECT custkey, CAST(COUNT(*) AS BIGINT) AS len,
               CAST(MIN(qi) - 1 AS BIGINT) AS start_qi
        FROM grown GROUP BY custkey, isl
    ),
    best AS (
        SELECT custkey,
               CAST(MAX(len) AS BIGINT) AS max_streak,
               CAST(COUNT(*) AS BIGINT) AS n_streaks
        FROM streaks WHERE len >= {Q72_MIN_STREAK}
        GROUP BY custkey
    )
    SELECT custkey, max_streak, n_streaks
    FROM best
    ORDER BY max_streak DESC, custkey
    LIMIT {Q72_TOP}
    """,
    doc="Consecutive-quarter revenue-growth streaks per customer: "
    "quarterly DECIMAL-exact revenue, a rise flag that requires the "
    "IMMEDIATELY previous quarter (gap quarters break the streak by "
    "construction — the qi-1 check), and gaps-and-islands over the "
    "rise flags to recover maximal streaks; customers ranked by their "
    f"longest streak (>= {Q72_MIN_STREAK} rises), top {Q72_TOP}. The "
    "windows run per customer over QUARTER-aggregated rows (a handful "
    "per customer), so partition sizes are bounded at any order "
    "volume — the gaps-and-islands-on-aggregate shape q44 pins on raw "
    "days, lifted to the growth-streak readout.",
)
def q72_growth_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    q = orders.groupBy(
        F.col("o_custkey").alias("custkey"),
        (
            F.year("o_orderdate") * 4 + F.expr("(month(o_orderdate) - 1) DIV 3")
        ).alias("qi"),
    ).agg(F.round(F.sum(dmoney("o_totalprice")), 2).cast("double").alias("rev"))
    w = W.partitionBy("custkey").orderBy("qi")
    flagged = q.select(
        "custkey",
        "qi",
        F.when(
            (F.lag("qi").over(w) == F.col("qi") - 1)
            & (F.lag("rev").over(w) < F.col("rev")),
            1,
        )
        .otherwise(0)
        .alias("grew"),
    )
    grown = flagged.filter(F.col("grew") == 1).select(
        "custkey", "qi", (F.col("qi") - F.row_number().over(w)).alias("isl")
    )
    streaks = grown.groupBy("custkey", "isl").agg(
        F.count(F.lit(1)).cast("bigint").alias("len"),
        (F.min("qi") - 1).cast("bigint").alias("start_qi"),
    )
    best = (
        streaks.filter(F.col("len") >= Q72_MIN_STREAK)
        .groupBy("custkey")
        .agg(
            F.max("len").cast("bigint").alias("max_streak"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        )
    )
    return best.orderBy(F.col("max_streak").desc(), "custkey").limit(Q72_TOP)


# ---------------------------------------------------------------------------
# q73 — Benford's-law first-digit audit over order totals: the classic
# financial-forensics screen (fabricated amounts rarely follow the
# log distribution organic transaction data does)
# ---------------------------------------------------------------------------


@query(
    "q73_benford_audit",
    oracle=f"""
    WITH d AS (
        SELECT CAST(SUBSTRING(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
        FROM orders WHERE o_totalprice > 0
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM d)
    SELECT digit,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_fround("CAST(COUNT(*) AS DOUBLE) / (SELECT n_all FROM tot)", 6)}
             AS obs_freq,
           {sql_fround("ln(1.0 + 1.0 / digit) / ln(10.0)", 6)} AS benford_freq,
           {sql_fround(
               "POWER(CAST(COUNT(*) AS DOUBLE) / (SELECT n_all FROM tot)"
               " - ln(1.0 + 1.0 / digit) / ln(10.0), 2)"
               " / (ln(1.0 + 1.0 / digit) / ln(10.0))", 6)} AS chi2_term
    FROM d GROUP BY digit
    """,
    doc="Benford's-law first-digit audit of order totals — the "
    "financial-forensics screen: organic transaction amounts follow "
    "P(d) = log10(1 + 1/d), fabricated ones rarely do, and a large "
    "per-digit chi-square term localizes the anomaly. The first "
    "significant digit comes from the EXACT cents integer rendered as "
    "a string (no log10-of-a-double floor, whose last-ulp behavior "
    "near powers of ten could differ between engines); the expected "
    "frequencies are one ln ratio per digit, identical IEEE on both "
    "sides under 6-dp rounding. One narrow projection + one 9-group "
    "aggregate — the audit costs a single scan at any order volume.",
)
def q73_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    d = orders.filter(F.col("o_totalprice") > 0).select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_all"))
    benford = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0))
    obs = F.col("n").cast("double") / F.col("n_all")
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            fround(obs, 6).alias("obs_freq"),
            fround(benford, 6).alias("benford_freq"),
            fround(F.pow(obs - benford, F.lit(2.0)) / benford, 6).alias("chi2_term"),
        )
    )


# ---------------------------------------------------------------------------
# q74–q77 — robust/statistical decision-support widening (round 6)
# ---------------------------------------------------------------------------

_Q74_X = "CAST(l_quantity AS DECIMAL(12,2))"
_Q74_Y = "CAST(l_extendedprice AS DECIMAL(12,2))"


@query(
    "q74_rolling_corr",
    oracle=f"""
    WITH m AS (
        SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS month,
               CAST(COUNT(*) AS BIGINT)       AS n,
               SUM({_Q74_X})                  AS sx,
               SUM({_Q74_Y})                  AS sy,
               SUM({_Q74_X} * {_Q74_Y})       AS sxy,
               SUM({_Q74_X} * {_Q74_X})       AS sxx,
               SUM({_Q74_Y} * {_Q74_Y})       AS syy
        FROM lineitem GROUP BY 1
    ),
    r AS (
        SELECT month,
               SUM(n)   OVER w3 AS rn,
               CAST(SUM(sx)  OVER w3 AS DOUBLE) AS rsx,
               CAST(SUM(sy)  OVER w3 AS DOUBLE) AS rsy,
               CAST(SUM(sxy) OVER w3 AS DOUBLE) AS rsxy,
               CAST(SUM(sxx) OVER w3 AS DOUBLE) AS rsxx,
               CAST(SUM(syy) OVER w3 AS DOUBLE) AS rsyy
        FROM m
        WINDOW w3 AS (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    )
    SELECT month, CAST(rn AS BIGINT) AS n_3m,
           {sql_fround("(rn * rsxy - rsx * rsy)"
                       " / sqrt((rn * rsxx - rsx * rsx) * (rn * rsyy - rsy * rsy))", 6)}
             AS corr_3m
    FROM r
    """,
    doc="Rolling 3-month Pearson correlation between quantity and "
    "extended price — the co-movement monitor behind demand/price-mix "
    "drift alerts. Component-sum formulation: each month reduces to "
    "exact DECIMAL moment sums (n, Σx, Σy, Σxy, Σx², Σy² — products "
    "of 2-dp money are 4-dp-exact decimals, so the sums are "
    "order-independent and both engines agree bit-for-bit), and the "
    "3-month window then SUMS those six numbers instead of re-scanning "
    "rows — the standard streaming-moments trick, O(1) state per "
    "month. The ORDER BY month window is intentionally unpartitioned: "
    "its input is one row per calendar month (83 at sf0.01), bounded "
    "by the calendar, never by data volume.",
)
def q74_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    m = li.groupBy(
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    # bounded frame: one row per calendar month (see docstring)
    w3 = W.orderBy("month").rowsBetween(-2, 0)
    r = m.select(
        "month",
        F.sum("n").over(w3).alias("rn"),
        F.sum("sx").over(w3).cast("double").alias("rsx"),
        F.sum("sy").over(w3).cast("double").alias("rsy"),
        F.sum("sxy").over(w3).cast("double").alias("rsxy"),
        F.sum("sxx").over(w3).cast("double").alias("rsxx"),
        F.sum("syy").over(w3).cast("double").alias("rsyy"),
    )
    rn = F.col("rn").cast("double")
    cov = rn * F.col("rsxy") - F.col("rsx") * F.col("rsy")
    vx = rn * F.col("rsxx") - F.col("rsx") * F.col("rsx")
    vy = rn * F.col("rsyy") - F.col("rsy") * F.col("rsy")
    return r.select(
        "month",
        F.col("rn").cast("bigint").alias("n_3m"),
        fround(cov / F.sqrt(vx * vy), 6).alias("corr_3m"),
    )


@query(
    "q75_mad_outlier_days",
    oracle=f"""
    WITH d AS (
        SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
               CAST({sql_money_sum("o_totalprice")} AS DOUBLE) AS revenue
        FROM orders GROUP BY 1
    ),
    med AS (SELECT quantile_cont(revenue, 0.5) AS med FROM d),
    mad AS (
        SELECT quantile_cont(abs(revenue - med), 0.5) AS mad FROM d, med
    )
    SELECT day, {sql_fround("revenue", 2)} AS revenue,
           {sql_fround("0.6745 * (revenue - med) / mad", 4)} AS robust_z
    FROM d, med, mad
    ORDER BY abs(0.6745 * (revenue - med) / mad) DESC, day
    LIMIT 10
    """,
    doc="Median/MAD robust outlier screen over daily order revenue: "
    "robust z = 0.6745·(x − median)/MAD flags anomalous days without "
    "the masking a mean/stddev z-score suffers when the outliers "
    "themselves inflate sigma. Two chained scalar aggregates (median, "
    "then median absolute deviation around it) broadcast back over "
    "the day grid — the day frame is calendar-bounded (~2.4k rows at "
    "sf0.01), so the exact interpolated percentile is a single "
    "reduce; at 100 TB the per-day pre-aggregation is the only "
    "data-sized shuffle. Top-10 by |z| with day tiebreak.",
)
def q75_mad_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("day")
    ).agg(
        money_sum(F.col("o_totalprice")).cast("double").alias("revenue")
    )
    med = d.agg(F.expr("percentile(revenue, 0.5)").alias("med"))
    d_med = d.crossJoin(F.broadcast(med))
    mad = d_med.agg(
        F.expr("percentile(abs(revenue - med), 0.5)").alias("mad")
    )
    z = 0.6745 * (F.col("revenue") - F.col("med")) / F.col("mad")
    # order on the UNROUNDED z (matching the oracle's ORDER BY) so the
    # top-10 boundary can't flip on values that differ below 4 dp
    return (
        d_med.crossJoin(F.broadcast(mad))
        .select("day", F.col("revenue"), z.alias("_z"))
        .orderBy(F.abs(F.col("_z")).desc(), "day")
        .limit(10)
        .select(
            "day",
            fround(F.col("revenue"), 2).alias("revenue"),
            fround(F.col("_z"), 4).alias("robust_z"),
        )
    )


_Q76_FENCES = tuple(i / 10.0 for i in range(1, 10))


@query(
    "q76_revenue_deciles",
    oracle=f"""
    WITH c AS (
        SELECT o_custkey,
               CAST({sql_money_sum("o_totalprice")} AS DOUBLE) AS rev
        FROM orders GROUP BY 1
    ),
    f AS (
        SELECT {", ".join(f"quantile_cont(rev, {q}) AS f{i}" for i, q in enumerate(_Q76_FENCES, 1))}
        FROM c
    ),
    a AS (
        SELECT CAST(1 {"".join(f" + CASE WHEN rev > f{i} THEN 1 ELSE 0 END" for i in range(1, 10))}
               AS INTEGER) AS decile,
               rev
        FROM c, f
    ),
    g AS (
        SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
               SUM(rev) AS rev_sum
        FROM a GROUP BY decile
    ),
    t AS (SELECT SUM(rev_sum) AS total FROM g)
    SELECT decile, n_customers,
           {sql_fround("rev_sum / total", 6)} AS revenue_share,
           {sql_fround("SUM(rev_sum) OVER (ORDER BY decile DESC"
                       " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / total", 6)}
             AS top_cum_share
    FROM g, t
    """,
    doc="Lorenz/Pareto revenue-concentration profile WITHOUT a global "
    "sort: per-customer revenue reduces once, nine interpolated decile "
    "fences come from a single percentile aggregate (one scalar row, "
    "broadcast), and each customer lands in a decile by comparing "
    "against the broadcast fences map-side — the scale-safe "
    "alternative to ntile()/row_number cumsums, which would move "
    "every customer through one partition. The final cumulative-share "
    "window runs over exactly 10 rows (intentionally unpartitioned — "
    "decile grid, not data). top_cum_share reads as 'the top k "
    "deciles hold this fraction of revenue'. Fence sums are "
    "money-exact before the double cast, so both engines assign "
    "identical deciles.",
)
def q76_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        money_sum(F.col("o_totalprice")).cast("double").alias("rev")
    )
    fences = c.agg(
        *[
            F.expr(f"percentile(rev, {q})").alias(f"f{i}")
            for i, q in enumerate(_Q76_FENCES, 1)
        ]
    )
    decile = F.lit(1)
    for i in range(1, 10):
        decile = decile + F.when(F.col("rev") > F.col(f"f{i}"), 1).otherwise(0)
    a = c.crossJoin(F.broadcast(fences)).select(
        decile.cast("int").alias("decile"), "rev"
    )
    g = a.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("rev").alias("rev_sum"),
    )
    t = g.agg(F.sum("rev_sum").alias("total"))
    # bounded frame: exactly 10 decile rows (see docstring)
    w = W.orderBy(F.col("decile").desc()).rowsBetween(W.unboundedPreceding, 0)
    return g.crossJoin(F.broadcast(t)).select(
        "decile",
        "n_customers",
        fround(F.col("rev_sum") / F.col("total"), 6).alias("revenue_share"),
        fround(F.sum("rev_sum").over(w) / F.col("total"), 6).alias("top_cum_share"),
    )


@query(
    "q77_theil_sen_trend",
    oracle=f"""
    WITH m AS (
        SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS midx,
               CAST({sql_money_sum(_DISC_PRICE)} AS DOUBLE) AS rev
        FROM lineitem GROUP BY 1
    ),
    slopes AS (
        SELECT (b.rev - a.rev) / (b.midx - a.midx) AS slope
        FROM m a JOIN m b ON b.midx > a.midx
    ),
    ts AS (SELECT quantile_cont(slope, 0.5) AS ts_slope,
                  CAST(COUNT(*) AS BIGINT) AS n_pairs
           FROM slopes),
    ols AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
               (COUNT(*) * SUM(CAST(midx AS DOUBLE) * rev)
                - SUM(CAST(midx AS DOUBLE)) * SUM(rev))
               / (COUNT(*) * SUM(CAST(midx AS DOUBLE) * CAST(midx AS DOUBLE))
                  - SUM(CAST(midx AS DOUBLE)) * SUM(CAST(midx AS DOUBLE)))
                 AS ols_slope
        FROM m
    )
    SELECT n_months, n_pairs,
           {sql_fround("ts_slope", 4)} AS theil_sen_slope,
           {sql_fround("ols_slope", 4)} AS ols_slope
    FROM ts, ols
    """,
    doc="Theil–Sen robust trend of monthly discounted revenue — the "
    "median of all pairwise month-to-month slopes, immune to up to "
    "~29% outlier months where the OLS slope (emitted alongside for "
    "contrast) is not. The pairwise self-join runs on the MONTHLY "
    "aggregate, never the fact table: the pair space is "
    "calendar-bounded (83 months → 3.4k pairs at any data volume), so "
    "the only data-sized work is the per-month rollup. Monthly "
    "revenue is money-exact (DECIMAL sums) before the double cast; "
    "the month index is year*12+month, making slope units "
    "revenue-per-month. OLS comes from the same exact moment sums as "
    "q74.",
)
def q77_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dmoney("l_extendedprice") * (1 - dfrac("l_discount"))
    m = li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("bigint")
        .alias("midx")
    ).agg(money_sum(disc_price).cast("double").alias("rev"))
    a = m.select(F.col("midx").alias("ia"), F.col("rev").alias("ra"))
    b = m.select(F.col("midx").alias("ib"), F.col("rev").alias("rb"))
    slopes = (
        a.join(F.broadcast(b), F.col("ib") > F.col("ia"))
        .select(((F.col("rb") - F.col("ra")) / (F.col("ib") - F.col("ia"))).alias("slope"))
    )
    ts = slopes.agg(
        F.expr("percentile(slope, 0.5)").alias("ts_slope"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    midx_d = F.col("midx").cast("double")
    n = F.count(F.lit(1))
    ols = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        (
            (n * F.sum(midx_d * F.col("rev")) - F.sum(midx_d) * F.sum("rev"))
            / (n * F.sum(midx_d * midx_d) - F.sum(midx_d) * F.sum(midx_d))
        ).alias("ols_slope"),
    )
    return (
        ts.crossJoin(F.broadcast(ols))
        .select(
            "n_months",
            "n_pairs",
            fround(F.col("ts_slope"), 4).alias("theil_sen_slope"),
            fround(F.col("ols_slope"), 4).alias("ols_slope"),
        )
    )


# ---------------------------------------------------------------------------
# q78 — small-file compaction planner (round 7; layout/ops family, q71 kin)
# ---------------------------------------------------------------------------

_Q78_TARGET = 200_000  # target bin size in bytes — the compaction unit


@query(
    "q78_compaction_bins",
    oracle=f"""
    WITH seg AS (
        SELECT strftime(l_shipdate, '%Y-%m') AS segment,
               CAST(SUM(48 + length(CAST(l_orderkey AS VARCHAR))
                        + length(CAST(l_partkey AS VARCHAR))) AS BIGINT)
                   AS seg_bytes
        FROM lineitem GROUP BY 1
    ),
    planned AS (
        SELECT segment, seg_bytes,
               CAST(FLOOR(
                   CAST(COALESCE(SUM(seg_bytes) OVER (
                       ORDER BY seg_bytes DESC, segment
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS DOUBLE) / {_Q78_TARGET}
               ) AS BIGINT) AS bin_id
        FROM seg
    )
    SELECT bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(seg_bytes) AS BIGINT) AS bin_bytes,
           MIN(segment) AS first_segment,
           {sql_fround(f"CAST(SUM(seg_bytes) AS DOUBLE) / {_Q78_TARGET}", 4)}
               AS fill_ratio
    FROM planned GROUP BY bin_id
    """,
    doc="Small-file compaction planner — the maintenance pass every "
    "parquet lake schedules (Delta OPTIMIZE / Iceberg rewrite_data_"
    "files semantics, planned as a query): per ship-month segment "
    "sizes (integer-exact byte estimate) are packed into target-sized "
    "compaction bins by the sequential-fill rule bin = "
    "floor(preceding_cumulative_bytes / target) over the size-DESC "
    "walk — the streaming variant of next-fit-decreasing, one window "
    "over the SEGMENT list (not the fact table), deterministic via "
    "the (bytes DESC, segment) total order. Output is the work order: "
    "segments and bytes per bin with fill ratio. Scale: the only "
    "data-sized work is the per-segment byte rollup (partial-agg "
    "shuffle); the planning window runs on one row per segment — "
    "file-manifest-sized, like q71's two-stage rollup, and at a "
    "million files it windows WITHIN a partition grid (table/day) "
    "exactly as the real planners do.",
)
def q78_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    seg = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("segment")
    ).agg(
        F.sum(
            F.lit(48)
            + F.length(F.col("l_orderkey").cast("string"))
            + F.length(F.col("l_partkey").cast("string"))
        )
        .cast("bigint")
        .alias("seg_bytes")
    )
    # window over the segment MANIFEST (82 rows at sf0.01), not facts —
    # the single partition is the point: planning is driver-scale work
    w = (
        W.orderBy(F.col("seg_bytes").desc(), "segment")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    planned = seg.select(
        "segment",
        "seg_bytes",
        F.floor(
            F.coalesce(F.sum("seg_bytes").over(w), F.lit(0)).cast("double")
            / _Q78_TARGET
        )
        .cast("bigint")
        .alias("bin_id"),
    )
    return planned.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum("seg_bytes").cast("bigint").alias("bin_bytes"),
        F.min("segment").alias("first_segment"),
        fround(F.sum("seg_bytes").cast("double") / _Q78_TARGET, 4).alias("fill_ratio"),
    )


# ---------------------------------------------------------------------------
# q79 — seasonal-naive forecast backtest (round 7; q74/q77 family)
# ---------------------------------------------------------------------------

_Q79_Q = "1000000000.0"  # 1e-9 quantization of per-month APE terms


@query(
    "q79_forecast_backtest",
    oracle=f"""
    WITH m AS (
        SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS midx,
               CAST({sql_money_sum(_DISC_PRICE)} AS DOUBLE) AS rev
        FROM lineitem GROUP BY 1
    ),
    bt AS (
        SELECT cur.midx, cur.rev, s.rev AS rev12, p.rev AS rev1
        FROM m cur
        JOIN m s ON s.midx = cur.midx - 12
        JOIN m p ON p.midx = cur.midx - 1
    ),
    terms AS (
        SELECT
            CAST(FLOOR(abs(rev - rev12) / rev * {_Q79_Q} + 0.5) AS BIGINT) AS qs,
            CAST(FLOOR(abs(rev - rev1) / rev * {_Q79_Q} + 0.5) AS BIGINT) AS q1,
            CAST(FLOOR(abs(rev - rev12) * 100 + 0.5) AS BIGINT) AS es,
            CAST(FLOOR(abs(rev - rev1) * 100 + 0.5) AS BIGINT) AS e1
        FROM bt
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_backtest_months,
           {sql_fround(f"CAST(SUM(qs) AS DOUBLE) / {_Q79_Q} / COUNT(*)", 6)}
               AS mape_seasonal,
           {sql_fround(f"CAST(SUM(q1) AS DOUBLE) / {_Q79_Q} / COUNT(*)", 6)}
               AS mape_naive,
           {sql_fround("CAST(SUM(es) AS DOUBLE) / SUM(e1)", 6)} AS mase
    FROM terms
    """,
    doc="Walk-forward forecast backtest over monthly discounted "
    "revenue: the seasonal-naive model ŷ(m) = y(m−12) scored against "
    "the naive-1 drift model ŷ(m) = y(m−1) on every month that has "
    "both references — MAPE for each and the MASE-style ratio "
    "(seasonal MAE / naive MAE; < 1 means seasonality carries real "
    "signal), the Hyndman & Koehler 2006 scale-free comparison that "
    "decides whether a seasonal model earns its keep BEFORE anything "
    "fancier ships. Lag references are exact midx−12/midx−1 "
    "equi-joins (gap-safe, unlike positional LAG), monthly revenue is "
    "the DECIMAL-exact 2dp sum, APE terms are 1e-9-BIGINT-quantized "
    "and absolute errors 1e-2-quantized before summing, so every "
    "reported number is engine-identical. Scale: one fact-table "
    "partial-agg shuffle; the backtest runs on the ~83-row month "
    "manifest, broadcast.",
)
def q79_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dmoney("l_extendedprice") * (1 - dfrac("l_discount"))
    m = li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("bigint")
        .alias("midx")
    ).agg(money_sum(disc_price).cast("double").alias("rev"))
    s = m.select((F.col("midx") + 12).alias("midx"), F.col("rev").alias("rev12"))
    p = m.select((F.col("midx") + 1).alias("midx"), F.col("rev").alias("rev1"))
    bt = m.join(F.broadcast(s), "midx").join(F.broadcast(p), "midx")
    q9 = float(_Q79_Q)
    qs = F.floor(F.abs(F.col("rev") - F.col("rev12")) / F.col("rev") * q9 + 0.5).cast(
        "bigint"
    )
    q1 = F.floor(F.abs(F.col("rev") - F.col("rev1")) / F.col("rev") * q9 + 0.5).cast(
        "bigint"
    )
    es = F.floor(F.abs(F.col("rev") - F.col("rev12")) * 100 + 0.5).cast("bigint")
    e1 = F.floor(F.abs(F.col("rev") - F.col("rev1")) * 100 + 0.5).cast("bigint")
    return bt.select(
        qs.alias("qs"), q1.alias("q1"), es.alias("es"), e1.alias("e1")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_backtest_months"),
        fround(F.sum("qs").cast("double") / q9 / F.count(F.lit(1)), 6).alias(
            "mape_seasonal"
        ),
        fround(F.sum("q1").cast("double") / q9 / F.count(F.lit(1)), 6).alias(
            "mape_naive"
        ),
        fround(F.sum("es").cast("double") / F.sum("e1"), 6).alias("mase"),
    )


# ---------------------------------------------------------------------------
# q80 — Wilson lower-bound supplier return-rate ranking (round 7)
# ---------------------------------------------------------------------------

_Q80_Z = "1.96"       # 95% two-sided normal quantile, shared literal
_Q80_Z2 = "3.8416"    # z^2 as an exact shared literal (1.96*1.96)
_Q80_TOPK = 25


@query(
    "q80_wilson_return_rate",
    oracle=f"""
    WITH s AS (
        SELECT l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_returned
        FROM lineitem GROUP BY l_suppkey
    ),
    w AS (
        SELECT l_suppkey, n_items, n_returned,
               CAST(n_returned AS DOUBLE) / n_items AS phat
        FROM s
    ),
    lcb AS (
        SELECT l_suppkey, n_items, n_returned, phat,
               ((phat + {_Q80_Z2} / (2 * n_items))
                - {_Q80_Z} * sqrt((phat * (1 - phat)
                                   + {_Q80_Z2} / (4 * n_items)) / n_items))
               / (1 + {_Q80_Z2} / n_items) AS wilson
        FROM w
    )
    SELECT lcb.l_suppkey AS suppkey, s_name, n_items, n_returned,
           {sql_fround("phat", 6)} AS return_rate,
           {sql_fround("wilson", 6)} AS wilson_lcb
    FROM lcb JOIN supplier ON s_suppkey = lcb.l_suppkey
    ORDER BY wilson DESC, suppkey LIMIT {_Q80_TOPK}
    """,
    doc="Confidently-high return-rate suppliers: rank by the WILSON "
    "score lower confidence bound (z=1.96) of the per-supplier "
    "returned-lineitem proportion, not the raw rate — the standard "
    "fix (Agresti & Coull 1998 framing; the 'how not to sort by "
    "average rating' correction) for small-n suppliers whose 2/3 "
    "returned lines would otherwise top the list. p-hat is an exact "
    "integer ratio, z and z-squared are shared decimal literals, and "
    "the bound is one identically-parenthesized expression over "
    "exact-integer-derived doubles (sqrt is IEEE-correctly-rounded in "
    "both engines), so the ranking and the 6dp-rounded bounds are "
    "engine-identical. Scale: one fact-table partial-agg shuffle to "
    "supplier grain, broadcast join to the supplier dim for names, "
    "TakeOrdered for the cut.",
)
def q80_wilson_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    s = li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("n_returned"),
    )
    z, z2 = float(_Q80_Z), float(_Q80_Z2)
    n = F.col("n_items")
    phat = F.col("n_returned").cast("double") / n
    wilson = (
        (phat + z2 / (2 * n))
        - z * F.sqrt((phat * (1 - phat) + z2 / (4 * n)) / n)
    ) / (1 + z2 / n)
    return (
        s.select(
            F.col("l_suppkey").alias("suppkey"),
            "n_items",
            "n_returned",
            phat.alias("_phat"),
            wilson.alias("_wilson"),
        )
        .join(
            F.broadcast(sup), F.col("suppkey") == F.col("s_suppkey")
        )
        .orderBy(F.col("_wilson").desc(), "suppkey")
        .limit(_Q80_TOPK)
        .select(
            "suppkey",
            "s_name",
            "n_items",
            "n_returned",
            fround(F.col("_phat"), 6).alias("return_rate"),
            fround(F.col("_wilson"), 6).alias("wilson_lcb"),
        )
    )


# ---------------------------------------------------------------------------
# q81 — two-regressor OLS price model via exact moments (round 7)
# ---------------------------------------------------------------------------


@query(
    "q81_ols_price_model",
    oracle="""
    WITH t AS (
        SELECT CAST(l_quantity AS BIGINT) AS x1,
               CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS x2,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x1) AS BIGINT) AS s1,
               CAST(SUM(x2) AS BIGINT) AS s2,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x1 * x1) AS BIGINT) AS s11,
               CAST(SUM(x2 * x2) AS BIGINT) AS s22,
               CAST(SUM(x1 * x2) AS BIGINT) AS s12,
               CAST(SUM(x1 * y) AS BIGINT) AS s1y,
               CAST(SUM(x2 * y) AS BIGINT) AS s2y
        FROM t
    ),
    d AS (
        SELECT n,
               CAST(n AS DOUBLE) AS dn, CAST(s1 AS DOUBLE) AS d1,
               CAST(s2 AS DOUBLE) AS d2, CAST(sy AS DOUBLE) AS dy,
               CAST(s11 AS DOUBLE) AS d11, CAST(s22 AS DOUBLE) AS d22,
               CAST(s12 AS DOUBLE) AS d12, CAST(s1y AS DOUBLE) AS d1y,
               CAST(s2y AS DOUBLE) AS d2y
        FROM m
    ),
    c AS (
        SELECT n,
               (dn * (d11 * d22 - d12 * d12) - d1 * (d1 * d22 - d12 * d2)
                + d2 * (d1 * d12 - d11 * d2)) AS det,
               (dy * (d11 * d22 - d12 * d12) - d1 * (d1y * d22 - d12 * d2y)
                + d2 * (d1y * d12 - d11 * d2y)) AS det0,
               (dn * (d1y * d22 - d12 * d2y) - dy * (d1 * d22 - d12 * d2)
                + d2 * (d1 * d2y - d1y * d2)) AS det1,
               (dn * (d11 * d2y - d1y * d12) - d1 * (d1 * d2y - d1y * d2)
                + dy * (d1 * d12 - d11 * d2)) AS det2
        FROM d
    )
    SELECT n AS n_rows,
           (FLOOR((det0 / det / 100) * 1000000.0 + 0.5) / 1000000.0)
               AS b_intercept,
           (FLOOR((det1 / det / 100) * 1000000.0 + 0.5) / 1000000.0)
               AS b_qty,
           (FLOOR((det2 / det / 100) * 1000000.0 + 0.5) / 1000000.0)
               AS b_discount_bp
    FROM c
    """,
    doc="Multiple linear regression WITHOUT any iterative solver: "
    "extended price (cents) on quantity and discount basis points via "
    "the closed-form normal equations, Cramer's rule on the 3x3 "
    "moment matrix. Every moment (n, Sx, Sxx, Sxy, ...) is an EXACT "
    "int64 sum of exact integers (quantity is integral, discount and "
    "price are 2dp so x100-quantization is lossless), making the "
    "partial-aggregate shuffle order-independent; the determinants "
    "are then identically-parenthesized double expressions over those "
    "exact moments, so both engines produce bit-identical "
    "coefficients before the 6dp rounding. Reported in dollars "
    "(cents/100). Largest moment S_x1y is ~3e14 at sf0.1 — int64 "
    "headroom to ~sf100; beyond that the moments switch to "
    "DECIMAL(38,0) with the same plan shape. Scale: ONE map + one "
    "all-to-one partial agg (9 scalars per partition), zero joins, "
    "zero windows; the Cramer arithmetic runs on a single row.",
)
def q81_ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias("x2"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("bigint").alias("y"),
    )
    m = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
        F.sum(F.col("x1") * F.col("y")).cast("bigint").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").alias("s2y"),
    )
    d = m.select(
        "n",
        F.col("n").cast("double").alias("dn"),
        F.col("s1").cast("double").alias("d1"),
        F.col("s2").cast("double").alias("d2"),
        F.col("sy").cast("double").alias("dy"),
        F.col("s11").cast("double").alias("d11"),
        F.col("s22").cast("double").alias("d22"),
        F.col("s12").cast("double").alias("d12"),
        F.col("s1y").cast("double").alias("d1y"),
        F.col("s2y").cast("double").alias("d2y"),
    )
    dn, d1, d2, dy = F.col("dn"), F.col("d1"), F.col("d2"), F.col("dy")
    d11, d22, d12 = F.col("d11"), F.col("d22"), F.col("d12")
    d1y, d2y = F.col("d1y"), F.col("d2y")
    det = (
        dn * (d11 * d22 - d12 * d12)
        - d1 * (d1 * d22 - d12 * d2)
        + d2 * (d1 * d12 - d11 * d2)
    )
    det0 = (
        dy * (d11 * d22 - d12 * d12)
        - d1 * (d1y * d22 - d12 * d2y)
        + d2 * (d1y * d12 - d11 * d2y)
    )
    det1 = (
        dn * (d1y * d22 - d12 * d2y)
        - dy * (d1 * d22 - d12 * d2)
        + d2 * (d1 * d2y - d1y * d2)
    )
    det2 = (
        dn * (d11 * d2y - d1y * d12)
        - d1 * (d1 * d2y - d1y * d2)
        + dy * (d1 * d12 - d11 * d2)
    )
    return d.select(
        F.col("n").alias("n_rows"),
        fround(det0 / det / 100, 6).alias("b_intercept"),
        fround(det1 / det / 100, 6).alias("b_qty"),
        fround(det2 / det / 100, 6).alias("b_discount_bp"),
    )


# ---------------------------------------------------------------------------
# q82 — Neyman allocation for a stratified audit sample (round 7)
# ---------------------------------------------------------------------------

_Q82_BUDGET = 1000  # total audit sample size to apportion across nations


@query(
    "q82_neyman_allocation",
    oracle=f"""
    WITH c AS (
        SELECT n_name,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS y
        FROM customer JOIN nation ON n_nationkey = c_nationkey
    ),
    m AS (
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_h,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM c GROUP BY n_name
    ),
    s AS (
        SELECT n_name, n_h, sy, syy,
               sqrt(CAST(syy AS DOUBLE) / n_h
                    - (CAST(sy AS DOUBLE) / n_h) * (CAST(sy AS DOUBLE) / n_h))
                   AS sd_c
        FROM m
    ),
    t AS (SELECT SUM(n_h * sd_c) AS tot FROM s),
    q AS (
        SELECT n_name, n_h, sy, syy, sd_c,
               {_Q82_BUDGET} * (n_h * sd_c) / tot AS quota
        FROM s, t
    ),
    fl AS (
        SELECT n_name, n_h, sy, syy, sd_c, quota,
               CAST(FLOOR(quota) AS BIGINT) AS base,
               quota - FLOOR(quota) AS rem
        FROM q
    ),
    rk AS (
        SELECT fl.*,
               ROW_NUMBER() OVER (ORDER BY rem DESC, n_name) AS rn,
               {_Q82_BUDGET} - SUM(base) OVER () AS leftover
        FROM fl
    )
    SELECT n_name,
           n_h AS stratum_size,
           {sql_fround("CAST(sy AS DOUBLE) / n_h / 100", 4)} AS mean_acctbal,
           {sql_fround("sd_c / 100", 4)} AS sd_acctbal,
           CAST(base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS alloc_n
    FROM rk
    """,
    doc=f"Variance-optimal audit sampling design: Neyman allocation "
    f"(Neyman 1934) splits a {_Q82_BUDGET}-unit audit budget across "
    "customer nations proportional to N_h*S_h — strata that are big "
    "AND internally variable get the auditors — followed by "
    "largest-remainder (Hamilton) apportionment so the integer "
    "allocations sum to the budget EXACTLY, ties broken by nation "
    "name. Per-stratum SDs come from exact int64 cent moments "
    "(population variance = Syy/N - (Sy/N)^2 on identical exact "
    "integers, sqrt IEEE-correctly-rounded), the quota is one "
    "identically-shaped double expression, and the remainder rank is "
    "deterministic — engine-identical allocations all the way. "
    "Scale: one customer-table rollup to the 25-nation grain "
    "(broadcast dim join); the apportionment windows run over 25 "
    "rows — bounded by the stratum count, never the population.",
)
def q82_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"]).select(
        "n_name",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("bigint").alias("y"),
    )
    m = c.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    mu = F.col("sy").cast("double") / F.col("n_h")
    sd_c = F.sqrt(F.col("syy").cast("double") / F.col("n_h") - mu * mu)
    s = m.withColumn("sd_c", sd_c)
    t = s.agg(F.sum(F.col("n_h") * F.col("sd_c")).alias("tot"))
    q = s.crossJoin(F.broadcast(t)).withColumn(
        "quota", _Q82_BUDGET * (F.col("n_h") * F.col("sd_c")) / F.col("tot")
    )
    fl = q.withColumn("base", F.floor(F.col("quota")).cast("bigint")).withColumn(
        "rem", F.col("quota") - F.floor(F.col("quota"))
    )
    # both windows run over the 25-row stratum frame: the rank orders
    # remainders, the unpartitioned sum computes the leftover seats
    w_rank = W.orderBy(F.col("rem").desc(), "n_name")
    w_all = W.partitionBy()
    rk = fl.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "leftover", _Q82_BUDGET - F.sum("base").over(w_all)
    )
    return rk.select(
        "n_name",
        F.col("n_h").alias("stratum_size"),
        fround(F.col("sy").cast("double") / F.col("n_h") / 100, 4).alias(
            "mean_acctbal"
        ),
        fround(F.col("sd_c") / 100, 4).alias("sd_acctbal"),
        (
            F.col("base")
            + F.when(F.col("rn") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_n"),
    )


# ---------------------------------------------------------------------------
# q83 — chained Laspeyres / Paasche / Fisher price index (round 7)
# ---------------------------------------------------------------------------

_Q83_Q = 1_000_000.0  # 1e-6 quantization of the cross-year value terms


@query(
    "q83_price_index",
    oracle=f"""
    WITH py AS (
        SELECT l_partkey AS p,
               CAST(year(l_shipdate) AS INTEGER) AS y,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
               CAST(SUM(CAST(FLOOR(
                   l_extendedprice * (1 - l_discount) * 100 + 0.5
               ) AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem GROUP BY 1, 2
    ),
    j AS (
        SELECT a.y AS base_year, b.y AS next_year,
               a.qty AS q0, a.rev AS rev0, b.qty AS q1, b.rev AS rev1,
               CAST(a.rev AS DOUBLE) / a.qty AS u0,
               CAST(b.rev AS DOUBLE) / b.qty AS u1
        FROM py a JOIN py b ON b.p = a.p AND b.y = a.y + 1
    ),
    agg AS (
        SELECT base_year, next_year,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(rev0) AS BIGINT) AS l_den,
               CAST(SUM(rev1) AS BIGINT) AS p_num,
               CAST(SUM(CAST(FLOOR(u1 * q0 * {_Q83_Q} + 0.5) AS BIGINT))
                    AS BIGINT) AS l_num_q,
               CAST(SUM(CAST(FLOOR(u0 * q1 * {_Q83_Q} + 0.5) AS BIGINT))
                    AS BIGINT) AS p_den_q
        FROM j GROUP BY 1, 2
    )
    SELECT base_year, next_year, n_parts,
           {sql_fround(
               f"CAST(l_num_q AS DOUBLE) / {_Q83_Q} / l_den", 6
           )} AS laspeyres,
           {sql_fround(
               f"CAST(p_num AS DOUBLE) / (CAST(p_den_q AS DOUBLE) / {_Q83_Q})", 6
           )} AS paasche,
           {sql_fround(
               f"sqrt((CAST(l_num_q AS DOUBLE) / {_Q83_Q} / l_den)"
               f" * (CAST(p_num AS DOUBLE) / (CAST(p_den_q AS DOUBLE) / {_Q83_Q})))",
               6,
           )} AS fisher
    FROM agg
    """,
    doc="Year-over-year price inflation of the traded basket, computed "
    "three textbook ways: Laspeyres (base-year quantities as weights "
    "— what would last year's basket cost at this year's prices), "
    "Paasche (current-year weights), and their geometric mean, the "
    "Fisher ideal index (the CPI-style superlative). Effective unit "
    "prices are per-(part,year) exact-cent revenue over integral "
    "quantity; the two identities u0*q0 = rev0 and u1*q1 = rev1 make "
    "one side of each index an EXACT integer sum, and the two genuine "
    "cross-year value terms (u1*q0, u0*q1) are 1e-6-quantized BIGINTs "
    "before summing so shuffle order cannot flip the hash; Fisher's "
    "sqrt is IEEE-correctly-rounded on an identically-shaped product. "
    "Scale: one (part, year) rollup, one self-join co-partitioned on "
    "partkey (year+1 rides the same shuffle), final rollup to one row "
    "per consecutive-year pair; no window, no broadcast of anything "
    "part-sized.",
)
def q83_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_extendedprice", "l_discount"
    )
    py = li.groupBy(
        F.col("l_partkey").alias("p"),
        F.year("l_shipdate").cast("int").alias("y"),
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("rev"),
    )
    a = py.select(
        F.col("p"),
        F.col("y").alias("base_year"),
        F.col("qty").alias("q0"),
        F.col("rev").alias("rev0"),
    )
    b = py.select(
        F.col("p").alias("_p2"),
        F.col("y").alias("next_year"),
        F.col("qty").alias("q1"),
        F.col("rev").alias("rev1"),
    )
    j = a.join(
        b, (a["p"] == b["_p2"]) & (b["next_year"] == a["base_year"] + 1)
    ).select(
        "base_year",
        "next_year",
        "q0",
        "rev0",
        "q1",
        "rev1",
        (F.col("rev0").cast("double") / F.col("q0")).alias("u0"),
        (F.col("rev1").cast("double") / F.col("q1")).alias("u1"),
    )
    agg = j.groupBy("base_year", "next_year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("rev0").cast("bigint").alias("l_den"),
        F.sum("rev1").cast("bigint").alias("p_num"),
        F.sum(F.floor(F.col("u1") * F.col("q0") * _Q83_Q + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("l_num_q"),
        F.sum(F.floor(F.col("u0") * F.col("q1") * _Q83_Q + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("p_den_q"),
    )
    lasp = F.col("l_num_q").cast("double") / _Q83_Q / F.col("l_den")
    paas = F.col("p_num").cast("double") / (F.col("p_den_q").cast("double") / _Q83_Q)
    return agg.select(
        "base_year",
        "next_year",
        "n_parts",
        fround(lasp, 6).alias("laspeyres"),
        fround(paas, 6).alias("paasche"),
        fround(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# q84 — Kaplan–Meier repeat-purchase survival curve (round 7)
# ---------------------------------------------------------------------------

_Q84_Q = 1_000_000_000.0  # 1e-9 quantization of the per-day ln(1 - d/n) terms
_Q84_COHORT_END = "1995-07-01"  # first order must land before this
_Q84_STUDY_END = "1995-12-31"  # administrative right-censoring date


# Shared oracle CTE chain behind q84/q89: subjects -> day grid ->
# at-risk counts -> quantized log-survival terms -> cumulative km.
_Q84_CTES = f"""
    WITH ranked AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS rn
        FROM orders
    ),
    subj AS (
        SELECT a.o_custkey,
               CASE WHEN b.od IS NOT NULL AND b.od <= DATE '{_Q84_STUDY_END}'
                    THEN datediff('day', a.od, b.od)
                    ELSE datediff('day', a.od, DATE '{_Q84_STUDY_END}') END AS t,
               CASE WHEN b.od IS NOT NULL AND b.od <= DATE '{_Q84_STUDY_END}'
                    THEN 1 ELSE 0 END AS ev
        FROM ranked a
        LEFT JOIN ranked b ON b.o_custkey = a.o_custkey AND b.rn = 2
        WHERE a.rn = 1 AND a.od < DATE '{_Q84_COHORT_END}'
    ),
    grid AS (
        SELECT CAST(t AS BIGINT) AS day,
               CAST(SUM(ev) AS BIGINT) AS d_ev,
               CAST(SUM(1 - ev) AS BIGINT) AS n_cen
        FROM subj GROUP BY t
    ),
    risk AS (
        SELECT day, d_ev, n_cen,
               CAST(SUM(d_ev + n_cen) OVER () AS BIGINT)
               - CAST(COALESCE(SUM(d_ev + n_cen) OVER (
                     ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING
                 ), 0) AS BIGINT) AS n_risk
        FROM grid
    ),
    terms AS (
        SELECT day, d_ev, n_cen, n_risk,
               CASE WHEN d_ev = 0 OR n_risk <= d_ev THEN CAST(0 AS BIGINT)
                    ELSE CAST(FLOOR(
                        ln(CAST(n_risk - d_ev AS DOUBLE) / n_risk)
                        * {_Q84_Q} + 0.5
                    ) AS BIGINT) END AS qterm
        FROM risk
    ),
    km AS (
        SELECT day, n_risk, d_ev, n_cen,
               CAST(SUM(qterm) OVER (
                   ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW
               ) AS BIGINT) AS qcum
        FROM terms
    )
"""


def _km_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared KM day-grid stage behind q84/q89: (day, n_risk, d_ev,
    n_cen, qcum) with qcum the cumulative 1e-9-quantized log-survival
    — the product-limit curve in log domain, exact int64."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    w_cust = W.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    ranked = o.select("o_custkey", "od", F.row_number().over(w_cust).alias("rn"))
    first = ranked.filter(
        (F.col("rn") == 1) & (F.col("od") < F.lit(_Q84_COHORT_END).cast("date"))
    ).select("o_custkey", F.col("od").alias("d1"))
    second = ranked.filter(F.col("rn") == 2).select(
        F.col("o_custkey").alias("_c2"), F.col("od").alias("d2")
    )
    study_end = F.lit(_Q84_STUDY_END).cast("date")
    observed = F.col("d2").isNotNull() & (F.col("d2") <= study_end)
    subj = first.join(second, first["o_custkey"] == second["_c2"], "left").select(
        F.when(observed, F.datediff(F.col("d2"), F.col("d1")))
        .otherwise(F.datediff(study_end, F.col("d1")))
        .cast("bigint")
        .alias("t"),
        F.when(observed, F.lit(1)).otherwise(F.lit(0)).alias("ev"),
    )
    grid = subj.groupBy(F.col("t").alias("day")).agg(
        F.sum("ev").cast("bigint").alias("d_ev"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("n_cen"),
    )
    # day-grid windows: calendar-bounded (~300 rows), intentional global
    w_all = W.partitionBy()
    w_prev = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    w_cum = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    risk = grid.select(
        "day",
        "d_ev",
        "n_cen",
        (
            F.sum(F.col("d_ev") + F.col("n_cen")).over(w_all).cast("bigint")
            - F.coalesce(
                F.sum(F.col("d_ev") + F.col("n_cen")).over(w_prev), F.lit(0)
            ).cast("bigint")
        ).alias("n_risk"),
    )
    qterm = (
        F.when(
            (F.col("d_ev") == 0) | (F.col("n_risk") <= F.col("d_ev")),
            F.lit(0).cast("bigint"),
        )
        .otherwise(
            F.floor(
                F.log(
                    (F.col("n_risk") - F.col("d_ev")).cast("double")
                    / F.col("n_risk")
                )
                * _Q84_Q
                + 0.5
            ).cast("bigint")
        )
        .alias("qterm")
    )
    terms = risk.select("day", "d_ev", "n_cen", "n_risk", qterm)
    return terms.select(
        "day",
        "n_risk",
        "d_ev",
        "n_cen",
        F.sum("qterm").over(w_cum).cast("bigint").alias("qcum"),
    )


@query(
    "q84_km_repeat_purchase",
    oracle=f"""
{_Q84_CTES}
    SELECT day, n_risk, d_ev AS n_events, n_cen AS n_censored,
           {sql_fround("CAST(d_ev AS DOUBLE) / n_risk", 6)} AS hazard,
           {sql_fround(f"exp(CAST(qcum AS DOUBLE) / {_Q84_Q})", 6)} AS km_survival
    FROM km
    """,
    doc="Kaplan–Meier product-limit estimator (Kaplan & Meier 1958) of "
    f"the repeat-purchase curve: customers whose first order lands "
    f"before {_Q84_COHORT_END} are followed until their second order "
    f"(event) or administratively right-CENSORED at {_Q84_STUDY_END} "
    "— the censored customers are exactly what a naive 'average days "
    "to reorder' silently drops, and they are why KM exists. The "
    "product Π(1 - d/n) is carried in log domain: each day's "
    "ln(1 - d_u/n_u) is an identically-shaped double on exact-integer "
    "operands, 1e-9-quantized to a BIGINT before the cumulative sum "
    "(t21/t51 discipline), then one exp at the end — engine-identical "
    "at every step. Scale: the subject table is one customer-keyed "
    "window (per-customer order ranking, population-partitioned); "
    "everything after collapses to the DAY GRID, bounded by the "
    "study calendar (~300 rows), so the unpartitioned cumulative "
    "windows run over a calendar-bounded frame, never the population "
    "(the intentional-global-window pattern of q76/e33).",
)
def q84_km_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    km = _km_grid(spark, sf_dir)
    return km.select(
        "day",
        "n_risk",
        F.col("d_ev").alias("n_events"),
        F.col("n_cen").alias("n_censored"),
        fround(F.col("d_ev").cast("double") / F.col("n_risk"), 6).alias("hazard"),
        fround(F.exp(F.col("qcum").cast("double") / _Q84_Q), 6).alias("km_survival"),
    )


# ---------------------------------------------------------------------------
# q85 — cohort lifetime-value curve (round 7; the revenue twin of e29's
# retention matrix, on the orders fact)
# ---------------------------------------------------------------------------


@query(
    "q85_cohort_ltv",
    oracle=f"""
    WITH o AS (
        SELECT o_custkey,
               year(o_orderdate) * 12 + month(o_orderdate) AS midx,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ),
    cohort AS (
        SELECT o_custkey, MIN(midx) AS c_midx FROM o GROUP BY o_custkey
    ),
    csize AS (
        SELECT c_midx, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM cohort GROUP BY c_midx
    ),
    rev AS (
        SELECT c.c_midx, o.midx - c.c_midx AS age,
               CAST(SUM(o.cents) AS BIGINT) AS rev_cents
        FROM o JOIN cohort c ON o.o_custkey = c.o_custkey
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT c_midx, age, rev_cents,
               CAST(SUM(rev_cents) OVER (
                   PARTITION BY c_midx ORDER BY age
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_cents
        FROM rev
    )
    SELECT CAST((c_midx - 1) // 12 AS INTEGER) AS cohort_year,
           CAST((c_midx - 1) % 12 + 1 AS INTEGER) AS cohort_month,
           CAST(age AS INTEGER) AS age_months,
           n_customers,
           {sql_fround("CAST(cum_cents AS DOUBLE) / 100", 2)} AS cum_revenue,
           {sql_fround(
               "CAST(cum_cents AS DOUBLE) / 100 / n_customers", 4
           )} AS ltv_per_customer
    FROM cum JOIN csize USING (c_midx)
    """,
    doc="Cohort lifetime-value curve: customers grouped by FIRST-order "
    "month, cumulative revenue per cohort tracked by months-since-"
    "acquisition and normalized per cohort head — the curve whose "
    "plateau is the number a CAC budget is allowed to approach, and "
    "the revenue-side twin of e29's retention matrix. Month indexes "
    "are integer year*12+month arithmetic (identical both engines — "
    "never months_between, whose fractional semantics differ), "
    "revenue rides exact int64 cents, and the cumulative window runs "
    "over the (cohort, age) GRID — bounded by calendar-months "
    "squared, never by customers or orders. Scale: one custkey "
    "rollup for cohort assignment, one custkey-co-partitioned join "
    "back to the fact, a (cohort, age)-grain aggregate, and the "
    "grid-sized window; cohort sizes join at grid grain.",
)
def q85_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("midx"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    cohort = o.groupBy("o_custkey").agg(F.min("midx").alias("c_midx"))
    csize = cohort.groupBy("c_midx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
    rev = (
        o.join(cohort, "o_custkey")
        .groupBy("c_midx", (F.col("midx") - F.col("c_midx")).alias("age"))
        .agg(F.sum("cents").cast("bigint").alias("rev_cents"))
    )
    w_cum = (
        W.partitionBy("c_midx").orderBy("age").rowsBetween(W.unboundedPreceding, 0)
    )
    cum = rev.select(
        "c_midx",
        "age",
        F.sum("rev_cents").over(w_cum).cast("bigint").alias("cum_cents"),
    )
    dcum = F.col("cum_cents").cast("double")
    return cum.join(csize, "c_midx").select(
        ((F.col("c_midx") - 1) / 12).cast("int").alias("cohort_year"),
        ((F.col("c_midx") - 1) % 12 + 1).cast("int").alias("cohort_month"),
        F.col("age").cast("int").alias("age_months"),
        "n_customers",
        fround(dcum / 100, 2).alias("cum_revenue"),
        fround(dcum / 100 / F.col("n_customers"), 4).alias("ltv_per_customer"),
    )


# ---------------------------------------------------------------------------
# q86 — log-log price elasticity of demand per brand (round 7)
# ---------------------------------------------------------------------------

_Q86_Q = 1_000_000.0  # 1e-6 quantization of the centered ln terms
_Q86_PRICE_C = 100_000.0  # centering constant: cents scale anchor


@query(
    "q86_price_elasticity",
    oracle=f"""
    WITH t AS (
        SELECT p_brand,
               CAST(FLOOR(
                   ln(CAST(FLOOR(l_extendedprice * (1 - l_discount) / l_quantity
                                 * 100 + 0.5) AS BIGINT) / {_Q86_PRICE_C})
                   * {_Q86_Q} + 0.5) AS BIGINT) AS qx,
               CAST(FLOOR(
                   ln(CAST(CAST(l_quantity AS BIGINT) AS DOUBLE))
                   * {_Q86_Q} + 0.5) AS BIGINT) AS qy
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ),
    m AS (
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qx) AS BIGINT) AS sx,
               CAST(SUM(qy) AS BIGINT) AS sy,
               CAST(SUM(qx * qy) AS BIGINT) AS sxy,
               CAST(SUM(qx * qx) AS BIGINT) AS sxx
        FROM t GROUP BY p_brand
    )
    SELECT p_brand, n AS n_lineitems,
           {sql_fround(
               "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
               " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)",
               6,
           )} AS elasticity
    FROM m
    """,
    doc="Own-price elasticity of demand per brand: the slope of "
    "ln(quantity) on ln(effective unit price) across that brand's "
    "lineitems — the log-log regression coefficient economists read "
    "directly as %-demand per %-price (elastic below -1, inelastic "
    "above), exploiting the discount-driven price variation within "
    "each part. The q81 closed-form discipline applied to logs: unit "
    "prices are first made EXACT integer cents, each centered ln term "
    "is quantized to a 1e-6 BIGINT (the centering anchor keeps "
    "qx^2 sums far from int64 range; slope is scale/shift-invariant "
    "so the anchor cancels), and the slope is one identically-shaped "
    "double expression over exact int64 moments — bit-identical both "
    "engines before rounding. Scale: one partkey-co-partitioned dim "
    "join (broadcastable), one brand-grain moment rollup; no window, "
    "no second pass.",
)
def q86_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    unit_cents = F.floor(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        / F.col("l_quantity")
        * 100
        + 0.5
    ).cast("bigint")
    qx = F.floor(
        F.log(unit_cents / _Q86_PRICE_C) * _Q86_Q + 0.5
    ).cast("bigint")
    qy = F.floor(
        F.log(F.col("l_quantity").cast("bigint").cast("double")) * _Q86_Q + 0.5
    ).cast("bigint")
    t = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "p_brand", qx.alias("qx"), qy.alias("qy")
    )
    m = t.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qx").cast("bigint").alias("sx"),
        F.sum("qy").cast("bigint").alias("sy"),
        F.sum(F.col("qx") * F.col("qy")).cast("bigint").alias("sxy"),
        F.sum(F.col("qx") * F.col("qx")).cast("bigint").alias("sxx"),
    )
    dn = F.col("n").cast("double")
    dsx = F.col("sx").cast("double")
    return m.select(
        "p_brand",
        F.col("n").alias("n_lineitems"),
        fround(
            (dn * F.col("sxy") - dsx * F.col("sy"))
            / (dn * F.col("sxx") - dsx * F.col("sx")),
            6,
        ).alias("elasticity"),
    )


# ---------------------------------------------------------------------------
# q87 — ABC (Pareto) inventory classification (round 7)
# ---------------------------------------------------------------------------

_Q87_BLOCK = 10_000  # revenue-block width in cents ($100) — the grid grain


@query(
    "q87_abc_classes",
    oracle=f"""
    WITH pr AS (
        SELECT l_partkey AS p,
               CAST(SUM(CAST(FLOOR(
                   l_extendedprice * (1 - l_discount) * 100 + 0.5
               ) AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem GROUP BY l_partkey
    ),
    blocks AS (
        SELECT rev // {_Q87_BLOCK} AS blk,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(rev) AS BIGINT) AS blk_rev
        FROM pr GROUP BY 1
    ),
    cum AS (
        SELECT blk, n_parts, blk_rev,
               CAST(SUM(blk_rev) OVER (
                   ORDER BY blk DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_rev,
               CAST(SUM(blk_rev) OVER () AS BIGINT) AS tot_rev
        FROM blocks
    ),
    classed AS (
        SELECT CASE WHEN cum_rev * 100 <= tot_rev * 80 THEN 'A'
                    WHEN cum_rev * 100 <= tot_rev * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               n_parts, blk_rev, tot_rev
        FROM cum
    )
    SELECT abc_class,
           CAST(SUM(n_parts) AS BIGINT) AS n_parts,
           {sql_fround("CAST(SUM(blk_rev) AS DOUBLE) / 100", 2)} AS revenue,
           {sql_fround("CAST(SUM(blk_rev) AS DOUBLE) / MAX(tot_rev)", 6)}
               AS rev_share
    FROM classed GROUP BY abc_class
    """,
    doc="ABC / Pareto inventory classification: parts ranked by revenue "
    "into class A (top blocks covering <=80% of revenue), B (to 95%) "
    "and C (the tail) — the classic 'which 20% of SKUs earn 80%' "
    "cut that drives stocking policy. Built WITHOUT sorting parts "
    "(the e33 rank-block discipline): per-part exact-cent revenues "
    f"collapse onto a ${_Q87_BLOCK // 100}-wide revenue-block "
    "histogram, the cumulative window runs over that bounded VALUE "
    "grid ordered descending (parts inside one block share a class — "
    "deterministic by construction), and the class cut is a pure "
    "int64 comparison (cum*100 <= tot*80), so there is not a single "
    "float until the two report divisions. Scale: one partkey rollup, "
    "one block-grain rollup, windows over the price-range-bounded "
    "grid (intentional global window over ~thousands of rows, the "
    "q76/e33 pattern), final 3-row report.",
)
def q87_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    pr = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("rev")
    )
    blocks = pr.groupBy(F.floor(F.col("rev") / _Q87_BLOCK).alias("blk")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("rev").cast("bigint").alias("blk_rev"),
    )
    # windows over the revenue-block VALUE grid (price-range-bounded,
    # intentional global — the q76/e33 pattern)
    w_cum = W.orderBy(F.col("blk").desc()).rowsBetween(W.unboundedPreceding, 0)
    w_all = W.partitionBy()
    cum = blocks.select(
        "n_parts",
        "blk_rev",
        F.sum("blk_rev").over(w_cum).cast("bigint").alias("cum_rev"),
        F.sum("blk_rev").over(w_all).cast("bigint").alias("tot_rev"),
    )
    classed = cum.select(
        F.when(F.col("cum_rev") * 100 <= F.col("tot_rev") * 80, "A")
        .when(F.col("cum_rev") * 100 <= F.col("tot_rev") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "n_parts",
        "blk_rev",
        "tot_rev",
    )
    return classed.groupBy("abc_class").agg(
        F.sum("n_parts").cast("bigint").alias("n_parts"),
        fround(F.sum("blk_rev").cast("double") / 100, 2).alias("revenue"),
        fround(F.sum("blk_rev").cast("double") / F.max("tot_rev"), 6).alias(
            "rev_share"
        ),
    )


# ---------------------------------------------------------------------------
# q88 — customer spend-band migration matrix (round 7)
# ---------------------------------------------------------------------------

# annual-spend band edges in exact cents (pure-integer classification)
_Q88_BANDS = (10_000_00, 25_000_00, 50_000_00)  # $10k / $25k / $50k


def _q88_band_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} < {_Q88_BANDS[0]} THEN 'low'"
        f" WHEN {col} < {_Q88_BANDS[1]} THEN 'mid'"
        f" WHEN {col} < {_Q88_BANDS[2]} THEN 'high'"
        f" ELSE 'vip' END"
    )


@query(
    "q88_spend_band_migration",
    oracle=f"""
    WITH cy AS (
        SELECT o_custkey, year(o_orderdate) AS y,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    b AS (SELECT o_custkey, y, {_q88_band_sql("cents")} AS band FROM cy),
    m AS (
        SELECT a.band AS band_from, c.band AS band_to,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM b a JOIN b c ON c.o_custkey = a.o_custkey AND c.y = a.y + 1
        GROUP BY 1, 2
    ),
    rt AS (
        SELECT band_from, CAST(SUM(n) AS BIGINT) AS tot
        FROM m GROUP BY band_from
    )
    SELECT m.band_from, m.band_to, m.n AS n_customers,
           {sql_fround("CAST(m.n AS DOUBLE) / rt.tot", 6)} AS share_of_from
    FROM m JOIN rt ON m.band_from = rt.band_from
    """,
    doc="Customer value-migration matrix: annual spend classified into "
    "fixed bands (low/mid/high/vip at $10k/$25k/$50k — LITERAL edges, "
    "never data-dependent quantiles, so the classification is a pure "
    "int64-cents comparison and needs no global sort), then each "
    "customer-year joined to the same customer's NEXT year and the "
    "(from, to) transitions counted with row-share — the retention/"
    "upgrade/churn-risk matrix a CRM team reads (off-diagonal mass is "
    "movement; the 'vip'->'low' cell is the account-manager alarm). "
    "Counts exact, shares single divisions of exact integers. Scale: "
    "one (customer, year) rollup, one custkey-co-partitioned "
    "year-over-year self-join (the q83 shape at customer grain), a "
    "16-cell matrix rollup; no window anywhere.",
)
def q88_spend_band_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("y"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    cy = o.groupBy("o_custkey", "y").agg(
        F.sum("cents").cast("bigint").alias("cents")
    )
    band = (
        F.when(F.col("cents") < _Q88_BANDS[0], "low")
        .when(F.col("cents") < _Q88_BANDS[1], "mid")
        .when(F.col("cents") < _Q88_BANDS[2], "high")
        .otherwise("vip")
    )
    b = cy.select("o_custkey", "y", band.alias("band"))
    a = b.select("o_custkey", F.col("y").alias("y0"), F.col("band").alias("band_from"))
    c = b.select(
        F.col("o_custkey").alias("_c2"),
        F.col("y").alias("y1"),
        F.col("band").alias("band_to"),
    )
    m = (
        a.join(c, (a["o_custkey"] == c["_c2"]) & (c["y1"] == a["y0"] + 1))
        .groupBy("band_from", "band_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    rt = m.groupBy("band_from").agg(F.sum("n").cast("bigint").alias("tot"))
    return m.join(F.broadcast(rt), "band_from").select(
        "band_from",
        "band_to",
        F.col("n").alias("n_customers"),
        fround(F.col("n").cast("double") / F.col("tot"), 6).alias("share_of_from"),
    )


# ---------------------------------------------------------------------------
# q89 — Weibull fit of the repeat-purchase hazard (round 7; the
# parametric read of q84's nonparametric curve)
# ---------------------------------------------------------------------------

_Q89_Q = 1_000_000.0  # 1e-6 quantization of the log-log regression terms


@query(
    "q89_weibull_reorder",
    oracle=f"""
{_Q84_CTES},
    pts AS (
        SELECT CAST(FLOOR(ln(CAST(day AS DOUBLE)) * {_Q89_Q} + 0.5)
                    AS BIGINT) AS qx,
               CAST(FLOOR(ln(-(CAST(qcum AS DOUBLE) / {_Q84_Q}))
                          * {_Q89_Q} + 0.5) AS BIGINT) AS qy
        FROM km WHERE day >= 1 AND qcum < 0
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qx) AS BIGINT) AS sx,
               CAST(SUM(qy) AS BIGINT) AS sy,
               CAST(SUM(qx * qy) AS BIGINT) AS sxy,
               CAST(SUM(qx * qx) AS BIGINT) AS sxx,
               CAST(SUM(qy * qy) AS BIGINT) AS syy
        FROM pts
    ),
    fit AS (
        SELECT n,
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS k,
               CAST(sx AS DOUBLE) AS dx, CAST(sy AS DOUBLE) AS dy,
               CAST(n AS DOUBLE) AS dn,
               CAST(sxy AS BIGINT) AS i_sxy, CAST(sxx AS BIGINT) AS i_sxx,
               CAST(syy AS BIGINT) AS i_syy,
               CAST(sx AS BIGINT) AS i_sx, CAST(sy AS BIGINT) AS i_sy
        FROM m
    )
    SELECT n AS n_grid_points,
           {sql_fround("k", 4)} AS weibull_k,
           {sql_fround(
               f"exp(-((dy / dn - k * (dx / dn)) / {_Q89_Q}) / k)", 2
           )} AS weibull_lambda_days,
           {sql_fround(
               "(dn * i_sxy - dx * i_sy) * (dn * i_sxy - dx * i_sy)"
               " / ((dn * i_sxx - dx * i_sx) * (dn * i_syy - dy * i_sy))",
               4,
           )} AS r_squared
    FROM fit
    """,
    doc="Parametric read of q84's nonparametric curve: a Weibull "
    "S(t) = exp(-(t/lambda)^k) fit by the classic linearization "
    "ln(-ln S) = k ln t - k ln lambda — OLS on the KM grid's log-log "
    "points. The SHAPE k is the verdict a lifecycle team acts on: "
    "k < 1 means the reorder hazard FALLS with time (win them back "
    "early or never), k > 1 means it rises (subscription-like "
    "rhythm). ln S comes exact from q84's shared km stage (cumulative "
    "1e-9-quantized BIGINT log-survival), both regression coordinates "
    "are 1e-6-quantized BIGINTs, the moments are exact int64, and "
    "slope/intercept/R^2 are identically-shaped double expressions — "
    "engine-identical before rounding (q81's closed-form discipline "
    "composed onto q84). Scale: everything after the shared KM "
    "day-grid stage runs on ~300 calendar-bounded rows; the fit is "
    "one all-to-one moment aggregate.",
)
def q89_weibull_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    km = _km_grid(spark, sf_dir)
    pts = km.filter((F.col("day") >= 1) & (F.col("qcum") < 0)).select(
        F.floor(F.log(F.col("day").cast("double")) * _Q89_Q + 0.5)
        .cast("bigint")
        .alias("qx"),
        F.floor(
            F.log(-(F.col("qcum").cast("double") / _Q84_Q)) * _Q89_Q + 0.5
        )
        .cast("bigint")
        .alias("qy"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qx").cast("bigint").alias("sx"),
        F.sum("qy").cast("bigint").alias("sy"),
        F.sum(F.col("qx") * F.col("qy")).cast("bigint").alias("sxy"),
        F.sum(F.col("qx") * F.col("qx")).cast("bigint").alias("sxx"),
        F.sum(F.col("qy") * F.col("qy")).cast("bigint").alias("syy"),
    )
    dn = F.col("n").cast("double")
    dx = F.col("sx").cast("double")
    dy = F.col("sy").cast("double")
    k = (dn * F.col("sxy") - dx * F.col("sy")) / (dn * F.col("sxx") - dx * F.col("sx"))
    num = dn * F.col("sxy") - dx * F.col("sy")
    return m.select(
        F.col("n").alias("n_grid_points"),
        fround(k, 4).alias("weibull_k"),
        fround(
            F.exp(-((dy / dn - k * (dx / dn)) / _Q89_Q) / k), 2
        ).alias("weibull_lambda_days"),
        fround(
            num * num
            / (
                (dn * F.col("sxx") - dx * F.col("sx"))
                * (dn * F.col("syy") - dy * F.col("sy"))
            ),
            4,
        ).alias("r_squared"),
    )


# ---------------------------------------------------------------------------
# q90 — Herfindahl–Hirschman market concentration per nation (round 7)
# ---------------------------------------------------------------------------


@query(
    "q90_supplier_hhi",
    oracle=f"""
    WITH sr AS (
        SELECT s.s_nationkey, l.l_suppkey,
               CAST(SUM(CAST(FLOOR(
                   l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5
               ) AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(rev) AS BIGINT) AS tot,
               CAST(SUM(CAST(rev AS DECIMAL(38,0)) * rev) AS DECIMAL(38,0)) AS sq
        FROM sr JOIN nation ON n_nationkey = s_nationkey
        GROUP BY n_name
    )
    SELECT n_name,
           n_suppliers,
           {sql_fround("CAST(tot AS DOUBLE) / 100", 2)} AS market_revenue,
           {sql_fround(
               "CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE) * tot)", 6
           )} AS hhi,
           {sql_fround(
               "(CAST(tot AS DOUBLE) * tot) / sq", 4
           )} AS effective_competitors
    FROM m
    """,
    doc="Herfindahl–Hirschman concentration of each nation's supplier "
    "market: HHI = sum of squared revenue shares = (sum rev_i^2) / "
    "(sum rev_i)^2 — the antitrust screening number (US guidelines "
    "flag markets above 0.25), with its inverse, the 'effective "
    "number of competitors' (25 equal suppliers -> 25; one dominant "
    "-> ~1). The share-squaring identity keeps EVERYTHING integer "
    "until two final divisions: revenues are exact int64 cents, the "
    "squared sum an exact int64 rollup (t52's Simpson trick applied "
    "to market shares — at 100 TB the rev^2 partials ride "
    "DECIMAL(38,0), same plan), so both engines divide the same "
    "exact integers. Scale: one (nation, supplier) rollup riding a "
    "broadcast supplier dim join, then a 25-row nation rollup; no "
    "window, no shares materialized per supplier.",
)
def q90_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sr = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("rev")
        )
    )
    m = (
        sr.join(F.broadcast(nat), sr["s_nationkey"] == nat["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.sum("rev").cast("bigint").alias("tot"),
            F.sum(F.col("rev").cast("decimal(38,0)") * F.col("rev"))
            .cast("decimal(38,0)")
            .alias("sq"),
        )
    )
    dtot = F.col("tot").cast("double")
    dsq = F.col("sq").cast("double")
    return m.select(
        "n_name",
        "n_suppliers",
        fround(dtot / 100, 2).alias("market_revenue"),
        fround(dsq / (dtot * F.col("tot")), 6).alias("hhi"),
        fround((dtot * F.col("tot")) / dsq, 4).alias("effective_competitors"),
    )


# ---------------------------------------------------------------------------
# q91 — Mann–Whitney U test: urgent vs low-priority order values
# (round 7; the two-sample sibling of e37's k-sample Kruskal–Wallis)
# ---------------------------------------------------------------------------

_Q91_HI = ("1-URGENT", "2-HIGH")
_Q91_LO = ("4-NOT SPECIFIED", "5-LOW")


@query(
    "q91_mann_whitney",
    oracle=f"""
    WITH pop AS (
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS grp,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS y
        FROM orders
        WHERE o_orderpriority IN
              ('1-URGENT', '2-HIGH', '4-NOT SPECIFIED', '5-LOW')
    ),
    vals AS (
        SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(grp) AS BIGINT) AS cnt1
        FROM pop GROUP BY y
    ),
    cum AS (
        SELECT y, cnt, cnt1,
               CAST(COALESCE(SUM(cnt) OVER (
                   ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING
               ), 0) AS BIGINT) AS below
        FROM vals
    ),
    g AS (
        SELECT CAST(SUM(cnt1 * (2 * below + cnt + 1)) AS BIGINT) AS s2r1,
               CAST(SUM(cnt1) AS BIGINT) AS n1,
               CAST(SUM(cnt - cnt1) AS BIGINT) AS n2
        FROM cum
    ),
    ties AS (
        SELECT CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_mass
        FROM vals
    ),
    u AS (
        SELECT n1, n2, tie_mass,
               s2r1 - n1 * (n1 + 1) AS u2_1  -- 2*U1, exact integer
        FROM g CROSS JOIN ties
    )
    SELECT n1 AS n_high, n2 AS n_low,
           {sql_fround("CAST(u2_1 AS DOUBLE) / 2", 1)} AS u_stat,
           {sql_fround(
               "(CAST(u2_1 AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * n2 / 2)"
               " / sqrt(CAST(n1 AS DOUBLE) * n2 / 12"
               "        * ((n1 + n2 + 1)"
               "           - CAST(tie_mass AS DOUBLE)"
               "             / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))",
               4,
           )} AS z_score,
           {sql_fround(
               "1.0 - CAST(u2_1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)", 6
           )} AS rank_biserial
    FROM u
    """,
    doc="Mann–Whitney U test (1947): do urgent/high-priority orders "
    "carry different total values than low-priority ones? The "
    "two-sample sibling of e37's Kruskal–Wallis, on the same "
    "exact-integer midrank machinery (2·rank + ties − 1, so 2·U is a "
    "pure integer), with the tie-corrected normal approximation "
    "z-score and the rank-biserial effect size r = 1 − 2U/(n1·n2) — "
    "the direction-and-magnitude readout (0 = stochastic equality; "
    "positive means the high-priority group stochastically "
    "dominates). Every statistic is a single identically-shaped "
    "double expression over exact int64 rank sums and the exact tie "
    "mass — sqrt IEEE-exact, engine-identical before rounding. "
    "Scale: ranks never touch the order population — the midrank "
    "identity 2R1 = sum cnt1*(2*below + cnt + 1) aggregates off the "
    "cent-VALUE grid (one rollup + a cumulative window bounded by the "
    "price domain, the e33/q87 rank-block discipline), then "
    "single-row arithmetic.",
)
def q91_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    pop = o.filter(F.col("o_orderpriority").isin(*(_Q91_HI + _Q91_LO))).select(
        F.when(F.col("o_orderpriority").isin(*_Q91_HI), 1).otherwise(0).alias("grp"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("y"),
    )
    vals = pop.groupBy("y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("grp").cast("bigint").alias("cnt1"),
    )
    # cumulative window over the VALUE grid — bounded by the cent-value
    # domain of order totals, never by the order population (the
    # e33/q87 rank-block discipline: midrank of value v is
    # below(v) + (cnt+1)/2, so 2R1 aggregates off the grid directly)
    w_cum = W.orderBy("y").rowsBetween(W.unboundedPreceding, -1)
    cum = vals.select(
        "y",
        "cnt",
        "cnt1",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).cast("bigint").alias("below"),
    )
    g = cum.agg(
        F.sum(F.col("cnt1") * (2 * F.col("below") + F.col("cnt") + 1))
        .cast("bigint")
        .alias("s2r1"),
        F.sum("cnt1").cast("bigint").alias("n1"),
        F.sum(F.col("cnt") - F.col("cnt1")).cast("bigint").alias("n2"),
    )
    ties = vals.agg(
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("bigint")
        .alias("tie_mass")
    )
    u = g.crossJoin(F.broadcast(ties)).select(
        "n1",
        "n2",
        "tie_mass",
        (F.col("s2r1") - F.col("n1") * (F.col("n1") + 1)).alias("u2_1"),
    )
    du = F.col("u2_1").cast("double")
    dn1 = F.col("n1").cast("double")
    ntot = F.col("n1") + F.col("n2")
    z = (du / 2 - dn1 * F.col("n2") / 2) / F.sqrt(
        dn1
        * F.col("n2")
        / 12
        * (
            (ntot + 1)
            - F.col("tie_mass").cast("double")
            / (ntot.cast("double") * (ntot - 1))
        )
    )
    return u.select(
        F.col("n1").alias("n_high"),
        F.col("n2").alias("n_low"),
        fround(du / 2, 1).alias("u_stat"),
        fround(z, 4).alias("z_score"),
        fround(1.0 - du / (dn1 * F.col("n2")), 6).alias("rank_biserial"),
    )


# ---------------------------------------------------------------------------
# q92 — realized unit-price dispersion per brand (round 8): the pricing
# hygiene audit a catalog owner runs before trusting "the" price
# ---------------------------------------------------------------------------

Q92_TOP = 15


@query(
    "q92_price_spread_ratio",
    oracle=f"""
    WITH up AS (
        SELECT p.p_brand,
               l.l_extendedprice / l.l_quantity AS unit_price
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    b AS (
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               MIN(unit_price) AS lo,
               MAX(unit_price) AS hi
        FROM up GROUP BY 1
    )
    SELECT p_brand,
           n_lines,
           {sql_fround("lo", 2)} AS min_unit_price,
           {sql_fround("hi", 2)} AS max_unit_price,
           {sql_fround("(hi - lo) / lo", 4)} AS spread_ratio
    FROM b
    ORDER BY (hi - lo) / lo DESC, p_brand
    LIMIT {Q92_TOP}
    """,
    doc="Realized unit-price dispersion per brand: unit price = "
    "extended price over quantity per line, per-brand min/max and the "
    "spread ratio (max-min)/min — the catalog-hygiene screen that "
    "flags brands whose 'price' is not one number (pricing errors, "
    "unit mismatches, gray-market listings). MIN/MAX are exact picks "
    "(no sum-order float hazard — the only division is per-row and "
    "final), so the oracle agrees bit-for-bit after portable "
    "rounding. Scale: one narrow map for the per-line ratio, a "
    "broadcast part-dim join, a brand-grain partial+final aggregate, "
    f"and a top-{Q92_TOP} TakeOrdered — no window, no global sort.",
)
def q92_price_spread_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.min("unit_price").alias("lo"),
            F.max("unit_price").alias("hi"),
        )
    )
    spread = (F.col("hi") - F.col("lo")) / F.col("lo")
    return (
        b.orderBy(spread.desc(), "p_brand")
        .limit(Q92_TOP)
        .select(
            "p_brand",
            "n_lines",
            fround(F.col("lo"), 2).alias("min_unit_price"),
            fround(F.col("hi"), 2).alias("max_unit_price"),
            fround(spread, 4).alias("spread_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# q93 — inter-order gap percentiles per market segment (round 8):
# exact type-1 quantiles off the day-VALUE grid, never a population
# sort (the q91/e33/q87 rank-block discipline)
# ---------------------------------------------------------------------------


@query(
    "q93_order_gap_percentiles",
    oracle="""
    WITH seq AS (
        SELECT c.c_mktsegment AS segment,
               date_diff('day',
                   LAG(o.o_orderdate) OVER (
                       PARTITION BY o.o_custkey
                       ORDER BY o.o_orderdate, o.o_orderkey),
                   o.o_orderdate) AS gap
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (SELECT segment, CAST(gap AS BIGINT) AS gap FROM seq WHERE gap IS NOT NULL),
    vals AS (
        SELECT segment, gap, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY 1, 2
    ),
    cum AS (
        SELECT segment, gap, cnt,
               SUM(cnt) OVER (PARTITION BY segment ORDER BY gap) AS cum,
               SUM(cnt) OVER (PARTITION BY segment) AS n
        FROM vals
    )
    SELECT segment,
           CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN gap END) AS BIGINT)
               AS p50_days,
           CAST(MIN(CASE WHEN cum >= (90 * n + 99) // 100 THEN gap END) AS BIGINT)
               AS p90_days,
           CAST(MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN gap END) AS BIGINT)
               AS p99_days
    FROM cum
    GROUP BY segment
    """,
    doc="Reorder-cadence percentiles: per market segment, exact type-1 "
    "p50/p90/p99 of the days between a customer's consecutive orders "
    "— the inventory-planning number ('how long until the median "
    "customer returns'). Gaps are exact integer day diffs off a "
    "per-customer LAG; percentiles are the smallest value whose "
    "cumulative count reaches ceil(p*n), computed on the (segment, "
    "gap-VALUE) grid — the q91/e33 rank-block discipline, so the "
    "cumulative window walks distinct day values (thousands), never "
    "the gap population (billions at 100 TB). All integer logic; no "
    "interpolation to diverge between engines. Scale: one shuffle on "
    "customer for the LAG, one (segment, gap) rollup, a bounded "
    "window over the value grid, and a 5-row final rollup.",
)
def q93_order_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    wl = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(wl)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    g = seq.join(F.broadcast(c), seq["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"), F.col("gap").cast("bigint").alias("gap")
    )
    vals = g.groupBy("segment", "gap").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wc = W.partitionBy("segment").orderBy("gap")
    wn = W.partitionBy("segment")
    cum = vals.select(
        "segment",
        "gap",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )

    def pick(pct: int, name: str):
        # exact integer ceil(pct*n/100): a double 0.90*n overshoots when
        # pct*n is integral (0.9 is not a binary double) while DuckDB's
        # DECIMAL literal stays exact — integer ceil-division on BOTH
        # engines removes the hazard
        thr = F.expr(f"({pct} * n + 99) div 100")
        hit = F.when(F.col("cum") >= thr, F.col("gap"))
        return F.min(hit).cast("bigint").alias(name)

    return cum.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        pick(50, "p50_days"),
        pick(90, "p90_days"),
        pick(99, "p99_days"),
    )


# ---------------------------------------------------------------------------
# q94 — year-over-year order-priority mix shift per market segment
# (round 8): total-variation distance on exact integer cross products
# ---------------------------------------------------------------------------


@query(
    "q94_priority_mix_shift",
    oracle="""
    WITH mix AS (
        SELECT c.c_mktsegment AS segment,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS yr,
               o.o_orderpriority AS pri,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2, 3
    ),
    tot AS (
        SELECT segment, yr, CAST(SUM(cnt) AS BIGINT) AS n
        FROM mix GROUP BY 1, 2
    ),
    paired AS (
        SELECT COALESCE(a.segment, b.segment) AS segment,
               COALESCE(a.yr, b.yr + 1) AS yr,
               COALESCE(a.cnt, 0) AS a_cnt,
               COALESCE(b.cnt, 0) AS b_cnt
        FROM (SELECT * FROM mix) a
        FULL OUTER JOIN (SELECT * FROM mix) b
          ON a.segment = b.segment AND a.pri = b.pri AND a.yr = b.yr + 1
        WHERE COALESCE(a.yr, b.yr + 1) > (SELECT MIN(yr) FROM tot)
          AND COALESCE(a.yr, b.yr + 1) <= (SELECT MAX(yr) FROM tot)
    ),
    tv AS (
        SELECT p.segment, p.yr,
               ta.n AS n_cur, tb.n AS n_prev,
               CAST(SUM(ABS(p.a_cnt * tb.n - p.b_cnt * ta.n)) AS BIGINT) AS num
        FROM paired p
        JOIN tot ta ON ta.segment = p.segment AND ta.yr = p.yr
        JOIN tot tb ON tb.segment = p.segment AND tb.yr = p.yr - 1
        GROUP BY 1, 2, 3, 4
    )
    SELECT segment, yr, n_cur, n_prev,
           (FLOOR((CAST(num AS DOUBLE) / (2.0 * n_cur * n_prev)) * 1000000.0
                  + 0.5) / 1000000.0) AS tv_distance
    FROM tv
    """,
    doc="Order-priority MIX SHIFT: per market segment, the total-"
    "variation distance between consecutive years' priority "
    "distributions — TV = max-probability-difference any event family "
    "can see, the standard drift alarm for categorical mixes "
    "(monitoring the ingest mix of a training pipeline uses the "
    "identical statistic). The integer identity keeps it exact: "
    "TV = sum|a_i*m - b_i*n| / (2nm) where a, b are raw counts and "
    "n, m the year totals — both engines sum exact int64 cross "
    "products and divide once at the end (the q90 share-squaring "
    "move applied to L1). Missing priority cells ride a FULL OUTER "
    "join with zero fill, so a category that vanishes still "
    "contributes its full mass. Scale: one (segment, year, priority) "
    "rollup off a broadcast customer-dim join; the year-pair join "
    "runs on the ~segment*year*5-row aggregate, never the fact "
    "table.",
)
def q94_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", F.year("o_orderdate").cast("int").alias("yr")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    mix = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"), "yr", F.col("o_orderpriority").alias("pri"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = mix.groupBy("segment", "yr").agg(F.sum("cnt").cast("bigint").alias("n"))
    yr_bounds = tot.agg(
        F.min("yr").alias("_ymin"), F.max("yr").alias("_ymax")
    )
    a = mix.select("segment", "yr", "pri", F.col("cnt").alias("a_cnt"))
    b = mix.select(
        F.col("segment").alias("_seg2"),
        (F.col("yr") + 1).alias("_yr2"),
        F.col("pri").alias("_pri2"),
        F.col("cnt").alias("b_cnt"),
    )
    paired = (
        a.join(
            b,
            (a["segment"] == b["_seg2"]) & (a["yr"] == b["_yr2"]) & (a["pri"] == b["_pri2"]),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("segment"), F.col("_seg2")).alias("segment"),
            F.coalesce(F.col("yr"), F.col("_yr2")).alias("yr"),
            F.coalesce(F.col("a_cnt"), F.lit(0)).alias("a_cnt"),
            F.coalesce(F.col("b_cnt"), F.lit(0)).alias("b_cnt"),
        )
        .crossJoin(F.broadcast(yr_bounds))
        .filter((F.col("yr") > F.col("_ymin")) & (F.col("yr") <= F.col("_ymax")))
    )
    ta = tot.select("segment", "yr", F.col("n").alias("n_cur"))
    tb = tot.select(
        F.col("segment").alias("_seg3"), (F.col("yr") + 1).alias("_yr3"), F.col("n").alias("n_prev")
    )
    tv = (
        paired.join(ta, ["segment", "yr"])
        .join(tb, (F.col("segment") == F.col("_seg3")) & (F.col("yr") == F.col("_yr3")))
        .groupBy("segment", "yr", "n_cur", "n_prev")
        .agg(
            F.sum(
                F.abs(F.col("a_cnt") * F.col("n_prev") - F.col("b_cnt") * F.col("n_cur"))
            )
            .cast("bigint")
            .alias("num")
        )
    )
    return tv.select(
        "segment",
        "yr",
        "n_cur",
        "n_prev",
        fround(
            F.col("num").cast("double") / (2.0 * F.col("n_cur") * F.col("n_prev")), 6
        ).alias("tv_distance"),
    )


# ---------------------------------------------------------------------------
# q95 — December seasonality lift per year (round 8): the seasonal
# capacity-planning number, all-integer until one final ratio
# ---------------------------------------------------------------------------


@query(
    "q95_holiday_lift",
    oracle=f"""
    WITH m AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
               CAST(SUM(CASE WHEN EXTRACT(month FROM o_orderdate) = 12
                   THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS dec_cents,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS yr_cents,
               CAST(COUNT(CASE WHEN EXTRACT(month FROM o_orderdate) = 12
                   THEN 1 END) AS BIGINT) AS dec_orders,
               CAST(COUNT(*) AS BIGINT) AS yr_orders,
               CAST(COUNT(DISTINCT EXTRACT(month FROM o_orderdate)) AS BIGINT)
                   AS n_months
        FROM orders GROUP BY 1
    )
    SELECT yr, dec_orders, yr_orders,
           {sql_fround("CAST(dec_cents AS DOUBLE) / 100", 2)} AS dec_revenue,
           {sql_fround(
               "CAST(n_months * dec_cents AS DOUBLE) / yr_cents", 4
           )} AS revenue_lift,
           {sql_fround(
               "CAST(n_months * dec_orders AS DOUBLE) / yr_orders", 4
           )} AS volume_lift
    FROM m
    WHERE n_months = 12
    """,
    doc="December seasonality lift: per complete year, December's "
    "revenue and order volume against the uniform-month baseline "
    "(lift = 12 * december / year-total; 1.0 = no seasonality) — the "
    "capacity-planning number behind holiday staffing and inventory "
    "pre-positioning. Years without all 12 months are excluded "
    "(their baseline would be biased by construction). Revenue rides "
    "exact integer cents; every lift is a single final division of "
    "exact int64s (the q90/q94 discipline). Scale: ONE conditional "
    "aggregate over orders, grouped by year — no join, no window; "
    "the month filter folds into the aggregate as CASE arms, so the "
    "fact table is scanned once.",
)
def q95_holiday_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    is_dec = F.col("mo") == 12
    m = o.groupBy("yr").agg(
        F.sum(F.when(is_dec, F.col("cents")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("dec_cents"),
        F.sum("cents").cast("bigint").alias("yr_cents"),
        F.count(F.when(is_dec, F.lit(1))).cast("bigint").alias("dec_orders"),
        F.count(F.lit(1)).cast("bigint").alias("yr_orders"),
        F.countDistinct("mo").cast("bigint").alias("n_months"),
    )
    return m.filter(F.col("n_months") == 12).select(
        "yr",
        "dec_orders",
        "yr_orders",
        fround(F.col("dec_cents").cast("double") / 100, 2).alias("dec_revenue"),
        fround(
            (F.col("n_months") * F.col("dec_cents")).cast("double") / F.col("yr_cents"), 4
        ).alias("revenue_lift"),
        fround(
            (F.col("n_months") * F.col("dec_orders")).cast("double") / F.col("yr_orders"), 4
        ).alias("volume_lift"),
    )


# ---------------------------------------------------------------------------
# q96 — classical seasonal decomposition of monthly revenue (round 8):
# the 2x12 centered moving average + month-of-year seasonal indices of
# classical additive decomposition (the pre-STL standard; Kendall &
# Stuart), all integer until the display divisions
# ---------------------------------------------------------------------------
