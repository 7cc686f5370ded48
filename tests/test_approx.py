"""Approximate aggregates: sketches can't be oracle-hashed (engine
sketches differ by design), so bound them against exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_data_engineering_spark.plans.registry import all_queries
from e_commerce_data_engineering_spark.sources.tables import load_table

QUERIES = all_queries()
SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_5pct(spark):
    approx = {r["l_returnflag"]: r for r in QUERIES["x01_approx_distinct"](spark, SF).collect()}
    l = load_table(spark, SF, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        # rsd=0.02 → ~3σ bound of 6-7%
        assert abs(a["approx_orders"] - e["orders"]) / e["orders"] < 0.07
        assert abs(a["approx_parts"] - e["parts"]) / e["parts"] < 0.07


def test_approx_quantiles_ordered_and_bounded(spark):
    rows = QUERIES["x02_approx_quantiles"](spark, SF).collect()
    o = load_table(spark, SF, "orders")
    bounds = {
        r["o_orderstatus"]: (r["lo"], r["hi"])
        for r in o.groupBy("o_orderstatus")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = bounds[r["o_orderstatus"]]
        assert lo <= r["p50"] <= r["p95"] <= r["p99"] <= hi
