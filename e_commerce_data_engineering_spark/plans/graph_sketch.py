"""Graph analytics and sketch queries (SURVEY §2.11 extensions).

Both families share the scale discipline of the rest of the engine:
iterative algorithms keep driver state bounded to scalars (PageRank —
operators/graph.py), and sketches keep shuffle state bounded to a fixed
grid regardless of input size (count-min — operators/sketch.py). Neither
is ANSI-SQL-expressible (iteration / Spark-specific xxhash64), so the
driver records the rows-only check; the real correctness gates are the
differential tests: PageRank vs a dense numpy power iteration
(tests/test_graph_sketch.py) and CMS estimates vs exact counts with the
eps*N guarantee asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .money import fround
from .registry import query


def supplier_customer_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed edge list of the transaction graph: supplier <-> customer
    whenever a lineitem links them through its order. Both directions are
    emitted (the co-purchase random walk alternates sides); node ids are
    prefixed ('s'/'c') so the two key spaces cannot collide."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )
    return pairs.union(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


@query(
    "g01_pagerank",
    oracle=None,  # power iteration — not SQL-expressible
    doc="PageRank over the supplier–customer transaction graph: Pregel-"
    "style power iteration as one edge join + one aggregation per round "
    "(operators/graph.py), dangling mass redistributed, driver sees two "
    "doubles per round. Differential-tested against a dense numpy power "
    "iteration on the same graph. Ranks are floor-rounded to 1e-8 so "
    "output values are join-order independent.",
)
def g01_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    edges = supplier_customer_edges(spark, sf_dir)
    # fixed 12 rounds (staticPageRank mode): deterministic cost and
    # output; the numpy differential test runs the same 12 rounds
    ranks = pagerank(edges, damping=0.85, max_iter=12)
    return ranks.select("node", fround(F.col("rank"), 8).alias("rank"))


TOP_TOKENS = 10
CMS_EPS = 0.005
CMS_DELTA = 0.01


@query(
    "x04_cms_heavy_hitters",
    oracle=None,  # estimates hinge on Spark's xxhash64 — no DuckDB twin
    doc="Count-min-sketch frequency estimates for the corpus's top "
    f"{TOP_TOKENS} tokens: the sketch grid is O(depth*width) state "
    "however large the corpus, and grids from table shards merge by "
    "addition (operators/sketch.py). Output carries the exact count "
    "next to the estimate; est >= exact always, and the eps*N "
    "overestimate bound is asserted in tests. At 100 TB the exact "
    "groupBy here is replaced by probing candidate keys (e.g. "
    "per-partition tops) against the same sketch.",
)
def x04_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens
    from ..operators.sketch import cms_build, cms_estimate

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(F.col("text"))).alias("token"))
    sketch = cms_build(toks, "token", CMS_EPS, CMS_DELTA)
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("token"))
        .limit(TOP_TOKENS)
    )
    est = cms_estimate(sketch, exact.select("token"), "token", CMS_EPS, CMS_DELTA)
    return (
        exact.join(est, "token")
        .select("token", "exact_cnt", F.col("est").alias("cms_est"))
        .orderBy(F.col("exact_cnt").desc(), F.col("token"))
    )
