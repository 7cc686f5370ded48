"""As-of (nearest-predecessor) join — an operator Spark lacks natively
(SURVEY §2.3 notes it as expressible; reference has no joins at all).

Implementation is the scalable union+window pattern, NOT a range cross
join: tag both sides, union on (key, time), and carry the latest right
payload forward with ``last(..., ignoreNulls)`` over an ordered window.
One shuffle on the key, no quadratic blowup, no driver-side merge —
survives 100 TB where a per-key ``pd.merge_asof`` in applyInPandas
would need the whole key group in memory anyway (that variant is the
fallback for small skewed keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time`` ≤ ``left_time`` within the same ``on`` key
    (allow_exact_matches=True, like pd.merge_asof / DuckDB ASOF JOIN).

    ``how``: 'inner' drops left rows with no predecessor; 'left' keeps
    them with null payload.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols], F.col(right_time).alias("_asof_time"))
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),  # right sorts before left at equal time → exact matches included
        payload.alias("_payload"),
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    # stable id to join the matched payload back to full left rows
    l_full = left.withColumn("_rowid", F.monotonically_increasing_id())
    l = l_full.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        "_rowid",
    )
    r = r.withColumn("_rowid", F.lit(None).cast("long"))

    w = (
        W.partitionBy("_k")
        .orderBy("_t", "_side", "_rowid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    merged = (
        r.unionByName(l)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select("_rowid", "_match")
    )
    out = l_full.join(merged, "_rowid", "inner").drop("_rowid")
    if how == "inner":
        out = out.filter(F.col("_match").isNotNull())
    for c in payload_cols:
        out = out.withColumn(c, F.col("_match")[c])
    out = out.withColumn("_asof_time", F.col("_match._asof_time")).drop("_match")
    return out
