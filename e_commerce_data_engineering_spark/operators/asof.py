"""As-of (nearest-neighbor-in-time) join — an operator Spark lacks
natively (SURVEY §2.3 notes it as expressible; reference has no joins
at all). Backward (nearest predecessor), forward (nearest successor),
nearest (either direction, ties backward), and an optional tolerance
bound, matching the pd.merge_asof surface.

Implementation is the scalable union+window pattern, NOT a range cross
join: tag both sides, union on (key, time), and carry the nearest right
payload across with ``last(..., ignoreNulls)`` (backward) or
``first(..., ignoreNulls)`` (forward) over an ordered window. One
shuffle on the key, no quadratic blowup, no driver-side merge —
survives 100 TB where a per-key ``pd.merge_asof`` in applyInPandas
would need the whole key group in memory anyway (that variant is the
fallback for small skewed keys). Tolerance is a post-filter on the
matched timestamp, so it never changes the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    how: str = "inner",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``on`` key: greatest ``right_time`` <= ``left_time`` (backward) or
    smallest ``right_time`` >= ``left_time`` (forward); exact matches
    included, like pd.merge_asof(allow_exact_matches=True) / DuckDB
    ASOF JOIN.

    ``how``: 'inner' drops left rows with no match; 'left' keeps them
    with null payload. ``tolerance_seconds`` voids matches farther than
    the bound (timestamps compare as epoch seconds, numerics as-is).
    Ties on ``right_time`` within a key break deterministically by the
    JSON text of the payload (orderable for ANY payload type, including
    maps, unlike ordering by the struct itself).
    """
    assert direction in ("backward", "forward", "nearest"), direction
    payload = F.struct(
        *[F.col(c) for c in payload_cols], F.col(right_time).alias("_asof_time")
    )
    # side ordering puts right rows at equal time INSIDE the left row's
    # window span: before it for backward, after it for forward.
    # 'nearest' uses the backward ordering: an exact-time match lands in
    # the backward pick, and Δ=0 always wins the nearest comparison, so
    # the forward pick missing exact ties is harmless.
    r_side, l_side = (0, 1) if direction in ("backward", "nearest") else (1, 0)
    # The whole left row rides through the union as one struct, so the
    # match comes back without a rowid join — no second shuffle, and no
    # monotonically_increasing_id to misalign under plan recomputation.
    lrow = F.struct(*[F.col(c) for c in left.columns])
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(r_side).alias("_side"),
        payload.alias("_payload"),
        F.to_json(payload).alias("_tb"),
    )
    lrow_type = left.select(lrow.alias("_lrow")).schema["_lrow"].dataType
    r = r.withColumn("_lrow", F.lit(None).cast(lrow_type))
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.lit(None).cast("string").alias("_tb"),
        lrow.alias("_lrow"),
    )
    base_w = W.partitionBy("_k").orderBy("_t", "_side", "_tb")
    if direction == "nearest":
        # both picks ride the SAME union and window sort — still one
        # shuffle; the closer |Δt| wins, ties break backward (the
        # pd.merge_asof 'nearest' convention)
        wb = base_w.rowsBetween(W.unboundedPreceding, W.currentRow)
        wf = base_w.rowsBetween(W.currentRow, W.unboundedFollowing)
        back = F.last("_payload", ignorenulls=True).over(wb)
        fwd = F.first("_payload", ignorenulls=True).over(wf)
        gb = F.abs(F.col("_t").cast("double") - back["_asof_time"].cast("double"))
        gf = F.abs(F.col("_t").cast("double") - fwd["_asof_time"].cast("double"))
        pick_expr = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(gf < gb, fwd)
            .otherwise(back)
        )
        merged = (
            r.unionByName(l)
            .withColumn("_match", pick_expr)
            .filter(F.col("_side") == l_side)
            .select("_t", "_lrow", "_match")
        )
    else:
        if direction == "backward":
            w = base_w.rowsBetween(W.unboundedPreceding, W.currentRow)
            pick = F.last("_payload", ignorenulls=True)
        else:
            w = base_w.rowsBetween(W.currentRow, W.unboundedFollowing)
            pick = F.first("_payload", ignorenulls=True)
        merged = (
            r.unionByName(l)
            .withColumn("_match", pick.over(w))
            .filter(F.col("_side") == l_side)
            .select("_t", "_lrow", "_match")
        )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("_t").cast("double") - F.col("_match._asof_time").cast("double")
        )
        merged = merged.withColumn(
            "_match", F.when(gap <= F.lit(float(tolerance_seconds)), F.col("_match"))
        )
    if how == "inner":
        merged = merged.filter(F.col("_match").isNotNull())
    out = merged.select("_lrow.*", "_match")
    for c in payload_cols:
        out = out.withColumn(c, F.col("_match")[c])
    return out.withColumn("_asof_time", F.col("_match._asof_time")).drop("_match")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Nearest-predecessor as-of join (see ``asof_join``)."""
    return asof_join(
        left, right, on, left_time, right_time, payload_cols, how, "backward"
    )
