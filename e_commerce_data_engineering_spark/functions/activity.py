"""Rolling-activity analytics shared by the batch query surface (e14)
and its streaming twin (streaming/pipeline.start_active_users_stream):
ONE definition of the DAU/WAU computation, two drivers — the same
batch/stream parity guarantee the order pipeline makes.

The trailing distinct is computed by EXPLODING each (day, user) pair
into the ``window_days`` target days it contributes to, then one
distinct aggregation per target day — the shuffle-friendly form of a
sliding COUNT DISTINCT (a RANGE-frame distinct would materialize every
window's user set per row). The minimal exact state for this metric is
the distinct (day, user) set itself, which is what the streaming twin
maintains incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rolling_active_users(day_user: DataFrame, window_days: int = 7) -> DataFrame:
    """(d: date, user_id) distinct pairs → one row per day with events:
    (day, dau, wau, stickiness). ``wau`` is the trailing
    ``window_days``-day distinct user count; ``stickiness`` = dau/wau
    floor-rounded to 4dp (engine-portable rounding)."""
    contrib = day_user.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), window_days - 1))
        ).alias("target_day"),
        "user_id",
    )
    wau = contrib.groupBy("target_day").agg(F.countDistinct("user_id").alias("wau"))
    dau = day_user.groupBy(F.col("d").alias("target_day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    return dau.join(wau, "target_day").select(
        # string day: DuckDB DATE round-trips as midnight Timestamp
        # through pandas, so both engines emit 'yyyy-MM-dd' text
        F.date_format("target_day", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau",
        (
            F.floor(F.col("dau").cast("double") / F.col("wau") * F.lit(10000.0) + F.lit(0.5))
            / F.lit(10000.0)
        ).alias("stickiness"),
    )
