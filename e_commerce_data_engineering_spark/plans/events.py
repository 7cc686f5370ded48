"""Event-stream analytics over the ``events`` table (SURVEY §2.9 batch
views; the streaming variants of the same logic live in ``streaming/``).

Covers: JSON prop extraction (reference F23 / S2), tumbling time-window
aggregation, gap-based sessionization (lag + cumulative-sum pattern),
and exact-median stats — all shuffle-on-key operations that scale
linearly with the event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.tables import load_table
from .money import dmoney, fround, money_avg, money_sum, sql_fround, sql_money_avg, sql_money_sum
from .registry import query

SESSION_GAP_MS = 30 * 60 * 1000  # 30-minute inactivity gap


@query(
    "e01_json_extract",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           {sql_fround("CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*)", 4)} AS avg_k
    FROM events
    GROUP BY event_type
    """,
    doc="JSON-in-string prop extraction (reference F23: json.loads per row "
    "→ F.get_json_object, JVM-side).",
)
def e01_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        fround(F.sum(k).cast("double") / F.count(F.lit(1)), 4).alias("avg_k"),
    )


@query(
    "e02_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour window aggregation (batch twin of the streaming "
    "windowed agg, SURVEY §2.9).",
)
def e02_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), money_sum(dmoney("value")).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@query(
    "e03_sessionize",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > {SESSION_GAP_MS}
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    ),
    per_session AS (
        SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT)      AS n_sessions,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events,
           {sql_fround("CAST(SUM(n_events) AS DOUBLE) / COUNT(*)", 4)} AS avg_session_events
    FROM per_session
    GROUP BY user_id
    """,
    doc="Gap-based sessionization: lag(ts) → new-session flag → cumulative "
    "sum as session id (classic Spark sessionization pattern; the "
    "streaming twin uses session_window).",
)
def e03_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    prev_ms = F.lag(ms).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        F.when(prev_ms.isNull() | ((ms - prev_ms) > SESSION_GAP_MS), 1).otherwise(0).alias(
            "new_session"
        ),
    )
    wsum = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = flagged.select("user_id", F.sum("new_session").over(wsum).alias("session_id"))
    per_session = sessions.groupBy("user_id", "session_id").agg(F.count("*").alias("n_events"))
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        fround(F.sum("n_events").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_session_events"
        ),
    )


@query(
    "e04_event_type_stats",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value,
           {sql_money_avg("CAST(value AS DECIMAL(12,2))")} AS avg_value,
           {sql_fround("CAST(quantile_cont(value, 0.5) AS DOUBLE)", 4)} AS median_value
    FROM events
    GROUP BY event_type
    """,
    doc="Per-type stats incl. exact interpolated median (Spark percentile "
    "⇔ DuckDB quantile_cont).",
)
def e04_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        money_avg(dmoney("value")).alias("avg_value"),
        fround(F.percentile("value", F.lit(0.5)), 4).alias("median_value"),
    )


@query(
    "e05_multi_granularity_rollup",
    oracle=f"""
    SELECT COALESCE(CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR), 'ALL')  AS day,
           COALESCE(CAST(date_trunc('hour', ts) AS VARCHAR), 'ALL') AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_fround("CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)", 2)} AS total_value
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    """,
    doc="Hypertable-style multi-granularity time rollup: one pass emits "
    "hour, day, and grand-total tiers via ROLLUP (partial aggregation "
    "makes the coarser tiers nearly free — the continuous-aggregate "
    "pattern at 100 TB).",
)
def e05_multi_granularity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.date_trunc("day", "ts").alias("_d"),
            F.date_trunc("hour", "ts").alias("_h"),
            "value",
        )
        .rollup("_d", "_h")
        .agg(
            F.count("*").alias("n"),
            fround(F.sum(dmoney("value")).cast("double"), 2).alias("total_value"),
        )
        .select(
            F.coalesce(F.col("_d").cast("string"), F.lit("ALL")).alias("day"),
            F.coalesce(F.col("_h").cast("string"), F.lit("ALL")).alias("hour"),
            "n",
            "total_value",
        )
    )


@query(
    "q33_map_funcs",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           array_to_string(list_sort(array_agg(event_type)), ',') AS keys,
           CAST(SUM(n) AS BIGINT)                                 AS total_events,
           CAST(COALESCE(SUM(n) FILTER (event_type = 'click'), 0) AS BIGINT) AS clicks,
           CAST(COUNT(*) AS INTEGER)                              AS n_types,
           BOOL_OR(event_type = 'error')                          AS has_error
    FROM c GROUP BY user_id
    """,
    doc="Map-function battery (§2.8 beyond-construction): per-user "
    "event_type→count map built with map_from_entries, then consumed "
    "via map_keys / map_values / element_at / size / "
    "map_contains_key. Oracle computes the same semantics "
    "relationally (maps canonicalized through sorted keys).",
)
def q33_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    m = (
        e.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("event_type", "n")))
            ).alias("m")
        )
    )
    return m.select(
        "user_id",
        F.array_join(F.map_keys("m"), ",").alias("keys"),
        F.aggregate(F.map_values("m"), F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "total_events"
        ),
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0).cast("bigint")).alias("clicks"),
        F.size("m").alias("n_types"),
        F.map_contains_key("m", F.lit("error")).alias("has_error"),
    )


@query(
    "e06_sliding_window",
    oracle=f"""
    WITH expanded AS (
        SELECT time_bucket(INTERVAL '15 minutes', ts) - i * INTERVAL '15 minutes' AS window_start,
               event_type, value
        FROM events, range(0, 4) t(i)
    )
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_fround("CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)", 2)} AS total_value
    FROM expanded
    GROUP BY 1, 2
    """,
    doc="Sliding (hopping) 1h/15min window aggregation: each event lands "
    "in 4 overlapping windows (F.window with slideDuration). Oracle "
    "expands events x 4 hop offsets relationally.",
)
def e06_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), money_sum(dmoney("value")).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@query(
    "e07_funnel_stages",
    oracle="""
    WITH s1 AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        FROM events GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND s1.t_view IS NOT NULL AND e.ts >= s1.t_view
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s2.t_click
        GROUP BY e.user_id
    )
    SELECT CAST(COUNT(s1.t_view) AS BIGINT)                       AS n_view,
           CAST(COUNT(s2.t_click) AS BIGINT)                      AS n_click_after_view,
           CAST(COUNT(s3.t_purchase) AS BIGINT)                   AS n_purchase_after_click,
           CAST(SUM(epoch_ms(s3.t_purchase) - epoch_ms(s1.t_view)) AS BIGINT) AS total_conversion_ms
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
    doc="Sequential conversion funnel (view → click → purchase): per "
    "user, first view, first click at-or-after it, first purchase "
    "at-or-after that click — three conditional-min aggregations "
    "chained by equi-joins on user_id (each partial-agg friendly, all "
    "co-partitionable on the user key at 100 TB). Counts per stage "
    "plus total view→purchase conversion time in exact integer ms.",
)
def e07_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1.filter(F.col("t_view").isNotNull()), "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    joined = s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    return joined.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click_after_view"),
        F.count("t_purchase").alias("n_purchase_after_click"),
        F.sum(
            F.unix_millis(F.col("t_purchase").cast("timestamp"))
            - F.unix_millis(F.col("t_view").cast("timestamp"))
        ).alias("total_conversion_ms"),
    )


_WEEK_MS = 7 * 86400 * 1000


@query(
    "e08_cohort_retention",
    oracle=f"""
    WITH weeks AS (
        SELECT user_id, CAST(FLOOR(epoch_ms(ts) / {_WEEK_MS}) AS BIGINT) AS week
        FROM events
    ),
    cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id),
    activity AS (SELECT DISTINCT user_id, week FROM weeks)
    SELECT cohort_week,
           CAST(a.week - c.cohort_week AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM activity a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
    doc="Cohort retention matrix: users bucketed by first-activity week, "
    "counted in each subsequent week they return. Weeks are absolute "
    "epoch-week indexes (floor(epoch_ms / week_ms)) rather than "
    "calendar truncation, so both engines agree without sharing "
    "week-start conventions. Two aggregations + one equi-join, all "
    "keyed on user_id — co-partitionable at 100 TB.",
)
def e08_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    weeks = ev.select(
        "user_id",
        F.floor(F.unix_millis(F.col("ts").cast("timestamp")) / _WEEK_MS).alias("week"),
    )
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = weeks.distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


PATH_TOP_K = 10


@query(
    "e09_session_paths",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > {30 * 60 * 1000}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_type, ts, event_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {PATH_TOP_K}
    """,
    doc="Session path-sequence mining: gap-sessionize (same rule as "
    "e03), concatenate each session's ordered event types into a path "
    "string, rank the most common paths — the navigation-pattern query "
    "behind funnel design. Ordering inside the aggregate is made "
    "deterministic on both engines by sorting (ts, event_id) structs "
    "before joining (Spark collect_list has no ORDER BY; array_sort "
    "of structs is the portable equivalent of DuckDB's ordered "
    "string_agg).",
)
def e09_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    prev_ms = F.lag(ms).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(prev_ms.isNull() | ((ms - prev_ms) > SESSION_GAP_MS), 1).otherwise(0).alias(
            "new_session"
        ),
    )
    wsum = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_session").over(wsum).alias("session_id"),
    )
    paths = sessions.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOP_K)
    )


# ---------------------------------------------------------------------------
# e15 — exponentially-decayed trending scores
# ---------------------------------------------------------------------------

E15_HALFLIFE_US = 7 * 86_400_000_000  # 7-day half-life, in microseconds


@query(
    "e15_trending_decay",
    oracle=f"""
    WITH ref AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events),
    q AS (
        SELECT event_type,
               CAST(FLOOR(
                 value * POWER(0.5, (ref_us - epoch_us(ts)) / {float(E15_HALFLIFE_US)})
                 * 1000000.0 + 0.5) AS BIGINT) AS dq
        FROM events CROSS JOIN ref
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_fround("CAST(SUM(dq) AS DOUBLE) / 1000000.0", 6)} AS trend_score,
           CAST(ROW_NUMBER() OVER (
                ORDER BY SUM(dq) DESC, event_type) AS BIGINT) AS trend_rank
    FROM q GROUP BY event_type
    """,
    doc="Time-decayed trending scores per event type: each event's "
    "value is weighted by 0.5^(age/7d) relative to the corpus's newest "
    "event, so recent activity dominates — the 'trending now' ranking "
    "primitive (the streaming analog folds the same decayed partials "
    "per batch). Ages are exact integer microsecond differences; the "
    "single libm call (pow) is 1e-6-quantized PER EVENT before the "
    "integer sum (the t25 discipline), so the aggregate is independent "
    "of both summation order and engine. One scan, one aggregate; the "
    "reference timestamp is a broadcast one-row frame, never a "
    "correlated subquery per row.",
)
def e15_trending_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ref = e.agg(F.max(F.unix_micros("ts")).alias("ref_us"))
    dq = F.floor(
        F.col("value")
        * F.pow(
            F.lit(0.5),
            (F.col("ref_us") - F.unix_micros("ts")) / F.lit(float(E15_HALFLIFE_US)),
        )
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("bigint")
    # single-partition window is intentional: it ranks the groupBy
    # result, one row per distinct event_type (a handful of rows)
    w = W.orderBy(F.col("_sum_dq").desc(), "event_type")
    return (
        e.crossJoin(F.broadcast(ref))
        .select("event_type", dq.alias("dq"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("dq").alias("_sum_dq"))
        .select(
            "event_type",
            "n_events",
            fround(F.col("_sum_dq").cast("double") / F.lit(1000000.0), 6).alias(
                "trend_score"
            ),
            F.row_number().over(w).cast("bigint").alias("trend_rank"),
        )
    )


@query(
    "e16_variant_props",
    oracle=f"""
    SELECT event_type,
           CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT)
             AS k_decade,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY 1, 2
    """,
    doc="Semi-structured props via Spark 4 VariantType: parse_json once "
    "into a variant column, then typed try_variant_get extraction — "
    "the modern replacement for per-query get_json_object string "
    "re-parsing (e01 keeps the classic path): a variant parses each "
    "row ONCE into a binary-encoded tree that every downstream "
    "extraction shares, the right shape when one JSON column feeds "
    "many projections at 100 TB. Histogram of k by decade bucket per "
    "event type; the oracle extracts the same fields from the raw "
    "JSON, pinning variant-path values to the string-path semantics.",
)
def e16_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_type", F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "bigint")
    return (
        v.select("event_type", k.alias("k"))
        .groupBy("event_type", F.floor(F.col("k") / 10).cast("bigint").alias("k_decade"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# e17 — EWMA-smoothed daily series
# ---------------------------------------------------------------------------

E17_ALPHA = 0.3  # smoothing factor; decay (1-alpha) per day


@query(
    "e17_ewma_daily",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS daily_total
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type, a.day,
               CAST(FLOOR(b.daily_total
                          * POWER({1.0 - E17_ALPHA}, date_diff('day', b.day, a.day))
                          * 1000000.0 + 0.5) AS BIGINT) AS nq,
               CAST(FLOOR(POWER({1.0 - E17_ALPHA}, date_diff('day', b.day, a.day))
                          * 1000000.0 + 0.5) AS BIGINT) AS dq
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.day <= a.day
    )
    SELECT p.event_type, strftime(p.day, '%Y-%m-%d') AS day, d.daily_total,
           {sql_fround("CAST(SUM(nq) AS DOUBLE) / SUM(dq)", 6)} AS ewma
    FROM pairs p JOIN daily d ON d.event_type = p.event_type AND d.day = p.day
    GROUP BY p.event_type, p.day, d.daily_total
    """,
    doc=f"EWMA-smoothed daily revenue per event type (adjusted "
    f"exponential weighting, alpha={E17_ALPHA} — pandas ewm(adjust="
    "True) semantics): ewma_t = Sum((1-a)^(t-i)·x_i) / Sum((1-a)^"
    "(t-i)). Daily totals come from one exact DECIMAL aggregate; the "
    "decay terms are per-(t,i) 1e-6-quantized integers before the "
    "sums (the e15 discipline), so smoothing is engine- and order-"
    "independent. The t×i pair join is per-type and bounded by the "
    "series length — days, not events — so at 100 TB the heavy "
    "aggregation happens once and the smoothing pass touches only "
    "the tiny daily frame. The time-series smoothing primitive next "
    "to e10's anomaly z-scores.",
)
def e17_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("daily_total")
        )
    )
    a = daily.select(
        "event_type", "day", F.col("daily_total").alias("_xa")
    )
    b = daily.select(
        F.col("event_type").alias("_et2"),
        F.col("day").alias("_day2"),
        F.col("daily_total").alias("_xb"),
    )
    decay = F.pow(F.lit(1.0 - E17_ALPHA), F.datediff(F.col("day"), F.col("_day2")))
    pairs = a.join(
        b, (a["event_type"] == b["_et2"]) & (b["_day2"] <= a["day"])
    ).select(
        "event_type",
        "day",
        F.floor(F.col("_xb") * decay * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("nq"),
        F.floor(decay * F.lit(1000000.0) + F.lit(0.5)).cast("bigint").alias("dq"),
    )
    sm = pairs.groupBy("event_type", "day").agg(
        F.sum("nq").alias("_n"), F.sum("dq").alias("_d")
    )
    return sm.join(daily, ["event_type", "day"]).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "daily_total",
        fround(F.col("_n").cast("double") / F.col("_d"), 6).alias("ewma"),
    )


@query(
    "e18_transition_matrix",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    row_tot AS (
        SELECT prev_type, CAST(SUM(n) AS BIGINT) AS tot
        FROM trans GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type, t.n,
           {sql_fround("CAST(t.n AS DOUBLE) / r.tot", 6)} AS p
    FROM trans t JOIN row_tot r ON t.prev_type = r.prev_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: LAG within (user ORDER BY ts, event_id — total order, "
    "so ties are deterministic) pairs each event with its predecessor; "
    "counts normalize to row-stochastic transition probabilities. The "
    "sequence-mining primitive behind next-event prediction and "
    "funnel-drop analysis (e09 mines whole session paths; this is the "
    "aggregated one-step view). One window shuffle on user_id + two "
    "aggregates; the matrix is |event_types|² small regardless of "
    "input size.",
)
def e18_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = trans.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return trans.join(F.broadcast(row_tot), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        fround(F.col("n").cast("double") / F.col("tot"), 6).alias("p"),
    )


_Q69_DOWS = ("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")


@query(
    "q69_pivot_weekday",
    oracle=f"""
    SELECT event_type,
           {", ".join(
               f"CAST(SUM(CASE WHEN strftime(ts, '%a') = '{d}' THEN 1 ELSE 0 END) AS BIGINT) AS {d}"
               for d in _Q69_DOWS
           )}
    FROM events GROUP BY event_type
    """,
    doc="PIVOT / crosstab: event counts as an event_type × weekday "
    "grid via DataFrame.pivot with an EXPLICIT pivot-value list — "
    "without it Spark runs an extra distinct-scan job to discover "
    "columns and the schema becomes data-dependent (non-deterministic "
    "output columns would break any downstream contract, and the "
    "driver's schema hash). Catalyst compiles the pivot to one "
    "partial+final aggregate with a conditional-count per listed "
    "value — exactly the oracle's CASE form, one shuffle.",
)
def q69_pivot_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.select("event_type", F.date_format("ts", "EEE").alias("dow"))
        .groupBy("event_type")
        .pivot("dow", list(_Q69_DOWS))
        .count()
        .select(
            "event_type",
            *[F.coalesce(F.col(d), F.lit(0)).cast("bigint").alias(d) for d in _Q69_DOWS],
        )
    )


@query(
    "e19_new_vs_returning",
    oracle=f"""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    first_seen AS (SELECT user_id, MIN(day) AS first_day FROM du GROUP BY user_id)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning,
           {sql_fround(
               "CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS DOUBLE)"
               " / COUNT(*)", 6)} AS new_share
    FROM du JOIN first_seen USING (user_id)
    GROUP BY day
    """,
    doc="New-vs-returning daily active users: each (day, user) row is "
    "classified by whether the day is that user's first-ever active "
    "day — the acquisition/retention split every growth dashboard "
    "leads with (e08's cohort matrix generalizes it; this is the "
    "one-line daily view). One distinct (day, user) frame, one min-"
    "aggregate for first-seen, one equi-join back on user_id — all "
    "keyed shuffles; no window over history, so the plan is "
    "incremental-friendly (the streaming analog keeps first_seen as "
    "the e14-style growing state).",
)
def e19_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    du = e.select(
        F.col("ts").cast("timestamp").cast("date").alias("day"), "user_id"
    ).distinct()
    first_seen = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    new_flag = F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
    ret_flag = F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)
    return (
        du.join(first_seen, "user_id")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum(new_flag).alias("n_new"),
            F.sum(ret_flag).alias("n_returning"),
            fround(
                F.sum(new_flag).cast("double") / F.count(F.lit(1)), 6
            ).alias("new_share"),
        )
    )


E20_WINDOW_MIN = 120  # fixed window width (minutes)
E20_BURST = 3  # events in one window that count as a burst


@query(
    "e20_burst_users",
    oracle=f"""
    WITH win AS (
        SELECT user_id,
               time_bucket(INTERVAL '{E20_WINDOW_MIN} minutes', ts) AS w,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(MAX(n) AS BIGINT) AS max_burst,
           CAST(SUM(CASE WHEN n >= {E20_BURST} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_burst_windows
    FROM win GROUP BY user_id
    HAVING SUM(CASE WHEN n >= {E20_BURST} THEN 1 ELSE 0 END) > 0
    """,
    doc=f"Burst detection: users with any {E20_WINDOW_MIN}-minute window "
    f"containing >= {E20_BURST} events — the rate-limit/abuse screen an "
    "event pipeline runs before sessions and funnels trust the data "
    "(a scraper's burst profile poisons e03's session stats and e14's "
    "DAU). Two keyed aggregates (window bucket, then user rollup with "
    "HAVING); fixed windows rather than sliding, so each event lands "
    "in exactly one bucket and the first aggregate is map-side "
    "combinable — the sliding variant is e06's frame. Streaming twin "
    "is the watermarked windowed count (streaming/pipeline."
    "windowed_event_counts) keyed by user.",
)
def e20_burst_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    win = e.groupBy(
        "user_id", F.window("ts", f"{E20_WINDOW_MIN} minutes").alias("w")
    ).agg(F.count(F.lit(1)).alias("n"))
    burst = F.when(F.col("n") >= E20_BURST, 1).otherwise(0)
    return (
        win.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.max("n").alias("max_burst"),
            F.sum(burst).alias("n_burst_windows"),
        )
        .filter(F.col("n_burst_windows") > 0)
    )


@query(
    "e21_last_touch_attribution",
    oracle=f"""
    WITH attr AS (
        SELECT event_type, value,
               COALESCE(
                   LAST_VALUE(CASE WHEN event_type <> 'purchase'
                                   THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   'direct') AS channel
        FROM events
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           {sql_money_sum("CAST(value AS DECIMAL(12,2))")} AS attributed_value,
           {sql_money_avg("CAST(value AS DECIMAL(12,2))")} AS avg_value
    FROM attr
    WHERE event_type = 'purchase'
    GROUP BY channel
    """,
    doc="Last-touch revenue attribution: each purchase's value is "
    "credited to the user's most recent preceding non-purchase event "
    "type ('direct' when the purchase is the user's first event) — "
    "the marketing-attribution query behind every channel-ROI "
    "dashboard. One window per user (last-ignore-nulls over an "
    "unbounded-preceding frame — Spark and DuckDB share the "
    "IGNORE NULLS frame semantics) plus one keyed aggregate; the "
    "per-user history ordering is the same single shuffle "
    "sessionization (e03) already pays, so at 100 TB this rides the "
    "events table's user_id partitioning. Money sums are "
    "DECIMAL-exact (order-independent) before the final cast.",
)
def e21_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prior = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    attr = e.select(
        "event_type", "value", F.coalesce(prior, F.lit("direct")).alias("channel")
    )
    return (
        attr.filter(F.col("event_type") == "purchase")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            money_sum(dmoney("value")).alias("attributed_value"),
            money_avg(dmoney("value")).alias("avg_value"),
        )
    )


def daily_totals(e: DataFrame) -> DataFrame:
    """(event_type, day, day_total DECIMAL) — the additive sufficient
    statistic behind e22/e23; decimal totals re-fold exactly under any
    batch split, which is what lets the streaming twin store THIS frame
    and run the non-additive finalizers below at read time."""
    return e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(dmoney("value")).alias("day_total"))


def seasonality_from_daily(daily: DataFrame) -> DataFrame:
    """e22 finalizer over a (event_type, day, day_total) frame."""
    d = daily.withColumn("dow", F.weekday(F.col("day")) + F.lit(1))
    per_dow = d.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.sum("day_total").cast("double") / F.count(F.lit(1))).alias("dow_mean"),
    )
    overall = d.groupBy("event_type").agg(
        (F.sum("day_total").cast("double") / F.count(F.lit(1))).alias("all_mean")
    )
    return per_dow.join(overall, "event_type").select(
        "event_type",
        F.col("dow").cast("int").alias("dow"),
        "n_days",
        fround(F.col("dow_mean"), 2).alias("dow_mean_value"),
        fround(F.col("dow_mean") / F.col("all_mean"), 6).alias("seasonal_index"),
    )



@query(
    "e22_dow_seasonality",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               isodow(CAST(ts AS DATE)) AS dow,
               SUM(CAST(value AS DECIMAL(12,2))) AS day_total
        FROM events GROUP BY 1, 2, 3
    ),
    per_dow AS (
        SELECT event_type, dow,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(day_total) AS DOUBLE) / COUNT(*) AS dow_mean
        FROM daily GROUP BY 1, 2
    ),
    overall AS (
        SELECT event_type, CAST(SUM(day_total) AS DOUBLE) / COUNT(*) AS all_mean
        FROM daily GROUP BY 1
    )
    SELECT event_type, CAST(dow AS INTEGER) AS dow, n_days,
           {sql_fround("dow_mean", 2)} AS dow_mean_value,
           {sql_fround("dow_mean / all_mean", 6)} AS seasonal_index
    FROM per_dow JOIN overall USING (event_type)
    """,
    doc="Day-of-week seasonality index: mean daily revenue per (event "
    "type, ISO weekday) over the mean daily revenue of the type — "
    "index > 1 marks the hot weekdays, the decomposition a forecast "
    "(q46) divides out before trending. Two keyed aggregates over "
    "the same daily frame plus a 35-row join; daily totals are "
    "DECIMAL-exact so the means are order-independent, and the only "
    "doubles are two single divisions — hash-stable on both engines. "
    "ISO weekday = Spark weekday()+1 = DuckDB isodow().",
)
def e22_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonality_from_daily(daily_totals(load_table(spark, sf_dir, "events")))


def cusum_from_daily(daily: DataFrame) -> DataFrame:
    """e23 finalizer over a (event_type, day, day_total) frame."""
    wseq = W.partitionBy("event_type").orderBy("day")
    wall = W.partitionBy("event_type")
    series = daily.select(
        "event_type",
        "day",
        F.col("day_total").cast("double").alias("day_value"),
        F.sum("day_total")
        .over(wseq.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("run_total"),
        F.row_number().over(wseq).cast("bigint").alias("rn"),
        (
            F.sum("day_total").over(wall).cast("double")
            / F.count(F.lit(1)).over(wall)
        ).alias("mu"),
    )
    cu = series.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        fround(F.col("day_value"), 2).alias("day_value"),
        fround(F.col("run_total") - F.col("rn") * F.col("mu"), 2).alias("cusum"),
    )
    return cu.select(
        "*",
        (
            F.abs(F.col("cusum"))
            == F.max(F.abs(F.col("cusum"))).over(W.partitionBy("event_type"))
        ).alias("is_changepoint"),
    )



@query(
    "e23_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(12,2))) AS day_total
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type, day,
               CAST(day_total AS DOUBLE) AS day_value,
               CAST(SUM(day_total) OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS run_total,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS rn,
               CAST(SUM(day_total) OVER (PARTITION BY event_type) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY event_type) AS mu
        FROM daily
    ),
    cu AS (
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
               {sql_fround("day_value", 2)} AS day_value,
               {sql_fround("run_total - rn * mu", 2)} AS cusum
        FROM series
    )
    SELECT event_type, day, day_value, cusum,
           ABS(cusum) = MAX(ABS(cusum)) OVER (PARTITION BY event_type)
               AS is_changepoint
    FROM cu
    """,
    doc="CUSUM changepoint scan: per event type, the running sum of "
    "daily-revenue deviations from the type's mean; the day where "
    "|CUSUM| peaks is the most likely level-shift point (flagged, "
    "ties flagged alike). Deviations are folded as run_total - "
    "rn*mu over a DECIMAL-exact running sum, so the windowed "
    "accumulation is order-independent — the only doubles are one "
    "division and one multiply-subtract per row, identical IEEE ops "
    "on both engines (a naive double running sum would hash-drift: "
    "DuckDB folds windowed sums with a segment tree, Spark "
    "sequentially). Two windows over the same (type, day) frame = "
    "one shuffle; the daily pre-aggregate keeps the window input at "
    "days × types rows regardless of event volume.",
)
def e23_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cusum_from_daily(daily_totals(load_table(spark, sf_dir, "events")))


@query(
    "e24_ab_test",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS variant,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM events GROUP BY user_id
    ),
    v AS (
        SELECT variant,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sx2
        FROM per_user GROUP BY variant
    ),
    wide AS (
        SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
               MAX(CASE WHEN variant = 0 THEN sx END) AS sx_a,
               MAX(CASE WHEN variant = 0 THEN sx2 END) AS sx2_a,
               MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
               MAX(CASE WHEN variant = 1 THEN sx END) AS sx_b,
               MAX(CASE WHEN variant = 1 THEN sx2 END) AS sx2_b
        FROM v
    ),
    stats AS (
        SELECT n_a, n_b,
               CAST(sx_a AS DOUBLE) / n_a AS mean_a,
               CAST(sx_b AS DOUBLE) / n_b AS mean_b,
               (sx2_a - CAST(sx_a AS DOUBLE) * sx_a / n_a) / (n_a - 1) AS var_a,
               (sx2_b - CAST(sx_b AS DOUBLE) * sx_b / n_b) / (n_b - 1) AS var_b
        FROM wide
    )
    SELECT n_a, n_b,
           {sql_fround("mean_a", 6)} AS mean_a,
           {sql_fround("mean_b", 6)} AS mean_b,
           CASE WHEN var_a / n_a + var_b / n_b > 0 THEN
               {sql_fround(
                   "(mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b)", 6)}
           END AS z_stat
    FROM stats
    """,
    doc="A/B experiment readout: deterministic hash bucketing "
    "(user_id % 2 — how real assignment works, and reproducible "
    "across engines) and a Welch two-sample z on the per-user "
    "purchase count — a continuous engagement metric that cannot "
    "saturate the way a conversion flag does on dense data. Counts "
    "fold per user first (heavy users count once per user, not per "
    "event); means and variances come from exact integer (n, Σx, "
    "Σx²) sums, so the statistic is engine-exact IEEE arithmetic; "
    "zero-variance degenerate case yields NULL on both engines. One "
    "user-keyed aggregate (the same shuffle e14's DAU pays) then a "
    "2-row fold — at 100 TB the per-user frame is the only wide "
    "stage. Completes the experimentation stack over e16's "
    "variant-prop extraction.",
)
def e24_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("x")
    )
    v = per_user.groupBy(
        F.pmod(F.col("user_id"), F.lit(2)).cast("bigint").alias("variant")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
    )
    wide = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("sx"))).alias("sx_a"),
        F.max(F.when(F.col("variant") == 0, F.col("sx2"))).alias("sx2_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("sx"))).alias("sx_b"),
        F.max(F.when(F.col("variant") == 1, F.col("sx2"))).alias("sx2_b"),
    )
    mean_a = F.col("sx_a").cast("double") / F.col("n_a")
    mean_b = F.col("sx_b").cast("double") / F.col("n_b")
    var_a = (
        F.col("sx2_a") - F.col("sx_a").cast("double") * F.col("sx_a") / F.col("n_a")
    ) / (F.col("n_a") - 1)
    var_b = (
        F.col("sx2_b") - F.col("sx_b").cast("double") * F.col("sx_b") / F.col("n_b")
    ) / (F.col("n_b") - 1)
    se2 = var_a / F.col("n_a") + var_b / F.col("n_b")
    return wide.select(
        "n_a",
        "n_b",
        fround(mean_a, 6).alias("mean_a"),
        fround(mean_b, 6).alias("mean_b"),
        F.when(se2 > 0, fround((mean_a - mean_b) / F.sqrt(se2), 6)).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# e25 — late-event profile: the lateness distribution that SIZES a
# streaming watermark (how far behind the running event-time max do
# events actually arrive?)
# ---------------------------------------------------------------------------


@query(
    "e25_late_event_profile",
    oracle=f"""
    WITH e AS (
        SELECT event_type, CAST(ts AS DATE) AS day, event_id,
               epoch(ts) AS tsec
        FROM events
    ),
    lat AS (
        SELECT event_type, day,
               MAX(tsec) OVER (PARTITION BY event_type, day ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - tsec AS late
        FROM e
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late > 60 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_60s,
           CAST(SUM(CASE WHEN late > 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_300s,
           {sql_fround("MAX(late)", 3)} AS max_late_sec
    FROM lat GROUP BY event_type, day
    """,
    doc="Late-event profile — the measurement that sizes a Structured "
    "Streaming watermark BEFORE deploying one: treating event_id as "
    "arrival order (the generator's stand-in for ingestion sequence), "
    "each event's lateness is the running per-(type, day) event-time "
    "maximum minus its own event time; the rollup reports how many "
    "events arrive more than 60 s / 300 s behind the frontier and the "
    "worst straggler per group. Pick the watermark at the knee of "
    "these counts: `withWatermark` drops exactly the events this "
    "query counts (the streaming suite's watermark tests exercise the "
    "drop; this is the batch audit that chooses the bound). The "
    "running-max window partitions by (event_type, day), so partitions "
    "stay day-sized at any corpus scale; lateness is a DIFFERENCE of "
    "epoch seconds, so it is timezone-offset-invariant and "
    "engine-identical (microsecond-exact doubles).",
)
def e25_late_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tsec = F.col("ts").cast("double")
    e = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "event_id",
        tsec.alias("tsec"),
    )
    w = (
        W.partitionBy("event_type", "day")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    lat = e.select(
        "event_type", "day", (F.max("tsec").over(w) - F.col("tsec")).alias("late")
    )
    return lat.groupBy("event_type", F.date_format("day", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum((F.col("late") > 60).cast("int")).cast("bigint").alias("n_late_60s"),
        F.sum((F.col("late") > 300).cast("int")).cast("bigint").alias("n_late_300s"),
        fround(F.max("late"), 3).alias("max_late_sec"),
    )


# ---------------------------------------------------------------------------
# e26 — the watermark SIZING table: candidate delays at the lateness
# quantiles, each with the exact drop count it would incur — the batch
# twin of streaming.pipeline.choose_watermark_delay (which picks ONE
# quantile; this query shows the whole trade-off curve)
# ---------------------------------------------------------------------------

E26_QUANTILES = (0.90, 0.95, 0.99, 0.999)


@query(
    "e26_watermark_sizing",
    oracle=f"""
    WITH e AS (
        SELECT event_type, CAST(ts AS DATE) AS day, event_id,
               epoch(ts) AS tsec
        FROM events
    ),
    lat AS (
        SELECT MAX(tsec) OVER (PARTITION BY event_type, day ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) - tsec AS late
        FROM e
    ),
    p AS (
        SELECT
            {", ".join(f"CAST(CEIL(CAST(quantile_cont(late, {q}) AS DOUBLE)) AS BIGINT) AS d{i}" for i, q in enumerate(E26_QUANTILES))}
        FROM lat
    ),
    grid AS (
        {" UNION ALL ".join(f"SELECT {q} AS quantile, d{i} AS delay_sec FROM p" for i, q in enumerate(E26_QUANTILES))}
    )
    SELECT quantile, delay_sec,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late > delay_sec THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           {sql_fround("CAST(SUM(CASE WHEN late > delay_sec THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)", 6)}
             AS drop_fraction
    FROM grid CROSS JOIN lat
    GROUP BY quantile, delay_sec
    """,
    doc="The watermark TRADE-OFF table: for each lateness quantile "
    f"{E26_QUANTILES}, the whole-second delay that covers it (the "
    "value streaming.pipeline.choose_watermark_delay would pick) and "
    "the exact number/fraction of events a stream deployed with that "
    "delay would drop — the sizing decision laid out as data instead "
    "of a single choice. Lateness comes from the same per-(type, day) "
    "running-frontier measurement as e25; Spark percentile() and "
    "DuckDB quantile_cont() share the p·(n-1) linear interpolation "
    "(the q40 pattern), so the quantiles are bit-identical before the "
    "CEIL. The counting join broadcasts the 4-row delay grid against "
    "the lateness frame — one pass, no per-quantile rescans.",
)
def e26_watermark_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tsec = F.col("ts").cast("double")
    e = ev.select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        "event_id",
        tsec.alias("tsec"),
    )
    w = (
        W.partitionBy("event_type", "day")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    lat = e.select((F.max("tsec").over(w) - F.col("tsec")).alias("late"))
    pct = lat.agg(
        *[
            F.expr(f"percentile(late, {q})").alias(f"_p{i}")
            for i, q in enumerate(E26_QUANTILES)
        ]
    )
    stack_args = ", ".join(
        f"CAST({q} AS DOUBLE), CAST(CEIL(_p{i}) AS BIGINT)"
        for i, q in enumerate(E26_QUANTILES)
    )
    grid = pct.selectExpr(
        f"stack({len(E26_QUANTILES)}, {stack_args}) AS (quantile, delay_sec)"
    )
    return (
        lat.crossJoin(F.broadcast(grid))
        .groupBy("quantile", "delay_sec")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum((F.col("late") > F.col("delay_sec")).cast("int"))
            .cast("bigint")
            .alias("n_dropped"),
            fround(
                F.sum((F.col("late") > F.col("delay_sec")).cast("int")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("drop_fraction"),
        )
    )


# ---------------------------------------------------------------------------
# e27 — per-user inter-event time distribution: the arrival-spacing
# percentiles that size session gaps (e03), rate limits (e20), and
# state-store timeouts (streaming/stateful.py)
# ---------------------------------------------------------------------------


@query(
    "e27_interevent_gaps",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, event_id, epoch(ts) AS tsec FROM events
    ),
    g AS (
        SELECT event_type,
               tsec - LAG(tsec) OVER (PARTITION BY user_id
                                      ORDER BY tsec, event_id) AS gap
        FROM e
    )
    SELECT event_type,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           {sql_fround("CAST(quantile_cont(gap, 0.50) AS DOUBLE)", 4)} AS p50_s,
           {sql_fround("CAST(quantile_cont(gap, 0.90) AS DOUBLE)", 4)} AS p90_s,
           {sql_fround("CAST(quantile_cont(gap, 0.99) AS DOUBLE)", 4)} AS p99_s,
           {sql_fround("MAX(gap)", 3)} AS max_gap_s
    FROM g WHERE gap IS NOT NULL
    GROUP BY event_type
    """,
    doc="Per-user inter-event arrival spacing, rolled up per the "
    "arriving event's type: exact interpolated p50/p90/p99 gap "
    "seconds plus the worst gap — the distribution that SIZES a "
    "session gap (e03's 30 min), a burst window (e20), and a stateful "
    "operator's timeout (streaming/stateful.py) instead of guessing "
    "them. One LAG window partitioned by user (user-sized partitions "
    "at any scale), one percentile aggregate per type; gaps are "
    "epoch-second differences, so timezone-invariant and "
    "engine-exact; Spark percentile() and DuckDB quantile_cont() "
    "share the p·(n-1) interpolation (the q40 pattern).",
)
def e27_interevent_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tsec = F.col("ts").cast("double")
    w = W.partitionBy("user_id").orderBy(tsec, "event_id")
    g = ev.select(
        "event_type", (tsec - F.lag(tsec).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    return g.groupBy("event_type").agg(
        F.count("gap").cast("bigint").alias("n_gaps"),
        fround(F.expr("percentile(gap, 0.50)"), 4).alias("p50_s"),
        fround(F.expr("percentile(gap, 0.90)"), 4).alias("p90_s"),
        fround(F.expr("percentile(gap, 0.99)"), 4).alias("p99_s"),
        fround(F.max("gap"), 3).alias("max_gap_s"),
    )


# ---------------------------------------------------------------------------
# e28 — ordered funnel conversion; e29 — weekly retention cohorts (round 6)
# ---------------------------------------------------------------------------

_E28_STEPS = ("view", "click", "purchase")


@query(
    "e28_funnel_steps",
    oracle=f"""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = '{_E28_STEPS[0]}' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        WHERE e.event_type = '{_E28_STEPS[1]}' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        WHERE e.event_type = '{_E28_STEPS[2]}' GROUP BY e.user_id
    ),
    n AS (
        SELECT (SELECT COUNT(*) FROM v) AS n1,
               (SELECT COUNT(*) FROM c) AS n2,
               (SELECT COUNT(*) FROM p) AS n3
    )
    SELECT * FROM (
        SELECT 1 AS step_idx, '{_E28_STEPS[0]}' AS step,
               CAST(n1 AS BIGINT) AS n_users,
               {sql_fround("1.0", 6)} AS conv_from_prev,
               {sql_fround("1.0", 6)} AS conv_from_first
        FROM n
        UNION ALL
        SELECT 2, '{_E28_STEPS[1]}', CAST(n2 AS BIGINT),
               {sql_fround("CAST(n2 AS DOUBLE) / n1", 6)},
               {sql_fround("CAST(n2 AS DOUBLE) / n1", 6)}
        FROM n
        UNION ALL
        SELECT 3, '{_E28_STEPS[2]}', CAST(n3 AS BIGINT),
               {sql_fround("CAST(n3 AS DOUBLE) / n2", 6)},
               {sql_fround("CAST(n3 AS DOUBLE) / n1", 6)}
        FROM n
    ) t
    """,
    doc="Ordered funnel conversion (view → click → purchase): a user "
    "counts at step k only if step k's FIRST qualifying event falls "
    "STRICTLY AFTER their first event of step k−1 — the sequenced "
    "semantics product funnels need (a purchase before the first view "
    "doesn't convert). Each stage is one per-user MIN aggregate "
    "semi-joined to the previous stage's first-passage time, so the "
    "plan is k user-keyed shuffles over progressively SHRINKING user "
    "sets — never a per-user event-sequence sort, which is what makes "
    "it hold at 100 TB of events. Output: per-step reached counts, "
    "step-over-step and end-to-end conversion.",
)
def e28_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_passage(step: str, prev: DataFrame | None, t_prev: str, t_out: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == step)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(t_prev))
        return e.groupBy("user_id").agg(F.min("ts").alias(t_out))

    v = first_passage(_E28_STEPS[0], None, "", "t1")
    c = first_passage(_E28_STEPS[1], v, "t1", "t2")
    p = first_passage(_E28_STEPS[2], c, "t2", "t3")
    n = (
        v.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n3")))
    )
    one = fround(F.lit(1.0), 6)
    rows = [
        n.select(
            F.lit(1).alias("step_idx"),
            F.lit(_E28_STEPS[0]).alias("step"),
            F.col("n1").cast("bigint").alias("n_users"),
            one.alias("conv_from_prev"),
            one.alias("conv_from_first"),
        ),
        n.select(
            F.lit(2).alias("step_idx"),
            F.lit(_E28_STEPS[1]).alias("step"),
            F.col("n2").cast("bigint").alias("n_users"),
            fround(F.col("n2").cast("double") / F.col("n1"), 6).alias("conv_from_prev"),
            fround(F.col("n2").cast("double") / F.col("n1"), 6).alias("conv_from_first"),
        ),
        n.select(
            F.lit(3).alias("step_idx"),
            F.lit(_E28_STEPS[2]).alias("step"),
            F.col("n3").cast("bigint").alias("n_users"),
            fround(F.col("n3").cast("double") / F.col("n2"), 6).alias("conv_from_prev"),
            fround(F.col("n3").cast("double") / F.col("n1"), 6).alias("conv_from_first"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# epoch seconds of 2024-01-01 UTC — the fixed cohort-week origin; both
# engines compute week indexes as integer floor-divisions from it
_E29_ORIGIN = 1_704_067_200
_E29_WEEK = 604_800


@query(
    "e29_retention_cohorts",
    oracle=f"""
    WITH f AS (
        SELECT user_id,
               CAST(floor((epoch(MIN(ts)) - {_E29_ORIGIN}) / {_E29_WEEK}) AS BIGINT)
                 AS cohort_week
        FROM events GROUP BY user_id
    ),
    sz AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM f GROUP BY cohort_week
    ),
    a AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(floor((epoch(e.ts) - {_E29_ORIGIN}) / {_E29_WEEK}) AS BIGINT)
                 AS active_week
        FROM events e JOIN f ON e.user_id = f.user_id
    )
    SELECT a.cohort_week,
           a.active_week - a.cohort_week AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           sz.cohort_size,
           {sql_fround("CAST(COUNT(*) AS DOUBLE) / sz.cohort_size", 6)} AS retention
    FROM a JOIN sz ON a.cohort_week = sz.cohort_week
    GROUP BY a.cohort_week, a.active_week, sz.cohort_size
    """,
    doc="Weekly retention-cohort matrix: users cohort by the calendar "
    "week of their FIRST event (fixed epoch origin, so week indexes "
    "are engine-portable integer floor-divisions), and each "
    "(cohort_week, week_offset) cell counts distinct users from that "
    "cohort active that many weeks later — the canonical "
    "product-health triangle. Plan shape: one per-user MIN reduce for "
    "cohort assignment, one distinct over (user, week) — both "
    "user-keyed shuffles that partition cleanly at any scale — and "
    "the cohort-size dimension joins back broadcast-sized (one row "
    "per calendar week).",
)
def e29_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = lambda ts: F.floor((ts.cast("double") - _E29_ORIGIN) / _E29_WEEK).cast("bigint")  # noqa: E731
    f = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    sz = f.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    a = (
        ev.join(f, "user_id")
        .select("user_id", "cohort_week", week(F.col("ts")).alias("active_week"))
        .distinct()
    )
    return (
        a.groupBy("cohort_week", "active_week")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
        .join(F.broadcast(sz), "cohort_week")
        .select(
            "cohort_week",
            (F.col("active_week") - F.col("cohort_week")).alias("week_offset"),
            "n_active",
            "cohort_size",
            fround(F.col("n_active").cast("double") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
    )


# ---------------------------------------------------------------------------
# e30 — stationary distribution of the event-type Markov chain (round 7)
# ---------------------------------------------------------------------------

_E30_Q = "1000000000000.0"  # 1e-12 contribution quantization (the g02
# discipline): each pi(i)*p(i,j) product is floored to a BIGINT before
# the per-state sum, so addition order cannot move a double bit; the
# renormalization that follows is an exact integer ratio (q / totq),
# and IEEE division of identical inputs is identical in both engines.


# Shared oracle CTE chain behind e30/e35: transition matrix -> two
# quantized power-iteration steps (pi1, pi2).
_E30_CTES = f"""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    row_tot AS (
        SELECT prev_type, CAST(SUM(n) AS BIGINT) AS tot
        FROM trans GROUP BY prev_type
    ),
    p AS (
        SELECT t.prev_type, t.next_type, CAST(t.n AS DOUBLE) / r.tot AS p
        FROM trans t JOIN row_tot r ON t.prev_type = r.prev_type
    ),
    states AS (SELECT DISTINCT event_type AS state FROM events),
    sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM states),
    pi1q AS (
        SELECT next_type AS state,
               CAST(SUM(CAST(FLOOR((1.0 / sc.s) * p * {_E30_Q} + 0.5)
                             AS BIGINT)) AS BIGINT) AS q
        FROM p, sc GROUP BY next_type
    ),
    pi1t AS (SELECT CAST(SUM(q) AS BIGINT) AS totq FROM pi1q),
    pi1 AS (
        SELECT s.state,
               CAST(COALESCE(q, 0) AS DOUBLE) / pi1t.totq AS pi
        FROM states s LEFT JOIN pi1q ON s.state = pi1q.state, pi1t
    ),
    pi2q AS (
        SELECT p.next_type AS state,
               CAST(SUM(CAST(FLOOR(pi1.pi * p.p * {_E30_Q} + 0.5)
                             AS BIGINT)) AS BIGINT) AS q
        FROM p JOIN pi1 ON pi1.state = p.prev_type
        GROUP BY p.next_type
    ),
    pi2t AS (SELECT CAST(SUM(q) AS BIGINT) AS totq FROM pi2q),
    pi2 AS (
        SELECT s.state,
               CAST(COALESCE(q, 0) AS DOUBLE) / pi2t.totq AS pi
        FROM states s LEFT JOIN pi2q ON s.state = pi2q.state, pi2t
    )
"""


def _markov_frames(spark: SparkSession, sf_dir: str):
    """Shared Markov-chain stages behind e30/e35: (states, sc, p) where
    p is the row-stochastic transition matrix of e18's event-type chain
    (exact transition counts over broadcast row totals)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    row_tot = trans.groupBy("prev_type").agg(F.sum("n").cast("bigint").alias("tot"))
    p = trans.join(F.broadcast(row_tot), "prev_type").select(
        "prev_type", "next_type", (F.col("n").cast("double") / F.col("tot")).alias("p")
    )
    states = e.select(F.col("event_type").alias("state")).distinct()
    sc = states.agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    return states, sc, p


def _markov_step(states: DataFrame, p: DataFrame, pi: DataFrame) -> DataFrame:
    """One quantized power-iteration step: pi (state, pi) -> next (the
    g02 discipline: 1e-12 BIGINT contributions, renormalized on exact
    integer sums)."""
    q12 = float(_E30_Q)
    contrib = p.join(
        F.broadcast(pi), p["prev_type"] == pi["state"]
    ).select(
        F.col("next_type").alias("state"),
        F.floor(F.col("pi") * F.col("p") * q12 + 0.5).cast("bigint").alias("qc"),
    )
    qs = contrib.groupBy("state").agg(F.sum("qc").cast("bigint").alias("q"))
    tot = qs.agg(F.sum("q").cast("bigint").alias("totq"))
    return (
        states.join(qs, "state", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "state",
            (
                F.coalesce(F.col("q"), F.lit(0)).cast("double") / F.col("totq")
            ).alias("pi"),
        )
    )


def _markov_pi2(spark: SparkSession, sf_dir: str):
    """(states, p, pi2): two quantized power-iteration steps from the
    uniform start — the stationary-distribution estimate e30 reports
    and e35 weights by."""
    states, sc, p = _markov_frames(spark, sf_dir)
    pi0 = states.crossJoin(F.broadcast(sc)).select(
        "state", (F.lit(1.0) / F.col("s")).alias("pi")
    )
    pi1 = _markov_step(states, p, pi0)
    pi2 = _markov_step(states, p, pi1)
    return states, p, pi1, pi2


@query(
    "e30_markov_stationary",
    oracle=f"""
{_E30_CTES}
    SELECT pi1.state,
           {sql_fround("pi1.pi", 6)} AS pi_step1,
           {sql_fround("pi2.pi", 6)} AS pi_step2,
           {sql_fround("abs(pi2.pi - pi1.pi)", 6)} AS drift
    FROM pi1 JOIN pi2 ON pi1.state = pi2.state
    """,
    doc="Stationary-distribution estimate of the event-type Markov "
    "chain: two power-iteration steps from the uniform start, unrolled "
    "over e18's row-stochastic transition matrix (the g02 PageRank-"
    "twin discipline — fixed step count makes the iteration SQL-"
    "expressible and hash-checkable). Each step's pi(i)·p(i,j) "
    "contributions are floored to 1e-12 BIGINTs before the per-state "
    "sum (addition order cannot flip a bit) and the step renormalizes "
    "by the exact integer total (q/totq — an IEEE division of "
    "identical inputs, engine-identical), which also repairs any mass "
    "lost to states without outgoing transitions. The per-step drift "
    "column is the convergence readout (|pi2 - pi1|). Scale: the only "
    "data-sized work is e18's LAG window + count shuffle; everything "
    "after lives on the |event_types|² matrix, broadcast.",
)
def e30_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    _states, _p, pi1, pi2 = _markov_pi2(spark, sf_dir)
    return (
        pi1.withColumnRenamed("pi", "_pi1")
        .join(pi2.withColumnRenamed("pi", "_pi2"), "state")
        .select(
            "state",
            fround(F.col("_pi1"), 6).alias("pi_step1"),
            fround(F.col("_pi2"), 6).alias("pi_step2"),
            fround(F.abs(F.col("_pi2") - F.col("_pi1")), 6).alias("drift"),
        )
    )


# ---------------------------------------------------------------------------
# e31 — bot-rhythm screen: per-user inter-event regularity (round 7)
# ---------------------------------------------------------------------------

_E31_MIN_GAPS = 20  # users with fewer gaps have no measurable rhythm
_E31_CAP_S = 86_400  # gaps over a day are absences, not rhythm — and the
# cap bounds the integer moment sums: sg2 <= n·86400², so n·sg2 − sg²
# stays exact in int64 (and under 2^53) at any realistic per-user count
_E31_CV = 0.5  # flag threshold: CV below this is machine-like regularity
_E31_TOPK = 10


@query(
    "e31_regularity_screen",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch(ts) AS tsec, event_id FROM events),
    g AS (
        SELECT user_id,
               CAST(FLOOR(tsec - LAG(tsec) OVER (
                   PARTITION BY user_id ORDER BY tsec, event_id) + 0.5)
                   AS BIGINT) AS gap
        FROM e
    ),
    agg AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(gap) AS BIGINT) AS sg,
               CAST(SUM(gap * gap) AS BIGINT) AS sg2
        FROM g WHERE gap IS NOT NULL AND gap <= {_E31_CAP_S}
        GROUP BY user_id
        HAVING COUNT(*) >= {_E31_MIN_GAPS} AND SUM(gap) > 0
    ),
    scored AS (
        SELECT user_id, n, sg,
               sqrt(CAST(n * sg2 - sg * sg AS DOUBLE)) / sg AS cv
        FROM agg
    )
    SELECT user_id, n AS n_gaps,
           {sql_fround("CAST(sg AS DOUBLE) / n", 4)} AS mean_gap_s,
           {sql_fround("cv", 6)} AS cv,
           cv < {_E31_CV} AS machine_like
    FROM scored ORDER BY cv, user_id LIMIT {_E31_TOPK}
    """,
    doc="Bot-rhythm screen: the coefficient of variation of each "
    "user's inter-event gaps — humans are bursty (CV >= 1, exponential-"
    "ish arrivals), schedulers and scrapers are metronomic (CV → 0) — "
    f"ranking the {_E31_TOPK} most machine-regular users with a "
    f"CV < {_E31_CV} flag. The abuse screen upstream of sessions and "
    "funnels (complements e20's burst COUNT: a slow steady bot never "
    "bursts but still pins CV ≈ 0). Exactness: gaps are floor-rounded "
    f"to integer seconds and capped at {_E31_CAP_S} s (a day — longer "
    "is absence, not rhythm), so n, Σg, Σg² are exact int64 moments "
    "with n·Σg² − Σg² under 2^53, and CV = sqrt(n·Σg²−Σg²)/Σg is one "
    "sqrt and one division of identical doubles in both engines. One "
    "LAG window per user + one keyed aggregate; TakeOrdered cut.",
)
def e31_regularity_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tsec = F.col("ts").cast("double")
    w = W.partitionBy("user_id").orderBy(tsec, "event_id")
    g = ev.select(
        "user_id",
        F.floor(tsec - F.lag(tsec).over(w) + 0.5).cast("bigint").alias("gap"),
    ).filter(F.col("gap").isNotNull() & (F.col("gap") <= _E31_CAP_S))
    agg = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("gap").cast("bigint").alias("sg"),
            F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("sg2"),
        )
        .filter((F.col("n") >= _E31_MIN_GAPS) & (F.col("sg") > 0))
    )
    cv = F.sqrt((F.col("n") * F.col("sg2") - F.col("sg") * F.col("sg")).cast("double")) / F.col("sg")
    return (
        agg.select("user_id", "n", "sg", cv.alias("_cv"))
        .orderBy("_cv", "user_id")
        .limit(_E31_TOPK)
        .select(
            "user_id",
            F.col("n").alias("n_gaps"),
            fround(F.col("sg").cast("double") / F.col("n"), 4).alias("mean_gap_s"),
            fround(F.col("_cv"), 6).alias("cv"),
            (F.col("_cv") < _E31_CV).alias("machine_like"),
        )
    )


# ---------------------------------------------------------------------------
# e32 — funnel time-to-convert (round 7; e28's latency companion)
# ---------------------------------------------------------------------------


@query(
    "e32_funnel_latency",
    oracle=f"""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = '{_E28_STEPS[0]}' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        WHERE e.event_type = '{_E28_STEPS[1]}' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        WHERE e.event_type = '{_E28_STEPS[2]}' GROUP BY e.user_id
    ),
    d1 AS (SELECT epoch(c.t2) - epoch(v.t1) AS dt
           FROM c JOIN v ON c.user_id = v.user_id),
    d2 AS (SELECT epoch(p.t3) - epoch(c.t2) AS dt
           FROM p JOIN c ON p.user_id = c.user_id),
    d3 AS (SELECT epoch(p.t3) - epoch(v.t1) AS dt
           FROM p JOIN v ON p.user_id = v.user_id)
    SELECT * FROM (
        SELECT '{_E28_STEPS[0]}->{_E28_STEPS[1]}' AS transition,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               {sql_fround("CAST(quantile_cont(dt, 0.5) AS DOUBLE)", 4)} AS p50_s,
               {sql_fround("CAST(quantile_cont(dt, 0.9) AS DOUBLE)", 4)} AS p90_s,
               {sql_fround(
                   "CAST(SUM(CAST(FLOOR(dt + 0.5) AS BIGINT)) AS DOUBLE) / COUNT(*)",
                   4,
               )} AS mean_s
        FROM d1
        UNION ALL
        SELECT '{_E28_STEPS[1]}->{_E28_STEPS[2]}', CAST(COUNT(*) AS BIGINT),
               {sql_fround("CAST(quantile_cont(dt, 0.5) AS DOUBLE)", 4)},
               {sql_fround("CAST(quantile_cont(dt, 0.9) AS DOUBLE)", 4)},
               {sql_fround(
                   "CAST(SUM(CAST(FLOOR(dt + 0.5) AS BIGINT)) AS DOUBLE) / COUNT(*)",
                   4,
               )}
        FROM d2
        UNION ALL
        SELECT '{_E28_STEPS[0]}->{_E28_STEPS[2]}', CAST(COUNT(*) AS BIGINT),
               {sql_fround("CAST(quantile_cont(dt, 0.5) AS DOUBLE)", 4)},
               {sql_fround("CAST(quantile_cont(dt, 0.9) AS DOUBLE)", 4)},
               {sql_fround(
                   "CAST(SUM(CAST(FLOOR(dt + 0.5) AS BIGINT)) AS DOUBLE) / COUNT(*)",
                   4,
               )}
        FROM d3
    ) t
    """,
    doc="Funnel time-to-convert: for users completing e28's ordered "
    "chain (view → click → purchase, each step's FIRST qualifying "
    "event after the previous one), the p50/p90/mean seconds spent on "
    "each transition and end-to-end — the latency half of funnel "
    "analysis (e28 reports WHO converts; this reports HOW LONG "
    "conversion takes, the number a growth team actually watches). "
    "Deltas are epoch-second differences (timezone-invariant, "
    "engine-exact doubles); percentiles share the p·(n-1) "
    "interpolation (q40 pattern, Spark percentile ⇔ DuckDB "
    "quantile_cont); the mean floor-quantizes to integer seconds "
    "before summing so addition order cannot flip the hash. Scale: "
    "the same k shrinking user-keyed MIN semi-joins as e28 (never a "
    "per-user sequence sort), then three single-row aggregates.",
)
def e32_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == _E28_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == _E28_STEPS[1])
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == _E28_STEPS[2])
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def leg(a: DataFrame, ta: str, b: DataFrame, tb: str, label: str) -> DataFrame:
        dt = (F.col(tb).cast("double") - F.col(ta).cast("double")).alias("dt")
        d = b.join(a, "user_id").select(dt)
        return d.agg(
            F.lit(label).alias("transition"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            fround(F.percentile("dt", F.lit(0.5)), 4).alias("p50_s"),
            fround(F.percentile("dt", F.lit(0.9)), 4).alias("p90_s"),
            fround(
                F.sum(F.floor(F.col("dt") + 0.5).cast("bigint")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mean_s"),
        )
    s0, s1, s2 = _E28_STEPS
    return (
        leg(v, "t1", c, "t2", f"{s0}->{s1}")
        .unionByName(leg(c, "t2", p, "t3", f"{s1}->{s2}"))
        .unionByName(leg(v, "t1", p, "t3", f"{s0}->{s2}"))
    )


# ---------------------------------------------------------------------------
# e33 — activity concentration: Gini coefficient per event type (round 7)
# ---------------------------------------------------------------------------


@query(
    "e33_gini_activity",
    oracle="""
    WITH u AS (
        SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, user_id
    ),
    h AS (
        SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS h
        FROM u GROUP BY event_type, c
    ),
    b AS (
        SELECT event_type, c, h,
               CAST(COALESCE(SUM(h) OVER (
                   PARTITION BY event_type ORDER BY c
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS below
        FROM h
    ),
    s AS (
        SELECT event_type,
               CAST(SUM(h) AS BIGINT) AS n_users,
               CAST(SUM(c * h) AS BIGINT) AS n_events,
               CAST(SUM(c * (h * below + h * (h + 1) / 2)) AS BIGINT) AS rank_mass
        FROM b GROUP BY event_type
    )
    SELECT event_type, n_users, n_events,
           (FLOOR((CAST(2 * rank_mass AS DOUBLE)
                   / (CAST(n_users AS DOUBLE) * n_events)
                   - CAST(n_users + 1 AS DOUBLE) / n_users)
                  * 1000000.0 + 0.5) / 1000000.0) AS gini
    FROM s
    """,
    doc="How concentrated is each event type's activity? The GINI "
    "coefficient of the per-user event-count distribution, computed "
    "WITHOUT sorting users: group users into a count-value histogram, "
    "then the classic rank formula G = 2·Σ(rank·x)/(n·Σx) − (n+1)/n "
    "collapses per histogram bucket to c·(h·below + h(h+1)/2) — ties "
    "make the bucket's rank sum exact regardless of order, so the "
    "whole statistic is a ratio of exact int64 sums (engine-identical "
    "before the 6dp rounding). Scale: one fact shuffle to (type,user) "
    "grain, one to the tiny (type,count-value) histogram; the "
    "cumulative window runs per event type over count-value rows "
    "(bounded by max per-user activity, not by users), never a "
    "global sort of the user population.",
)
def e33_gini_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    h = u.groupBy("event_type", "c").agg(F.count(F.lit(1)).cast("bigint").alias("h"))
    w = (
        W.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    b = h.withColumn(
        "below", F.coalesce(F.sum("h").over(w), F.lit(0)).cast("bigint")
    )
    rank_mass = F.sum(
        F.col("c")
        * (
            F.col("h") * F.col("below")
            + F.floor(F.col("h") * (F.col("h") + 1) / 2).cast("bigint")
        )
    ).cast("bigint")
    s = b.groupBy("event_type").agg(
        F.sum("h").cast("bigint").alias("n_users"),
        F.sum(F.col("c") * F.col("h")).cast("bigint").alias("n_events"),
        rank_mass.alias("rank_mass"),
    )
    gini = (
        (2 * F.col("rank_mass")).cast("double")
        / (F.col("n_users").cast("double") * F.col("n_events"))
        - (F.col("n_users") + 1).cast("double") / F.col("n_users")
    )
    return s.select(
        "event_type", "n_users", "n_events", fround(gini, 6).alias("gini")
    )


# ---------------------------------------------------------------------------
# e34 — daily-count autocorrelation function (round 7; the memory dial
# behind e22's seasonality and q79's seasonal-naive forecast)
# ---------------------------------------------------------------------------

_E34_MAX_LAG = 7


@query(
    "e34_autocorrelation",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS didx,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT d.event_type, l.lag, d.didx + l.lag AS key, d.c AS x
        FROM daily d,
             (SELECT unnest(generate_series(1, {_E34_MAX_LAG})) AS lag) l
    ),
    pairs AS (
        SELECT a.event_type, a.lag, a.x, b.c AS y
        FROM lagged a
        JOIN daily b ON b.event_type = a.event_type AND b.didx = a.key
    ),
    m AS (
        SELECT event_type, lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS INTEGER) AS lag, n AS n_pairs,
           {sql_fround(
               "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
               " / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
               "    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))",
               6,
           )} AS acf
    FROM m
    """,
    doc=f"Sample autocorrelation of the daily event-count series at lags "
    f"1..{_E34_MAX_LAG}, per event type — the dial that says whether "
    "yesterday predicts today (lag-1) and whether a weekly rhythm "
    "exists (lag-7 spiking above its neighbours is the signature e22 "
    "decomposes and q79's seasonal-naive forecast exploits). Lag "
    "alignment is a GAP-SAFE day-index equi-join (q79's midx trick: "
    "missing days simply produce no pair, never a misaligned one), "
    "and every Pearson moment is an exact int64 sum of exact integer "
    "daily counts, so the correlation is one identically-shaped "
    "double expression — sqrt IEEE-exact — bit-identical both "
    "engines before rounding. Scale: one (type, day) rollup (the "
    "calendar-bounded daily frame), a 7-fold explode of THAT frame "
    "(never the raw events), one co-partitioned self-join, and a "
    "(type, lag)-grain aggregate; no window anywhere.",
)
def e34_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "didx"
        ),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lags = spark.range(1, _E34_MAX_LAG + 1).select(F.col("id").alias("lag"))
    lagged = daily.crossJoin(F.broadcast(lags)).select(
        "event_type", "lag", (F.col("didx") + F.col("lag")).alias("key"), F.col("c").alias("x")
    )
    b = daily.select(
        F.col("event_type").alias("_et2"), F.col("didx").alias("_didx2"), F.col("c").alias("y")
    )
    pairs = lagged.join(
        b, (lagged["event_type"] == b["_et2"]) & (lagged["key"] == b["_didx2"])
    )
    m = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    dn = F.col("n").cast("double")
    dsx = F.col("sx").cast("double")
    dsy = F.col("sy").cast("double")
    num = dn * F.col("sxy") - dsx * F.col("sy")
    den = F.sqrt(dn * F.col("sxx") - dsx * F.col("sx")) * F.sqrt(
        dn * F.col("syy") - dsy * F.col("sy")
    )
    return m.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_pairs"),
        fround(num / den, 6).alias("acf"),
    )


# ---------------------------------------------------------------------------
# e35 — entropy rate of the event-type Markov chain (round 7; composes
# e18's transition matrix with e30's stationary weights)
# ---------------------------------------------------------------------------

_E35_Q = 1_000_000_000.0  # 1e-9 quantization of the -p ln p terms


@query(
    "e35_markov_entropy_rate",
    oracle=f"""
{_E30_CTES},
    hq AS (
        SELECT prev_type AS state,
               CAST(SUM(CAST(FLOOR(-p * ln(p) * {_E35_Q} + 0.5)
                             AS BIGINT)) AS BIGINT) AS q
        FROM p GROUP BY prev_type
    )
    SELECT pi2.state,
           {sql_fround("pi2.pi", 6)} AS pi_weight,
           {sql_fround(f"CAST(COALESCE(hq.q, 0) AS DOUBLE) / {_E35_Q}", 6)}
               AS cond_entropy_nats,
           {sql_fround(
               f"pi2.pi * (CAST(COALESCE(hq.q, 0) AS DOUBLE) / {_E35_Q})", 6
           )} AS contribution_nats
    FROM pi2 LEFT JOIN hq ON pi2.state = hq.state
    """,
    doc="Entropy rate of the event-type Markov chain, reported per "
    "state: each state's conditional next-step entropy "
    "H_i = -sum_j p_ij ln p_ij (how unpredictable behaviour is FROM "
    "that state) and its stationary-weighted contribution pi_i * H_i, "
    "whose column total is the chain's entropy rate H(X_next | X_now) "
    "— the compressibility / predictability ceiling of the event "
    "stream, and the one-number summary of how much structure e18's "
    "transition matrix actually holds (a uniform matrix maxes it; a "
    "deterministic funnel zeroes it). Composes the two committed "
    "frames: e18's exact-count transition matrix and e30's quantized "
    "two-step stationary estimate. Every -p ln p term is a 1e-9 "
    "BIGINT before the per-state sum (t51 discipline), pi is e30's "
    "exact-integer-ratio double, and the contribution is one "
    "identically-shaped product — engine-identical throughout. "
    "Scale: the only data-sized work is the LAG window + count "
    "shuffle behind the matrix; every later frame is states^2 or "
    "smaller.",
)
def e35_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    _states, p, _pi1, pi2 = _markov_pi2(spark, sf_dir)
    hq = (
        p.select(
            F.col("prev_type").alias("state"),
            F.floor(-F.col("p") * F.log(F.col("p")) * _E35_Q + 0.5)
            .cast("bigint")
            .alias("qt"),
        )
        .groupBy("state")
        .agg(F.sum("qt").cast("bigint").alias("q"))
    )
    h = F.coalesce(F.col("q"), F.lit(0)).cast("double") / _E35_Q
    return pi2.join(hq, "state", "left").select(
        "state",
        fround(F.col("pi"), 6).alias("pi_weight"),
        fround(h, 6).alias("cond_entropy_nats"),
        fround(F.col("pi") * h, 6).alias("contribution_nats"),
    )


# ---------------------------------------------------------------------------
# e36 — event-type affinity within sessions (round 7; market-basket
# lift on e03's sessionization)
# ---------------------------------------------------------------------------


@query(
    "e36_session_affinity",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > {SESSION_GAP_MS}
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_type,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sess
        FROM flagged
    ),
    st AS (SELECT DISTINCT user_id, sess, event_type FROM sessions),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions
            FROM (SELECT DISTINCT user_id, sess FROM st) s),
    ct AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM st GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM st a JOIN st b
          ON a.user_id = b.user_id AND a.sess = b.sess
         AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, c_ab AS n_sessions_both,
           {sql_fround(
               "CAST(c_ab AS DOUBLE) * tot.n_sessions"
               " / (CAST(ca.c AS DOUBLE) * cb.c)",
               4,
           )} AS lift,
           {sql_fround(
               "ln(CAST(c_ab AS DOUBLE) * tot.n_sessions"
               " / (CAST(ca.c AS DOUBLE) * cb.c))",
               6,
           )} AS pmi
    FROM pairs
    JOIN ct ca ON ca.event_type = pairs.type_a
    JOIN ct cb ON cb.event_type = pairs.type_b
    CROSS JOIN tot
    """,
    doc="Within-session affinity between event types: q67's "
    "market-basket lift transplanted onto e03's gap-sessionization — "
    "for each type pair, the ratio of observed co-occurrence (both "
    "types in one session) to the independence expectation, plus its "
    "log (PMI). Lift > 1 pairs are the cross-sell / funnel-adjacency "
    "signals a product team reads off the event stream; the "
    "session (not user) grain is what makes it behavioural rather "
    "than demographic. Session ids are the committed lag+cumsum rule "
    "(user-keyed windows), all counts exact integers off DISTINCT "
    "(session, type) sets, lift a single division and PMI one ln on "
    "it — engine-identical. Scale: user-keyed sessionization windows, "
    "one distinct shuffle to the (session, type) set, a per-session "
    "type self-join bounded by types-per-session squared (types "
    "cardinality is small), and broadcast type totals.",
)
def e36_session_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    prev_ms = F.lag(ms).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(prev_ms.isNull() | ((ms - prev_ms) > SESSION_GAP_MS), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.select(
        "user_id",
        "event_type",
        F.sum("new_session")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .alias("sess"),
    )
    st = sessions.select("user_id", "sess", "event_type").distinct()
    tot = (
        st.select("user_id", "sess")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    )
    ct = st.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = st.select("user_id", "sess", F.col("event_type").alias("type_a"))
    b = st.select(
        F.col("user_id").alias("_u2"),
        F.col("sess").alias("_s2"),
        F.col("event_type").alias("type_b"),
    )
    pairs = (
        a.join(
            b,
            (a["user_id"] == b["_u2"])
            & (a["sess"] == b["_s2"])
            & (a["type_a"] < b["type_b"]),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    ca = ct.select(F.col("event_type").alias("type_a"), F.col("c").alias("ca"))
    cb = ct.select(F.col("event_type").alias("type_b"), F.col("c").alias("cb"))
    lift = (
        F.col("c_ab").cast("double")
        * F.col("n_sessions")
        / (F.col("ca").cast("double") * F.col("cb"))
    )
    return (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            F.col("c_ab").alias("n_sessions_both"),
            fround(lift, 4).alias("lift"),
            fround(F.log(lift), 6).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# e37 — Kruskal–Wallis weekday effect test (round 7; the significance
# test behind e22's seasonal indices)
# ---------------------------------------------------------------------------

_E37_Q = 1_000_000.0  # 1e-6 quantization of the per-group rank-sum terms


@query(
    "e37_kruskal_wallis",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               isodow(CAST(ts AS DATE)) AS dow,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS y
        FROM events GROUP BY 1, 2, 3
    ),
    ranked AS (
        SELECT event_type, dow, y,
               RANK() OVER (PARTITION BY event_type ORDER BY y) AS rnk,
               COUNT(*) OVER (PARTITION BY event_type, y) AS t
        FROM daily
    ),
    g AS (
        SELECT event_type, dow,
               CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(2 * rnk + t - 1) AS BIGINT) AS s2r
        FROM ranked GROUP BY 1, 2
    ),
    ties AS (
        SELECT event_type,
               CAST(SUM(t * t * t - t) AS BIGINT) AS tie_mass
        FROM (SELECT DISTINCT event_type, y, t FROM ranked) u
        GROUP BY event_type
    ),
    agg AS (
        SELECT g.event_type,
               CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k_groups,
               CAST(SUM(CAST(FLOOR(
                   CAST(s2r AS DOUBLE) * s2r / (4 * n_g) * {_E37_Q} + 0.5
               ) AS BIGINT)) AS BIGINT) AS qterm
        FROM g GROUP BY g.event_type
    )
    SELECT agg.event_type,
           n AS n_days,
           CAST(k_groups AS INTEGER) AS k_groups,
           {sql_fround(
               f"12.0 / (CAST(n AS DOUBLE) * (n + 1))"
               f" * (CAST(qterm AS DOUBLE) / {_E37_Q}) - 3.0 * (n + 1)",
               4,
           )} AS kw_h,
           {sql_fround(
               f"(12.0 / (CAST(n AS DOUBLE) * (n + 1))"
               f" * (CAST(qterm AS DOUBLE) / {_E37_Q}) - 3.0 * (n + 1))"
               f" / (1.0 - CAST(tie_mass AS DOUBLE)"
               f"     / (CAST(n AS DOUBLE) * n * n - n))",
               4,
           )} AS kw_h_tie_corrected
    FROM agg JOIN ties ON agg.event_type = ties.event_type
    """,
    doc="Kruskal–Wallis rank test (1952) of the weekday effect on daily "
    "revenue, per event type — the nonparametric one-way ANOVA that "
    "says whether e22's seasonal indices are SIGNAL or noise, with no "
    "normality assumption a revenue distribution would violate. "
    "Midranks are carried as exact integers (2·rank + ties − 1 — "
    "twice the midrank, so ties never create a float), each group's "
    "ranksum term S²/(4n_g) is 1e-6-quantized to a BIGINT before the "
    "7-group sum (addition order can never flip the hash), and the "
    "classic H identity plus the exact tie-mass correction "
    "Σ(t³−t)/(N³−N) are identically-shaped double expressions — "
    "engine-identical before rounding. H ~ chi²(k−1) under the null: "
    "for k=7 weekdays, H above ~12.6 rejects at 5%. Scale: one "
    "(type, day) rollup; the ranking window partitions by event type "
    "over the CALENDAR-bounded daily frame (the q76/e33 bounded-"
    "window pattern), and everything after lives on 7-row group "
    "frames.",
)
def e37_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        (F.weekday(F.col("ts").cast("date")) + F.lit(1)).alias("dow"),
    ).agg((F.sum(dmoney("value")) * 100).cast("bigint").alias("y"))
    w_rank = W.partitionBy("event_type").orderBy("y")
    w_tie = W.partitionBy("event_type", "y")
    ranked = daily.select(
        "event_type",
        "dow",
        "y",
        F.rank().over(w_rank).alias("rnk"),
        F.count(F.lit(1)).over(w_tie).alias("t"),
    )
    g = ranked.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(2 * F.col("rnk") + F.col("t") - 1).cast("bigint").alias("s2r"),
    )
    ties = (
        ranked.select("event_type", "y", "t")
        .distinct()
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("bigint")
            .alias("tie_mass")
        )
    )
    qterm = F.floor(
        F.col("s2r").cast("double") * F.col("s2r") / (4 * F.col("n_g")) * _E37_Q
        + 0.5
    ).cast("bigint")
    agg = g.select("event_type", "n_g", qterm.alias("qt")).groupBy("event_type").agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("qt").cast("bigint").alias("qterm"),
    )
    dn = F.col("n").cast("double")
    h = 12.0 / (dn * (F.col("n") + 1)) * (
        F.col("qterm").cast("double") / _E37_Q
    ) - 3.0 * (F.col("n") + 1)
    tie_d = 1.0 - F.col("tie_mass").cast("double") / (dn * F.col("n") * F.col("n") - F.col("n"))
    return agg.join(ties, "event_type").select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("k_groups").cast("int").alias("k_groups"),
        fround(h, 4).alias("kw_h"),
        fround(h / tie_d, 4).alias("kw_h_tie_corrected"),
    )


# ---------------------------------------------------------------------------
# e38 — daily activity peak detection (round 7; the ops-monitoring
# "what days spiked" readout, gap-safe and integer-exact)
# ---------------------------------------------------------------------------


@query(
    "e38_peak_days",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(ts AS DATE) AS day,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS didx,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2, 3
    ),
    tot AS (
        SELECT event_type,
               CAST(SUM(c) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS nd
        FROM daily GROUP BY event_type
    )
    SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
           d.c AS n_events,
           {sql_fround(
               "CAST(d.c AS DOUBLE) * nd / total", 4
           )} AS ratio_to_mean
    FROM daily d
    JOIN tot ON tot.event_type = d.event_type
    LEFT JOIN daily p ON p.event_type = d.event_type AND p.didx = d.didx - 1
    LEFT JOIN daily n ON n.event_type = d.event_type AND n.didx = d.didx + 1
    WHERE d.c > COALESCE(p.c, 0) AND d.c > COALESCE(n.c, 0)
      AND d.c * nd * 100 >= 115 * total
    """,
    doc="Daily activity peaks per event type: days that are strict "
    "local maxima against BOTH calendar neighbours AND carry at least "
    "1.15x the type's mean daily volume — the spike shortlist an on-call "
    "dashboard shows, with each peak's ratio to the mean. Neighbour "
    "lookup is the gap-safe day-index equi-join (e34/q79 discipline: "
    "a missing neighbour day counts as zero, so a lone spike after a "
    "quiet gap IS a peak — LAG over a dense-looking frame would "
    "silently compare against the wrong day), and the prominence "
    "gate is the cross-multiplied PURE INTEGER comparison "
    "c*n_days*100 >= 115*total — no float ever decides membership, so the "
    "row set is engine-identical by construction; the reported ratio "
    "is the only double. Scale: one (type, day) rollup, two "
    "co-partitioned self-joins on the calendar-bounded daily frame, "
    "broadcast type totals; no window.",
)
def e38_peak_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "didx"
        ),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = daily.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
    )
    p = daily.select(
        F.col("event_type").alias("_et_p"),
        F.col("didx").alias("_didx_p"),
        F.col("c").alias("c_prev"),
    )
    n = daily.select(
        F.col("event_type").alias("_et_n"),
        F.col("didx").alias("_didx_n"),
        F.col("c").alias("c_next"),
    )
    j = (
        daily.join(F.broadcast(tot), "event_type")
        .join(
            p,
            (daily["event_type"] == p["_et_p"])
            & (p["_didx_p"] == daily["didx"] - 1),
            "left",
        )
        .join(
            n,
            (daily["event_type"] == n["_et_n"])
            & (n["_didx_n"] == daily["didx"] + 1),
            "left",
        )
    )
    cp = F.coalesce(F.col("c_prev"), F.lit(0))
    cn = F.coalesce(F.col("c_next"), F.lit(0))
    return (
        j.filter(
            (F.col("c") > cp)
            & (F.col("c") > cn)
            & (F.col("c") * F.col("nd") * 100 >= 115 * F.col("total"))
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("c").alias("n_events"),
            fround(
                F.col("c").cast("double") * F.col("nd") / F.col("total"), 4
            ).alias("ratio_to_mean"),
        )
    )


# ---------------------------------------------------------------------------
# e39 — transition dwell-time percentiles (round 8): e18 counts HOW
# OFTEN each transition fires; e39 measures HOW LONG it takes, with
# exact type-1 quantiles off the dwell-second VALUE grid
# ---------------------------------------------------------------------------


@query(
    "e39_transition_dwell",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER w AS to_type,
               (epoch_ms(LEAD(ts) OVER w) - epoch_ms(ts)) // 1000 AS dwell_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
        SELECT from_type, to_type, CAST(dwell_s AS BIGINT) AS dwell_s
        FROM seq WHERE to_type IS NOT NULL
    ),
    vals AS (
        SELECT from_type, to_type, dwell_s, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM g GROUP BY 1, 2, 3
    ),
    cum AS (
        SELECT from_type, to_type, dwell_s, cnt,
               SUM(cnt) OVER (PARTITION BY from_type, to_type ORDER BY dwell_s)
                   AS cum,
               SUM(cnt) OVER (PARTITION BY from_type, to_type) AS n
        FROM vals
    )
    SELECT from_type, to_type,
           CAST(MAX(n) AS BIGINT) AS n_transitions,
           CAST(MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN dwell_s END) AS BIGINT)
               AS p50_dwell_s,
           CAST(MIN(CASE WHEN cum >= (90 * n + 99) // 100 THEN dwell_s END) AS BIGINT)
               AS p90_dwell_s
    FROM cum
    GROUP BY 1, 2
    """,
    doc="Transition DWELL percentiles: for every ordered (from, to) "
    "event-type transition in a user's stream, the exact type-1 "
    "median and p90 of seconds spent before the next step — the UX "
    "number e18's transition MATRIX (counts only) cannot answer "
    "('users do move cart->purchase, but how long do they stall?'). "
    "Dwell is an exact integer: millisecond epoch diff floor-divided "
    "to whole seconds on both engines, then the q93 rank-block "
    "discipline picks percentiles off the (transition, dwell-VALUE) "
    "grid — the cumulative window walks distinct dwell seconds, "
    "never the transition population. Scale: one shuffle on user for "
    "the LEAD, one (from, to, dwell) rollup, a value-grid window "
    "partitioned by the 25-cell transition key, and a 25-row final "
    "rollup.",
)
def e39_transition_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(wl).alias("to_type"),
        F.floor((F.lead(ms).over(wl) - ms) / 1000).cast("bigint").alias("dwell_s"),
    ).filter(F.col("to_type").isNotNull())
    vals = seq.groupBy("from_type", "to_type", "dwell_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wc = W.partitionBy("from_type", "to_type").orderBy("dwell_s")
    wn = W.partitionBy("from_type", "to_type")
    cum = vals.select(
        "from_type",
        "to_type",
        "dwell_s",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )

    def pick(pct: int, name: str):
        # exact integer ceil(pct*n/100) — see q93: double 0.90*n can
        # overshoot an integral threshold while DuckDB decimals don't
        thr = F.expr(f"({pct} * n + 99) div 100")
        hit = F.when(F.col("cum") >= thr, F.col("dwell_s"))
        return F.min(hit).cast("bigint").alias(name)

    return cum.groupBy("from_type", "to_type").agg(
        F.max("n").cast("bigint").alias("n_transitions"),
        pick(50, "p50_dwell_s"),
        pick(90, "p90_dwell_s"),
    )


# ---------------------------------------------------------------------------
# e40 — Hill tail-index audit of user activity (round 8): IS the
# activity distribution heavy-tailed? (Hill 1975; the fit-before-you-
# assume step of Clauset–Shalizi–Newman 2009)
# ---------------------------------------------------------------------------

E40_K = 10  # top-K order statistics enter the estimator
_E40_Q = "1000000.0"  # 1e-6 log-term quantization (the t21/t47 move)


@query(
    "e40_powerlaw_tail_fit",
    oracle=f"""
    WITH act AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_users
        FROM act
    ),
    thr AS (SELECT cnt AS x_k1 FROM ranked WHERE rn = {E40_K} + 1),
    terms AS (
        SELECT CAST(FLOOR(ln(CAST(r.cnt AS DOUBLE) / t.x_k1) * {_E40_Q} + 0.5)
                    AS BIGINT) AS qterm,
               r.n_users
        FROM ranked r CROSS JOIN thr t
        WHERE r.rn <= {E40_K}
    )
    SELECT CAST(MAX(n_users) AS BIGINT) AS n_users,
           CAST({E40_K} AS INTEGER) AS k_used,
           (SELECT CAST(x_k1 AS BIGINT) FROM thr) AS tail_threshold,
           {sql_fround(
               f"{E40_K} * {_E40_Q} / CAST(SUM(qterm) AS DOUBLE)", 4
           )} AS alpha_hat,
           CAST(SUM(qterm) AS DOUBLE) / {_E40_Q} >= {E40_K} / 3.0
               AS heavy_tail
    FROM terms
    """,
    doc="Hill tail-index audit: is per-user activity heavy-tailed "
    "enough to plan for (hot users, skewed shuffles), or Poisson-thin? "
    "alpha_hat = k / sum ln(x_(i)/x_(k+1)) over the top-k order "
    "statistics (Hill 1975) — the estimate Clauset–Shalizi–Newman "
    "2009 insist you RUN before assuming a power law; alpha < 3 "
    "(infinite variance) flags genuinely heavy tails, and this "
    "corpus's Poisson-ish activity correctly reads as thin "
    "(heavy_tail = false). Each log-ratio term is quantized to 1e-6 "
    "BIGINTs before summing (the t21/t47 move), so the sum is "
    "order-independent and both engines divide the same exact "
    "integer. Scale: one user-grain count, a top-(k+1) selection "
    "(k = {E40_K}, constant — TakeOrdered, no global sort), and a "
    "k-row fold; the estimator state is O(k) regardless of corpus "
    "size.",
)
def e40_powerlaw_tail_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    act = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    n_users = act.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    topk1 = act.orderBy(F.col("cnt").desc(), "user_id").limit(E40_K + 1).select(
        "cnt",
        F.row_number()
        .over(W.orderBy(F.col("cnt").desc(), "user_id"))
        .alias("rn"),
    )
    thr = topk1.filter(F.col("rn") == E40_K + 1).select(F.col("cnt").alias("x_k1"))
    q = float(_E40_Q)
    terms = (
        topk1.filter(F.col("rn") <= E40_K)
        .crossJoin(F.broadcast(thr))
        .select(
            F.floor(
                F.log(F.col("cnt").cast("double") / F.col("x_k1")) * q + 0.5
            )
            .cast("bigint")
            .alias("qterm"),
            F.col("x_k1"),
        )
    )
    agg = terms.groupBy("x_k1").agg(F.sum("qterm").cast("bigint").alias("s"))
    return (
        agg.crossJoin(F.broadcast(n_users))
        .select(
            "n_users",
            F.lit(E40_K).cast("int").alias("k_used"),
            F.col("x_k1").cast("bigint").alias("tail_threshold"),
            fround(F.lit(E40_K) * q / F.col("s").cast("double"), 4).alias("alpha_hat"),
            (F.col("s").cast("double") / q >= E40_K / 3.0).alias("heavy_tail"),
        )
    )


# ---------------------------------------------------------------------------
# e41 — dominant-period detection (round 8): e34 reports the ACF
# table; e41 turns it into a VERDICT — which lag dominates, and is
# the peak prominent enough to schedule around? (the same
# report→consumer closure t57 gave t56)
# ---------------------------------------------------------------------------

_E41_MAX_LAG = 14  # scan two weeks of lags (catches daily AND weekly)
_E41_Q = "1000000000.0"  # 1e-9 ACF quantization for the integer argmax


@query(
    "e41_dominant_period",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS didx,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT d.event_type, l.lag, d.didx + l.lag AS key, d.c AS x
        FROM daily d,
             (SELECT unnest(generate_series(2, {_E41_MAX_LAG})) AS lag) l
    ),
    pairs AS (
        SELECT a.event_type, a.lag, a.x, b.c AS y
        FROM lagged a
        JOIN daily b ON b.event_type = a.event_type AND b.didx = a.key
    ),
    m AS (
        SELECT event_type, lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM pairs GROUP BY 1, 2
    ),
    acfq AS (
        SELECT event_type, lag,
               CAST(FLOOR(
                   (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                   * {_E41_Q} + 0.5) AS BIGINT) AS qacf
        FROM m
    ),
    best AS (
        SELECT event_type, lag, qacf,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY qacf DESC, lag) AS rn,
               CAST(SUM(qacf) OVER (PARTITION BY event_type) AS BIGINT) AS qsum,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nlags
        FROM acfq
    )
    SELECT event_type,
           CAST(lag AS INTEGER) AS dominant_lag,
           {sql_fround(f"CAST(qacf AS DOUBLE) / {_E41_Q}", 6)} AS peak_acf,
           {sql_fround(
               f"CAST(qsum - qacf AS DOUBLE) / ((nlags - 1) * {_E41_Q})", 6
           )} AS mean_other_acf,
           {sql_fround(
               f"CAST(qacf AS DOUBLE) / {_E41_Q}"
               f" - CAST(qsum - qacf AS DOUBLE) / ((nlags - 1) * {_E41_Q})",
               6,
           )} AS prominence
    FROM best WHERE rn = 1
    """,
    doc=f"Dominant-period VERDICT per event type: scan the daily-count "
    f"autocorrelation over lags 2..{_E41_MAX_LAG} (lag 1 excluded — "
    "trend, not rhythm), pick the argmax, and report its PROMINENCE "
    "over the mean of the other lags — the consumer that turns e34's "
    "ACF table into the single number a scheduler or a seasonal-naive "
    "forecaster (q79) actually needs ('is lag 7 THE period, or just "
    "noise?'). Each ACF rides e34's exact-int64 moment identity and "
    "is 1e-9-quantized BEFORE the argmax, so the winning lag and the "
    "prominence arithmetic are integer comparisons both engines "
    "settle identically. Scale: the (type, day) rollup is calendar-"
    f"bounded, the lag fanout multiplies THAT frame by {_E41_MAX_LAG - 1}, "
    "and the windows run over a 13-row-per-type ACF grid.",
)
def e41_dominant_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "didx"
        ),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lags = spark.range(2, _E41_MAX_LAG + 1).select(F.col("id").alias("lag"))
    lagged = daily.crossJoin(F.broadcast(lags)).select(
        "event_type", "lag", (F.col("didx") + F.col("lag")).alias("key"), F.col("c").alias("x")
    )
    b = daily.select(
        F.col("event_type").alias("_et2"), F.col("didx").alias("_didx2"), F.col("c").alias("y")
    )
    pairs = lagged.join(
        b, (lagged["event_type"] == b["_et2"]) & (lagged["key"] == b["_didx2"])
    )
    m = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    dn = F.col("n").cast("double")
    dsx = F.col("sx").cast("double")
    dsy = F.col("sy").cast("double")
    acf = (dn * F.col("sxy") - dsx * F.col("sy")) / (
        F.sqrt(dn * F.col("sxx") - dsx * F.col("sx"))
        * F.sqrt(dn * F.col("syy") - dsy * F.col("sy"))
    )
    q = float(_E41_Q)
    acfq = m.select(
        "event_type", "lag", F.floor(acf * q + 0.5).cast("bigint").alias("qacf")
    )
    wt = W.partitionBy("event_type")
    best = acfq.select(
        "event_type",
        "lag",
        "qacf",
        F.row_number().over(wt.orderBy(F.col("qacf").desc(), "lag")).alias("rn"),
        F.sum("qacf").over(wt).cast("bigint").alias("qsum"),
        F.count(F.lit(1)).over(wt).cast("bigint").alias("nlags"),
    ).filter(F.col("rn") == 1)
    peak = F.col("qacf").cast("double") / q
    others = (F.col("qsum") - F.col("qacf")).cast("double") / (
        (F.col("nlags") - 1) * q
    )
    return best.select(
        "event_type",
        F.col("lag").cast("int").alias("dominant_lag"),
        fround(peak, 6).alias("peak_acf"),
        fround(others, 6).alias("mean_other_acf"),
        fround(peak - others, 6).alias("prominence"),
    )


# ---------------------------------------------------------------------------
# e42 — Fano-factor burstiness (round 8): index of dispersion of the
# daily arrival counts — IS the stream Poisson, or does it burst?
# (Fano 1947; the dial behind e20's burst-user screen)
# ---------------------------------------------------------------------------


@query(
    "e42_fano_burstiness",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS lo,
               MAX(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS hi
        FROM events
    ),
    grid AS (
        SELECT t.event_type, g.didx
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(
            (SELECT lo FROM bounds), (SELECT hi FROM bounds))) AS didx) g
    ),
    daily AS (
        SELECT event_type,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS didx,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    dense AS (
        SELECT g.event_type, COALESCE(d.c, 0) AS c
        FROM grid g LEFT JOIN daily d
          ON d.event_type = g.event_type AND d.didx = g.didx
    ),
    m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(c) AS BIGINT) AS s1,
               CAST(SUM(c * c) AS BIGINT) AS s2
        FROM dense GROUP BY 1
    )
    SELECT event_type, n_days, s1 AS n_events,
           {sql_fround("CAST(s1 AS DOUBLE) / n_days", 4)} AS mean_daily,
           {sql_fround(
               "(CAST(n_days AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)"
               " / (CAST(n_days AS DOUBLE) * s1)",
               6,
           )} AS fano,
           (CAST(n_days AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
               / (CAST(n_days AS DOUBLE) * s1) > 1.5 AS bursty
    FROM m
    """,
    doc="Fano factor (index of dispersion) of the daily arrival counts "
    "per event type: Var/mean of counts over the DENSE calendar grid "
    "(zero-event days count — omitting them is the classic "
    "burstiness-estimation bug, so the grid is generated from the "
    "observed day bounds and left-joined). Fano = 1 is Poisson; "
    "materially above means bursts — the per-TYPE dial behind e20's "
    "per-user burst screen, and the number that says whether a "
    "capacity plan can assume smooth arrivals. The identity "
    "(n*S2 - S1^2)/(n*S1) keeps everything exact int64 until one "
    "final division (population variance over mean — the q90 "
    "moment discipline). Scale: one (type, day) rollup, a calendar-"
    "bounded broadcast grid join, and a 5-row final rollup.",
)
def e42_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    didx = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
    daily = e.groupBy("event_type", didx.alias("didx")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    bounds = e.agg(F.min(didx).alias("lo"), F.max(didx).alias("hi"))
    types = e.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("didx"))
    )
    dense = grid.join(daily, ["event_type", "didx"], "left").select(
        "event_type", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    m = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    dn = F.col("n_days").cast("double")
    ds1 = F.col("s1").cast("double")
    fano = (dn * F.col("s2") - ds1 * F.col("s1")) / (dn * F.col("s1"))
    return m.select(
        "event_type",
        "n_days",
        F.col("s1").alias("n_events"),
        fround(ds1 / F.col("n_days"), 4).alias("mean_daily"),
        fround(fano, 6).alias("fano"),
        (fano > 1.5).alias("bursty"),
    )


# ---------------------------------------------------------------------------
# e43 — A/A calibration suite with Benjamini–Hochberg FDR control (round 9)
# ---------------------------------------------------------------------------

_E43_M = 2147483647  # 2^31 - 1
_E43_A = 48271  # MINSTD multiplier — (u % M) * A stays < 2^47
_E43_B = 2654435761  # Knuth multiplicative constant (experiment side)
_E43_EXPTS = 16  # simultaneous A/A splits
# Zelen & Severo / Abramowitz–Stegun 26.2.17 normal tail polynomial —
# the SAME literal constants are compiled into both engines' expressions
_E43_CDF = (
    "(EXP(-(az * az) / 2.0) / 2.5066282746310002) * "
    "(tt * (0.319381530 + tt * (-0.356563782 + tt * (1.781477937 + "
    "tt * (-1.821255978 + tt * 1.330274429)))))"
)


@query(
    "e43_bh_fdr",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM events GROUP BY user_id
    ),
    expts AS (SELECT unnest(generate_series(0, {_E43_EXPTS - 1})) AS e),
    assigned AS (
        SELECT e,
               ((user_id % {_E43_M}) * {_E43_A} + {_E43_B} * e)
                   % {_E43_M} % 2 AS variant,
               x
        FROM per_user CROSS JOIN expts
    ),
    v AS (
        SELECT e, variant,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sx2
        FROM assigned GROUP BY 1, 2
    ),
    wide AS (
        SELECT e,
               MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
               MAX(CASE WHEN variant = 0 THEN sx END) AS sx_a,
               MAX(CASE WHEN variant = 0 THEN sx2 END) AS sx2_a,
               MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
               MAX(CASE WHEN variant = 1 THEN sx END) AS sx_b,
               MAX(CASE WHEN variant = 1 THEN sx2 END) AS sx2_b
        FROM v GROUP BY e
    ),
    zs AS (
        SELECT e, n_a, n_b,
               (CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b)
               / SQRT(((sx2_a - CAST(sx_a AS DOUBLE) * sx_a / n_a) / (n_a - 1)) / n_a
                    + ((sx2_b - CAST(sx_b AS DOUBLE) * sx_b / n_b) / (n_b - 1)) / n_b)
                   AS z
        FROM wide
    ),
    ps AS (
        SELECT e, n_a, n_b, z,
               CAST(FLOOR(2.0 * {_E43_CDF} * 1000000.0 + 0.5) AS BIGINT)
                   AS p_micro
        FROM (SELECT *, ABS(z) AS az, 1.0 / (1.0 + 0.2316419 * ABS(z)) AS tt
              FROM zs)
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY p_micro, e) AS rnk FROM ps
    ),
    kmax AS (
        SELECT MAX(CASE WHEN p_micro <= 6250 * rnk THEN rnk END) AS km
        FROM ranked
    )
    SELECT e AS experiment, n_a, n_b,
           {sql_fround("z", 6)} AS z_stat,
           CAST(p_micro AS DOUBLE) / 1000000.0 AS p_value,
           CAST(rnk AS BIGINT) AS bh_rank,
           rnk <= COALESCE(km, 0) AS rejected
    FROM ranked CROSS JOIN kmax
    """,
    doc="A/A calibration suite under Benjamini–Hochberg FDR control "
    f"(Benjamini & Hochberg 1995): {_E43_EXPTS} simultaneous null "
    "experiments, each a deterministic hash split of users (the "
    "experiment-platform validation practice — A/A tests verify the "
    "assignment and stats pipeline produce no false lift), each read "
    "out as e24's Welch z on per-user purchase counts, then the "
    "step-up procedure at q = 0.10. Two-sided p-values come from the "
    "Abramowitz–Stegun 26.2.17 tail polynomial with IDENTICAL Horner "
    "literals compiled into both engines, quantized to integer "
    "micro-units BEFORE the BH comparison — which is then exact "
    "integer cross-multiplication (p <= i*q/m becomes p_micro <= "
    "6250*i), so a last-ulp libm difference cannot flip a rejection. "
    "Scale: the per-user rollup is the only data-sized shuffle; the "
    f"x{_E43_EXPTS} fan-out folds to experiments x 2 rows by map-side "
    "combine (q97's replicate-weight shape); the BH window ranks "
    f"{_E43_EXPTS} rows. Expected readout: zero rejections — a "
    "rejection here means the hash assignment itself is biased.",
)
def e43_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("x")
    )
    expts = spark.range(_E43_EXPTS).select(F.col("id").cast("bigint").alias("e"))
    assigned = per_user.crossJoin(F.broadcast(expts)).select(
        "e",
        (
            ((F.col("user_id") % _E43_M) * _E43_A + F.lit(_E43_B) * F.col("e"))
            % _E43_M % 2
        ).alias("variant"),
        "x",
    )
    v = assigned.groupBy("e", "variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sx2"),
    )
    wide = v.groupBy("e").agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("sx"))).alias("sx_a"),
        F.max(F.when(F.col("variant") == 0, F.col("sx2"))).alias("sx2_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("sx"))).alias("sx_b"),
        F.max(F.when(F.col("variant") == 1, F.col("sx2"))).alias("sx2_b"),
    )
    zs = wide.withColumn(
        "z",
        F.expr(
            "(CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b)"
            " / SQRT(((sx2_a - CAST(sx_a AS DOUBLE) * sx_a / n_a) / (n_a - 1)) / n_a"
            " + ((sx2_b - CAST(sx_b AS DOUBLE) * sx_b / n_b) / (n_b - 1)) / n_b)"
        ),
    )
    ps = (
        zs.withColumn("az", F.expr("ABS(z)"))
        .withColumn("tt", F.expr("1.0 / (1.0 + 0.2316419 * ABS(z))"))
        .withColumn(
            "p_micro",
            F.expr(
                f"CAST(FLOOR(2.0 * {_E43_CDF} * 1000000.0 + 0.5) AS BIGINT)"
            ),
        )
    )
    # BH step-up over the 16-row experiment frame (bounded global window)
    ranked = ps.withColumn("rnk", F.row_number().over(W.orderBy("p_micro", "e")))
    km = ranked.agg(
        F.max(
            F.when(F.col("p_micro") <= 6250 * F.col("rnk"), F.col("rnk"))
        ).alias("km")
    )
    return ranked.crossJoin(F.broadcast(km)).select(
        F.col("e").alias("experiment"),
        "n_a",
        "n_b",
        fround(F.col("z"), 6).alias("z_stat"),
        (F.col("p_micro").cast("double") / 1_000_000.0).alias("p_value"),
        F.col("rnk").cast("bigint").alias("bh_rank"),
        (F.col("rnk") <= F.coalesce(F.col("km"), F.lit(0))).alias("rejected"),
    )


# ---------------------------------------------------------------------------
# e45 — orphan conversions by hour of day (round 9): the batch twin of
# the left-outer stream-stream attribution join
# ---------------------------------------------------------------------------


@query(
    "e45_orphan_conversions",
    oracle="""
    WITH p AS (
        SELECT user_id, ts, strftime(ts, '%H') AS hh
        FROM events WHERE event_type = 'purchase'
    ),
    flagged AS (
        SELECT hh,
               CASE WHEN EXISTS (
                   SELECT 1 FROM events v
                   WHERE v.event_type = 'view'
                     AND v.user_id = p.user_id
                     AND epoch_ms(v.ts) >= epoch_ms(p.ts) - 7200000
                     AND epoch_ms(v.ts) <= epoch_ms(p.ts)
               ) THEN 0 ELSE 1 END AS orphan
        FROM p
    )
    SELECT hh AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(orphan) AS BIGINT) AS n_orphans,
           ROUND(CAST(SUM(orphan) AS DOUBLE) / COUNT(*), 6) AS orphan_rate
    FROM flagged
    GROUP BY 1
    """,
    doc="Orphan-conversion rate by hour of day — the batch twin of the "
    "left-outer stream-stream attribution join's null rows: a purchase "
    "is an ORPHAN when the user has no view in the 2 hours before it, "
    "and the hourly profile tells attribution engineering where the "
    "holes cluster (overnight orphans = tracking gaps; business-hours "
    "orphans = genuinely view-less conversions). Spark side: a LEFT "
    "ANTI join on user_id with the event-time range as the join "
    "residual — user-keyed, one shuffle per side, never a time cross "
    "join; the oracle is the equivalent correlated NOT EXISTS. Rates "
    "are exact integer ratios, 6dp. Scale: both sides shuffle once on "
    "user_id (the same co-partitioning every attribution query here "
    "uses); the anti join's per-key work is views-per-user bounded; "
    "24 output rows.",
)
def e45_orphan_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.date_format("ts", "HH").alias("hh"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    attributed = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (
            F.unix_millis(F.col("v_ts").cast("timestamp"))
            >= F.unix_millis(F.col("p_ts").cast("timestamp")) - 7_200_000
        )
        & (
            F.unix_millis(F.col("v_ts").cast("timestamp"))
            <= F.unix_millis(F.col("p_ts").cast("timestamp"))
        ),
        "left_anti",
    )
    orphans = attributed.groupBy("hh").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orphans")
    )
    totals = p.groupBy("hh").agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
    return (
        totals.join(F.broadcast(orphans), "hh", "left")
        .select(
            F.col("hh").alias("hour_of_day"),
            "n_purchases",
            F.coalesce(F.col("n_orphans"), F.lit(0)).cast("bigint").alias("n_orphans"),
            fround(
                F.coalesce(F.col("n_orphans"), F.lit(0)).cast("double")
                / F.col("n_purchases"),
                6,
            ).alias("orphan_rate"),
        )
    )


# ---------------------------------------------------------------------------
# e46 — per-session event-type entropy by session size (round 10):
# how MIXED a session's behavior is — the composition dial next to
# e03's pure size readout and e36's type-affinity matrix
# ---------------------------------------------------------------------------

_E46_Q = 1_000_000_000.0  # 1e-9 quantization of each -p·ln p term


@query(
    "e46_session_type_entropy",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > {SESSION_GAP_MS}
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_type,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    ),
    tc AS (
        SELECT user_id, session_id, event_type,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM sessions GROUP BY user_id, session_id, event_type
    ),
    tot AS (
        SELECT user_id, session_id,
               CAST(SUM(cnt) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_types
        FROM tc GROUP BY user_id, session_id
    ),
    ps AS (
        SELECT t.user_id, t.session_id, ANY_VALUE(n_events) AS n_events,
               ANY_VALUE(n_types) AS n_types,
               CAST(SUM(CAST(FLOOR(
                   -(CAST(cnt AS DOUBLE) / n_events)
                   * ln(CAST(cnt AS DOUBLE) / n_events) * {_E46_Q} + 0.5
               ) AS BIGINT)) AS BIGINT) AS qh
        FROM tc t JOIN tot USING (user_id, session_id)
        GROUP BY t.user_id, t.session_id
    )
    SELECT CASE WHEN n_events <= 1 THEN '1'
                WHEN n_events <= 3 THEN '2-3'
                WHEN n_events <= 7 THEN '4-7'
                ELSE '8+' END AS size_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           {sql_fround(f"CAST(SUM(qh) AS DOUBLE) / {_E46_Q} / COUNT(*)", 6)}
               AS avg_type_entropy,
           {sql_fround(f"CAST(MAX(qh) AS DOUBLE) / {_E46_Q}", 6)}
               AS max_type_entropy,
           {sql_fround("CAST(SUM(n_types) AS DOUBLE) / COUNT(*)", 4)}
               AS avg_n_types
    FROM ps
    GROUP BY 1
    """,
    doc="Per-session event-type Shannon entropy, rolled up by session "
    "size bucket — the COMPOSITION dial next to e03's size readout: a "
    "session of 8 pageviews and a session mixing view/cart/purchase "
    "have the same e03 row but opposite entropy, and the bucket "
    "breakdown separates 'long sessions are mixed journeys' from "
    "'long sessions are monotone scrolling' (singleton sessions pin "
    "bucket '1' at exactly 0 — the built-in calibration row). Every "
    "-p·ln p term is 1e-9-quantized per (session, type) BEFORE the "
    "per-session sum (t51 discipline), and the bucket rollup averages "
    "the exact BIGINT qh values, so both engines agree bit-for-bit. "
    "Scale: sessionization is e03's lag + cumsum windows (one shuffle "
    "on user_id, state bounded per user), then two count rollups on "
    "the (session, type) grain and a 4-row bucket agg — nothing "
    "data-sized beyond the session shuffle itself.",
)
def e46_session_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    prev_ms = F.lag(ms).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(prev_ms.isNull() | ((ms - prev_ms) > SESSION_GAP_MS), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    wsum = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = flagged.select(
        "user_id",
        "event_type",
        F.sum("new_session").over(wsum).alias("session_id"),
    )
    tc = sessions.groupBy("user_id", "session_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = tc.groupBy("user_id", "session_id").agg(
        F.sum("cnt").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    p = F.col("cnt").cast("double") / F.col("n_events")
    qt = F.floor(-p * F.log(p) * _E46_Q + F.lit(0.5)).cast("bigint")
    ps = (
        tc.join(tot, ["user_id", "session_id"])
        .groupBy("user_id", "session_id")
        .agg(
            F.first("n_events").alias("n_events"),
            F.first("n_types").alias("n_types"),
            F.sum(qt).cast("bigint").alias("qh"),
        )
    )
    bucket = (
        F.when(F.col("n_events") <= 1, "1")
        .when(F.col("n_events") <= 3, "2-3")
        .when(F.col("n_events") <= 7, "4-7")
        .otherwise("8+")
    )
    return ps.groupBy(bucket.alias("size_bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        fround(F.sum("qh").cast("double") / _E46_Q / F.count(F.lit(1)), 6).alias(
            "avg_type_entropy"
        ),
        fround(F.max("qh").cast("double") / _E46_Q, 6).alias("max_type_entropy"),
        fround(F.sum("n_types").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_n_types"
        ),
    )


# ---------------------------------------------------------------------------
# e47 — between-session return-time distribution vs the exponential
# model (round 10): e27 measures WITHIN-session inter-event gaps; this
# measures the user's RETURN time across sessions, and grades the
# memoryless model a marketer's "win-back after N hours" rule assumes
# ---------------------------------------------------------------------------

_E47_BOUNDS_H = (0.5, 5.5, 23.5, 167.5)  # excess-hour bucket fences
_E47_LABELS = ("lt_1h", "1h_6h", "6h_24h", "24h_7d", "ge_7d")


def _e47_bucket_sql() -> str:
    ms = [int(b * 3_600_000) for b in _E47_BOUNDS_H]
    return (
        f"CASE WHEN excess_ms < {ms[0]} THEN '{_E47_LABELS[0]}' "
        f"WHEN excess_ms < {ms[1]} THEN '{_E47_LABELS[1]}' "
        f"WHEN excess_ms < {ms[2]} THEN '{_E47_LABELS[2]}' "
        f"WHEN excess_ms < {ms[3]} THEN '{_E47_LABELS[3]}' "
        f"ELSE '{_E47_LABELS[4]}' END"
    )


def _e47_model_sql() -> str:
    """exp(-lam*a) - exp(-lam*b) per bucket, b=inf for the tail."""
    bounds = list(_E47_BOUNDS_H)
    cases = []
    prev = 0.0
    for i, lab in enumerate(_E47_LABELS):
        a = prev
        if i < len(bounds):
            b = bounds[i]
            cases.append(
                f"WHEN bucket = '{lab}' THEN exp(-lam * {a}) - exp(-lam * {b})"
            )
            prev = b
        else:
            cases.append(f"WHEN bucket = '{lab}' THEN exp(-lam * {a})")
    return "CASE " + " ".join(cases) + " END"


@query(
    "e47_intersession_gaps",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > {SESSION_GAP_MS}
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    ),
    bounds AS (
        SELECT user_id, session_id,
               CAST(MIN(epoch_ms(ts)) AS BIGINT) AS start_ms,
               CAST(MAX(epoch_ms(ts)) AS BIGINT) AS end_ms
        FROM sessions GROUP BY user_id, session_id
    ),
    gaps AS (
        SELECT LEAD(start_ms) OVER (PARTITION BY user_id ORDER BY session_id)
                   - end_ms - {SESSION_GAP_MS} AS excess_ms
        FROM bounds
        QUALIFY excess_ms IS NOT NULL
    ),
    lamf AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(excess_ms) AS BIGINT) AS s,
               CAST(COUNT(*) AS DOUBLE) * 3600000.0 / SUM(excess_ms) AS lam
        FROM gaps
    ),
    hist AS (
        SELECT {_e47_bucket_sql()} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_gaps
        FROM gaps GROUP BY 1
    )
    SELECT bucket, n_gaps,
           {sql_fround("CAST(n_gaps AS DOUBLE) / n", 6)} AS obs_share,
           {sql_fround(_e47_model_sql(), 6)} AS model_share
    FROM hist CROSS JOIN lamf
    """,
    doc="Between-session return-time distribution per bucket, graded "
    "against the exponential (memoryless) return model: sessionize "
    "with e03's 30-min gap machinery, take each session's end -> next "
    "session's start EXCESS over the gap threshold (the shifted "
    "support — raw gaps are >= 30 min by construction), fit the "
    "one-parameter exponential by MLE (lambda = n/mean excess, from "
    "exact integer millisecond sums), and report observed vs model "
    "mass per bucket. Where obs_share exceeds model_share in the "
    "tail, returns are heavier-tailed than memoryless — the "
    "empirical fact behind win-back campaign timing (and the reason "
    "e40 fits power-law tails elsewhere). Bucket assignment is exact "
    "integer-ms comparison; lambda is one division from exact "
    "integers so both engines evaluate identical doubles through "
    "exp, 1e-6-rounded. Scale: e03's user-keyed session windows are "
    "the only data-sized stages; the histogram is 5 rows and the "
    "model pass is bucket-grain.",
)
def e47_intersession_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    prev_ms = F.lag(ms).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(prev_ms.isNull() | ((ms - prev_ms) > SESSION_GAP_MS), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    wsum = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = flagged.select(
        "user_id",
        ms.alias("ts_ms"),
        F.sum("new_session").over(wsum).alias("session_id"),
    )
    bounds = sessions.groupBy("user_id", "session_id").agg(
        F.min("ts_ms").cast("bigint").alias("start_ms"),
        F.max("ts_ms").cast("bigint").alias("end_ms"),
    )
    wnext = W.partitionBy("user_id").orderBy("session_id")
    gaps = (
        bounds.select(
            (
                F.lead("start_ms").over(wnext)
                - F.col("end_ms")
                - F.lit(SESSION_GAP_MS)
            ).alias("excess_ms")
        )
        .filter(F.col("excess_ms").isNotNull())
    )
    lamf = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("excess_ms").cast("bigint").alias("s"),
        (
            F.count(F.lit(1)).cast("double")
            * F.lit(3600000.0)
            / F.sum("excess_ms")
        ).alias("lam"),
    )
    bms = [int(b * 3_600_000) for b in _E47_BOUNDS_H]
    bucket = (
        F.when(F.col("excess_ms") < bms[0], _E47_LABELS[0])
        .when(F.col("excess_ms") < bms[1], _E47_LABELS[1])
        .when(F.col("excess_ms") < bms[2], _E47_LABELS[2])
        .when(F.col("excess_ms") < bms[3], _E47_LABELS[3])
        .otherwise(_E47_LABELS[4])
    )
    hist = gaps.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps")
    )
    model = F.lit(None).cast("double")
    prev = 0.0
    expr = None
    for i, lab in enumerate(_E47_LABELS):
        a = prev
        if i < len(_E47_BOUNDS_H):
            b = _E47_BOUNDS_H[i]
            val = F.exp(-F.col("lam") * a) - F.exp(-F.col("lam") * b)
            prev = b
        else:
            val = F.exp(-F.col("lam") * a)
        expr = F.when(F.col("bucket") == lab, val) if expr is None else expr.when(
            F.col("bucket") == lab, val
        )
    model = expr
    return hist.crossJoin(F.broadcast(lamf)).select(
        "bucket",
        "n_gaps",
        fround(F.col("n_gaps").cast("double") / F.col("n"), 6).alias("obs_share"),
        fround(model, 6).alias("model_share"),
    )


# ---------------------------------------------------------------------------
# e48 — Ljung–Box portmanteau whiteness test (round 11): e34's ACF
# battery folded into the single is-this-series-white verdict
# ---------------------------------------------------------------------------

_E48_MAX_LAG = 7  # weekly horizon, matching e34
_E48_Q = 1_000_000_000.0  # 1e-9 quantization of per-lag Q terms
# chi-square 0.95 critical value at df=7 — SHARED plan literal
_E48_CRIT = "14.067140449340169"


@query(
    "e48_ljung_box",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS didx,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS s
        FROM daily GROUP BY 1
    ),
    den AS (
        SELECT d.event_type,
               CAST(SUM((t.n * d.c - t.s) * (t.n * d.c - t.s)) AS BIGINT) AS dd
        FROM daily d JOIN tot t ON d.event_type = t.event_type
        GROUP BY 1
    ),
    lagged AS (
        SELECT d.event_type, l.lag, d.didx + l.lag AS key, d.c AS x
        FROM daily d,
             (SELECT unnest(generate_series(1, {_E48_MAX_LAG})) AS lag) l
    ),
    num AS (
        SELECT a.event_type, a.lag,
               CAST(SUM((t.n * a.x - t.s) * (t.n * b.c - t.s)) AS BIGINT) AS nn
        FROM lagged a
        JOIN daily b ON b.event_type = a.event_type AND b.didx = a.key
        JOIN tot t ON t.event_type = a.event_type
        GROUP BY 1, 2
    ),
    terms AS (
        SELECT n.event_type,
               CAST(SUM(CAST(FLOOR(
                   CAST(t.n AS DOUBLE) * (t.n + 2)
                   * POWER(CAST(nn AS DOUBLE) / dd, 2) / (t.n - n.lag)
                   * {_E48_Q} + 0.5
               ) AS BIGINT)) AS BIGINT) AS qq,
               CAST(COUNT(*) AS BIGINT) AS n_lags
        FROM num n
        JOIN tot t ON t.event_type = n.event_type
        JOIN den d ON d.event_type = n.event_type
        GROUP BY 1
    )
    SELECT t.event_type, t.n AS n_days, terms.n_lags,
           {sql_fround(f"CAST(qq AS DOUBLE) / {_E48_Q}", 6)} AS lb_q,
           CAST(qq AS DOUBLE) / {_E48_Q} > {_E48_CRIT} AS reject_white
    FROM terms JOIN tot t ON t.event_type = terms.event_type
    """,
    doc=f"Ljung–Box portmanteau test (1978) of the daily event-count "
    f"series per event type, lags 1..{_E48_MAX_LAG}: Q = n(n+2) * sum "
    "rho_k^2/(n-k) against the chi-square 0.95 critical value at df="
    f"{_E48_MAX_LAG} — e34 reports the per-lag ACF dial, this folds "
    "it into the single is-there-ANY-autocorrelation verdict a "
    "forecasting pipeline gates on before trusting residuals (white "
    "noise -> q79/q119's models have extracted all structure; reject "
    "-> a rhythm remains to model). Rho uses the standard "
    "fixed-mean ACF: numerator and denominator are EXACT int64 "
    "moments of (n*c - S) — the n^2-scaled centered counts, so no "
    "mean double enters any sum — and lag alignment is e34's "
    "gap-safe day-index equi-join. Each lag's Q term is quantized to "
    "a 1e-9 BIGINT before the per-type sum (t51 discipline), and the "
    "critical value is a shared plan literal. Scale: one (type, day) "
    f"rollup, a {_E48_MAX_LAG}-fold explode of that daily frame, one "
    "co-partitioned self-join, two type-grain rollups — no window.",
)
def e48_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "didx"
        ),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
    )
    cen = F.col("n") * F.col("c") - F.col("s")
    den = (
        daily.join(tot, "event_type")
        .groupBy("event_type")
        .agg(F.sum(cen * cen).cast("bigint").alias("dd"))
    )
    lags = spark.range(1, _E48_MAX_LAG + 1).select(F.col("id").alias("lag"))
    lagged = daily.crossJoin(F.broadcast(lags)).select(
        "event_type",
        "lag",
        (F.col("didx") + F.col("lag")).alias("key"),
        F.col("c").alias("x"),
    )
    b = daily.select(
        F.col("event_type").alias("_et2"),
        F.col("didx").alias("_didx2"),
        F.col("c").alias("y"),
    )
    num = (
        lagged.join(
            b, (lagged["event_type"] == b["_et2"]) & (lagged["key"] == b["_didx2"])
        )
        .join(tot, "event_type")
        .groupBy("event_type", "lag")
        .agg(
            F.sum(
                (F.col("n") * F.col("x") - F.col("s"))
                * (F.col("n") * F.col("y") - F.col("s"))
            )
            .cast("bigint")
            .alias("nn")
        )
    )
    dn = F.col("n").cast("double")
    q_term = F.floor(
        dn
        * (F.col("n") + 2)
        * F.pow(F.col("nn").cast("double") / F.col("dd"), F.lit(2.0))
        / (F.col("n") - F.col("lag"))
        * _E48_Q
        + 0.5
    ).cast("bigint")
    terms = (
        num.join(tot, "event_type")
        .join(den, "event_type")
        .select("event_type", q_term.alias("qt"))
        .groupBy("event_type")
        .agg(
            F.sum("qt").cast("bigint").alias("qq"),
            F.count(F.lit(1)).cast("bigint").alias("n_lags"),
        )
    )
    lb = F.col("qq").cast("double") / _E48_Q
    return terms.join(tot, "event_type").select(
        "event_type",
        F.col("n").alias("n_days"),
        "n_lags",
        fround(lb, 6).alias("lb_q"),
        (lb > float(_E48_CRIT)).alias("reject_white"),
    )


# ---------------------------------------------------------------------------
# e49 — retention decay fit (round 11): e29's cohort triangle folded
# into the one decay constant a growth model actually consumes
# ---------------------------------------------------------------------------

_E49_Q = 1_000_000_000.0  # 1e-9 quantization of ln(retention) terms
_E49_LN2 = "0.6931471805599453"  # shared plan literal (t47 discipline)


@query(
    "e49_retention_decay",
    oracle=f"""
    WITH f AS (
        SELECT user_id,
               CAST(floor((epoch(MIN(ts)) - {_E29_ORIGIN}) / {_E29_WEEK}) AS BIGINT)
                 AS cohort_week
        FROM events GROUP BY user_id
    ),
    sz AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM f GROUP BY cohort_week
    ),
    a AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(floor((epoch(e.ts) - {_E29_ORIGIN}) / {_E29_WEEK}) AS BIGINT)
                 AS active_week
        FROM events e JOIN f ON e.user_id = f.user_id
    ),
    mx AS (SELECT MAX(active_week) AS max_week FROM a),
    cell AS (
        SELECT cohort_week, active_week - cohort_week AS w,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM a GROUP BY cohort_week, active_week
    ),
    pooled AS (
        SELECT c.w,
               CAST(SUM(c.n_active) AS BIGINT) AS act,
               CAST(SUM(sz.cohort_size) AS BIGINT) AS base
        FROM cell c
        JOIN sz ON sz.cohort_week = c.cohort_week
        CROSS JOIN mx
        WHERE c.w >= 1 AND c.cohort_week + c.w <= mx.max_week
        GROUP BY c.w
    ),
    pts AS (
        SELECT w,
               CAST(FLOOR(ln(CAST(act AS DOUBLE) / base) * {_E49_Q} + 0.5)
                   AS BIGINT) AS qy
        FROM pooled WHERE act > 0
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(w) AS BIGINT) AS sw,
               CAST(SUM(w * w) AS BIGINT) AS sww,
               CAST(SUM(qy) AS BIGINT) AS sy,
               CAST(SUM(w * qy) AS BIGINT) AS swy
        FROM pts
    )
    SELECT n AS n_offsets,
           {sql_fround(
               f"(CAST(n AS DOUBLE) * swy - CAST(sw AS DOUBLE) * sy)"
               f" / (CAST(n AS DOUBLE) * sww - CAST(sw AS DOUBLE) * sw)"
               f" / {_E49_Q}", 6)} AS slope,
           {sql_fround(
               f"(CAST(sy AS DOUBLE) / {_E49_Q}"
               f" - (CAST(n AS DOUBLE) * swy - CAST(sw AS DOUBLE) * sy)"
               f" / (CAST(n AS DOUBLE) * sww - CAST(sw AS DOUBLE) * sw)"
               f" / {_E49_Q} * sw) / n", 6)} AS intercept,
           CASE WHEN (CAST(n AS DOUBLE) * swy - CAST(sw AS DOUBLE) * sy) < 0
                THEN {sql_fround(
                    f"-{_E49_LN2} / ((CAST(n AS DOUBLE) * swy"
                    f" - CAST(sw AS DOUBLE) * sy)"
                    f" / (CAST(n AS DOUBLE) * sww - CAST(sw AS DOUBLE) * sw)"
                    f" / {_E49_Q})", 6)}
                END AS half_life_weeks
    FROM m
    """,
    doc="Exponential retention-decay fit over e29's cohort triangle: "
    "pooled retention per week offset (each offset pools ONLY the "
    "cohorts old enough to have reached it — the right-censoring "
    "guard that keeps young cohorts from faking a cliff), then an "
    "exact-moment OLS of ln(retention) on offset — slope, intercept "
    "and the half-life -ln2/slope a growth model plugs into LTV math "
    "(q85's revenue curve is the spend side of this user-count "
    "curve). Every ln term is quantized to a 1e-9 BIGINT before any "
    "sum, all four OLS moments are exact int64, and the slope is one "
    "identically-shaped double expression (the q81 OLS discipline) — "
    "engine-identical before rounding; ln2 is a shared plan literal; "
    "half-life is NULL unless the fitted slope is genuinely negative "
    "(the CASE guards a growing 'retention'). Scale: one per-user "
    "MIN reduce, one (user, week) distinct — both user-keyed "
    "shuffles — then everything lives on the offset grid, which the "
    "CALENDAR bounds.",
)
def e49_retention_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = lambda ts: F.floor((ts.cast("double") - _E29_ORIGIN) / _E29_WEEK).cast("bigint")  # noqa: E731
    f = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    sz = f.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    a = (
        ev.join(f, "user_id")
        .select("user_id", "cohort_week", week(F.col("ts")).alias("active_week"))
        .distinct()
    )
    mx = a.agg(F.max("active_week").alias("max_week"))
    cell = a.groupBy(
        "cohort_week", (F.col("active_week") - F.col("cohort_week")).alias("w")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    pooled = (
        cell.join(sz, "cohort_week")
        .crossJoin(F.broadcast(mx))
        .filter((F.col("w") >= 1) & (F.col("cohort_week") + F.col("w") <= F.col("max_week")))
        .groupBy("w")
        .agg(
            F.sum("n_active").cast("bigint").alias("act"),
            F.sum("cohort_size").cast("bigint").alias("base"),
        )
    )
    qy = F.floor(
        F.log(F.col("act").cast("double") / F.col("base")) * _E49_Q + 0.5
    ).cast("bigint")
    pts = pooled.filter(F.col("act") > 0).select("w", qy.alias("qy"))
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("w").cast("bigint").alias("sw"),
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("sww"),
        F.sum("qy").cast("bigint").alias("sy"),
        F.sum(F.col("w") * F.col("qy")).cast("bigint").alias("swy"),
    )
    dn = F.col("n").cast("double")
    num = dn * F.col("swy") - F.col("sw").cast("double") * F.col("sy")
    den = dn * F.col("sww") - F.col("sw").cast("double") * F.col("sw")
    slope = num / den / _E49_Q
    intercept = (F.col("sy").cast("double") / _E49_Q - slope * F.col("sw")) / dn
    return m.select(
        F.col("n").alias("n_offsets"),
        fround(slope, 6).alias("slope"),
        fround(intercept, 6).alias("intercept"),
        F.when(num < 0, fround(-F.lit(float(_E49_LN2)) / slope, 6)).alias(
            "half_life_weeks"
        ),
    )
