"""Star-schema table access (driver-generated parquet, see TESTDATA.md).

Parquet scans are the only physical source for the analytics surface, so
predicate pushdown / column pruning / partition discovery all come from
the native parquet DataSource — nothing custom. ``load_table`` returns a
lazy DataFrame; Catalyst prunes columns and pushes filters into the scan
(visible as ``PushedFilters`` / ``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor: region
# is 5 rows and nation 25 by TPC-H construction (they do not grow with SF).
ALWAYS_BROADCAST = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS). Reader behavior varies by
    Spark version: older readers reject it unless the legacy nanosAsLong
    flag maps it to bigint; Spark 4.1+ reads it natively as
    timestamp_ntz (micro-truncated). Normalize every shape to session-tz
    TimestampType truncated to microseconds — exactly what DuckDB's
    reader delivers, so oracle comparisons agree."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # integer `div` (not fp /): ns values exceed 2^53.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # session tz is UTC (session.py), so the wall-clock value is
        # preserved bit-for-bit; only the type tag changes.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so the SQL surface (spark.sql) sees the same
    catalog the DuckDB oracle does."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


# Join-key and common-filter columns per table: the columns whose
# ndv/min/max/null stats the cost-based optimizer needs for join
# reordering and filter-selectivity estimates. Complex-typed columns
# (embeddings.embedding, arrays) and huge text payloads are excluded —
# ANALYZE doesn't support the former and min/max on raw documents is
# dead weight.
STATS_COLUMNS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey", "r_name"),
    "nation": ("n_nationkey", "n_regionkey", "n_name"),
    "customer": ("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"),
    "supplier": ("s_suppkey", "s_nationkey", "s_acctbal"),
    "part": ("p_partkey", "p_brand", "p_type", "p_size"),
    "orders": ("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus", "o_orderpriority"),
    "lineitem": (
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_discount", "l_returnflag", "l_linestatus", "l_shipdate",
    ),
    "events_raw": ("event_id", "user_id", "event_type"),
    "documents": ("doc_id", "lang", "source", "n_chars"),
    "embeddings": ("vec_id", "label"),
}


def analyze_catalog(
    spark: SparkSession, database: str = "ecom", tables: tuple[str, ...] | None = None
) -> None:
    """Compute table- and column-level statistics for every registered
    table — the step a 100 TB deployment cannot skip: without catalog
    rowCount/ndv/min/max the cost-based optimizer (``spark.sql.cbo.*``)
    has only file sizes, so join reordering and filter-selectivity
    estimates degrade to guesses. One scan per table; at scale this
    runs after each load/compaction, not per query."""
    names = tables or tuple(
        "events_raw" if n == "events" else n for n in TABLES
    )
    for n in names:
        spark.sql(f"ANALYZE TABLE {database}.{n} COMPUTE STATISTICS")
        cols = STATS_COLUMNS.get(n)
        if cols:
            spark.sql(
                f"ANALYZE TABLE {database}.{n} COMPUTE STATISTICS "
                f"FOR COLUMNS {', '.join(cols)}"
            )


def register_persistent_catalog(
    spark: SparkSession, sf_dir: str, database: str = "ecom", analyze: bool = True
) -> None:
    """Register the star schema as PERSISTENT external tables — the
    Spark analog of the reference's Glue Crawler → Data Catalog → Athena
    path (/root/reference/README.md:24): crawl once, then any session
    queries `database.table` by name with no path knowledge.

    Requires a Hive-backed session (``get_catalog_spark`` /
    ``enableHiveSupport``): the default in-memory catalog drops metadata
    at session exit, Hive+Derby persists it across processes. Tables are
    EXTERNAL (metadata only — no data copy, drops never delete parquet).

    ``events`` is exposed as a persistent VIEW over the raw external
    table because the source parquet is TIMESTAMP(NANOS): the view does
    the nanos→micros conversion, but the reading session must still set
    ``spark.sql.legacy.parquet.nanosAsLong=true`` (a view cannot carry
    session conf; get_catalog_spark sets it).
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for n in TABLES:
        target = f"{database}.{'events_raw' if n == 'events' else n}"
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {target} USING parquet "
            f"LOCATION '{sf_dir}/{n}.parquet'"
        )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_ts = dict(spark.table(f"{database}.events_raw").dtypes).get("ts")
    if raw_ts == "bigint":
        ts_expr = "timestamp_micros(ts div 1000)"
    else:  # timestamp_ntz (Spark 4.1+ native nanos read) or timestamp
        ts_expr = "CAST(ts AS TIMESTAMP)"
    spark.sql(
        f"CREATE OR REPLACE VIEW {database}.events AS "
        f"SELECT * EXCEPT (ts), {ts_expr} AS ts "
        f"FROM {database}.events_raw"
    )
    if analyze:
        analyze_catalog(spark, database)


def get_catalog_spark(warehouse_dir: str, metastore_dir: str, **kwargs) -> SparkSession:
    """Session wired to a persistent Hive/Derby catalog at the given
    locations. Pair with ``register_persistent_catalog``; a later
    process pointed at the same dirs sees the same tables."""
    from ..session import get_spark

    return get_spark(
        extra_conf={
            "spark.sql.catalogImplementation": "hive",
            "spark.sql.warehouse.dir": warehouse_dir,
            "javax.jdo.option.ConnectionURL": (
                f"jdbc:derby:;databaseName={metastore_dir};create=true"
            ),
            "spark.sql.legacy.parquet.nanosAsLong": "true",
            # the point of analyze_catalog: let the cost-based optimizer
            # use catalog rowCount/ndv stats for join reordering and
            # selectivity estimates instead of raw file sizes
            "spark.sql.cbo.enabled": "true",
            "spark.sql.cbo.joinReorder.enabled": "true",
        },
        **kwargs,
    )
