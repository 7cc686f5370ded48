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


def register_persistent_catalog(
    spark: SparkSession, sf_dir: str, database: str = "ecom"
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
        },
        **kwargs,
    )
