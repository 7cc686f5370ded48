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
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    outright. Read nanos as long (legacy flag) and truncate to
    microseconds — exactly what DuckDB's reader does, so oracle
    comparisons agree."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        # integer `div` (not fp /): ns values exceed 2^53.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so the SQL surface (spark.sql) sees the same
    catalog the DuckDB oracle does."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
