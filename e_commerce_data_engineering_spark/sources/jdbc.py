"""JDBC source/sink (SURVEY §2.1 family: the relational-database edge
of the ingest surface).

The container ships no external database, but Spark's own embedded
Derby (the jars that back the Hive metastore) is a real JDBC engine —
so the connector path here is the genuine `spark.read/write.format
("jdbc")` code a production deployment points at Postgres/MySQL by
swapping the URL and driver. What these wrappers add over raw options
is the 100 TB discipline:

* ``jdbc_read`` REQUIRES explicit partitioning bounds for anything but
  trivially small tables — an unpartitioned JDBC read is one executor
  pulling the whole table through one connection, the classic ingest
  bottleneck. With (partition_col, lower, upper, n) Spark issues n
  range-predicated queries in parallel.
* Filter pushdown is real and asserted in tests: Catalyst pushes
  predicates into the remote WHERE clause (``PushedFilters: [*...]`` —
  the ``*`` marks source-evaluated), so the database prunes before
  bytes cross the wire.
* ``jdbc_write`` batches inserts (rewriteBatchedStatements-style
  semantics are driver-specific; batchsize is the portable knob).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str) -> str:
    """Embedded-Derby JDBC URL rooted at ``db_dir`` (created on use)."""
    return f"jdbc:derby:{db_dir};create=true"


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    driver: str = DERBY_DRIVER,
    batchsize: int = 1000,
) -> None:
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )


def jdbc_read(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    partition_col: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Read ``table``; pass (partition_col, lower, upper,
    num_partitions) to fan the scan out over range-predicated parallel
    queries — mandatory at scale, optional only for small dims."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_col is not None:
        assert lower is not None and upper is not None and num_partitions
        r = (
            r.option("partitionColumn", partition_col)
            .option("lowerBound", str(lower))
            .option("upperBound", str(upper))
            .option("numPartitions", str(num_partitions))
        )
    return r.load()
