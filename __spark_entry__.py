"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``e_commerce_data_engineering_spark/plans/``; this
module just re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from e_commerce_data_engineering_spark.plans.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Training-example assembly (t11): text quality metrics (token stats,
    Snowball-stopword mass, length sanity) joined with embedding-side
    hygiene (L2 norm) in one documents ⋈ embeddings pass — the curation
    query an LLM-data pipeline runs before export, all JVM-side HOFs.
    """
    from e_commerce_data_engineering_spark.plans.text import t11_training_assembly

    return t11_training_assembly(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return all_oracles()
