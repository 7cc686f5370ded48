"""Differential oracle tests (SURVEY §5.2-1): every registered query
runs on Spark AND DuckDB at sf0.001 and must agree on row count, schema
names, and order-insensitive values — a stricter local preview of the
driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from e_commerce_data_engineering_spark.plans.registry import QUERIES, all_queries

from .oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


_ALL = all_queries()  # populates QUERIES via module imports
ORACLE_NAMES = [n for n, q in sorted(QUERIES.items()) if q.oracle is not None]
ROWS_ONLY_NAMES = [n for n, q in sorted(QUERIES.items()) if q.oracle is None]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = QUERIES[name]
    compare(q.spark_fn(spark, sf_dir), duck, q.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.spark_fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
