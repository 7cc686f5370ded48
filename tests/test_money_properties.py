"""Property-based check of the cross-engine rounding discipline
(plans/money.py): for arbitrary doubles, Spark's fround and DuckDB's
sql_fround emit the same digits — the invariant every oracle pair
relies on. Hypothesis drives the value space (including half-cent
boundaries, denormals, negatives)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from e_commerce_data_engineering_spark.plans.money import fround, sql_fround

import pyspark.sql.functions as F


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e9,
            max_value=1e9,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=6),
)
def test_fround_matches_duckdb(spark_global, values, ndigits):
    spark = spark_global
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = [r["r"] for r in df.select(fround(F.col("v"), ndigits).alias("r")).collect()]
    con = duckdb.connect()
    expr = sql_fround("v", ndigits)
    want = [
        con.execute(f"SELECT {expr} AS r FROM (SELECT CAST(? AS DOUBLE) AS v)", [v]).fetchone()[0]
        for v in values
    ]
    assert got == want, list(zip(values, got, want))


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark
