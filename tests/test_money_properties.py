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


# ---------------------------------------------------------------------------
# SymSpell completeness lemma (d25's correctness foundation)
# ---------------------------------------------------------------------------


def _dels(w: str) -> set:
    return {w} | {w[:i] + w[i + 1 :] for i in range(len(w))}


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    st.text(alphabet="abc", min_size=0, max_size=8),
    st.text(alphabet="abc", min_size=0, max_size=8),
)
@settings(max_examples=500, deadline=None)
def test_symspell_deletion_neighborhood_is_complete_for_lev1(a, b):
    """d25's candidate generator rests on: levenshtein(a, b) <= 1 =>
    the single-deletion neighborhoods (including the words themselves)
    intersect — for substitution both sides delete the differing
    position, for insertion/deletion the longer side deletes the extra
    character, for identity the words themselves collide. Hypothesis
    over a deliberately tiny alphabet maximizes near-miss collisions."""
    if _lev(a, b) <= 1:
        assert _dels(a) & _dels(b), (a, b)
