"""Declarative data-quality checks (the dbt-test / Deequ shape): each
check compiles to one aggregate or anti-join over the table and returns
its violation count, so a whole audit is a handful of scans a scheduler
can run after every load. Nothing collects to the driver except the
per-check summary row.

At 100 TB each check is embarrassingly partition-parallel (count/
groupBy/anti-join); run_checks unions the tiny per-check summaries, so
the audit output is O(#checks) rows regardless of table size. Checks
whose violating ROWS are needed (not just counts) reuse the same
predicate via the ``violations`` helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key groups appearing more than once → (cols..., n_copies)."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def null_violations(df: DataFrame, col: str) -> DataFrame:
    return df.filter(F.col(col).isNull())


def accepted_values_violations(df: DataFrame, col: str, values: list) -> DataFrame:
    return df.filter(~F.col(col).isin(values) | F.col(col).isNull())


def referential_violations(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Child rows whose foreign key has no parent (orphans)."""
    return child.join(parent.select(F.col(pk).alias(fk)), fk, "left_anti")


def range_violations(df: DataFrame, col: str, lo=None, hi=None) -> DataFrame:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return df.filter(cond)


def _summary(name: str, violations: DataFrame) -> DataFrame:
    return violations.agg(
        F.lit(name).alias("check_name"),
        F.count(F.lit(1)).alias("n_violations"),
    )


def run_checks(checks: dict[str, DataFrame]) -> DataFrame:
    """{check_name: violations frame} → one summary row per check:
    (check_name, n_violations, passed)."""
    if not checks:
        raise ValueError("run_checks requires at least one check")
    out = None
    for name, v in checks.items():
        s = _summary(name, v)
        out = s if out is None else out.unionByName(s)
    return out.select(
        "check_name", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )
