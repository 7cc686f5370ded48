"""Local replica of the driver's DuckDB-oracle comparison so we catch
hash mismatches before the round gate does.

Compares a Spark DataFrame against DuckDB running the oracle SQL on the
same parquet: row count, column-name set, and order-insensitive values
(columns sorted by name, rows sorted by all columns, floats compared
with a tiny tolerance — the real driver hashes, so our tolerance is
*stricter* than equality-after-rounding needs to be).
"""

from __future__ import annotations

import math

import duckdb

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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(value):
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    if isinstance(value, bool):
        return bool(value)
    if hasattr(value, "isoformat"):  # datetime/date
        return value.isoformat()
    return value


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in data]
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def compare(spark_df, con, sql: str, name: str = "?", float_tol: float = 1e-9) -> None:
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duck={len(du)}"
    s_rows = _rows(list(sp.columns), sp.itertuples(index=False, name=None))
    d_rows = _rows(list(du.columns), du.itertuples(index=False, name=None))
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=float_tol, abs_tol=float_tol), (
                    f"{name}: row {i} float {x} != {y}\nspark={a}\nduck={b}"
                )
            else:
                assert str(x) == str(y), f"{name}: row {i} {x!r} != {y!r}\nspark={a}\nduck={b}"
