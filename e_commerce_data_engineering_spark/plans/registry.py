"""Query registry: the single source of truth behind
``__spark_entry__.queries()`` / ``oracle_sql()``.

Each entry couples a Spark builder ``(spark, sf_dir) -> DataFrame`` with
an equivalent ANSI-SQL oracle string DuckDB runs over the same parquet.
The driver hash-compares the two (row-count + schema + order-insensitive
value-hash), so:

* every computed column is aliased identically on both sides;
* double aggregates are rounded (2dp for money sums, 4dp for avgs) on
  BOTH sides so sum-order float jitter cannot flip the hash — Spark
  ``F.round`` and DuckDB ``ROUND`` are both HALF-AWAY-FROM-ZERO on
  doubles, so they agree bit-for-bit after rounding;
* DuckDB integer SUMs are CAST to BIGINT (DuckDB widens to HUGEINT,
  Spark keeps bigint);
* top-k queries carry a unique tiebreak key in the ORDER BY.

Queries tagged ``oracle=None`` are non-SQL-expressible (streaming
state, seeded generation, LSH banding); the driver records the weaker
rows-only check for them.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a Spark query builder with its oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(name=name, spark_fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all_modules() -> None:
    # Import side-effect registers every query module exactly once.
    from . import core  # noqa: F401
    from . import reference  # noqa: F401
    from . import events  # noqa: F401
    from . import text  # noqa: F401
    from . import similarity  # noqa: F401
    from . import advanced  # noqa: F401
    from . import scalar_batteries  # noqa: F401
    from . import extended  # noqa: F401


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all_modules()
    return {name: q.spark_fn for name, q in sorted(QUERIES.items())}


def all_oracles() -> dict[str, str]:
    _load_all_modules()
    return {name: q.oracle for name, q in sorted(QUERIES.items()) if q.oracle is not None}
