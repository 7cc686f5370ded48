"""Cross-engine deterministic aggregation/rounding helpers.

Two classes of oracle-comparison hazards, and their fixes:

1. **Order-dependent double SUM.** Parallel partial aggregation sums in
   a different order than DuckDB, so the last ulp differs and a ROUND
   can flip at a half-cent boundary. Fix: cast operands to DECIMAL
   before multiply/sum — exact, order-independent on both engines.

2. **Divergent ROUND-on-double semantics.** Spark's ``round(double)``
   goes through the shortest decimal string (BigDecimal.valueOf), so
   ``round(123.45499999999999, 2)`` → 123.46 (string "123.455" rounds
   HALF_UP) while DuckDB rounds the binary value → 123.45. Fix:
   (a) round DECIMAL values while still decimal, cast to double after;
   (b) for genuine doubles, use ``floor(x·10ⁿ + 0.5)/10ⁿ`` on BOTH
   engines — identical IEEE ops give identical results always.

Each Spark helper has a ``sql_*`` twin that emits the equivalent DuckDB
SQL so queries and oracles can never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dmoney(c: Column | str) -> Column:
    """Price-scale operand: exact cents."""
    return _c(c).cast("decimal(12,2)")


def dfrac(c: Column | str) -> Column:
    """Rate-scale operand (discount/tax, 2-dp in [0,1])."""
    return _c(c).cast("decimal(4,2)")


def money_sum(expr: Column, ndigits: int = 2) -> Column:
    """Exact decimal SUM → round while decimal → double."""
    return F.round(F.sum(expr), ndigits).cast("double")


def fround(expr: Column, ndigits: int) -> Column:
    """Engine-portable double rounding: floor(x·10ⁿ + 0.5)/10ⁿ."""
    s = F.lit(float(10**ndigits))
    return F.floor(expr * s + F.lit(0.5)) / s


def money_avg(expr: Column, ndigits: int = 4) -> Column:
    """Exact decimal SUM / COUNT, portable-rounded."""
    return fround(F.sum(expr).cast("double") / F.count(F.lit(1)), ndigits)


# ---------------------------------------------------------------------------
# DuckDB SQL twins (string emitters used inside oracle definitions)
# ---------------------------------------------------------------------------

def sql_dmoney(col: str) -> str:
    return f"CAST({col} AS DECIMAL(12,2))"


def sql_dfrac(col: str) -> str:
    return f"CAST({col} AS DECIMAL(4,2))"


def sql_money_sum(expr: str, ndigits: int = 2) -> str:
    return f"CAST(ROUND(SUM({expr}), {ndigits}) AS DOUBLE)"


def sql_fround(expr: str, ndigits: int) -> str:
    s = float(10**ndigits)
    return f"(FLOOR(({expr}) * {s} + 0.5) / {s})"


def sql_money_avg(expr: str, ndigits: int = 4) -> str:
    return sql_fround(f"CAST(SUM({expr}) AS DOUBLE) / COUNT(*)", ndigits)
