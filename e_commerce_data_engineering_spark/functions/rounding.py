"""Python-exact money rounding.

Python ``round(x, 2)`` correctly rounds the double's exact binary
value; Spark's ``bround`` re-quantizes through the shortest decimal
string (BigDecimal.valueOf) first. They disagree exactly when the
shortest repr is a half-cent tie — systematic for
``subtotal/num_items`` with 2 items and an odd-cent subtotal
(345.97/2 → "172.985": Python sees 172.98500000000001 → 172.99, Spark
sees the string tie → half-even → 172.98).

No Catalyst expression can recover the binary expansion, so the parity
pipeline uses this Arrow-vectorized pandas UDF for the affected
row-level divisions only (two top-level columns). Sums of 2-dp values
are immune (the binary sum sits ~1e-12 from an exact 2-dp decimal,
never near a half-cent), so all aggregate roundings stay in codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_udf_cache: list = []


def _py_round_2dp():
    """Lazily built (pandas_udf needs an active session to resolve types)."""
    if not _udf_cache:
        from pyspark.sql.functions import pandas_udf

        def inner(v: pd.Series) -> pd.Series:
            return v.map(lambda x: round(x, 2))  # NaN→NaN, exact Python semantics

        _udf_cache.append(pandas_udf(T.DoubleType())(inner))
    return _udf_cache[0]


def python_round2(col: Column, exact: bool = True) -> Column:
    """round(col, 2) with Python semantics (exact=True, Arrow UDF) or
    pure-codegen bround (exact=False, half-cent-tie divergence ~7% of
    2-item orders on average_item_value)."""
    return _py_round_2dp()(col) if exact else F.bround(col, 2)
