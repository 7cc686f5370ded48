"""Row validation + quarantine split (SURVEY §2.2 P2/P3) — the Spark
twin of ``validate_order`` (/root/reference/ecommerce-order-processor.py:105-119).

The reference logs & drops invalid rows (no DLQ; its README.md:68
recommends one). We upgrade to a quarantine split: the invalid side
keeps the rows plus an ``errors array<string>`` column with the
reference's own (French) messages, so nothing is silently lost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SUBTOTAL_TOLERANCE = 0.01  # processor:116

ERR_TOTAL = "Montant total invalide"  # processor:109
ERR_ORDER_ID = "ID commande manquant"  # processor:111
ERR_NO_ITEMS = "Aucun article"  # processor:113
ERR_SUBTOTAL = "Sous-total incohérent"  # processor:117


def error_array() -> Column:
    """Per-rule F.when → array_compact, mirroring processor:106-117."""
    items_sum = F.aggregate(
        F.coalesce(F.col("items"), F.array()), F.lit(0.0), lambda a, x: a + x["subtotal"]
    )
    checks = [
        F.when(F.coalesce(F.col("total_amount"), F.lit(0.0)) <= 0, F.lit(ERR_TOTAL)),
        F.when(
            F.col("order_id").isNull() | (F.length("order_id") == 0), F.lit(ERR_ORDER_ID)
        ),
        F.when(F.col("items").isNull() | (F.size("items") == 0), F.lit(ERR_NO_ITEMS)),
        F.when(
            F.abs(items_sum - F.coalesce(F.col("subtotal"), F.lit(0.0))) > SUBTOTAL_TOLERANCE,
            F.lit(ERR_SUBTOTAL),
        ),
    ]
    return F.array_compact(F.array(*checks))


def split_valid(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """→ (valid_rows, quarantined_rows_with_errors).

    One shared ``errors`` projection: Catalyst dedups the expression;
    the two filters read the same cached scan.
    """
    with_errors = raw.withColumn("errors", error_array())
    valid = with_errors.filter(F.size("errors") == 0).drop("errors")
    invalid = with_errors.filter(F.size("errors") > 0)
    return valid, invalid
