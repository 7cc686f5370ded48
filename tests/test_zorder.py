"""Z-order layout: every output file must cover a narrow value range in
EVERY z-ordered column (the file-skipping precondition), where a plain
single-column sort localizes one column and leaves the others at full
span. Asserted by reading each output file's actual min/max — the same
stats parquet footers carry."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from e_commerce_data_engineering_spark.operators.layout import zorder_write
from e_commerce_data_engineering_spark.sources.tables import load_table

from .conftest import SF_SMOKE

COLS = ["l_partkey", "l_suppkey"]


def _avg_span(spark, path: str, col: str, lo: float, hi: float) -> float:
    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        r = spark.read.parquet(f).agg(F.min(col), F.max(col)).first()
        spans.append((r[1] - r[0]) / (hi - lo))
    assert len(spans) >= 4, f"expected several files, got {len(spans)}"
    return sum(spans) / len(spans)


def test_zorder_localizes_every_listed_column(spark, tmp_path):
    li = load_table(spark, SF_SMOKE, "lineitem").select(*COLS, "l_quantity")
    lo_p, hi_p, lo_s, hi_s = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()

    zpath = str(tmp_path / "zorder")
    boundaries = zorder_write(li, COLS, zpath, n_files=8, bits=4)
    assert len(boundaries) == 2 and len(boundaries[0]) == 15  # 2^4 - 1

    # lossless rewrite
    assert spark.read.parquet(zpath).count() == li.count()

    spath = str(tmp_path / "sorted")
    li.repartitionByRange(8, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.mode("overwrite").parquet(spath)

    z_p = _avg_span(spark, zpath, "l_partkey", lo_p, hi_p)
    z_s = _avg_span(spark, zpath, "l_suppkey", lo_s, hi_s)
    s_p = _avg_span(spark, spath, "l_partkey", lo_p, hi_p)
    s_s = _avg_span(spark, spath, "l_suppkey", lo_s, hi_s)

    # plain sort: near-perfect on the sort column, no locality on the other
    assert s_p < 0.35 and s_s > 0.85, (s_p, s_s)
    # z-order: BOTH columns localized — each file sees well under the
    # full span, and the non-sort column improves by a wide margin
    assert z_p < 0.65, z_p
    assert z_s < 0.65, z_s
    assert z_s < s_s - 0.25, (z_s, s_s)
