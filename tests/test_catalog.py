"""Persistent-catalog tests: metadata registered once must be visible
to a FRESH process (the Glue-crawler → Athena analog — see
sources/tables.register_persistent_catalog). Runs each phase in a
subprocess because true persistence can only be observed across JVMs.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

_REGISTER = """
import sys; sys.path.insert(0, {repo!r})
from e_commerce_data_engineering_spark.sources.tables import (
    get_catalog_spark, register_persistent_catalog)
spark = get_catalog_spark({wh!r}, {ms!r}, cpus=4, app_name="cat-reg")
register_persistent_catalog(spark, {sf!r}, database="ecom_t")
n = spark.sql("SELECT count(*) AS n FROM ecom_t.region").collect()[0]["n"]
assert n == 5, n
spark.stop()
print("REGISTERED")
"""

_FRESH_READ = """
import sys; sys.path.insert(0, {repo!r})
from e_commerce_data_engineering_spark.sources.tables import get_catalog_spark
spark = get_catalog_spark({wh!r}, {ms!r}, cpus=4, app_name="cat-read")
tables = sorted(t.name for t in spark.catalog.listTables("ecom_t"))
assert "lineitem" in tables and "events" in tables and "events_raw" in tables, tables
# join across persistent tables by NAME only — no paths in this process
row = spark.sql(
    "SELECT count(*) AS n FROM ecom_t.lineitem l "
    "JOIN ecom_t.orders o ON l.l_orderkey = o.o_orderkey"
).collect()[0]
assert row["n"] > 0
# the events VIEW must deliver converted microsecond timestamps
dt = dict(spark.sql("SELECT * FROM ecom_t.events").dtypes)
assert dt["ts"] == "timestamp", dt
assert spark.sql("SELECT count(*) AS n FROM ecom_t.events").collect()[0]["n"] > 0
spark.stop()
print("FRESH_OK")
"""


def _run(code: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout


def test_catalog_survives_process_restart():
    with tempfile.TemporaryDirectory() as tmp:
        args = dict(
            repo=REPO,
            wh=f"{tmp}/warehouse",
            ms=f"{tmp}/metastore",
            sf=SF_DIR,
        )
        assert "REGISTERED" in _run(_REGISTER.format(**args))
        assert "FRESH_OK" in _run(_FRESH_READ.format(**args))
