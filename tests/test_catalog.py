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

# --- statistics registered by analyze_catalog must survive too ---
desc = {{r["col_name"]: r["data_type"] for r in
        spark.sql("DESCRIBE TABLE EXTENDED ecom_t.nation").collect()}}
assert "Statistics" in desc and "rows" in desc["Statistics"], desc.get("Statistics")
cdesc = {{r["info_name"]: r["info_value"] for r in
         spark.sql("DESCRIBE TABLE EXTENDED ecom_t.nation n_regionkey").collect()}}
assert cdesc.get("distinct_count") not in (None, "NULL"), cdesc

# --- and the CBO must USE them: with cbo.enabled (get_catalog_spark
# sets it) an equality filter on an analyzed column estimates
# rowCount ~ total/ndv, strictly below the table rowCount ---
tbl = spark.table("ecom_t.nation")
flt = tbl.filter(tbl.n_regionkey == 0)
n_est = flt._jdf.queryExecution().optimizedPlan().stats().rowCount()
t_est = tbl._jdf.queryExecution().optimizedPlan().stats().rowCount()
assert t_est.isDefined() and int(str(t_est.get())) == 25, str(t_est)
assert n_est.isDefined(), "no CBO rowCount estimate on filtered plan"
assert 0 < int(str(n_est.get())) < 25, str(n_est.get())
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
