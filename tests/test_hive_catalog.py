"""Hive-metastore catalog mode: the reference's actual deployment shape.

The reference registers a HiveCatalog and resolves ``hive.default.*``
through it (``SecurityContext.java:116-121``; its test harness spins an
embedded metastore in ``HiveTestUtils.java:40-67``). Parity here: the
rewrite goldens must hold when tables are PERSISTENT metastore tables
(``spark_catalog``, embedded Derby) instead of session temp views — the
security layer's schema fetch then goes through HiveExternalCatalog,
which round-trips types through Hive DDL strings (a real divergence
risk for the mask CAST path that temp views never exercise).

Runs in a subprocess: ``enableHiveSupport`` must be set by the FIRST
builder in a JVM, and the shared test session is not Hive-enabled.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r'''
import os, sys, tempfile
sys.path.insert(0, "@REPO@")
d = tempfile.mkdtemp(prefix="fss-hive")
os.chdir(d)  # derby writes metastore_db + derby.log under cwd

from flink_sql_security_spark.sources import build_session
spark = build_session("fss-hive-test", cpus=4, hive_metastore=True,
                      warehouse_dir=d + "/wh",
                      metastore_url="jdbc:derby:;databaseName=" + d
                                    + "/metastore_db;create=true")
spark.sparkContext.setLogLevel("ERROR")
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"

# persistent metastore tables (NOT temp views): schema fetch now goes
# through HiveExternalCatalog, DECIMAL/DATE DDL strings included
sf = "/root/testdata/sf0.001"
for t in ("customer", "orders", "supplier"):
    spark.read.parquet(f"{sf}/{t}.parquet").write.mode("overwrite") \
        .format("parquet").saveAsTable(t)
assert not any(v.isTemporary for v in spark.catalog.listTables()
               if v.name in ("customer", "orders", "supplier"))

from flink_sql_security_spark.presets import (
    demo_context, USER_FILTER, USER_MASK, USER_DATE)
ctx = demo_context(spark)

# 1. RLS golden through the metastore-resolved table
got = ctx.rewrite_row_filter(USER_FILTER, "SELECT o_orderkey FROM orders")
assert "o_orderpriority = '1-URGENT'" in got, got
n_sec = ctx.sql(USER_FILTER, "SELECT count(*) AS n FROM orders").collect()[0]["n"]
n_want = spark.sql(
    "SELECT count(*) AS n FROM orders WHERE o_orderpriority = '1-URGENT'"
).collect()[0]["n"]
assert n_sec == n_want > 0, (n_sec, n_want)

# 2. mask golden: the CAST type must come from the Hive catalog's schema
got = ctx.rewrite_data_mask(USER_MASK, "SELECT c_name FROM customer")
assert "substring(c_name, 1, 4)" in got and "CAST" in got, got
q = "SELECT c_name FROM customer ORDER BY c_custkey"
rows = ctx.execute_data_mask(USER_MASK, q, size=5)
orig = ctx.execute(q, size=5)
assert rows and all(m["c_name"][:4] == o["c_name"][:4]
                    and m["c_name"] != o["c_name"]
                    for m, o in zip(rows, orig)), (rows, orig)

# 3. DATE mask: exercises a non-string DDL type through the Hive schema
got = ctx.rewrite_data_mask(USER_DATE, "SELECT o_orderdate FROM orders")
assert "CAST" in got and "DATE" in got.upper(), got
r = ctx.execute_data_mask(USER_DATE, "SELECT o_orderdate FROM orders", size=3)
assert r and all(v["o_orderdate"].month == 1 and v["o_orderdate"].day == 1
                 for v in r), r

# 4. DDL type round-trip through HiveExternalCatalog feeds the CAST path
from flink_sql_security_spark.catalog import CatalogAdapter
cols = dict(CatalogAdapter(spark).schema_provider(["orders"]))
assert cols["o_orderkey"] == "BIGINT", cols
assert cols["o_totalprice"] == "DOUBLE", cols
assert cols["o_orderdate"].startswith("TIMESTAMP"), cols

spark.stop()
print("HIVE-GOLDENS-PASS")
'''


def test_rewrite_goldens_against_hive_metastore():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("@REPO@", "/root/repo")],
        capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "HIVE-GOLDENS-PASS" in proc.stdout
