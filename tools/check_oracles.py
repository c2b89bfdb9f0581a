"""Local replica of the driver's DuckDB-oracle correctness gate — STRICT.

Round-1 forensics: the driver compares the Spark result (``.toPandas()``)
against the DuckDB oracle (``.df()``) by stringifying values, so a Spark
``Decimal('277.00')`` vs a DuckDB ``277.0`` float — same number — hash-
mismatches, as do ``int64`` vs ``float64`` (DuckDB sums of integers come
back HUGEINT → float64) and ``date`` vs ``datetime64``. This checker
therefore normalizes values *type-faithfully*: two results only pass if
they would stringify identically after pandas conversion on both sides.

Usage: python tools/check_oracles.py [query_name ...]
       SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 (default)
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

import numpy as np
import pandas as pd


def _norm_value(v):
    """Canonical token per value; distinct types that str() differently
    (int vs float, Decimal vs float, date vs timestamp) stay distinct."""
    if v is None:
        return ("null",)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("nan",)
        return ("f", repr(f))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, pd.Timestamp):
        return ("ts", str(v))
    if isinstance(v, datetime.datetime):
        return ("ts", str(pd.Timestamp(v)))
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, bytes):
        return ("bytes", v.hex())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("arr", tuple(_norm_value(x) for x in v))
    if v is pd.NaT:
        return ("nan",)
    return ("s", str(v))


def _norm_frame(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = [tuple(_norm_value(v) for v in r)
            for r in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return cols, rows


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import duckdb

    import __spark_entry__ as entry
    from flink_sql_security_spark.sources import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    queries = entry.queries()
    oracles = entry.oracle_sql()

    spark = build_session("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        from flink_sql_security_spark.operators.cache import release

        if name not in oracles:
            df = fn(spark, sf_dir)
            n = df.count()
            release(df)
            print(f"{name}: rows-only n={n}")
            continue
        try:
            df = fn(spark, sf_dir)
            spd = df.toPandas()
            release(df)  # free persisted super-stage intermediates
            dpd = con.execute(oracles[name]).df()
        except Exception as ex:  # surface which side broke
            failures += 1
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
            continue
        s_cols, s_rows = _norm_frame(spd)
        o_cols, o_rows = _norm_frame(dpd)
        if s_cols != o_cols:
            failures += 1
            print(f"{name}: COLUMN MISMATCH spark={s_cols} duckdb={o_cols}")
            continue
        if len(s_rows) != len(o_rows):
            failures += 1
            print(f"{name}: ROWCOUNT MISMATCH spark={len(s_rows)} duckdb={len(o_rows)}")
            continue
        diff = next((i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b), None)
        if diff is not None:
            failures += 1
            print(f"{name}: VALUE MISMATCH at sorted row {diff} (cols {s_cols}):")
            print(f"  spark : {s_rows[diff]}")
            print(f"  duckdb: {o_rows[diff]}")
        else:
            print(f"{name}: OK rows={len(s_rows)}")
    print(f"\n{'FAIL' if failures else 'PASS'} ({failures} mismatching queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
