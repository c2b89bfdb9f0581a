"""Local replica of the driver's DuckDB-oracle correctness gate — STRICT.

Round-1 forensics: the driver compares the Spark result (``.toPandas()``)
against the DuckDB oracle (``.df()``) by stringifying values, so a Spark
``Decimal('277.00')`` vs a DuckDB ``277.0`` float — same number — hash-
mismatches, as do ``int64`` vs ``float64`` (DuckDB sums of integers come
back HUGEINT → float64) and ``date`` vs ``datetime64``. This checker
therefore normalizes values *type-faithfully*: two results only pass if
they would stringify identically after pandas conversion on both sides.

Usage: python tools/check_oracles.py [--sf 0.001|0.01|0.1|all|<dir>]
                                     [query_name ...]
       SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 (default)

``--sf all`` runs the full strict sweep at sf0.001, sf0.01 AND sf0.1,
one subprocess per scale factor (oracle SQL embeds parquet paths and
data-derived artifacts at build time, so each scale needs a fresh
module + session), and fails if any scale fails.
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


def _parse_args(argv: list[str]):
    """(sf_choice | None, [query names]) — ``--sf`` takes a scale
    factor, ``all``, or a directory path."""
    sf = None
    names = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            if i + 1 >= len(argv):
                raise SystemExit("--sf needs a value (0.001|0.01|0.1|all|dir)")
            sf = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1
    return sf, names


def _run_all_sfs(names: list[str]) -> int:
    """One subprocess per SF: oracle SQL embeds parquet paths and
    data-derived artifacts (PQ codebooks, coarse centroids) at build
    time, so each scale must rebuild from a fresh module + session."""
    import subprocess

    rc = 0
    results = []
    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
        print(f"=== sf{sf} ({sf_dir}) ===", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *names], env=env)
        results.append((sf, r.returncode))
        rc |= r.returncode
    print("\n--sf all summary: " + ", ".join(
        f"sf{sf}={'PASS' if code == 0 else 'FAIL'}"
        for sf, code in results))
    return rc


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    sf_arg, names = _parse_args(sys.argv[1:])
    if sf_arg == "all":
        return _run_all_sfs(names)
    if sf_arg is not None:
        os.environ["SPARK_GRAFT_SF_DIR"] = (
            sf_arg if os.path.sep in sf_arg else f"/root/testdata/sf{sf_arg}")

    import duckdb

    import __spark_entry__ as entry
    from flink_sql_security_spark.sources import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(names)

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
