"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its ``oracle_sql()`` SQL
side by side (default sf0.01), normalizes both result sets the same way the
driver does (columns sorted by name, rows sorted, value-normalized), and
reports match/mismatch per query.

Usage: python tools/check_oracles.py [query_name ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


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
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"{name}: rows-only n={n}")
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            o = con.execute(oracles[name])
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as ex:  # surface which side broke
            failures += 1
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
            continue
        s_cols_n, s_norm = _norm_rows(s_cols, s_rows)
        o_cols_n, o_norm = _norm_rows(o_cols, o_rows)
        if s_cols_n != o_cols_n:
            failures += 1
            print(f"{name}: COLUMN MISMATCH spark={s_cols_n} duckdb={o_cols_n}")
            continue
        if len(s_norm) != len(o_norm):
            failures += 1
            print(f"{name}: ROWCOUNT MISMATCH spark={len(s_norm)} duckdb={len(o_norm)}")
            continue
        diff = next((i for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b), None)
        if diff is not None:
            failures += 1
            print(f"{name}: VALUE MISMATCH at sorted row {diff}:")
            print(f"  spark : {s_norm[diff]}")
            print(f"  duckdb: {o_norm[diff]}")
        else:
            print(f"{name}: OK rows={len(s_norm)}")
    print(f"\n{'FAIL' if failures else 'PASS'} ({failures} mismatching queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
