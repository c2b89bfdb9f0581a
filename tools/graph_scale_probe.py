"""Measure the degree-orientation win for triangle counting on the FULL
(unsliced) part co-purchase graph — the skew experiment behind
operators/graph.py::triangle_count's design.

Wedge count = the intermediate row count of the self-join = the cost
driver. Compares:
  - id-oriented   (naive a<b<c ordering): wedges at the lowest ID —
    a hub with high id-degree generates its full d^2/2 wedge fan;
  - degree-oriented (Suri & Vassilvitskii 2011): wedges at the lowest
    (degree, id) endpoint — oriented out-degree bounded by O(sqrt(m)).

Both counts are computed with DuckDB aggregates (fast, exact; no need
to run the join to completion — sum over apexes of C(outdeg, 2)).

The co-purchase graph's degrees are fairly uniform (TPC-H-ish basket
sizes), so orientation buys ~1.2x there; pass ``--skew N`` to measure
the regime the design exists for — a celebrity hub of degree N with id
0 (the id-orientation worst case) over a sparse background.

Usage: python tools/graph_scale_probe.py [sf_dir | --skew N]
"""
from __future__ import annotations

import sys

import duckdb


def _skew_base(n_hub: int) -> str:
    """One hub (id 0) adjacent to every node 1..N, plus a sparse random
    ring so the background has degree ~4."""
    return f"""
    WITH hub AS (SELECT 0 AS a, i AS b
                 FROM UNNEST(range(1, {n_hub + 1})) AS t(i)),
    ring AS (SELECT i AS a, 1 + (i % {n_hub}) AS b
             FROM UNNEST(range(1, {n_hub + 1})) AS t(i)),
    raw AS (SELECT * FROM hub UNION ALL SELECT * FROM ring),
    e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
          FROM raw WHERE a <> b),
    deg AS (SELECT node, count(*) AS d FROM (
              SELECT a AS node FROM e UNION ALL SELECT b FROM e)
            GROUP BY node)
    """


def main() -> None:
    con = duckdb.connect()
    if len(sys.argv) > 2 and sys.argv[1] == "--skew":
        base = _skew_base(int(sys.argv[2]))
        label = f"skew-hub N={sys.argv[2]}"
        return _report(con, base, label)
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    base = f"""
    WITH li AS (SELECT l_orderkey, l_partkey FROM '{sf}/lineitem.parquet'),
    e AS (SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
                          greatest(a.l_partkey, b.l_partkey) AS b
          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                             AND a.l_partkey < b.l_partkey),
    deg AS (SELECT node, count(*) AS d FROM (
              SELECT a AS node FROM e UNION ALL SELECT b FROM e)
            GROUP BY node)
    """
    _report(con, base, f"sf_dir={sf}")


def _report(con, base: str, label: str) -> None:
    m, n, dmax = con.sql(base + """
    SELECT (SELECT count(*) FROM e), (SELECT count(*) FROM deg),
           (SELECT max(d) FROM deg)""").fetchone()
    # id orientation: out-neighbors of u = canonical edges with a = u
    id_wedges = con.sql(base + """
    , od AS (SELECT a AS u, count(*) AS o FROM e GROUP BY a)
    SELECT sum(o * (o - 1) / 2) FROM od""").fetchone()[0]
    deg_wedges = con.sql(base + """
    , o AS (SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND e.a < e.b)
                        THEN e.a ELSE e.b END AS u
            FROM e JOIN deg da ON e.a = da.node
                   JOIN deg db ON e.b = db.node),
    od AS (SELECT u, count(*) AS o FROM o GROUP BY u)
    SELECT sum(o * (o - 1) / 2) FROM od""").fetchone()[0]
    print(label)
    print(f"edges={m} nodes={n} max_degree={dmax}")
    print(f"id-oriented wedges:     {int(id_wedges):>12,}")
    print(f"degree-oriented wedges: {int(deg_wedges):>12,}")
    print(f"ratio: {id_wedges / deg_wedges:.2f}x")


if __name__ == "__main__":
    main()
