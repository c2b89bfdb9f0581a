"""Scale probe for the round-5b additions: BM25, blocked fuzzy, PageRank.

Same contract as tools/scale_probe.py: synthesize inputs of increasing
size entirely inside Spark, time the operator end-to-end, and print one
line per (n, stage) with throughput. Near-constant rows/sec across the
sweep is the evidence the plan shape holds; the failure modes probed:

- bm25_topk: the pre-shuffle term filter must keep the shuffled token
  stream proportional to term hits, not corpus tokens (docs/sec flat).
- fuzzy_name_pairs: candidate pairs must track sum(block²), not n² —
  with block size held constant, names/sec must stay flat as n grows.
- pagerank: per-iteration cost must track |E| (edges/sec flat), no
  lineage blow-up across the 5 iterations.

Usage: python tools/retrieval_graph_probe.py
"""

from __future__ import annotations

import os
import sys
import time


def synth_edges(spark, n_edges: int, n_left: int, n_right: int):
    """Deterministic bipartite multigraph → distinct symmetric edges."""
    from pyspark.sql import functions as F

    def h(salt: str, mod: int) -> str:
        return (f"CAST(CAST(conv(substring(md5(concat('{salt}', "
                f"CAST(id AS STRING))), 1, 8), 16, 10) AS BIGINT) "
                f"% {mod} AS BIGINT)")

    pairs = (
        spark.range(n_edges).repartition(64)
        .select(F.expr(h("s", n_left)).alias("c"),
                (F.expr(h("d", n_right)) + F.lit(1000000)).alias("s"))
        .distinct())
    return (pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
            .union(pairs.select(F.col("s").alias("src"),
                                F.col("c").alias("dst"))))


def synth_names(spark, n: int, block_size: int = 50):
    """n names in n/block_size blocks; ~every 10th is a near-dup of its
    block neighbor (1-char tail difference) so verify finds real pairs."""
    from pyspark.sql import functions as F

    return (
        spark.range(n).repartition(64)
        .select(F.col("id").alias("nid"),
                F.expr(
                    f"concat('b', CAST(id DIV {block_size} AS STRING), "
                    "' ', substring(md5(CAST(CASE WHEN id % 10 = 0 "
                    "THEN id + 1 ELSE id END AS STRING)), 1, 12), "
                    "CASE WHEN id % 10 = 0 THEN 'x' ELSE 'y' END)"
                ).alias("name")))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from tools.scale_probe import synth_docs

    from flink_sql_security_spark.operators.cache import release
    from flink_sql_security_spark.operators.fuzzy import fuzzy_name_pairs
    from flink_sql_security_spark.operators.graph import pagerank
    from flink_sql_security_spark.operators.retrieval import bm25_topk
    from flink_sql_security_spark.sources import build_session

    spark = build_session("retrieval-graph-probe")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"{'n':>9} {'stage':<12} {'sec':>8} {'rows/sec':>10}")

    for n in (10_000, 50_000, 200_000):
        docs = synth_docs(spark, n).localCheckpoint()
        t0 = time.time()
        out = bm25_topk(docs, ["w101", "w2042", "w4999"], k=20)
        rows = out.count()
        dt = time.time() - t0
        release(out)
        print(f"{n:>9} {'bm25':<12} {dt:>8.2f} {n / dt:>10.0f}"
              f"   (rows={rows})")

    for n in (20_000, 100_000, 400_000):
        names = synth_names(spark, n).localCheckpoint()
        t0 = time.time()
        rows = fuzzy_name_pairs(names, id_col="nid", name_col="name",
                                max_dist=2).count()
        dt = time.time() - t0
        print(f"{n:>9} {'fuzzy':<12} {dt:>8.2f} {n / dt:>10.0f}"
              f"   (rows={rows})")

    for n in (50_000, 200_000, 800_000):
        edges = synth_edges(spark, n, n // 20, n // 100).localCheckpoint()
        n_e = edges.count()
        t0 = time.time()
        out = pagerank(edges, iters=5)
        rows = out.count()
        dt = time.time() - t0
        release(out)
        print(f"{n_e:>9} {'pagerank5':<12} {dt:>8.2f} {n_e / dt:>10.0f}"
              f"   (rows={rows})")

    spark.stop()


if __name__ == "__main__":
    main()
