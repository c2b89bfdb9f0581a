"""Rerank probe: what does exact re-scoring buy on top of IVF-PQ?

For a clustered corpus (IVF's realistic regime) this measures, per
``n_probe``: recall@k vs exact brute-force L2 for (a) plain
``ivfpq_topk`` (ADC ordering) and (b) ``ivfpq_rerank`` (exact ordering
of the k·rerank shortlist), plus the stage-2 cost census — the number
of raw vectors the rerank stage touches, which must equal
|Q| · k · rerank regardless of corpus size (shortlist cost, not corpus
cost).

Usage: python tools/rerank_probe.py [n] (default 20000)
"""

from __future__ import annotations

import os
import sys

DIM = 64
N_CELLS = 16
M, K_CB = 16, 16
K = 10
RERANK = 4


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pyspark.sql import Window, functions as F

    from flink_sql_security_spark.operators import pq as PQ
    from flink_sql_security_spark.sources import build_session
    from tools.ivfpq_scale_probe import synth_clustered

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = build_session("rerank-probe")
    spark.sparkContext.setLogLevel("ERROR")

    df = synth_clustered(spark, n).persist()
    df.count()
    q = df.where("vec_id < 16")
    n_q = q.count()
    # residual IVFADC (codebooks over x − coarse_centroid[cell]): the
    # configuration where within-cluster ranking carries signal at all —
    # non-residual codes collapse inside a tight cluster and BOTH
    # operators bottom out near k/cluster_size regardless of rerank
    coarse, books = PQ.ivfpq_train(df, n_cells=N_CELLS, m=M, k=K_CB,
                                   iters=3)
    codes = PQ.pq_encode(df, books, coarse=coarse,
                         residual=True).persist()
    codes.count()

    # exact truth: brute-force squared L2 top-K
    qv = q.select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("_qv"))
    nv = df.select(F.col("vec_id").alias("n_id"),
                   F.col("embedding").alias("_nv"))
    w = Window.partitionBy("q_id").orderBy(F.asc("d"), F.asc("n_id"))
    truth = {}
    for r in (nv.crossJoin(F.broadcast(qv)).where("n_id <> q_id")
              .select("q_id", "n_id",
                      F.expr(PQ._SQ_L2.format(a="_qv", b="_nv")).alias("d"))
              .withColumn("rk", F.row_number().over(w))
              .where(f"rk <= {K}").collect()):
        truth.setdefault(r["q_id"], set()).add(r["n_id"])

    def recall(res) -> float:
        got = {}
        for r in res.collect():
            got.setdefault(r["q_id"], set()).add(r["n_id"])
        return sum(len(got.get(qid, set()) & s)
                   for qid, s in truth.items()) / (K * len(truth))

    for n_probe in (4, 8):
        plain = PQ.ivfpq_topk(df, q, coarse, books, k=K,
                              n_probe=n_probe, residual=True,
                              codes_df=codes)
        rer = PQ.ivfpq_rerank(df, q, coarse, books, k=K,
                              n_probe=n_probe, rerank=RERANK,
                              residual=True, codes_df=codes)
        # stage-2 census: raw vectors touched by the exact re-scorer
        shortlist = PQ.ivfpq_topk(df, q, coarse, books, k=K * RERANK,
                                  n_probe=n_probe, residual=True,
                                  codes_df=codes)
        touched = shortlist.count()
        bound = n_q * K * RERANK
        print(f"n={n} n_probe={n_probe}: recall@{K} "
              f"ivfpq={recall(plain):.3f} rerank={recall(rer):.3f} | "
              f"stage-2 raw vectors touched {touched} "
              f"(bound |Q|*k*rerank = {bound}; corpus = {n})",
              flush=True)
    for h in (codes, df):
        h.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
