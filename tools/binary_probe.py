"""Binary-tier + linear-probe scale probe.

Two questions a 100 TB deployment asks of the new tiers:

1. **Binary search**: does the hamming prefilter's recall HOLD when the
   shortlist scales with the corpus (rerank ∝ n), and does the scan
   throughput scale linearly? (At fixed k·R the recall of a 1-bit/dim
   code falls as n grows — BASELINE.md documents this; the production
   rule is shortlist-as-a-fraction, verified here.)
2. **Ridge fit**: is the normal-equation pass genuinely one-pass linear
   (rows/sec flat or rising with n), and partitioning-independent at
   the largest size (the quantized integer sums must make it so)?

Vectors synthesize distributedly (md5-derived floats, the
ann_scale_probe recipe) — no driver-side generation.

Usage: python tools/binary_probe.py [sizes...]  (default 5000 40000 160000)
"""

from __future__ import annotations

import os
import sys
import time

DIM = 64


def synth_vectors(spark, n: int, labels: bool = False):
    from pyspark.sql import functions as F

    u = ("(CAST(conv(substring(md5(concat(CAST(vec_id AS STRING), '|', "
         "CAST(d AS STRING))), 1, 8), 16, 10) AS BIGINT) "
         "/ 2147483647.5e0 - 1.0e0)")
    df = (spark.range(n).withColumnRenamed("id", "vec_id")
          .repartition(64)
          .withColumn("embedding", F.expr(
              f"transform(sequence(0, {DIM - 1}), d -> {u})")))
    if labels:
        df = df.withColumn("label", F.expr("CAST(vec_id % 10 AS INT)"))
    return df


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from flink_sql_security_spark.operators import binary as B
    from flink_sql_security_spark.operators import classifier as C
    from flink_sql_security_spark.operators import similarity as S
    from flink_sql_security_spark.sources import build_session

    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 40_000, 160_000]
    spark = build_session("binary-probe")
    spark.sparkContext.setLogLevel("ERROR")
    K, Q = 10, 32

    print("binary search: fraction rule (rerank = n/2000) vs "
          "rerank='auto' (shortlist max(8k, ceil(5*sqrt(n))))")
    print(f"{'n_vecs':>8} {'rule':>8} {'shortlist':>9} {'sec':>8} "
          f"{'vecs/sec':>9} {'recall@10':>9}")
    for n in sizes:
        vecs = synth_vectors(spark, n).localCheckpoint()
        q = vecs.where(f"vec_id < {Q}")
        truth = {}
        for r in S.cosine_topk(vecs, q, k=K).collect():
            truth.setdefault(r["q_id"], set()).add(r["n_id"])
        frac_rerank = max(8, n // (K * 200))  # shortlist ≈ n/200 (0.5%)
        import math
        auto_short = max(8 * K, math.ceil(5.0 * math.sqrt(n)))
        for rule, rr, short in (("n/2000", frac_rerank, K * frac_rerank),
                                ("auto", "auto", auto_short)):
            t0 = time.time()
            got = {}
            for r in B.hamming_topk(vecs, q, k=K, rerank=rr,
                                    d=DIM).collect():
                got.setdefault(r["q_id"], set()).add(r["n_id"])
            dt = time.time() - t0
            hit = sum(len(truth[qi] & got.get(qi, set())) for qi in truth)
            recall = hit / sum(len(v) for v in truth.values())
            print(f"{n:>8} {rule:>8} {short:>9} {dt:>8.2f} "
                  f"{n / dt:>9.0f} {recall:>9.3f}")
        spark.catalog.clearCache()

    print("\nridge fit: one-pass normal equations (quantized integer sums)")
    print(f"{'n_rows':>8} {'sec':>8} {'rows/sec':>9} {'part-invariant':>14}")
    for n in [100_000, 1_000_000]:
        vecs = synth_vectors(spark, n, labels=True).localCheckpoint()
        t0 = time.time()
        w = C.ridge_fit(vecs, positive=0, d=DIM)
        dt = time.time() - t0
        inv = (w == C.ridge_fit(vecs.repartition(13), positive=0, d=DIM)
               if n == 100_000 else None)
        print(f"{n:>8} {dt:>8.2f} {n / dt:>9.0f} "
              f"{str(inv) if inv is not None else '—':>14}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
