"""ANN scale probe: does the embedding near-dup path scale, WITHOUT the
driver-side corpus broadcast?

Synthesizes unit-scale vectors distributedly (md5-derived floats — no
driver generation) with every 20th vector a planted near-duplicate of
its predecessor, then measures the LSH-bucketed candidate path in its
100 TB configuration (``broadcast_vectors=False``: vectors joined onto
candidate pairs, corpus never collected) across corpus sizes. Reports
wall seconds, vectors/sec, and planted-pair recall — the three numbers
that decide whether the path survives growth.

Usage: python tools/ann_scale_probe.py [sizes...]  (default 2000 20000 80000)
"""

from __future__ import annotations

import os
import sys
import time

DIM = 64


def synth_vectors(spark, n: int):
    from pyspark.sql import functions as F

    # component d of vector i derives from md5(base|d) → uniform[-1, 1];
    # every 20th vector copies its predecessor plus 2% deterministic noise
    u = ("(CAST(conv(substring(md5(concat(CAST({i} AS STRING), '|', "
         "CAST(d AS STRING))), 1, 8), 16, 10) AS BIGINT) "
         "/ 2147483647.5e0 - 1.0e0)")
    base = ("CASE WHEN vec_id % 20 = 0 AND vec_id > 0 "
            "THEN vec_id - 1 ELSE vec_id END")
    return (
        spark.range(n).withColumnRenamed("id", "vec_id")
        .repartition(64)
        .withColumn("embedding", F.expr(
            f"transform(sequence(0, {DIM - 1}), d -> "
            f"{u.format(i=base)} + CASE WHEN vec_id % 20 = 0 AND vec_id > 0 "
            f"THEN 0.02e0 * {u.format(i='vec_id')} ELSE 0.0e0 END)"))
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from flink_sql_security_spark.operators import similarity as S
    from flink_sql_security_spark.sources import build_session

    sizes = [int(a) for a in sys.argv[1:]] or [2_000, 20_000, 80_000]
    spark = build_session("ann-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"{'n_vecs':>8}           {'sec':>8} {'vecs/sec':>9} {'pairs':>7} "
          f"{'planted_recall':>14}")
    for n in sizes:
        vecs = synth_vectors(spark, n).localCheckpoint()  # exclude gen cost
        planted = {(i - 1, i) for i in range(20, n, 20)}
        bits = S.lsh_bits_for(n)  # constant bucket occupancy as n grows
        t0 = time.time()
        got = {(r["id_a"], r["id_b"]) for r in S.ann_candidate_pairs(
            vecs, bits=bits, tables=8, threshold=0.9,
            broadcast_vectors=False).collect()}
        dt = time.time() - t0
        recall = len(got & planted) / len(planted) if planted else 1.0
        print(f"{n:>8} (bits={bits:>2}) {dt:>8.2f} {n / dt:>9.0f} {len(got):>7} "
              f"{recall:>14.4f}")
        spark.catalog.clearCache()
        import gc
        gc.collect()
        spark._jvm.System.gc()


if __name__ == "__main__":
    main()
