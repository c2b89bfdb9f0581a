"""IVF-PQ scale probe: is the ADC scan REALLY bounded by cell selectivity?

Two empirical checks that decide 100 TB behavior, beyond the plan gates:

1. **Scored-pair census**: counts the rows entering the ADC scorer for
   flat ``pq_topk`` (must be |corpus|·|Q|) vs ``ivfpq_topk`` (must be
   Σ_q Σ_{probed cells} |cell| — the cell-selectivity bound). The ratio
   is the fraction of the code table each query actually touches.
2. **Growth sweep**: wall seconds for flat vs IVF-PQ search as the
   corpus grows, search stage isolated from the (shared, one-off)
   encode by pre-persisting the code table. At 100 TB the code table is
   the stored index; the search is what runs per query batch.

Vectors are synthesized distributedly (md5-derived floats, no driver
generation) — clustered around ``n_cells`` anchors so the IVF geometry
is the realistic regime.

Usage: python tools/ivfpq_scale_probe.py [sizes...] (default 10000 40000 160000)
"""

from __future__ import annotations

import os
import sys
import time

DIM = 64
N_CELLS = 16
N_PROBE = 4
M, K_CB = 16, 16


def synth_clustered(spark, n: int):
    from pyspark.sql import functions as F

    # anchor c = vec_id % N_CELLS; component d = anchor coordinate
    # (md5-derived, uniform[-1,1]) + 10% per-vector noise
    u = ("(CAST(conv(substring(md5(concat(CAST({i} AS STRING), '|', "
         "CAST(d AS STRING))), 1, 8), 16, 10) AS BIGINT) "
         "/ 2147483647.5e0 - 1.0e0)")
    anchor = u.format(i=f"concat('a', CAST(vec_id % {N_CELLS} AS STRING))")
    noise = u.format(i="vec_id")
    return (
        spark.range(n).withColumnRenamed("id", "vec_id")
        .repartition(64)
        .withColumn("embedding", F.expr(
            f"transform(sequence(0, {DIM - 1}), d -> "
            f"{anchor} + 0.1e0 * {noise})"))
    )


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from flink_sql_security_spark.operators import pq as PQ
    from flink_sql_security_spark.sources import build_session

    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 40_000, 160_000]
    spark = build_session("ivfpq-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        df = synth_clustered(spark, n).persist()
        df.count()
        q = df.where("vec_id < 16")
        n_q = q.count()
        books = PQ.pq_train(df, m=M, k=K_CB, iters=3)
        coarse = PQ.coarse_train(df, n_cells=N_CELLS, iters=3)

        # pre-build both code tables (the stored index artifact) so the
        # sweep isolates the SEARCH stage both operators run per batch
        flat_codes = PQ.pq_encode(df, books).persist()
        flat_codes.count()
        ivf_codes = PQ.pq_encode(df, books, coarse=coarse).persist()
        ivf_codes.count()

        # 1) scored-pair census
        flat_pairs = (n - 1) * n_q  # crossJoin minus self-pairs
        probes = PQ._lut_df(q, books, "embedding", "vec_id",
                            coarse=coarse, n_probe=N_PROBE)
        ivf_pairs = (
            ivf_codes.join(probes.select("q_id", "cell"), "cell")
            .where(F.col("vec_id") != F.col("q_id")).count())
        frac = ivf_pairs / flat_pairs

        # 2) search wall time (code table pre-persisted; search = LUT
        # build + join + ADC + window)
        def timed(fn):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        t_flat = timed(lambda: PQ.pq_topk(
            df, q, books, k=10, codes_df=flat_codes))
        t_ivf = timed(lambda: PQ.ivfpq_topk(
            df, q, coarse, books, k=10, n_probe=N_PROBE,
            codes_df=ivf_codes))
        print(f"n={n}: scored pairs flat={flat_pairs} ivfpq={ivf_pairs} "
              f"(touched {100 * frac:.1f}% of the code table; "
              f"n_probe/n_cells = {100 * N_PROBE / N_CELLS:.1f}%) | "
              f"search wall flat={t_flat:.2f}s ivfpq={t_ivf:.2f}s",
              flush=True)
        for handle in (flat_codes, ivf_codes, df):
            handle.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
