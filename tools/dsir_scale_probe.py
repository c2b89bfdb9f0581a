"""Scale probe for DSIR importance weighting.

Synthesizes documents entirely inside Spark (md5-derived tokens over a
fixed vocabulary — no driver-side data) and measures the full
dsir_weights pipeline at increasing corpus sizes. The claim under test
(SCALING.md): one text pass reduces to the per-doc bucket profile, the
log-ratio table stays ≤ B rows, and throughput holds (or rises, as fixed
costs amortize) with corpus size — no super-linear stage.

Usage: python tools/dsir_scale_probe.py [sizes...]  (default 20000 200000)
"""

from __future__ import annotations

import os
import sys
import time


def synth_docs(spark, n: int, words: int = 60, vocab: int = 50_000):
    from pyspark.sql import functions as F
    tok = ("concat('w', CAST(CAST(conv(substring(md5(concat("
           "CAST(id AS STRING), '|', CAST(k AS STRING))), 1, 8), 16, 10) "
           f"AS BIGINT) % {vocab} AS STRING))")
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(f"concat_ws(' ', transform(sequence(1, {words}), "
               f"k -> {tok}))").alias("text"))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from flink_sql_security_spark.operators import dsir as DS
    from flink_sql_security_spark.sources import build_session

    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 200_000]
    spark = build_session("dsir-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    for n in sizes:
        docs = synth_docs(spark, n)
        target = docs.where("doc_id % 20 = 0")
        t0 = time.perf_counter()
        cnt = DS.dsir_weights(docs, target).count()
        dt = time.perf_counter() - t0
        print(f"dsir n={n}: {dt:.2f}s ({n / dt:,.0f} docs/s), rows={cnt}")
    spark.stop()


if __name__ == "__main__":
    main()
