"""Scale probe for the membership/frequency sketches (Bloom, Count-Min).

Synthesizes value streams entirely inside Spark (md5-derived draws over a
fixed vocabulary — no driver-side data, no files) and measures the three
load-bearing stages at the 10M-row tier:

- Bloom build: held-out set → distinct bit positions (one exchange)
- Bloom probe: corpus × k positions → broadcast join → per-id verdict
- CMS build: corpus → depth·width counter cells (one map-combined
  exchange; the cell count is the proof the state stays constant)

The probe-positive rate is analytically checkable: held ids ⊂ corpus ids
under the same value map, so positives ≈ overlap + vocab-collision rate
(+ a ~(1-e^{-kn/m})^k FP term). A big departure from that closed form is
the failure signal.

Usage: python tools/sketch_scale_probe.py [n_corpus n_held]
       (default 10_000_000 1_000_000)
"""

from __future__ import annotations

import math
import os
import sys
import time


def synth(spark, n: int, vocab: int):
    from pyspark.sql import functions as F
    return spark.range(n).select(F.expr(
        "concat('v', CAST(CAST(conv(substring(md5(CAST(id AS STRING)), "
        f"1, 8), 16, 10) AS BIGINT) % {vocab} AS STRING))").alias("v"),
        F.col("id"))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from flink_sql_security_spark.operators import sketch as SK
    from flink_sql_security_spark.sources import build_session

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_held = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    vocab, m, k = n // 2, 1 << 24, 7

    spark = build_session("sketch-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").count()

    corpus = synth(spark, n, vocab)
    held = synth(spark, n_held, vocab).select("v")

    t0 = time.perf_counter()
    bits = SK.bloom_bits(held, "v", n_bits=m, k=k)
    n_bits_set = bits.count()
    print(f"bloom build: {n_held} values -> {n_bits_set} bits "
          f"in {time.perf_counter() - t0:.2f}s")

    bits = bits.persist()
    bits.count()
    t0 = time.perf_counter()
    pos = SK.bloom_probe(bits, corpus, "id", "v", n_bits=m, k=k) \
        .where("bloom_maybe").count()
    dt = time.perf_counter() - t0
    n_distinct_held = vocab * (1 - math.exp(-n_held / vocab))
    expect = (n_held / n
              + (1 - n_held / n) * n_distinct_held / vocab
              + (1 - math.exp(-k * n_distinct_held / m)) ** k)
    print(f"bloom probe: {n} rows in {dt:.2f}s ({n / dt:,.0f} rows/s), "
          f"{pos} positives ({pos / n:.4f}; closed form ≈ {expect:.4f})")

    t0 = time.perf_counter()
    cells = SK.cms_counters(corpus, "v", width=1 << 14, depth=4).count()
    print(f"cms build: {n} rows -> {cells} cells "
          f"in {time.perf_counter() - t0:.2f}s (state cap {4 * (1 << 14)})")
    spark.stop()


if __name__ == "__main__":
    main()
