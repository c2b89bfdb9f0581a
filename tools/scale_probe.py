"""Scale probe: do the dedup-family plans actually scale near-linearly?

Synthesizes corpora of increasing size ENTIRELY inside Spark (md5-derived
token picks over a fixed vocabulary — no driver-side data generation, no
files) and measures the three load-bearing stages of the near-dup path:

- narrow MinHash signature build (zero-shuffle map work)
- LSH candidate generation (banded self-join — the only pair-shaped step)
- LSH-verified exact Jaccard (candidates + array_intersect verify)

Prints one line per (n_docs, stage): wall seconds and docs/sec. A
super-linear blow-up here (e.g. a hot band bucket) is the failure mode
that kills 100 TB runs; near-constant docs/sec across the sweep is the
evidence the plan shapes hold.

Usage: python tools/scale_probe.py [sizes...]   (default 5000 50000 200000)
"""

from __future__ import annotations

import os
import sys
import time


def synth_docs(spark, n: int, words_per_doc: int = 40, vocab: int = 5000):
    """n synthetic documents, deterministic, generated distributedly:
    token k of doc i = 'w' + (md5(base|k) mod vocab). Every 20th doc is a
    near-duplicate of its predecessor (same token stream except token 1),
    so ~5% of the corpus forms true near-dup pairs — the verify stage and
    the hot-band behavior get real work. Uniform token draw otherwise →
    realistic shingle-collision profile without hot boilerplate."""
    from pyspark.sql import functions as F

    tok = (
        "concat('w', CAST(CAST(conv(substring(md5(concat("
        "CAST({base} AS STRING), '|', CAST(k AS STRING))), 1, 8), 16, 10)"
        f" AS BIGINT) % {vocab} AS STRING))")
    base = ("CASE WHEN doc_id % 20 = 0 AND doc_id > 0 "
            "THEN doc_id - 1 ELSE doc_id END")
    # token 1 always derives from the doc's own id → dup docs differ in
    # exactly one token (jaccard ~ (w-4)/(w+2) for 3-gram shingles)
    return (
        spark.range(n).withColumnRenamed("id", "doc_id")
        .repartition(64)
        .withColumn("text", F.expr(
            f"concat_ws(' ', transform(sequence(1, {words_per_doc}), "
            f"k -> CASE WHEN k = 1 THEN {tok.format(base='doc_id')} "
            f"ELSE {tok.format(base=base)} END))"))
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from flink_sql_security_spark.operators import dedup as D
    from flink_sql_security_spark.sources import build_session

    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 50_000, 200_000]
    spark = build_session("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"{'n_docs':>9} {'stage':<14} {'sec':>8} {'docs/sec':>10}")
    for n in sizes:
        docs = synth_docs(spark, n).localCheckpoint()  # exclude gen cost
        for stage, fn in [
            ("signatures", lambda d: D.minhash_signatures_narrow(d).count()),
            ("lsh_cands", lambda d: D.minhash_lsh_candidate_pairs(d).count()),
            ("lsh_verified", lambda d: D.lsh_verified_jaccard_pairs(
                d, threshold=0.2).count()),
        ]:
            t0 = time.time()
            out = fn(docs)
            dt = time.time() - t0
            print(f"{n:>9} {stage:<14} {dt:>8.2f} {n / dt:>10.0f}"
                  f"   (rows={out})")
        spark.catalog.clearCache()
        import gc
        gc.collect()
        spark._jvm.System.gc()


if __name__ == "__main__":
    main()
