"""Scale probe for the BM25 inverted index (late-round-9 addition).

Same contract as tools/scale_probe.py: synthesize corpora of increasing
document count entirely inside Spark, build the index once per size,
then time PROBES against it and print one line per size.

What the probe pins: the index path's promise is that probe cost is
O(Σ posting-list length of the QUERY's terms), not O(corpus). The
synthetic corpus keeps each term's document frequency at a FIXED
FRACTION of the corpus, so posting lists grow linearly with n — probe
time should therefore grow far slower than the 16× corpus sweep (it
reads |terms| lists, never re-tokenizes the corpus), and the
scan-path probe at the same sizes shows the contrast: it re-pays
tokenize + explode + aggregate on every call. A probe-time curve that
tracks the scan path would mean the term filter stopped pruning the
postings scan.

Usage: python tools/bm25_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

# 20-word vocabulary; 3 of them are the probe terms. Each doc draws 12
# words deterministically from id arithmetic, so term document
# frequencies stay a fixed fraction of n at every size.
VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron",
         "pi", "rho", "sigma", "tau", "upsilon"]
TERMS = ["gamma", "sigma", "tau"]


def main() -> None:
    from flink_sql_security_spark.sources import build_session

    spark = build_session("bm25-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from flink_sql_security_spark.operators.retrieval import (
        bm25_build_index, bm25_topk, bm25_topk_indexed)

    def corpus(n: int):
        words = [F.element_at(
            F.array(*[F.lit(w) for w in VOCAB]),
            ((F.col("id") * (i * 2 + 3) + i * 7) % len(VOCAB) + 1)
            .cast("int")) for i in range(12)]
        return (spark.range(n)
                .select(F.col("id").alias("doc_id"),
                        F.concat_ws(" ", *words).alias("text")))

    print(f"{'n_docs':>10} {'build_s':>8} {'probe_s':>8} {'scan_s':>8} "
          f"{'postings':>10}")
    for n in (20_000, 80_000, 320_000):
        docs = corpus(n).persist()
        docs.count()

        t0 = time.time()
        postings, stats = bm25_build_index(docs)
        postings = postings.persist()
        n_post = postings.count()
        build_s = time.time() - t0

        # warm probe then min-of-3 (the serve-path measurement)
        bm25_topk_indexed(postings, stats, TERMS, k=10).count()
        probes = []
        for _ in range(3):
            t0 = time.time()
            bm25_topk_indexed(postings, stats, TERMS, k=10).count()
            probes.append(time.time() - t0)

        t0 = time.time()
        bm25_topk(docs, TERMS, k=10).count()
        scan_s = time.time() - t0

        print(f"{n:>10} {build_s:>8.2f} {min(probes):>8.2f} "
              f"{scan_s:>8.2f} {n_post:>10}")
        postings.unpersist()
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
