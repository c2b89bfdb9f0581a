"""Scale probe for RRF fusion (round-9 addition).

Same contract as tools/scale_probe.py: synthesize ranked shortlists of
increasing QUERY count entirely inside Spark, time the fusion
end-to-end, and print one line per n with throughput.

What the probe pins: rrf_fuse's cost must track the SHORTLIST volume
(n_queries · n_arms · list_len rows through one union + one hash agg +
one partitioned window), NOT any corpus size — the corpus never enters
the operator. Near-flat fused-rows/sec across a 64× query sweep is the
evidence; a super-linear falloff would mean the plan grew a corpus-
or cross-product-shaped stage.

Usage: python tools/rrf_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from flink_sql_security_spark.sources import build_session

    spark = build_session("rrf-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from flink_sql_security_spark.operators.retrieval import rrf_fuse

    LIST_LEN, K = 50, 10

    def arm(n_q: int, salt: int):
        # n_q queries × LIST_LEN ranked ids, deterministic per salt.
        # doc_id is INJECTIVE within each (q_id, arm) list (rank maps
        # linearly with a stride that can't wrap inside 50 draws), so
        # rrf_fuse's unique-ids-per-list precondition holds exactly;
        # arms still overlap heavily on ids, keeping fusion non-trivial
        return (spark.range(n_q * LIST_LEN)
                .select((F.col("id") / LIST_LEN).cast("long")
                        .alias("q_id"),
                        (F.col("id") % LIST_LEN + 1).cast("long")
                        .alias("rank"))
                .withColumn("doc_id",
                            (F.col("q_id") * 53 + F.lit(salt) * 17
                             + F.col("rank") * 101) % 100000))

    for n_q in (1_000, 8_000, 64_000):
        arms = [("a", arm(n_q, 1)), ("b", arm(n_q, 2)),
                ("c", arm(n_q, 3))]
        t0 = time.time()
        out = rrf_fuse(arms, id_col="doc_id", group_col="q_id",
                       k0=60, k=K)
        n = out.count()
        dt = time.time() - t0
        in_rows = n_q * LIST_LEN * 3
        print(f"n_q={n_q:>7} shortlist_rows={in_rows:>9} "
              f"fused={n:>8} wall={dt:6.2f}s "
              f"rows/sec={in_rows / dt:12.0f}")
    spark.stop()


if __name__ == "__main__":
    main()
