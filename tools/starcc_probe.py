"""Star-contraction probe: round count must be ~log n — INDEPENDENT of
chain length — where min-label propagation needs O(diameter) rounds
(VERDICT-r09 task 8's done criterion).

Shapes probed, all past any driver threshold concern (the probe calls
the distributed machinery directly):

1. **Chains** of 4k / 16k / 64k edges — diameter = length, the
   label-propagation worst case (a 64k chain would need 64k rounds and
   would silently exhaust max_iter=50). Assert: rounds grow by ≤ 2 per
   4× length (log law) and every node labels to component min 0.
2. **Hub star** (one center, 100k spokes) — the skew shape from
   tools/skew_probe.py. Assert: ≤ 3 rounds, correct labels.
3. **Label-prop contrast** on the 4k chain with the SAME max_iter=50:
   demonstrates the failure class star contraction removes — label
   propagation hits the round cap and returns NON-converged labels.

Run: python tools/starcc_probe.py   (record the table in BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("starcc-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate())


def main() -> None:
    from pyspark.sql import functions as F

    from flink_sql_security_spark.operators.dedup import (
        _star_contraction, connected_components)

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1. chains (diameter = length) ==")
    prev_rounds = None
    for length in (4_000, 16_000, 64_000):
        chain = spark.range(length).select(
            F.col("id").alias("id_a"),
            (F.col("id") + 1).alias("id_b")).persist()
        chain.count()
        t0 = time.time()
        labels, rounds = _star_contraction(
            chain, F.col("id_a"), F.col("id_b"), 50)
        bad = labels.where(F.col("component_id") != 0).count()
        n = labels.count()
        dt = time.time() - t0
        print(f"chain {length:>6}: rounds={rounds:2d}  {dt:6.1f}s  "
              f"nodes={n}  mislabeled={bad}")
        assert bad == 0 and n == length + 1
        if prev_rounds is not None:
            assert rounds <= prev_rounds + 2, (
                f"rounds grew {prev_rounds}->{rounds} on 4x length — "
                "not the log law")
        prev_rounds = rounds
        chain.unpersist()

    print("== 2. hub star (100k spokes) ==")
    hub = spark.range(100_000).select(
        F.lit(0).alias("id_a"),
        (F.col("id") + 1).alias("id_b")).persist()
    hub.count()
    t0 = time.time()
    labels, rounds = _star_contraction(
        hub, F.col("id_a"), F.col("id_b"), 50)
    bad = labels.where(F.col("component_id") != 0).count()
    print(f"hub 100k: rounds={rounds}  {time.time()-t0:6.1f}s  "
          f"mislabeled={bad}")
    assert rounds <= 3 and bad == 0
    hub.unpersist()

    print("== 3. label-prop contrast: 4k chain, max_iter=50 ==")
    chain = spark.range(4_000).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    lp = connected_components(chain, driver_threshold=0,
                              distributed_algorithm="label")
    not_converged = lp.where(F.col("component_id") != 0).count()
    print(f"label-prop mislabeled after 50 rounds: {not_converged} "
          f"(the failure class star contraction removes)")
    assert not_converged > 0  # documents WHY star is the default

    print("PASS")


if __name__ == "__main__":
    main()
