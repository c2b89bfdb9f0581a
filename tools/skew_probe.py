"""Skew probe: plant a ~100× hot key in the three shapes SCALING.md claims
are skew-safe, and verify the documented mitigation ACTUALLY engages —
cluster-truth evidence for claims otherwise argued from local[32].

1. **LSH band join** (`dedup.minhash_lsh_candidate_pairs`): N identical
   documents collide in every band bucket — the classic all-dups hot key.
   Claim (SCALING.md "Skew"): AQE skew-join splits the hot partition.
   Evidence: the final adaptive plan shows ``SortMergeJoin(skew=true)`` /
   ``AQEShuffleRead .. skewed`` AND the candidate output is exactly
   C(N,2) hot pairs ⊆ output (correctness is unchanged by the split).
   AQE thresholds are lowered so probe-scale bytes cross them — the
   mechanism, not production constants, is under test.

2. **Connected components** (`dedup.connected_components`): a hub linked
   to N spokes (a 100×-degree node). Claim: per-round groupBy(min) is
   partially aggregated map-side, so a hot key combines before the
   exchange and rounds stay O(log diameter). Evidence: distributed path
   (driver_threshold=0) labels the star correctly, and wall time grows
   ~linearly from N to 10N (no quadratic hot-key blowup).

3. **Salted aggregation** (`skew.salted_agg`): 100× hot group key.
   Claim: the salt splits the hot group physically while staying
   invisible to results. Evidence: max (key, salt) group size ≈
   hot/SALT_BUCKETS measured from the actual salted stage-1 table, and
   the salted result equals the plain groupBy bit-for-bit.

Run: python tools/skew_probe.py   (record the table in BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[8]")
        .appName("skew-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # probe-scale thresholds: engage on ~100 KB hot partitions (the
        # production defaults engage at 256 MB — same code path)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config("spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes", "16KB")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def probe_lsh_band_join(spark, n_hot: int = 3000) -> dict:
    from pyspark.sql import functions as F

    from flink_sql_security_spark.operators.dedup import (
        minhash_lsh_candidate_pairs)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id", "text")
    hot_text = ("the quick brown fox jumps over the lazy dog again and "
                "again for the skew probe corpus hot key test")
    hot = spark.range(n_hot).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit(hot_text).alias("text"))
    corpus = base.unionByName(hot)

    t0 = time.perf_counter()
    cand = minhash_lsh_candidate_pairs(corpus, bands=4)
    pairs = cand.collect()
    dt = time.perf_counter() - t0
    plan = cand._jdf.queryExecution().executedPlan().toString()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    hot_ids = [10_000_000 + i for i in range(n_hot)]
    want_hot = {(a, b) for i, a in enumerate(hot_ids)
                for b in hot_ids[i + 1:]}
    skew_engaged = ("skew=true" in plan) or ("skewed" in plan)
    return {
        "probe": "lsh_band_join",
        "hot_docs": n_hot,
        "hot_pairs_expected": len(want_hot),
        "hot_pairs_found": len(want_hot & got),
        "correct": want_hot <= got,
        "aqe_skew_split_engaged": skew_engaged,
        "sec": round(dt, 2),
    }


def probe_components_hub(spark, n_spokes: int = 20_000) -> dict:
    from pyspark.sql import functions as F

    from flink_sql_security_spark.operators.dedup import connected_components

    def star(n):
        return spark.range(1, n + 1).select(
            F.lit(0).alias("id_a"), F.col("id").alias("id_b"))

    timings = {}
    for n in (n_spokes // 10, n_spokes):
        pairs = star(n)
        t0 = time.perf_counter()
        comp = connected_components(pairs, driver_threshold=0)
        rows = comp.collect()
        timings[n] = time.perf_counter() - t0
        ok = (len(rows) == n + 1
              and all(r["component_id"] == 0 for r in rows))
        if not ok:
            return {"probe": "components_hub", "correct": False}
    ratio = timings[n_spokes] / max(timings[n_spokes // 10], 1e-9)
    return {
        "probe": "components_hub",
        "hub_degree": n_spokes,
        "correct": True,
        "sec_small": round(timings[n_spokes // 10], 2),
        "sec_large": round(timings[n_spokes], 2),
        # 10× more hot edges: linear scaling keeps the ratio well under
        # the ~100× a quadratic hot-key blowup would show
        "time_ratio_10x_edges": round(ratio, 2),
        "subquadratic": ratio < 30,
    }


def probe_salted_agg(spark, n_hot: int = 100_000,
                     salt_buckets: int = 16) -> dict:
    from pyspark.sql import functions as F

    from flink_sql_security_spark.operators.skew import salted_groupby_agg

    df = spark.range(n_hot + 1000).select(
        F.when(F.col("id") < n_hot, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        (F.col("id") % 97).alias("v"))
    salted = salted_groupby_agg(df, ["k"], "v", salt_buckets)
    plain = (df.groupBy("k")
             .agg(F.sum("v").alias("sum_v"), F.count("v").alias("count_v"),
                  F.min("v").alias("min_v"), F.max("v").alias("max_v")))
    s = {tuple(r) for r in salted.collect()}
    p = {tuple(r) for r in plain.collect()}
    # the physical mitigation: stage 1 groups on (key, salt) — measure the
    # hot key's largest salted group with the operator's own salt formula
    salt = (F.abs(F.hash(F.col("k"), F.monotonically_increasing_id()))
            % salt_buckets)
    stage1 = (df.select("k", salt.alias("_salt"))
              .groupBy("k", "_salt").agg(F.count("*").alias("n")))
    max_hot = (stage1.where(F.col("k") == "hot")
               .agg(F.max("n").alias("m")).collect()[0]["m"])
    return {
        "probe": "salted_agg",
        "hot_rows": n_hot,
        "salt_buckets": salt_buckets,
        "max_salted_group": max_hot,
        "split_engaged": max_hot < n_hot / 2,
        "result_parity": s == p,
    }


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    import json

    out = [probe_lsh_band_join(spark),
           probe_components_hub(spark),
           probe_salted_agg(spark)]
    ok = True
    for r in out:
        print(json.dumps(r))
        ok = ok and r.get("correct", True) and \
            r.get("aqe_skew_split_engaged", True) and \
            r.get("subquadratic", True) and \
            r.get("split_engaged", True) and r.get("result_parity", True)
    print("SKEW PROBE", "PASS" if ok else "FAIL")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
