"""Extended fuzz burst: run the seven seeded fuzz-parity families from
``tests/test_fuzz_parity.py`` at a fresh seed base, beyond the CI seeds.

The CI suite pins fixed seed ranges (1000+/9000+/7000+/5000+/6000+/
8000+/11000+, ~170 queries); each round also fires one or more BURSTS
at disjoint higher bases over the round's end state and records the
cumulative ledger in BASELINE.md ("next free seed base ≈ +NNNN" — read
it before picking ``--base``). This runner reuses the test module's
generator, oracle-injection helpers, and family bodies verbatim, so a
burst is exactly the CI check at new seeds, scaled up.

Usage: python tools/fuzz_burst.py --base 4300 [--per-family 25]
Query count per run ≈ per_family × (10+8+8+8+8+8+8) = per_family × 58.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, required=True,
                    help="seed offset added to each family's CI base")
    ap.add_argument("--per-family", type=int, default=25)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import test_fuzz_parity as T

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("fuzz-burst")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # build the module's `engines` fixture by hand (same code path);
    # pytest's fixture decorator keeps the plain function reachable
    # via __wrapped__ (or _fixture_function on older pytests)
    fixture_fn = getattr(T.engines, "__wrapped__", None) or getattr(
        T.engines, "_fixture_function", None) or T.engines
    eng = fixture_fn(spark)

    families = [
        ("grammar", T.test_fuzz_parity, 10,
         lambda seed: T.test_fuzz_parity(eng, seed)),
        ("rls", T.test_fuzz_security_rewrite_parity, 8,
         lambda seed: T.test_fuzz_security_rewrite_parity(
             spark, eng, seed)),
        ("mask", T.test_fuzz_mask_rewrite_parity, 8,
         lambda seed: T.test_fuzz_mask_rewrite_parity(spark, eng, seed)),
        ("rls_derived", T.test_fuzz_rls_inside_derived_table, 8,
         lambda seed: T.test_fuzz_rls_inside_derived_table(
             spark, eng, seed)),
        ("rls_join2", T.test_fuzz_rls_join_both_sides, 8,
         lambda seed: T.test_fuzz_rls_join_both_sides(spark, eng, seed)),
        ("mask_derived", T.test_fuzz_mask_inside_derived_table, 8,
         lambda seed: T.test_fuzz_mask_inside_derived_table(
             spark, eng, seed)),
        ("mixed", T.test_fuzz_mixed_filter_then_mask, 8,
         lambda seed: T.test_fuzz_mixed_filter_then_mask(
             spark, eng, seed)),
    ]
    total = 0
    for name, _fn, per_seed, call in families:
        for s in range(args.base, args.base + args.per_family):
            call(s)
            total += per_seed
        print(f"{name}: {args.per_family} seeds "
              f"({args.per_family * per_seed} queries) OK", flush=True)
    print(f"BURST PASS: {total} queries, 0 failures "
          f"(base +{args.base}, {args.per_family}/family)")


if __name__ == "__main__":
    main()
