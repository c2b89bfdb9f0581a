"""Hot-basket probe: plant a pathological 10k-item basket and verify
the ``max_basket_items`` guard actually removes the quadratic stage
(VERDICT-r09 finding 1 / task 2).

The failure mode: ``basket_rules`` generates pairs with ONE self-join
on the basket key, so a basket with B items emits B·(B−1)/2 pair rows
BEFORE the ``min_support`` prune — a 10k-item basket is ~5×10⁷ rows,
a 100k-item one ~5×10⁹. AQE skew-split spreads the shuffle but not
the row count (the r9 commit gated the measure broadcasts, not the
pair generation). The guard truncates every basket to its
``max_basket_items`` smallest items (deterministic ORDER BY item)
before any join, bounding the pair stage at cap²/2 rows per basket.

Probe shape: 2 000 normal 4-item baskets (signal: their pair counts
must be IDENTICAL with and without the hot basket guard, because no
normal basket crosses the cap) + ONE planted basket with 10 000
distinct items.

Evidence recorded:
  1. capped run (cap=1000) wall time and output row count,
  2. uncapped run (cap=None) wall time on the SAME data — the
     quadratic stage is real but still finishes at 10k (5×10⁷ rows),
     giving a measured capped/uncapped ratio instead of an argument,
  3. the capped hot-basket pair contribution is exactly
     C(1000, 2) = 499 500 candidate rows (asserted via a pair count
     over just the hot basket), and every normal-basket rule is
     bit-identical between the two runs.

Run: python tools/hotbasket_probe.py   (record in BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_NORMAL = 2_000
HOT_ITEMS = 10_000
CAP = 1_000


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("hotbasket-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .getOrCreate())


def main() -> None:
    from pyspark.sql import functions as F

    from flink_sql_security_spark.operators.assoc import basket_rules

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")

    # 2 000 normal baskets × 4 items drawn from a 40-item catalog
    # (deterministic arithmetic mix, no RNG) + one 10k-item hot basket
    # whose items live in their own id range so it contributes no
    # cross-basket pair support.
    # item = (basket + 7·slot) mod 40: four DISTINCT items per basket
    # (slot ∈ 0..3 → offsets 0,7,14,21) and each item set recurs in
    # N_NORMAL/40 baskets, so pair supports are ~50 — real rules that
    # must survive the cap unchanged. (A plain multiplicative mix
    # collapses here: 40 | N_NORMAL makes any linear-in-id formula
    # constant within a basket.)
    normal = spark.range(N_NORMAL * 4).select(
        (F.col("id") % N_NORMAL).alias("basket"),
        (((F.col("id") % N_NORMAL)
          + F.floor(F.col("id") / N_NORMAL) * 7) % 40 + 1).alias("item"))
    hot = spark.range(HOT_ITEMS).select(
        F.lit(1_000_000).alias("basket"),
        (F.col("id") + 1_000).alias("item"))
    df = normal.unionAll(hot).persist()
    df.count()

    def run(cap):
        t0 = time.time()
        out = basket_rules(df, basket_col="basket", item_col="item",
                           min_support=2, max_basket_items=cap)
        rows = sorted(map(tuple, out.collect()))
        return time.time() - t0, rows

    t_capped, rows_capped = run(CAP)
    t_uncapped, rows_uncapped = run(None)

    # evidence 3a: the capped hot basket feeds exactly C(CAP,2)
    # candidate pairs into the join (counted on the capped view).
    from flink_sql_security_spark.operators.assoc import _capped_items
    hot_n = _capped_items(df, "basket", "item", CAP).where(
        F.col("b") == 1_000_000).count()
    hot_pairs = hot_n * (hot_n - 1) // 2
    assert hot_n == CAP, f"hot basket kept {hot_n} items, wanted {CAP}"
    assert hot_pairs == CAP * (CAP - 1) // 2

    # evidence 3b: normal-basket rules identical across both runs
    # (hot-basket items occupy a disjoint id range ≥ 1000, support 1
    # each — they never clear min_support, so the rule sets must be
    # EQUAL except for nothing at all).
    norm_capped = [r for r in rows_capped if r[0] < 1_000]
    norm_uncapped = [r for r in rows_uncapped if r[0] < 1_000]
    assert norm_capped == norm_uncapped, "cap changed normal-basket rules"
    assert rows_capped == rows_uncapped, (
        "hot-basket singleton pairs leaked past min_support")

    print(f"normal baskets={N_NORMAL} hot-basket items={HOT_ITEMS} "
          f"cap={CAP}")
    print(f"capped:   {t_capped:7.2f} s  rules={len(rows_capped)} "
          f"(hot-basket candidate pairs={hot_pairs:,})")
    print(f"uncapped: {t_uncapped:7.2f} s  rules={len(rows_uncapped)} "
          f"(hot-basket candidate pairs={HOT_ITEMS*(HOT_ITEMS-1)//2:,})")
    print(f"speedup:  {t_uncapped / t_capped:.1f}x  "
          f"pair-row reduction: "
          f"{(HOT_ITEMS*(HOT_ITEMS-1)//2) / hot_pairs:.0f}x")
    print("PASS")


if __name__ == "__main__":
    main()
