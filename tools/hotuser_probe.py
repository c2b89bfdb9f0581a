"""Hot-user probe: plant a pathological bot user with 10k funnel
entries AND 10k completions per step and verify the built-in
``max_attempts`` guard removes the quadratic per-user stage
(VERDICT-r10 finding 1 / task 2 — the funnel_attempts mirror of
``tools/hotbasket_probe.py``).

The failure mode: ``funnel_attempts`` anchors one greedy chain at
EVERY step-1 event, so each step-i join keyed on user emits
|attempts| × |step-i events| candidate rows per user before the
per-attempt MIN. A bot with 10k entries and 10k clicks generates 10⁸
candidate rows inside ONE user key — AQE skew-split spreads the
shuffle but cannot shrink the row count. The guard truncates each
user to their EARLIEST ``max_attempts`` step-1 events (deterministic:
per-user step-1 timestamps are unique after the distinct) before any
join, bounding the per-user candidate stage at
``max_attempts`` × |step-i events| rows.

Probe shape: 5 000 normal users × (4 views, 3 clicks, 2 purchases)
at deterministic arithmetic timestamps (no RNG) + ONE planted bot
user with 10 000 views, 10 000 clicks and 10 000 purchases.

Evidence recorded:
  1. capped run (cap=1000) wall time and output row count,
  2. uncapped run (cap=None) wall time on the SAME data — the
     quadratic stage is real but still finishes at 10k·10k = 10⁸
     candidate rows per step, giving a measured capped/uncapped ratio
     instead of an argument,
  3. every normal-user attempt row is bit-identical between the two
     runs (no normal user crosses the cap), and the capped bot
     contributes exactly CAP attempt rows (its earliest CAP entries).

Run: python tools/hotuser_probe.py   (record in BASELINE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_NORMAL = 5_000
HOT_EVENTS = 10_000
CAP = 1_000
BOT = 9_999_999


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("hotuser-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .getOrCreate())


def main() -> None:
    from pyspark.sql import functions as F

    from flink_sql_security_spark.operators.funnel import funnel_attempts

    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")

    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))

    def mk(users_df, step, per_user, stride_s):
        # per-user event j at base + user·1h + j·stride — unique
        # per-user timestamps, interleaved across steps via stride
        return users_df.crossJoin(
            spark.range(per_user).select(F.col("id").alias("j"))
        ).select(
            F.col("u").alias("user_id"),
            F.lit(step).alias("event_type"),
            (base + F.make_interval(
                secs=(F.col("u") % 100_000).cast("long") * 3600
                + F.col("j").cast("long") * stride_s
                + {"view": 0, "click": 20, "purchase": 40}[step]))
            .alias("ts"))

    normal_u = spark.range(N_NORMAL).select(F.col("id").alias("u"))
    bot_u = spark.range(1).select(F.lit(BOT).alias("u"))
    ev = (
        mk(normal_u, "view", 4, 60)
        .unionAll(mk(normal_u, "click", 3, 60))
        .unionAll(mk(normal_u, "purchase", 2, 60))
        .unionAll(mk(bot_u, "view", HOT_EVENTS, 60))
        .unionAll(mk(bot_u, "click", HOT_EVENTS, 60))
        .unionAll(mk(bot_u, "purchase", HOT_EVENTS, 60))
    ).persist()
    ev.count()

    def run(cap):
        t0 = time.time()
        out = funnel_attempts(ev, ["view", "click", "purchase"],
                              within_hours=24, max_attempts=cap)
        rows = sorted(map(tuple, out.collect()))
        return time.time() - t0, rows

    t_capped, rows_capped = run(CAP)
    t_uncapped, rows_uncapped = run(None)

    # evidence 3: normal users identical; bot kept exactly CAP
    # earliest attempts (a strict prefix of its uncapped attempts)
    norm_c = [r for r in rows_capped if r[0] != BOT]
    norm_u_rows = [r for r in rows_uncapped if r[0] != BOT]
    assert norm_c == norm_u_rows, "cap changed normal-user attempts"
    bot_c = [r for r in rows_capped if r[0] == BOT]
    bot_u_rows = [r for r in rows_uncapped if r[0] == BOT]
    assert len(bot_c) == CAP, f"bot kept {len(bot_c)}, wanted {CAP}"
    assert len(bot_u_rows) == HOT_EVENTS
    assert bot_c == bot_u_rows[:CAP], "cap kept non-earliest attempts"

    cand_capped = CAP * HOT_EVENTS
    cand_uncapped = HOT_EVENTS * HOT_EVENTS
    print(f"normal users={N_NORMAL} bot events/step={HOT_EVENTS} "
          f"cap={CAP}")
    print(f"capped:   {t_capped:7.2f} s  attempts={len(rows_capped)} "
          f"(bot candidate rows/step={cand_capped:,})")
    print(f"uncapped: {t_uncapped:7.2f} s  attempts={len(rows_uncapped)} "
          f"(bot candidate rows/step={cand_uncapped:,})")
    print(f"speedup:  {t_uncapped / t_capped:.1f}x  "
          f"candidate-row reduction: {cand_uncapped / cand_capped:.0f}x")
    print("PASS")


if __name__ == "__main__":
    main()
