"""Stream-stream interval join (Structured Streaming).

Batch counterpart: the `interval_click_purchase` driver entry (equi key +
time-window residual). On unbounded inputs the same semantics need bounded
state: Structured Streaming's stream-stream join keeps each side's rows in
the state store only until the watermark proves no in-window partner can
still arrive, then evicts them. The reference has no streaming joins at all
(its corpus is equi LEFT JOIN on CDC tables — SURVEY §2.B); this is part of
the beyond-reference streaming surface.

Scale: state per key ≈ rows within (watermark delay + window width); the
state store shards by key hash across executors. The join condition gives
Spark an explicit time-range on both event-time columns, which is what lets
the engine derive state-eviction bounds — without the range predicate the
state would grow forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window: str = "1 hour",
    delay: str = "10 minutes",
) -> DataFrame:
    """Inner-join right rows with ``left_ts < right_ts <= left_ts + window``.

    ``on`` must name the key column on both sides; every other column name
    must be distinct across the two inputs (rename before joining). Both
    sides get an event-time watermark of ``delay``.
    """
    clash = (set(left.columns) & set(right.columns)) - {on}
    if clash:
        raise ValueError(f"column names collide across sides: {sorted(clash)}")
    l = left.withWatermark(left_ts, delay).alias("l")
    r = right.withWatermark(right_ts, delay).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}")
           <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {window}"))
    )
    joined = l.join(r, cond, "inner")
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c != on
    ]
    return joined.select(*keep)
