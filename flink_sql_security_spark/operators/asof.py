"""As-of (temporal) join — Spark-native, single-shuffle.

The reference (HamaWhiteGG/flink-sql-security) has no temporal join anywhere
in its corpus (grep for JOIN in `src/test` shows equi LEFT JOIN only —
SURVEY.md §2.B), but a training-data pipeline attributing events to the most
recent prior event/record needs one, so it ships as a first-class operator.

Semantics (direction = backward, the pandas `merge_asof` default): for each
left row, attach the single right row sharing the join keys with the greatest
``right_ts <= left_ts``. Equal timestamps match. Rows with no prior right row
are dropped (``how='inner'``) or kept with NULL payload (``how='left'``).

Scale design: the naive formulation is a range join — per-key cross product
then argmax, quadratic in per-key density, hopeless at 100 TB. This
implementation uses the union + ordered-window shape instead:

  1. tag both sides and union them (no shuffle: union is plan-only),
  2. one shuffle partitioning by the join keys,
  3. one per-partition sort by (ts, side) — right rows sort before left rows
     at equal ts, making the match inclusive,
  4. ``last(payload, ignorenulls=True)`` over the running window carries the
     most recent right payload onto each left row.

Total cost: one Exchange + one Sort, independent of how many right rows
precede each left row — the same cost envelope as a sort-merge join. Skewed
keys can be pre-split with operators/skew.py upstream; the window itself is
streaming (rowsBetween unbounded-preceding → current) so Spark never
materializes a per-key buffer beyond one payload.

Determinism: if the right side can contain duplicate (keys, right_ts) rows,
dedup it first (e.g. ``groupBy(keys, ts).agg(max(...))``) — ties inside the
sort are otherwise broken by partition order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row with ``right_ts <= left_ts``.

    ``on`` columns must exist under the same name on both sides; every other
    right column becomes an output column and must not collide with a left
    column name (rename before joining). ``tolerance_seconds`` additionally
    requires ``left_ts - right_ts <= tolerance`` (matches outside the window
    are dropped/NULLed like missing matches).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]
    if not payload_cols:
        raise ValueError("right side has no payload columns besides the keys")
    clash = sorted(set(payload_cols) & set(left.columns))
    if clash:
        raise ValueError(f"right payload columns collide with left: {clash}")

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_TS),
        F.struct(*[F.col(c) for c in payload_cols]).alias(_PAYLOAD),
        F.lit(0).alias(_SIDE),
    )
    l = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))

    matched: Column = F.col(_PAYLOAD)
    if tolerance_seconds is not None:
        in_window = (
            F.col(left_ts).cast("double")
            - matched[right_ts].cast("double")
        ) <= F.lit(float(tolerance_seconds))
        matched = F.when(in_window, F.col(_PAYLOAD))

    out = u.where(F.col(_SIDE) == 1).withColumn(_PAYLOAD, matched)
    if how == "inner":
        out = out.where(F.col(_PAYLOAD).isNotNull())
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(_PAYLOAD)[c].alias(c) for c in payload_cols],
    )
