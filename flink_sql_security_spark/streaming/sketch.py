"""Streaming sketch maintenance: HLL / Bloom / Count-Min over unbounded
input with BOUNDED state.

The batch builders in ``operators/sketch.py`` are pure
select → explode → groupBy shapes, so Structured Streaming runs them as
continuously-maintained aggregations — and unlike most streaming
aggregations their state cannot grow without bound BY CONSTRUCTION:

- HLL registers: ≤ m rows per sketched column (register-wise ``max``)
- Bloom bits:    ≤ n_bits rows (streaming dedup on the bit position)
- CMS counters:  ≤ depth·width rows (cellwise ``count``)

That makes them the durable streaming analogue of the batch profiling
path: a day-long ingest maintains the same constant-size sketch a batch
scan would produce, and the committed state merges with any other shard's
sketch by the family's merge operation (max / union / sum).

Output-mode contract: registers and counters are aggregations → run the
query in ``update`` (or ``complete`` for a memory-sink snapshot); the
Bloom bit stream is a dedup → ``append`` works and emits each newly-set
bit exactly once.

Reference scope: the reference executes everything as changelog streams
(``SecurityContext.java:106-108``) but has no sketching; this extends the
streaming surface per the driver brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flink_sql_security_spark.operators import sketch as _b


def hll_register_stream(stream: DataFrame, cols: list[str]) -> DataFrame:
    """Continuously-maintained HLL registers (column, bucket, rho).
    State ≤ m rows per column; snapshot estimates via
    ``operators.sketch.approx_distinct_hll``'s estimator over the sink."""
    return _b.hll_registers(stream, cols)


def bloom_bit_stream(stream: DataFrame, col: str,
                     n_bits: int = _b.BLOOM_BITS,
                     k: int = _b.BLOOM_K) -> DataFrame:
    """Append-mode stream of newly-set Bloom bits for ``stream[col]``.

    The batch builder delegates directly: its ``.distinct()`` IS the
    streaming dedup operator on an unbounded input, so each bit position
    is emitted the first time any value sets it and suppressed forever
    after. The sink's accumulated rows ARE the filter (same contract —
    and the same code path — as ``bloom_bits``, so the position
    arithmetic can never desynchronize from the batch filter); state is
    capped at ``n_bits`` entries with no watermark needed.
    """
    return _b.bloom_bits(stream, col, n_bits, k)


def cms_counter_stream(stream: DataFrame, col: str,
                       width: int = _b.CMS_WIDTH,
                       depth: int = _b.CMS_DEPTH) -> DataFrame:
    """Continuously-maintained CMS counters (row_j, pos, cnt).
    State ≤ depth·width rows; point-query a snapshot with
    ``operators.sketch.cms_estimate``."""
    return _b.cms_counters(stream, col, width, depth)


def grouped_hll_register_stream(stream: DataFrame, key_col: str,
                                val_col: str) -> DataFrame:
    """Continuously-maintained PER-KEY HLL registers (key, bucket, rho).
    State ≤ m rows per key; snapshot per-key estimates via
    ``operators.sketch.grouped_distinct_hll``'s estimator over the
    sink (the register max is order-independent, so any prefix of the
    stream equals the batch sketch of the rows seen)."""
    return _b.grouped_hll_registers(stream, key_col, val_col)
