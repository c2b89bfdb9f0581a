"""Streaming changelog maintenance: the unbounded counterpart of
operators/cdc.upsert_latest.

The reference's execution model IS this shape — every test table is a
mysql-cdc changelog consumed by Flink in streaming mode
(``AbstractBasicTest.java:179-187``, ``SecurityContext.java:106-108``),
with current-state semantics maintained implicitly by Flink's changelog
runtime. Structured Streaming has no changelog-table concept, so the
engine exposes the two standard Spark shapes explicitly:

- `latest_state_stream`: per-key latest row via stateful dedup on
  (key) with event-time ordering handled by `max_by` aggregation in
  update mode — bounded state (one row per live key), continuous output.
- `upsert_stream`: foreachBatch merge — every micro-batch is compacted
  (`upsert_latest`) and merged into the caller's sink table (the Delta
  MERGE / JDBC upsert slot). This is the production CDC-ingest shape:
  batch-verified merge logic, exactly-once via sink transactionality +
  checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def latest_state_stream(stream: DataFrame, key_cols: list[str],
                        seq_col: str, value_cols: list[str],
                        op_col: str | None = None,
                        delete_op: str = "D") -> DataFrame:
    """Continuously-maintained latest value per key (update output mode).

    ``max_by(struct(values), struct(seq))`` keeps one struct per key —
    state is O(live keys), each update emits the key's new current row.
    Deletes can't drop state inside an aggregation; downstream consumers
    filter ``is_deleted`` (the standard soft-delete carry in Spark CDC
    until the sink-side merge applies it physically).
    """
    val = F.struct(*[F.col(c) for c in value_cols],
                   *( [F.col(op_col)] if op_col else [] ))
    ordered = F.struct(F.col(seq_col))
    agg = (
        stream.groupBy(*key_cols)
        .agg(F.max_by(val, ordered).alias("_v"),
             F.max(seq_col).alias(seq_col))
    )
    out = agg.select(*key_cols, seq_col,
                     *[F.col(f"_v.{c}").alias(c) for c in value_cols],
                     *( [F.col(f"_v.{op_col}").alias(op_col)] if op_col else [] ))
    if op_col is not None:
        out = out.withColumn("is_deleted", F.col(op_col) == delete_op)
    return out


def upsert_stream(stream: DataFrame, merge, key_cols: list[str],
                  seq_col: str, op_col: str | None = None,
                  delete_op: str = "D",
                  tiebreak_cols: list[str] | None = None):
    """foreachBatch CDC ingest: compact each micro-batch to one row per
    key (``upsert_latest`` keeps deletes so the sink can apply them),
    then hand it to ``merge(compacted_df, batch_id)`` — the caller's
    Delta MERGE / JDBC upsert / state-table writer.

    Returns the ``DataStreamWriter`` (caller sets checkpoint/trigger and
    calls ``.start()``). Per-batch cost is the batch operator's single
    key-hash exchange; cross-batch ordering is the sink's merge condition
    (``source.seq > target.seq``), so replays and out-of-order batches
    converge to the same state — idempotent by construction.
    """
    from flink_sql_security_spark.operators.cdc import upsert_latest

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # keep tombstones: the SINK decides delete-vs-upsert per row
        compacted = upsert_latest(batch_df, key_cols, seq_col, op_col=None,
                                  tiebreak_cols=tiebreak_cols)
        merge(compacted, batch_id)

    return stream.writeStream.foreachBatch(_process)
