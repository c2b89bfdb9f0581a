"""Streaming weighted reservoir: a deterministic bounded-memory sample
of an unbounded stream.

The A-ES priority key (``operators/sampling.py::weighted_sample``) is
CONTENT-derived — ``ln(u_id)/w`` from a md5 of the row id — so the
top-n over any set of rows is a pure function of the rows, independent
of arrival order or batching. That turns the streaming reservoir into
a trivially-correct merge: keep the running top-n across micro-batches
(each batch contributes its own top-n, n rows of driver state total),
and after ANY prefix of batches the held sample equals the batch
operator over every row seen so far — the property the parity test
pins. The classic random-reservoir algorithms exist to cope with
non-reproducible randomness; deterministic keys make the exact merge
both simpler and auditable (re-running the stream reproduces the same
sample bit-for-bit).

Scale shape: per batch, Spark's TakeOrdered brings n keyed rows to the
driver; the merge is an O(n log n) sort of 2n tuples. Driver state is
bounded by n forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def weighted_sample_stream(stream: DataFrame, n: int, weight_col: str,
                           sink, id_col: str = "doc_id",
                           salt: str = "wsample"):
    """foreachBatch writer maintaining the running weighted top-n.

    ``sink(sample_rows, batch_id)`` receives the CURRENT reservoir
    after each micro-batch — a list of plain column-name→value dicts
    (the internal priority key stripped), ordered by priority desc,
    id asc. Returns the ``DataStreamWriter`` (caller sets
    checkpoint/trigger and calls ``.start()``).
    """
    from flink_sql_security_spark.operators.sampling import weighted_sample

    state: list = []    # [(key, id, row_without_key_dict)] — ≤ n entries

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            rows = weighted_sample(batch_df, n, weight_col, id_col,
                                   salt, keep_key=True).collect()
            merged = state + [
                (r["_aes_key"], r[id_col],
                 {k: v for k, v in r.asDict().items() if k != "_aes_key"})
                for r in rows]
            # key desc, id asc — the batch operator's exact order; ids
            # are unique so re-seen state rows can only be replaced by
            # an identical tuple
            dedup = {}
            for key, rid, payload in merged:
                dedup[rid] = (key, rid, payload)
            state[:] = sorted(dedup.values(),
                              key=lambda t: (-t[0], t[1]))[:n]
        sink([payload for _, _, payload in state], batch_id)

    return stream.writeStream.outputMode("append").foreachBatch(_process)
