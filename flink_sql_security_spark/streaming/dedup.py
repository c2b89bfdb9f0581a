"""Streaming deduplication: the unbounded-input counterpart of
operators/dedup.exact_dedup.

On a stream you cannot groupBy the whole history — state must be bounded.
Two standard shapes, both on Structured Streaming's built-in dedup state:

- `dedup_stream`: `dropDuplicates` on a content key — exact, but state
  grows without bound; only for keyed streams with finite key space.
- `dedup_stream_watermarked`: `dropDuplicatesWithinWatermark` — state is
  bounded by the watermark horizon (a duplicate arriving later than the
  delay threshold is treated as new). This is the 100 TB/day shape: state
  size ≈ distinct keys per watermark window, evicted automatically.

Keys are md5 of normalized text — same normalization as the batch
operator, so a batch backfill and the streaming path dedup identically
within the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def content_key(text_col: str = "text") -> F.Column:
    """md5 over whitespace/case-normalized text (matches batch exact_dedup)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")))


def dedup_stream(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact streaming dedup on the content key (unbounded state)."""
    return stream.withColumn("dup_key", content_key(text_col)) \
        .dropDuplicates(["dup_key"])


def dedup_stream_watermarked(stream: DataFrame, ts_col: str = "ts",
                             text_col: str = "text",
                             delay: str = "10 minutes") -> DataFrame:
    """Streaming dedup with state bounded by the event-time watermark.

    Duplicates separated by more than ``delay`` pass through — the price
    of bounded state on an unbounded stream. Use the largest delay the
    state store affords; at 1000 executors the HDFS/RocksDB-backed state
    store shards by key hash automatically.
    """
    keyed = stream.withColumn("dup_key", content_key(text_col)) \
        .withWatermark(ts_col, delay)
    return keyed.dropDuplicatesWithinWatermark(["dup_key"])


def incremental_dedup_stream(stream: DataFrame, corpus_df: DataFrame, sink,
                             text_col: str = "text", id_col: str = "doc_id",
                             **dedup_kwargs):
    """Ingest-time NEAR-dedup of a stream against a static corpus:
    every micro-batch runs the full batch ``operators.dedup.incremental_dedup``
    (content-hash semi-join + asymmetric MinHash-LSH + exact-Jaccard
    verification) and hands the (doc_id, status) result to
    ``sink(result_df, batch_id)``.

    ``foreachBatch`` is the standard Structured Streaming shape for reusing
    verified batch logic whose joins/aggregations exceed what pure
    stream-static operators allow (the Jaccard verification join would
    need stream-side aggregation). Scale shape per batch = the batch
    operator's: the corpus side is never re-paired against itself, only
    the incoming batch probes it; no streaming state is held (a static
    corpus snapshot per run — restart the query to pick up a new one).

    Returns the ``DataStreamWriter`` (caller configures checkpoint/trigger
    and calls ``.start()``).
    """
    from flink_sql_security_spark.operators.dedup import incremental_dedup

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(incremental_dedup(batch_df, corpus_df, text_col, id_col,
                               **dedup_kwargs), batch_id)

    return stream.writeStream.foreachBatch(_process)
