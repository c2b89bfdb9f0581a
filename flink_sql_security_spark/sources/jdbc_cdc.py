"""JDBC snapshot + changelog-tail ingestion.

The reference's tables are mysql-cdc binlog streams
(``AbstractBasicTest.java:179-187``): Flink snapshots the table, then
tails the binlog and maintains current state implicitly. Open-source
Spark has no binlog reader, so the closest OSS-Spark analogue — what
this module implements — is the snapshot-then-incremental-pull shape
over a monotonically increasing sequence/timestamp column (the same
contract Debezium/DMS land in a bronze table):

1. **snapshot**: one partitioned JDBC read of the whole table;
2. **tail**: periodic pulls of ``WHERE seq_col > last_seen`` (the
   predicate pushes down into the remote SQL, so each poll moves only
   the delta);
3. **state**: each delta folds into the maintained current state with
   the SAME compaction operator as the rest of the engine
   (``operators/cdc.upsert_latest`` — latest row per key, deletes
   dropped), so batch, streaming, and JDBC-ingest CDC all share one
   verified semantics.

Scale notes: the remote read partitions via partition_column/bounds
(never one connection for 100 TB); state folding is upsert_latest's
single key exchange per poll; state is persisted between polls and the
previous generation unpersisted (at production scale the state table
would be Delta/parquet and the fold a MERGE — `upsert_stream`'s sink
slot). Requires ``seq_col`` to be monotonic over commits, the standard
CDC-over-JDBC caveat: rows committed out of sequence order below the
high-water mark are missed (use a real changelog source if the database
can't guarantee it).
"""

from __future__ import annotations

import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession, functions as F


class JdbcChangelog:
    """Snapshot + incremental reader over a JDBC table with a sequence
    column. Stateless: callers track the high-water mark."""

    def __init__(self, spark: SparkSession, url: str, table: str,
                 seq_col: str, user: str = "", password: str = "",
                 partition_column: str | None = None,
                 num_partitions: int = 8,
                 lower_bound: int | None = None,
                 upper_bound: int | None = None) -> None:
        self.spark = spark
        self.url = url
        self.table = table
        self.seq_col = seq_col
        self._opts = {"url": url, "dbtable": table,
                      "user": user, "password": password}
        if partition_column is not None:
            if lower_bound is None or upper_bound is None:
                raise ValueError(
                    "partitioned JDBC reads need lower/upper bounds")
            self._opts.update({
                "partitionColumn": partition_column,
                "numPartitions": str(num_partitions),
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
            })

    def _read(self) -> DataFrame:
        reader = self.spark.read.format("jdbc")
        for k, v in self._opts.items():
            reader = reader.option(k, v)
        df = reader.load()
        # databases that fold identifiers to upper case (Derby, Oracle)
        # would otherwise leak case into the key/seq/op contract
        return df.toDF(*[c.lower() for c in df.columns])

    def snapshot(self) -> DataFrame:
        """The full table as of now (phase 1 of the ingest)."""
        return self._read()

    def changes_since(self, last_seq) -> DataFrame:
        """Rows with ``seq_col > last_seq`` — the filter pushes down into
        the remote SQL (PushedFilters on the JDBC scan), so the poll
        transfers only the delta. ``last_seq=None`` = everything (the
        snapshot is just the first pull)."""
        df = self._read()
        if last_seq is None:
            return df
        return df.where(F.col(self.seq_col) > F.lit(last_seq))


def register_cdc_stream(spark: SparkSession, name: str, url: str,
                        table: str, key_cols: list[str], seq_col: str,
                        op_col: str | None = None, delete_op: str = "D",
                        user: str = "", password: str = "",
                        trigger_seconds: float = 1.0,
                        checkpoint_dir: str | None = None,
                        partition_column: str | None = None,
                        num_partitions: int = 8,
                        lower_bound: int | None = None,
                        upper_bound: int | None = None):
    """Maintain temp view ``name`` as the CURRENT STATE of a JDBC table's
    changelog — the engine's stand-in for the reference's mysql-cdc
    catalog tables: register once, then query ``name`` (through the
    security layer or not) and see upserts/deletes reflected.

    Mechanics: a rate stream is the scheduler; each micro-batch polls
    ``WHERE seq_col > high_water_mark`` (pushed down), folds the delta
    into the persisted state with ``operators/cdc.upsert_latest``
    (latest per key; rows whose latest op is ``delete_op`` drop), and
    re-registers the view. Returns the started ``StreamingQuery``
    (``.stop()`` it to end ingestion); the view and the handle's
    ``last_seq`` attribute stay valid afterwards.
    """
    from flink_sql_security_spark.operators.cdc import upsert_latest

    changelog = JdbcChangelog(
        spark, url, table, seq_col, user, password,
        partition_column, num_partitions, lower_bound, upper_bound)

    lock = threading.Lock()
    hwm: dict = {"seq": None, "state": None, "polls": 0}

    def _poll(_batch_df: DataFrame, _batch_id: int) -> None:
        with lock:
            # localCheckpoint (eager), NOT persist: a persisted delta's
            # lineage is a live `seq > hwm` JDBC read — losing a cached
            # block would silently recompute against the CURRENT database
            # contents, pulling rows committed after the high-water mark
            # into an older generation (the view could transiently show
            # un-marked rows, or apply a delete before its seq is
            # reached). Checkpointing pins the delta to the rows actually
            # read; a lost checkpoint block fails the poll loudly instead
            # of folding inconsistent state (the documented localCheckpoint
            # trade, correct for a changelog reader).
            delta = changelog.changes_since(hwm["seq"]).localCheckpoint()
            # the high-water mark comes from the DELTA, pre-compaction: a
            # delete row carries the highest seq but is dropped from the
            # folded state — marking off the state would re-pull it forever
            top = delta.agg(F.max(seq_col).alias("m")).collect()[0]["m"]
            if top is None:
                return  # no new changes
            prev = hwm["state"]
            merged = delta if prev is None else prev.unionByName(delta)
            # one fold per poll: latest row per key across state ∪ delta;
            # tombstones drop here, so state stays O(live keys)
            folded = upsert_latest(merged, key_cols, seq_col, op_col=op_col,
                                   delete_op=delete_op)
            hwm["polls"] += 1
            if hwm["polls"] % 8 == 0:
                # cut the generation-over-generation plan lineage before it
                # deepens planning cost (iterative-algorithm pattern)
                new_state = folded.localCheckpoint()
            else:
                new_state = folded.persist()
                new_state.count()  # materialize before dropping sources
            new_state.createOrReplaceTempView(name)
            # the delta's checkpoint blocks stay alive while any state
            # generation's lineage references them; the ContextCleaner
            # reaps them when the chain checkpoints past (next %8 poll)
            if prev is not None:
                prev.unpersist()
            hwm["state"] = new_state
            hwm["seq"] = top

    ticker = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load())
    writer = (
        ticker.writeStream.foreachBatch(_poll)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .option("checkpointLocation",
                checkpoint_dir or tempfile.mkdtemp(prefix="fss-cdc-ckpt"))
    )
    query = writer.start()
    query.cdc_state = hwm  # introspection handle for tests/operators
    return query
