"""Source/sink surface: file-format registration, sinks, session builder.

JDBC is exercised to the option-plumbing boundary only (no database server in
this environment); the reader construction and partitioning guard are real.
"""

import shutil
import tempfile

import pytest

from flink_sql_security_spark import PolicyManager, RowFilterPolicy, SecurityContext
from flink_sql_security_spark.sources import (
    print_sink, register_file_table, register_jdbc_table, register_tables,
)


def test_register_csv_table(spark, demo_tables):
    path = tempfile.mkdtemp(prefix="fss_csv")
    try:
        spark.table("products").write.mode("overwrite") \
            .option("header", "true").csv(path)
        register_file_table(spark, "products_csv", path, fmt="csv")
        assert spark.table("products_csv").count() == 9
        # and the security layer applies to file-registered tables
        ctx = SecurityContext(spark, PolicyManager())
        ctx.add_policy(RowFilterPolicy("u", "products_csv", "name = 'hammer'"))
        assert ctx.execute_row_filter(
            "u", "SELECT id FROM products_csv", 10).__len__() == 3
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_register_json_table(spark, demo_tables):
    path = tempfile.mkdtemp(prefix="fss_json")
    try:
        spark.table("shipments").write.mode("overwrite").json(path)
        register_file_table(spark, "shipments_json", path, fmt="json")
        assert spark.table("shipments_json").count() == 3
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_jdbc_requires_bounds_with_partition_column(spark):
    with pytest.raises(ValueError):
        register_jdbc_table(
            spark, "t", "jdbc:mysql://localhost/db", "orders",
            partition_column="id")


def test_print_sink(spark, demo_tables, capsys):
    print_sink(spark.table("shipments"), n=5)
    out = capsys.readouterr().out
    assert "shipment_id" in out and "Beijing" in out


def test_register_tables_idempotent(spark):
    register_tables(spark, "/root/testdata/sf0.001")
    n1 = spark.table("orders").count()
    register_tables(spark, "/root/testdata/sf0.001")
    assert spark.table("orders").count() == n1 == 1500


def test_register_orc_table(spark, demo_tables):
    """ORC round-trip through the same register_file_table path (Spark's
    other built-in columnar format; same pushdown story as parquet)."""
    path = tempfile.mkdtemp(prefix="fss_orc")
    try:
        spark.table("orders").write.mode("overwrite").orc(path)
        register_file_table(spark, "orders_orc", path, fmt="orc")
        assert spark.table("orders_orc").count() == 6
        plan = spark.table("orders_orc").where("region = 'beijing'") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "beijing" in plan, plan
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_write_compacted_targets_file_count(spark, tmp_path):
    from flink_sql_security_spark.sources import write_compacted

    import glob

    df = spark.range(200_000).selectExpr(
        "id", "repeat('x', 64) AS pad").repartition(64)
    # 200k rows x ~70B ~ 14MB in-memory estimate -> 2MB target = several files
    out = str(tmp_path / "compacted")
    n = write_compacted(df, out, target_file_mb=2)
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == n
    assert 1 < n < 64  # genuinely compacted vs the 64 input partitions
    back = spark.read.parquet(out)
    assert back.count() == 200_000


def test_catalog_adapter_does_not_cache_misses(spark):
    """A table that appears AFTER a failed lookup must become visible to
    the same adapter — Spark catalogs are dynamic (a changelog ingest
    registers its maintained view mid-session); caching the miss hid the
    table from every later rewrite in the context."""
    from flink_sql_security_spark.catalog import CatalogAdapter

    adapter = CatalogAdapter(spark)
    assert adapter.get_table(["late_view_xyz"]) is None
    spark.range(3).selectExpr("id AS k").createOrReplaceTempView(
        "late_view_xyz")
    try:
        t = adapter.get_table(["late_view_xyz"])
        assert t is not None and t.columns[0].column_name == "k"
        # positive entries ARE cached (per-context cache still works)
        assert adapter.get_table(["late_view_xyz"]) is t
    finally:
        spark.catalog.dropTempView("late_view_xyz")


# --------------------------------------------------- debezium decode

def _env(op, ts, key, val, *, wrapped=False, pos=None):
    import json

    row = {"id": key, "val": val}
    env = {"before": row if op == "d" else None,
           "after": None if op == "d" else row,
           "op": op, "ts_ms": ts}
    if pos is not None:
        env["source"] = {"pos": pos}
    return json.dumps({"payload": env} if wrapped else env)


def test_debezium_decode_both_wrapper_shapes(spark):
    """schemas.enable=true (payload wrapper) and =false (bare) decode
    identically; deletes carry the before image; garbage rows drop."""
    from flink_sql_security_spark.sources.debezium import debezium_decode

    rows = [(_env("c", 1, 1, "a"),),
            (_env("u", 2, 1, "b", wrapped=True),),
            (_env("d", 3, 2, "gone"),),
            ("{not json",), ('{"unrelated": true}',)]
    out = debezium_decode(
        spark.createDataFrame(rows, ["value"]),
        row_ddl="id BIGINT, val STRING").collect()
    got = {(r["id"], r["_op"]): (r["val"], r["_seq"]) for r in out}
    assert len(out) == 3                      # garbage rows dropped
    assert got[(1, "c")] == ("a", 1)
    assert got[(1, "u")] == ("b", 2)          # wrapper shape decoded
    assert got[(2, "d")] == ("gone", 3)       # delete = before image


def test_debezium_state_compaction_and_tiebreak(spark):
    """Latest op wins per key; same-ts_ms collisions break on
    source.pos; a key whose latest op is a delete disappears."""
    from flink_sql_security_spark.sources.debezium import debezium_state

    rows = [(_env("c", 1, 1, "a"),),
            (_env("u", 5, 1, "winner", pos=9),),
            (_env("u", 5, 1, "loser", pos=3),),
            (_env("c", 1, 2, "x"),),
            (_env("d", 2, 2, "x"),),
            (_env("c", 1, 3, "kept", wrapped=True),)]
    out = {r["id"]: r["val"] for r in debezium_state(
        spark.createDataFrame(rows, ["value"]),
        row_ddl="id BIGINT, val STRING", key_cols=["id"],
        tiebreak_field="pos").collect()}
    assert out == {1: "winner", 3: "kept"}


def test_debezium_state_matches_jdbc_cdc_end_state(spark):
    """End-state parity on the SAME mutation script: the Debezium
    decode + compaction must equal operators/cdc.upsert_latest over
    the equivalent (key, seq, op, val) changelog — the contract the
    JDBC-emulated source (sources/jdbc_cdc.py) is tested against in
    test_jdbc_cdc.py."""
    from flink_sql_security_spark.operators.cdc import upsert_latest
    from flink_sql_security_spark.sources.debezium import debezium_state

    script = [  # (id, seq, op, val) — inserts, updates, deletes, re-insert
        (1, 1, "c", "a"), (1, 2, "u", "a2"),
        (2, 1, "c", "b"), (2, 2, "d", "b"),
        (3, 1, "c", "c"), (3, 2, "d", "c"), (3, 3, "c", "c3"),
        (4, 1, "c", "d")]
    tabular = spark.createDataFrame(script, ["id", "seq", "op", "val"])
    want = {r["id"]: r["val"] for r in upsert_latest(
        tabular, ["id"], "seq", op_col="op", delete_op="d").collect()}
    envelopes = spark.createDataFrame(
        [(_env(op, seq, i, val, wrapped=(i % 2 == 0)),)
         for i, seq, op, val in script], ["value"])
    got = {r["id"]: r["val"] for r in debezium_state(
        envelopes, row_ddl="id BIGINT, val STRING",
        key_cols=["id"]).collect()}
    assert got == want == {1: "a2", 3: "c3", 4: "d"}


def test_debezium_state_stream_matches_batch(spark):
    """Streaming envelope ingest (update mode, soft-delete carry)
    equals the batch debezium_state on the same multi-batch stream:
    NOT is_deleted rows match the batch current state, and a deleted
    key surfaces with is_deleted=True instead of vanishing."""
    import os

    from flink_sql_security_spark.sources.debezium import (
        debezium_state, debezium_state_stream)

    batches = [
        [(_env("c", 1, 1, "a"),), (_env("c", 1, 2, "x"),)],
        [(_env("u", 5, 1, "winner", pos=9, wrapped=True),),
         (_env("u", 5, 1, "loser", pos=3),), (_env("d", 2, 2, "x"),)],
    ]
    path = tempfile.mkdtemp(prefix="fss_deb_stream")
    try:
        for i, b in enumerate(batches):
            spark.createDataFrame(b, ["value"]).coalesce(1).write.parquet(
                os.path.join(path, f"b{i}"))
        src = (spark.readStream.schema("value string")
               .option("maxFilesPerTrigger", "1")
               .parquet(os.path.join(path, "b*")))
        q = (debezium_state_stream(src, row_ddl="id BIGINT, val STRING",
                                   key_cols=["id"], tiebreak_field="pos")
             .writeStream.format("memory").queryName("deb_state")
             .outputMode("complete").start())
        q.processAllAvailable(); q.stop()
        state = {r["id"]: r for r in spark.table("deb_state").collect()}
        batch_rows = spark.createDataFrame(
            [r for b in batches for r in b], ["value"])
        want = {r["id"]: r["val"] for r in debezium_state(
            batch_rows, row_ddl="id BIGINT, val STRING",
            key_cols=["id"], tiebreak_field="pos").collect()}
        live = {k: r["val"] for k, r in state.items()
                if not r["is_deleted"]}
        assert live == want == {1: "winner"}
        assert state[2]["is_deleted"]          # soft-delete carry
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_debezium_decode_drops_imageless_ops(spark):
    """Debezium 't' (truncate) and 'm' (message) events carry no row
    image — they must be skipped, not decoded into all-NULL state rows
    (round-10 review finding)."""
    import json

    from flink_sql_security_spark.sources.debezium import (
        debezium_state)

    rows = [(_env("c", 1, 1, "a"),),
            (json.dumps({"op": "t", "ts_ms": 2}),),
            (json.dumps({"payload": {"op": "m", "ts_ms": 3,
                                     "before": None, "after": None}}),)]
    out = debezium_state(spark.createDataFrame(rows, ["value"]),
                         row_ddl="id BIGINT, val STRING",
                         key_cols=["id"]).collect()
    assert [(r["id"], r["val"]) for r in out] == [(1, "a")]
