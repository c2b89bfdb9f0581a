"""JDBC snapshot+changelog ingestion (sources/jdbc_cdc.py) against a REAL
database — embedded Derby, driven through actual JDBC reads, mirroring
the reference's mysql-cdc table shape (``AbstractBasicTest.java:179-187``).

End-state parity contract: after any sequence of insert/update/delete
changelog rows, the continuously maintained view must equal
``operators/cdc.upsert_latest`` applied to the full changelog in batch.
"""

from __future__ import annotations

import tempfile
import time

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def derby(spark):
    """(url, exec_sql) for an embedded Derby DB shared with the Spark JVM."""
    d = tempfile.mkdtemp(prefix="fss-derby")
    url = f"jdbc:derby:{d}/cdc_db;create=true"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)

    def exec_sql(sql: str) -> None:
        st = conn.createStatement()
        try:
            st.execute(sql)
        finally:
            st.close()

    exec_sql("CREATE TABLE changelog (id INT, seq INT, op VARCHAR(1), "
             "val VARCHAR(32))")
    yield url, exec_sql
    conn.close()


def _rows(spark, view: str) -> dict:
    return {r["id"]: (r["val"], r["seq"])
            for r in spark.table(view).collect()}


def _await(predicate, timeout: float = 45.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            if predicate():
                return True
        except Exception:
            pass  # view not registered yet
        time.sleep(0.5)
    return False


def test_jdbc_changelog_reader_pushes_seq_filter(spark, derby):
    url, exec_sql = derby
    from flink_sql_security_spark.sources.jdbc_cdc import JdbcChangelog

    exec_sql("INSERT INTO changelog VALUES (900, 9001, 'I', 'pushdown')")
    cl = JdbcChangelog(spark, url, "changelog", "seq")
    inc = cl.changes_since(9000)
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(SEQ,9000)" in plan.replace("seq", "SEQ"), plan
    assert {r["id"] for r in inc.collect()} == {900}
    assert cl.changes_since(9001).count() == 0
    exec_sql("DELETE FROM changelog WHERE id = 900")


def test_jdbc_cdc_stream_end_state_parity(spark, derby):
    url, exec_sql = derby
    from flink_sql_security_spark.operators.cdc import upsert_latest
    from flink_sql_security_spark.sources.jdbc_cdc import (
        JdbcChangelog, register_cdc_stream)

    # phase 1: pre-existing rows — the snapshot
    exec_sql("INSERT INTO changelog VALUES (1, 1, 'I', 'a')")
    exec_sql("INSERT INTO changelog VALUES (2, 2, 'I', 'b')")

    q = register_cdc_stream(
        spark, "cdc_state", url, "changelog",
        key_cols=["id"], seq_col="seq", op_col="op",
        trigger_seconds=0.5)
    try:
        assert _await(lambda: _rows(spark, "cdc_state")
                      == {1: ("a", 1), 2: ("b", 2)}), \
            _rows(spark, "cdc_state")

        # phase 2: tail — update, delete, insert land while running
        exec_sql("UPDATE changelog SET val='ignored' WHERE id = 999")
        exec_sql("INSERT INTO changelog VALUES (1, 3, 'U', 'a2')")
        exec_sql("INSERT INTO changelog VALUES (2, 4, 'D', '')")
        exec_sql("INSERT INTO changelog VALUES (3, 5, 'I', 'c')")

        assert _await(lambda: _rows(spark, "cdc_state")
                      == {1: ("a2", 3), 3: ("c", 5)}), \
            _rows(spark, "cdc_state")

        # phase 3: a later batch re-inserts a deleted key
        exec_sql("INSERT INTO changelog VALUES (2, 6, 'I', 'b2')")
        assert _await(lambda: _rows(spark, "cdc_state").get(2)
                      == ("b2", 6)), _rows(spark, "cdc_state")
    finally:
        q.stop()

    # END-STATE PARITY: view == batch upsert_latest over the full changelog
    full = JdbcChangelog(spark, url, "changelog", "seq").snapshot()
    want = {r["id"]: (r["val"], r["seq"])
            for r in upsert_latest(full, ["id"], "seq", op_col="op")
            .collect()}
    assert _rows(spark, "cdc_state") == want == {
        1: ("a2", 3), 2: ("b2", 6), 3: ("c", 5)}

    # the stopped query leaves no dangling empty state; high-water mark
    # advanced past every change exactly once
    assert q.cdc_state["seq"] == 6

    # hygiene: release the final state's cache
    q.cdc_state["state"].unpersist(True)


def test_security_policies_over_live_changelog_view(spark, derby):
    """The reference's ACTUAL end-to-end shape: row-filter + mask policies
    applied to queries over a live changelog table
    (``SecurityContext.java:106-108`` executes everything against
    mysql-cdc-backed tables). Here: register_cdc_stream maintains the
    current-state view; SecurityContext rewrites queries against it; the
    secured results track the database as changes land."""
    from flink_sql_security_spark import (
        DataMaskPolicy, PolicyManager, RowFilterPolicy, SecurityContext)
    from flink_sql_security_spark.sources.jdbc_cdc import register_cdc_stream

    url, exec_sql = derby
    exec_sql("CREATE TABLE acct_log (id INT, seq INT, op VARCHAR(1), "
             "holder VARCHAR(32), region VARCHAR(16))")
    exec_sql("INSERT INTO acct_log VALUES (1, 1, 'I', 'Alice Zhang', 'east')")
    exec_sql("INSERT INTO acct_log VALUES (2, 2, 'I', 'Bob Liu', 'west')")
    exec_sql("INSERT INTO acct_log VALUES (3, 3, 'I', 'Carol Wu', 'east')")

    ctx = SecurityContext(spark, PolicyManager())
    ctx.add_policy(RowFilterPolicy("analyst", "accounts", "region = 'east'"))
    ctx.add_policy(DataMaskPolicy("analyst", "accounts", "holder",
                                  "MASK_SHOW_FIRST_4"))

    q = register_cdc_stream(
        spark, "accounts", url, "acct_log",
        key_cols=["id"], seq_col="seq", op_col="op", trigger_seconds=0.5)
    try:
        def secured():
            return {r["id"]: r["holder"] for r in ctx.sql(
                "analyst", "SELECT id, holder FROM accounts").collect()}

        # initial snapshot through the policies: east rows only, masked
        assert _await(lambda: set(secured()) == {1, 3})
        rows = secured()
        assert rows[1].startswith("Alic") and rows[1] != "Alice Zhang"
        # rewrite is string-auditable, filter + mask both present
        printed = ctx.mixed_rewrite(
            "analyst", "SELECT id, holder FROM accounts")
        assert "region = 'east'" in printed and "CAST" in printed

        # changelog moves: region change pulls id=2 into scope, a delete
        # removes id=3, the secured view follows
        exec_sql("INSERT INTO acct_log VALUES (2, 4, 'U', 'Bob Liu', 'east')")
        exec_sql("INSERT INTO acct_log VALUES (3, 5, 'D', '', 'east')")
        assert _await(lambda: set(secured()) == {1, 2}), secured()
        assert secured()[2].startswith("Bob ")
    finally:
        q.stop()
    q.cdc_state["state"].unpersist(True)


def test_hard_delete_without_op_column_is_not_observed(spark, derby):
    """The documented OSS-Spark platform caveat, made executable: polling
    ``WHERE seq > hwm`` sees only rows that EXIST in the source — a hard
    DELETE (the row vanishes, no tombstone written) emits nothing above
    the high-water mark, so the maintained state silently keeps the dead
    row. This is inherent to snapshot+incremental-pull over JDBC
    (``sources/jdbc_cdc.py`` module docstring); a binlog reader (the
    reference's mysql-cdc) is the only shape that observes it.
    """
    from flink_sql_security_spark.operators.cdc import upsert_latest
    from flink_sql_security_spark.sources.jdbc_cdc import JdbcChangelog

    url, exec_sql = derby
    exec_sql("CREATE TABLE hard_del (id INT, seq INT, val VARCHAR(32))")
    exec_sql("INSERT INTO hard_del VALUES (1, 1, 'a')")
    exec_sql("INSERT INTO hard_del VALUES (2, 2, 'b')")

    cl = JdbcChangelog(spark, url, "hard_del", "seq")
    state = upsert_latest(cl.changes_since(None), ["id"], "seq")
    state = state.localCheckpoint()  # pin: the fold must not re-read live
    assert {r["id"] for r in state.collect()} == {1, 2}
    hwm = 2

    # the row disappears from the source with no tombstone row
    exec_sql("DELETE FROM hard_del WHERE id = 2")
    delta = cl.changes_since(hwm)
    assert delta.count() == 0          # nothing crosses the high-water mark
    # folding the (empty) delta keeps the dead row — the caveat
    merged = upsert_latest(state.unionByName(delta), ["id"], "seq")
    assert {r["id"] for r in merged.collect()} == {1, 2}


def test_op_column_tombstone_drops_row(spark, derby):
    """The supported deletion contract: the writer appends a tombstone
    row (op = delete_op) instead of hard-deleting, and the SAME fold
    drops the key — end to end through real JDBC reads."""
    from flink_sql_security_spark.operators.cdc import upsert_latest
    from flink_sql_security_spark.sources.jdbc_cdc import JdbcChangelog

    url, exec_sql = derby
    exec_sql("CREATE TABLE soft_del (id INT, seq INT, op VARCHAR(1), "
             "val VARCHAR(32))")
    exec_sql("INSERT INTO soft_del VALUES (1, 1, 'I', 'a')")
    exec_sql("INSERT INTO soft_del VALUES (2, 2, 'I', 'b')")

    cl = JdbcChangelog(spark, url, "soft_del", "seq")
    state = upsert_latest(cl.changes_since(None), ["id"], "seq",
                          op_col="op").localCheckpoint()
    assert {r["id"] for r in state.collect()} == {1, 2}

    exec_sql("INSERT INTO soft_del VALUES (2, 3, 'D', '')")  # tombstone
    delta = cl.changes_since(2)
    assert delta.count() == 1          # the tombstone IS observed
    merged = upsert_latest(state.unionByName(delta), ["id"], "seq",
                           op_col="op")
    assert {r["id"] for r in merged.collect()} == {1}
    # re-insert after the tombstone resurrects the key (latest-op wins)
    exec_sql("INSERT INTO soft_del VALUES (2, 4, 'I', 'b2')")
    full = upsert_latest(cl.snapshot(), ["id"], "seq", op_col="op")
    assert {r["id"]: r["val"] for r in full.collect()} == {1: "a", 2: "b2"}
