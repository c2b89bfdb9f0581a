"""Mixed-rewrite goldens (``MixedRewriteTest.java:53-135``) and the execution
tier (``Execute{RowFilter,DataMask}Test`` + ``MixedExecuteTest`` row-set
goldens) — first-class here, not ``@Ignore``d like the reference's, since the
fixture tables are in-session temp views instead of an external MySQL.
"""

import pytest

from flink_sql_security_spark import (
    DataMaskPolicy, PolicyManager, RowFilterPolicy, SecurityContext,
)

QUERY = "SELECT order_id, customer_name, product_id, region FROM orders"


@pytest.fixture()
def ctx(demo_tables):
    ctx = SecurityContext(demo_tables, PolicyManager())
    ctx.add_policy(RowFilterPolicy("user_A", "orders", "region = 'beijing'"))
    ctx.add_policy(RowFilterPolicy("user_B", "orders", "region = 'hangzhou'"))
    ctx.add_policy(DataMaskPolicy("user_A", "orders", "customer_name", "MASK"))
    ctx.add_policy(DataMaskPolicy("user_B", "orders", "customer_name", "MASK_SHOW_FIRST_4"))
    return ctx


# -- mixed rewrite (MixedRewriteTest.java) --------------------------------

def test_mixed_rewrite_select(ctx):
    # MixedRewriteTest.java:53-84: row filter attaches to the user-visible
    # select, mask subquery spliced under it (filter over masked output —
    # SecurityContext.java:154-167 ordering)
    out = ctx.mixed_rewrite("user_A", QUERY)
    assert out == (
        "SELECT orders.order_id, orders.customer_name, orders.product_id, "
        "orders.region FROM (SELECT order_id, order_date, "
        "CAST(mask(customer_name) AS STRING) AS customer_name, product_id, "
        "price, order_status, region FROM orders) AS orders "
        "WHERE orders.region = 'beijing'"
    )


def test_mixed_rewrite_join(ctx):
    # MixedRewriteTest.java:87-135
    ctx.add_policy(RowFilterPolicy("user_A", "products", "name = 'hammer'"))
    ctx.add_policy(DataMaskPolicy("user_A", "products", "name", "MASK_SHOW_LAST_4"))
    out = ctx.mixed_rewrite(
        "user_A",
        "SELECT orders.order_id, orders.customer_name, p.name FROM orders "
        "LEFT JOIN products AS p ON orders.product_id = p.id")
    assert out.endswith("WHERE orders.region = 'beijing' AND p.name = 'hammer'")
    assert out.count("(SELECT") == 2  # both tables mask-wrapped


# -- execution tier (ExecuteRowFilterTest.java:50-91) ---------------------

def test_execute_baseline_unfiltered(ctx):
    # ExecuteRowFilterTest.java:51-63: no rewrite → all 6 rows
    rows = ctx.execute(QUERY, 10)
    assert len(rows) == 6


def test_execute_row_filter_by_user(ctx):
    # ExecuteRowFilterTest.java:69-91
    rows_a = {tuple(r) for r in ctx.execute_row_filter("user_A", QUERY)}
    assert rows_a == {
        (10001, "Jack", 102, "beijing"),
        (10002, "Sally", 105, "beijing"),
    }
    rows_b = {tuple(r) for r in ctx.execute_row_filter("user_B", QUERY)}
    assert rows_b == {
        (10003, "Edward", 106, "hangzhou"),
        (10004, "John", 103, "hangzhou"),
    }


# -- execution tier (ExecuteDataMaskTest.java:51-102) ---------------------

def test_execute_data_mask_by_user(ctx):
    rows_a = {tuple(r) for r in ctx.execute_data_mask("user_A", QUERY)}
    assert rows_a == {
        (10001, "Xxxx", 102, "beijing"),
        (10002, "Xxxxx", 105, "beijing"),
        (10003, "Xxxxxx", 106, "hangzhou"),
        (10004, "Xxxx", 103, "hangzhou"),
        (10005, "Xxxxxx", 104, "shanghai"),
        (10006, "Xxxx", 103, "shanghai"),
    }
    rows_b = {tuple(r) for r in ctx.execute_data_mask("user_B", QUERY)}
    assert rows_b == {
        (10001, "Jack", 102, "beijing"),
        (10002, "Sallx", 105, "beijing"),
        (10003, "Edwaxx", 106, "hangzhou"),
        (10004, "John", 103, "hangzhou"),
        (10005, "Edwaxx", 104, "shanghai"),
        (10006, "Jack", 103, "shanghai"),
    }


# -- execution tier (MixedExecuteTest.java:54-95) -------------------------

def test_mixed_execute_by_user(ctx):
    rows_a = {tuple(r) for r in ctx.mixed_execute("user_A", QUERY)}
    assert rows_a == {
        (10001, "Xxxx", 102, "beijing"),
        (10002, "Xxxxx", 105, "beijing"),
    }
    rows_b = {tuple(r) for r in ctx.mixed_execute("user_B", QUERY)}
    assert rows_b == {
        (10003, "Edwaxx", 106, "hangzhou"),
        (10004, "John", 103, "hangzhou"),
    }


def test_execute_date_mask_show_year(ctx):
    # MASK_DATE_SHOW_YEAR (data_mask_types.json itemId 12): day→1, month→Jan,
    # year kept — truncate-to-year, re-cast to the declared TIMESTAMP type
    import datetime

    ctx.add_policy(DataMaskPolicy("user_C", "orders", "order_date",
                                  "MASK_DATE_SHOW_YEAR"))
    rows = {(r[0], r[1]) for r in ctx.execute_data_mask(
        "user_C", "SELECT order_id, order_date FROM orders")}
    jan1 = {2020: datetime.datetime(2020, 1, 1), 2022: datetime.datetime(2022, 1, 1)}
    assert rows == {
        (10001, jan1[2020]), (10002, jan1[2020]), (10003, jan1[2020]),
        (10004, jan1[2022]), (10005, jan1[2022]), (10006, jan1[2022]),
    }


def test_fetch_size_limit(ctx):
    # SecurityContext.java:190-201 — default fetch is first N rows
    assert len(ctx.execute(QUERY, 3)) == 3


# -- DataFrame-native fast path -------------------------------------------

def test_secured_table_fast_path(ctx):
    rows = {
        tuple(r)
        for r in ctx.table("user_A", "orders")
        .select("order_id", "customer_name", "region").collect()
    }
    assert rows == {
        (10001, "Xxxx", "beijing"),
        (10002, "Xxxxx", "beijing"),
    }


def test_secured_sql_dataframe(ctx):
    df = ctx.sql("user_B", QUERY)
    assert df.columns == ["order_id", "customer_name", "product_id", "region"]
    assert df.filter("customer_name = 'Edwaxx'").count() == 1


def test_insert_select_executes(ctx):
    # INSERT path: rewrite then execute against a real parquet-backed table
    spark = ctx.spark
    spark.sql("DROP TABLE IF EXISTS sink_t")
    spark.sql("CREATE TABLE sink_t USING parquet AS SELECT * FROM orders LIMIT 0")
    ctx.mixed_execute("user_A", "INSERT INTO sink_t SELECT * FROM orders")
    got = {tuple(r) for r in spark.table("sink_t")
           .select("order_id", "customer_name", "region").collect()}
    assert got == {(10001, "Xxxx", "beijing"), (10002, "Xxxxx", "beijing")}
    spark.sql("DROP TABLE sink_t")
