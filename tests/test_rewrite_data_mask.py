"""Data-mask rewrite goldens — ports the 8 cases of
``test/rewrite/RewriteDataMaskTest.java:56-436`` plus re-entry-guard checks.

Note: the reference prints Hive UDF calls (``mask(customer_name)``) and relies
on Flink's Hive module to execute them. Our rewriter *lowers* those calls to
Spark built-ins at rewrite time (functions/masks.py), so goldens assert the
lowered form. ``mask`` itself is a Spark built-in with identical defaults, so
it survives lowering unchanged.
"""

import pytest

from flink_sql_security_spark import (
    DataMaskPolicy, PolicyManager, RowFilterPolicy, SecurityContext,
)

# the lowered Spark form of MASK_SHOW_FIRST_4's Hive template
SHOW_FIRST_4 = (
    "concat(substring({c}, 1, 4), mask(substring({c}, 5), 'x', 'x', 'x', NULL))"
)
# the lowered Spark form of MASK_SHOW_LAST_4's Hive template
SHOW_LAST_4 = (
    "concat(mask(substring({c}, 1, length({c}) - 4), 'x', 'x', 'x', NULL), "
    "right({c}, 4))"
)

MASKED_ORDERS_SUBQUERY = (
    "(SELECT order_id, order_date, "
    "CAST(mask(customer_name) AS STRING) AS customer_name, "
    "product_id, price, order_status, region FROM orders)"
)


@pytest.fixture()
def ctx(demo_tables):
    ctx = SecurityContext(demo_tables, PolicyManager())
    ctx.add_policy(DataMaskPolicy("user_A", "orders", "customer_name", "MASK"))
    ctx.add_policy(DataMaskPolicy("user_A", "products", "name", "MASK_SHOW_LAST_4"))
    ctx.add_policy(DataMaskPolicy("user_B", "orders", "customer_name", "MASK_SHOW_FIRST_4"))
    return ctx


def test_select(ctx):
    # RewriteDataMaskTest.java:56-80 — all columns re-emitted in declared
    # order, masked column CAST back to its type, alias = table name
    out = ctx.rewrite_data_mask(
        "user_A", "SELECT order_id, customer_name, product_id, region FROM orders")
    assert out == (
        "SELECT orders.order_id, orders.customer_name, orders.product_id, "
        f"orders.region FROM {MASKED_ORDERS_SUBQUERY} AS orders"
    )


def test_select_with_alias(ctx):
    # RewriteDataMaskTest.java:83-109 — subquery takes the user's alias
    out = ctx.rewrite_data_mask(
        "user_A",
        "SELECT o.order_id, o.customer_name, o.product_id, o.region FROM orders AS o")
    assert out.endswith(f"FROM {MASKED_ORDERS_SUBQUERY} AS o")


def test_select_diff_user(ctx):
    # RewriteDataMaskTest.java:112-160
    sql = "SELECT order_id, customer_name, product_id, region FROM orders"
    a = ctx.rewrite_data_mask("user_A", sql)
    b = ctx.rewrite_data_mask("user_B", sql)
    assert "CAST(mask(customer_name) AS STRING) AS customer_name" in a
    assert (
        "CAST(" + SHOW_FIRST_4.format(c="customer_name") +
        " AS STRING) AS customer_name"
    ) in b


def test_join(ctx):
    # RewriteDataMaskTest.java:163-214 — both tables wrapped, each masked
    out = ctx.rewrite_data_mask(
        "user_A",
        "SELECT orders.order_id, orders.customer_name, p.name FROM orders "
        "LEFT JOIN products AS p ON orders.product_id = p.id")
    assert f"FROM {MASKED_ORDERS_SUBQUERY} AS orders" in out
    assert (
        "(SELECT id, CAST(" + SHOW_LAST_4.format(c="name") +
        " AS STRING) AS name, description FROM products) AS p"
    ) in out
    assert out.endswith("ON orders.product_id = p.id")


def test_join_subquery(ctx):
    # RewriteDataMaskTest.java:217-287 — mask lands INSIDE the derived table
    out = ctx.rewrite_data_mask(
        "user_A",
        "SELECT o.order_id, o.customer_name FROM "
        "(SELECT order_id, customer_name, product_id FROM orders) AS o "
        "LEFT JOIN products AS p ON o.product_id = p.id")
    assert f"(SELECT o.order_id, o.customer_name, o.product_id FROM {MASKED_ORDERS_SUBQUERY} AS orders)".replace(
        "o.", "orders."
    ) in out
    # outer FROM wraps the rewritten derived table, not a double-masked one
    assert out.count("CAST(mask(customer_name) AS STRING)") == 1


def test_three_table_join_unmasked_passthrough(ctx):
    # RewriteDataMaskTest.java:290-356 — shipments (no policy) stays a bare ref
    out = ctx.rewrite_data_mask(
        "user_A",
        "SELECT o.order_id, p.name, s.is_arrived FROM orders AS o "
        "LEFT JOIN products AS p ON o.product_id = p.id "
        "LEFT JOIN shipments AS s ON o.order_id = s.order_id")
    assert "LEFT JOIN shipments AS s ON" in out
    assert out.count("(SELECT") == 2


def test_insert_select(ctx):
    # RewriteDataMaskTest.java:362-396
    out = ctx.rewrite_data_mask("user_A", "INSERT INTO print_sink SELECT * FROM orders")
    assert out == (
        "INSERT INTO print_sink SELECT orders.order_id, orders.order_date, "
        "orders.customer_name, orders.product_id, orders.price, "
        "orders.order_status, orders.region "
        f"FROM {MASKED_ORDERS_SUBQUERY} AS orders"
    )


def test_insert_select_nested(ctx):
    # RewriteDataMaskTest.java:399-436
    out = ctx.rewrite_data_mask(
        "user_A", "INSERT INTO print_sink SELECT * FROM (SELECT * FROM orders) AS o")
    assert out.count("CAST(mask(customer_name) AS STRING)") == 1
    assert f"FROM {MASKED_ORDERS_SUBQUERY} AS orders" in out


def test_reentry_guard_no_double_mask(ctx):
    # SecurityContext.java:67-90 / DataMaskVisitor.java:168-184 replacement:
    # generated subqueries must not be masked again
    out = ctx.rewrite_data_mask("user_A", "SELECT customer_name FROM orders")
    assert out.count("mask(") == 1


def test_mask_null_and_custom(demo_tables):
    ctx = SecurityContext(demo_tables, PolicyManager())
    ctx.add_policy(DataMaskPolicy("u", "orders", "customer_name", "MASK_NULL"))
    out = ctx.rewrite_data_mask("u", "SELECT customer_name FROM orders")
    assert "CAST(NULL AS STRING) AS customer_name" in out

    ctx2 = SecurityContext(demo_tables, PolicyManager())
    ctx2.add_policy(DataMaskPolicy(
        "u", "orders", "customer_name", "CUSTOM",
        custom_transformer="upper({col})"))
    out2 = ctx2.rewrite_data_mask("u", "SELECT customer_name FROM orders")
    assert "CAST(upper(customer_name) AS STRING) AS customer_name" in out2


def test_mask_none_is_identity(demo_tables):
    ctx = SecurityContext(demo_tables, PolicyManager())
    ctx.add_policy(DataMaskPolicy("u", "orders", "customer_name", "MASK_NONE"))
    out = ctx.rewrite_data_mask("u", "SELECT customer_name FROM orders")
    assert out == "SELECT orders.customer_name FROM orders AS orders"
