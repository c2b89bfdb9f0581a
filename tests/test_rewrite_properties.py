"""Property tests for the rewrite pipeline.

1. Identity property: for a user with NO policies, parse→qualify→print must
   preserve semantics exactly — rewritten SQL returns the same rows as the
   original through plain spark.sql, across the whole query-shape corpus.
2. Round-trip stability under hypothesis-generated expression fuzz.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_sql_security_spark import PolicyManager, SecurityContext
from flink_sql_security_spark.plans import parse_expression, parse_statement

IDENTITY_CORPUS = [
    "SELECT order_id, customer_name FROM orders",
    "SELECT * FROM orders WHERE price > 20 AND region = 'beijing'",
    "SELECT o.region, count(*) AS cnt, sum(price) AS total FROM orders o "
    "GROUP BY o.region HAVING count(*) > 1 ORDER BY cnt DESC, o.region LIMIT 3",
    "SELECT o.order_id, p.name FROM orders o LEFT JOIN products p "
    "ON o.product_id = p.id WHERE p.name IS NOT NULL",
    "SELECT t.region, t.n FROM (SELECT region, count(*) AS n FROM orders "
    "GROUP BY region) t WHERE t.n > 1",
    "SELECT region FROM orders UNION SELECT origin AS region FROM shipments",
    "SELECT customer_name FROM orders WHERE product_id IN "
    "(SELECT id FROM products WHERE name = 'hammer')",
    "SELECT customer_name FROM orders o WHERE EXISTS "
    "(SELECT 1 AS x FROM shipments s WHERE s.order_id = o.order_id)",
    "WITH big AS (SELECT * FROM orders WHERE price > 40) "
    "SELECT customer_name, price FROM big",
    "SELECT order_id, row_number() OVER (PARTITION BY region "
    "ORDER BY price DESC) AS rn FROM orders",
    "SELECT CASE WHEN price > 50 THEN 'high' ELSE 'low' END AS bucket, "
    "count(*) AS cnt FROM orders GROUP BY "
    "CASE WHEN price > 50 THEN 'high' ELSE 'low' END",
    "SELECT upper(customer_name) AS cn, length(customer_name) AS l, "
    "price * 2 AS p2, CAST(price AS INT) AS pi FROM orders "
    "WHERE customer_name LIKE 'J%' OR customer_name RLIKE '^Ed'",
    "SELECT order_id FROM orders WHERE price BETWEEN 20 AND 60 "
    "AND region NOT IN ('shanghai') AND order_status = FALSE",
    "SELECT r, n FROM (SELECT region AS r, count(DISTINCT customer_name) AS n "
    "FROM orders GROUP BY region) x ORDER BY n DESC, r",
    "SELECT region FROM orders INTERSECT SELECT origin AS region FROM shipments",
    "SELECT region FROM orders EXCEPT SELECT destination AS region FROM shipments",
    "SELECT region, order_status, count(*) AS cnt FROM orders "
    "GROUP BY CUBE(region, order_status)",
    "SELECT o.order_id, o.price FROM orders AS o WHERE o.price = "
    "(SELECT max(o2.price) FROM orders AS o2 WHERE o2.region = o.region)",
    "SELECT order_id, get_json_object('{\"k\": 1}', '$.k') AS k FROM orders",
]


@pytest.fixture()
def ctx(demo_tables):
    return SecurityContext(demo_tables, PolicyManager())


@pytest.mark.parametrize("sql", IDENTITY_CORPUS)
def test_rewrite_identity_no_policies(ctx, sql):
    spark = ctx.spark
    original = {tuple(r) for r in spark.sql(sql).collect()}
    rewritten_sql = ctx.mixed_rewrite("nobody", sql)
    rewritten = {tuple(r) for r in spark.sql(rewritten_sql).collect()}
    assert rewritten == original


# -- hypothesis fuzz: printer/parser round-trip stability ------------------

_ident = st.sampled_from(["a", "b", "col1", "x_y", "t1"])
_lit = st.one_of(
    st.integers(min_value=0, max_value=10 ** 6).map(str),
    st.sampled_from(["'s'", "'it''s'", "TRUE", "FALSE", "NULL", "1.5", "0.25"]),
)
_cmp = st.sampled_from(["=", "<>", "<", "<=", ">", ">="])


@st.composite
def _predicate(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        left = draw(_ident)
        op = draw(_cmp)
        right = draw(_lit)
        return f"{left} {op} {right}"
    kind = draw(st.sampled_from(["and", "or", "not", "paren", "in", "between"]))
    if kind == "and":
        return f"{draw(_predicate(depth + 1))} AND {draw(_predicate(depth + 1))}"
    if kind == "or":
        return f"{draw(_predicate(depth + 1))} OR {draw(_predicate(depth + 1))}"
    if kind == "not":
        return f"NOT {draw(_predicate(depth + 1))}"
    if kind == "paren":
        return f"({draw(_predicate(depth + 1))})"
    if kind == "in":
        items = ", ".join(draw(st.lists(_lit, min_size=1, max_size=3)))
        return f"{draw(_ident)} IN ({items})"
    return f"{draw(_ident)} BETWEEN 1 AND 10"


@given(_predicate())
@settings(max_examples=200, deadline=None)
def test_expression_round_trip_stable(pred):
    once = parse_expression(pred).sql()
    twice = parse_expression(once).sql()
    assert once == twice


@given(_predicate(), _predicate())
@settings(max_examples=100, deadline=None)
def test_and_composition_preserves_structure(old, injected):
    """The A9 invariant under fuzz: AND-composition parses back to a
    conjunction whose right side is the injected condition."""
    from flink_sql_security_spark.plans import BinaryOp, and_

    combined = and_(parse_expression(old), parse_expression(injected))
    reparsed = parse_expression(combined.sql())
    assert isinstance(reparsed, BinaryOp) and reparsed.op.upper() == "AND"
    assert reparsed.right.sql() == parse_expression(injected).sql() or \
        combined.sql().endswith(parse_expression(injected).sql())


@given(st.sampled_from(IDENTITY_CORPUS))
@settings(max_examples=50, deadline=None)
def test_statement_round_trip_stable(sql):
    once = parse_statement(sql).sql()
    twice = parse_statement(once).sql()
    assert once == twice
