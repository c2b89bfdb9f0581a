"""Parser/printer/qualify unit tests for the plans/ SQL IR layer."""

import pytest

from flink_sql_security_spark.plans import (
    BinaryOp, Identifier, Insert, Literal, Select, SqlParseError, and_,
    parse_expression, parse_statement, qualify,
)

SCHEMAS = {
    "orders": [
        ("order_id", "INT"), ("order_date", "TIMESTAMP"),
        ("customer_name", "STRING"), ("product_id", "INT"),
        ("price", "DECIMAL(10,5)"), ("order_status", "BOOLEAN"),
        ("region", "STRING"),
    ],
    "products": [("id", "INT"), ("name", "STRING"), ("description", "STRING")],
    "shipments": [
        ("shipment_id", "INT"), ("order_id", "INT"), ("origin", "STRING"),
        ("destination", "STRING"), ("is_arrived", "BOOLEAN"),
    ],
}


def schema_provider(parts):
    return SCHEMAS.get(parts[-1].lower())


ROUND_TRIP_CASES = [
    "SELECT order_id, customer_name, product_id, region FROM orders",
    "SELECT o.order_id, p.name FROM orders AS o LEFT JOIN products AS p ON o.product_id = p.id WHERE o.price > 45.0",
    "SELECT * FROM orders WHERE price > 45.0 OR customer_name = 'John'",
    "SELECT customer_name, count(*) AS cnt FROM orders GROUP BY customer_name HAVING count(*) > 1 ORDER BY cnt DESC LIMIT 5",
    "INSERT INTO print_sink SELECT * FROM orders",
    "INSERT INTO t (a, b) SELECT a, b FROM s",
    "SELECT * FROM (SELECT order_id, region FROM orders) AS o JOIN products AS p ON o.order_id = p.id",
    "SELECT CAST(mask(customer_name) AS STRING) AS customer_name FROM orders",
    "WITH x AS (SELECT 1 AS a) SELECT a FROM x",
    "SELECT a FROM t UNION ALL SELECT b FROM u ORDER BY a LIMIT 3",
    "SELECT aggregate(v, 0D, (acc, x) -> acc + x) AS dot FROM e",
    "SELECT x FROM t WHERE a IS NOT NULL AND b NOT IN (1, 2) AND c BETWEEN 1 AND 5 AND d LIKE 'a%'",
    "SELECT t.*, arr[0] AS first, DATE '2020-01-01' AS d, INTERVAL '3' DAY AS iv FROM t",
    "SELECT a FROM t WHERE ts > now() - INTERVAL 3 DAYS",
    "SELECT r_name, count(DISTINCT n_nationkey) AS c FROM region AS r CROSS JOIN nation AS n GROUP BY ROLLUP(r_name)",
    "SELECT word FROM docs LATERAL VIEW explode(split(text, ' ')) w AS word",
    "SELECT sum(b) OVER (PARTITION BY g ORDER BY ts ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM t",
    "SELECT a FROM t LEFT SEMI JOIN u ON t.k = u.k",
    "SELECT a FROM t LEFT ANTI JOIN u USING (k)",
    "SELECT CASE WHEN a > 1 THEN 'x' ELSE 'y' END AS c FROM t",
    # GROUPING SETS must survive printing (regression: the raw-text modifier
    # was dropped when group_by was empty, silently un-grouping the query)
    "SELECT a, b, count(*) AS cnt FROM t GROUP BY GROUPING SETS ((a), (b), ())",
]


@pytest.mark.parametrize("sql", ROUND_TRIP_CASES)
def test_round_trip_stable(sql):
    once = parse_statement(sql).sql()
    twice = parse_statement(once).sql()
    assert once == twice


def test_single_statement_guard():
    # mirrors the reference's single-statement precondition
    # (ParserImplExtension.java:74)
    with pytest.raises(SqlParseError):
        parse_statement("SELECT 1 FROM t; SELECT 2 FROM t")


def test_or_parenthesized_under_and():
    # RowFilterVisitor.buildWhereClause parenthesization golden
    # (RewriteRowFilterTest.java:129-154)
    old = parse_expression("price > 45.0 OR customer_name = 'John'")
    cond = parse_expression("region = 'beijing'")
    assert and_(old, cond).sql() == \
        "(price > 45.0 OR customer_name = 'John') AND region = 'beijing'"


def test_and_not_double_parenthesized():
    old = parse_expression("price > 45.0 AND order_status = FALSE")
    cond = parse_expression("region = 'beijing'")
    assert and_(old, cond).sql() == \
        "price > 45.0 AND order_status = FALSE AND region = 'beijing'"


def test_qualify_star_expansion():
    ast = qualify(parse_statement("SELECT * FROM orders"), schema_provider)
    assert ast.sql() == (
        "SELECT orders.order_id, orders.order_date, orders.customer_name, "
        "orders.product_id, orders.price, orders.order_status, orders.region "
        "FROM orders AS orders"
    )


def test_qualify_join_columns():
    ast = qualify(parse_statement(
        "SELECT order_id, name FROM orders LEFT JOIN products ON product_id = id"
    ), schema_provider)
    assert ast.sql() == (
        "SELECT orders.order_id, products.name FROM orders AS orders "
        "LEFT JOIN products AS products ON orders.product_id = products.id"
    )


def test_qualify_subquery_scope():
    ast = qualify(parse_statement(
        "SELECT s.* FROM (SELECT order_id, region FROM orders) s"
    ), schema_provider)
    assert ast.sql() == (
        "SELECT s.order_id, s.region FROM "
        "(SELECT orders.order_id, orders.region FROM orders AS orders) AS s"
    )


def test_qualify_cte():
    ast = qualify(parse_statement(
        "WITH t AS (SELECT order_id AS oid, region FROM orders) "
        "SELECT oid FROM t WHERE region = 'beijing'"
    ), schema_provider)
    assert "SELECT t.oid FROM t AS t WHERE t.region = 'beijing'" in ast.sql()


def test_qualify_preserves_projection_alias_in_order_by():
    ast = qualify(parse_statement(
        "SELECT customer_name, count(*) AS cnt FROM orders "
        "GROUP BY customer_name ORDER BY cnt DESC"
    ), schema_provider)
    assert ast.sql().endswith("ORDER BY cnt DESC")


def test_insert_parse_shape():
    ast = parse_statement("INSERT INTO print_sink SELECT * FROM orders")
    assert isinstance(ast, Insert)
    assert ast.table == ["print_sink"]
    assert isinstance(ast.query, Select)


def test_expression_types():
    e = parse_expression("region = 'beijing'")
    assert isinstance(e, BinaryOp)
    assert isinstance(e.left, Identifier)
    assert isinstance(e.right, Literal)


def test_string_escape_round_trip():
    e = parse_expression("name = 'O''Brien'")
    assert e.sql() == "name = 'O''Brien'"
    assert parse_expression(e.sql()).sql() == e.sql()


def test_backtick_identifier():
    e = parse_expression("`weird col` > 1")
    assert e.sql() == "`weird col` > 1"


def test_policy_condition_injection_rejected():
    """A hostile policy condition cannot smuggle a second statement or
    non-expression SQL through the rewriter into the engine."""
    for evil in (
        "region = 'beijing'; DROP TABLE orders",
        "region = 'beijing') UNION ALL (SELECT * FROM secrets",
        "1 = 1; --",
    ):
        with pytest.raises(SqlParseError):
            parse_expression(evil)


def test_unterminated_literals_rejected():
    for bad in ("SELECT 'abc FROM t", "SELECT `col FROM t", "SELECT \"x"):
        with pytest.raises(SqlParseError):
            parse_statement(bad)


def test_unicode_identifiers_roundtrip():
    sql = "SELECT `名前`, 金額 FROM `テーブル` WHERE 名前 = 'ユーザー'"
    out = parse_statement(sql).sql()
    assert "名前" in out and "ユーザー" in out
    # stable under re-parse
    assert parse_statement(out).sql() == out


def test_deep_subquery_nesting():
    """60 levels of derived tables parse, qualify, and print without
    recursion blow-up (the parser is recursive-descent; this bounds its
    practical depth headroom far above real queries)."""
    sql = "SELECT a FROM t"
    for _ in range(60):
        sql = f"SELECT a FROM ({sql}) x"
    out = parse_statement(sql).sql()
    assert out.count("(") == 60
