"""Mask-function library goldens, run through real spark.sql.

Parity targets: ``CommonTest.java:77-86`` (scalar goldens) and
``ExecuteDataMaskTest.java:71-102`` (masked-name goldens).
"""

import pytest

from flink_sql_security_spark.functions.masks import (
    instantiate_transformer, lower_hive_masks,
)
from flink_sql_security_spark.plans import parse_expression

S = "'hive-HDFS-8765-4321'"

SCALAR_GOLDENS = [
    # CommonTest.java:79-85 — Hive default chars X/x/n
    ("mask({col})", S, "xxxx-XXXX-nnnn-nnnn"),
    ("mask_first_n({col}, 4)", S, "xxxx-HDFS-8765-4321"),
    ("mask_last_n({col}, 4)", S, "hive-HDFS-8765-nnnn"),
    ("mask_show_first_n({col}, 4)", S, "hive-XXXX-nnnn-nnnn"),
    ("mask_show_last_n({col}, 4)", S, "xxxx-XXXX-nnnn-4321"),
    ("mask_hash({col})", "'flink'",
     "7f025323639628aa5e5d24bd56f43317552b140c71406d0eb5a555671bd534d2"),
    # policy-template variants (data_mask_types.json itemIds 2/3) +
    # ExecuteDataMaskTest.java:75-99
    ("mask_show_first_n({col}, 4, 'x', 'x', 'x', -1, '1')", "'Jack'", "Jack"),
    ("mask_show_first_n({col}, 4, 'x', 'x', 'x', -1, '1')", "'Sally'", "Sallx"),
    ("mask_show_first_n({col}, 4, 'x', 'x', 'x', -1, '1')", "'Edward'", "Edwaxx"),
    ("mask_show_first_n({col}, 4, 'x', 'x', 'x', -1, '1')", "'John'", "John"),
    ("mask({col})", "'Jack'", "Xxxx"),
    ("mask({col})", "'Sally'", "Xxxxx"),
    ("mask({col})", "'Edward'", "Xxxxxx"),
    ("mask({col})", "'John'", "Xxxx"),
    ("mask_show_last_n({col}, 4, 'x', 'x', 'x', -1, '1')", S, "xxxx-xxxx-xxxx-4321"),
]


@pytest.mark.parametrize("template,value,expected", SCALAR_GOLDENS)
def test_scalar_goldens(spark, template, value, expected):
    expr = instantiate_transformer(template, value)
    assert spark.sql(f"SELECT {expr.sql()} AS v").collect()[0][0] == expected


@pytest.mark.parametrize("template", [
    "mask({col})",
    "mask_show_first_n({col}, 4, 'x', 'x', 'x', -1, '1')",
    "mask_show_last_n({col}, 4, 'x', 'x', 'x', -1, '1')",
    "mask_hash({col})",
])
def test_null_propagates(spark, template):
    expr = instantiate_transformer(template, "CAST(NULL AS STRING)")
    assert spark.sql(f"SELECT {expr.sql()} AS v").collect()[0][0] is None


def test_empty_string(spark):
    expr = instantiate_transformer(
        "mask_show_first_n({col}, 4, 'x', 'x', 'x', -1, '1')", "''")
    assert spark.sql(f"SELECT {expr.sql()} AS v").collect()[0][0] == ""


def test_lowering_emits_only_spark_builtins():
    expr = instantiate_transformer(
        "mask_show_first_n({col}, 4, 'x', 'x', 'x', -1, '1')", "customer_name")
    sql = expr.sql()
    # no Hive-only function names survive the lowering
    for hive_fn in ("mask_show_first_n", "mask_show_last_n", "mask_first_n",
                    "mask_last_n", "mask_hash"):
        assert hive_fn not in sql
    assert sql.startswith("concat(substring(customer_name, 1, 4)")


def test_lowering_recurses_into_nested_expressions():
    e = parse_expression("CAST(mask(customer_name) AS STRING)")
    lowered = lower_hive_masks(e)
    assert lowered.sql() == "CAST(mask(customer_name) AS STRING)"
    e2 = parse_expression("upper(mask_hash(name))")
    assert lower_hive_masks(e2).sql() == "upper(sha2(name, 256))"


def test_date_show_year_template(spark):
    expr = instantiate_transformer(
        "mask({col}, 'x', 'x', 'x', -1, '1', 1, 0, -1)", "DATE '2020-07-30'")
    got = spark.sql(f"SELECT {expr.sql()} AS v").collect()[0][0]
    assert str(got) == "2020-01-01"
