"""As-of join semantics (operators/asof.py).

The reference has no temporal join (SURVEY.md §2.B: equi LEFT JOIN only);
this is part of the beyond-reference pipeline surface. Semantics pinned here:
backward match, inclusive at equal timestamps, inner vs left, tolerance
window, name-collision guard, and the single-shuffle physical plan.
"""

import datetime

import pytest
from pyspark.sql import Row

from flink_sql_security_spark.operators.asof import asof_join


def _t(s):
    return datetime.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            Row(sym="A", trade_ts=_t("2024-01-01 10:00:05"), px=1.0),
            Row(sym="A", trade_ts=_t("2024-01-01 10:00:10"), px=2.0),
            Row(sym="B", trade_ts=_t("2024-01-01 10:00:03"), px=3.0),
            Row(sym="C", trade_ts=_t("2024-01-01 10:00:01"), px=4.0),
        ]
    )
    quotes = spark.createDataFrame(
        [
            Row(sym="A", quote_ts=_t("2024-01-01 10:00:00"), bid=10),
            Row(sym="A", quote_ts=_t("2024-01-01 10:00:05"), bid=11),
            Row(sym="A", quote_ts=_t("2024-01-01 10:00:09"), bid=12),
            Row(sym="B", quote_ts=_t("2024-01-01 10:00:04"), bid=20),
        ]
    )
    return trades, quotes


def test_backward_match_inclusive_ties(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_ts="trade_ts",
                    right_ts="quote_ts", how="inner")
    got = {(r.sym, r.trade_ts): r.bid for r in out.collect()}
    assert got == {
        # equal ts (10:00:05) matches the 10:00:05 quote, not 10:00:00
        ("A", _t("2024-01-01 10:00:05")): 11,
        ("A", _t("2024-01-01 10:00:10")): 12,
        # B's only quote is *after* the trade → no match; C has no quotes
    }


def test_left_keeps_unmatched_with_nulls(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_ts="trade_ts",
                    right_ts="quote_ts", how="left")
    rows = {(r.sym, r.trade_ts): (r.bid, r.quote_ts) for r in out.collect()}
    assert len(rows) == 4
    assert rows[("B", _t("2024-01-01 10:00:03"))] == (None, None)
    assert rows[("C", _t("2024-01-01 10:00:01"))] == (None, None)
    assert rows[("A", _t("2024-01-01 10:00:10"))] == (12, _t("2024-01-01 10:00:09"))


def test_tolerance_drops_stale_matches(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_ts="trade_ts",
                    right_ts="quote_ts", how="inner", tolerance_seconds=1)
    got = {(r.sym, r.trade_ts): r.bid for r in out.collect()}
    # 10:00:10 trade's best quote is 10:00:09 (1s old → kept);
    # 10:00:05 matches the same-second quote (0s old → kept)
    assert got == {
        ("A", _t("2024-01-01 10:00:05")): 11,
        ("A", _t("2024-01-01 10:00:10")): 12,
    }
    out0 = asof_join(trades, quotes, on="sym", left_ts="trade_ts",
                     right_ts="quote_ts", how="inner", tolerance_seconds=0.5)
    assert {(r.sym, r.trade_ts): r.bid for r in out0.collect()} == {
        ("A", _t("2024-01-01 10:00:05")): 11,
    }


def test_column_collision_and_bad_how_raise(spark, trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes.withColumnRenamed("bid", "px"),
                  on="sym", left_ts="trade_ts", right_ts="quote_ts")
    with pytest.raises(ValueError, match="how"):
        asof_join(trades, quotes, on="sym", left_ts="trade_ts",
                  right_ts="quote_ts", how="outer")


def test_single_shuffle_plan(spark, trades_quotes):
    # the whole point of the union+window shape: exactly one Exchange, no
    # join node at all — per-key density never explodes the plan
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_ts="trade_ts",
                    right_ts="quote_ts", how="inner")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_multi_key_join(spark):
    left = spark.createDataFrame(
        [Row(k1="a", k2=1, lt=_t("2024-01-01 00:00:10"), v="L")])
    right = spark.createDataFrame(
        [
            Row(k1="a", k2=1, rt=_t("2024-01-01 00:00:05"), w="R1"),
            Row(k1="a", k2=2, rt=_t("2024-01-01 00:00:09"), w="R2"),
        ]
    )
    out = asof_join(left, right, on=["k1", "k2"], left_ts="lt",
                    right_ts="rt", how="inner").collect()
    assert [(r.w, r.rt) for r in out] == [("R1", _t("2024-01-01 00:00:05"))]
