"""Determinism under physical re-layout — the elasticity invariant.

SCALING.md principle 3: results must be identical under any partitioning
(speculative re-execution, preemptible nodes, AQE re-plans all reshuffle
work). Every pipeline operator here is re-run under a different shuffle
parallelism and a different input layout and must produce identical rows —
including floating-point values, which is why all hashing is md5-based and
all reductions are order-independent (min/count/exact-decimal sums) or
sequential-fold-reproduced (cosine paths).
"""

import pytest
from pyspark.sql import functions as F

from flink_sql_security_spark.operators import dedup as D
from flink_sql_security_spark.operators import similarity as S
from flink_sql_security_spark.sources import register_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    register_tables(spark, SF_DIR)
    return spark


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _with_partitions(spark, n, fn):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        return fn()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("op", [
    lambda s: D.exact_dedup_groups(s.table("documents")),
    lambda s: D.minhash_lsh_candidate_pairs(s.table("documents")),
    lambda s: D.lsh_verified_jaccard_pairs(s.table("documents"),
                                           threshold=0.05),
    lambda s: D.simhash(s.table("documents")),
    lambda s: D.simhash_hamming_pairs(s.table("documents"), max_hamming=8),
    lambda s: D.connected_components(
        D.ngram_jaccard_pairs(s.table("documents"), threshold=0.05)),
    lambda s: S.cosine_pairs(s.table("embeddings"), threshold=0.4),
    lambda s: S.cosine_topk(s.table("embeddings"),
                            s.table("embeddings").where("vec_id < 5"), k=3),
    lambda s: S.ann_candidate_pairs(s.table("embeddings"), bits=4, tables=8,
                                    threshold=0.4),
    # round-9 additions: the event/graph analytics tier
    lambda s: __import__("flink_sql_security_spark.operators.graph",
                         fromlist=["x"]).triangle_count(
        s.table("lineitem").selectExpr("l_orderkey % 97 AS src",
                                       "l_partkey % 89 AS dst")),
    lambda s: __import__("flink_sql_security_spark.operators.graph",
                         fromlist=["x"]).label_propagation(
        s.table("lineitem").selectExpr("l_orderkey % 97 AS src",
                                       "l_partkey % 89 AS dst"), iters=2),
    lambda s: __import__("flink_sql_security_spark.operators.timeseries",
                         fromlist=["x"]).resample_ffill(
        s.table("events").where("event_type = 'purchase'")),
    lambda s: __import__("flink_sql_security_spark.operators.timeseries",
                         fromlist=["x"]).retention_cohorts(
        s.table("events").where("value > 100")),
    lambda s: __import__("flink_sql_security_spark.operators.profile",
                         fromlist=["x"]).robust_outliers(
        s.table("events"), value_col="value", group_cols=["event_type"],
        id_cols=["event_id"], k=2.0),
    lambda s: __import__("flink_sql_security_spark.operators.similarity",
                         fromlist=["x"]).matryoshka_topk(
        s.table("embeddings"), s.table("embeddings").where("vec_id < 5"),
        prefix_dims=16, shortlist=4, k=3),
    lambda s: __import__("flink_sql_security_spark.operators.dedup",
                         fromlist=["x"]).containment_pairs(
        s.table("documents"), threshold=0.5),
    lambda s: __import__("flink_sql_security_spark.operators.funnel",
                         fromlist=["x"]).funnel(
        s.table("events"), ["view", "click", "purchase"], within_hours=72),
    lambda s: __import__("flink_sql_security_spark.operators.cdc",
                         fromlist=["x"]).scd2_history(
        s.table("events"), ["user_id"], "ts", ["value"],
        op_col="event_type", delete_op="error", tiebreak_cols=["event_id"]),
    lambda s: __import__("flink_sql_security_spark.operators.assoc",
                         fromlist=["x"]).basket_rules(
        s.table("lineitem"), basket_col="l_orderkey",
        item_col="l_partkey", min_support=2),
    lambda s: __import__("flink_sql_security_spark.operators.graph",
                         fromlist=["x"]).bfs_levels(
        s.table("lineitem").selectExpr("l_orderkey % 97 AS src",
                                       "l_partkey % 89 AS dst"),
        [0, 1], max_hops=2),
    lambda s: __import__("flink_sql_security_spark.operators.graph",
                         fromlist=["x"]).pagerank(
        s.table("lineitem").selectExpr("l_orderkey % 97 AS src",
                                       "l_partkey % 89 AS dst",
                                       "l_linenumber AS w"),
        iters=2, weight_col="w"),
    # r10: the forced star-contraction distributed path (windowed
    # per-neighborhood mins must be layout-invariant)
    lambda s: __import__("flink_sql_security_spark.operators.dedup",
                         fromlist=["x"]).connected_components(
        s.table("lineitem").selectExpr("l_orderkey % 97 AS id_a",
                                       "l_partkey % 89 AS id_b"),
        driver_threshold=0),
    # r10: 2→1 association rules (frequent-pair-seeded triple counts)
    lambda s: __import__("flink_sql_security_spark.operators.assoc",
                         fromlist=["x"]).basket_rules_2to1(
        s.table("lineitem"), basket_col="l_orderkey",
        item_col="l_suppkey", min_support=3),
    # r10: Debezium decode + compaction over in-query envelope JSON
    lambda s: __import__("flink_sql_security_spark.sources.debezium",
                         fromlist=["x"]).debezium_state(
        s.table("orders").selectExpr(
            "concat('{\"before\":null,\"after\":{\"k\":', o_orderkey, "
            "',\"v\":\"', o_orderstatus, '\"},\"op\":\"c\",\"ts_ms\":', "
            "o_orderkey % 7, '}') AS value"),
        row_ddl="k BIGINT, v STRING", key_cols=["k"]),
], ids=["exact_groups", "minhash_pairs", "lsh_verified", "simhash",
        "simhash_pairs", "components", "cosine_pairs", "cosine_topk",
        "ann_pairs",
        "triangles", "lpa", "gapfill", "retention", "outliers",
        "matryoshka", "containment", "funnel", "scd2",
        "basket_rules", "bfs", "weighted_pr",
        "components_star", "basket_2to1", "debezium_state"])
def test_identical_under_relayout(tables, op):
    spark = tables
    base = _rows(op(spark))
    assert base, "operator returned no rows — fixture mismatch"
    # different shuffle parallelism
    alt = _with_partitions(spark, 7, lambda: _rows(op(spark)))
    assert alt == base
    # different input layout: pre-scrambled source partitioning
    for t in ("documents", "embeddings"):
        spark.table(t).repartition(13).createOrReplaceTempView(t)
    try:
        scrambled = _rows(op(spark))
    finally:
        register_tables(spark, SF_DIR)
    assert scrambled == base
