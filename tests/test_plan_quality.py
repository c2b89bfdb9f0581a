"""Physical-plan quality gates — the 100 TB design invariants.

These assert the properties that make the security layer free at scale
(SURVEY §4): injected row filters reach the parquet scan (PushedFilters),
mask subqueries are column-pruned (ReadSchema), small masked dimensions
broadcast (no shuffle join), and no Python UDFs appear anywhere in a plan.
"""

import pytest

from flink_sql_security_spark import (
    DataMaskPolicy, PolicyManager, RowFilterPolicy, SecurityContext,
)
from flink_sql_security_spark.sources import register_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ctx(spark):
    register_tables(spark, SF_DIR)
    ctx = SecurityContext(spark, PolicyManager())
    ctx.add_policy(RowFilterPolicy("u", "orders", "o_orderpriority = '1-URGENT'"))
    ctx.add_policy(RowFilterPolicy("u", "customer", "c_mktsegment = 'BUILDING'"))
    ctx.add_policy(DataMaskPolicy("u", "customer", "c_name", "MASK_SHOW_FIRST_4"))
    return ctx


def explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def test_injected_filter_pushed_to_scan(ctx):
    plan = explain(ctx.sql("u", "SELECT o_orderkey FROM orders"))
    assert "PushedFilters" in plan
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan


def test_mask_subquery_column_pruned(ctx):
    # user selects 2 columns; the mask wrap re-emits all 5 — Catalyst must
    # prune the scan back down (selected cols + filter col only)
    plan = explain(ctx.sql("u", "SELECT c_custkey, c_name FROM customer"))
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "c_custkey" in read_schema and "c_name" in read_schema
    assert "c_acctbal" not in read_schema and "c_nationkey" not in read_schema


def test_masked_dimension_broadcasts(ctx):
    plan = explain(ctx.sql(
        "u",
        "SELECT o_orderkey, c_name FROM orders "
        "JOIN customer ON o_custkey = c_custkey"))
    assert "BroadcastHashJoin" in plan
    # the filter on the masked+filtered dim still reaches its scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_no_python_udfs_in_plans(ctx):
    # masks lower to JVM built-ins; Python must never appear on the data path
    for sql in (
        "SELECT c_name FROM customer",
        "SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey",
    ):
        plan = explain(ctx.sql("u", sql))
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_whole_stage_codegen_covers_mask(ctx):
    df = ctx.sql("u", "SELECT c_custkey, c_name FROM customer")
    codegen_plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple"))
    # the mask projection runs inside a WholeStageCodegen span: simple mode
    # marks codegen stages with '*(n)'
    assert "*(1) Project" in codegen_plan or "WholeStageCodegen" in codegen_plan


def test_dedup_single_shuffle(spark):
    from flink_sql_security_spark.operators.dedup import exact_dedup_groups
    register_tables(spark, SF_DIR)
    plan = explain(exact_dedup_groups(spark.table("documents")))
    # one exchange for the groupBy, none extra (count in the tree summary,
    # which lists every operator exactly once)
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1
    assert "partial_min" in plan  # map-side combine before the shuffle


def test_ann_no_cartesian_product(spark):
    from flink_sql_security_spark.operators.similarity import ann_candidate_pairs
    register_tables(spark, SF_DIR)
    plan = explain(ann_candidate_pairs(
        spark.table("embeddings"), bits=4, tables=2, threshold=0.4))
    # bucketed self-join must be a hash join on (table, bucket), never a
    # cartesian product
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_exact_dedup_single_shuffle(spark):
    from flink_sql_security_spark.operators.dedup import exact_dedup
    register_tables(spark, SF_DIR)
    df = exact_dedup(spark.table("documents"))
    # simple mode prints each physical node once — countable
    tree = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple"))
    # window idiom: exactly one Exchange (hash on dup_key), no join, and
    # WindowGroupLimit pushes the top-1-per-key partially to the map side
    assert tree.count("Exchange") == 1
    assert "Join" not in tree
    assert "WindowGroupLimit" in tree


def test_profile_is_one_aggregate_pass(spark):
    from flink_sql_security_spark.operators.profile import profile_numeric
    register_tables(spark, SF_DIR)
    df = profile_numeric(
        spark.table("lineitem"), ["l_quantity", "l_extendedprice"])
    tree = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple"))
    assert "Join" not in tree            # never one scan per column
    assert tree.count("FileScan parquet") == 1


def test_vocab_topk_avoids_global_sort(spark):
    from flink_sql_security_spark.functions.text import top_tokens
    register_tables(spark, SF_DIR)
    plan = explain(top_tokens(spark.table("documents"), k=10))
    # rank<=k over a single ordered window; no Python, no cartesian
    assert "PythonUDF" not in plan and "Cartesian" not in plan


def test_bucketed_join_is_exchange_free(spark):
    from flink_sql_security_spark.sources import write_bucketed
    register_tables(spark, SF_DIR)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    write_bucketed(spark.table("orders"), "b_orders", "o_custkey", 8)
    write_bucketed(spark.table("customer"), "b_customer", "c_custkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            spark.table("b_orders").o_custkey
            == spark.table("b_customer").c_custkey)
        plan = explain(joined)
        assert "Exchange" not in plan    # co-located: bucket layout trusted
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_hash_split_is_shuffle_free(spark):
    from flink_sql_security_spark.operators.sampling import hash_split
    register_tables(spark, SF_DIR)
    df = hash_split(spark.table("documents").select("doc_id"))
    tree = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple"))
    # pure narrow map: assignment must not exchange or aggregate
    assert "Exchange" not in tree
    assert "Join" not in tree


def test_per_key_quota_single_shuffle(spark):
    from flink_sql_security_spark.operators.sampling import per_key_quota
    register_tables(spark, SF_DIR)
    df = per_key_quota(spark.table("documents").select("doc_id", "source"),
                       "source", n=20)
    tree = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple"))
    # row_number window idiom: one hash exchange on the key, map-side top-n
    assert tree.count("Exchange") == 1
    assert "WindowGroupLimit" in tree


def test_q10_topk_no_global_sort(ctx):
    # q10 shape: ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-
    # partition top-N + driver merge), never a global Sort of the aggregate
    import __spark_entry__ as entry

    df = entry.queries()["q10_returned_items"](ctx.spark, SF_DIR)
    plan = explain(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_correlated_scalar_subquery_decorrelates(ctx):
    # Catalyst must rewrite the per-row scalar subquery into one aggregate
    # + equi-join — a nested-loop re-execution per outer row would be
    # quadratic at scale
    import __spark_entry__ as entry

    df = entry.queries()["corr_max_order"](ctx.spark, SF_DIR)
    plan = explain(df)
    assert "HashAggregate" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q19_disjunctive_filters_pushed(ctx):
    # the brand IN-set implied by the OR groups must reach the part scan
    import __spark_entry__ as entry

    df = entry.queries()["q19_disjunctive_join"](ctx.spark, SF_DIR)
    plan = explain(df)
    assert "PushedFilters" in plan
    assert "In(p_brand" in plan or "Or(EqualTo(p_brand" in plan


def test_secured_pipeline_pushes_source_gate_to_scan(spark):
    # security gate composed UNDER the corpus pipeline: the injected
    # source filter must reach the parquet scan before shingling
    from flink_sql_security_spark.operators.corpus import clean_corpus
    from flink_sql_security_spark.presets import USER_DOCS, demo_context

    register_tables(spark, SF_DIR)
    df = clean_corpus(demo_context(spark).table(USER_DOCS, "documents"),
                      materialize=False)
    plan = explain(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("src0" in l for l in pushed)


def test_partitioned_table_prunes_directories(spark):
    from flink_sql_security_spark.sources import write_partitioned
    register_tables(spark, SF_DIR)
    spark.sql("DROP TABLE IF EXISTS p_events")
    write_partitioned(spark.table("events"), "p_events", ["event_type"])
    try:
        plan = explain(spark.table("p_events").where("event_type = 'click'")
                       .select("event_id", "value"))
        # the literal predicate must land in PartitionFilters (directory
        # skipping), NOT in the data Filter/PushedFilters path
        pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
        assert "event_type" in pf
    finally:
        spark.sql("DROP TABLE IF EXISTS p_events")


def test_dynamic_partition_pruning_fires(spark):
    from flink_sql_security_spark.sources import write_partitioned
    register_tables(spark, SF_DIR)
    spark.sql("DROP TABLE IF EXISTS p_events2")
    write_partitioned(spark.table("events"), "p_events2", ["event_type"])
    try:
        dim = spark.createDataFrame(
            [("click", 1), ("view", 2), ("purchase", 3)],
            ["event_type", "priority"])
        dim.createOrReplaceTempView("event_dim")
        joined = spark.sql(
            "SELECT e.event_id, d.priority FROM p_events2 e "
            "JOIN event_dim d ON e.event_type = d.event_type "
            "WHERE d.priority = 1")
        plan = explain(joined)
        # the partition filter on the fact side must come from the dim at
        # runtime — scanning all partitions then joining would read the
        # whole fact table
        assert "dynamicpruning" in plan.lower()
    finally:
        spark.sql("DROP TABLE IF EXISTS p_events2")
        spark.catalog.dropTempView("event_dim")


def test_simhash_pairs_no_cartesian(spark):
    from flink_sql_security_spark.operators.dedup import simhash_hamming_pairs
    register_tables(spark, SF_DIR)
    plan = explain(simhash_hamming_pairs(spark.table("documents"),
                                         max_hamming=3))
    # banded LSH must equi-join on band values, never cross-join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q21_exists_decorrelates_to_semi_anti(ctx):
    # the EXISTS / NOT EXISTS pair must lower to LeftSemi + LeftAnti hash
    # joins on l_orderkey (one pass over lineitem each), never a per-row
    # nested-loop re-execution of the subquery
    import __spark_entry__ as entry

    df = entry.queries()["q21_waiting_supplier"](ctx.spark, SF_DIR)
    plan = explain(df)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q9_like_filter_and_broadcast_dims(ctx):
    # 5-table star join: every dimension broadcasts (lineitem never
    # shuffles for the join), and the LIKE gate reaches the part scan
    import __spark_entry__ as entry

    df = entry.queries()["q9_product_profit"](ctx.spark, SF_DIR)
    plan = explain(df)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    assert "StringContains" in plan or "Contains" in plan


def test_q2_correlated_max_decorrelates(ctx):
    # the per-part max-acctbal scalar subquery must become one grouped
    # aggregate joined back on (acctbal, partkey) — not a re-executed
    # subquery per outer row
    import __spark_entry__ as entry

    df = entry.queries()["q2_best_supplier"](ctx.spark, SF_DIR)
    plan = explain(df)
    assert "max(s_acctbal)" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q16_not_like_pushed_and_anti_join(ctx):
    # NOT LIKE 'PROMO%' must push as a StartsWith data filter; the NOT IN
    # lowers to a (null-aware) anti join against the small supplier side
    import __spark_entry__ as entry

    df = entry.queries()["q16_parts_suppliers"](ctx.spark, SF_DIR)
    plan = explain(df)
    assert "StartsWith" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_shingle_build_evaluates_split_once(ctx):
    # regression guard for the predicate-pushdown inlining trap: a filter
    # on a derived column below the exchange substitutes the column's
    # defining expression into the predicate, re-building the shingle
    # array per row. The optimized plan must evaluate the tokenizing
    # split a bounded number of times (the raw-text gate + the _ws
    # binding), never once-per-derived-reference.
    from flink_sql_security_spark.operators import dedup as D

    # a persisted shingle table from another test would render the plan as
    # an InMemoryRelation (with its full multi-section cached-plan text);
    # the gate is about the fresh plan
    ctx.spark.catalog.clearCache()
    docs = ctx.spark.table("documents")
    for df in (D.minhash_signatures_narrow(docs),
               D.hashed_shingle_sets(docs)):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("split(lower(trim(") <= 2, plan


def test_lang_and_quality_gate_single_split(ctx):
    # lang_id/quality_score are single bound-lambda expressions: even with
    # the gate predicate pushed into the scan, each evaluation carries
    # exactly one split — the per-feature Column composition this replaced
    # expanded to ~35 interpreted splits per row
    from flink_sql_security_spark.functions import text as T
    from pyspark.sql import functions as F

    docs = ctx.spark.table("documents")
    gated = (docs.select("doc_id",
                         T.lang_id(F.col("text")).alias("lang_pred"),
                         T.quality_score(F.col("text")).alias("quality"))
             .where((F.col("lang_pred") == "en") & (F.col("quality") >= 0.3)))
    plan = gated._jdf.queryExecution().optimizedPlan().toString()
    # one split inside each of: lang_pred projection, quality projection,
    # and their two pushed-down filter copies
    assert plan.count("split(lower(trim(") <= 4, plan


def test_similarity_blas_stages_emit_final_scores(ctx):
    # the cosine operators must not re-score candidates through joins: the
    # physical plan is scan -> mapInPandas (exact in-task scoring), with at
    # most the top-k window afterwards
    from flink_sql_security_spark.operators import similarity as S

    emb = ctx.spark.table("embeddings")
    pairs_plan = explain(S.cosine_pairs(emb, threshold=0.4))
    assert "Join" not in pairs_plan
    topk_plan = explain(S.cosine_topk(emb, emb.where("vec_id < 5"), k=3))
    assert "Join" not in topk_plan


def test_lm_score_bigram_build_split_bounded(ctx):
    # the bigram build binds the tokenizing split once per row (lambda
    # variable) and gates on raw text with explode_outer, so the optimized
    # plan carries at most 2 splits per toks subtree (gate + binding) × 3
    # consumers (bigram counts, context counts, probe) — the alias-bound
    # form inlined ~10 interpreted splits per row (measured 22s → 0.9s at
    # sf0.1 for the bigram build alone). +1 r11: the vocab-size V now
    # rides the plan as a 4th (aggregate-only) consumer of the unigram
    # subtree instead of a pre-plan driver collect — that collect ran
    # the SAME split in a separate job this assertion never saw, and
    # entry wall time dropped (2.16 → 1.57 s)
    from flink_sql_security_spark.functions import text as T

    docs = ctx.spark.table("documents")
    plan = T.lm_score(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(lower(trim(") <= 7, plan


def test_token_budget_sample_single_shuffle(spark):
    from flink_sql_security_spark.operators.sampling import token_budget_sample
    register_tables(spark, SF_DIR)
    df = token_budget_sample(spark.table("documents"), 800)
    tree = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple"))
    # running-sum window: exactly one hash exchange on the mix key
    assert tree.count("Exchange") == 1
    assert "Join" not in tree


def test_duplicate_span_stats_no_pairwise_join(spark):
    from flink_sql_security_spark.operators.dedup import duplicate_span_stats
    register_tables(spark, SF_DIR)
    df = duplicate_span_stats(spark.table("documents"), n=6)
    tree = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple"))
    # linear shape: equi-joins on span hash / doc id only — a cartesian or
    # broadcast-nested-loop would mean an accidental pairwise formulation
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_trim_duplicate_spans_no_token_level_join(spark):
    from flink_sql_security_spark.operators.dedup import trim_duplicate_spans
    register_tables(spark, SF_DIR)
    df = trim_duplicate_spans(spark.table("documents"), n=6)
    tree = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("simple"))
    # reconstruction must join covered-start ARRAYS per doc, never the
    # exploded token/span rows back onto themselves
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    # shuffle census (hash exchanges only — broadcasts of the tiny
    # dup-span / covered-starts sides are fine): span-df groupBy,
    # distinct, hit groupBy, id repartition — a token-level formulation
    # would blow well past this bound, and a global sort would show up
    # as a range partition
    assert tree.count("Exchange hashpartitioning") <= 6, tree
    assert "Exchange rangepartitioning" not in tree
    assert "Exchange SinglePartition" not in tree
