"""Driver-contract invariants for __spark_entry__ (cheap, no Spark jobs)."""

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query is hash-checked — no rows-only entries left
    assert set(qs) == set(oracles)


def test_contract_size_floor():
    # the inventory only grows; a shrink means an entry was lost by accident
    assert len(entry.queries()) >= 78
    assert len(entry.oracle_sql()) >= 76


def test_security_queries_parse():
    # every SecurityContext-routed SQL string must parse standalone
    from flink_sql_security_spark.plans.parser import parse_statement

    for name, (user, sql, oracle) in entry._QUERIES.items():
        ast = parse_statement(sql)
        assert ast.sql(), name


def test_check_order_is_prefix_and_covers_families():
    # the driver checks a finite prefix of queries() in dict order; the
    # declared window must lead the dict and span every operator family
    qs = list(entry.queries())
    assert qs[:len(entry._CHECK_ORDER)] == entry._CHECK_ORDER
    window = set(entry._CHECK_ORDER)
    for family in ("rls_", "mask_", "dedup_", "emb_", "text_", "multimodal_"):
        assert any(n.startswith(family) for n in window), family


def test_sampled_strict_type_parity(spark):
    """Spark results and DuckDB oracle results must be pandas-type-identical
    (the driver hashes stringified values: Decimal vs float, int64 vs
    HUGEINT-float64, and date vs datetime64 all mismatch). Full sweep lives
    in tools/check_oracles.py; this samples one query per output-type shape
    as a cheap regression net."""
    import duckdb

    from tools.check_oracles import _norm_frame

    sf_dir = "/root/testdata/sf0.001"
    sample = ["rls_groupby", "q1_pricing_summary", "q12_priority_case",
              "events_daily", "skew_salted_agg", "sessionize_events",
              "text_stats", "dedup_jaccard_pairs", "emb_cosine_topk",
              "text_tfidf_terms"]
    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    for name in sample:
        s_cols, s_rows = _norm_frame(qs[name](spark, sf_dir).toPandas())
        o_cols, o_rows = _norm_frame(con.execute(oracles[name]).df())
        assert s_cols == o_cols, name
        assert s_rows == o_rows, name
