"""Driver-contract invariants for __spark_entry__ (cheap, no Spark jobs)."""

import __spark_entry__ as entry


def test_oracle_keys_subset_of_queries():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)
    # only the two approximate ANN paths are rows-only checked
    assert set(qs) - set(oracles) == {"emb_ann_pairs", "emb_ivf_topk"}


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
