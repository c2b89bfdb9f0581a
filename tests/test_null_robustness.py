"""NULL/empty-input parity sweep.

The curated fixtures carry no NULL or empty text, so cross-engine parity
under degenerate inputs is otherwise untested — and the review-driven
fixes (bloom NULL rows, snapshot-diff md5(NULL), rank_buckets NULL
ordering) showed exactly this class of latent contract bug. This sweep
runs representative operators over a table containing NULL, empty,
whitespace-only, and normal documents, on BOTH engines, and compares
sorted rows the way the driver does.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_sql_security_spark.functions import text as T
from flink_sql_security_spark.operators import dedup as D
from flink_sql_security_spark.operators import sketch as SK

ROWS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, None),
    (3, ""),
    (4, "   "),
    (5, "the quick brown fox jumps over the lazy dog"),  # dup of 1
    (6, "solo"),
]


@pytest.fixture(scope="module")
def both(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    df.createOrReplaceTempView("nulldocs")
    con = duckdb.connect()
    con.execute("CREATE TABLE nulldocs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO nulldocs VALUES (?, ?)", ROWS)
    return df, con


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in (r[c] for c in cols))
                  for r in df.collect())


def _duck(con, sql, cols):
    out = con.execute(sql).df()
    cols_sorted = sorted(out.columns)
    assert cols_sorted == sorted(cols)
    return sorted(tuple(str(v) for v in r)
                  for r in out[cols_sorted].itertuples(index=False, name=None))


def test_exact_dedup_groups_null_parity(both):
    df, con = both
    got = D.exact_dedup_groups(df)
    want = _duck(con, """
        SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                 AS dup_key,
               min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
        FROM nulldocs GROUP BY 1""", got.columns)
    assert _rows(got) == want
    # NULL texts collapse into the NULL-key group in both engines
    assert any(r[0] == "None" for r in _rows(got))


def test_jaccard_pairs_null_docs_never_pair(both):
    df, _ = both
    pairs = {(r["id_a"], r["id_b"])
             for r in D.ngram_jaccard_pairs(df, threshold=0.01).collect()}
    assert (1, 5) in pairs
    assert not any(2 in p or 3 in p or 4 in p for p in pairs)


def test_simhash_null_parity(both):
    df, con = both
    got = D.simhash(df)
    want = _duck(con, D.simhash_duckdb_sql("nulldocs"), got.columns)
    assert _rows(got) == want


def test_quality_and_langid_null_parity(both):
    df, con = both
    got = df.select(
        "doc_id",
        T.quality_score(F.col("text")).alias("q"),
        T.lang_id(F.col("text")).alias("lang"))
    want = _duck(con, f"""
        SELECT doc_id, {T.quality_score_sql('text')} AS q,
               {T.lang_id_sql('text')} AS lang FROM nulldocs""",
        got.columns)
    assert _rows(got) == want


def test_fingerprint_null_parity(both):
    df, con = both
    got = df.select("doc_id",
                    T.fingerprint(F.col("text")).alias("fp"))
    want = _duck(con, f"""
        SELECT doc_id, {T.fingerprint_sql('text')} AS fp FROM nulldocs""",
        got.columns)
    assert _rows(got) == want


def test_hll_sketch_null_parity(both):
    df, con = both
    got = SK.approx_distinct_hll(df, ["text"], with_exact=False)
    want = _duck(con, SK.approx_distinct_hll_duckdb_sql(
        "nulldocs", ["text"], with_exact=False), got.columns)
    assert _rows(got) == want


def test_cms_null_values_skipped_both_engines(both):
    df, con = both
    got = SK.cms_counters(df.select(F.col("text").alias("v")), "v",
                          width=64, depth=3)
    # DuckDB replica of the counter build over the same column
    h1 = "CAST(concat('0x', substring(md5(CAST(v AS VARCHAR)), 1, 15)) AS BIGINT) % 64"
    h2 = "CAST(concat('0x', substring(md5(CAST(v AS VARCHAR)), 16, 15)) AS BIGINT) % 64"
    want = _duck(con, f"""
        WITH vals AS (SELECT text AS v FROM nulldocs WHERE text IS NOT NULL),
        wh AS (SELECT v, {h1} AS _h1, {h2} AS _h2 FROM vals),
        cells AS (SELECT j, (_h1 + j * _h2) % 64 AS pos
                  FROM wh, range(3) t(j))
        SELECT j AS row_j, pos, CAST(count(*) AS BIGINT) AS cnt
        FROM cells GROUP BY 1, 2""", got.columns)
    assert _rows(got) == want
