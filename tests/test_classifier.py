"""Ridge linear probe (operators/classifier.py): cross-engine parity,
partitioning-independence, solve correctness, input validation."""

import duckdb
import pytest

from flink_sql_security_spark.operators import classifier as C

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{EMB}')")
    yield c
    c.close()


def test_gram_cross_engine_exact(emb, con):
    got = sorted((r["j"], r["k"], int(r["qsum"]))
                 for r in C.gram_partials(emb).collect())
    want = sorted((j, k, int(q))
                  for j, k, q in con.execute(C.gram_duckdb_sql()).fetchall())
    assert got == want
    # 65 augmented dims: 65 y-rows + 65*66/2 upper-triangle rows
    assert len(got) == 65 + 65 * 66 // 2


def test_gram_partitioning_independent(emb):
    a = sorted(map(tuple, C.gram_partials(emb).collect()))
    b = sorted(map(tuple, C.gram_partials(emb.repartition(13)).collect()))
    assert a == b


def test_fit_matches_emitter_replica(emb):
    assert C.ridge_fit(emb) == C.probe_weights_from_parquet(EMB)


def test_probe_cross_engine_exact(emb, con):
    got = sorted(map(tuple, C.linear_probe(
        emb, positive=0, threshold=0.2).collect()))
    want = sorted(map(tuple, con.execute(C.linear_probe_duckdb_sql(
        EMB, positive=0, threshold=0.2)).fetchall()))
    assert got == want and len(got) == 500
    preds = {p for _, _, p in got}
    assert preds == {0, 1}        # threshold exercises both branches


def test_probe_has_signal(emb, con):
    """The filter's real contract: among documents the probe keeps
    (pred=1), the true-positive rate must beat the base rate by a wide
    margin — precision lift, the metric that matters for an imbalanced
    quality gate (AUC ≈ 0.82 on this corpus)."""
    pred = {r["vec_id"]: r["pred"] for r in C.linear_probe(
        emb, positive=0, threshold=0.2).collect()}
    rows = con.execute(
        f"SELECT vec_id, label FROM read_parquet('{EMB}')").fetchall()
    y = {v: int(lab == 0) for v, lab in rows}
    kept = [v for v in y if pred[v] == 1]
    assert kept
    precision = sum(y[v] for v in kept) / len(kept)
    prior = sum(y.values()) / len(y)
    assert precision > 2 * prior, (precision, prior)


def test_solve_known_system():
    # x + 2y = 5, 3x + 4y = 11  ->  x=1, y=2
    w = C._solve([[1.0, 2.0], [3.0, 4.0]], [5.0, 11.0])
    assert w == pytest.approx([1.0, 2.0], abs=1e-12)


def test_solve_singular_raises():
    with pytest.raises(ValueError, match="singular"):
        C._solve([[1.0, 2.0], [2.0, 4.0]], [1.0, 2.0])


def test_fit_rejects_bad_vectors(spark):
    bad = spark.createDataFrame(
        [(0, [1.0, 2.0], 0), (1, None, 1)],
        "vec_id long, embedding array<float>, label int")
    with pytest.raises(Exception, match="bad vector"):
        C.ridge_fit(bad, d=2)


def test_score_plan_is_narrow(emb):
    """Scoring is a pure projection: no exchange, no Python node."""
    w = C.probe_weights_from_parquet(EMB)
    plan = (C.linear_score(emb, w)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_fuzz_probe_configs_cross_engine(spark, emb, con):
    """Config fuzz for the probe: random (positive, l2, threshold)
    draws, each verified value-exact end to end (fit + score)."""
    import random

    rng = random.Random(73737)
    for trial in range(3):
        positive = rng.randint(0, 9)
        l2 = rng.choice([1e-4, 1e-3, 1e-2, 1.0])
        threshold = rng.choice([0.1, 0.15, 0.2, 0.3])
        got = sorted(map(tuple, C.linear_probe(
            emb, positive=positive, l2=l2,
            threshold=threshold).collect()))
        want = sorted(map(tuple, con.execute(C.linear_probe_duckdb_sql(
            EMB, positive=positive, l2=l2,
            threshold=threshold)).fetchall()))
        assert got == want and len(got) == 500, (trial, positive, l2,
                                                 threshold)


def test_gram_large_magnitude_exact_and_overflow_guard(spark):
    """Review fix: |x| ~ 100 vectors (legal input) must produce EXACT
    sums — the in-batch accumulation chunks itself below int64 range —
    and magnitudes that would wrap a single term must raise loudly."""
    import duckdb

    rows = [(i, [float((i * 13 + j * 7) % 201 - 100) for j in range(4)],
             i % 2) for i in range(50)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = sorted((r["j"], r["k"], int(r["qsum"]))
                 for r in C.gram_partials(df, positive=0, d=4).collect())
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, [{', '.join(repr(v) for v in vec)}], {lab})"
        for i, vec, lab in rows)
    con.execute("CREATE VIEW g AS SELECT * FROM (VALUES " + vals +
                ") AS t(vec_id, embedding, label)")
    want = sorted((j, k, int(q)) for j, k, q in con.execute(
        C.gram_duckdb_sql(d=4, table="g", positive=0)).fetchall())
    con.close()
    assert got == want

    huge = spark.createDataFrame(
        [(0, [1.0e4] * 4, 0)], "vec_id long, embedding array<float>, label int")
    with pytest.raises(Exception, match="overflows the integer quantum"):
        C.ridge_fit(huge, d=4)


def test_pred_consistent_with_published_score(emb):
    """Review fix: pred must gate on the ROUNDED score the row
    publishes — re-deriving the gate from the score column can never
    disagree with pred."""
    for r in C.linear_probe(emb, positive=0, threshold=0.2).collect():
        assert r["pred"] == (1 if r["score"] >= 0.2 else 0), r
