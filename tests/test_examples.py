"""The README walkthrough example (examples/reference_walkthrough.py)
must keep reproducing the reference's §4 案例讲解 (README.md:72-140):
same input SQL, same final-SQL shape per user, same visible rows."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from examples.reference_walkthrough import (
    INPUT_SQL, build_context, build_demo)


def test_reference_readme_walkthrough(spark):
    build_demo(spark)
    ctx = build_context(spark)

    # §4.2 user A: outer WHERE beijing, table wrapped in a mask subquery
    # re-emitting ALL columns with the CAST'ed mask
    a = ctx.mixed_rewrite("user_a", INPUT_SQL)
    assert a == (
        "SELECT orders.order_id, orders.customer_name, orders.product_id, "
        "orders.region FROM (SELECT order_id, order_date, "
        "CAST(mask(customer_name) AS STRING) AS customer_name, product_id, "
        "price, order_status, region FROM orders) AS orders "
        "WHERE orders.region = 'beijing'"), a
    rows_a = [(r["order_id"], r["customer_name"], r["region"])
              for r in ctx.mixed_execute("user_a", INPUT_SQL)]
    assert rows_a == [(10001, "Xxxx", "beijing"),
                      (10002, "Xxxxx", "beijing")]

    # §4.3 user B: hangzhou + show-first-4 (reference prints the Hive UDF
    # mask_show_first_n(col, 4, 'x','x','x', -1, '1'); here the same
    # semantics lower to Spark built-ins)
    b = ctx.mixed_rewrite("user_b", INPUT_SQL)
    assert "WHERE orders.region = 'hangzhou'" in b, b
    assert ("CAST(concat(substring(customer_name, 1, 4), "
            "mask(substring(customer_name, 5), 'x', 'x', 'x', NULL)) "
            "AS STRING) AS customer_name") in b, b
    rows_b = [(r["order_id"], r["customer_name"], r["region"])
              for r in ctx.mixed_execute("user_b", INPUT_SQL)]
    assert rows_b == [(10003, "Edwaxx", "hangzhou"),
                      (10004, "John", "hangzhou")]


def test_vector_search_walkthrough(spark):
    """The embedding-tier walkthrough runs end to end: index built once,
    batch search returns k rows per query, stream search bit-matches."""
    from examples.vector_search_walkthrough import run

    out = run(spark)
    assert out["n_indexed"] == 500
    assert len(out["batch"]) == 15          # 5 queries x k=3
    assert out["stream"] == out["batch"]
    # rerank: every query keeps exactly k=3 rows with ranks 1..3 (the
    # exact-distance ordering itself is asserted inside run(), and the
    # cross-engine value parity by the duckdb oracle tests)
    assert len(out["rerank"]) == 15
    assert len(out["opq"]) == 15            # rotated IVF-PQ, same contract
    per_q = {}
    for r in out["rerank"]:
        per_q.setdefault(r[0], set()).add(r[3])
    assert all(ranks == {1, 2, 3} for ranks in per_q.values())
    assert set(per_q) == {r[0] for r in out["batch"]}
    # filtered search keeps the per-query contract on the label slice
    # (membership asserted inside run()); PCA projects every vector
    assert len(out["filtered"]) == 15
    assert len(out["pca"]) == 500


def test_curation_pipeline_walkthrough(spark):
    """The curation composition runs end to end with deterministic,
    monotonically-narrowing stage counts."""
    from examples.curation_pipeline_walkthrough import run

    out = run(spark)
    assert out["n_raw"] == 500
    assert 0 < out["n_clean"] < out["n_raw"]          # gates removed docs
    assert 0 < out["n_mixed"] <= out["n_clean"]       # mixing subsampled
    # split partitions the whole corpus; train is the largest share
    assert sum(out["by_split"].values()) == out["n_raw"]
    assert out["by_split"]["train"] == max(out["by_split"].values())
    # packing covers exactly the mixed TRAIN selection (a strict subset
    # of the mixed set once val/test are held out)
    assert 0 < out["n_assigned"] <= out["n_mixed"]
    assert 0 < out["n_bins"] <= out["n_assigned"]
    # canonical picks: one keeper per cluster, members >= 2
    assert out["keep"] and all(r["n_members"] >= 2 for r in out["keep"])
    # indexed BM25 probes: each term set finds hits from the one index
    assert out["probes"] and all(n > 0 for n in out["probes"].values())
    # deterministic under re-run (content-hash arithmetic everywhere)
    again = run(spark)
    assert again["n_mixed"] == out["n_mixed"]
    assert again["n_bins"] == out["n_bins"]


def test_event_analytics_walkthrough(spark):
    """The event-analytics composition runs end to end: QA flags feed
    the funnel scan, the funnel has every depth, SCD2's current slice
    is bounded by the user count, the fill fraction is a real fraction,
    and the co-purchase graph has closed triangles and fewer
    communities than nodes."""
    from examples.event_analytics_walkthrough import run

    out = run(spark)
    assert out["n_flags"] > 0
    assert set(out["depths"]) <= {1, 2, 3} and 3 in out["depths"]
    assert out["curve"].get(0) == 1.0           # cohort week is active
    assert 0 < out["n_current"] < out["n_versions"]
    assert 0.0 < out["fill_frac"] < 1.0
    assert out["n_closed"] > 0
    assert 0 < out["n_comms"] < 200             # fewer communities than parts
    assert out["top_rule"]["lift"] > 1.0        # predictive, not noise
    assert out["n_reach"] > 3                   # seeds reached suppliers
    assert out["top_supplier"] > 1000000        # supplier-side id space
    assert out["z_extremes"] >= 0               # QA removed the blowups
