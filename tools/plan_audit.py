"""Physical-plan health audit over the whole driver query corpus.

For every ``__spark_entry__.queries()`` entry, inspects the executed plan
and reports the properties that decide 100 TB behavior:

- ``exchanges``: shuffle count (the dominant cost driver at scale)
- ``pushed``: a parquet scan carries ``PushedFilters`` (predicate reached
  storage) — reported when the plan filters at all
- ``codegen``: number of WholeStageCodegen spans (JVM-compiled stages)
- ``python``: Arrow/Python evaluation nodes (expected ONLY for the
  documented Pandas-UDF operators: multimodal, ANN scoring)
- ``cartesian``: CartesianProduct / unguarded BroadcastNestedLoopJoin
  (expected ONLY for the zorder bounds broadcast and scalar-subquery
  broadcasts — tiny sides by construction)

Usage: python tools/plan_audit.py [--write PLAN_AUDIT.md] [query ...]

The per-query WHITELIST below documents every deliberate exception; an
unlisted cartesian or Python node fails the audit (exit 1), so this
doubles as a regression gate wider than the targeted plan tests.
"""

from __future__ import annotations

import os
import re
import sys

# Python-eval nodes are the slow path; these entries use them by design
# (Arrow-batched numpy kernels documented in SCALING.md).
PYTHON_OK = {
    "multimodal_features", "multimodal_resize_plan", "multimodal_frame_plan",
    "emb_cosine_pairs", "emb_semantic_dedup", "emb_cosine_topk",
    # filtered search: the SAME cosine_topk query-side kernel — the
    # predicate prunes the corpus scan before it (pure JVM filter).
    "emb_filtered_topk",
    "emb_ann_pairs", "emb_ivf_topk", "emb_kmeans_cells", "emb_quantize_int8",
    # PQ top-k: per-query ADC LUTs build in ONE mapInPandas over the
    # query table (round-5: replaced the driver toPandas loop) — an
    # Arrow kernel on the small side, never on the corpus scan. The
    # rerank composition inherits the same stage-1 kernel; its stage 2
    # is pure JVM expression work.
    "emb_pq_topk", "emb_ivfpq_topk", "emb_ivfpq_rerank",
    # PQ encode (round-5c): ONE Arrow kernel over the corpus — the
    # sequential-fold distances bit-exactly in batched numpy, ~8×
    # faster than the interpreted JVM folds; impl="expr" remains the
    # zero-Python fallback (pytest-pinned interchangeable).
    "emb_pq_codes", "emb_pq_reconstruct",
    # MMR: stage 1 is cosine_topk's documented query-side kernel; stage
    # 2 is ONE applyInPandas greedy per query group over the R-row
    # shortlist (O(R·k) dots) — shortlist cost, never the corpus.
    "retrieval_mmr_topk",
    # IVF-binary: ONE mapInPandas over the QUERY table (probe cells +
    # code words — the PQ tier's query-pass pattern); the corpus scan
    # itself is pure JVM xor/bit_count.
    "emb_binary_ivf_topk",
    # OPQ: pq_topk's documented query-side LUT kernel over the ROTATED
    # query table; the rotation itself is a pure JVM projection.
    "emb_opq_topk", "emb_opq_ivf_topk",
    # RRF hybrid: the semantic arm is cosine_topk's documented
    # query-side kernel; the fusion itself (union + hash agg + window
    # over two top-k SHORTLISTS) is pure JVM.
    "retrieval_rrf_hybrid",
    # grouped RRF: same cosine-arm kernel per query batch.
    "retrieval_rrf_grouped",
    # Matryoshka: stage 1 is cosine_topk's documented query-side kernel
    # over the PREFIX slices (half the vector bytes); stage 2 rerank is
    # pure JVM expression work (the shared _exact_rerank refine).
    "emb_matryoshka_topk",
    # rp/pca projection (r11 opt continued): ONE mapInPandas Arrow
    # kernel over the spread corpus — the 16×64 left-associated folds
    # bit-exactly in sequential numpy column ops with the coefficient
    # matrix on a broadcast instead of 1024 plan literals;
    # impl="expr" remains the zero-Python path (pytest-pinned
    # interchangeable, test_projection_arrow_expr_interchangeable).
    "emb_rp_project", "emb_pca_project",
    # exact-percentile bracket pick (r11 opt continued): ONE streaming
    # mapInPandas pass over the range-partitioned, partition-sorted
    # histogram CACHE — carries the per-column running index across
    # Arrow batches (O(batch) memory) and emits only the ≤ 2·|ps|
    # bracketing rows per column; replaces the window whose
    # (_pid, column) clustering requirement re-shuffled the whole
    # histogram. Interpolation math stays in JVM expressions.
    "profile_quantiles",
}
# Nested-loop broadcasts of provably tiny sides (bounds rows, scalar
# subquery results). The big side is never shuffled by these.
NLJ_OK = {
    # HITS: the per-half-step L1 normalization cross-joins a 1-ROW
    # quantized total into the |V|-row score rebuild (same shape as
    # pagerank's redistribute dq) — tiny side by construction.
    "graph_hits",
    # t-closeness: the 1-ROW table total crossJoins into the
    # class-value table (|classes·values| rows) before the TVD agg —
    # the HITS/pagerank scalar-total shape, tiny side by construction.
    "privacy_t_closeness",
    "zorder_orders", "q11_important_parts", "q22_global_sales",
    "q15_top_supplier", "q17_small_qty_revenue", "sample_token_budget",
    "emb_kmeans_cells", "emb_quantize_int8", "dedup_span_stats",
    "dedup_span_trim", "secured_clean_corpus", "pipeline_clean_corpus",
    # DSIR: the two 1-row total-token aggregates (t_total/q_total over the
    # ≤B-row bucket tables) broadcast onto the ≤B-row log-ratio build —
    # the corpus-side profile never rides through these joins.
    "sample_dsir_weights",
    # histogram sketch: the 1-row min/max bounds agg broadcasts onto the
    # scan (the zorder bounds pattern) — the grid needs the range.
    "sketch_hist_quantiles",
    # PQ ADC: the Q-row per-query lookup-table side broadcasts onto the
    # code table (ADC IS an n×Q scan by design — the LUT rows are tiny
    # and the corpus side never shuffles).
    "emb_pq_topk",
    # binary hamming scan: the Q-row query CODE WORDS (3 ints per row)
    # broadcast onto the corpus codes — the prefilter IS an n×Q integer
    # scan by design; the corpus side never shuffles and the rerank
    # stage joins only the k·R shortlist.
    "emb_binary_topk",
    # OPQ ADC: same n×Q LUT-broadcast contract as emb_pq_topk, over the
    # rotated code table.
    "emb_opq_topk",
    # grouped RRF: its hamming ARM is emb_binary_topk's documented n×Q
    # broadcast code-word scan; the fusion stage itself never joins
    # the corpus.
    "retrieval_rrf_grouped",
    # basket rules (r11 opt Changes 2/pushed-filter): the 1-ROW basket
    # total `nb` crossJoins into the support/confidence projection
    # (assoc.py:187,324,497) — the former driver-side count() became
    # this in-plan scalar, the HITS/pagerank shape; tiny side by
    # construction.
    "basket_rules", "basket_rules_2to1", "basket_rules_3to1",
    # lm_score (r11 opt Change 5): the 1-ROW vocabulary-size aggregate
    # crossJoins into the scoring plan (functions/text.py:791) — the
    # exact CROSS JOIN the DuckDB oracle always used; tiny side by
    # construction. quality_curriculum composes lm_score.
    "text_lm_score", "sample_quality_curriculum",
}


def audit(spark, name, df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    # count DISTINCT exchange nodes (by plan_id): a persisted subtree's
    # plan prints once under InMemoryRelation and again per consumer, and
    # reused exchanges repeat textually — but each executes once. Nodes
    # without a plan_id (older print forms) fall back to text identity.
    ex_re = re.compile(
        r"Exchange (?:hashpartitioning|rangepartitioning|"
        r"RoundRobinPartitioning|SinglePartition)")
    pid_re = re.compile(r"\[plan_id=(\d+)\]")
    seen, n_anon = set(), 0
    for line in plan.splitlines():
        if not ex_re.search(line):
            continue
        m = pid_re.search(line)
        if m:
            seen.add(m.group(1))
        else:
            n_anon += 1
    n_ex = len(seen) + n_anon
    has_scan = "Scan parquet" in plan or "FileScan parquet" in plan
    pushed = "PushedFilters: [" in plan and not re.search(
        r"PushedFilters: \[\]", plan)
    # codegen spans print as "*(n) Operator" in the simple plan string
    codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
    python = len(re.findall(r"ArrowEvalPython|BatchEvalPython|MapInPandas|"
                            r"FlatMapGroupsInPandas", plan))
    cartesian = len(re.findall(r"CartesianProduct", plan))
    nlj = len(re.findall(r"BroadcastNestedLoopJoin", plan))
    return {
        "exchanges": n_ex, "scan": has_scan, "pushed": pushed,
        "codegen": codegen, "python": python,
        "cartesian": cartesian, "nlj": nlj,
    }


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entry
    from flink_sql_security_spark.sources import build_session

    write_path = None
    args = sys.argv[1:]
    if args and args[0] == "--write":
        write_path = args[1]
        args = args[2:]
    only = set(args)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = build_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # audit the STATIC physical plan: with AQE on, the pre-execution
    # AdaptiveSparkPlan placeholder hides codegen spans, and executing
    # every query just to read its final plan audits data-size-specific
    # re-planning rather than the plan shape the operators guarantee.
    # (At runtime AQE only improves on what is audited here: partition
    # coalescing, skew-split, and SMJ→BHJ switches.)
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    rows, failures = [], []
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            r = audit(spark, name, fn(spark, sf_dir))
        except Exception as ex:
            failures.append(f"{name}: PLAN ERROR {type(ex).__name__}: {ex}")
            continue
        bad = []
        if r["cartesian"]:
            bad.append("CARTESIAN")
        if r["nlj"] and name not in NLJ_OK:
            bad.append("NLJ")
        if r["python"] and name not in PYTHON_OK:
            bad.append("PYTHON")
        rows.append((name, r, bad))
        if bad:
            failures.append(f"{name}: {','.join(bad)}")

    lines = [
        "# PLAN AUDIT — physical-plan health of every driver query",
        "",
        f"Generated by `python tools/plan_audit.py --write PLAN_AUDIT.md` "
        f"at sf_dir={sf_dir}. Columns: shuffle exchanges / parquet predicate "
        "pushdown / WholeStageCodegen spans / Python-eval nodes (✓ = "
        "documented Arrow kernel) / nested-loop broadcasts (✓ = tiny-side "
        "by construction).",
        "",
        "| query | exchanges | pushed | codegen | python | nlj |",
        "|---|---|---|---|---|---|",
    ]
    for name, r, bad in rows:
        py = ("—" if not r["python"]
              else ("✓" + str(r["python"]) if name in PYTHON_OK
                    else "✗" + str(r["python"])))
        nl = ("—" if not r["nlj"]
              else ("✓" + str(r["nlj"]) if name in NLJ_OK else "✗" + str(r["nlj"])))
        pushed = "✓" if r["pushed"] else ("—" if not r["scan"] else "·")
        flag = " **" + ",".join(bad) + "**" if bad else ""
        lines.append(f"| {name}{flag} | {r['exchanges']} | {pushed} "
                     f"| {r['codegen']} | {py} | {nl} |")
    report = "\n".join(lines) + "\n"

    if write_path:
        with open(os.path.join(repo, write_path), "w") as f:
            f.write(report)
        print(f"wrote {write_path} ({len(rows)} queries)")
    else:
        print(report)
    if failures:
        print("AUDIT FAILURES:")
        for f_ in failures:
            print(" ", f_)
        return 1
    print(f"AUDIT PASS ({len(rows)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
