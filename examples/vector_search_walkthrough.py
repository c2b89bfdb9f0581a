"""The embedding-search tier, end to end — executable documentation of
the build-once / probe-many production shape.

Walks the full lifecycle a training-data pipeline runs at scale:

1. **train**   — deterministic coarse quantizer + residual PQ codebooks
                 on a bounded sample (``ivfpq_train``);
2. **index**   — ONE corpus scan emits the (cell, codes) table; persist
                 it (at cluster scale: write it to parquet — it is ~16×
                 smaller than the raw vectors and IS the serving index);
3. **batch search** — ``ivfpq_topk(..., codes_df=index)``: per query a
                 LUT per probed cell (executor-side mapInPandas, no
                 driver collect), a cell-keyed join that touches only
                 ~n_probe/n_cells of the index, an unrolled-arithmetic
                 ADC score, a top-k window;
4. **stream search** — ``pq_ingest_stream``: the same index serves
                 micro-batches of incoming vectors, bit-identically to
                 the batch operator;
5. **rerank**  — ``ivfpq_rerank(..., codes_df=index)``: the production
                 serving shape (faiss IndexRefine) — the ADC shortlist
                 widens to k·rerank, then ONLY those candidates are
                 re-scored with exact L2 against the raw vectors;
                 recall recovers the quantization-ordering error at
                 |Q|·k·rerank point-lookups, never a corpus scan.

Everything here is deterministic and oracle-checkable — the driver
entry ``emb_ivfpq_topk`` runs this exact pipeline against a DuckDB
re-derivation and hash-matches.

Reference scope note: the reference repo (HamaWhiteGG/flink-sql-security)
has no vector search; this tier is the driver-brief extension. Run:
python examples/vector_search_walkthrough.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(spark, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from flink_sql_security_spark.operators import pq as PQ

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    # 1. train (deterministic: same sample -> same codebooks, anywhere)
    coarse, books = PQ.ivfpq_train(emb, n_cells=8, m=8, k=16, iters=2)

    # 2. index: one scan -> (vec_id, cell, codes, err); persist = the
    # materialization boundary (at scale: a parquet/Delta write)
    index = PQ.pq_encode(emb, books, coarse=coarse,
                         residual=True).persist()
    n_indexed = index.count()

    # 3. batch search against the persisted index — the encode is NOT
    # re-run (codes_df reuse); only n_probe/n_cells of the index scores
    queries = emb.where("vec_id < 5")
    topk = PQ.ivfpq_topk(emb, queries, coarse, books, k=3, n_probe=3,
                         residual=True, codes_df=index)
    batch_rows = {tuple(r) for r in topk.collect()}

    # 4. the SAME index serves a stream (foreachBatch), bit-identically
    import shutil
    import tempfile

    from flink_sql_security_spark.streaming.similarity import (
        pq_ingest_stream)

    path = tempfile.mkdtemp(prefix="fss-vs-walkthrough")
    stream_rows = set()
    try:
        queries.write.mode("overwrite").parquet(path)
        src = spark.readStream.schema(queries.schema).parquet(path)

        def sink(df, batch_id):
            stream_rows.update(tuple(r) for r in df.collect())

        q = pq_ingest_stream(src, emb, sink, coarse, books,
                             k=3, n_probe=3, residual=True).start()
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(path, ignore_errors=True)

    # 5. exact rerank over the SAME index: re-order the widened ADC
    # shortlist by exact L2 (checked here: ranks must follow exact_dist)
    rerank_collected = PQ.ivfpq_rerank(
        emb, queries, coarse, books, k=3, n_probe=3, rerank=3,
        residual=True, codes_df=index).collect()
    by_q = {}
    for r in rerank_collected:
        by_q.setdefault(r["q_id"], []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rank"])
        keys = [(r["exact_dist"], r["n_id"]) for r in rs]
        assert keys == sorted(keys), "rerank must order by exact distance"
    rerank_rows = {tuple(r) for r in rerank_collected}
    index.unpersist()

    # 6. the OTHER compression tier: binary sign-bit codes (32× smaller
    # than floats, hamming scan = xor+bit_count, zero float math).
    # Choose binary when scan bandwidth dominates and a wide exact
    # rerank is affordable; choose IVF-PQ when cell pruning must bound
    # the touched fraction. Same prefilter→refine contract:
    from flink_sql_security_spark.operators import binary as BIN

    bin_rows = BIN.hamming_topk(emb, queries, k=3, rerank=4).collect()
    assert {r["q_id"] for r in bin_rows} == {r["q_id"] for r in rerank_collected}

    # 7. diversity-aware final selection: MMR re-ranks the exact
    # shortlist so the k results are relevant AND mutually distinct —
    # the de-duplicating last mile of retrieval-driven data selection
    from flink_sql_security_spark.operators.retrieval import mmr_rerank

    mmr_rows = mmr_rerank(emb, queries, k=3, shortlist=9,
                          lam=0.7).collect()
    per_q = {}
    for r in mmr_rows:
        per_q.setdefault(r["q_id"], set()).add(r["n_id"])
    assert all(len(v) == 3 for v in per_q.values())

    # 8. when the embedding dimensions are correlated (the realistic
    # regime), OPQ learns an orthogonal rotation that decorrelates the
    # subspaces before quantizing — same code budget, 12-19% less
    # distortion. Same build-once/probe-many lifecycle: the ROTATED
    # code table is the stored index.
    from flink_sql_security_spark.operators import opq as O

    R, ocoarse, obooks = O.opq_ivf_train(emb, m=8, k=16, iters=2,
                                         opq_iters=2, n_cells=8)
    opq_rows = O.opq_ivf_topk(emb, queries, R, ocoarse, obooks,
                              k=3, n_probe=3).collect()
    assert {r["q_id"] for r in opq_rows} == {r["q_id"] for r in mmr_rows}

    # 9. hybrid ensembles: when two tiers rank the same corpus (here
    # the cheap binary prefilter and the exact cosine baseline),
    # reciprocal-rank fusion combines them with NO score calibration —
    # only rank positions enter. The fused list recovers from either
    # arm's blind spots at shortlist cost.
    from pyspark.sql import functions as F

    from flink_sql_security_spark.operators import similarity as S
    from flink_sql_security_spark.operators.retrieval import rrf_fuse

    cos_arm = (S.cosine_topk(emb, queries, k=9)
               .select("q_id", F.col("n_id").alias("vec_id"), "rank"))
    ham_arm = (BIN.hamming_topk(emb, queries, k=9, d=64)
               .select("q_id", F.col("n_id").alias("vec_id"), "rank"))
    fused_rows = rrf_fuse([("cos", cos_arm), ("ham", ham_arm)],
                          id_col="vec_id", group_col="q_id",
                          k0=60, k=3).collect()
    assert {r["q_id"] for r in fused_rows} == {r["q_id"] for r in opq_rows}

    # 9) filtered search: serve "top-k among label-3 vectors" — the
    # predicate prunes the corpus scan BEFORE any distance math
    # (post-filtering a top-k' list under-returns on selective
    # filters); every hit must carry the label.
    filt_rows = S.filtered_topk(emb, queries, "label = 3", k=3).collect()
    lab3 = {r["vec_id"] for r in emb.where("label = 3").collect()}
    assert all(r["n_id"] in lab3 for r in filt_rows)

    # 10) PCA reduction ahead of ANN: train on the bounded lowest-id
    # sample, project 64 -> 8 dims as a zero-shuffle literal fold —
    # the data-aware alternative to the JL sign projection when one
    # training pass is affordable.
    from flink_sql_security_spark.operators import projection as RPJ

    mean, comps = RPJ.pca_train(emb, out_dim=8, sample=256)
    pca_rows = RPJ.pca_project(emb, mean, comps).collect()
    assert len(pca_rows) == n_indexed and len(pca_rows[0]["proj"]) == 8

    return {"n_indexed": n_indexed, "batch": batch_rows,
            "stream": stream_rows, "rerank": rerank_rows,
            "binary": bin_rows, "mmr": mmr_rows, "opq": opq_rows,
            "fused": fused_rows, "filtered": filt_rows, "pca": pca_rows}


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark)
    print(f"indexed {out['n_indexed']} vectors")
    print(f"batch top-k rows: {len(out['batch'])}")
    print("stream == batch:", out["stream"] == out["batch"])
    print(f"reranked top-k rows: {len(out['rerank'])}")
    print(f"binary-prefilter rows: {len(out['binary'])}, "
          f"MMR-diversified rows: {len(out['mmr'])}")
    spark.stop()


if __name__ == "__main__":
    main()
