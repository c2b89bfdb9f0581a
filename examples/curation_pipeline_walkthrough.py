"""A training-data curation pipeline, end to end — executable
documentation of how the operator tiers compose.

The shape every large-corpus curation run takes, expressed with this
repo's operators (each stage is individually strict-oracle-checked by
its own driver entry; this walkthrough pins the COMPOSITION):

1. **gate + exact/near dedup** — ``clean_corpus``: language gate,
   quality floor, exact-dup collapse, LSH near-dup collapse;
2. **canonical selection** — ``keep_best_per_component``: near-dup
   pairs → components → keep the highest-quality copy per cluster
   (the round-5c addition: dedup that keeps the best-written copy,
   not an arbitrary one);
3. **mixture reweighting** — ``temperature_mix``: per-source rates
   ∝ count^alpha (the mT5/XLM-R recipe), exact integer md5 thresholds;
4. **leakage-safe split** — ``component_safe_split``: train/val/test
   keyed on the near-dup component, so no duplicate cluster straddles
   splits (eval-contamination guard);
5. **packing** — ``pack_sequences``: concat-then-chunk the train
   selection into fixed token budgets via the two-phase prefix sum.

Every stage is deterministic (content-hash or exact-integer
arithmetic), so the whole pipeline reproduces bit-for-bit on any
cluster layout — the property that makes a 100 TB re-run auditable.

Run: python examples/curation_pipeline_walkthrough.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(spark, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from pyspark.sql import functions as F

    from flink_sql_security_spark.functions import text as T
    from flink_sql_security_spark.operators import dedup as D
    from flink_sql_security_spark.operators import sampling as SM
    from flink_sql_security_spark.operators.cache import release
    from flink_sql_security_spark.operators.corpus import clean_corpus
    from flink_sql_security_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_raw = docs.count()

    # 1. gate + dedup (lang/quality gates, exact + LSH near-dup)
    cleaned = clean_corpus(docs, lang="en", min_quality=0.3)
    survivors = cleaned.select("doc_id")
    n_clean = survivors.count()

    # 2. canonical selection over the near-dup graph of the RAW corpus:
    # per cluster keep the best-written copy (quality, ties to low id)
    kept = D.keep_best_per_component(
        docs, D.ngram_jaccard_pairs(docs, threshold=0.05),
        T.quality_score(F.col("text")))
    keep_rows = kept.collect()

    # 3. mixture reweighting on the cleaned survivors (alpha=0.5
    # up-weights low-resource sources relative to their raw share)
    mixed = SM.temperature_mix(
        docs.join(survivors, "doc_id").select("doc_id", "source"),
        alpha=0.5, target_rows=max(1, n_clean // 2))
    n_mixed = mixed.count()

    # 4. leakage-safe split BEFORE packing: assignment keys on the
    # near-dup COMPONENT, so no duplicate cluster straddles train/test
    # (the eval-contamination guard a row-keyed split can't give)
    split = SM.component_safe_split(
        docs, D.ngram_jaccard_pairs(docs, threshold=0.05))
    by_split = {r["split"]: r["cnt"] for r in
                split.groupBy("split").agg(
                    F.count("*").alias("cnt")).collect()}

    # 5. pack the mixed TRAIN selection into 256-token sequences
    train_ids = split.where("split = 'train'").select("doc_id")
    packed = pack_sequences(
        docs.join(mixed.select("doc_id"), "doc_id")
        .join(train_ids, "doc_id")
        .select("doc_id", "text"),
        T.bpe_token_count(F.col("text")), budget=256)
    # one row per doc (its bin assignment); the training-sequence count
    # is the number of distinct 256-token bins
    n_assigned = packed.count()
    n_bins = packed.select("bin_id").distinct().count()

    # targeted topic extraction over the SAME corpus, the build-once/
    # probe-many way: the inverted index tokenizes the documents once;
    # each probe below reads only its own terms' posting lists (at
    # corpus scale: row-group-pruned reads, not a re-scan).
    from flink_sql_security_spark.operators.retrieval import (
        bm25_build_index, bm25_topk_indexed)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings, stats = bm25_build_index(docs)
    postings = postings.persist()
    probes = {terms[0]: bm25_topk_indexed(postings, stats, terms,
                                          k=5).count()
              for terms in (["vector", "hash"], ["stream"], ["join"])}
    postings.unpersist()

    release(cleaned)
    return {"n_raw": n_raw, "n_clean": n_clean, "keep": keep_rows,
            "n_mixed": n_mixed, "by_split": by_split,
            "n_assigned": n_assigned, "n_bins": n_bins,
            "probes": probes}


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark)
    print(f"raw {out['n_raw']} -> cleaned {out['n_clean']} "
          f"-> mixed {out['n_mixed']} -> splits {out['by_split']} "
          f"-> {out['n_bins']} training bins")
    print(f"near-dup clusters with a canonical pick: {len(out['keep'])}")
    print(f"indexed BM25 probes (term -> hits): {out['probes']}")
    spark.stop()


if __name__ == "__main__":
    main()
