"""Similarity search over embedding columns (array<float>).

Brute-force cosine (oracle-checkable baseline) + LSH-bucketed ANN (the scale
path). All arithmetic stays in built-in higher-order functions — zip_with /
aggregate run inside codegen; float→double widening is exact so the DuckDB
oracle (list_cosine_similarity) matches bit-for-bit.

Scale notes:
- brute force is O(n²·d): correct tool below ~10⁵ vectors per bucket, after
  that use lsh_buckets to cut candidates, or broadcast one small side
- random-hyperplane LSH derives hyperplane components from md5 (deterministic,
  no driver-side RNG state to ship); b buckets ≈ n/2^bits vectors each
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate({a}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"


def cosine_expr(a: str, b: str) -> str:
    """Spark SQL expression for cosine similarity of two float arrays."""
    return (
        f"{_DOT.format(a=a, b=b)} / "
        f"({_NORM.format(a=a)} * {_NORM.format(a=b)})"
    )


def unit_vectors(df: DataFrame, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """(id, unit): L2-normalized double vectors, computed once per vector.

    Pre-normalizing turns every pairwise cosine into a single dot product —
    at n vectors and p candidate pairs this is O(n·d) normalization instead
    of O(p·d) norm recomputation (p ≈ n²/2 for brute force: ~3× less work
    per pair, and the win grows with candidate multiplicity in LSH).
    """
    norm = F.expr(_NORM.format(a=vec_col))
    return (
        df.select(F.col(id_col), F.col(vec_col), norm.alias("_n"))
        .select(
            F.col(id_col),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE) / _n)")
            .alias("unit"),
        )
    )


_UNIT_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"


def cosine_pairs(df: DataFrame, vec_col: str = "embedding",
                 id_col: str = "vec_id", threshold: float = 0.4,
                 round_to: int = 6, prefilter: bool = True) -> DataFrame:
    """All pairs with cosine ≥ threshold (brute force, id_a < id_b).

    Two physical strategies for the same logical result:

    - ``prefilter=True`` (default): blocked-BLAS candidate generation. One
      side is broadcast as an n×d numpy matrix; ``mapInPandas`` tasks each
      take a chunk of rows and do a chunk×n matmul (vectorized, ~GFLOP/s)
      keeping only pairs within ``margin`` of the threshold. Survivors —
      typically a tiny fraction of n²/2 — are re-scored with the exact
      sequential-order `aggregate` expression, so output values are
      bit-identical to the naive path (and to the DuckDB oracle). The n²
      work distributes across executors; the broadcast bounds n to what
      fits in executor memory (~10⁶·d doubles) — beyond that, use
      `ann_candidate_pairs`, the documented scale path.
    - ``prefilter=False``: pure crossJoin + interpreted higher-order
      functions. Spark's HOFs are not codegen'd, so this is ~100× slower
      per pair; kept as the reference semantics / fallback.
    """
    u = unit_vectors(df, vec_col, id_col)
    if not prefilter:
        a = u.select(F.col(id_col).alias("id_a"), F.col("unit").alias("ua"))
        b = u.select(F.col(id_col).alias("id_b"), F.col("unit").alias("ub"))
        cos = F.round(F.expr(_UNIT_DOT.format(a="ua", b="ub")), round_to)
        return (
            a.crossJoin(b)
            .where(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cos)
            .where(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )
    cand = _blas_candidate_pairs(u, id_col, threshold, round_to)
    ua = u.select(F.col(id_col).alias("id_a"), F.col("unit").alias("ua"))
    ub = u.select(F.col(id_col).alias("id_b"), F.col("unit").alias("ub"))
    cos = F.round(F.expr(_UNIT_DOT.format(a="ua", b="ub")), round_to)
    return (
        cand.join(F.broadcast(ua), "id_a")
        .join(F.broadcast(ub), "id_b")
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _blas_candidate_pairs(u: DataFrame, id_col: str, threshold: float,
                          round_to: int) -> DataFrame:
    """(id_a, id_b) candidate superset via broadcast matrix × chunked matmul.

    The margin covers both float-associativity drift between BLAS pairwise
    summation and the exact sequential sum (~1e-15) and the final
    `round(cos, round_to)` step (a raw value 0.5·10^-r below the threshold
    still rounds up to it). Guarantees the candidate set is a superset of
    the exact answer; the caller re-scores exactly and re-filters.
    """
    import numpy as np

    margin = 0.5 * 10.0 ** (-round_to) + 1e-9
    pdf = u.toPandas()
    ids_all = pdf[id_col].to_numpy()
    mat = np.array(pdf["unit"].tolist(), dtype=np.float64)
    bc = u.sparkSession.sparkContext.broadcast((ids_all, mat))

    def gen(batches):
        import pandas as pd

        ids_b, B = bc.value
        for chunk in batches:
            if not len(chunk):
                continue
            A = np.array(chunk["unit"].tolist(), dtype=np.float64)
            ids_a = chunk[id_col].to_numpy()
            S = A @ B.T
            ia, ib = np.nonzero(S >= threshold - margin)
            keep = ids_a[ia] < ids_b[ib]
            yield pd.DataFrame({
                "id_a": ids_a[ia][keep].astype("int64"),
                "id_b": ids_b[ib][keep].astype("int64"),
            })

    return u.mapInPandas(gen, "id_a long, id_b long")


def cosine_topk(df: DataFrame, queries_df: DataFrame,
                vec_col: str = "embedding", id_col: str = "vec_id",
                k: int = 5, round_to: int = 6) -> DataFrame:
    """Top-k neighbors per query vector (brute force + per-query window).

    Deterministic: ties broken by neighbor id. One shuffle for the window.
    """
    from pyspark.sql.window import Window

    q = unit_vectors(queries_df, vec_col, id_col).select(
        F.col(id_col).alias("q_id"), F.col("unit").alias("qu"))
    c = unit_vectors(df, vec_col, id_col).select(
        F.col(id_col).alias("n_id"), F.col("unit").alias("nu"))
    cos = F.round(F.expr(_UNIT_DOT.format(a="qu", b="nu")), round_to)
    scored = (
        q.crossJoin(c)
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", cos)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def _ivf_centroids(u: DataFrame, id_col: str, n_cells: int,
                   iters: int, sample: int):
    """Deterministic spherical k-means centroids (numpy, driver-side).

    Sample = the ``sample`` lowest-id unit vectors (no RNG → same centroids
    every run); init = farthest-point traversal; ``iters`` Lloyd rounds with
    L2-renormalization. Centroid fitting on a bounded sample is the standard
    IVF recipe — the expensive full-corpus step (assignment) stays
    distributed.
    """
    import numpy as np

    pdf = u.orderBy(id_col).limit(sample).toPandas()
    X = np.array(pdf["unit"].tolist(), dtype=np.float64)
    n_cells = min(n_cells, len(X))
    # farthest-point init: start at row 0, greedily add the point with the
    # lowest max-similarity to chosen centroids
    chosen = [0]
    sims = X @ X[0]
    for _ in range(n_cells - 1):
        nxt = int(np.argmin(sims))
        chosen.append(nxt)
        sims = np.maximum(sims, X @ X[nxt])
    C = X[chosen].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                v = members.sum(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    C[c] = v / norm
    return C


def ivf_assign(df: DataFrame, vec_col: str = "embedding",
               id_col: str = "vec_id", n_cells: int = 16,
               iters: int = 5, sample: int = 4096,
               centroids=None) -> DataFrame:
    """(id, cell, unit): each vector assigned to its nearest IVF centroid.

    The corpus-wide pass is one mapInPandas matmul against the broadcast
    centroid matrix — O(n·cells·d) vectorized, no shuffle. Downstream
    searches shuffle on ``cell`` so only probed cells' vectors move.
    """
    import numpy as np

    u = unit_vectors(df, vec_col, id_col)
    C = (_ivf_centroids(u, id_col, n_cells, iters, sample)
         if centroids is None else centroids)
    bc = u.sparkSession.sparkContext.broadcast(C)

    def gen(batches):
        import pandas as pd

        cm = bc.value
        for chunk in batches:
            if not len(chunk):
                continue
            A = np.array(chunk["unit"].tolist(), dtype=np.float64)
            cell = np.argmax(A @ cm.T, axis=1).astype("int32")
            yield pd.DataFrame({
                id_col: chunk[id_col].to_numpy(),
                "cell": cell,
                "unit": chunk["unit"],
            })

    return u.mapInPandas(
        gen, f"{id_col} long, cell int, unit array<double>")


def ivf_topk(df: DataFrame, queries_df: DataFrame,
             vec_col: str = "embedding", id_col: str = "vec_id",
             k: int = 5, n_cells: int = 16, n_probe: int = 4,
             iters: int = 5, sample: int = 4096,
             round_to: int = 6) -> DataFrame:
    """Approximate top-k via IVF: probe the ``n_probe`` nearest cells only.

    Same output schema as `cosine_topk` (q_id, n_id, cosine, rank); recall
    < 1 by design — tune (n_cells, n_probe). Scale shape: the corpus is
    scanned once for assignment, then the search join touches only
    n_probe/n_cells of the vectors; candidate scoring is exact
    sequential-order cosine, so any pair this returns scores identically
    to the brute-force path.
    """
    import numpy as np
    from pyspark.sql.window import Window

    C = _ivf_centroids(unit_vectors(df, vec_col, id_col), id_col,
                       n_cells, iters, sample)
    assigned = ivf_assign(df, vec_col, id_col, n_cells, iters, sample,
                          centroids=C)
    corpus = assigned.select(
        F.col(id_col).alias("n_id"), "cell", F.col("unit").alias("nu"))

    uq = unit_vectors(queries_df, vec_col, id_col)
    bcq = uq.sparkSession.sparkContext.broadcast(C)

    def probes(batches):
        import pandas as pd

        cm = bcq.value
        p = min(n_probe, len(cm))
        for chunk in batches:
            if not len(chunk):
                continue
            A = np.array(chunk["unit"].tolist(), dtype=np.float64)
            top = np.argsort(-(A @ cm.T), axis=1)[:, :p]
            idx = np.repeat(np.arange(len(chunk)), p)
            yield pd.DataFrame({
                "q_id": chunk[id_col].to_numpy()[idx],
                "cell": top.ravel().astype("int32"),
                "qu": chunk["unit"].iloc[idx].to_numpy(),
            })

    q_probe = uq.mapInPandas(probes, "q_id long, cell int, qu array<double>")
    cos = F.round(F.expr(_UNIT_DOT.format(a="qu", b="nu")), round_to)
    scored = (
        q_probe.join(corpus, "cell")
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", cos)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def _hyperplane(table: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component r[t][p][i] from
    md5(t|p|i) → uniform in [-1, 1]. Computed driver-side: same values on
    every run/executor with zero shipped state, and the plan carries plain
    double literals instead of 64 md5 expression nodes per plane."""
    import hashlib

    return [
        int(hashlib.md5(f"{table}|{plane}|{i}".encode()).hexdigest()[:6], 16)
        / float(16 ** 6 - 1) * 2 - 1
        for i in range(dim)
    ]


def lsh_buckets(df: DataFrame, vec_col: str = "embedding",
                id_col: str = "vec_id", bits: int = 8, dim: int = 64,
                tables: int = 1) -> DataFrame:
    """Random-hyperplane LSH bucket ids: (id, table, bucket), one row per table.

    ``bits`` trades bucket size against per-table recall (P(pair shares a
    bucket) = (1 - θ/π)^bits); ``tables`` OR-amplifies recall to
    1 - (1 - p)^tables. Bucketing cuts ANN candidates from O(n²) to
    O(tables · Σ bucket²).

    All tables·bits sign tests come from ONE numpy matmul per Arrow batch
    against the broadcast (tables·bits)×dim hyperplane matrix — a single
    pass over the vectors, no shuffle, no interpreted per-plane dot
    products (Spark higher-order functions are not codegen'd).
    """
    import numpy as np

    H = np.array(
        [_hyperplane(t, p, dim) for t in range(tables) for p in range(bits)],
        dtype=np.float64)
    weights = (2 ** np.arange(bits)).astype(np.int64)
    bc = df.sparkSession.sparkContext.broadcast((H, weights))

    def gen(batches):
        import pandas as pd

        Hm, w = bc.value
        for chunk in batches:
            if not len(chunk):
                continue
            A = np.array(chunk[vec_col].tolist(), dtype=np.float64)
            signs = (A @ Hm.T) > 0.0                 # n × (tables·bits)
            buckets = signs.reshape(len(A), tables, bits) @ w  # n × tables
            ids = chunk[id_col].to_numpy()
            idx = np.repeat(np.arange(len(A)), tables)
            yield pd.DataFrame({
                id_col: ids[idx],
                "table": np.tile(np.arange(tables, dtype=np.int32), len(A)),
                "bucket": buckets.ravel().astype("int64"),
            })

    return df.select(id_col, vec_col).mapInPandas(
        gen, f"{id_col} long, table int, bucket long")


def ann_candidate_pairs(df: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id", bits: int = 6,
                        dim: int = 64, threshold: float = 0.4,
                        tables: int = 4) -> DataFrame:
    """ANN near-dup pairs: cosine over candidates sharing any LSH bucket.

    The scale path for embedding dedup: shuffle on (table, bucket),
    per-bucket self-join, exact cosine only on survivors, distinct across
    tables. Tune (bits, tables) to the target cosine: near-dups (≥0.9) work
    with bits=8/tables=4; looser thresholds need more tables.
    """
    # both self-join sides read the bucket table — persist() runs the
    # (numpy hyperplane-projection) bucket assignment once, not twice
    b = lsh_buckets(df, vec_col, id_col, bits, dim, tables).persist()
    a = b.select(F.col(id_col).alias("id_a"), "table", "bucket")
    c = b.select(F.col(id_col).alias("id_b"), "table", "bucket")
    # dedupe candidate ids across tables BEFORE touching vectors: the distinct
    # shuffles two longs per pair, never the arrays
    cand = (
        a.join(c, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    u = unit_vectors(df, vec_col, id_col)
    ua = u.select(F.col(id_col).alias("id_a"), F.col("unit").alias("ua"))
    ub = u.select(F.col(id_col).alias("id_b"), F.col("unit").alias("ub"))
    cos = F.round(F.expr(_UNIT_DOT.format(a="ua", b="ub")), 6)
    return (
        cand.join(ua, "id_a").join(ub, "id_b")
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# Semantic dedup: cosine-threshold pairs -> clusters -> canonical survivor
# ---------------------------------------------------------------------------

def semantic_dedup(df: DataFrame, vec_col: str = "embedding",
                   id_col: str = "vec_id",
                   threshold: float = 0.4) -> DataFrame:
    """(vec_id, component_id, is_kept): embedding-space near-dup removal.

    The third dedup modality of a training pipeline (after exact and
    lexical near-dup): pairs within cosine ``threshold`` are clustered by
    connected components and one canonical row (the min id) survives per
    cluster; rows in no pair survive trivially.

    Scale shape: pair generation is the blocked-BLAS + exact-rescore path
    of :func:`cosine_pairs`; components iterate over the (tiny) pair set
    only; the final labeling is a broadcast-able left join of the
    component map back onto the corpus — the full corpus is never
    shuffled.
    """
    from flink_sql_security_spark.operators.dedup import connected_components

    pairs = cosine_pairs(df, vec_col=vec_col, id_col=id_col,
                         threshold=threshold).select("id_a", "id_b")
    comp = connected_components(pairs).withColumnRenamed("doc_id", id_col)
    return (
        df.select(F.col(id_col))
        .join(F.broadcast(comp), on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("component_id", F.col(id_col)).alias("component_id"))
        .withColumn("is_kept", F.col("component_id") == F.col(id_col))
    )
