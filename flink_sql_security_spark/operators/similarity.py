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
                 round_to: int = 6) -> DataFrame:
    """All pairs with cosine ≥ threshold (brute force, id_a < id_b)."""
    u = unit_vectors(df, vec_col, id_col)
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
    O(tables · Σ bucket²). All tables are emitted in ONE projection via
    ``stack`` — a single pass over the vectors, no unions.
    """
    bucket_cols = []
    for t in range(tables):
        bits_expr = []
        for p in range(bits):
            arr = ", ".join(f"{v!r}D" for v in _hyperplane(t, p, dim))
            dot = (f"aggregate(zip_with({vec_col}, array({arr}), "
                   "(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)")
            bits_expr.append(f"(CASE WHEN {dot} > 0D THEN {2 ** p} ELSE 0 END)")
        bucket_cols.append(" + ".join(bits_expr))
    stack_args = ", ".join(
        f"{t}, ({expr})" for t, expr in enumerate(bucket_cols))
    return df.select(
        F.col(id_col),
        F.expr(f"stack({tables}, {stack_args})").alias("table", "bucket"),
    )


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
    b = lsh_buckets(df, vec_col, id_col, bits, dim, tables)
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
