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


def cosine_pairs(df: DataFrame, vec_col: str = "embedding",
                 id_col: str = "vec_id", threshold: float = 0.4,
                 round_to: int = 6) -> DataFrame:
    """All pairs with cosine ≥ threshold (brute force, id_a < id_b)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = F.round(F.expr(cosine_expr("va", "vb")), round_to)
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

    q = queries_df.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    c = df.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    cos = F.round(F.expr(cosine_expr("qv", "nv")), round_to)
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


def lsh_buckets(df: DataFrame, vec_col: str = "embedding",
                id_col: str = "vec_id", bits: int = 8, dim: int = 64,
                tables: int = 1) -> DataFrame:
    """Random-hyperplane LSH bucket ids: (id, table, bucket), one row per table.

    Hyperplane component r[t][p][i] is derived from md5(t|p|i) → uniform in
    [-1, 1]: deterministic across runs/engines/executors with zero shipped
    state. ``bits`` trades bucket size against per-table recall
    (P(pair shares a bucket) = (1 - θ/π)^bits); ``tables`` OR-amplifies
    recall to 1 - (1 - p)^tables. Bucketing cuts ANN candidates from O(n²)
    to O(tables · Σ bucket²).
    """
    rows = []
    for t in range(tables):
        bucket = None
        for p in range(bits):
            plane = F.array(*[
                (F.conv(F.md5(F.lit(f"{t}|{p}|{i}")).substr(1, 6), 16, 10)
                 .cast("double") / F.lit(float(16 ** 6 - 1)) * 2 - 1)
                for i in range(dim)
            ])
            dot = F.aggregate(
                F.zip_with(F.col(vec_col), plane,
                           lambda x, y: x.cast("double") * y),
                F.lit(0.0), lambda acc, v: acc + v)
            bit = F.when(dot > 0, F.lit(2 ** p)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        rows.append(df.select(F.col(id_col), F.lit(t).alias("table"),
                              bucket.alias("bucket")))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


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
    v = df.select(F.col(id_col), F.col(vec_col))
    a = b.join(v, id_col).select(
        F.col(id_col).alias("id_a"), "table", "bucket",
        F.col(vec_col).alias("va"))
    c = b.join(v, id_col).select(
        F.col(id_col).alias("id_b"), "table", "bucket",
        F.col(vec_col).alias("vb"))
    cos = F.round(F.expr(cosine_expr("va", "vb")), 6)
    return (
        a.join(c, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .distinct()
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
