"""Random projection (Johnson–Lindenstrauss) for embedding columns.

Beyond-reference scope (driver brief: similarity-search scale path; no
vector surface exists in the reference repo). Dimensionality reduction
is the standard pre-ANN cost lever at 100 TB: a sign-matrix projection
(Achlioptas 2003, "Database-friendly random projections") maps d-dim
vectors to k-dim with pairwise distances preserved within
O(sqrt(log n / k)) — LSH bucketing, IVF assignment, and brute-force
rerank all get a d/k work reduction on the reduced vectors, and the
projected table is the cheaper thing to shuffle.

Scale shape: the projection matrix is a k×d SIGN pattern derived from
md5 — deterministic, regenerated anywhere from (salt, dims), never
shipped. Each output component lowers to an UNROLLED left-associated
chain of ± element additions (the `_adc_expr` lesson: explicit
arithmetic is codegen-able; interpreted higher-order folds are not),
so encode is a narrow zero-shuffle projection with no Python anywhere.

Cross-engine exactness: the same md5 bits pick the same signs in the
Spark emitter and the DuckDB oracle emitter; additions associate in
the same written order, the final scale is an exact power-of-two-ish
divide executed identically — projected doubles hash-match at
floor_round-to-6 output precision.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

from flink_sql_security_spark.functions.text import (
    floor_round as _floor_round)

__all__ = ["rp_signs", "rp_project", "rp_project_duckdb_sql"]


def rp_signs(out_dim: int, in_dim: int, salt: str = "rp") -> list[list[int]]:
    """Deterministic ±1 sign matrix: sign[j][i] from one md5 bit of
    ``salt:j:i``. Shared by the Spark operator and the oracle emitter —
    the matrix never needs storing or shipping."""
    return [[1 if hashlib.md5(f"{salt}:{j}:{i}".encode()).digest()[0] & 1
             else -1 for i in range(in_dim)]
            for j in range(out_dim)]


def _sum_expr(signs: list[int], elem) -> str:
    """Left-associated ± chain over 1-indexed elements; ``elem`` formats
    one element access (engine-specific)."""
    out = f"({'' if signs[0] > 0 else '- '}{elem(1)})"
    for i, s in enumerate(signs[1:], start=2):
        out = f"({out} {'+' if s > 0 else '-'} {elem(i)})"
    return out


def rp_project(df: DataFrame, in_dim: int, out_dim: int = 16,
               vec_col: str = "embedding", id_col: str = "vec_id",
               salt: str = "rp", round_to: int = 6) -> DataFrame:
    """(id, proj): k-dim sign-projection of a d-dim embedding column.

    ``proj[j] = (Σ_i sign_ji · x_i) / sqrt(out_dim)`` — the
    database-friendly JL transform. Narrow per-row work (no shuffle, no
    Python); a row whose vector is NULL, has the wrong length, or
    carries NULL elements fails loudly (same contract as ``pq_encode``:
    a silent NaN would poison every downstream distance).
    """
    if out_dim < 1 or in_dim < 1:
        raise ValueError(f"rp_project: bad dims ({out_dim}, {in_dim})")
    signs = rp_signs(out_dim, in_dim, salt)
    scale = float(out_dim) ** 0.5
    guarded = (
        f"CASE WHEN size({vec_col}) = {in_dim} THEN "
        f"transform({vec_col}, v -> CAST(v AS DOUBLE)) "
        f"ELSE assert_true(false, concat('rp_project: vector for ', "
        f"CAST({id_col} AS STRING), ' has size ', "
        f"CAST(size({vec_col}) AS STRING), ', expected {in_dim}')) END")
    comps = []
    for j, row in enumerate(signs):
        s = _sum_expr(row, lambda i: f"element_at(_xd, {i})")
        comps.append(_floor_round(
            f"({s}) / CAST('{scale!r}' AS DOUBLE)", round_to, "spark"))
    return (df.withColumn("_xd", F.expr(guarded))
            .withColumn("_xd", F.expr(
                "CASE WHEN NOT exists(_xd, v -> v IS NULL OR isnan(v)) "
                "THEN _xd ELSE assert_true(false, concat("
                f"'rp_project: NULL/NaN element in vector for ', "
                f"CAST({id_col} AS STRING))) END"))
            .select(id_col, F.array(*[F.expr(c) for c in comps])
                    .alias("proj")))


def rp_project_duckdb_sql(in_dim: int, out_dim: int = 16,
                          table: str = "embeddings",
                          vec_col: str = "embedding",
                          id_col: str = "vec_id", salt: str = "rp",
                          round_to: int = 6) -> str:
    """Oracle: identical signs from the shared generator, identical
    written-order additions and scale divide."""
    signs = rp_signs(out_dim, in_dim, salt)
    scale = float(out_dim) ** 0.5
    comps = []
    for row in signs:
        s = _sum_expr(row, lambda i: f"xd[{i}]")
        comps.append(_floor_round(
            f"({s}) / CAST('{scale!r}' AS DOUBLE)", round_to, "duckdb"))
    return (
        f"WITH x AS (SELECT {id_col}, "
        f"list_transform({vec_col}, v -> CAST(v AS DOUBLE)) AS xd "
        f"FROM {table}) "
        f"SELECT {id_col}, [" + ", ".join(comps) + "] AS proj FROM x"
    )
