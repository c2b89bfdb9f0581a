"""Binary (sign-bit) quantization + Hamming-distance search.

The third rung of the quantization ladder next to int8 scalar
(``operators/quantize.py``) and product quantization
(``operators/pq.py``): each dimension collapses to ONE bit
(``v > 0``), packed 32 bits per integer word — a 64-dim float32
vector becomes two words, 8 logical bytes, 32× smaller than the
floats. Hamming distance between packed codes approximates angular
distance (sign-random-projection theory: P[bit differs] = θ/π), and
is computed entirely with ``xor`` + ``bit_count`` — no float math in
the scan at all. That makes the binary scan the cheapest brute-force
tier there is: at 100 TB of raw vectors the packed code table is
~3 TB and the per-candidate cost is a handful of ALU ops, which is
why production vector stores run *binary prefilter → exact rerank*
(the shape ``hamming_topk(rerank=...)`` implements).

Scale shape:
- encode: narrow per-row projection, unrolled integer CASE sums (no
  higher-order functions — the ADC lesson from ``pq.py``: HOFs are
  interpreted, explicit arithmetic runs in whole-stage codegen), zero
  shuffle.
- scan: corpus codes ⋈ broadcast query codes; per pair W xor +
  bit_count ops (W = ceil(d/32)). The query side never collects to
  the driver — codes are computed as Spark expressions and the join
  broadcasts the (tiny) code columns only, never float vectors.
- rerank: only the k·rerank hamming survivors are joined back to
  unit vectors for exact cosine — shortlist cost, not corpus cost.

Determinism / oracle parity: bit packing is integer CASE sums
(exact on any engine, any partitioning); hamming is integer; the
optional cosine rerank reuses the sequential-fold unit-vector dot
whose DuckDB ``list_sum`` equivalence the similarity/PQ tiers
already pin. Word values use only bits 0..31 of a BIGINT, so no
engine hits signed-shift overflow (DuckDB rejects ``1::BIGINT << 63``).

Reference scope note: no vector search exists in the reference repo;
this extends the engine per the driver brief (similarity-search scale
path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import _UNIT_DOT, unit_vectors

WORD_BITS = 32


def _word_expr(vec: str, j: int, d: int, dialect: str) -> str:
    """Unrolled integer sum packing bits [32j, 32j+32) of ``vec``.

    Bit b of word j is set iff ``vec[32j+b] > 0.0`` (strict sign rule:
    zeros and negatives clear; the float→double widening is exact so
    the comparison is engine-identical). Left-assoc BIGINT additions
    of disjoint powers of two — exact and order-independent on both
    engines; no shifts, no HOFs, per-element casts only (no repeated
    whole-array transform inside the unroll).
    """
    terms = []
    for b in range(WORD_BITS):
        i = j * WORD_BITS + b          # 0-based dimension index
        if i >= d:
            break
        pos = i + 1                    # both engines index arrays from 1
        elem = (f"CAST(element_at({vec}, {pos}) AS DOUBLE)"
                if dialect == "spark"
                else f"CAST({vec}[{pos}] AS DOUBLE)")
        one = f"{1 << b}L" if dialect == "spark" else \
            f"CAST({1 << b} AS BIGINT)"
        zero = "0L" if dialect == "spark" else "CAST(0 AS BIGINT)"
        lit = "0.0D" if dialect == "spark" else "0.0"
        terms.append(f"CASE WHEN {elem} > {lit} THEN {one} ELSE {zero} END")
    return "(" + " + ".join(terms) + ")"


def _n_words(d: int) -> int:
    return (d + WORD_BITS - 1) // WORD_BITS


def _hamming_expr(a_words: list[str], b_words: list[str],
                  dialect: str) -> str:
    """Integer hamming distance over packed word column pairs."""
    xor = (lambda a, b: f"({a} ^ {b})") if dialect == "spark" else \
        (lambda a, b: f"xor({a}, {b})")
    body = " + ".join(
        f"bit_count({xor(a, b)})" for a, b in zip(a_words, b_words))
    return f"CAST(({body}) AS INT)"


def _dim(df: DataFrame, vec_col: str) -> int:
    return df.select(F.size(vec_col).alias("d")).first()["d"]


def binary_codes(df: DataFrame, vec_col: str = "embedding",
                 id_col: str = "vec_id", d: int | None = None,
                 prefix: str = "w") -> DataFrame:
    """(id, w0..w{W-1}): sign-bit codes packed 32 bits per BIGINT word.

    Plain integer columns (not an array) so downstream xor/bit_count
    stay scalar codegen expressions. One narrow projection, no shuffle.

    NULL elements clear their bit (``NULL > 0.0`` is NULL, the CASE
    falls to 0) and NaN elements SET it (both engines order NaN above
    every value, so ``NaN > 0.0`` is true) — identically on Spark and
    DuckDB, so cross-engine parity holds. That is a deliberate
    contrast with the PQ tier's loud-raise policy: the bit code is a
    PREFILTER whose misses the exact rerank recovers, while a PQ code
    is the stored representation itself. Corpora that must not contain
    NULL vectors should gate with ``pq_encode``'s validation or a
    ``WHERE`` upstream.
    """
    if d is None:
        d = _dim(df, vec_col)
    cols = [F.col(id_col)] + [
        F.expr(_word_expr(vec_col, j, d, "spark")).alias(f"{prefix}{j}")
        for j in range(_n_words(d))
    ]
    return df.select(*cols)


def binary_codes_duckdb_sql(vec_col: str = "embedding",
                            id_col: str = "vec_id", d: int = 64,
                            prefix: str = "w",
                            table: str = "embeddings") -> str:
    """Oracle: identical packing with DuckDB list indexing."""
    words = ", ".join(
        f"{_word_expr(vec_col, j, d, 'duckdb')} AS {prefix}{j}"
        for j in range(_n_words(d)))
    return f"SELECT {id_col}, {words} FROM {table}"


def hamming_topk(df: DataFrame, queries_df: DataFrame,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 k: int = 5, rerank: int = 0, round_to: int = 6,
                 d: int | None = None,
                 codes_df: DataFrame | None = None) -> DataFrame:
    """Top-k per query by packed-code hamming distance (asc, id asc).

    ``rerank=0``: returns (q_id, n_id, hamming, rank) straight from the
    binary scan. ``rerank=R``: the per-query hamming top-``k*R``
    shortlist is re-scored with exact unit-vector cosine (only the
    shortlist joins back to floats) and the final (q_id, n_id, cosine,
    rank) ranks by cosine desc, n_id asc — the binary-prefilter /
    exact-refine production shape. Self-pairs are excluded.

    ``codes_df``: a precomputed (persisted) :func:`binary_codes` output
    for ``df`` — the build-once / probe-many index-reuse path (the
    codes_df convention the PQ tier established); pass it when many
    query batches probe the same corpus so the encode projection isn't
    re-evaluated per probe.
    """
    from pyspark.sql.window import Window

    if d is None:
        d = _dim(df, vec_col)
    W = _n_words(d)
    codes = codes_df if codes_df is not None \
        else binary_codes(df, vec_col, id_col, d=d)
    qcodes = binary_codes(queries_df, vec_col, id_col, d=d, prefix="qw") \
        .withColumnRenamed(id_col, "q_id")
    ham = _hamming_expr([f"w{j}" for j in range(W)],
                        [f"qw{j}" for j in range(W)], "spark")
    scan = (
        codes.crossJoin(F.broadcast(qcodes))
        .where(F.col(id_col) != F.col("q_id"))
        .select(F.col("q_id"), F.col(id_col).alias("n_id"),
                F.expr(ham).alias("hamming"))
    )
    w_ham = Window.partitionBy("q_id").orderBy(F.asc("hamming"),
                                               F.asc("n_id"))
    ranked = scan.withColumn("rank", F.row_number().over(w_ham))
    if rerank <= 0:
        return ranked.where(F.col("rank") <= k) \
            .select("q_id", "n_id", "hamming", "rank")
    shortlist = ranked.where(F.col("rank") <= k * rerank) \
        .select("q_id", "n_id")
    units = unit_vectors(df, vec_col, id_col)
    qunits = unit_vectors(queries_df, vec_col, id_col) \
        .select(F.col(id_col).alias("q_id"), F.col("unit").alias("qunit"))
    dot = _UNIT_DOT.format(a="qunit", b="unit")
    rescored = (
        shortlist
        .join(units.withColumnRenamed(id_col, "n_id"), "n_id")
        .join(F.broadcast(qunits), "q_id")
        .select("q_id", "n_id",
                F.round(F.expr(dot), round_to).alias("cosine"))
    )
    w_cos = Window.partitionBy("q_id").orderBy(F.desc("cosine"),
                                               F.asc("n_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w_cos))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def hamming_topk_duckdb_sql(query_pred: str = "vec_id < 20",
                            vec_col: str = "embedding",
                            id_col: str = "vec_id", k: int = 5,
                            rerank: int = 0, round_to: int = 6,
                            d: int = 64,
                            table: str = "embeddings") -> str:
    """Pure-SQL oracle for ``hamming_topk`` — no driver-side artifacts.

    Same packing, same integer hamming, same tie rules; the rerank
    branch recomputes unit vectors and the sequential-fold dot with
    the ``list_sum(list_transform(list_zip(...)))`` shape whose
    engine equivalence the IVF oracle already pins.
    """
    W = _n_words(d)
    words = ", ".join(
        f"{_word_expr(vec_col, j, d, 'duckdb')} AS w{j}" for j in range(W))
    ham = _hamming_expr([f"c.w{j}" for j in range(W)],
                        [f"q.w{j}" for j in range(W)], "duckdb")
    parts = [
        f"WITH c AS (SELECT {id_col}, {words} FROM {table})",
        f"q AS (SELECT * FROM c WHERE {query_pred})",
        f"scan AS (SELECT q.{id_col} AS q_id, c.{id_col} AS n_id, "
        f"{ham} AS hamming FROM c CROSS JOIN q "
        f"WHERE c.{id_col} <> q.{id_col})",
        "ranked AS (SELECT q_id, n_id, hamming, row_number() OVER "
        "(PARTITION BY q_id ORDER BY hamming, n_id) AS rank FROM scan)",
    ]
    if rerank <= 0:
        return (", ".join(parts) +
                f" SELECT q_id, n_id, hamming, rank FROM ranked "
                f"WHERE rank <= {k}")
    parts += [
        f"u AS (SELECT {id_col}, list_transform({vec_col}, "
        "v -> CAST(v AS DOUBLE) / n) AS unit FROM "
        f"(SELECT {id_col}, {vec_col}, "
        f"sqrt(list_sum(list_transform({vec_col}, "
        f"v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS n FROM {table}))",
        f"short AS (SELECT q_id, n_id FROM ranked WHERE rank <= {k * rerank})",
        "rescored AS (SELECT s.q_id, s.n_id, "
        "round(list_sum(list_transform(list_zip(uq.unit, un.unit), "
        f"x -> x[1] * x[2])), {round_to}) AS cosine FROM short s "
        f"JOIN u un ON un.{id_col} = s.n_id "
        f"JOIN u uq ON uq.{id_col} = s.q_id)",
        "final AS (SELECT q_id, n_id, cosine, row_number() OVER "
        "(PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank "
        "FROM rescored)",
    ]
    return (", ".join(parts) +
            f" SELECT q_id, n_id, cosine, rank FROM final WHERE rank <= {k}")
