"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference scope (driver brief): exact dedup, MinHash+LSH, SimHash and
n-gram Jaccard near-dup detection, all as composable DataFrame transforms.

Design for 100 TB:
- every hash is ``md5`` of deterministic strings → engine-portable (the DuckDB
  oracle reproduces results exactly) and cluster-stable (no JVM hash seeds)
- shingling/minhashing stays in built-in higher-order functions (transform /
  explode / aggregate) → whole-stage codegen, no Python on the data path
- each stage is one shuffle: explode→groupBy(doc) for signatures,
  band-bucket self-join for candidates (the classic LSH join); AQE handles
  skewed buckets
- candidate verification (exact Jaccard) runs only on LSH survivors at scale;
  the brute-force pairwise forms here are for oracle-checkable correctness at
  test SFs
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       normalize: bool = True) -> DataFrame:
    """Group identical documents by content hash.

    Returns (dup_key, keep_id, n_dups): the kept representative is min(id) —
    deterministic under any partitioning. One shuffle, map-side partial agg.
    """
    text = F.col(text_col)
    if normalize:
        text = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return (
        df.select(F.md5(text).alias("dup_key"), F.col(id_col))
        .groupBy("dup_key")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one representative row per identical (normalized) text."""
    groups = exact_dedup_groups(df, text_col, id_col)
    return df.join(groups.select(F.col("keep_id").alias(id_col)), on=id_col)


# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------

def word_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Tokenization is lower + whitespace split, shingle = space-joined n-gram —
    byte-identical to the DuckDB oracle's string_split_regex formulation.
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.expr(
        f"CASE WHEN size(_w) >= {n} THEN "
        f"transform(sequence(0, size(_w) - {n}), i -> concat_ws(' ', slice(_w, i + 1, {n}))) "
        "ELSE array() END"
    )
    return (
        df.select(F.col(id_col), words.alias("_w"))
        .select(F.col(id_col), F.explode(grams).alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

def minhash_signatures(shingle_df: DataFrame, id_col: str = "doc_id",
                       num_hashes: int = 16) -> DataFrame:
    """(id, seed, minhash): minhash_k(doc) = min over shingles of md5(k|shingle).

    One explode (seeds) + one shuffle (groupBy id,seed with map-side min).
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    hashed = F.md5(F.concat_ws("|", F.col("seed").cast("string"), F.col("shingle")))
    return (
        shingle_df.select(F.col(id_col), F.col("shingle"))
        .select(F.col(id_col), seeds, F.col("shingle"))
        .select(F.col(id_col), F.col("seed"), hashed.alias("h"))
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_band_signatures(sig_df: DataFrame, id_col: str = "doc_id",
                        bands: int = 4) -> DataFrame:
    """(id, band, band_sig): band_sig hashes the band's minhashes order-
    independently (sorted seed:minhash list) so engines need no ordered agg."""
    return (
        sig_df.withColumn("band", F.col("seed") % bands)
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "|",
                    F.sort_array(
                        F.collect_list(
                            F.concat_ws(":", F.col("seed").cast("string"),
                                        F.col("minhash"))
                        )
                    ),
                )
            ).alias("band_sig")
        )
    )


def minhash_lsh_candidate_pairs(df: DataFrame, text_col: str = "text",
                                id_col: str = "doc_id", n: int = 3,
                                num_hashes: int = 16,
                                bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs: documents sharing any LSH band signature.

    The band self-join is the scale path: shuffle on (band, band_sig) buckets
    only — never all-pairs. Returns distinct (id_a, id_b), id_a < id_b.
    """
    sh = word_shingles(df, text_col, id_col, n)
    sig = minhash_signatures(sh, id_col, num_hashes)
    band = lsh_band_signatures(sig, id_col, bands)
    a = band.select(F.col(id_col).alias("id_a"), "band", "band_sig")
    b = band.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    return (
        a.join(b, on=["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.2) -> DataFrame:
    """Exact Jaccard similarity over word n-gram sets for co-shingled pairs.

    |I| via shingle self-join (only pairs sharing ≥1 shingle are ever
    materialized), |U| = |A|+|B|-|I|. At scale, run on LSH candidates instead
    of all co-shingled pairs (compose with minhash_lsh_candidate_pairs).
    """
    sh = word_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash (48-bit, engine-portable)
# ---------------------------------------------------------------------------

SIMHASH_HEX_CHARS = 12  # 48 bits: stays clear of BIGINT sign even when summed


def _hex_val(char_expr: str) -> str:
    """SQL: hex char → 0..15 via position lookup (portable, no conv())."""
    return f"(locate({char_expr}, '0123456789abcdef') - 1)"


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """48-bit SimHash over whitespace tokens, weighted by occurrence count.

    Bit b of token-hash = bit (b%4) of hex char (b//4) of md5(token); sign-sum
    over tokens, bit set where the sum is positive. Pure arithmetic on md5 hex
    → identical in any engine; single explode + single groupBy shuffle.
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tok = (
        df.select(F.col(id_col), F.explode(words).alias("token"))
        .where(F.col("token") != "")
        .select(F.col(id_col), F.md5("token").alias("th"))
    )
    bit_sums = []
    for k in range(SIMHASH_HEX_CHARS):
        val = _hex_val(f"substring(th, {k + 1}, 1)")
        for j in range(4):
            bit = f"(CAST(floor({val} / {2 ** j}) AS BIGINT) % 2)"
            bit_sums.append(
                F.sum(F.expr(f"CASE WHEN {bit} = 1 THEN 1 ELSE -1 END"))
                .alias(f"s_{4 * k + j}")
            )
    sums = tok.groupBy(id_col).agg(*bit_sums)
    sim = None
    for i in range(4 * SIMHASH_HEX_CHARS):
        term = F.when(F.col(f"s_{i}") > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return sums.select(F.col(id_col), sim.alias("simhash"))


def simhash_duckdb_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB SQL computing the identical 48-bit SimHash (oracle emitter)."""
    bit_sums = []
    for k in range(SIMHASH_HEX_CHARS):
        val = f"(strpos('0123456789abcdef', substring(th, {k + 1}, 1)) - 1)"
        for j in range(4):
            bit = f"(CAST(floor({val} / {2 ** j}) AS BIGINT) % 2)"
            bit_sums.append(
                f"sum(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS s_{4 * k + j}"
            )
    terms = " + ".join(
        f"(CASE WHEN s_{i} > 0 THEN CAST({2 ** i} AS BIGINT) ELSE 0 END)"
        for i in range(4 * SIMHASH_HEX_CHARS)
    )
    return (
        f"WITH tok AS ("
        f" SELECT {id_col}, md5(t.token) AS th"
        f" FROM {table}, UNNEST(string_split_regex(lower(trim({text_col})), '\\s+')) AS t(token)"
        f" WHERE t.token <> ''"
        f"), sums AS ("
        f" SELECT {id_col}, {', '.join(bit_sums)} FROM tok GROUP BY {id_col}"
        f") SELECT {id_col}, {terms} AS simhash FROM sums"
    )
