"""Lexical retrieval over a document corpus: BM25 scoring / top-k.

The keyword-search primitive of a corpus-curation pipeline — "pull the
documents most relevant to these probe terms" (targeted decontamination,
topic-slice extraction, eval-set mining). Not present in the reference
(flink-sql-security has no retrieval surface); built Spark-first on the
same tokenizer contract as ``functions/text.py`` so vocabularies line up
across the text tier.

Scale design (100 TB corpus):

- The query-term filter lands IMMEDIATELY after the explode, before any
  shuffle — only rows whose token is in the (tiny, literal) term list
  survive, so the big shuffle moves ~|terms|/|vocab| of the token stream.
- One explicit ``repartition(doc_id)`` up front; both downstream
  aggregations (per-doc-term tf, per-doc score fold) reuse that hash
  partitioning (``HashPartitioning(doc_id)`` satisfies the clustered
  distribution of a superset grouping key), so the whole score pipeline
  is a single exchange.
- Document-frequency stats are |terms| rows — broadcast back, never a
  shuffle join.
- Corpus stats (N, avgdl) resolve driver-side once from exact integer
  aggregates, so plans carry literals rather than scalar-subquery
  re-scans.
- The final top-k is a row_number window over score — k is small, Spark
  plans the usual rank-filter; no global sort materialization of the
  corpus.

Float parity with the DuckDB oracle: per-(doc, term) scores round to 6
decimals (ln() agreement precision, same as tf·idf), and the per-doc
total folds the per-term columns in FIXED term order — left-associated
addition in both engines — so no engine-dependent summation order exists
anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .cache import attach

_WS = r"\s+"


def _term_col(term: str) -> str:
    return "s_" + "".join(ch if ch.isalnum() else "_" for ch in term)


def bm25_topk(df, terms, k: int = 20, *, text_col: str = "text",
              id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75,
              stats: tuple[int, float] | None = None):
    """Top-k documents by BM25 against a fixed bag of query ``terms``.

    Returns (id_col, dl, <s_term...>, score, rank) — dl is the document
    token length, s_<term> the per-term partial scores (rounded to 6),
    score their fixed-order sum, rank the dense 1..k ordering (ties break
    on doc_id for determinism).

    ``stats`` may pre-supply (n_docs, avgdl) to skip the driver-side
    stats job when the caller already profiled the corpus.
    """
    terms = list(terms)
    if not terms:
        raise ValueError("bm25_topk requires at least one query term")
    if len(set(terms)) != len(terms):
        raise ValueError(f"duplicate query terms: {terms}")

    toks_all = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), _WS), lambda t: t != "")
    with_dl = df.select(F.col(id_col), F.size(toks_all).alias("dl"),
                        F.col(text_col))

    if stats is None:
        row = with_dl.agg(
            F.count("*").alias("n"), F.sum("dl").alias("total")).collect()[0]
        n_docs = int(row["n"])
        avgdl = int(row["total"]) / n_docs  # exact ints -> one IEEE divide
    else:
        n_docs, avgdl = int(stats[0]), float(stats[1])

    toks = (
        with_dl.repartition(F.col(id_col))
        .select(F.col(id_col), F.col("dl"),
                F.explode(F.split(F.lower(F.trim(F.col(text_col))), _WS))
                .alias("token"))
        # selective filter BEFORE the shuffle: only query terms survive
        .where(F.col("token").isin(terms))
    )
    # persist the (tiny: <= |docs|·|terms| rows) tf table so the
    # document-frequency aggregate reuses it instead of re-scanning and
    # re-exploding the full corpus in a second subtree
    tf = (toks.groupBy(id_col, "dl", "token")
          .agg(F.count("*").alias("tf")).persist())
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))

    # Robertson-Sparck-Jones idf (the "+1" variant, always positive), and
    # the classic BM25 tf saturation with length normalization.  Every
    # fractional literal and paren is mirrored verbatim in the SQL oracle.
    idf = F.log(((F.lit(n_docs) - F.col("df")) + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    norm = F.col("tf") + (F.lit(k1) * ((F.lit(1.0 - b))
                                       + (F.lit(b) * (F.col("dl") / F.lit(avgdl)))))
    score = F.round(idf * ((F.col("tf") * F.lit(k1 + 1.0)) / norm), 6)

    scored = tf.join(F.broadcast(dfreq), "token").withColumn("s", score)

    # fixed-order fold: one conditional-max column per term, added
    # left-to-right in the caller's term order on BOTH engines
    aggs = [F.max(F.when(F.col("token") == t, F.col("s")))
            .alias(_term_col(t)) for t in terms]
    per_doc = scored.groupBy(id_col, "dl").agg(*aggs)
    total = F.coalesce(F.col(_term_col(terms[0])), F.lit(0.0))
    for t in terms[1:]:
        total = total + F.coalesce(F.col(_term_col(t)), F.lit(0.0))
    per_doc = per_doc.withColumn("score", F.round(total, 6))

    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    out = (per_doc.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") <= k))
    return attach(out, tf)


def bm25_topk_sql(terms, k: int = 20, *, table: str = "documents",
                  text_col: str = "text", id_col: str = "doc_id",
                  k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB SQL computing the identical BM25 top-k (strict oracle).

    Fractional literals are CAST AS DOUBLE (DuckDB parses bare decimals
    as DECIMAL); stats come from exact integer aggregates with the same
    single IEEE division as the Spark driver side.
    """
    terms = list(terms)
    term_list = ", ".join(f"'{t}'" for t in terms)

    def d(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    s_cols = ", ".join(
        f"max(CASE WHEN token = '{t}' THEN s END) AS {_term_col(t)}"
        for t in terms)
    total = f"coalesce({_term_col(terms[0])}, {d(0.0)})"
    for t in terms[1:]:
        total = f"{total} + coalesce({_term_col(t)}, {d(0.0)})"
    out_cols = ", ".join(_term_col(t) for t in terms)

    return (
        f"WITH dls AS (SELECT {id_col}, len(list_filter("
        f"string_split_regex(lower(trim({text_col})), '{_WS}'), "
        f"t -> t <> '')) AS dl, {text_col} FROM {table}), "
        f"stats AS (SELECT count(*) AS n_docs, "
        f"CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl "
        f"FROM dls), "
        f"toks AS (SELECT {id_col}, dl, t.token FROM dls, "
        f"UNNEST(string_split_regex(lower(trim({text_col})), '{_WS}')) "
        f"AS t(token) WHERE t.token IN ({term_list})), "
        f"tf AS (SELECT {id_col}, dl, token, count(*) AS tf FROM toks "
        f"GROUP BY {id_col}, dl, token), "
        f"dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token), "
        f"scored AS (SELECT tf.{id_col}, tf.dl, tf.token, "
        f"round(ln(((n_docs - df) + {d(0.5)}) / (df + {d(0.5)}) + {d(1.0)}) "
        f"* ((tf * {d(k1 + 1.0)}) / (tf + ({d(k1)} * ({d(1.0 - b)} "
        f"+ ({d(b)} * (dl / avgdl)))))), 6) AS s "
        f"FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN stats), "
        f"per_doc AS (SELECT {id_col}, dl, {s_cols} FROM scored "
        f"GROUP BY {id_col}, dl), "
        f"totaled AS (SELECT {id_col}, dl, {out_cols}, "
        f"round({total}, 6) AS score FROM per_doc), "
        f"ranked AS (SELECT *, row_number() OVER "
        f"(ORDER BY score DESC, {id_col}) AS rank FROM totaled) "
        f"SELECT * FROM ranked WHERE rank <= {k}"
    )
