"""Association-rule mining over baskets: pairwise support, confidence,
and lift.

The market-basket readout over the same co-occurrence structure the
graph tier ranks (`triangle_count` / `label_propagation` find WHERE
the dense neighborhoods are; this op quantifies HOW predictive each
co-occurrence is): for every ordered item pair (a → b) that clears a
support floor, ``confidence = P(b|a)`` and ``lift = P(a,b) /
(P(a)·P(b))``. The classic retail/recsys primitive (Agrawal &
Srikant 1994's Apriori measures, restricted to pairs — the 2-itemset
level is where distributed basket analysis lives; deeper levels
explode combinatorially and are built by iterating this op on
filtered baskets).

Scale design: items are deduped per basket first (one (basket, item)
distinct — map-side combinable), pair counts come from ONE self-join
on the basket key restricted to ``item_a < item_b`` (each unordered
pair counted once; the join is basket-keyed, so a hot basket is the
only skew source — cap basket size upstream if a pathological basket
exists, standard practice since a B-item basket emits B²/2 pairs),
item supports are one aggregation, and both directions derive
per-row from one pair count. The support floor applies BEFORE the
confidence/lift projection, so the expensive tail never materializes.
Counts are BIGINTs; confidence and lift are each ONE floor-rounded
IEEE divide of exact integers → strict oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import floor_round, floor_round_col


def basket_rules(df: DataFrame, *, basket_col: str, item_col: str,
                 min_support: int = 2,
                 broadcast_items_limit: int = 5_000_000) -> DataFrame:
    """(antecedent, consequent, n_pair, n_ante, n_cons, confidence,
    lift) for every ordered pair with pair support ≥ ``min_support``.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1: {min_support}")
    bi = (df.select(F.col(basket_col).alias("b"),
                    F.col(item_col).alias("i"))
          .where(F.col("i").isNotNull() & F.col("b").isNotNull())
          .distinct().persist())
    # one pass over the persisted pairs for BOTH cardinalities: the
    # basket total (a lift literal) and the item count (the broadcast
    # gate — a billion-item catalog keeps the scale-safe shuffle join)
    n_baskets, n_items = bi.agg(
        F.countDistinct("b"), F.countDistinct("i")).collect()[0]
    item_n = bi.groupBy("i").agg(F.count("*").alias("n_i"))

    def hint(frame):
        return (F.broadcast(frame) if n_items <= broadcast_items_limit
                else frame)
    a, c = bi.alias("a"), bi.alias("c")
    pairs = (a.join(c, (F.col("a.b") == F.col("c.b"))
                    & (F.col("a.i") < F.col("c.i")))
             .groupBy(F.col("a.i").alias("x"), F.col("c.i").alias("y"))
             .agg(F.count("*").alias("n_pair"))
             .where(F.col("n_pair") >= min_support))
    both = (pairs.select(F.col("x").alias("antecedent"),
                         F.col("y").alias("consequent"), "n_pair")
            .union(pairs.select(F.col("y").alias("antecedent"),
                                F.col("x").alias("consequent"),
                                "n_pair")))
    na = item_n.select(F.col("i").alias("antecedent"),
                       F.col("n_i").alias("n_ante"))
    nc = item_n.select(F.col("i").alias("consequent"),
                       F.col("n_i").alias("n_cons"))
    out = (both.join(hint(na), "antecedent")
           .join(hint(nc), "consequent")
           .select(
               "antecedent", "consequent", "n_pair", "n_ante", "n_cons",
               floor_round_col(
                   F.col("n_pair").cast("double")
                   / F.col("n_ante").cast("double")).alias("confidence"),
               floor_round_col(
                   (F.col("n_pair").cast("double")
                    * F.lit(float(n_baskets)))
                   / (F.col("n_ante").cast("double")
                      * F.col("n_cons").cast("double"))).alias("lift")))
    from .cache import attach
    return attach(out, bi)


def basket_rules_duckdb_sql(table: str, *, basket_col: str,
                            item_col: str,
                            min_support: int = 2) -> str:
    """DuckDB SQL twin of :func:`basket_rules` (oracle): identical
    distinct / self-join / count / divide chain. The basket total is
    computed in-query (a scalar subquery) with the same integer value
    the Spark side folds as a literal."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1: {min_support}")
    conf = floor_round("CAST(n_pair AS DOUBLE) / CAST(na.n_i AS DOUBLE)",
                       6, "duckdb")
    lift = floor_round(
        "(CAST(n_pair AS DOUBLE) * nb.n) "
        "/ (CAST(na.n_i AS DOUBLE) * CAST(nc.n_i AS DOUBLE))",
        6, "duckdb")
    return f"""
WITH bi AS (
  SELECT DISTINCT {basket_col} AS b, {item_col} AS i FROM {table}
  WHERE {item_col} IS NOT NULL AND {basket_col} IS NOT NULL),
nb AS (SELECT CAST(count(DISTINCT b) AS DOUBLE) AS n FROM bi),
item_n AS (SELECT i, CAST(count(*) AS BIGINT) AS n_i FROM bi GROUP BY i),
pairs AS (
  SELECT a.i AS x, c.i AS y, CAST(count(*) AS BIGINT) AS n_pair
  FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
  GROUP BY 1, 2 HAVING count(*) >= {min_support}),
both_dirs AS (
  SELECT x AS antecedent, y AS consequent, n_pair FROM pairs
  UNION ALL
  SELECT y AS antecedent, x AS consequent, n_pair FROM pairs)
SELECT antecedent, consequent, n_pair,
       na.n_i AS n_ante, nc.n_i AS n_cons,
       {conf} AS confidence,
       {lift} AS lift
FROM both_dirs
JOIN item_n na ON na.i = antecedent
JOIN item_n nc ON nc.i = consequent
CROSS JOIN nb
""".strip()
