"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a handful of hot keys (one customer with 10⁹ orders, the empty
string, NULL-ish sentinels) turn a single shuffle partition into the job's
critical path. AQE's skew-join handling (enabled in ``sources.build_session``)
covers sort-merge joins; these helpers cover the two cases AQE does not:
hot-key *aggregation* and broadcast-averse skewed joins.

Both are deterministic: the salt comes from hashing stable columns, not RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_groupby_count(df: DataFrame, key_cols: list[str],
                         salt_buckets: int = 16) -> DataFrame:
    """Two-phase count: groupBy(key, salt) → groupBy(key).

    Phase 1 spreads each hot key over ``salt_buckets`` partitions; phase 2
    combines ``salt_buckets`` tiny partials per key. Use when one key holds
    >~1/shuffle-partitions of all rows; for uniform keys plain groupBy's
    map-side combine is already optimal.
    """
    salt = (F.abs(F.hash(*[F.col(c) for c in key_cols], F.monotonically_increasing_id()))
            % salt_buckets).alias("_salt")
    partial = (
        df.select(*key_cols, salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias("cnt"))


def salted_groupby_agg(df: DataFrame, key_cols: list[str],
                       agg_col: str, salt_buckets: int = 16) -> DataFrame:
    """Two-phase sum/count/min/max over a skewed key (decomposable aggs)."""
    salt = (F.abs(F.hash(*[F.col(c) for c in key_cols], F.monotonically_increasing_id()))
            % salt_buckets).alias("_salt")
    partial = (
        df.select(*key_cols, agg_col, salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.sum(agg_col).alias("_sum"),
            F.count(agg_col).alias("_cnt"),
            F.min(agg_col).alias("_min"),
            F.max(agg_col).alias("_max"),
        )
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_sum").alias(f"sum_{agg_col}"),
        F.sum("_cnt").alias(f"count_{agg_col}"),
        F.min("_min").alias(f"min_{agg_col}"),
        F.max("_max").alias(f"max_{agg_col}"),
    )


def salted_join(left: DataFrame, right: DataFrame, on: str,
                salt_buckets: int = 8, how: str = "inner") -> DataFrame:
    """Skewed fact ⋈ dim without broadcast: salt the skewed (left) side,
    replicate the right side ``salt_buckets`` times, join on (key, salt).

    Replication cost is |right| × salt_buckets — use when the right side is
    too big to broadcast but small enough to replicate; otherwise prefer AQE
    skew-join or isolating the hot keys into a separate broadcast join.
    """
    salted_left = left.withColumn(
        "_salt",
        F.abs(F.hash(F.col(on), F.monotonically_increasing_id())) % salt_buckets,
    )
    exploded_right = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return (
        salted_left.join(exploded_right, on=[on, "_salt"], how=how)
        .drop("_salt")
    )
