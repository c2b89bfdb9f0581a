"""Privacy guards beyond the reference's row-filter/mask pair:
k-anonymity suppression and the anonymity audit report.

The reference's surface controls WHO sees WHICH rows/columns
(row-level security, column masking). Release-time privacy needs the
third classic primitive: a released dataset is k-ANONYMOUS over its
quasi-identifier columns (Sweeney 2002) when every combination of
quasi-identifier values — every *equivalence class* — contains at
least k rows, so no released row narrows an individual below a crowd
of k. l-DIVERSITY (Machanavelli et al. 2007) additionally requires
each class to carry ≥ l distinct sensitive values, closing the
homogeneity attack k-anonymity alone allows (a class of k rows that
all share one diagnosis still leaks it).

Spark-first shape: ONE groupBy over the quasi-identifier columns
computes class sizes (and distinct-sensitive counts); suppression is
a broadcast-friendly join back on the class key (AQE picks broadcast
for the class table — |classes| ≤ |rows| and usually ≪). Nothing
Python, nothing quadratic; integer counts end to end → strict oracle.
At 100 TB the class table is the only reused artifact — compute it
once per release, audit and suppress from the same frame.

Composes with the reference surface: run `k_anonymize` AFTER the
row-filter/mask rewrite (the entry corpus does) so the released set
is simultaneously policy-filtered, masked, and k-anonymous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _check_cols(quasi_cols) -> list[str]:
    quasi_cols = list(quasi_cols)
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if len(set(quasi_cols)) != len(quasi_cols):
        raise ValueError(f"duplicate quasi_cols: {quasi_cols!r}")
    return quasi_cols


def k_anonymize(df: DataFrame, quasi_cols, k: int,
                sensitive_col: str | None = None,
                l: int | None = None) -> DataFrame:
    """Rows whose quasi-identifier equivalence class has ≥ k members
    (and, when ``sensitive_col``/``l`` are given, ≥ l distinct
    sensitive values) — the standard suppression release: classes too
    small (or too homogeneous) to hide in are dropped entirely.

    NULL quasi-identifier values form their own class per column (the
    groupBy convention on both engines), so "unknown" is a crowd too.
    Output keeps the input schema and row content untouched — this is
    a row gate, not a transform; pair with the mask library when the
    release also needs generalization.
    """
    quasi_cols = _check_cols(quasi_cols)
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if (sensitive_col is None) != (l is None):
        raise ValueError("sensitive_col and l must be given together")
    aggs = [F.count("*").alias("_class_n")]
    if sensitive_col is not None:
        if l < 1:
            raise ValueError(f"l must be >= 1: {l}")
        aggs.append(F.countDistinct(sensitive_col).alias("_class_l"))
    classes = df.groupBy(*quasi_cols).agg(*aggs)
    keep = classes.where(F.col("_class_n") >= k)
    if sensitive_col is not None:
        keep = keep.where(F.col("_class_l") >= l)
    cols = df.columns
    # null-safe join on every quasi column: NULL classes must match
    # themselves (a plain equi-join would drop them unseen)
    out = df.alias("r").join(
        keep.alias("c"),
        [F.col(f"r.{q}").eqNullSafe(F.col(f"c.{q}"))
         for q in quasi_cols])
    return out.select(*[F.col(f"r.{c}") for c in cols])


def k_anonymize_duckdb_sql(table: str, quasi_cols, k: int,
                           select_cols: list[str],
                           sensitive_col: str | None = None,
                           l: int | None = None) -> str:
    """DuckDB SQL twin of :func:`k_anonymize` (oracle): identical
    class aggregation + null-safe gate."""
    quasi_cols = _check_cols(quasi_cols)
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if (sensitive_col is None) != (l is None):
        raise ValueError("sensitive_col and l must be given together")
    qs = ", ".join(quasi_cols)
    lsel = (f", count(DISTINCT {sensitive_col}) AS _class_l"
            if sensitive_col else "")
    lgate = f" AND _class_l >= {l}" if sensitive_col else ""
    on = " AND ".join(
        f"r.{q} IS NOT DISTINCT FROM c.{q}" for q in quasi_cols)
    cols = ", ".join(f"r.{c}" for c in select_cols)
    return (
        f"WITH classes AS (SELECT {qs}, count(*) AS _class_n{lsel} "
        f"FROM {table} GROUP BY {qs}) "
        f"SELECT {cols} FROM {table} r JOIN classes c ON {on} "
        f"WHERE _class_n >= {k}{lgate}")


def anonymity_report(df: DataFrame, quasi_cols,
                     sensitive_col: str | None = None) -> DataFrame:
    """One-row release audit: (n_rows, n_classes, k_effective,
    l_effective, singleton_classes, singleton_rows_pct) — the numbers
    a data-release review actually asks for. ``k_effective`` = the
    SMALLEST equivalence class (the dataset is k-anonymous for every
    k ≤ k_effective); ``l_effective`` = the smallest per-class
    distinct-sensitive count (NULL when no ``sensitive_col``);
    singleton classes are the immediately re-identifiable rows.
    Integer counts + one floor-rounded percentage → strict oracle.
    Two aggregations total (per-class, then global) on one exchange
    chain."""
    from ..functions.text import floor_round_col

    quasi_cols = _check_cols(quasi_cols)
    aggs = [F.count("*").alias("_n")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("_l"))
    classes = df.groupBy(*quasi_cols).agg(*aggs)
    l_eff = (F.min("_l").cast("bigint") if sensitive_col is not None
             else F.lit(None).cast("bigint"))
    return classes.agg(
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.count("*").alias("n_classes"),
        F.min("_n").cast("bigint").alias("k_effective"),
        l_eff.alias("l_effective"),
        F.sum((F.col("_n") == 1).cast("bigint"))
        .alias("singleton_classes"),
        floor_round_col(
            F.sum(F.when(F.col("_n") == 1, F.col("_n"))
                  .otherwise(F.lit(0))).cast("double") * 100.0
            / F.sum("_n").cast("double")).alias("singleton_rows_pct"))


def anonymity_report_duckdb_sql(table: str, quasi_cols,
                                sensitive_col: str | None = None) -> str:
    """DuckDB SQL twin of :func:`anonymity_report` (oracle)."""
    from ..functions.text import floor_round

    quasi_cols = _check_cols(quasi_cols)
    qs = ", ".join(quasi_cols)
    lsel = (f", count(DISTINCT {sensitive_col}) AS _l"
            if sensitive_col else "")
    l_eff = ("CAST(min(_l) AS BIGINT)" if sensitive_col
             else "CAST(NULL AS BIGINT)")
    pct = floor_round(
        "CAST(sum(CASE WHEN _n = 1 THEN _n ELSE 0 END) AS DOUBLE) "
        "* 100.0 / CAST(sum(_n) AS DOUBLE)", 6, "duckdb")
    return (
        f"WITH classes AS (SELECT {qs}, count(*) AS _n{lsel} "
        f"FROM {table} GROUP BY {qs}) "
        f"SELECT CAST(sum(_n) AS BIGINT) AS n_rows, "
        f"CAST(count(*) AS BIGINT) AS n_classes, "
        f"CAST(min(_n) AS BIGINT) AS k_effective, "
        f"{l_eff} AS l_effective, "
        f"CAST(sum(CASE WHEN _n = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS singleton_classes, "
        f"{pct} AS singleton_rows_pct "
        f"FROM classes")
