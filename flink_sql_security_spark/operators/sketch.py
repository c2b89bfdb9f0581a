"""Distributed cardinality sketches: deterministic HyperLogLog.

The 100 TB profiling path for ``n_distinct``: ``profile_numeric``'s exact
path shuffles every distinct (column, value) pair — at 10⁹+ cardinality
that exchange is the job. An HLL sketch replaces it with a constant-size
state per column: the shuffle moves at most ``m`` (column, bucket, rho)
rows per map partition (map-side ``max`` combine), the reduce side merges
registers with another ``max``, and the estimate is O(m) arithmetic.
Registers are mergeable across partitions/days/tables — the same sketch
serves incremental profiling (union = register-wise max).

Unlike Spark's built-in ``approx_count_distinct`` (HLL++, engine-private
hash — not reproducible outside the JVM), this sketch is built from md5
so the DuckDB oracle computes bit-identical registers and estimates:
- 60-bit hash: first 15 hex chars of md5(value-as-string)
- bucket = low ``p`` bits; rho = leading-zero count of the remaining
  ``60-p`` bits + 1 (via ``length(bin(w))`` — integer-exact both engines)
- harmonic sum kept EXACT in BIGINT: sum of 2^(L+1-rho) ≤ m·2^52 < 2^63
  (one final double division; no float accumulation anywhere)
- standard small-range linear counting when est ≤ 2.5m and empty
  registers remain (Flajolet et al. 2007 thresholds)

Reference scope note: the reference engine (flink-sql-security) has no
sketching — this extends the pipeline-operator surface per the driver
brief (profiling at scale).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

HLL_P = 9                 # 2^9 = 512 registers
HLL_M = 1 << HLL_P
_L = 60 - HLL_P           # bits in the register stream w
_RHO_MAX = _L + 1         # rho when w == 0


def _alpha_m(m: int) -> float:
    # bias-correction constant, Flajolet et al. 2007 §4
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_registers(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, bucket, rho): merged HLL registers, one row per non-empty
    register. This is the mergeable sketch state — union two tables'
    registers and ``max`` again to sketch their union without rescanning
    either. The single shuffle is map-side-combined to ≤ m rows/column/task.

    ``cols`` should be integer/string-typed: values hash via their string
    rendering, and floating-point columns render differently across
    engines (Spark ``1.0E7`` vs DuckDB ``10000000.0``) — cast doubles to
    DECIMAL/STRING explicitly upstream if you must sketch them.
    """
    stacked = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    h = f"CAST(conv(substring(md5(val), 1, 15), 16, 10) AS BIGINT)"
    return (
        df.select(F.expr(f"stack({len(cols)}, {stacked})").alias("column", "val"))
        .where(F.col("val").isNotNull())
        .select(
            "column",
            F.expr(f"{h} % {HLL_M}").alias("bucket"),
            F.expr(
                f"CASE WHEN ({h} >= {HLL_M} AND shiftright({h}, {HLL_P}) > 0) "
                f"THEN {_RHO_MAX} - length(bin(shiftright({h}, {HLL_P}))) "
                f"ELSE {_RHO_MAX} END").alias("rho"),
        )
        .groupBy("column", "bucket").agg(F.max("rho").alias("rho"))
    )


def approx_distinct_hll(df: DataFrame, cols: list[str],
                        with_exact: bool = True) -> DataFrame:
    """(column, n_est[, n_exact, rel_err]) — HLL distinct estimate per column.

    ``with_exact`` adds the exact count and relative error for validation
    display; production profiling at >10⁹ cardinality drops it (the exact
    branch is precisely the distinct-pair shuffle the sketch avoids).
    """
    # harmonic sum Z = Σ 2^(-M_j), kept exact: S = Z·2^RHO_MAX in BIGINT
    # (non-empty register: 2^(RHO_MAX-rho); empty: 2^RHO_MAX; S ≤ m·2^52 < 2^62)
    c_lit = repr(_alpha_m(HLL_M) * HLL_M * HLL_M * float(1 << _RHO_MAX))
    est_raw = f"{c_lit} / CAST(s AS DOUBLE)"
    est = (
        f"CASE WHEN {est_raw} <= {2.5 * HLL_M} AND ({HLL_M} - present) > 0 "
        f"THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - present)) "
        f"ELSE {est_raw} END"
    )
    sketch = (
        hll_registers(df, cols)
        .groupBy("column").agg(
            F.expr(
                f"sum(shiftleft(CAST(1 AS BIGINT), {_RHO_MAX} - rho))").alias("s0"),
            F.count("*").alias("present"),
        )
        .select(
            "column", "present",
            F.expr(
                f"s0 + ({HLL_M} - present) * shiftleft(CAST(1 AS BIGINT), {_RHO_MAX})"
            ).alias("s"))
        .select("column",
                F.expr(f"CAST(round({est}) AS BIGINT)").alias("n_est"))
    )
    if not with_exact:
        return sketch
    stacked = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    exact = (
        df.select(F.expr(f"stack({len(cols)}, {stacked})").alias("column", "val"))
        .groupBy("column")
        .agg(F.count_distinct("val").alias("n_exact"))
    )
    joined = sketch.join(exact, "column")
    rel = (F.col("n_est").cast("double") - F.col("n_exact").cast("double")) \
        / F.col("n_exact").cast("double")
    return joined.select("column", "n_est", "n_exact",
                         F.round(rel, 4).alias("rel_err"))


def approx_distinct_hll_duckdb_sql(table: str, cols: list[str],
                                   with_exact: bool = True) -> str:
    """DuckDB SQL computing the identical sketch (oracle emitter)."""
    c_lit = repr(_alpha_m(HLL_M) * HLL_M * HLL_M * float(1 << _RHO_MAX))
    stacked = " UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", CAST({c} AS VARCHAR) AS val FROM {table}"
        for c in cols)
    h = "CAST(concat('0x', substring(md5(val), 1, 15)) AS BIGINT)"
    est_raw = f"{c_lit} / CAST(s AS DOUBLE)"
    est = (
        f"CASE WHEN {est_raw} <= {2.5 * HLL_M} AND ({HLL_M} - present) > 0 "
        f"THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - present)) "
        f"ELSE {est_raw} END"
    )
    sql = (
        f"WITH long AS ({stacked}), "
        f"hashed AS (SELECT \"column\", {h} % {HLL_M} AS bucket, "
        f"CASE WHEN ({h} >= {HLL_M} AND ({h} >> {HLL_P}) > 0) "
        f"THEN {_RHO_MAX} - length(bin({h} >> {HLL_P})) "
        f"ELSE {_RHO_MAX} END AS rho "
        f"FROM long WHERE val IS NOT NULL), "
        f"regs AS (SELECT \"column\", bucket, max(rho) AS rho "
        f"FROM hashed GROUP BY 1, 2), "
        f"agg AS (SELECT \"column\", "
        f"CAST(sum(1::BIGINT << ({_RHO_MAX} - rho)) AS BIGINT) AS s0, "
        f"CAST(count(*) AS BIGINT) AS present FROM regs GROUP BY 1), "
        f"est AS (SELECT \"column\", present, "
        f"s0 + ({HLL_M} - present) * (1::BIGINT << {_RHO_MAX}) AS s FROM agg), "
        f"sk AS (SELECT \"column\", CAST(round({est}) AS BIGINT) AS n_est FROM est)"
    )
    if not with_exact:
        return sql + " SELECT \"column\", n_est FROM sk"
    return (
        sql + f", ex AS (SELECT \"column\", "
        f"CAST(count(DISTINCT val) AS BIGINT) AS n_exact FROM long GROUP BY 1) "
        f"SELECT sk.\"column\", n_est, n_exact, "
        f"round((CAST(n_est AS DOUBLE) - CAST(n_exact AS DOUBLE)) "
        f"/ CAST(n_exact AS DOUBLE), 4) AS rel_err "
        f"FROM sk JOIN ex USING (\"column\")"
    )
