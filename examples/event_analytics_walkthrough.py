"""Event analytics, end to end — executable documentation of the
round-9 event/graph tier composing over one stream.

A product/ops team pointed at the raw ``events`` changelog asks the
same five questions in sequence; each stage below is individually
strict-oracle-checked by its own driver entry, and this walkthrough
pins the COMPOSITION:

1. **data QA** — ``robust_outliers``: median/MAD corruption flags on
   the value column (the moments-free gate that still works when the
   corruption is what inflated the moments);
2. **conversion** — ``funnel``: earliest view→click→purchase chain per
   user within 72h of entry;
3. **churn** — ``retention_cohorts``: weekly first-activity cohorts ×
   fraction still active;
4. **history** — ``scd2_history``: the warehouse Type-2 version table
   (every value change with validity intervals), whose ``is_current``
   slice equals ``upsert_latest`` by construction;
5. **regularization** — ``resample_ffill``: the join-free hourly
   forward-fill that feeds any downstream sequence model;
6. **structure** — ``triangle_count`` + ``label_propagation`` over the
   part co-purchase graph (which products cluster together, and how
   tightly);
7. **prediction** — ``basket_rules``: which co-purchases are actually
   predictive (confidence/lift over the same baskets);
8. **reach + influence** — ``bfs_levels`` (3-hop radius of a seed
   customer set) and weighted ``pagerank`` (trade-volume edge weights);
9. **features** — ``feature_scale``: decimal-exact per-type z-scores
   of the event values, ready to mix into a model.

Everything is carried values, integer counts, or floor-rounded finals
— deterministic on any cluster layout.

Run: python examples/event_analytics_walkthrough.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(spark, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from pyspark.sql import functions as F

    from flink_sql_security_spark.operators.cdc import scd2_history
    from flink_sql_security_spark.operators.funnel import funnel
    from flink_sql_security_spark.operators.graph import (
        label_propagation, triangle_count)
    from flink_sql_security_spark.operators.profile import robust_outliers
    from flink_sql_security_spark.operators.timeseries import (
        resample_ffill, retention_cohorts)
    from flink_sql_security_spark.sources import register_tables

    register_tables(spark, sf_dir)
    events = spark.table("events")

    # 1. QA: flag corrupted values before anything downstream reads them
    flags = robust_outliers(events, value_col="value",
                            group_cols=["event_type"],
                            id_cols=["event_id"], k=3.0)
    n_flags = flags.count()

    # 2. conversion funnel on the cleaned stream (drop flagged rows —
    #    the composition point: QA output keys directly into the scan)
    bad = flags.select("event_id")
    clean = events.join(bad, "event_id", "left_anti")
    depths = {r["depth"]: r["n"] for r in funnel(
        clean, ["view", "click", "purchase"], within_hours=72)
        .groupBy("depth").agg(F.count("*").alias("n")).collect()}

    # 3. weekly retention of high-value purchasers
    ret_rows = retention_cohorts(
        clean.where("event_type = 'purchase' AND value > 100")).collect()
    first_cohort = min(r["cohort_period"] for r in ret_rows)
    curve = {r["period_offset"]: r["retention"]
             for r in ret_rows if r["cohort_period"] == first_cohort}

    # 4. SCD2 history; its current slice is the live state table
    hist = scd2_history(clean, ["user_id"], "ts", ["value"],
                        op_col="event_type", delete_op="error",
                        tiebreak_cols=["event_id"])
    n_versions = hist.count()
    n_current = hist.where("is_current").count()

    # 5. hourly forward-fill of the purchase value series
    grid = resample_ffill(clean.where("event_type = 'purchase'"))
    fill_frac = grid.agg(F.avg(F.col("filled").cast("double"))) \
        .collect()[0][0]

    # 6. co-purchase structure: triangles (density) + LPA (communities)
    li = spark.table("lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
             .select(F.col("a.l_partkey").alias("src"),
                     F.col("b.l_partkey").alias("dst")))
    tri = triangle_count(edges)
    n_closed = tri.where("triangles > 0").count()
    comms = label_propagation(edges, iters=3)
    n_comms = comms.select("community").distinct().count()

    # 7. predictive co-purchases over the same baskets
    from flink_sql_security_spark.operators.assoc import basket_rules
    top_rule = (basket_rules(li, basket_col="l_orderkey",
                             item_col="l_partkey", min_support=2)
                .orderBy(F.desc("lift"), "antecedent", "consequent")
                .select("confidence", "lift").first())

    # 8. reach (3-hop BFS radius) and influence (volume-weighted rank)
    from flink_sql_security_spark.operators.graph import bfs_levels, pagerank
    trade = (spark.table("orders")
             .join(spark.table("lineitem"),
                   F.col("o_orderkey") == F.col("l_orderkey"))
             .groupBy(F.col("o_custkey").alias("src"),
                      (F.col("l_suppkey") + F.lit(1000000)).alias("dst"))
             .agg(F.count("*").alias("w")))
    sym = trade.select("src", "dst").union(
        trade.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    n_reach = bfs_levels(sym, [1, 2, 3], max_hops=2).count()
    top_supplier = (pagerank(trade, iters=3, weight_col="w")
                    .where("node > 1000000")
                    .orderBy("rank_pos").first()["node"])

    # 9. decimal-exact per-type z-scores of the event values
    from flink_sql_security_spark.operators.profile import feature_scale
    z = feature_scale(clean, value_col="value",
                      group_cols=["event_type"], id_cols=["event_id"])
    z_extremes = z.where("abs(scaled) > 3").count()

    return {"n_flags": n_flags, "depths": depths, "curve": curve,
            "n_versions": n_versions, "n_current": n_current,
            "fill_frac": fill_frac, "n_closed": n_closed,
            "n_comms": n_comms, "top_rule": top_rule,
            "n_reach": n_reach, "top_supplier": top_supplier,
            "z_extremes": z_extremes}


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark)
    print(f"QA flags: {out['n_flags']}")
    print(f"funnel depths: {out['depths']}")
    print(f"first-cohort retention curve: {out['curve']}")
    print(f"SCD2: {out['n_versions']} versions, {out['n_current']} current")
    print(f"gap-fill carried fraction: {out['fill_frac']:.3f}")
    print(f"co-purchase: {out['n_closed']} parts in triangles, "
          f"{out['n_comms']} communities")
    if out["top_rule"] is not None:
        print(f"top rule: conf={out['top_rule']['confidence']:.2f} "
              f"lift={out['top_rule']['lift']:.1f}")
    else:
        # a tiny or filtered sf_dir can leave no pair over min_support
        print("top rule: none cleared min_support on this fixture")
    print(f"2-hop reach of 3 seed customers: {out['n_reach']} nodes; "
          f"top weighted supplier: {out['top_supplier']}")
    print(f"post-QA |z|>3 extremes: {out['z_extremes']}")
    spark.stop()


if __name__ == "__main__":
    main()
