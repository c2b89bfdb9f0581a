"""Dedicated-protocol measurement + plan capture for optimization work.

For each named entry: ONE fresh-process-equivalent measurement under the
BASELINE dedicated protocol (fresh SparkSession, untimed warm-up run,
then N timed runs through the noop sink — guide §1.4 — with the cache
hygiene bench.py applies between runs), and optionally the
``explain("formatted")`` text written to ``plans/$SPARK_GRAFT_PLAN_ROUND (default r12)/<entry>_<tag>.txt``.

Machine drift on this host is large (BASELINE.md: same-code pagerank
5.2 → 10.2 s across hours), so before/after numbers are only comparable
when taken back-to-back; this tool exists to make those paired runs
one command.

Usage:
  python tools/opt_measure.py [--sf 0.1] [--runs 3] [--plans TAG] \
                              [--json OUT.json] entry [entry ...]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    args = sys.argv[1:]
    sf = "0.1"
    runs = 3
    plans_tag = None
    json_out = None
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf = args[i + 1]; i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--plans":
            plans_tag = args[i + 1]; i += 2
        elif args[i] == "--json":
            json_out = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    sf_dir = sf if os.path.sep in sf else f"/root/testdata/sf{sf}"
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir

    import __spark_entry__ as entry
    from flink_sql_security_spark.operators.cache import release
    from flink_sql_security_spark.sources import build_session, register_tables

    queries = entry.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")

    spark = build_session("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, sf_dir)
    spark.sql("SELECT count(*) AS n FROM region").collect()
    spark.range(32).repartition(32).mapInPandas(lambda it: it,
                                                "id long").count()

    def hygiene():
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()

    results = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"opt:{name}:warmup")
        df = fn(spark, sf_dir)
        if plans_tag:
            plan_dir = os.path.join(repo, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12"))
            os.makedirs(plan_dir, exist_ok=True)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(os.path.join(plan_dir,
                                   f"{name}_{plans_tag}.txt"), "w") as fh:
                fh.write(txt)
        _force(df)
        release(df)
        hygiene()
        times = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"opt:{name}:run{r}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            _force(df)
            times.append(round(time.perf_counter() - t0, 3))
            release(df)
            hygiene()
        results[name] = {"min": min(times), "times": times}
        print(f"{name}: min={min(times):.3f}s  {times}", flush=True)

    if json_out:
        with open(json_out, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
