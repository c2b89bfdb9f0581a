"""Per-stage empirical profile of one (or a few) entries — guide §7.1.

Runs the named entries once (noop sink) in a session with the UI
enabled, then reads the UI REST API and prints every stage sorted by
wall duration with task count, shuffle read/write bytes, input bytes
and peak memory — the "which stage is slow, and is it compute or
shuffle" question the Spark UI answers, without a browser.

Usage: python tools/stage_profile.py [--sf 0.1] entry [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    args = sys.argv[1:]
    sf = "0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    sf_dir = sf if os.path.sep in sf else f"/root/testdata/sf{sf}"
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from flink_sql_security_spark.operators.cache import release
    from flink_sql_security_spark.sources import register_tables

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("stage-profile")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
             .config("spark.ui.enabled", "true")
             .config("spark.ui.retainedStages", "3000")
             .config("spark.ui.retainedJobs", "3000")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    register_tables(spark, sf_dir)
    spark.sql("SELECT count(*) AS n FROM region").collect()
    spark.range(32).repartition(32).mapInPandas(lambda it: it,
                                                "id long").count()
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    queries = entry.queries()

    def stages_now():
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.load(r)

    def jobs_now():
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            return json.load(r)

    for name in names:
        base_ids = {s["stageId"] for s in stages_now()}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        t_total = time.perf_counter() - t0
        release(df)
        time.sleep(1.0)
        st = [s for s in stages_now() if s["stageId"] not in base_ids]
        jobs = [j for j in jobs_now()
                if set(j.get("stageIds", [])) - base_ids]
        print(f"\n===== {name}: total={t_total:.2f}s "
              f"(driver build={t_build:.2f}s) "
              f"jobs={len(jobs)} stages={len(st)} =====")
        stage_wall = 0.0
        rows = []
        for s in st:
            dur = (s.get("executorRunTime", 0)) / 1000.0
            t_sub = s.get("submissionTime"); t_cmp = s.get("completionTime")
            wall = None
            if t_sub and t_cmp:
                fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
                try:
                    wall = (time.mktime(time.strptime(t_cmp, fmt))
                            - time.mktime(time.strptime(t_sub, fmt))
                            + (int(t_cmp[20:23]) - int(t_sub[20:23])) / 1e3)
                except Exception:
                    wall = None
            rows.append((s["stageId"], wall, dur, s.get("numTasks"),
                         s.get("inputBytes", 0) >> 20,
                         s.get("shuffleReadBytes", 0) >> 20,
                         s.get("shuffleWriteBytes", 0) >> 20,
                         (s.get("name") or "")[:60]))
            if wall:
                stage_wall += wall
        rows.sort(key=lambda r: -(r[1] or 0))
        print(f"  sum(stage wall)={stage_wall:.2f}s   "
              "(gaps to total = driver/planning/broadcast time)")
        print("  stage   wall_s  exec_s tasks  in_MB shR_MB shW_MB  name")
        for r in rows[:25]:
            print(f"  {r[0]:>5} {r[1] if r[1] is not None else -1:>8.2f} "
                  f"{r[2]:>7.1f} {r[3]:>5} {r[4]:>6} {r[5]:>6} {r[6]:>6}  {r[7]}")
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
