#!/usr/bin/env python
"""Per-job wall-time profile of one or more registry queries.

Runs each named query exactly the way bench.py does (shared session,
noop sink, warmup + timed rep) with the Spark event log enabled, then
parses the event log to attribute wall time: one line per job (job id,
duration, description/call site) plus per-query totals — the "which of
the 40 jobs inside this query is slow" view the disabled local UI
would otherwise give.

Usage: python scripts/profile_query.py query [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")

    import shutil

    evdir = "/tmp/spark-events-profile"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)

    from pyspark.sql import SparkSession

    from northwind_etl_spark.plans.queries import QUERIES
    from northwind_etl_spark.session import session_confs

    builder = (
        SparkSession.builder.appName("profile-query")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.ui.enabled", "false")
    )
    for k, v in session_confs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spans: dict[str, tuple[float, float]] = {}
    for name in names:
        # warmup (cache build, codegen)
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(f"PROFILE::{name}")
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t1 = time.time()
        spark.sparkContext.setJobDescription(None)
        spans[name] = (t0 * 1000, t1 * 1000)
        print(f"## {name}: {t1 - t0:.3f}s wall (timed rep)", flush=True)

    spark.stop()

    # parse the event log (Spark 4 rolling logs are directories)
    logs = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            if not f.startswith(".") and "appstatus" not in f:
                logs.append(os.path.join(root, f))
    jobs: list[dict] = []
    starts: dict[int, dict] = {}
    for lf in logs:
        with open(lf) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    starts[ev["Job ID"]] = {
                        "t0": ev["Submission Time"],
                        "desc": props.get("spark.job.description", ""),
                        "callsite": props.get("callSite.short", ""),
                        "nstages": len(ev.get("Stage IDs", [])),
                    }
                elif ev.get("Event") == "SparkListenerJobEnd":
                    j = starts.get(ev["Job ID"])
                    if j is not None:
                        jobs.append(
                            {
                                "id": ev["Job ID"],
                                "t0": j["t0"],
                                "t1": ev["Completion Time"],
                                "desc": j["desc"],
                                "callsite": j["callsite"],
                                "nstages": j["nstages"],
                            }
                        )

    for name, (w0, w1) in spans.items():
        tag = f"PROFILE::{name}"
        mine = sorted(
            (j for j in jobs if j["desc"] == tag and j["t0"] >= w0 - 1000),
            key=lambda j: j["t0"],
        )
        total = sum(j["t1"] - j["t0"] for j in mine)
        gaps = (w1 - w0) - total
        print(f"\n=== {name}: {len(mine)} jobs, {total/1000:.3f}s in jobs, "
              f"{gaps/1000:.3f}s outside jobs (planning/driver), "
              f"{(w1-w0)/1000:.3f}s wall ===")
        for j in mine:
            print(
                f"  job {j['id']:>4}  {(j['t1']-j['t0'])/1000:7.3f}s  "
                f"stages={j['nstages']:>2}  {j['callsite']}"
            )


if __name__ == "__main__":
    main()
