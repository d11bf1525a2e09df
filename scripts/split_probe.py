#!/usr/bin/env python
"""Build-vs-exec split probe: time QUERIES[name](spark, sf_dir) (plan
construction — py4j + Catalyst-visible driver work) separately from
the noop save (planning + execution), the r12 measurement that exposed
the literal-array driver cost.  Warm rep after one warmup, like
bench.py.

Usage: python scripts/split_probe.py query [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")

    from northwind_etl_spark.plans.queries import QUERIES
    from northwind_etl_spark.session import get_spark

    spark = get_spark("split-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warmup
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        print(
            f"{name}: build {t1 - t0:.3f}s  exec {t2 - t1:.3f}s  "
            f"total {t2 - t0:.3f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
