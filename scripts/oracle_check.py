#!/usr/bin/env python
"""Targeted oracle check: run the NAMED registry entries at sf0.01
(or $2) exactly like scripts/preflight.py (vanilla session, neutral
cwd, schema/plan lints, DuckDB compare where an oracle exists) —
for re-verifying just-touched entries mid-round without the full
315-entry sweep.

Usage: python scripts/oracle_check.py name [name ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    names = args

    import tempfile

    os.chdir(tempfile.mkdtemp(prefix="oracle-check-"))

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from oracle_harness import compare, duck_connection
    from plan_lint import lint_physical_plan
    from schema_lint import decimal_output_columns

    qs, osql = E.queries(), E.oracle_sql()
    con = duck_connection(sf_dir)
    bad = []
    for name in names:
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            dec_cols = decimal_output_columns(df)
            if dec_cols:
                raise AssertionError(f"DECIMAL output column(s): {dec_cols}")
            plan_hits = lint_physical_plan(df, name)
            if plan_hits:
                raise AssertionError(f"plan lint: {plan_hits}")
            if name in osql:
                r = compare(df, con, osql[name])
                ok, detail = r["ok"], {
                    k: r[k]
                    for k in ("count_match", "schema_match", "value_match")
                }
            else:
                rows = df.count()
                ok, detail = True, {"rows_only": rows}
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            ok, detail = False, {"err": repr(exc)[:200]}
        dt = round(time.perf_counter() - t0, 1)
        status = "ok " if ok else "FAIL"
        print(f"{status} {name:42s} {dt:6.1f}s {detail}", flush=True)
        if not ok:
            bad.append(name)
    print(f"\n{len(names) - len(bad)}/{len(names)} green; failures: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
