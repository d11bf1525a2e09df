#!/usr/bin/env python
"""Pre-flight the driver's correctness window: run the first N (50)
registry entries at sf0.01 exactly the way the driver will — vanilla
session, oracle compare where an oracle exists, rows-only otherwise —
and print one status line per entry plus a summary.

Usage: python scripts/preflight.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    # Run from a NEUTRAL cwd before the JVM starts: python workers put
    # their cwd on sys.path, so preflighting from the repo root lets
    # workers `import northwind_etl_spark` even though the driver
    # harness runs from elsewhere — that masked a worker-side
    # ModuleNotFoundError for a whole round (r07 mdct: an
    # lru_cache-wrapped global pickles by reference).  From /tmp-like
    # cwd, preflight fails exactly where the driver would.
    import tempfile

    os.chdir(tempfile.mkdtemp(prefix="preflight-"))

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from oracle_harness import compare, duck_connection
    from plan_lint import lint_physical_plan
    from schema_lint import decimal_output_columns

    # pre-pass: loop-invariant-input lint (r07 LPA lesson — an
    # unpersisted loop input is a silent 6x scale regression).  The
    # lint reads the passed sf_dir so it works wherever the data lives
    # (ADVICE r08: the hardcoded default broke foreign invocations);
    # a lint-harness crash is REPORTED as a failure, not an abort.
    from iterative_lint import lint_iterative_operators

    try:
        lint_failures = lint_iterative_operators(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001 — report, don't abort
        lint_failures = [f"iterative-lint harness error: {exc!r}"]
    for f in lint_failures:
        print(f"LINT {f}", flush=True)
    print(
        f"iterative-operator lint: "
        f"{'OK' if not lint_failures else 'FAILED'}",
        flush=True,
    )

    qs, osql = E.queries(), E.oracle_sql()
    con = duck_connection(sf_dir)
    window = list(qs)[:n]
    bad = []
    for name in window:
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            # registry-wide output-schema lint (r09): the driver's
            # canonicalizer has never hash-greenlit a DECIMAL column
            # in 8 rounds — reject structurally, the local oracle
            # compare cannot see this divergence class.
            dec_cols = decimal_output_columns(df)
            if dec_cols:
                raise AssertionError(f"DECIMAL output column(s): {dec_cols}")
            # registry-wide physical-plan lint (r09): generalizes the
            # per-query plan contracts (no CartesianProduct, no
            # row-at-a-time Python UDF, no unbounded single-partition
            # funnel) over every windowed entry.
            plan_hits = lint_physical_plan(df, name)
            if plan_hits:
                raise AssertionError(f"plan lint: {plan_hits}")
            if name in osql:
                r = compare(df, con, osql[name])
                ok, detail = r["ok"], {
                    k: r[k] for k in ("count_match", "schema_match", "value_match")
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
    print(f"\n{len(window) - len(bad)}/{len(window)} green; failures: {bad}")
    sys.exit(1 if (bad or lint_failures) else 0)


if __name__ == "__main__":
    main()
