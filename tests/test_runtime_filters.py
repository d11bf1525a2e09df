"""Runtime bloom-filter join pruning (Spark 3.5+/4.x,
spark.sql.optimizer.runtime.bloomFilter.enabled — on by default).

At 100 TB the selective side of q3/q5 (filtered customer/region) builds
a bloom filter that prunes the fact-side scan BEFORE the shuffle — a
runtime semi-join reduction Catalyst injects automatically once the
application side exceeds the 10 GB scan threshold.  Local test data
never crosses that threshold, so these tests scale the thresholds down
to prove the query SHAPES are bloom-compatible: if the filter injects
at forced thresholds here, it injects for free at cluster scale.
"""

from __future__ import annotations

from contextlib import contextmanager

from northwind_etl_spark.plans.queries import (
    q3_shipping_priority,
    q5_local_supplier_volume,
)

_FORCED = {
    # always consider the application side (default 10GB minimum scan)
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # accept our tiny creation side (default max 10MB is fine, raise anyway)
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # broadcast joins skip bloom filters (broadcast IS the pruning);
    # disable to simulate the at-scale shuffle-join regime
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _forced_thresholds(spark):
    old = {k: spark.conf.get(k) for k in _FORCED}
    try:
        for k, v in _FORCED.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_bloom_filter_default_on(spark):
    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"


def test_q3_q5_shapes_accept_runtime_bloom_filters(spark, sf_dir):
    with _forced_thresholds(spark):
        for q in (q3_shipping_priority, q5_local_supplier_volume):
            plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            assert "bloom_filter_agg" in plan, (q.__name__, plan[:2000])


def test_q3_results_unchanged_under_bloom_filters(spark, sf_dir):
    baseline = {tuple(r) for r in q3_shipping_priority(spark, sf_dir).collect()}
    with _forced_thresholds(spark):
        filtered = {tuple(r) for r in q3_shipping_priority(spark, sf_dir).collect()}
    assert baseline == filtered
