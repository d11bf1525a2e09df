"""Full star ETL lifecycle with real sinks + the reference's post-load
invariants, plus skew salting and catalog introspection."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from northwind_etl_spark.catalog import referencing_tables
from northwind_etl_spark.operators.skew import salted_join
from northwind_etl_spark.plans.pipeline import run_star_pipeline


def test_star_pipeline_end_to_end(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="star_out_")
    report = run_star_pipeline(spark, sf_dir, out)
    assert report.ok, report.invariants
    # reference cardinality shape: |fact| == |lineitem| (row-count
    # conservation through the left lookup, Project Plan7.md:6)
    assert report.loaded["fact_order_metrics"] > 0
    assert report.loaded["dim_category"] == 5
    # loaded dim is the lookup source — re-read and check usable
    dim = spark.read.parquet(f"{out}/dim_part")
    assert dim.where(F.col("PartKey").isNull()).count() == 0


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey")
    salted = salted_join(li, o, key="l_orderkey", salt_buckets=4)
    assert salted.count() == plain.count()
    ps = plain.agg(F.sum("o_totalprice")).first()[0]
    ss = salted.agg(F.sum("o_totalprice")).first()[0]
    assert abs(ps - ss) < 1e-6 * abs(ps)


def test_salted_join_rejects_outer_shapes(spark, sf_dir):
    import pytest

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey")
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(li, li, key="l_orderkey", how=how)


def test_catalog_relationships():
    refs = referencing_tables("nation")
    assert ("c_nationkey", "n_nationkey") in [(k, p) for k, p in [(r[1], r[2]) for r in refs]]
    assert {r[0] for r in refs} == {"customer", "supplier"}
