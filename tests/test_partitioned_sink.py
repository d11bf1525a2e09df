"""Partitioned fact writes: partition pruning on read + dynamic
partition overwrite for idempotent incremental loads — the 100 TB sink
strategy (the reference's truncate/delete-reload generalized)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from northwind_etl_spark.plans import star
from northwind_etl_spark.sources.files import write_reload


def test_partition_pruning_on_partitioned_fact(spark, sf_dir):
    fact = star.fact_order_metrics(spark, sf_dir).withColumn(
        "order_month", F.date_format("OrderDate", "yyyy-MM")
    )
    out = tempfile.mkdtemp(prefix="fact_part_") + "/fact"
    write_reload(fact, out, partition_by=["order_month"])

    loaded = spark.read.parquet(out)
    one_month = loaded.where(F.col("order_month") == "1996-03")
    plan = one_month._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "order_month" in plan
    assert one_month.count() > 0


def test_dynamic_partition_overwrite_is_incremental(spark, sf_dir):
    fact = star.fact_order_metrics(spark, sf_dir).withColumn(
        "order_month", F.date_format("OrderDate", "yyyy-MM")
    )
    out = tempfile.mkdtemp(prefix="fact_dyn_") + "/fact"
    write_reload(fact, out, partition_by=["order_month"])
    total_before = spark.read.parquet(out).count()

    # re-load ONE month with halved quantities; other months untouched
    march = fact.where(F.col("order_month") == "1996-03").withColumn(
        "Quantity", F.col("Quantity") / 2
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        march.write.mode("overwrite").partitionBy("order_month").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    after = spark.read.parquet(out)
    assert after.count() == total_before  # same rows: one partition replaced
    assert (
        after.where(F.col("order_month") == "1996-03").count()
        == march.count()
    )
