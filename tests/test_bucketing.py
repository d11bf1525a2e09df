"""Bucketed co-located join: the plan must contain no Exchange —
the 100 TB fact⋈fact strategy when neither side broadcasts."""

from __future__ import annotations

import tempfile

from northwind_etl_spark.sources.bucketing import co_located_join, write_bucketed


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    tmp = tempfile.mkdtemp(prefix="bucketed_")
    write_bucketed(
        li, "b_lineitem", bucket_cols=["l_orderkey"], num_buckets=8, path=f"{tmp}/li"
    )
    write_bucketed(
        o, "b_orders", bucket_cols=["l_orderkey"], num_buckets=8, path=f"{tmp}/o"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, "b_lineitem", "b_orders", on=["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # correctness: same row count as the plain join
        plain = li.join(o, "l_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
