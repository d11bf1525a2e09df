"""The determinism contract (README): money aggregates must be
bit-identical under any partitioning/parallelism — the property that
lets a 1000-executor run hash-match a single-node oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from northwind_etl_spark.functions.money import decimal_avg, decimal_sum


def _flagship_on(li, o, c, n):
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rev", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy("n_name")
        .agg(decimal_sum("rev", "total_revenue"), decimal_avg("rev", "avg_revenue"))
        .orderBy("n_name")
    )


def test_aggregates_identical_across_partitionings(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    results = []
    for parts in (1, 3, 17):
        rows = _flagship_on(li.repartition(parts), o.repartition(parts), c, n).collect()
        results.append([(r.n_name, r.total_revenue, r.avg_revenue) for r in rows])
    assert results[0] == results[1] == results[2]


def test_double_sum_would_not_be_deterministic_note(spark, sf_dir):
    """Sanity companion: raw double sums CAN differ across partitionings
    (the reason decimal_sum exists). We only assert our decimal path is
    stable even when values are summed in reversed order."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        "l_orderkey",
        "l_linenumber",
    )
    fwd = li.orderBy("l_orderkey", "l_linenumber").agg(decimal_sum("rev", "s")).first().s
    rev = (
        li.orderBy(F.desc("l_orderkey"), F.desc("l_linenumber"))
        .agg(decimal_sum("rev", "s"))
        .first()
        .s
    )
    assert fwd == rev
