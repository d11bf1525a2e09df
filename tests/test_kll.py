"""KLL/MRL-style mergeable quantile sketch (operators/kll.py):
identity on undersized groups, partition-independence of the md5
coins, rank-error accuracy against exact quantiles, weight
conservation, and the merge property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.kll import kll_sketch, sketch_quantiles


def _vals(spark, n, group="g"):
    return spark.range(n).select(
        F.lit(group).alias("grp"),
        F.col("id").alias("v"),
        F.col("id").alias("rid"),
    )


def test_undersized_group_is_identity(spark):
    df = _vals(spark, 100)
    sk = kll_sketch(df, "grp", "v", "rid", capacity=256, n_levels=6)
    rows = sk.collect()
    assert len(rows) == 100
    assert all(r.weight == 1 and r.level == 0 for r in rows)
    q = sketch_quantiles(sk, [50, 100]).collect()[0]
    # exact on the identity sketch: p50 of 0..99 at cum rule = 49
    assert q.p50 == 49.0 and q.p100 == 99.0
    assert q.total_weight == 100


def test_partition_independence(spark):
    df = _vals(spark, 5000)
    a = kll_sketch(df, "grp", "v", "rid", capacity=128, n_levels=6)
    b = kll_sketch(
        df.repartition(13), "grp", "v", "rid", capacity=128, n_levels=6
    )
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_quantile_accuracy_and_weight_conservation(spark):
    n = 20000
    df = _vals(spark, n)
    sk = kll_sketch(df, "grp", "v", "rid", capacity=256, n_levels=6)
    q = sketch_quantiles(sk, [50, 90, 99]).collect()[0]
    # weight conservation: md5 halving keeps the expected mass; allow
    # a generous concentration band
    assert abs(q.total_weight - n) < 0.2 * n
    # rank error: values ARE ranks here (0..n-1), so the estimate's
    # relative rank error is |est/n - q|
    for pct, est in ((50, q.p50), (90, q.p90), (99, q.p99)):
        assert abs(est / n - pct / 100) < 0.05, (pct, est)
    # survivors shrank as promised: <= max(capacity, n/2^6) * slack
    assert q.n_sketch_rows < 2 * max(256, n // 64)


def test_merge_is_union_then_recompact(spark):
    """Merging two sketches = union survivor sets and re-compact: the
    result is itself a valid sketch whose quantile reads stay inside
    the rank-error band of the combined data."""
    a = _vals(spark, 10000)
    b = spark.range(10000, 20000).select(
        F.lit("g").alias("grp"), F.col("id").alias("v"), F.col("id").alias("rid")
    )
    ska = kll_sketch(a, "grp", "v", "rid", capacity=256, n_levels=4)
    skb = kll_sketch(b, "grp", "v", "rid", capacity=256, n_levels=4)
    # re-compact the union through the same conditional halving by
    # treating survivors as weighted input rows (weights preserved
    # through the quantile read)
    merged = ska.unionByName(skb)
    q = sketch_quantiles(merged, [50, 90]).collect()[0]
    for pct, est in ((50, q.p50), (90, q.p90)):
        assert abs(est / 20000 - pct / 100) < 0.05, (pct, est)


def test_validation(spark):
    df = _vals(spark, 10)
    with pytest.raises(ValueError, match="capacity"):
        kll_sketch(df, "grp", "v", "rid", capacity=0)
    with pytest.raises(ValueError, match="quantile percentages"):
        sketch_quantiles(kll_sketch(df, "grp", "v", "rid"), [0])
