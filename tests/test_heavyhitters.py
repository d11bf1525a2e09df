"""Pigeonhole heavy-hitter proofs (operators/heavyhitters.py): the
two-pass form equals the plain one-pass groupBy on every partitioning,
the candidate pass never misses (planted extreme skew), and the
weighted variant stays integer-exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.heavyhitters import (
    heavy_hitters,
    plain_heavy_hitters,
)


def _rows(df):
    return sorted((r[0], r[1], r[2]) for r in df.collect())


@pytest.fixture(scope="module")
def skewed(spark):
    # 1000 rows: 'hot' 500×, 'warm' 120×, 'cool' 60×, 320 singletons.
    vals = (
        ["hot"] * 500
        + ["warm"] * 120
        + ["cool"] * 60
        + [f"rare{i}" for i in range(320)]
    )
    return spark.createDataFrame([(v,) for v in vals], ["term"])


def test_matches_plain_form(skewed):
    # T = ceil(1000/10) = 100 → {hot, warm}
    got = _rows(heavy_hitters(skewed, "term", denom=10))
    want = _rows(plain_heavy_hitters(skewed, "term", denom=10))
    assert got == want == [("hot", 500, 100), ("warm", 120, 100)]


@pytest.mark.parametrize("nparts", [1, 3, 17])
def test_partitioning_invariant(skewed, nparts):
    df = skewed.repartition(nparts)
    got = _rows(heavy_hitters(df, "term", denom=10))
    assert got == [("hot", 500, 100), ("warm", 120, 100)]


def test_threshold_edge_exact(spark):
    # 90 rows, denom 9 → T = 10 exactly; 'edge' has exactly 10.
    vals = ["edge"] * 10 + [f"x{i}" for i in range(80)]
    df = spark.createDataFrame([(v,) for v in vals], ["term"]).repartition(7)
    got = _rows(heavy_hitters(df, "term", denom=9))
    assert got == [("edge", 10, 10)]


def test_weighted(spark):
    rows = [("a", 7), ("a", 5), ("b", 3), ("c", 1)]
    df = spark.createDataFrame(rows, ["term", "w"]).repartition(3)
    # total weight 16, denom 2 → T = 8 → only 'a' (12)
    got = _rows(heavy_hitters(df, "term", denom=2, weight_col="w"))
    want = _rows(plain_heavy_hitters(df, "term", denom=2, weight_col="w"))
    assert got == want == [("a", 12, 8)]


def test_candidate_pass_is_superset(spark):
    # Adversarial spread: a value exactly at T spread evenly across
    # partitions (the worst case for the local cutoff) must survive.
    # 8 partitions, 'spread' 16× → 2 per partition; T = ceil(116/8)=15?
    # Use denom so T = 16: total 160 rows, denom 10 → T = 16.
    vals = ["spread"] * 16 + [f"y{i}" for i in range(144)]
    df = spark.createDataFrame([(v,) for v in vals], ["term"]).repartition(8)
    got = _rows(heavy_hitters(df, "term", denom=10))
    assert ("spread", 16, 16) in got


def test_recount_joins_after_candidate_filter(skewed):
    # The broadcast semi-join must appear in the plan (candidates cut
    # the recount), and the full-width input must not be shuffled for
    # the candidate pass beyond the compacted (term, pid) aggregate.
    plan = heavy_hitters(skewed, "term", denom=10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
