"""skyline_2d (operators/skyline.py) equals the quadratic dominance
definition on random and adversarial fixtures, preserves duplicates,
and excludes NULLs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from northwind_etl_spark.operators.skyline import skyline_2d


def naive_skyline(pts):
    out = []
    for p in pts:
        dominated = any(
            q[0] >= p[0]
            and q[1] >= p[1]
            and (q[0] > p[0] or q[1] > p[1])
            for q in pts
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def _run(spark, pts, partitions=None):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)], ["id", "x", "y"]
    )
    got = sorted(
        (r.x, r.y) for r in skyline_2d(df, "x", "y", partitions=partitions).collect()
    )
    return got


def test_random_matches_naive(spark):
    rng = random.Random(11)
    pts = [(rng.randint(0, 50), rng.randint(0, 50)) for _ in range(400)]
    assert _run(spark, pts) == naive_skyline(pts)


def test_tie_fixtures(spark):
    # equal (x, y) duplicates: mutually non-dominating, BOTH kept
    pts = [(5, 5), (5, 5), (3, 9), (9, 3), (1, 1)]
    got = _run(spark, pts)
    assert got == sorted([(5, 5), (5, 5), (3, 9), (9, 3)])
    # equal ymax at different x: only the larger x survives
    pts = [(1, 7), (2, 7), (3, 1)]
    assert _run(spark, pts) == [(2, 7), (3, 1)]
    # staircase: everything on the frontier
    pts = [(i, 10 - i) for i in range(10)]
    assert _run(spark, pts) == sorted(pts)
    # anti-staircase: single maximal point dominates all
    pts = [(i, i) for i in range(10)]
    assert _run(spark, pts) == [(9, 9)]


def test_partitioning_invariance_and_nulls(spark):
    rng = random.Random(23)
    pts = [(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(300)]
    exp = naive_skyline(pts)
    for p in (1, 3, 17):
        assert _run(spark, pts, partitions=p) == exp
    # NULLs in either dimension are excluded up front
    df = spark.createDataFrame(
        [(1, None, 99), (2, 99, None), (3, 1, 1)],
        "id int, x int, y int",
    )
    got = [(r.x, r.y) for r in skyline_2d(df, "x", "y").collect()]
    assert got == [(1, 1)]


def test_all_columns_preserved(spark):
    df = spark.createDataFrame(
        [(1, 10, 10, "keep"), (2, 1, 1, "drop")], ["id", "x", "y", "tag"]
    )
    rows = skyline_2d(df, "x", "y").collect()
    assert len(rows) == 1 and rows[0].tag == "keep" and rows[0].id == 1


def test_no_single_partition_exchange(spark):
    """The prefix-max must come from range-partitioned local windows +
    the P-row prior broadcast — never a single-task global window."""
    df = spark.createDataFrame(
        [(i, i % 37, (i * 7) % 41) for i in range(500)], ["id", "x", "y"]
    )
    out = skyline_2d(df, "x", "y")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
