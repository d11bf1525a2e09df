"""Sliding distinct-count maintenance over daily HLL sketches
(plans/queries.py::sliding_distinct_users_hll): frame identities,
monotone containment, planted exactness, and error vs exact."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def days_events(spark):
    # 10 days x 40 users; day d sees users [5*d, 5*d + 40) -> known
    # overlaps between consecutive days
    rows = [
        (datetime.datetime(2024, 1, 1 + d, 12, 0), 5 * d + u)
        for d in range(10)
        for u in range(40)
    ]
    return spark.createDataFrame(rows, "ts timestamp, user_id long")


def _sliding(df, frame):
    daily = df.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    w = Window.orderBy("day").rowsBetween(-(frame - 1), 0)
    return (
        daily.select(
            "day",
            F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("est"),
        )
        .orderBy("day")
        .collect()
    )


def test_one_day_frame_equals_daily_estimate(days_events):
    """Union over a single-sketch frame must be the daily sketch."""
    one = [r["est"] for r in _sliding(days_events, 1)]
    daily = (
        days_events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .orderBy("day")
        .collect()
    )
    assert one == [r["est"] for r in daily]


def test_planted_exact_at_low_cardinality(days_events):
    """40-350 distinct ids sit far below lgConfigK=12 saturation: the
    sketch answers are exact, so the trailing-7 math is checkable."""
    got = [r["est"] for r in _sliding(days_events, 7)]
    # day d (0-based) window covers days max(0, d-6)..d ->
    # users [5*max(0,d-6), 5*d+40) -> 5*(min(d,6)) + 40 ... compute:
    expect = [5 * min(d, 6) + 40 for d in range(10)]
    assert got == expect


def test_monotone_containment(days_events):
    """A wider trailing frame can never see FEWER distincts (register
    unions only grow)."""
    e3 = [r["est"] for r in _sliding(days_events, 3)]
    e7 = [r["est"] for r in _sliding(days_events, 7)]
    assert all(b >= a for a, b in zip(e3, e7))


def test_error_bound_vs_exact_on_real_events(spark, sf_dir):
    """The md5-HLL trailing-7-day estimates land within the m=256
    3σ envelope of the exact trailing distinct counts."""
    from northwind_etl_spark.operators.hll import REL_3SIGMA
    from northwind_etl_spark.plans.queries import QUERIES

    got = {
        r["day"]: r["approx_users_7d"]
        for r in QUERIES["sliding_distinct_users_hll"](spark, sf_dir).collect()
    }
    from northwind_etl_spark.sources.parquet import read_events

    ev = read_events(spark, sf_dir).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    days = sorted(got)
    pairs = ev.distinct().collect()
    by_day = {}
    for r in pairs:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    for i, d in enumerate(days):
        exact = set().union(*(by_day[x] for x in days[max(0, i - 6) : i + 1]))
        assert abs(got[d] - len(exact)) <= max(3, REL_3SIGMA * len(exact))
