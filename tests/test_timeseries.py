"""Unit semantics for operators/timeseries.py::downsample_gapfill —
the oracle (daily_user_value_gapfill) covers the day-unit path on real
data; these pin the planted edge cases: interior-gap fill + LOCF,
month spine over irregular month lengths, and per-entity span
isolation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from northwind_etl_spark.operators.timeseries import downsample_gapfill


def _events(spark, rows):
    return spark.createDataFrame(
        [(e, dt.datetime.fromisoformat(ts), v) for e, ts, v in rows],
        "entity string, ts timestamp_ntz, value double",
    )


def test_interior_gap_zero_fill_and_locf(spark):
    df = _events(
        spark,
        [
            ("a", "2024-01-01T05:00:00", 1.0),
            ("a", "2024-01-01T06:00:00", 2.0),
            ("a", "2024-01-04T09:00:00", 7.0),
        ],
    )
    out = downsample_gapfill(
        df, ["entity"], "ts", "value", unit="day", agg="sum", locf_col="locf"
    ).orderBy("bucket")
    rows = [(r.bucket.day, r.value, r.locf) for r in out.collect()]
    assert rows == [(1, 3.0, 3.0), (2, 0.0, 3.0), (3, 0.0, 3.0), (4, 7.0, 7.0)]


def test_fill_none_keeps_gap_nulls(spark):
    df = _events(
        spark,
        [("a", "2024-01-01T00:00:00", 1.0), ("a", "2024-01-03T00:00:00", 1.0)],
    )
    out = downsample_gapfill(df, ["entity"], "ts", "value", unit="day", fill=None)
    assert [r.value for r in out.orderBy("bucket").collect()] == [1.0, None, 1.0]


def test_month_spine_handles_irregular_lengths(spark):
    # Jan → Apr: 31/29/31-day months (2024 is a leap year); the month
    # spine must land exactly on month starts, not day-31 arithmetic.
    df = _events(
        spark,
        [("a", "2024-01-15T00:00:00", 1.0), ("a", "2024-04-02T00:00:00", 5.0)],
    )
    out = downsample_gapfill(df, ["entity"], "ts", "value", unit="month")
    buckets = [(r.bucket.month, r.value) for r in out.orderBy("bucket").collect()]
    assert buckets == [(1, 1.0), (2, 0.0), (3, 0.0), (4, 5.0)]


def test_spans_are_per_entity(spark):
    df = _events(
        spark,
        [
            ("a", "2024-01-01T00:00:00", 1.0),
            ("a", "2024-01-05T00:00:00", 1.0),
            ("b", "2024-01-03T00:00:00", 9.0),
        ],
    )
    out = downsample_gapfill(df, ["entity"], "ts", "value", unit="day")
    per_entity = {
        e: n
        for e, n in out.groupBy("entity").count().collect()
    }
    assert per_entity == {"a": 5, "b": 1}


def test_count_agg_and_hour_unit(spark):
    df = _events(
        spark,
        [
            ("a", "2024-01-01T05:10:00", 1.0),
            ("a", "2024-01-01T05:50:00", 1.0),
            ("a", "2024-01-01T08:00:00", 1.0),
        ],
    )
    out = downsample_gapfill(df, ["entity"], "ts", "value", unit="hour", agg="count")
    # the fill literal is typed as the aggregate: COUNT stays bigint,
    # never silently widened to double by a 0.0 literal
    assert dict(out.dtypes)["value"] == "bigint"
    rows = [(r.bucket.hour, r.value) for r in out.orderBy("bucket").collect()]
    assert rows == [(5, 2), (6, 0), (7, 0), (8, 1)]


def test_fractional_fill_on_integral_agg_raises(spark):
    import pytest

    df = _events(spark, [("a", "2024-01-01T05:10:00", 1.0)])
    with pytest.raises(ValueError, match="fractional"):
        downsample_gapfill(
            df, ["entity"], "ts", "value", unit="hour", agg="count", fill=0.5
        )


def test_ewma_matches_pandas_adjust_false(spark):
    """ewma_by_key's fold must reproduce pandas ewm(adjust=False) on a
    planted daily series (and seed with the first bucket, not zero)."""
    import datetime as dt

    import pandas as pd

    from northwind_etl_spark.operators.timeseries import ewma_by_key

    vals = [10.0, 0.0, 5.0, 5.0, 20.0]
    rows = [
        (1, dt.datetime(2024, 1, 1 + i, 9, 0, 0), v) for i, v in enumerate(vals)
    ]
    # second key with a single bucket: EWMA == that value
    rows.append((2, dt.datetime(2024, 1, 1, 9, 0, 0), 7.5))
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP_NTZ, value DOUBLE")
    out = {
        r["user_id"]: r
        for r in ewma_by_key(df, "user_id", "ts", "value", alpha=0.3).collect()
    }
    want = pd.Series(vals).ewm(alpha=0.3, adjust=False).mean().iloc[-1]
    assert out[1]["n_buckets"] == 5
    assert out[1]["ewma_value"] == round(want, 6)
    assert out[2]["n_buckets"] == 1
    assert out[2]["ewma_value"] == 7.5
