"""LTTB downsampling (operators/timeseries.py::lttb_downsample):
pure-Python reference replay, planted geometry, passthrough,
determinism, validation."""

from __future__ import annotations

import math

import pytest

from northwind_etl_spark.operators.timeseries import lttb_downsample


def _ref_lttb(points, k):
    """Scalar reference: independent of the numpy vectorization."""
    n = len(points)
    if n <= k:
        return list(range(n))
    ys = [p[1] for p in points]
    bounds = [1 + (b * (n - 2)) // (k - 2) for b in range(k - 1)]
    chosen, prev = [0], 0
    for b in range(k - 2):
        lo, hi = bounds[b], bounds[b + 1]
        nlo = hi
        nhi = bounds[b + 2] if b + 2 < k - 1 else n
        cx = sum(range(nlo, nhi)) / (nhi - nlo)
        cy = sum(ys[nlo:nhi]) / (nhi - nlo)
        best, best_a = lo, -1.0
        for j in range(lo, hi):
            a = abs((j - prev) * (cy - ys[prev]) - (cx - prev) * (ys[j] - ys[prev]))
            if a > best_a:
                best, best_a = j, a
        chosen.append(best)
        prev = best
    chosen.append(n - 1)
    return chosen


@pytest.fixture(scope="module")
def series(spark):
    # two keys; sinusoid + spike so shape retention matters
    rows = []
    for key in ("a", "b"):
        for i in range(60):
            v = math.sin(i / 5.0) * 10.0 + (50.0 if (key, i) == ("a", 37) else 0.0)
            rows.append((key, float(i), v))
    return rows, None


def test_matches_scalar_reference(spark, series):
    rows, _ = series
    df = spark.createDataFrame(rows, "key string, t double, v double")
    got = {
        key: sorted(
            r["sel_index"]
            for r in lttb_downsample(df, "key", "t", "v", k=9).collect()
            if r["key"] == key
        )
        for key in ("a", "b")
    }
    for key in ("a", "b"):
        pts = [(r[1], r[2]) for r in rows if r[0] == key]
        assert got[key] == sorted(_ref_lttb(pts, 9))


def test_spike_is_kept(spark, series):
    rows, _ = series
    df = spark.createDataFrame(rows, "key string, t double, v double")
    sel = {
        (r["key"], r["t"])
        for r in lttb_downsample(df, "key", "t", "v", k=9).collect()
    }
    assert ("a", 37.0) in sel  # the planted spike survives
    # endpoints always kept
    for key in ("a", "b"):
        assert (key, 0.0) in sel and (key, 59.0) in sel


def test_short_series_passthrough(spark):
    df = spark.createDataFrame(
        [("a", float(i), float(i)) for i in range(4)],
        "key string, t double, v double",
    )
    got = lttb_downsample(df, "key", "t", "v", k=7).collect()
    assert sorted(r["sel_index"] for r in got) == [0, 1, 2, 3]


def test_deterministic_under_repartition(spark, series):
    rows, _ = series
    df = spark.createDataFrame(rows, "key string, t double, v double")
    a = sorted(map(tuple, lttb_downsample(df, "key", "t", "v", k=9).collect()))
    b = sorted(
        map(tuple, lttb_downsample(df.repartition(7), "key", "t", "v", k=9).collect())
    )
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame([("a", 1.0, 1.0)], "key string, t double, v double")
    with pytest.raises(ValueError):
        lttb_downsample(df, "key", "t", "v", k=2)


def test_lttb_groups_straddling_arrow_batches(spark):
    """The run-walking rewrite must stitch a key whose rows span Arrow
    batch boundaries: force tiny batches and check against the
    single-partition answer."""
    from pyspark.sql import functions as F

    from northwind_etl_spark.operators.timeseries import lttb_downsample

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        df = (
            spark.range(0, 900)
            .select(
                (F.col("id") % 3).alias("k"),
                (F.col("id") / 3).cast("long").alias("t"),
                (F.col("id") * 37 % 101).cast("double").alias("v"),
            )
        )
        got = lttb_downsample(df, "k", "t", "v", k=9)
        want = lttb_downsample(df.coalesce(1), "k", "t", "v", k=9)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        assert got.count() == 27  # 3 keys x k=9
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
