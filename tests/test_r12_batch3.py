"""r12 batch 3 planted fixtures: AMS F2 sketch (sign replay, planted
exactness, linearity, envelope), bloom FPR report (load/verdict
invariants), ACF (planted periodicity, zero-variance guard), and the
GK approx-quantile band entry."""

from __future__ import annotations

import datetime
import hashlib

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.ams import (
    ams_f2_estimate,
    ams_f2_state,
    sign_expr,
)
from northwind_etl_spark.operators.timeseries import acf_by_lag


def _py_sign(j: int, v: str) -> int:
    salt, pos = ("a", j) if j < 32 else ("b", j - 32)
    nib = int(hashlib.md5(f"{salt}|{v}".encode()).hexdigest()[pos], 16)
    return 1 - 2 * (nib % 2)


def test_ams_signs_match_python_replay(spark):
    df = spark.createDataFrame([(str(i),) for i in range(50)], "v string")
    for j in (0, 7, 63):
        got = {
            r["v"]: r["s"]
            for r in df.select(
                "v", sign_expr(F.col("v"), j).alias("s")
            ).collect()
        }
        for v, s in got.items():
            assert s == _py_sign(j, v)


def test_ams_exact_on_single_key(spark):
    """One distinct key with f occurrences: every X_j = ±f, so the
    estimate is EXACTLY f² — the planted-exactness case."""
    f_count = 37
    df = spark.createDataFrame([("k",)] * f_count, "v string")
    est = ams_f2_estimate(ams_f2_state(df, "v")).collect()[0]["est_f2"]
    assert est == float(f_count * f_count)


def test_ams_state_is_linear(spark):
    a = spark.createDataFrame([(str(i % 13),) for i in range(200)], "v string")
    b = spark.createDataFrame([(str(i % 7),) for i in range(100)], "v string")
    sa = {r["j"]: r["x"] for r in ams_f2_state(a, "v").collect()}
    sb = {r["j"]: r["x"] for r in ams_f2_state(b, "v").collect()}
    su = {
        r["j"]: r["x"] for r in ams_f2_state(a.unionAll(b), "v").collect()
    }
    assert su == {j: sa[j] + sb[j] for j in sa}


def test_ams_envelope_on_planted_zipf(spark):
    rows = [(str(k),) for k in range(1, 60) for _ in range(600 // k)]
    df = spark.createDataFrame(rows, "v string")
    exact = sum((600 // k) ** 2 for k in range(1, 60))
    est = ams_f2_estimate(ams_f2_state(df, "v")).collect()[0]["est_f2"]
    assert abs(est - exact) / exact <= 0.531, (est, exact)


def test_ams_nulls_skipped(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "v string")
    est = ams_f2_estimate(ams_f2_state(df, "v")).collect()[0]["est_f2"]
    assert est == 4.0  # one key, f=2


def test_bloom_fpr_report_invariants(spark):
    from northwind_etl_spark.sources.inventory import bloom_fpr_report

    df = spark.createDataFrame([(i,) for i in range(1, 301)], "k long")
    r = bloom_fpr_report(df, "k", n_probes=512).collect()[0]
    assert r["n_keys"] == 300
    assert 0 < r["bits_set"] <= 600  # <= 2 probes per key
    assert r["n_bits"] == 64 * 62
    assert 0.0 < r["load_rho"] < 1.0
    assert r["n_probes"] == 512
    assert 0.0 <= r["measured_fpr"] <= 1.0
    assert r["within_3sigma"], dict(r.asDict())


def test_bloom_fpr_members_always_pass(spark):
    """Zero false negatives: probing the filter with its OWN keys must
    pass every time — checked by planting the member keys as the
    (negative) probe set."""
    from northwind_etl_spark.sources.inventory import bloom_fpr_report

    df = spark.createDataFrame(
        [(-i,) for i in range(1, 129)], "k long"
    )  # keys == the probe set bloom_fpr_report generates
    r = bloom_fpr_report(df, "k", n_probes=128).collect()[0]
    assert r["n_false_pass"] == 128  # every probe is a member -> passes


def test_acf_planted_periodicity(spark):
    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=d),
         10.0 if d % 2 == 0 else 20.0)
        for d in range(14)
    ]
    df = spark.createDataFrame(rows, "day date, v double").select(
        "day", F.col("v").cast("decimal(18,2)").alias("v")
    )
    acf = {r["lag"]: r["acf"] for r in acf_by_lag(df, "day", "v").collect()}
    assert acf[1] == -1.0
    assert acf[2] == 1.0
    assert acf[3] == -1.0


def test_acf_zero_variance_is_null(spark):
    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=d), 5.0)
        for d in range(10)
    ]
    df = spark.createDataFrame(rows, "day date, v double").select(
        "day", F.col("v").cast("decimal(18,2)").alias("v")
    )
    out = acf_by_lag(df, "day", "v", max_lag=3).collect()
    assert [r["acf"] for r in out] == [None, None, None]
    assert [r["n_pairs"] for r in out] == [9, 8, 7]


def test_gk_band_entry_all_in_band(spark, sf_dir):
    from northwind_etl_spark.plans.queries import approx_quantiles_quantity

    rows = approx_quantiles_quantity(spark, sf_dir).collect()
    assert rows and all(r["in_band"] for r in rows), rows
    qs = {r["q"] for r in rows}
    assert qs == {0.25, 0.5, 0.75}


def test_lttb_exact_matches_float_reference(spark, sf_dir):
    """The exact-arithmetic LTTB picks the SAME points as the float
    mapInPandas twin on the fixture (cents are exactly representable
    in float64 at fixture magnitudes, so the two implementations can
    only diverge on true area ties — and both break ties to the
    earliest index)."""
    from northwind_etl_spark.operators.timeseries import (
        lttb_downsample,
        lttb_downsample_exact,
    )
    from northwind_etl_spark.sources.parquet import read_events

    ev = read_events(spark, sf_dir)
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        (F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2) * 100)
        .cast("long")
        .alias("cents")
    )
    exact = {
        (r["user_id"], str(r["day"]), r["sel_index"])
        for r in lttb_downsample_exact(
            daily, "user_id", "day", "cents", k=7
        ).collect()
    }
    flt = {
        (r["user_id"], str(r["day"]), r["sel_index"])
        for r in lttb_downsample(
            daily.select(
                "user_id", "day", F.col("cents").cast("double").alias("cv")
            ),
            "user_id",
            "day",
            "cv",
            k=7,
        ).collect()
    }
    assert exact == flt and len(exact) > 0


def test_lttb_exact_small_series_pass_through(spark):
    rows = [
        (1, datetime.date(2024, 1, 1 + d), 100 * (d + 1)) for d in range(5)
    ]
    df = spark.createDataFrame(rows, "k long, day date, cents long")
    from northwind_etl_spark.operators.timeseries import (
        lttb_downsample_exact,
    )

    out = lttb_downsample_exact(df, "k", "day", "cents", k=7).collect()
    assert sorted(r["sel_index"] for r in out) == [0, 1, 2, 3, 4]


def test_lttb_exact_planted_spike_kept(spark):
    """A single huge spike in an interior bucket must be the bucket's
    pick (the visual-shape-preservation property the operator exists
    for), and first/last are always kept."""
    rows = [
        (1, datetime.date(2024, 1, 1 + d), 100 if d != 10 else 100000)
        for d in range(20)
    ]
    df = spark.createDataFrame(rows, "k long, day date, cents long")
    from northwind_etl_spark.operators.timeseries import (
        lttb_downsample_exact,
    )

    out = sorted(r["sel_index"] for r in
                 lttb_downsample_exact(df, "k", "day", "cents", k=7).collect())
    assert len(out) == 7
    assert out[0] == 0 and out[-1] == 19
    assert 10 in out


def test_lttb_exact_flat_series_earliest_tie(spark):
    """All-equal values: every triangle area is 0, so each bucket's
    pick is its EARLIEST index — the tie-break contract shared with
    the oracle's (a2 DESC, i ASC) ranking."""
    rows = [(1, datetime.date(2024, 1, 1 + d), 500) for d in range(22)]
    df = spark.createDataFrame(rows, "k long, day date, cents long")
    from northwind_etl_spark.operators.timeseries import (
        lttb_downsample_exact,
    )

    n = 22
    nb = 5
    bounds = [1 + (b * (n - 2)) // nb for b in range(nb + 1)]
    expect = [0, *bounds[:-1][0:5], n - 1]
    # bucket b's earliest index is bounds[b]
    expect = sorted({0, *[bounds[b] for b in range(nb)], n - 1})
    got = sorted(r["sel_index"] for r in
                 lttb_downsample_exact(df, "k", "day", "cents", k=7).collect())
    assert got == expect, (got, expect)
