"""r12 batch 4 planted fixtures: DP noisy mean (clipping, lane
independence, determinism), STL weekday decomposition (exact-zero
residuals on a pure base+weekday series, NULL edges), PACF
consistency, and the seasonal-naive MASE gate."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from northwind_etl_spark.operators.privacy import dp_noisy_avg
from northwind_etl_spark.operators.timeseries import (
    seasonal_naive_mase_report,
    stl_weekday_profile,
)


def _avg(spark, rows, **kw):
    df = spark.createDataFrame(rows, "g string, v double")
    defaults = dict(
        clip="1000.0", sum_scale="4000.0", count_scale="4.0", salt="t"
    )
    defaults.update(kw)
    return {
        r["g"]: r
        for r in dp_noisy_avg(df, ["g"], "v", **defaults).collect()
    }


def test_dp_avg_clips_outliers(spark):
    """A huge outlier contributes exactly `clip`, not its value — the
    sensitivity bound the mechanism's privacy claim rests on."""
    base = [("a", 100.0)] * 50
    with_outlier = _avg(spark, base + [("a", 10_000_000.0)])
    with_clip_row = _avg(spark, base + [("a", 1000.0)])
    assert (
        with_outlier["a"]["noisy_sum"] == with_clip_row["a"]["noisy_sum"]
    )


def test_dp_avg_noise_lanes_independent(spark):
    """Sum and count noise come from distinct salt lanes: the noisy
    sum and noisy count cannot share their noise value (n = sum here
    by construction, so equal noise would make the columns equal)."""
    rows = [("a", 1.0)] * 40  # true sum == true count == 40
    r = _avg(spark, rows)["a"]
    assert r["noisy_sum"] != r["noisy_count"]


def test_dp_avg_deterministic_and_salt_sensitive(spark):
    rows = [("a", 50.0)] * 30 + [("b", 70.0)] * 30
    r1 = _avg(spark, rows, salt="s1")
    r2 = _avg(spark, rows, salt="s1")
    r3 = _avg(spark, rows, salt="s2")
    assert r1 == r2
    assert any(
        r1[g]["noisy_avg"] != r3[g]["noisy_avg"] for g in ("a", "b")
    )


def test_dp_avg_near_truth_on_large_groups(spark):
    """Noise is bounded (|noise| <= 7.62·scale); with small scales a
    large group's noisy mean sits near the true mean."""
    rows = [("a", 100.0)] * 1000
    r = _avg(spark, rows, sum_scale="10.0", count_scale="2.0")["a"]
    assert abs(r["noisy_avg"] - 100.0) < 10.0, dict(r.asDict())


def _daily(spark, values):
    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=d), int(v))
        for d, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "day date, cents long")


def test_stl_pure_weekly_signal_zero_residuals(spark):
    """base + weekday effect (effects summing to 0 per week) must
    decompose to EXACT zero residuals wherever the trend window is
    full, with trend == base."""
    effects = [300, -100, 200, -400, 100, -200, 100]  # sum 0
    base = 70000
    vals = [base + effects[d % 7] for d in range(28)]
    out = stl_weekday_profile(_daily(spark, vals), "day", "cents").collect()
    full = [r for r in out if r["trend"] is not None]
    assert len(full) == 28 - 6
    assert all(r["trend"] == base / 100.0 for r in full)
    assert all(r["residual"] == 0.0 for r in full)
    edges = [r for r in out if r["trend"] is None]
    assert len(edges) == 6
    assert all(r["residual"] is None for r in edges)


def test_stl_components_sum_back(spark):
    vals = [50000 + 137 * d + (997 * d * d) % 5000 for d in range(21)]
    out = stl_weekday_profile(_daily(spark, vals), "day", "cents").collect()
    for r in out:
        if r["trend"] is None:
            continue
        recon = r["trend"] + r["seasonal"] + r["residual"]
        assert abs(recon - r["revenue"]) < 1e-5, dict(r.asDict())


def test_mase_zero_on_perfectly_weekly_series(spark):
    vals = [[700, 200, 900, 100, 500, 300, 400][d % 7] for d in range(28)]
    r = seasonal_naive_mase_report(
        _daily(spark, vals), "day", "cents"
    ).collect()[0]
    assert r["mae_seasonal"] == 0.0
    assert r["mase"] == 0.0
    assert r["mae_naive"] > 0.0


def test_mase_null_on_short_or_flat_series(spark):
    short = seasonal_naive_mase_report(
        _daily(spark, [100] * 5), "day", "cents"
    ).collect()[0]
    assert short["mase"] is None
    flat = seasonal_naive_mase_report(
        _daily(spark, [100] * 20), "day", "cents"
    ).collect()[0]
    assert flat["mase"] is None  # flat baseline: mae_naive == 0
    assert flat["mae_seasonal"] == 0.0


def test_pacf_consistent_with_acf(spark, sf_dir):
    """pacf1 must equal the ACF entry's lag-1 value, and pacf2 must
    replay the Durbin-Levinson closed form from the released r's."""
    from northwind_etl_spark.plans.queries import (
        daily_revenue_acf,
        daily_revenue_pacf,
    )

    acf = {
        r["lag"]: r["acf"] for r in daily_revenue_acf(spark, sf_dir).collect()
    }
    p = daily_revenue_pacf(spark, sf_dir).collect()[0]
    assert p["pacf1"] == round(acf[1], 6)
    r1, r2 = acf[1], acf[2]
    assert abs(p["pacf2"] - (r2 - r1 * r1) / (1 - r1 * r1)) < 2e-6
