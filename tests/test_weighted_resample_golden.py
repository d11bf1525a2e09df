"""r08 batch 2: weighted selection (operators/selection.py),
half-sample resampling (operators/resample.py), and golden-record
survivorship (operators/survivorship.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.resample import (
    half_sample_ci,
    half_sample_means,
)
from northwind_etl_spark.operators.selection import weighted_kth_smallest
from northwind_etl_spark.operators.survivorship import golden_records


# ------------------------------------------------- weighted selection
def _wmedian_ref(vals, wts, k=None):
    order = np.argsort(vals, kind="stable")
    v, w = np.asarray(vals)[order], np.asarray(wts)[order]
    if k is None:
        k = (int(w.sum()) + 1) // 2
    cum = np.cumsum(w)
    return float(v[np.searchsorted(cum, k)]), k


def test_weighted_kth_matches_reference(spark):
    rng = np.random.default_rng(3)
    vals = rng.normal(100, 25, 500).round(2)
    wts = rng.integers(1, 9, 500)
    df = spark.createDataFrame(
        [(float(v), int(w)) for v, w in zip(vals, wts)],
        "v DOUBLE, w LONG",
    )
    got_v, got_k, got_w = weighted_kth_smallest(df, "v", "w")
    ref_v, ref_k = _wmedian_ref(vals, wts)
    assert got_w == int(wts.sum()) and got_k == ref_k
    assert got_v == ref_v
    # arbitrary k, including the extremes
    for k in (1, 7, int(wts.sum())):
        gv, _, _ = weighted_kth_smallest(df, "v", "w", k)
        rv, _ = _wmedian_ref(vals, wts, k)
        assert gv == rv, k


def test_weighted_kth_degenerates_to_plain_kth_at_weight_one(spark):
    from northwind_etl_spark.operators.selection import kth_smallest

    df = spark.range(101).select(
        ((F.col("id") * 37) % 101).cast("double").alias("v"),
        F.lit(1).alias("w"),
    )
    wv, wk, ww = weighted_kth_smallest(df, "v", "w")
    pv, pk, pn = kth_smallest(df, "v")
    assert (wv, wk, ww) == (pv, pk, pn)


def test_weighted_kth_zero_and_negative_weights(spark):
    df = spark.createDataFrame(
        [(1.0, 0), (2.0, 5), (3.0, 0)], "v DOUBLE, w LONG"
    )
    # zero-weight rows carry no mass: median is the only weighted value
    v, k, w = weighted_kth_smallest(df, "v", "w")
    assert (v, k, w) == (2.0, 3, 5)
    bad = spark.createDataFrame([(1.0, -2)], "v DOUBLE, w LONG")
    with pytest.raises(ValueError, match="negative or fractional"):
        weighted_kth_smallest(bad, "v", "w")
    empty = spark.createDataFrame([(1.0, 0)], "v DOUBLE, w LONG")
    with pytest.raises(ValueError, match="empty"):
        weighted_kth_smallest(empty, "v", "w")


# --------------------------------------------------- half-sample CI
def test_half_sample_means_are_deterministic_halves(spark):
    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") % 100).cast("double").alias("x")
    )
    means = half_sample_means(df, "x", "k", replicas=16).collect()
    assert len(means) == 16
    # md5 parity halves: each replica holds ~n/2 rows
    for r in means:
        assert 800 < r.n_b < 1200
    again = half_sample_means(df, "x", "k", replicas=16).collect()
    assert sorted(map(tuple, means)) == sorted(map(tuple, again))


def test_half_sample_ci_brackets_the_mean_and_is_calibrated_in_width(spark):
    rng = np.random.default_rng(7)
    xs = rng.normal(50, 10, 4000)
    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "k LONG, x DOUBLE"
    )
    r = half_sample_ci(df, "x", "k", replicas=64).collect()[0]
    assert r.ci_lo < r.mean_full < r.ci_hi
    # replicate-mean sd equals the full mean's sampling sd (sigma/sqrt(n));
    # a 95% percentile interval spans ~3.5-4 such sds — accept 2-8
    se = 10 / np.sqrt(4000)
    assert 2 * se < (r.ci_hi - r.ci_lo) < 8 * se
    assert r.replicas == 64 and r.n == 4000


def test_half_sample_replicas_validation(spark):
    df = spark.range(10).select(F.col("id").alias("k"), F.lit(1.0).alias("x"))
    with pytest.raises(ValueError):
        half_sample_ci(df, "x", "k", replicas=1)


# ------------------------------------------------------- survivorship
def test_golden_records_freshest_non_null_wins(spark):
    df = spark.createDataFrame(
        [
            # cluster 1: key 30 is freshest but has NULL balance ->
            # name from 30, balance from 20
            (10, "alice a", 100.0, "c1"),
            (20, "alice b", 200.0, "c1"),
            (30, "alice c", None, "c1"),
            # singleton cluster
            (40, "bob", None, "c2"),
        ],
        "key LONG, name STRING, bal DOUBLE, cluster STRING",
    )
    out = {
        r.cluster: r
        for r in golden_records(df, "cluster", "key", ["name", "bal"]).collect()
    }
    c1 = out["c1"]
    assert c1.n_members == 3 and c1.golden_key == 30
    assert c1.golden_name == "alice c"
    assert c1.golden_bal == 200.0  # freshest NON-NULL
    c2 = out["c2"]
    assert c2.golden_name == "bob" and c2.golden_bal is None


def test_golden_records_requires_fields(spark):
    df = spark.createDataFrame([(1, "x", "c")], "key LONG, name STRING, cluster STRING")
    with pytest.raises(ValueError):
        golden_records(df, "cluster", "key", [])


def test_duckdb_arg_max_null_gating_matches_max_by():
    """The survivorship oracle leans on DuckDB arg_max skipping rows
    whose ordering argument is NULL — pin that engine behavior."""
    import duckdb

    con = duckdb.connect()
    got = con.execute(
        """
        SELECT arg_max(v, CASE WHEN v IS NOT NULL THEN k END)
        FROM (VALUES (1, 'a'), (2, 'b'), (3, NULL)) t(k, v)
        """
    ).fetchone()[0]
    assert got == "b"


def test_weighted_kth_fractional_weights_raise(spark):
    # ADVICE r08: validation must run on the RAW column — the long cast
    # truncates 0.9 to zero mass and -0.5 to 0, both silently passing
    # the old post-cast checks.
    frac = spark.createDataFrame(
        [(1.0, 0.9), (2.0, 3.0)], "v DOUBLE, w DOUBLE"
    )
    with pytest.raises(ValueError, match="negative or fractional"):
        weighted_kth_smallest(frac, "v", "w")
    negfrac = spark.createDataFrame(
        [(1.0, -0.5), (2.0, 3.0)], "v DOUBLE, w DOUBLE"
    )
    with pytest.raises(ValueError, match="negative or fractional"):
        weighted_kth_smallest(negfrac, "v", "w")
    # integral doubles are fine: 3.0 is an exact integer weight
    ok = spark.createDataFrame([(2.0, 3.0)], "v DOUBLE, w DOUBLE")
    assert weighted_kth_smallest(ok, "v", "w") == (2.0, 2, 3)
