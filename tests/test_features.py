"""Equal-frequency quantile binning (operators/features.py): exact
bin populations, tie/NULL handling, partitioning-invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.features import (
    quantile_bin,
    quantile_bin_summary,
)


@pytest.fixture(scope="module")
def vals(spark):
    # 17 rows, values descending so input order != value order
    return spark.createDataFrame(
        [(i, float(100 - i)) for i in range(17)], "id long, v double"
    )


def test_bin_sizes_exact(vals):
    sizes = {
        r["bin"]: r["n"]
        for r in quantile_bin_summary(vals, "v", "id", n_bins=4).collect()
    }
    # (rank-1)*4 DIV 17: ranks 1..5 -> 0, 6..9 -> 1, 10..13 -> 2, 14..17 -> 3
    assert sizes == {0: 5, 1: 4, 2: 4, 3: 4}


def test_bins_monotone_in_value(vals):
    rows = quantile_bin(vals, "v", "id", n_bins=4).orderBy("v").collect()
    bins = [r["bin"] for r in rows]
    assert bins == sorted(bins)
    # lowest value in bin 0, highest in the last bin
    assert rows[0]["bin"] == 0 and rows[-1]["bin"] == 3


def test_partitioning_invariance(vals):
    a = {r["id"]: r["bin"] for r in quantile_bin(vals, "v", "id", n_bins=5).collect()}
    b = {
        r["id"]: r["bin"]
        for r in quantile_bin(vals.repartition(7), "v", "id", n_bins=5).collect()
    }
    assert a == b


def test_all_ties_split_by_id(spark):
    # constant value: the id tie-breaker must still give exact sizes
    df = spark.createDataFrame([(i, 1.0) for i in range(10)], "id long, v double")
    got = {r["id"]: r["bin"] for r in quantile_bin(df, "v", "id", n_bins=2).collect()}
    assert got == {i: (0 if i < 5 else 1) for i in range(10)}


def test_null_values_pass_through(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0), (4, None)], "id long, v double"
    )
    got = {r["id"]: r["bin"] for r in quantile_bin(df, "v", "id", n_bins=2).collect()}
    assert got[2] is None and got[4] is None
    assert got[1] == 0 and got[3] == 1
    summary = quantile_bin_summary(df, "v", "id", n_bins=2).collect()
    assert {r["bin"] for r in summary} == {0, 1}


def test_validation_and_empty(spark):
    df = spark.createDataFrame([(1, None)], "id long, v double")
    with pytest.raises(ValueError):
        quantile_bin(df, "v", "id", n_bins=1)
    rows = quantile_bin(df, "v", "id", n_bins=3).collect()
    assert len(rows) == 1 and rows[0]["bin"] is None


# --- target encoding -------------------------------------------------

@pytest.fixture(scope="module")
def labeled(spark):
    rows = [
        (1, "A", 1.0), (2, "A", 2.0), (3, "A", 3.0),
        (4, "B", 10.0),
        (5, "C", 5.0), (6, "C", None),
    ]
    return spark.createDataFrame(rows, "id long, cat string, y double")


def test_smoothed_encoding_hand_computed(labeled):
    from northwind_etl_spark.operators.features import target_encode_smoothed

    got = {
        r["cat"]: (r["n"], r["encoding"])
        for r in target_encode_smoothed(labeled, "cat", "y", m=2).collect()
    }
    # G = 21/5; enc = (S_c*N + m*S)/(N*(n_c+m))
    assert got["A"] == (3, 72.0 / 25.0)
    assert got["B"] == (1, 92.0 / 15.0)
    assert got["C"] == (1, 67.0 / 15.0)
    with pytest.raises(ValueError):
        target_encode_smoothed(labeled, "cat", "y", m=0)


def test_loo_encoding_hand_computed(labeled):
    from northwind_etl_spark.operators.features import target_encode_loo

    got = {
        r["id"]: r["loo_encoding"]
        for r in target_encode_loo(labeled, "cat", "y", "id").collect()
    }
    assert got[1] == 2.5 and got[2] == 2.0 and got[3] == 1.5
    assert got[4] is None          # singleton class
    assert got[5] is None          # alone among non-NULL targets
    assert got[6] is None          # own target NULL


def test_smoothed_shrinks_toward_global(labeled):
    """Large m must pull every encoding toward the global mean."""
    from northwind_etl_spark.operators.features import target_encode_smoothed

    g = 21.0 / 5.0
    small = {r["cat"]: r["encoding"]
             for r in target_encode_smoothed(labeled, "cat", "y", m=1).collect()}
    big = {r["cat"]: r["encoding"]
           for r in target_encode_smoothed(labeled, "cat", "y", m=1000).collect()}
    for c in small:
        assert abs(big[c] - g) < abs(small[c] - g)
        assert abs(big[c] - g) < 0.01


# --- contingency statistics ------------------------------------------

def test_contingency_independent_is_zero(spark):
    from northwind_etl_spark.operators.features import contingency_stats

    rows = [("a", "p")] * 10 + [("a", "q")] * 10 + [("b", "p")] * 10 + [("b", "q")] * 10
    df = spark.createDataFrame(rows, "x string, y string")
    r = contingency_stats(df, "x", "y").first()
    assert r["n"] == 40 and r["dof"] == 1
    assert abs(r["chi2"]) < 1e-9
    assert abs(r["mi_nats"]) < 1e-9


def test_contingency_perfect_dependence(spark):
    import math

    from northwind_etl_spark.operators.features import contingency_stats

    # only (a,p) and (b,q): chi2 = N (Cramer's V = 1), MI = ln 2 --
    # and the ZERO cells (a,q)/(b,p) must contribute their E = 10 each
    rows = [("a", "p")] * 20 + [("b", "q")] * 20
    df = spark.createDataFrame(rows, "x string, y string")
    r = contingency_stats(df, "x", "y").first()
    assert r["n"] == 40 and r["dof"] == 1
    assert abs(r["chi2"] - 40.0) < 1e-9
    assert abs(r["mi_nats"] - math.log(2.0)) < 1e-9


def test_contingency_null_rows_excluded(spark):
    from northwind_etl_spark.operators.features import contingency_stats

    rows = [("a", "p"), ("a", None), (None, "p"), ("b", "q")]
    df = spark.createDataFrame(rows, "x string, y string")
    r = contingency_stats(df, "x", "y").first()
    assert r["n"] == 2  # only fully-observed pairs enter the table


def test_cohen_kappa_perfect_and_independent(spark):
    from northwind_etl_spark.operators.features import cohen_kappa

    same = spark.createDataFrame(
        [("x", "x")] * 6 + [("y", "y")] * 4, "a STRING, b STRING"
    )
    r = cohen_kappa(same, "a", "b").collect()[0]
    assert r.n == 10 and r.agree == 10 and r.kappa == 1.0
    # marginal-independent raters: agreement == chance, kappa == 0
    indep = spark.createDataFrame(
        [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")],
        "a STRING, b STRING",
    )
    r = cohen_kappa(indep, "a", "b").collect()[0]
    assert abs(r.kappa) < 1e-15 and r.p_o == r.p_e


def test_cohen_kappa_hand_computed_2x2(spark):
    """Classic 2x2: agree 45+15=60 of 100, p_e = .5*.6 + .5*.4 = .46 →
    kappa = (0.6-0.46)/0.54."""
    from northwind_etl_spark.operators.features import cohen_kappa

    rows = (
        [("yes", "yes")] * 45
        + [("yes", "no")] * 5
        + [("no", "yes")] * 25
        + [("no", "no")] * 15
        + [("yes", "no")] * 0
        + [("no", "no")] * 10
    )
    df = spark.createDataFrame(rows, "a STRING, b STRING")
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r.n == 100
    po = r.agree / 100
    assert abs(r.p_o - po) < 1e-15
    assert abs(r.kappa - (r.p_o - r.p_e) / (1 - r.p_e)) < 1e-15


def test_cohen_kappa_nulls_excluded(spark):
    from northwind_etl_spark.operators.features import cohen_kappa

    df = spark.createDataFrame(
        [("x", "x"), (None, "x"), ("x", None), ("y", "y")],
        "a STRING, b STRING",
    )
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r.n == 2 and r.agree == 2


def test_cohen_kappa_degenerate_single_category(spark):
    # ADVICE r08: p_e == 1.0 (both raters always emit the one shared
    # category) used to return NULL from the unguarded division; the
    # documented degenerate value is kappa = 0.0.
    from northwind_etl_spark.operators.features import cohen_kappa

    df = spark.createDataFrame(
        [("x", "x")] * 5, "a STRING, b STRING"
    )
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert (r["n"], r["agree"]) == (5, 5)
    assert r["p_o"] == 1.0 and r["p_e"] == 1.0
    assert r["kappa"] == 0.0
