

def test_closed_form_corr_ols_matches_numpy_and_is_partition_invariant(spark):
    """closed_form_corr_ols agrees with numpy to float tolerance AND
    returns BIT-identical results under any partitioning (the exact
    decimal-moment claim — a float-sum corr() cannot make it)."""
    import numpy as np

    from northwind_etl_spark.operators.modelfit import closed_form_corr_ols

    rng = np.random.default_rng(3)
    x = np.round(rng.uniform(1, 50, 500), 2)
    y = np.round(3.5 * x + rng.normal(0, 10, 500) + 20, 2)
    rows = [(float(a), float(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(rows, ["x", "y"])
    ref = closed_form_corr_ols(df, "x", "y").collect()[0]
    assert ref.n == 500
    assert abs(ref.corr - np.corrcoef(x, y)[0, 1]) < 1e-9
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(ref.slope - slope) < 1e-9
    assert abs(ref.intercept - intercept) < 1e-7
    for p in (1, 7, 32):
        got = closed_form_corr_ols(df.repartition(p), "x", "y").collect()[0]
        assert (got.corr, got.slope, got.intercept) == (
            ref.corr,
            ref.slope,
            ref.intercept,
        )


def test_closed_form_corr_ols_nulls_and_perfect_line(spark):
    from northwind_etl_spark.operators.modelfit import closed_form_corr_ols

    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (None, 9.0), (4.0, None)],
        "x double, y double",
    )
    r = closed_form_corr_ols(df, "x", "y").collect()[0]
    # IEEE note: corr on a perfect line lands within 1 ulp of 1.0, not
    # exactly AT it (sqrt(vx)*sqrt(vy) vs vx rounding) — determinism is
    # the contract, not symbolic identity
    assert r.n == 3 and abs(r.corr - 1.0) < 1e-15
    assert r.slope == 2.0 and r.intercept == 0.0
