

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


# ------------------------------------------- isotonic calibration (PAVA)


def test_isotonic_hand_computed(spark):
    from northwind_etl_spark.operators.modelfit import isotonic_calibration

    # 4 bins of 2 rows each; rates 1.0, 0.0, 0.5, 1.0 -> PAVA pools the
    # first three bins ((2+0+1) pos over 6 rows = 0.5), last stays 1.0
    data = [
        (1, 10, 1), (2, 11, 1),
        (3, 20, 0), (4, 21, 0),
        (5, 30, 1), (6, 31, 0),
        (7, 40, 1), (8, 41, 1),
    ]
    df = spark.createDataFrame(data, "id LONG, score LONG, y INT")
    out = isotonic_calibration(df, "score", "y", "id", n_bins=4).collect()
    got = [(r["bin"], r["n"], r["pos"], r["rate"], r["iso_rate"]) for r in out]
    half = 3 / 6
    assert got == [
        (0, 2, 2, 1.0, half),
        (1, 2, 0, 0.0, half),
        (2, 2, 1, 0.5, half),
        (3, 2, 2, 1.0, 1.0),
    ]


def test_isotonic_output_nondecreasing_and_mass_preserving(spark, sf_dir):
    from northwind_etl_spark.operators.modelfit import isotonic_calibration
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id"),
        F.length("text").cast("long").alias("score"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    rows = isotonic_calibration(docs, "score", "y", "doc_id", n_bins=8).collect()
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)
    # PAVA preserves the weighted mean: sum(iso*n) == sum(pos) exactly
    # as rationals; allow one ulp of float slack per term
    lhs = sum(r["iso_rate"] * r["n"] for r in rows)
    rhs = sum(r["pos"] for r in rows)
    assert abs(lhs - rhs) < 1e-9
    with __import__("pytest").raises(ValueError, match="n_bins"):
        isotonic_calibration(docs, "score", "y", "doc_id", n_bins=1)


def test_isotonic_already_monotone_is_identity(spark):
    from northwind_etl_spark.operators.modelfit import isotonic_calibration

    data = [(i, i, 1 if i >= 6 else 0) for i in range(1, 13)]
    df = spark.createDataFrame(data, "id LONG, score LONG, y INT")
    out = isotonic_calibration(df, "score", "y", "id", n_bins=4).collect()
    for r in out:
        assert r["iso_rate"] == r["rate"]
