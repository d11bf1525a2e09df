"""r08 additions: key-skew profiling (operators/skew.py), sparse
random projection (functions/vectors.py), and the split-conformal
threshold entry's selection arithmetic."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from northwind_etl_spark.functions.vectors import rp_signs, sparse_rp_exprs
from northwind_etl_spark.operators.skew import key_skew_profile


def test_skew_profile_uniform_vs_hot_key(spark):
    uniform = spark.range(1000).select((F.col("id") % 100).alias("k"))
    r = key_skew_profile(uniform, "k").collect()[0]
    assert r.n_keys == 100 and r.n_rows == 1000 and r.max_count == 10
    assert abs(r.gini) < 1e-12  # perfectly even
    assert abs(r.max_share - 0.01) < 1e-12

    hot = spark.range(1000).select(
        F.when(F.col("id") < 901, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    r = key_skew_profile(hot, "k").collect()[0]
    assert r.n_keys == 100 and r.max_count == 901
    assert r.max_share > 0.9 and r.top10_share > 0.9
    assert r.gini > 0.85


def test_skew_profile_hand_computed_gini(spark):
    """counts (1, 3) ascending → G = (2·(1·1+2·3) − 3·4)/(2·4) = 2/8."""
    df = spark.createDataFrame(
        [("a",), ("b",), ("b",), ("b",)], "k STRING"
    )
    r = key_skew_profile(df, "k").collect()[0]
    assert r.n_keys == 2 and r.n_rows == 4
    assert abs(r.gini - 0.25) < 1e-15
    assert r.top10_share == 1.0  # fewer than 10 keys -> everything


def test_skew_profile_counts_null_keys(spark):
    df = spark.createDataFrame(
        [("a",), (None,), (None,)], "k STRING"
    )
    r = key_skew_profile(df, "k").collect()[0]
    assert r.n_keys == 2 and r.max_count == 2


def test_rp_signs_deterministic_and_sparse():
    s1 = rp_signs(64, 8)
    s2 = rp_signs(64, 8)
    assert s1 == s2
    flat = [v for row in s1 for v in row]
    assert set(flat) <= {-1, 0, 1}
    zero_frac = flat.count(0) / len(flat)
    assert 0.5 < zero_frac < 0.8  # E = 2/3
    assert rp_signs(64, 8, seed="other") != s1


def test_sparse_rp_matches_numpy_and_scales(spark):
    signs = rp_signs(6, 3)
    vecs = [
        (1, [1.0, -2.0, 0.5, 4.0, -1.25, 3.0]),
        (2, [0.0] * 6),
    ]
    df = spark.createDataFrame(vecs, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = {
        r.vec_id: [r.y00, r.y01, r.y02]
        for r in df.select(
            "vec_id", *sparse_rp_exprs(F.col("embedding"), signs)
        ).collect()
    }
    S = np.array(signs, dtype=np.float64)
    x = np.array(vecs[0][1], dtype=np.float32).astype(np.float64)
    expect = S @ x
    assert np.allclose(out[1], expect, rtol=0, atol=1e-12)
    assert out[2] == [0.0, 0.0, 0.0]


def test_conformal_threshold_is_exact_order_statistic(spark, sf_dir):
    """The entry's threshold must equal the k-th smallest calibration
    margin computed independently (plain python over collected
    margins), and coverage counts must be exact."""
    from northwind_etl_spark.plans.queries import (
        margin_conformal_threshold,
    )

    r = margin_conformal_threshold(spark, sf_dir).collect()[0]
    # independent recompute of the margins + split
    from northwind_etl_spark.operators.sampling import split_bucket_expr
    from northwind_etl_spark.operators.text import hashed_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = hashed_features(docs, n_buckets=64)
    w = (F.col("bucket").cast("long") * F.lit(2654435761)) % 1001 - 500
    m = (
        feats.select("doc_id", (F.col("weight") * w).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("margin"))
        .withColumn("cal", split_bucket_expr(F.col("doc_id"), buckets=2) == 0)
        .collect()
    )
    cal = sorted(x.margin for x in m if x.cal)
    ev = [x.margin for x in m if not x.cal]
    n_cal = len(cal)
    k = min((9 * (n_cal + 1) + 9) // 10, n_cal)
    assert r.n_cal == n_cal and r.k == k
    assert r.threshold == cal[k - 1]
    assert r.covered == sum(1 for x in ev if x >= r.threshold)
    assert r.n_eval == len(ev)
