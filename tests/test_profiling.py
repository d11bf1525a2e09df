"""Schema profiling (operators/profiling.py): FD auditing and
histogram join-size estimation semantics on planted fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.profiling import (
    fd_audit,
    join_size_estimate,
)


def test_fd_audit_holds_fails_and_counts_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "a", "x"),
            (2, "a", "x"),
            (3, "b", "y"),
            (4, "b", "z"),  # b maps to two rhs values -> violation
        ],
        "k LONG, lhs STRING, rhs STRING",
    )
    out = {(r.lhs, r.rhs): r for r in fd_audit(df, [("k", "lhs"), ("lhs", "rhs")]).collect()}
    assert out[("k", "lhs")].holds and out[("k", "lhs")].violations == 0
    bad = out[("lhs", "rhs")]
    assert not bad.holds and bad.n_lhs == 2 and bad.n_pairs == 3
    assert bad.violations == 1


def test_fd_audit_null_is_a_value(spark):
    """NULL on either side must count as a distinct value (the
    sentinel-key contract), not silently drop the row."""
    df = spark.createDataFrame(
        [(None, "x"), (None, "x"), ("a", None), ("a", None)],
        "lhs STRING, rhs STRING",
    )
    r = fd_audit(df, [("lhs", "rhs")]).collect()[0]
    assert r.n_lhs == 2 and r.n_pairs == 2 and r.holds
    df2 = spark.createDataFrame(
        [(None, "x"), (None, "y")], "lhs STRING, rhs STRING"
    )
    r2 = fd_audit(df2, [("lhs", "rhs")]).collect()[0]
    assert r2.n_lhs == 1 and r2.n_pairs == 2 and not r2.holds
    with pytest.raises(ValueError):
        fd_audit(df, [])


def test_join_size_estimate_exact_on_key_fk(spark):
    """FK -> PK joins satisfy the containment assumption exactly, so
    the Selinger estimate equals the actual count."""
    dim = spark.range(50).select(F.col("id").alias("pk"))
    fact = spark.range(1000).select((F.col("id") % 50).alias("fk"))
    r = join_size_estimate(fact, "fk", dim, "pk", buckets=16).collect()[0]
    assert r.actual_rows == 1000
    assert r.est_rows == 1000  # d2 = per-bucket pk count >= d1, exact
    assert r.n_left == 1000 and r.n_right == 50 and r.buckets == 16


def test_join_size_estimate_null_keys_excluded(spark):
    left = spark.createDataFrame(
        [(1,), (None,), (None,)], "k LONG"
    )
    right = spark.createDataFrame([(1,), (None,)], "k LONG")
    r = join_size_estimate(left, "k", right, "k").collect()[0]
    assert r.actual_rows == 1 and r.est_rows == 1


def test_join_size_estimate_skew_overestimates_gracefully(spark):
    """Non-containment (disjoint halves of a bucket's values) makes
    the estimate an over-count, never an under-count — the planner's
    safe direction.  est >= actual on any input."""
    left = spark.range(500).select((F.col("id") % 10).alias("k"))
    right = spark.range(500).select((F.col("id") % 20 + 5).alias("k"))
    r = join_size_estimate(left, "k", right, "k", buckets=8).collect()[0]
    assert r.est_rows >= r.actual_rows > 0


def test_fd_audit_separator_bytes_do_not_collide(spark):
    # ADVICE r08: under the old raw concat_ws(chr(31)) key, the pair
    # ('a\x1fb', NULL) and ('a', 'b\x1f\x00') built the same composite
    # string, so two distinct (lhs, rhs) pairs counted as one and the
    # violation went missing.  Per-component digests keep them apart.
    from northwind_etl_spark.operators.profiling import fd_audit

    df = spark.createDataFrame(
        [("a\x1fb", None), ("a", "b\x1f\x00"), ("a", "c")],
        "lhs_col STRING, rhs_col STRING",
    )
    r = {
        (row["lhs"], row["rhs"]): row
        for row in fd_audit(df, [("lhs_col", "rhs_col")]).collect()
    }[("lhs_col", "rhs_col")]
    # 2 distinct lhs values, 3 distinct (lhs, rhs) pairs -> 1 violation
    assert (r["n_lhs"], r["n_pairs"], r["violations"], r["holds"]) == (
        2,
        3,
        1,
        False,
    )


def test_fd_audit_null_vs_literal_n(spark):
    # NULL must stay distinct from the literal string 'n' (and from
    # 'v'): the digest prefixes 'v'/'n' guarantee it.
    from northwind_etl_spark.operators.profiling import fd_audit

    df = spark.createDataFrame(
        [("k", None), ("k", "n")], "lhs_col STRING, rhs_col STRING"
    )
    row = fd_audit(df, [("lhs_col", "rhs_col")]).collect()[0]
    assert (row["n_lhs"], row["n_pairs"]) == (1, 2)
