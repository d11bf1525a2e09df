"""Incremental join-view maintenance proofs (operators/incremental.py::
join_view_delta): the delta-union identity on planted data with
duplicate join keys, and empty-delta behavior."""

from __future__ import annotations

from northwind_etl_spark.operators.incremental import join_view_delta


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_delta_union_identity(spark):
    a_old = spark.createDataFrame([(1, "x"), (2, "y"), (2, "y2")], ["k", "av"])
    a_new = spark.createDataFrame([(1, "x9"), (3, "z")], ["k", "av"])
    b_old = spark.createDataFrame([(1, 10), (2, 20)], ["k", "bv"])
    b_new = spark.createDataFrame([(2, 21), (3, 30)], ["k", "bv"])

    delta = join_view_delta(a_old, a_new, b_old, b_new, on="k")
    v_old = a_old.join(b_old, "k")
    v_new = a_old.unionByName(a_new).join(b_old.unionByName(b_new), "k")
    assert sorted(_rows(v_old) + _rows(delta)) == _rows(v_new)
    # sanity: the delta hits all three terms — ΔA⋈B_old (1,x9,10),
    # A_old⋈ΔB (2,y,21)+(2,y2,21), ΔA⋈ΔB (3,z,30)
    assert len(_rows(delta)) == 4


def test_empty_deltas(spark):
    a_old = spark.createDataFrame([(1, "x")], ["k", "av"])
    b_old = spark.createDataFrame([(1, 10)], ["k", "bv"])
    empty_a = a_old.limit(0)
    empty_b = b_old.limit(0)
    assert join_view_delta(a_old, empty_a, b_old, empty_b, on="k").count() == 0
