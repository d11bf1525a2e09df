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


# ------------------------- signed (insert+delete) form: join_view_bidelta


def _signed_agg(df, sign_col="__sign"):
    """Multiset of the view maintained by signed rows: key -> net count."""
    from collections import Counter

    c = Counter()
    for r in df.collect():
        d = r.asDict()
        s = d.pop(sign_col)
        c[tuple(sorted(d.items()))] += s
    return {k: v for k, v in c.items() if v != 0}


def test_bidelta_maintenance_equals_recompute(spark):
    from northwind_etl_spark.operators.incremental import join_view_bidelta

    # duplicate JOIN keys on the A side; unique pk on the B side
    a_old = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 2, "c"), (4, 3, "d")],
        ["pk", "k", "av"],
    )
    a_ins = spark.createDataFrame([(5, 2, "e"), (6, 9, "f")], ["pk", "k", "av"])
    a_del = spark.createDataFrame([(2, 1, "b")], ["pk", "k", "av"])
    b_old = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], ["k", "bv"])
    b_ins = spark.createDataFrame([(9, 90)], ["k", "bv"])
    b_del = spark.createDataFrame([(3, 30)], ["k", "bv"])

    dv = join_view_bidelta(
        a_old, a_ins, a_del, b_old, b_ins, b_del, on="k", b_pk=["k"]
    )
    from pyspark.sql import functions as F

    old_signed = a_old.join(b_old, "k").withColumn("__sign", F.lit(1))
    maintained = _signed_agg(old_signed.unionByName(dv))

    a_new = a_old.join(a_del.select("pk"), "pk", "left_anti").unionByName(a_ins)
    b_new = b_old.join(b_del.select("k"), "k", "left_anti").unionByName(b_ins)
    direct = _signed_agg(
        a_new.join(b_new, "k").withColumn("__sign", F.lit(1))
    )
    assert maintained == direct
    assert maintained  # non-vacuous


def test_bidelta_empty_deltas_no_signed_rows(spark):
    from northwind_etl_spark.operators.incremental import join_view_bidelta

    a = spark.createDataFrame([(1, 1, "a")], ["pk", "k", "av"])
    b = spark.createDataFrame([(1, 10)], ["k", "bv"])
    dv = join_view_bidelta(
        a, a.limit(0), a.limit(0), b, b.limit(0), b.limit(0),
        on="k", b_pk=["k"],
    )
    assert dv.count() == 0
