"""Planted-fixture proofs for the batch MERGE INTO operator
(operators/merge.py): action semantics (insert / update / delete /
absent-key edge cases), intra-batch last-wins resolution, determinism
of the struct-max tie-break, idempotence, and the scale contract —
the target side is never shuffled (broadcast LEFT ANTI, no
SortMergeJoin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from northwind_etl_spark.operators.merge import merge_into, resolve_changes


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        ["k", "name", "val"],
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_actions(spark):
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, 1, "U"),  # update existing
            (4, None, 0.0, 1, "D"),  # delete existing
            (5, "e", 50.0, 1, "I"),  # insert new
            (9, None, 0.0, 1, "D"),  # delete absent key: no-op
            (6, "f", 60.0, 1, "U"),  # update absent key: upsert-inserts
        ],
        ["k", "name", "val", "seq", "op"],
    )
    got = _rows(merge_into(_target(spark), changes, key="k"))
    assert got == [
        (1, "a", 10.0),
        (2, "b2", 21.0),
        (3, "c", 30.0),
        (5, "e", 50.0),
        (6, "f", 60.0),
    ]


def test_merge_last_wins_and_delete_outranks(spark):
    changes = spark.createDataFrame(
        [
            (1, "a1", 11.0, 1, "U"),
            (1, "a2", 12.0, 2, "U"),  # higher seq wins
            (2, "bX", 0.0, 1, "U"),
            (2, None, 0.0, 5, "D"),  # delete at higher seq wins
            (3, None, 0.0, 1, "D"),
            (3, "c3", 33.0, 2, "U"),  # resurrect after delete: update wins
        ],
        ["k", "name", "val", "seq", "op"],
    )
    got = _rows(merge_into(_target(spark), changes, key="k"))
    assert got == [(1, "a2", 12.0), (3, "c3", 33.0), (4, "d", 40.0)]


def test_resolve_equal_seq_is_deterministic(spark):
    # exact seq tie: the struct-max total order (seq, op, payload)
    # resolves identically under any partitioning — 'U' > 'D', then
    # payload lexicographic
    changes = spark.createDataFrame(
        [(1, "x", 1.0, 7, "U"), (1, "y", 2.0, 7, "D"), (1, "x", 9.0, 7, "U")],
        ["k", "name", "val", "seq", "op"],
    )
    for n in (1, 3, 8):
        r = resolve_changes(
            changes.repartition(n), key="k", seq_col="seq", op_col="op"
        ).collect()
        assert len(r) == 1
        assert (r[0].op, r[0].name, r[0].val) == ("U", "x", 9.0)


def test_merge_is_idempotent(spark):
    changes = spark.createDataFrame(
        [(2, "b2", 21.0, 1, "U"), (3, None, 0.0, 1, "D"), (7, "g", 70.0, 1, "I")],
        ["k", "name", "val", "seq", "op"],
    )
    once = merge_into(_target(spark), changes, key="k")
    twice = merge_into(once, changes, key="k")
    assert _rows(once) == _rows(twice)


def test_merge_requires_target_columns(spark):
    changes = spark.createDataFrame([(1, 1, "U")], ["k", "seq", "op"])
    try:
        merge_into(_target(spark), changes, key="k")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "missing target columns" in str(e)


def test_merge_plan_never_shuffles_target(spark):
    changes = spark.createDataFrame(
        [(2, "b2", 21.0, 1, "U")], ["k", "name", "val", "seq", "op"]
    )
    merged = merge_into(_target(spark), changes, key="k")
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    # the only exchange belongs to the changes-side resolution groupBy;
    # the target scan feeds the anti join directly
    assert "ShuffledHashJoin" not in plan
