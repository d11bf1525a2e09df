"""Planted-fixture semantics + plan contracts for the lakehouse
operators (operators/lakehouse.py).  Cross-engine value parity is
pinned by the registry oracles; these tests pin behavior and the
merge-on-read plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from northwind_etl_spark.operators.lakehouse import (
    apply_deletion_vector,
    snapshot_changelog,
    snapshot_expiration,
    snapshot_state,
)


def test_deletion_vector_removes_exact_positions(spark):
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "pos LONG, payload STRING"
    )
    dv = spark.createDataFrame([(2,), (5,), (5,), (99,)], "pos LONG")
    kept = apply_deletion_vector(base, dv, "pos")
    assert sorted(r.pos for r in kept.collect()) == [0, 1, 3, 4, 6, 7, 8, 9]


def test_deletion_vector_broadcasts_and_never_shuffles_base(spark):
    base = spark.range(1000).select(
        F.col("id").alias("pos"), (F.col("id") * 2).alias("payload")
    )
    dv = spark.createDataFrame([(4,), (8,)], "pos LONG")
    plan = apply_deletion_vector(base, dv, "pos")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # merge-on-read contract: the BASE relation reaches the join
    # without a shuffle — everything above the BroadcastExchange (the
    # streamed side in the plan print) is exchange-free; the only
    # shuffle sits under the broadcast, deduplicating the tiny vector
    assert "SortMergeJoin" not in plan
    base_side = plan.split("BroadcastExchange")[0]
    assert "Exchange" not in base_side, plan


def test_snapshot_expiration_statuses(spark):
    # key A: versions at t1 < t2 < t3 with cutoff t2 → v1 reclaimable
    # (superseded by t2 <= cutoff), v2 retained (superseded after the
    # cutoff), v3 live; key B: single version → live
    log = spark.createDataFrame(
        [
            ("A", 1, "2024-01-01 00:00:00"),
            ("A", 2, "2024-01-05 00:00:00"),
            ("A", 3, "2024-01-20 00:00:00"),
            ("B", 4, "2024-01-02 00:00:00"),
        ],
        "k STRING, eid LONG, txn STRING",
    ).withColumn("txn", F.col("txn").cast("timestamp"))
    out = snapshot_expiration(
        log, "k", "txn", F.lit("2024-01-05 00:00:00").cast("timestamp"),
        tiebreak_col="eid",
    )
    got = {r.eid: r.version_status for r in out.collect()}
    assert got == {1: "reclaimable", 2: "retained", 3: "live", 4: "live"}


def _mk_log(spark):
    return spark.createDataFrame(
        [
            # key 1: v=10 then updated to 20 (update)
            (1, 1, "e", 10.0, "2024-01-01 00:00:00"),
            (1, 2, "e", 20.0, "2024-01-12 00:00:00"),
            # key 2: unchanged across both snapshots (not emitted)
            (2, 3, "e", 5.0, "2024-01-02 00:00:00"),
            # key 3: appears after T1 (insert)
            (3, 4, "e", 7.0, "2024-01-15 00:00:00"),
            # key 4: tombstoned after T1 (delete)
            (4, 5, "e", 9.0, "2024-01-03 00:00:00"),
            (4, 6, "dead", 0.0, "2024-01-13 00:00:00"),
            # key 5: tombstoned before T1 → in neither state
            (5, 7, "dead", 1.0, "2024-01-04 00:00:00"),
        ],
        "k LONG, eid LONG, typ STRING, v DOUBLE, txn STRING",
    ).withColumn("txn", F.col("txn").cast("timestamp"))


def test_snapshot_state_and_changelog(spark):
    log = _mk_log(spark)
    dead = F.col("typ") == "dead"
    t1 = F.lit("2024-01-10 00:00:00").cast("timestamp")
    t2 = F.lit("2024-01-20 00:00:00").cast("timestamp")
    s1 = snapshot_state(
        log, "k", "txn", t1, value_col="v", tiebreak_col="eid", tombstone=dead
    )
    assert {r.k: r.value for r in s1.collect()} == {1: 10.0, 2: 5.0, 4: 9.0}
    s2 = snapshot_state(
        log, "k", "txn", t2, value_col="v", tiebreak_col="eid", tombstone=dead
    )
    diff = {
        r.k: (r.change_type, r.old_value, r.new_value)
        for r in snapshot_changelog(s1, s2, "k").collect()
    }
    assert diff == {
        1: ("update", 10.0, 20.0),
        3: ("insert", None, 7.0),
        4: ("delete", 9.0, None),
    }
