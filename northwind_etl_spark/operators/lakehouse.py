"""Lakehouse table-maintenance operators: merge-on-read positional
deletes, snapshot expiration, and snapshot changelog (CDC diff).

The reference (roberthpchao/Northwind-ETL, `Project Plan6.md:154-163`)
maintains its warehouse by truncate-and-reload — the whole table is the
unit of change.  At 100 TB the unit of change is the ROW VERSION inside
an append-only log (Iceberg/Delta-style), and the three operators a
table-format user runs every day are:

- apply a DELETION VECTOR without rewriting data files (merge-on-read:
  the base scan stays immutable; deletes are a bounded side relation
  anti-joined in),
- EXPIRE SNAPSHOTS: find row versions no time-travel read at or after a
  retention cutoff can ever see (their superseding version committed
  before the cutoff) — the storage-reclaim sweep,
- CHANGELOG between two snapshots: the insert/update/delete row diff
  (CDC) that incremental consumers read instead of re-scanning state.

All three are pure DataFrame compositions — one broadcast anti-join /
one keyed window / two keyed aggregations — no UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def apply_deletion_vector(
    base: DataFrame, deletes: DataFrame, pos_col: str
) -> DataFrame:
    """Merge-on-read: return `base` minus the positions listed in
    `deletes` (a relation with the single column `pos_col`).

    100 TB shape: the delete vector is SMALL BY DEFINITION (it only
    exists because rewriting the base files was too expensive), so it
    broadcasts and the base relation is never shuffled — the scan plus
    a broadcast LEFT ANTI probe, exactly how Iceberg v2 position
    deletes and Delta deletion vectors execute.  Plan-asserted in
    tests/test_lakehouse.py.
    """
    return base.join(
        F.broadcast(deletes.select(pos_col).distinct()), pos_col, "left_anti"
    )


def snapshot_expiration(
    log: DataFrame,
    key_col: str,
    txn_col: str,
    cutoff: Column,
    *,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Classify every row version of an append-only keyed log for a
    retention sweep with time-travel floor `cutoff`:

    - ``live``: the key's newest version — visible to the current read,
    - ``retained``: superseded, but its successor committed AFTER the
      cutoff, so some time-travel read in [cutoff, now) still resolves
      to it — must be kept,
    - ``reclaimable``: superseded by a version that committed at or
      before the cutoff — NO read at or after the cutoff can see it;
      safe to vacuum.

    One keyed lead() window; no self-join.  Pass `tiebreak_col` when
    txn values can collide within a key (determinism hygiene — the
    status CLASSIFICATION is tie-order-invariant because tied versions
    see each other's equal txn, but row identity in the output should
    not depend on partitioning).  Returns the log with a
    `version_status` column.
    """
    order = [F.col(txn_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(txn_col).over(w)
    return log.withColumn(
        "version_status",
        F.when(nxt.isNull(), F.lit("live"))
        .when(nxt <= cutoff, F.lit("reclaimable"))
        .otherwise(F.lit("retained")),
    )


def snapshot_state(
    log: DataFrame,
    key_col: str,
    txn_col: str,
    at: Column,
    *,
    value_col: str,
    tiebreak_col: str,
    tombstone: Column | None = None,
) -> DataFrame:
    """State of the keyed log as of transaction time `at`: per key the
    value of the latest version with txn <= at — ONE max_by keyed
    aggregation (no window, no self-join; the bitemporal_user_state
    plan shape).  A version matching `tombstone` is a delete marker:
    the key is absent from the state if its latest version is a
    tombstone.  Returns (key, value, txn)."""
    key = F.struct(F.col(txn_col), F.col(tiebreak_col))
    snap = (
        log.where(F.col(txn_col) <= at)
        .groupBy(key_col)
        .agg(
            F.max_by(value_col, key).alias("value"),
            F.max_by(
                tombstone if tombstone is not None else F.lit(False), key
            ).alias("__dead"),
            F.max(F.col(txn_col)).alias("txn"),
        )
    )
    return snap.where(~F.col("__dead")).drop("__dead")


def snapshot_changelog(
    state_old: DataFrame,
    state_new: DataFrame,
    key_col: str,
    value_col: str = "value",
) -> DataFrame:
    """CDC diff between two snapshot states (each (key, value, ...)):
    full outer join on the key →

    - ``insert``: key only in the new state,
    - ``delete``: key only in the old state,
    - ``update``: both, value changed (null-safe comparison),
    - keys with an unchanged value are NOT emitted (a changelog carries
      changes only).

    Returns (key, change_type, old_value, new_value).  One shuffle on
    the key; at 100 TB both sides are state tables (one row per key),
    already far smaller than the logs they summarize.
    """
    o = state_old.select(
        F.col(key_col), F.col(value_col).alias("__old_v"), F.lit(True).alias("__in_old")
    )
    n = state_new.select(
        F.col(key_col), F.col(value_col).alias("__new_v"), F.lit(True).alias("__in_new")
    )
    joined = o.join(n, key_col, "full_outer")
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(~F.col("__old_v").eqNullSafe(F.col("__new_v")), F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            key_col,
            "change_type",
            F.col("__old_v").alias("old_value"),
            F.col("__new_v").alias("new_value"),
        )
    )


def changelog_compose(
    l12: DataFrame, l23: DataFrame, key_col: str
) -> DataFrame:
    """Compose two consecutive CDC changelogs into the NET changelog —
    the correctness property every incremental consumer silently
    relies on: applying t1→t2 then t2→t3 must equal applying t1→t3.
    Full outer join on the key; a key present in both diffs nets out
    by existence algebra (existed-at-t1 = l12 was not an insert;
    exists-at-t3 = l23 is not a delete) with old value from l12 and
    new value from l23; reverted keys (update back to the original,
    insert-then-delete) vanish, exactly like snapshot_changelog's
    unchanged keys.  One shuffle on the key over two CHANGELOGS (far
    smaller than state, far smaller than the logs).

    Returns (key, change_type, old_value, new_value)."""
    a = l12.select(
        F.col(key_col),
        F.col("change_type").alias("__t12"),
        F.col("old_value").alias("__o12"),
        F.col("new_value").alias("__n12"),
    )
    b = l23.select(
        F.col(key_col),
        F.col("change_type").alias("__t23"),
        F.col("old_value").alias("__o23"),
        F.col("new_value").alias("__n23"),
    )
    j = a.join(b, key_col, "full_outer")
    in_old = F.when(F.col("__t12").isNotNull(), F.col("__t12") != "insert").otherwise(
        F.col("__t23") != "insert"
    )
    in_new = F.when(F.col("__t23").isNotNull(), F.col("__t23") != "delete").otherwise(
        F.col("__t12") != "delete"
    )
    old_v = F.when(F.col("__t12").isNotNull(), F.col("__o12")).otherwise(
        F.col("__o23")
    )
    new_v = F.when(F.col("__t23").isNotNull(), F.col("__n23")).otherwise(
        F.col("__n12")
    )
    change = (
        F.when(~in_old & in_new, F.lit("insert"))
        .when(in_old & ~in_new, F.lit("delete"))
        .when(in_old & in_new & ~old_v.eqNullSafe(new_v), F.lit("update"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            key_col,
            "change_type",
            old_v.alias("old_value"),
            new_v.alias("new_value"),
        )
    )
