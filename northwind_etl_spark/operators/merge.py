"""Batch MERGE INTO (CDC upsert/delete): apply a keyed change set to a
table snapshot — the batch primitive behind the reference's
delete-and-reload sink (etl_orders.py:96-137) when "reload" must not
rewrite the world, and the batch twin of the streaming foreachBatch
upsert (streaming/events_stream.py).

Scale shape — the CDC regime is "changes ≪ target", and the plan must
reflect it:

- the TARGET side is NEVER shuffled: suppressing replaced/deleted keys
  is a LEFT ANTI join against the resolved change keys, broadcast by
  default (a day's CDC key set is executor-memory-sized even when the
  target is 100 TB);
- intra-batch resolution (several change rows for one key → last one
  wins) happens entirely on the SMALL changes side: one groupBy(key)
  with a struct-max, cost proportional to |changes|;
- the result is anti-join ∪ upserts — a union, no join on the target's
  payload, no window over the target.

Contrast with the full-outer-join merge (the naive shape): that
shuffles BOTH tables on the key, i.e. re-clusters 100 TB to apply a
few GB of changes.  Here the target partitioning survives untouched,
so a sink that was written bucketed/z-ordered stays locality-friendly.

Determinism: last-wins is resolved by a total order — max over
struct(seq, op, payload...) — so equal-seq duplicates still resolve
identically on every engine (struct comparison is lexicographic by
field position in both Spark and the DuckDB oracle's row_number
replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_changes(
    changes: DataFrame,
    *,
    key: str,
    seq_col: str,
    op_col: str,
) -> DataFrame:
    """Collapse a change batch to exactly one row per key: the row with
    the greatest (seq, op, payload...) struct — last-wins by sequence,
    with the remaining fields only breaking exact seq ties so the
    result is deterministic under any partitioning."""
    payload = [c for c in changes.columns if c not in (key, seq_col, op_col)]
    packed = F.struct(
        F.col(seq_col).alias("__seq"),
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(c) for c in payload],
    )
    winner = changes.groupBy(key).agg(F.max(packed).alias("__w"))
    return winner.select(
        F.col(key),
        F.col("__w.__seq").alias(seq_col),
        F.col("__w.__op").alias(op_col),
        *[F.col(f"__w.{c}").alias(c) for c in payload],
    )


def merge_into(
    target: DataFrame,
    changes: DataFrame,
    *,
    key: str,
    op_col: str = "op",
    seq_col: str = "seq",
    delete_op: str = "D",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply `changes` to `target` and return the merged table with
    target's schema.

    `changes` carries target's columns plus `op_col` (any value other
    than `delete_op` means upsert — insert-or-replace the full row) and
    `seq_col` (intra-batch ordering; the greatest seq per key wins).
    A delete for an absent key and an update for an absent key are both
    legal: the anti join ignores the former, the union inserts the
    latter (upsert semantics).

    The returned plan never shuffles or rewrites unaffected target
    rows: one broadcast LEFT ANTI join + unionByName.  Set
    broadcast_changes=False only when the resolved change-key set
    genuinely exceeds broadcast size — the anti join then degrades to a
    shuffle on the key, which is still |changes|-bounded on its build
    side.
    """
    missing = [c for c in target.columns if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing target columns: {missing}")
    resolved = resolve_changes(changes, key=key, seq_col=seq_col, op_col=op_col)
    keys = resolved.select(key)
    if broadcast_changes:
        keys = F.broadcast(keys)
    survivors = target.join(keys, on=key, how="left_anti")
    upserts = resolved.where(F.col(op_col) != delete_op).select(*target.columns)
    return survivors.unionByName(upserts)
