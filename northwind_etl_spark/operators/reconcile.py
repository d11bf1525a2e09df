"""Table reconciliation: diff two snapshots of a keyed table without
shuffling rows that didn't change.

The reference's sinks are truncate-and-reload / delete-and-reload
(etl_orders.py:96-137 — rebuild, then eyeball row counts); at 100 TB
the verify step needs to answer "what changed?" without a full
row-by-row compare.  Standard two-level scheme (the batch analog of a
Merkle sync):

  level 1 — per-BUCKET fingerprints: bucket = pmod(key, B); per side
            aggregate (row_count, SUM(row_hash)) per bucket.  One
            map-side-combined aggregation each, output 2·B tiny rows.
            Buckets whose (count, hash-sum) agree on both sides are
            provably unchanged (mod hash collisions) and are never
            touched again.
  level 2 — per-ROW compare, but ONLY inside dirty buckets: both sides
            are pre-filtered with a broadcast semi-join on the dirty
            bucket ids (driver-sized: ≤ B ints), then full-outer-joined
            on the key to classify added / removed / changed.

With a day's drift touching 0.1% of buckets, level 2 reads and shuffles
0.1% of the table; the other 99.9% costs one scan + one partial agg.

row_hash is md5 over a sentinel-joined rendering of every column —
engine-portable (md5 is bit-standard), order-independent under SUM,
collision probability ~n²/2^60 on the 15-hex-digit prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import persist_stage

_SENTINEL = "\x1f"


def row_hash(df: DataFrame, cols: list[str]) -> F.Column:
    """Deterministic per-row 60-bit hash: md5 over all columns with an
    explicit NULL sentinel (concat_ws alone would collapse NULL and '')."""
    rendered = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols
    ]
    hx = F.md5(F.concat_ws(_SENTINEL, *rendered))
    return F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key: str,
    buckets: int = 256,
) -> DataFrame:
    """Diff `old` vs `new` on `key`; returns one summary row
    (n_added, n_removed, n_changed, n_unchanged).

    Both inputs must share a schema and have unique keys.  Clean
    buckets are settled from the level-1 fingerprints alone; only dirty
    buckets reach the row-level full outer join.
    """
    cols = old.columns
    if new.columns != cols:
        raise ValueError(f"schema mismatch: {cols} vs {new.columns}")

    def fingerprint(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("__h", row_hash(df, cols))
            .withColumn("__b", F.pmod(F.col(key).cast("long"), F.lit(buckets)))
            .groupBy("__b")
            .agg(
                F.count(F.lit(1)).alias("__cnt"),
                F.sum(F.col("__h").cast("decimal(38,0)")).alias("__sum"),
            )
        )

    fp_old = fingerprint(old).alias("fo")
    fp_new = fingerprint(new).alias("fn")
    # 2·B-row stage consumed by three branches (dirty ids, clean-bucket
    # settlement, and both level-2 semi-joins); without the persist each
    # branch re-scans BOTH snapshots to rebuild the fingerprints.
    fp = persist_stage(fp_old.join(fp_new, on="__b", how="full_outer"))
    dirty = fp.where(
        ~(
            F.col("fo.__cnt").eqNullSafe(F.col("fn.__cnt"))
            & F.col("fo.__sum").eqNullSafe(F.col("fn.__sum"))
        )
    ).select("__b")
    clean_unchanged = fp.join(dirty, on="__b", how="left_anti").agg(
        F.coalesce(F.sum("fo.__cnt"), F.lit(0)).alias("n")
    )

    def dirty_rows(df: DataFrame) -> DataFrame:
        keyed = df.select(
            F.col(key).alias("__key"),
            row_hash(df, cols).alias("__h"),
            F.pmod(F.col(key).cast("long"), F.lit(buckets)).alias("__b"),
        )
        return keyed.join(F.broadcast(dirty), on="__b", how="left_semi")

    o, n = dirty_rows(old).alias("o"), dirty_rows(new).alias("n")
    rows = o.join(n, on=F.col("o.__key") == F.col("n.__key"), how="full_outer")
    classified = rows.select(
        F.when(F.col("o.__key").isNull(), "added")
        .when(F.col("n.__key").isNull(), "removed")
        .when(F.col("o.__h") != F.col("n.__h"), "changed")
        .otherwise("unchanged")
        .alias("state")
    )
    counts = classified.groupBy("state").agg(F.count(F.lit(1)).alias("c"))

    def pick(state: str) -> F.Column:
        return F.coalesce(
            F.sum(F.when(F.col("state") == state, F.col("c"))), F.lit(0)
        )

    summary = counts.agg(
        pick("added").alias("n_added"),
        pick("removed").alias("n_removed"),
        pick("changed").alias("n_changed"),
        pick("unchanged").alias("dirty_unchanged"),
    )
    return summary.crossJoin(clean_unchanged).select(
        "n_added",
        "n_removed",
        "n_changed",
        (F.col("dirty_unchanged") + F.col("n")).alias("n_unchanged"),
    )
