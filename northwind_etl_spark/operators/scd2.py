"""SCD Type-2 history build: turn a change-event stream into validity
intervals — the standard dimension-versioning step of a warehouse ETL
(the reference's star schema keeps only current-state dimensions,
etl_product.py:31-58; SCD2 is the history-keeping generalization, and
the natural producer for the as-of join's right side: asof_join against
(key, eff_from) recovers "attribute as of time t").

One window pass per key:

    eff_from = change timestamp
    eff_to   = lead(change timestamp) — NULL for the current version
    version  = row_number per key

Scale shape: identical to any keyed window — one hash shuffle on the
business key, per-key sort, no self-join (the naive formulation joins
each change to "the next change" — an inequality self-join this
replaces).  Change rows carrying no actual attribute change are
optionally collapsed first (`collapse_unchanged`): a lag() comparison
inside the same keyed sort, so collapsing adds no extra shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    *,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    collapse_unchanged: bool = False,
    collapse_bucket: str | None = None,
) -> DataFrame:
    """Versioned history from change events.

    Returns key_cols + attr_cols + (eff_from, eff_to, version,
    is_current); [eff_from, eff_to) half-open intervals, eff_to NULL on
    the open current version.  Ties on (key, ts) must be pre-resolved
    (one change per key per timestamp) — same precondition as any SCD2
    load.

    Hot-key mitigation: with ``collapse_bucket`` (a window duration,
    e.g. ``"1 day"``; requires ``collapse_unchanged``), unchanged runs
    are first collapsed INSIDE each (key, tumbling-bucket) partition —
    buckets of one hot key spread across tasks, unlike the final keyed
    window.  Exact because run-collapse is locally computable and
    idempotent: dropping a row that equals its in-bucket predecessor
    never moves a run's first row (each bucket's first row is kept, and
    a run crossing the bucket boundary is re-collapsed by the global
    pass, which compares the previous bucket's LAST kept row — whose
    attrs equal its last actual row's attrs — against the next
    bucket's first).  The global window's input shrinks from the hot
    key's change count to (#true changes + #non-empty buckets); when
    duplicate states dominate — the collapse_unchanged regime — the
    straggler disappears.  Without collapse semantics every change row
    IS a version, the output itself is per-key-linear, and no
    pre-aggregation can shrink it."""
    key_cols, attr_cols = list(key_cols), list(attr_cols)
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    df = changes
    if collapse_bucket is not None and not collapse_unchanged:
        raise ValueError("collapse_bucket requires collapse_unchanged=True")
    if collapse_unchanged:
        attrs = F.struct(*[F.col(c) for c in attr_cols])
        if collapse_bucket is not None:
            bw = Window.partitionBy(
                *key_cols, F.window(F.col(ts_col), collapse_bucket)
            ).orderBy(F.col(ts_col).asc())
            df = (
                df.withColumn("__prev_b", F.lag(attrs).over(bw))
                .where(F.col("__prev_b").isNull() | (F.col("__prev_b") != attrs))
                .drop("__prev_b")
            )
        df = (
            df.withColumn("__prev", F.lag(attrs).over(w))
            .where(F.col("__prev").isNull() | (F.col("__prev") != attrs))
            .drop("__prev")
        )
        # re-rank over the collapsed rows (same partitioning, the sort
        # is reused within the stage)
        w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    return df.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("eff_from"),
        F.lead(ts_col).over(w).alias("eff_to"),
        F.row_number().over(w).alias("version"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def scd2_merge(
    history: DataFrame,
    changes: DataFrame,
    *,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    collapse_unchanged: bool = False,
    collapse_bucket: str | None = None,
) -> DataFrame:
    """Incremental SCD2 upsert: merge a CDC delta into an existing
    history so the result EQUALS ``scd2_history`` over the full change
    stream — while recomputing only the keys the delta touches.

    The incremental contract a 100 TB dimension needs: a daily delta
    touches a small fraction of keys, so rebuilding the whole history
    (shuffle + window over every key's every version) is the one cost
    that cannot be paid per-load.  Here untouched keys' history rows
    pass through without a window (one anti-join), and only the
    affected keys replay: their versions fold back into change rows
    (eff_from, attrs) — which, because SCD2 versions ARE the collapsed
    change stream, reconstruct that key's exact input — union with the
    delta, and re-run the standard build.  Cost scales with
    |affected keys' history| + |delta|, not |history|.

    Exactness: with ``collapse_unchanged=False`` every original change
    survives as a version, so replay ∪ delta is literally the full
    stream for affected keys — the merge equals the full rebuild for
    ANY delta, including late (out-of-order) changes.  With
    ``collapse_unchanged=True`` runs were collapsed, so a late change
    landing INSIDE a collapsed run cannot resurrect the run's dropped
    rows; the merge is exact for append-only deltas (each key's new
    changes at ts > that key's last eff_from) — the normal CDC regime.
    Equality with the full rebuild is pinned in
    tests/test_skew_mitigation.py for both regimes.

    Ties on (key, ts) between replayed history and delta violate the
    same one-change-per-(key, ts) precondition as scd2_history.
    """
    key_cols, attr_cols = list(key_cols), list(attr_cols)
    keys = changes.select(*key_cols).distinct()
    affected = history.join(keys, key_cols, "leftsemi")
    untouched = history.join(keys, key_cols, "leftanti")
    replay = affected.select(*key_cols, *attr_cols, F.col("eff_from").alias(ts_col))
    merged = replay.unionByName(changes.select(*key_cols, *attr_cols, ts_col))
    rebuilt = scd2_history(
        merged,
        key_cols=key_cols,
        ts_col=ts_col,
        attr_cols=attr_cols,
        collapse_unchanged=collapse_unchanged,
        collapse_bucket=collapse_bucket,
    )
    return untouched.unionByName(rebuilt)
