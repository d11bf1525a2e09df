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
) -> DataFrame:
    """Versioned history from change events.

    Returns key_cols + attr_cols + (eff_from, eff_to, version,
    is_current); [eff_from, eff_to) half-open intervals, eff_to NULL on
    the open current version.  Ties on (key, ts) must be pre-resolved
    (one change per key per timestamp) — same precondition as any SCD2
    load.
    """
    key_cols, attr_cols = list(key_cols), list(attr_cols)
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    df = changes
    if collapse_unchanged:
        attrs = F.struct(*[F.col(c) for c in attr_cols])
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
