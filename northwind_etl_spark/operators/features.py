"""Feature-engineering operators for ML data prep: exact
equal-frequency discretization (quantile binning) built on the
repo's scalable total-order machinery.

The reference has no feature-prep surface (it is a 3-script pandas
ETL, `/root/reference/etl_orders.py:7-137` is the closest analogue);
this module belongs to the north-star LLM/ML-pipeline family next to
`text.py::hashed_features` (hashing-trick features) and
`sampling.py` (deterministic splits).

Design note — why rank-then-divide and not boundary lookup: the
textbook implementation computes n_bins-1 quantile BOUNDARIES and
broadcasts them, but exact boundaries each cost a multi-pass
selection (operators/selection.py), and ties ON a boundary make bin
populations ambiguous.  Ranking over a TOTAL order (value, id) makes
the bin assignment a pure function of the rank — bin sizes are exact
to ±1 BY CONSTRUCTION, ties broken deterministically — and the rank
itself comes from `ranking.global_row_number`: range-partition, sort
WITHIN partitions, broadcast per-partition offsets.  No global
single-partition sort anywhere; the only driver state is the
partition-count list.  This is ntile() semantics at scale (and the
oracle replays it with literal NTILE-free ROW_NUMBER arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_bin(
    df: DataFrame,
    col: str,
    id_col: str,
    *,
    n_bins: int,
    bin_col: str = "bin",
) -> DataFrame:
    """Append `bin_col` in [0, n_bins): equal-frequency bin of `col`
    under the total order (col, id_col) — bin = (rank-1)*n_bins DIV n,
    so every bin holds floor(n/n_bins) or ceil(n/n_bins) rows exactly.

    Rows with NULL `col` are passed through with a NULL bin (they have
    no place in the value order); `id_col` must be unique — it is the
    tie-breaker that makes ranks, and therefore bins, deterministic
    under any partitioning.  Cost: one range exchange + local sorts +
    one count job (the same work global_row_number already does); the
    (rank-1)*n_bins product stays in long range up to ~10^15/n_bins
    rows.
    """
    from .ranking import global_row_number

    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    present = df.where(F.col(col).isNotNull())
    absent = df.where(F.col(col).isNull())
    ranked = global_row_number(
        present, [F.col(col), F.col(id_col)], rank_col="__rn"
    )
    n = present.count()
    if n == 0:
        return df.withColumn(bin_col, F.lit(None).cast("int"))
    binned = ranked.withColumn(
        bin_col,
        F.expr(f"CAST(((__rn - 1) * {int(n_bins)}) DIV {int(n)} AS INT)"),
    ).drop("__rn")
    return binned.unionByName(
        absent.withColumn(bin_col, F.lit(None).cast("int"))
    )


def quantile_bin_summary(
    df: DataFrame,
    col: str,
    id_col: str,
    *,
    n_bins: int,
) -> DataFrame:
    """(bin, n, lo, hi) per equal-frequency bin — the discretization
    table a feature store publishes: row counts exact to ±1 and the
    observed value range of each bin.  One aggregation over the binned
    relation; output is n_bins rows."""
    binned = quantile_bin(df, col, id_col, n_bins=n_bins)
    return (
        binned.where(F.col("bin").isNotNull())
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(col).alias("lo"),
            F.max(col).alias("hi"),
        )
    )
