"""Distribution-drift detection between corpus slices: two-sample
Kolmogorov–Smirnov statistics computed from mergeable histogram states.

A training-data pipeline needs to notice when one source's documents
stop looking like the rest of the corpus (scraper broke, boilerplate
flood, truncation bug).  The scalable form of the KS two-sample test
compares empirical CDFs evaluated on a FIXED bin grid: per (slice,
bin) counts — one map-side-combined aggregation over the corpus — then
driver-free cumulative sums over the tiny (|slices| × nbins) grid.
Exact-binary bin widths keep every count, cumulative, and division
engine-portable, so the DuckDB oracle lands on bit-identical
statistics (same contract as incremental.hist_quantiles).

Grid resolution bounds the deviation from the exact KS statistic by
the bin mass; for monitoring, the binned statistic IS the metric —
it is computed exactly and reproducibly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_drift_by_group(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Per group g: binned two-sample KS statistic between g's values
    and the REST of the table's values (leave-one-out), plus n_docs.

    One aggregation touches the data; everything after runs on the
    ≤ |groups| × nbins grid.  Requires ≥ 2 groups (n_rest > 0)."""
    width = (hi - lo) / nbins
    v = F.col(value_col).cast("double")
    bin_ = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")),
    )
    cnt = df.groupBy(F.col(group_col).alias("g"), bin_.alias("b")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # dense grid over bins that carry mass anywhere (CDF steps only
    # there, so evaluating the sup there is exact)
    bins = cnt.select("b").distinct()
    groups = cnt.groupBy("g").agg(F.sum("c").alias("n_g")).withColumn(
        # corpus total from the tiny groups table — no driver action
        "n_all",
        F.sum("n_g").over(Window.partitionBy(F.lit(1))),
    )
    grid = groups.crossJoin(F.broadcast(bins))  # |groups| × nbins, tiny
    filled = grid.join(cnt, ["g", "b"], "left").withColumn(
        "c", F.coalesce(F.col("c"), F.lit(0))
    )
    w_cum = (
        Window.partitionBy("g")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = (
        Window.partitionBy(F.lit(1))
        .orderBy("b")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_bin_tot = filled.groupBy("b").agg(F.sum("c").alias("ct"))
    tot = per_bin_tot.withColumn("cum_all", F.sum("ct").over(w_tot)).select(
        "b", "cum_all"
    )
    cum = (
        filled.withColumn("cum_g", F.sum("c").over(w_cum))
        .join(F.broadcast(tot), "b")
        .withColumn("cum_rest", F.col("cum_all") - F.col("cum_g"))
        .withColumn("n_rest", F.col("n_all") - F.col("n_g"))
        .withColumn(
            "diff",
            F.abs(
                F.col("cum_g") / F.col("n_g") - F.col("cum_rest") / F.col("n_rest")
            ),
        )
    )
    return (
        cum.groupBy("g")
        .agg(
            F.max("n_g").alias("n_docs"),
            F.round(F.max("diff"), 6).alias("ks_stat"),
        )
        .select(F.col("g").alias(group_col), "n_docs", "ks_stat")
    )
