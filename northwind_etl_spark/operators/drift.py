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


def psi_by_group(
    df: DataFrame,
    group_col: str,
    window_col: str,
    bucket_col: str,
    *,
    n_buckets: int = 10,
    max_window: int = 2**31,
) -> DataFrame:
    """Population Stability Index per group between two windows — the
    standard model-monitoring drift score (PSI < 0.1 stable, > 0.25
    action): PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over a fixed bucket
    grid, with add-one (Laplace) smoothing so empty buckets stay
    finite:  p_b = (c0_b+1)/(n0+B),  q_b = (c1_b+1)/(n1+B).

    `window_col` must be 0 (baseline) / 1 (comparison); `bucket_col`
    an integer in [0, n_buckets) — the caller owns the (data-
    independent) bucketing so the grid is identical on both engines.

    Exactness: ln goes through the frozen 1024-cell grid
    (functions/lnlut.py), and the sum is EXACT by clearing
    denominators — (p−q) = num_b / D with the per-group constant
    D = (n0+B)(n1+B), so PSI·D = Σ_b num_b·Δln_b is an exact DECIMAL
    sum of integer×literal products, divided by D in ONE
    correctly-rounded double step.  Order/partitioning-independent.
    Overflow contract: window sizes must stay under 2³¹ (num_b
    multiplies two of them) — enforced by an in-plan raise, mirrored
    in oracles (the cusum guard pattern).

    Scale shape: one (group, window, bucket) hash agg over the data,
    then everything runs on the bucket-grid-bounded frame.
    """
    from ..functions.lnlut import laplace_ln_lut_col

    B = int(n_buckets)
    lim = int(max_window)
    counts = df.groupBy(
        F.col(group_col).alias("__g"),
        F.col(window_col).cast("int").alias("__w"),
        F.col(bucket_col).cast("int").alias("__b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    totals = counts.groupBy("__g", "__w").agg(
        F.sum("c").cast("long").alias("n")
    )
    totals = totals.withColumn(
        "n",
        F.when(F.col("n") + B < lim, F.col("n")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("psi_by_group: window size "),
                    F.col("n").cast("string"),
                    F.lit(f" >= {lim} — num_b would overflow BIGINT"),
                )
            )
        ),
    )
    # full bucket grid per (group, window): missing buckets count 0
    grid = (
        totals.select(
            "__g", "__w", "n", F.explode(F.sequence(F.lit(0), F.lit(B - 1)))
            .alias("__b")
        )
        .join(counts, ["__g", "__w", "__b"], "left")
        .select(
            "__g", "__w", "__b", "n",
            F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c"),
        )
    )
    p0 = grid.where(F.col("__w") == 0).select(
        "__g", "__b", F.col("c").alias("c0"), F.col("n").alias("n0")
    )
    p1 = grid.where(F.col("__w") == 1).select(
        "__g", "__b", F.col("c").alias("c1"), F.col("n").alias("n1")
    )
    lut = laplace_ln_lut_col()

    def lnq(c: str, n: str) -> F.Column:
        g = F.expr(f"least(1023, (({c} + 1) * 1024) DIV ({n} + {B}))")
        return F.element_at(lut, g.cast("int") + F.lit(1))

    rows = p0.join(p1, ["__g", "__b"]).select(
        "__g",
        "n0",
        "n1",
        F.expr(f"(c0 + 1) * (n1 + {B}) - (c1 + 1) * (n0 + {B})")
        .cast("decimal(20,0)")
        .alias("num"),
        (lnq("c0", "n0") - lnq("c1", "n1")).alias("dln"),
    )
    return (
        rows.groupBy(F.col("__g").alias(group_col))
        .agg(
            F.max("n0").cast("long").alias("n_baseline"),
            F.max("n1").cast("long").alias("n_comparison"),
            (
                F.sum(F.col("num") * F.col("dln")).cast("double")
                / (
                    (F.max("n0") + F.lit(B)).cast("double")
                    * (F.max("n1") + F.lit(B)).cast("double")
                )
            ).alias("psi"),
        )
        .orderBy(group_col)
    )
