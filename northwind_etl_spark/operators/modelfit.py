"""Grouped-map model fitting via applyInPandas (north-star "Python on
Arrow" surface): fit one small model per group, in parallel, where the
model itself isn't expressible as a SQL aggregate in general.

The demo fit IS SQL-expressible (per-group OLS y = a·x + b) —
deliberately, so the applyInPandas plumbing gets a full value-level
DuckDB oracle (regr_slope/regr_intercept) rather than a rows-only
check; swapping the fit body for scipy/sklearn (not in this container)
changes nothing about the Spark-side shape.

Scale shape: applyInPandas shuffles once on the group key and streams
each group through Arrow into one pandas frame — right when groups are
bounded (here: months per entity, ≤ a few hundred rows); a group that
doesn't fit in memory needs a streaming aggregate instead, which is
what the SQL twin (regr_slope as F.expr) is for.  Numerics: closed-form
normal equations on x centered per group — mathematically equal to
regr_slope/intercept, and centering keeps the cancellation error far
below the 1e-6 comparison rounding.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_linear_by_group(
    df: DataFrame,
    *,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group OLS fit: returns group_cols + n_points, slope,
    intercept (NULL slope/intercept for degenerate groups: fewer than
    two points or zero x-variance)."""
    out_fields = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    )
    schema = f"{out_fields}, n_points long, slope double, intercept double"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        x = pdf[x_col].astype("float64")
        y = pdf[y_col].astype("float64")
        n = len(pdf)
        slope = intercept = None
        if n >= 2:
            xc = x - x.mean()
            sxx = float((xc * xc).sum())
            if sxx > 0.0:
                slope = float((xc * y).sum()) / sxx
                intercept = float(y.mean()) - slope * float(x.mean())
                slope = round(slope, round_to)
                intercept = round(intercept, round_to)
        return pd.DataFrame(
            [{**keys, "n_points": n, "slope": slope, "intercept": intercept}]
        )

    return df.groupBy(*group_cols).applyInPandas(fit, schema=schema)


def closed_form_corr_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    x_decimal: str = "decimal(12,2)",
    y_decimal: str = "decimal(14,2)",
) -> DataFrame:
    """Whole-relation Pearson correlation + OLS (y = slope·x +
    intercept) from EXACT mergeable moments — the cross-engine-exact
    complement to fit_linear_by_group's per-group Arrow fit.

    The five moments (Σx, Σy, Σxy, Σx², Σy²) are summed in the decimal
    domain (order-independent, partition-count-independent — the money
    discipline), then corr/slope/intercept are derived in a FIXED
    sequence of double IEEE steps both engines replay identically:
    cast each exact sum to double once, then only correctly-rounded
    ops (·, −, /, sqrt).  This is also the mergeable-state story: the
    moment vector is additive, so shard states merge by plain + (the
    incremental.py contract) and the finalizer is this same scalar
    math.

    Decimal widths are the caller's overflow contract: defaults fit
    TPC-H quantity/price at any tested SF (products peak < 1e15 at
    sf0.1 vs the 10^34 capacity of the sum type).
    """
    from pyspark.sql import functions as F

    x = F.col(x_col).cast(x_decimal)
    y = F.col(y_col).cast(y_decimal)
    s = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov_n = nd * sxy - sx * sy
    var_x = nd * sxx - sx * sx
    var_y = nd * syy - sy * sy
    return s.select(
        F.col("n").cast("long").alias("n"),
        (cov_n / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr"),
        (cov_n / var_x).alias("slope"),
        ((sy - (cov_n / var_x) * sx) / nd).alias("intercept"),
    )


def wilson_bounds(k, n, *, z: float = 1.96):
    """Wilson score interval (Wilson 1927) for a binomial proportion
    k/n, returned as (lo, hi) Column expressions — the confidence
    band a product-analytics funnel or A/B readout should publish
    instead of a bare rate.

    Engine-portable by the repo's fixed-IEEE-sequence discipline (the
    KS/corr finalizer argument): k and n arrive as exact integers, and
    every subsequent step — /, *, +, -, sqrt — is a correctly-rounded
    IEEE-754 double op in a FIXED expression tree, so any conforming
    engine computes bit-identical bounds.  No erf/inverse-normal is
    needed (z is a caller-supplied literal), which is what keeps this
    cross-engine exact where a p-value would not be.  NULL when n = 0
    (ANSI division guard; an empty denominator has no interval).
    """
    kd = k.cast("double")
    nd = n.cast("double")
    zl = F.lit(float(z))
    z2 = zl * zl
    p = kd / nd
    denom = F.lit(1.0) + z2 / nd
    center = p + z2 / (F.lit(2.0) * nd)
    rad = F.sqrt(p * (F.lit(1.0) - p) / nd + z2 / (F.lit(4.0) * nd * nd))
    guard = n.cast("long") > 0
    lo = F.when(guard, (center - zl * rad) / denom)
    hi = F.when(guard, (center + zl * rad) / denom)
    return lo, hi


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    *,
    n_bins: int = 16,
) -> DataFrame:
    """Isotonic (monotone) calibration of a scorer against a binary
    outcome — the PAV step of turning a margin into a probability
    (Zadrozny & Elkan 2002): equal-frequency-bin the scores, then fit
    the best non-decreasing rate sequence to the per-bin positive
    rates by pool-adjacent-violators.

    Returns one row per bin: (bin, n, pos, lo_score, hi_score, rate,
    iso_rate).

    Exactness & the two-algorithm oracle: binning is the
    deterministic (score, id) total-order rank (features.quantile_bin
    — NO single-partition window); per-bin (pos, n) are exact
    integers; PAVA pools with EXACT cross-multiplied comparisons
    (pos_a·n_b vs pos_b·n_a — no float enters a pooling decision) and
    each emitted value is ONE correctly-rounded division of exact
    integers.  The oracle computes the SAME fit by the minimax
    characterization iso[i] = max_{k<=i} min_{j>=i} mean(pos, n over
    bins k..j) — an INDEPENDENT O(bins³) algorithm (brute-forceable
    because bins are bounded), equal to PAVA as rationals, and equal
    as doubles because correctly-rounded division of the same
    rational yields the same double regardless of which (k, j)
    produced it.

    Scale: one range exchange for the binning, one hash agg to bins;
    driver state = `n_bins` rows (the selection-operator bound).
    PAVA itself is a fold over those bounded rows.

    Contract: `score_col` must be INTEGER-typed (exact margins — the
    linear_quality_margin / lang_id_scored shape) and `label_col`
    0/1; NULL score or label rows are excluded.
    """
    from .features import quantile_bin

    if not 2 <= n_bins <= 4096:
        raise ValueError("n_bins must be in [2, 4096]")
    scored = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    binned = quantile_bin(scored, score_col, id_col, n_bins=n_bins)
    per = (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(label_col).cast("long")).cast("long").alias("pos"),
            F.min(score_col).alias("lo_score"),
            F.max(score_col).alias("hi_score"),
        )
        .orderBy("bin")
    )
    rows = per.collect()  # bounded: n_bins rows
    # PAVA over (pos, n) integer pools; comparisons cross-multiplied so
    # pooling decisions never touch floats
    blocks: list[list[int]] = []  # [pos, n, span]
    for r in rows:
        blocks.append([int(r["pos"]), int(r["n"]), 1])
        while (
            len(blocks) >= 2
            and blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]
        ):
            p, c, s = blocks.pop()
            blocks[-1][0] += p
            blocks[-1][1] += c
            blocks[-1][2] += s
    iso: list[float] = []
    for p, c, s in blocks:
        iso.extend([p / c] * s)
    spark = df.sparkSession
    out = [
        (
            int(r["bin"]),
            int(r["n"]),
            int(r["pos"]),
            r["lo_score"],
            r["hi_score"],
            int(r["pos"]) / int(r["n"]),
            iso[i],
        )
        for i, r in enumerate(rows)
    ]
    return spark.createDataFrame(
        out,
        "bin INT, n BIGINT, pos BIGINT, lo_score BIGINT, hi_score BIGINT,"
        " rate DOUBLE, iso_rate DOUBLE",
    )


def cuped_adjusted_means(
    per_user: DataFrame,
    arm_col: str = "arm",
    pre_col: str = "x",
    post_col: str = "y",
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013) —
    the industry-standard A/B adjustment: regress the post-period
    metric on its pre-period covariate POOLED across arms,
    θ = cov(X,Y)/var(X), and report per-arm means of
    Y_adj = Y − θ·(X − X̄).  Randomization makes E[X|arm] equal, so
    the adjustment is unbiased while removing the X-explained
    variance (typically 30–50% tighter CIs from the same traffic).

    Input: one row per subject with exact-DECIMAL pre/post metric
    columns and an arm label.  Output: one row per arm,
    (arm, n_users, mean_post, mean_adjusted, theta).

    Exactness: the closed_form_corr_ols recipe — per-arm decimal
    moments (n, Σx, Σy, Σxy, Σxx) are exact and mergeable; pooled
    totals come from a window over the ARM-COUNT-bounded aggregate
    (the plan lint's whitelisted bounded-child class); the finalizer
    is one fixed chain of correctly-rounded double steps both engines
    replay identically.
    """
    from pyspark.sql import Window

    x, y = F.col(pre_col), F.col(post_col)
    per_arm = per_user.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    w = Window.partitionBy()
    tn = F.sum("n_users").over(w).cast("double")
    tsx = F.sum("sx").over(w).cast("double")
    tsy = F.sum("sy").over(w).cast("double")
    tsxy = F.sum("sxy").over(w).cast("double")
    tsxx = F.sum("sxx").over(w).cast("double")
    # var(X) = 0 (constant covariate) leaves nothing to adjust: pin
    # theta to 0.0 (adjusted mean == raw mean) instead of NaN — the
    # kappa degenerate discipline, mirrored in the oracle
    theta = F.when(
        tn * tsxx - tsx * tsx > 0,
        (tn * tsxy - tsx * tsy) / (tn * tsxx - tsx * tsx),
    ).otherwise(F.lit(0.0))
    mean_x_all = tsx / tn
    nd = F.col("n_users").cast("double")
    mean_y = F.col("sy").cast("double") / nd
    mean_x = F.col("sx").cast("double") / nd
    return per_arm.select(
        "arm",
        "n_users",
        mean_y.alias("mean_post"),
        (mean_y - theta * (mean_x - mean_x_all)).alias("mean_adjusted"),
        theta.alias("theta"),
    ).orderBy("arm")
