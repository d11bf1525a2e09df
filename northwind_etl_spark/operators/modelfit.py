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
