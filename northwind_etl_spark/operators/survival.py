"""Kaplan–Meier survival estimation — time-to-event analytics for
product funnels (time-to-conversion), SLOs (time-to-resolution), and
pipeline latencies, with RIGHT CENSORING done correctly (dropping
not-yet-converted users biases every naive latency average; KM is the
standard fix, Kaplan & Meier 1958).

Cross-engine exactness: the risk sets n(t) and event counts d(t) are
exact integers from two bounded window passes; the survival curve is
released in LOG space through the frozen 1024-cell ln LUT
(functions/lnlut.py — the dp/DSIR/PMI discipline): each factor
ln(1 − d/n) = ln((n−d)/n) resolves to grid cell (n−d)·1024 DIV n and
the curve is an EXACT DECIMAL cumulative sum of those frozen
literals, cast to DOUBLE once per row.  Zero runtime transcendentals
in the hash path on either engine; exp() never runs (consumers who
want S(t) exponentiate downstream — outside the hash contract).

Scale shape: one groupBy collapses raw durations to ≤ horizon+1
distinct event times, so both windows (the reverse-cumulative risk
set and the forward log-survival sum) run over a BOUNDED aggregate
child regardless of subject count — the hypertable contract.  At
100 TB the only full-data pass is the per-subject duration agg the
caller supplies.

Reference parity: the reference has no survival surface; this extends
its audit-query family (`Project Plan6.md:154-163`) with the
censoring-aware statistic those row counts can't express.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def km_log_survival(
    durations: DataFrame,
    duration_col: str = "duration",
    observed_col: str = "observed",
    *,
    horizon: int | None = None,
) -> DataFrame:
    """Kaplan–Meier estimate over (duration, observed) subject rows.

    `duration` is a non-negative integer (any unit); `observed` is
    1 for an event, 0 for a right-censored subject.  If `horizon` is
    given, durations beyond it are administratively censored AT the
    horizon (type-I censoring) — the common "evaluate conversion
    within H" readout.

    Returns one row per distinct EVENT time t, ordered:
      (t, n_risk, d_events, n_censored_at_t, log_survival)
    where log_survival = Σ_{t'≤t} ln((n(t')−d(t'))/n(t')) on the
    frozen ln grid — exact DECIMAL partial sums, one DOUBLE cast.
    """
    from ..functions.lnlut import LAPLACE_LN_LUT, laplace_ln_lut_col

    d = F.col(duration_col).cast("long")
    obs = F.col(observed_col).cast("int")
    if horizon is not None:
        h = F.lit(int(horizon)).cast("long")
        subj = durations.select(
            F.least(d, h).alias("t"),
            F.when(d <= h, obs).otherwise(F.lit(0)).alias("obs"),
        )
    else:
        subj = durations.select(d.alias("t"), obs.alias("obs"))
    # negative durations are a data defect, not a censoring state:
    # raise in-plan (mirrored in oracles) rather than silently folding
    # them into the t=0 risk set
    subj = subj.select(
        F.when(F.col("t") >= 0, F.col("t")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("km_log_survival: negative duration "),
                    F.col("t").cast("string"),
                )
            )
        ).alias("t"),
        "obs",
    )
    per_t = subj.groupBy("t").agg(
        F.sum("obs").cast("long").alias("d_events"),
        F.sum(F.lit(1) - F.col("obs")).cast("long").alias("n_censored_at_t"),
    )
    # reverse-cumulative risk set over the bounded distinct-time frame
    w_desc = (
        Window.orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = per_t.withColumn(
        "n_risk",
        F.sum(F.col("d_events") + F.col("n_censored_at_t")).over(w_desc),
    )
    lut = laplace_ln_lut_col()
    # d < n except possibly at the last event time, where (n−d) = 0
    # has log-survival −∞: grid cell 0 (the LUT's leftmost midpoint)
    # stands in as the saturated floor, identically on both engines.
    term = F.element_at(
        lut,
        F.expr("((n_risk - d_events) * 1024) DIV n_risk").cast("int")
        + F.lit(1),
    )
    events = at_risk.where(F.col("d_events") > 0).withColumn("__lnq", term)
    w_asc = (
        Window.orderBy(F.asc("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn(
            "log_survival", F.sum("__lnq").over(w_asc).cast("double")
        )
        .select("t", "n_risk", "d_events", "n_censored_at_t", "log_survival")
        .orderBy("t")
    )
