"""Incremental aggregate maintenance: merge partial aggregation states
instead of recomputing history.

The reference's loads are truncate-and-reload (etl_orders.py:96-137):
every run recomputes every aggregate from scratch.  At 100 TB that is
the difference between re-reading six years of history and reading one
day of delta.  The standard fix is to keep aggregates as MERGEABLE
STATES — (decimal_sum, count) pairs, min/max, HLL sketches — so that

    state(history ∪ delta) = merge(state(history), state(delta))

holds exactly, and only the delta partition is ever re-scanned.  This
module implements the batch pattern: partialize each input slice, union
the tiny state tables, merge with a second group-by, then finalize
(derive AVG from sum/count, round money once at the end).

Exactness notes that make the merge safe:
- sums accumulate as DECIMAL(38,6) (associative, no float drift) and
  are rounded only in finalize — merging pre-rounded doubles would NOT
  equal the direct computation;
- COUNT and MIN/MAX are trivially mergeable;
- AVG is NOT mergeable directly and is derived from (sum, count) at
  finalize, matching functions.money.decimal_avg bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_states(
    df: DataFrame, keys: Sequence[str], value: str
) -> DataFrame:
    """Mergeable per-key state for SUM/AVG/MIN/MAX/COUNT over `value`."""
    v = F.col(value).cast("decimal(38,6)")
    return df.groupBy(*keys).agg(
        F.sum(v).alias("__sum"),
        F.count(v).alias("__cnt"),
        F.min(v).alias("__min"),
        F.max(v).alias("__max"),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Merge any number of partial-state tables (same grouping keys)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if not c.startswith("__")]
    return merged.groupBy(*keys).agg(
        F.sum("__sum").alias("__sum"),
        F.sum("__cnt").alias("__cnt"),
        F.min("__min").alias("__min"),
        F.max("__max").alias("__max"),
    )


def hist_states(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    *,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Mergeable fixed-bin histogram state for quantile maintenance:
    rows (keys…, __bin, __cnt).  Merging = summing counts per bin —
    the quantile analog of the (sum, count) states above.  Bin width
    should be exactly representable in binary (the callers pick
    lo/hi/nbins so it is) to keep the bin arithmetic engine-portable.
    Values outside [lo, hi) clamp into the edge bins, so the state is
    total regardless of outliers."""
    width = (hi - lo) / nbins
    v = F.col(value).cast("double")
    bin_ = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")),
    )
    return df.groupBy(*keys, bin_.alias("__bin")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )


def merge_hist_states(*states: DataFrame) -> DataFrame:
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if not c.startswith("__")]
    return merged.groupBy(*keys, "__bin").agg(F.sum("__cnt").alias("__cnt"))


def hist_quantiles(
    states: DataFrame,
    *,
    lo: float,
    hi: float,
    nbins: int,
    quantiles: Sequence[tuple[str, float]],
) -> DataFrame:
    """Quantiles from a histogram state: the smallest bin whose
    cumulative count reaches ceil(q·n), reported as the bin midpoint.
    Error ≤ half a bin width; the CHECK is exact — both engines run
    the identical integer/IEEE arithmetic, so the oracle reproduces
    every midpoint bit-for-bit.  The cumulative window's input is
    ≤ nbins rows per key (the state, not the data)."""
    from pyspark.sql import Window

    width = (hi - lo) / nbins
    keys = [c for c in states.columns if not c.startswith("__")]
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    cum = states.withColumn("__cum", F.sum("__cnt").over(w_cum)).withColumn(
        "__n", F.sum("__cnt").over(w_all)
    )
    mid = lambda b: (F.lit(lo) + (b + F.lit(0.5)) * F.lit(width))  # noqa: E731
    aggs = [
        mid(
            F.min(
                F.when(
                    F.col("__cum") >= F.ceil(F.lit(q) * F.col("__n")), F.col("__bin")
                )
            )
        ).alias(name)
        for name, q in quantiles
    ]
    return cum.groupBy(*keys).agg(*aggs)


def finalize(states: DataFrame, *, prefix: str) -> DataFrame:
    """Collapse states to presentation columns, rounding exactly once
    (mirrors functions.money.decimal_sum / decimal_avg)."""
    keys = [c for c in states.columns if not c.startswith("__")]
    total = F.round(F.col("__sum"), 2).cast("double")
    avg = F.round(
        F.col("__sum").cast("double") / F.col("__cnt"), 6
    ).cast("double")
    return states.select(
        *keys,
        total.alias(f"{prefix}_total"),
        F.col("__cnt").alias(f"{prefix}_count"),
        avg.alias(f"{prefix}_avg"),
        F.col("__min").cast("double").alias(f"{prefix}_min"),
        F.col("__max").cast("double").alias(f"{prefix}_max"),
    )


def join_view_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: Sequence[str] | str,
) -> DataFrame:
    """Incremental JOIN-view maintenance — the insert-delta rows of
    V = A ⋈ B without recomputing the view:

        ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    (the classic IVM decomposition; exact for insert deltas because
    the three terms partition (A_old∪ΔA)⋈(B_old∪ΔB) \\ A_old⋈B_old).
    At 100 TB the payoff is the join SHAPE: every term has a
    delta-sized side, so Catalyst broadcasts the delta and the
    full-history relations are scanned but never shuffled — versus a
    full recompute that re-shuffles both complete inputs.

    Verified: tests/test_ivm.py (ΔV ∪ V_old ≡ V_new row-for-row on
    planted data with duplicate join keys) and the oracle-checked
    `incremental_join_revenue` entry, whose oracle computes the delta
    INDEPENDENTLY as (new ⋈ new) EXCEPT ALL (old ⋈ old).
    """
    on = [on] if isinstance(on, str) else list(on)
    return (
        a_delta.join(b_old, on)
        .unionByName(a_old.join(b_delta, on))
        .unionByName(a_delta.join(b_delta, on))
    )


def join_view_bidelta(
    a_old: DataFrame,
    a_ins: DataFrame,
    a_del: DataFrame,
    b_old: DataFrame,
    b_ins: DataFrame,
    b_del: DataFrame,
    on: Sequence[str] | str,
    *,
    b_pk: Sequence[str],
    sign_col: str = "__sign",
) -> DataFrame:
    """Incremental JOIN-view maintenance WITH DELETES — the signed
    (counting) form that completes `join_view_delta`'s insert-only
    algebra:

        A' − A = Δa⁺ − Δa⁻   (signed multisets, Δa⁻ ⊆ A)
        V' − V = (A' − A) ⋈ B'  +  A ⋈ (B' − B)
               = Δa⁺⋈B' − Δa⁻⋈B' + A⋈Δb⁺ − A⋈Δb⁻

    Emits the union of the four terms with `sign_col` = ±1; any
    downstream aggregate maintains itself as SUM(sign·measure) /
    SUM(sign) — the standard multiset-algebra IVM (Blakeley et al.
    1986; the retraction stream shape of every modern IVM engine).

    Preconditions: Δa⁻ ⊆ A and Δb⁻ ⊆ B, identified by `b_pk` — the
    PRIMARY KEY of B (CDC deletes arrive keyed; applying a delete to
    B_old is then a BROADCAST LEFT ANTI on the delta-sized key set,
    so B' = (B ▷ Δb⁻.keys) ∪ Δb⁺ never shuffles the full relation —
    an exceptAll would).

    100 TB shape, same argument as the insert-only form: every term
    has a delta-sized side for Catalyst to broadcast; the two full
    relations (A old, B new) are scanned but never shuffled.  Exact
    for duplicate JOIN keys (multiset algebra, no DISTINCT anywhere);
    rows must be unique per `b_pk`, which is what "primary key"
    means.

    Verified: tests/test_ivm.py bidelta cases (maintained view ≡
    direct recompute on planted data with duplicate join keys,
    inserts and deletes on both sides) and the
    `incremental_join_revenue_bidelta` registry entry, whose oracle
    recomputes BOTH view versions directly and diffs their
    aggregates — an independent derivation of the same signed result.
    """
    on = [on] if isinstance(on, str) else list(on)
    b_new = b_old.join(
        F.broadcast(b_del.select(*b_pk)), list(b_pk), "left_anti"
    ).unionByName(b_ins)
    plus = F.lit(1).alias(sign_col)
    minus = F.lit(-1).alias(sign_col)
    return (
        a_ins.join(b_new, on).select("*", plus)
        .unionByName(a_del.join(b_new, on).select("*", minus))
        .unionByName(a_old.join(b_ins, on).select("*", plus))
        .unionByName(a_old.join(b_del, on).select("*", minus))
    )
