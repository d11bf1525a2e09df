"""Schema profiling at corpus scale: functional-dependency auditing
and histogram-based join-cardinality estimation — the statistics a
cost-based optimizer (or a data engineer about to shuffle 100 TB)
derives FROM the data before trusting the schema.

- `fd_audit` (the Metanome/TANE single-check primitive, Huhtala et
  al. 1999 reduced to the verification step): a candidate dependency
  lhs → rhs HOLDS iff every lhs group takes exactly one rhs value,
  i.e. count(distinct lhs) == count(distinct (lhs, rhs)) with NULL
  treated as a VALUE — via concatenated per-component md5 digests
  (injective up to hash collision; a raw separator/sentinel scheme
  collided when values contained the separator bytes — ADVICE r08),
  because bare SQL COUNT(DISTINCT a, b) drops any-NULL rows in Spark
  but keeps them inside DuckDB's row-struct form; the digest key makes
  both engines count the same thing.  One
  fused aggregation per candidate — the
  violation count (n_pairs − n_lhs) quantifies HOW broken a failed
  dependency is, which matters more than the boolean at cleaning
  time.

- `join_size_estimate` (the System-R / Selinger 1979 formula applied
  per equi-depth-ish bucket): split both join keys into B md5 hash
  buckets (hash buckets align across relations by construction — the
  property range buckets need co-sorting for), estimate each bucket's
  join output as n1·n2 DIV max(d1, d2) (the containment-of-value-sets
  assumption), sum — then JOIN THE RELATIONS and report the actual
  count next to the estimate.  Exact integer arithmetic end to end;
  the est/actual ratio is the calibration signal an AQE-less planner
  would act on.

Both are one-or-two hash aggregations, |buckets|- or
|candidates|-bounded after the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fd_audit(
    df: DataFrame, candidates: list[tuple[str, str]]
) -> DataFrame:
    """One row per candidate (lhs_col, rhs_col): (lhs, rhs, n_lhs,
    n_pairs, violations, holds).  Candidates audit in one pass each
    (two distinct counts fused into a single aggregation)."""
    if not candidates:
        raise ValueError("candidates must name at least one (lhs, rhs) pair")

    def _key(*cols: str) -> F.Column:
        # Per-component md5 digests, THEN concat (ADVICE r08): a raw
        # separator/sentinel scheme collides when values themselves
        # contain the separator or sentinel bytes ('a\x1fb' + NULL vs
        # 'a' + 'b\x1f\x00'), understating violations.  Fixed-width
        # digests make the concatenation injective (up to md5
        # collision); the 'v'/'n' prefix keeps NULL distinct from the
        # literal string 'n'.
        return F.concat(
            *[
                F.md5(
                    F.coalesce(
                        F.concat(F.lit("v"), F.col(c).cast("string")),
                        F.lit("n"),
                    )
                )
                for c in cols
            ]
        )

    outs = []
    for lhs, rhs in candidates:
        agg = df.agg(
            F.count_distinct(_key(lhs)).alias("n_lhs"),
            F.count_distinct(_key(lhs, rhs)).alias("n_pairs"),
        )
        outs.append(
            agg.select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.col("n_lhs").cast("long").alias("n_lhs"),
                F.col("n_pairs").cast("long").alias("n_pairs"),
                (F.col("n_pairs") - F.col("n_lhs"))
                .cast("long")
                .alias("violations"),
                (F.col("n_pairs") == F.col("n_lhs")).alias("holds"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def _bucket(col: F.Column, buckets: int) -> F.Column:
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    ).cast("int")


def join_size_estimate(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    *,
    buckets: int = 64,
) -> DataFrame:
    """One row: (buckets, est_rows, actual_rows, n_left, n_right).
    est_rows = Σ_b n1_b·n2_b DIV max(d1_b, d2_b, 1) over md5 hash
    buckets — the per-bucket Selinger containment estimate; actual
    from the real join's count aggregate.  NULL keys join nothing and
    are excluded from both sides (equi-join semantics)."""
    lk, rk = F.col(left_key), F.col(right_key)
    lstats = (
        left.where(lk.isNotNull())
        .groupBy(_bucket(lk, buckets).alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.count_distinct(lk).alias("d1"),
        )
    )
    rstats = (
        right.where(rk.isNotNull())
        .groupBy(_bucket(rk, buckets).alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n2"),
            F.count_distinct(rk).alias("d2"),
        )
    )
    per_bucket = lstats.join(rstats, "b")
    est = per_bucket.agg(
        F.sum(
            F.expr("(n1 * n2) DIV greatest(d1, d2, 1L)")
        ).cast("long").alias("est_rows"),
    )
    # rename before joining: identically-named key columns (k vs k)
    # would make the join condition ambiguous
    lkeys = left.where(lk.isNotNull()).select(lk.alias("__lk"))
    rkeys = right.where(rk.isNotNull()).select(rk.alias("__rk"))
    actual = lkeys.join(
        rkeys, F.col("__lk") == F.col("__rk")
    ).agg(F.count(F.lit(1)).cast("long").alias("actual_rows"))
    sizes = left.agg(
        F.count(F.lit(1)).cast("long").alias("n_left")
    ).join(
        F.broadcast(
            right.agg(F.count(F.lit(1)).cast("long").alias("n_right"))
        )
    )
    return (
        est.join(F.broadcast(actual))
        .join(F.broadcast(sizes))
        .select(
            F.lit(buckets).cast("int").alias("buckets"),
            "est_rows",
            "actual_rows",
            "n_left",
            "n_right",
        )
    )


def gini_by_weight(df: DataFrame, class_col: str, weight_col: str) -> DataFrame:
    """Gini concentration of an integer weight across classes — the
    inequality audit a data plan runs on its source/host token shares
    (a corpus where three hosts hold 90% of tokens is a diversity
    problem no mean can see).  Exact integer arithmetic end to end:
    classes sort by (weight, class), i = 1-based rank, and

        G = (2·Σ i·wᵢ − (n+1)·Σw) / (n·Σw)

    — one correctly-rounded division at the end.  Ties are
    rank-order-free (equal weights contribute the same Σ i·w under any
    permutation of their ranks... of each other), so the value is
    deterministic.  The ranking window runs over the per-class
    AGGREGATE rows (|classes|, the operator's documented working set),
    never the data; an in-plan guard raises before Σ i·w could exceed
    int64 (n·wmax per term, n terms).

    Scale bound: |classes| is the working set AND the single ranking
    sort's input — sources/hosts (10³–10⁷) ride it comfortably, but a
    billion-class Gini (per-user at web scale) should bucket weights
    into a fixed histogram first and compute Gini from the histogram
    (the standard grouped-data formula, exact to bucket resolution) —
    the same pre-bucketing rule ks_by_group documents.

    Returns ONE row (n_classes, total_weight, gini)."""
    from pyspark.sql import Window

    per = df.groupBy(F.col(class_col).alias("clazz")).agg(
        F.sum(F.col(weight_col).cast("long")).alias("__w")
    )
    rk = Window.orderBy(F.asc("__w"), F.asc("clazz"))
    ranked = per.withColumn("__i", F.row_number().over(rk))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("__w").cast("long").alias("total_weight"),
        F.max("__w").alias("__wmax"),
        F.sum(F.col("__i") * F.col("__w")).cast("long").alias("__iw"),
    )
    # overflow guard on the dominant term: each i·w <= n·wmax and there
    # are n of them, so Σ i·w <= n²·wmax must fit int64 — raise in-plan
    # (mirrored in the oracle) and fold through the consumed Σ i·w
    iw_checked = F.when(
        F.col("n_classes") * F.col("n_classes")
        <= F.expr("9223372036854775807L DIV GREATEST(__wmax, 1L)"),
        F.col("__iw"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("gini_by_weight: n^2 * wmax exceeds int64 (n = "),
                F.col("n_classes").cast("string"),
                F.lit(") — pre-aggregate or rescale weights"),
            )
        )
    )
    n = F.col("n_classes").cast("double")
    tw = F.col("total_weight").cast("double")
    return agg.select(
        "n_classes",
        "total_weight",
        F.round(
            (
                F.lit(2.0) * iw_checked.cast("double")
                - (n + F.lit(1.0)) * tw
            )
            / (n * tw),
            6,
        ).alias("gini"),
    )


def hill_tail_index(df: DataFrame, col: str, *, k: int = 100) -> DataFrame:
    """Hill estimator of the Pareto tail index over the top-k order
    statistics:  α̂ = k / Σ_{i=1..k} ln(x_(i) / x_(k+1)) — the
    heavy-tail diagnostic behind skew planning (α ≤ 2 means the sum is
    variance-infinite: no sampling estimate of a total converges, and
    hot-key mitigations are mandatory, not optional).

    Exact plan shape: TakeOrderedAndProject keeps the global top-(k+1)
    (k+1 rows cross the final exchange, nothing else), they collect
    into ONE sorted array column, and the log-ratio sum is a
    SEQUENTIAL array fold — deterministic summation order, replayed by
    DuckDB's list fold (ulp-level libm differences are absorbed by the
    final round-to-6, the entropy/surprisal precedent).  Returns ONE
    row (k, threshold = x_(k+1), alpha)."""
    v = F.col(col).cast("double")
    top = (
        df.select(v.alias("__v"))
        .where(F.col("__v").isNotNull() & (F.col("__v") > 0))
        .orderBy(F.desc("__v"))
        .limit(k + 1)
    )
    arr = top.agg(
        F.reverse(F.sort_array(F.collect_list("__v"))).alias("__arr")
    )
    # F.get (0-based), NOT element_at: with fewer than k+1 qualifying
    # rows, element_at(k+1) RAISES under ANSI while DuckDB's a[k+1]
    # returns NULL — get() returns NULL too, so both engines emit a
    # NULL threshold/alpha row for an undersized input instead of
    # diverging
    ref = F.get(F.col("__arr"), k)
    lsum = F.aggregate(
        F.slice(F.col("__arr"), 1, k),
        F.lit(0.0),
        lambda acc, x: acc + F.log(x / ref),
    )
    return arr.select(
        F.lit(k).cast("int").alias("k"),
        F.round(ref, 6).alias("threshold"),
        F.round(F.lit(float(k)) / lsum, 6).alias("alpha"),
    )


def ks_by_group(
    df: DataFrame, value_col: str, group_col: str, *, flag_at: float = 0.1
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per group vs THE REST —
    the distribution-drift audit that catches shape changes PSI's
    fixed bins blur: KS = sup_v |F_g(v) − F_rest(v)|, evaluated at
    every distinct value (the sup of a difference of step functions is
    attained at a jump of either side, so the (distinct value × group)
    grid is exactly sufficient).

    Shape: one (value, group) count aggregate, a grid join against the
    distinct-value spine, and one cumulative window PER GROUP over
    |distinct values| rows — bounded by the grid, never the data (at
    100 TB pre-bucket values to a fixed histogram first; the fixture's
    value domain is its own bound).  Exact integer cumulative counts;
    two divisions and one abs per grid row.  Returns (group, n_group,
    ks, drifted) ordered by group."""
    from pyspark.sql import Window

    base = df.select(
        F.col(group_col).alias("grp"), F.col(value_col).alias("v")
    ).where(F.col("v").isNotNull())
    counts = base.groupBy("grp", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    spine = base.select("v").distinct()
    groups = counts.groupBy("grp").agg(F.sum("c").alias("n_g"))
    total = counts.agg(F.sum("c").alias("n_all"))
    grid = (
        spine.crossJoin(F.broadcast(groups))
        .join(counts, ["grp", "v"], "left")
        .select(
            "grp",
            "v",
            "n_g",
            F.coalesce("c", F.lit(0).cast("long")).alias("c"),
        )
    )
    wcum = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # global cumulative = per-group cumulative summed over the grid row
    # spine; rest = global − group
    wall = (
        Window.partitionBy("v")
    )
    cum = grid.withColumn("cum_g", F.sum("c").over(wcum))
    cum = cum.withColumn("cum_all", F.sum("cum_g").over(wall))
    ks = (
        cum.join(F.broadcast(total))
        .select(
            "grp",
            "n_g",
            F.abs(
                F.col("cum_g").cast("double") / F.col("n_g").cast("double")
                - (F.col("cum_all") - F.col("cum_g")).cast("double")
                / (F.col("n_all") - F.col("n_g")).cast("double")
            ).alias("__d"),
        )
        .groupBy("grp", "n_g")
        .agg(F.round(F.max("__d"), 6).alias("ks"))
    )
    return ks.select(
        F.col("grp").alias(group_col),
        F.col("n_g").cast("long").alias("n_group"),
        "ks",
        (F.col("ks") > flag_at).alias("drifted"),
    ).orderBy(group_col)
