"""KMV (k-minimum-values / bottom-k) distinct-count sketch.

Complements the HLL rollup (plans/queries.py::hll_sketch_rollup_users):
HLL is smaller but its registers are engine-private, so it can only be
rows-only checked.  KMV's state — the k smallest md5 hashes of the
distinct values — is ENGINE-PORTABLE: md5 is bit-standard, hex strings
order identically everywhere, and the estimator is a two-operand IEEE
division.  That makes this the rare approximate sketch whose state AND
estimate an independent engine reproduces bit-for-bit (the DuckDB
oracle rebuilds both).

Estimator (Bar-Yossef et al. 2002): map each hash to u ∈ [0,1); with
U_k the k-th smallest, E[distinct] ≈ (k-1)/U_k.  If fewer than k
distinct values exist the sketch holds them all and the count is exact.
Relative error ~ 1/√(k-2).

Mergeability is structural: bottomk(A ∪ B) == bottomk(bottomk(A) ∪
bottomk(B)) — the union of two states re-sketched IS the state of the
union, exactly (pinned in tests).  That gives the same pre-aggregated
rollup pattern as the HLL path: per-day states, union, re-sketch.

Scale shape: the bottom-k per group is computed in two phases — first
within (group, hash-salt) classes, then over the ≤ R·k survivors per
group — so a hot group's distinct set is ranked by R tasks, never one
(same value-space salting argument as skew.salted_distinct_count).

Cross-engine exactness of the estimate: u is built from the first 13
hex nibbles (52 bits < 2^53), so the integer, its double rendering,
and the division are all exact/identical IEEE operations in any
engine; 15 nibbles would silently round differently per engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NIBBLES = 13
_DENOM = float(16**_NIBBLES)


def kmv_state(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    k: int = 16,
    salt_buckets: int = 8,
) -> DataFrame:
    """Bottom-k hash state per group: rows (group…, __h, __rank) with
    __rank ∈ 1..k over the k smallest md5 hashes of distinct values."""
    gcols = list(group_cols)
    hashed = (
        df.select(*gcols, F.col(value_col).cast("string").alias("__v"))
        .where(F.col("__v").isNotNull())
        .distinct()
        .select(*gcols, F.md5(F.col("__v")).alias("__h"))
    )
    salted = hashed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("__h")), F.lit(salt_buckets))
    )
    w1 = Window.partitionBy(*gcols, "__salt").orderBy("__h")
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .drop("__r1", "__salt")
    )
    w2 = Window.partitionBy(*gcols).orderBy("__h")
    return (
        survivors.withColumn("__rank", F.row_number().over(w2))
        .where(F.col("__rank") <= k)
    )


def merge_states(*states: DataFrame, k: int = 16) -> DataFrame:
    """Re-sketch the union of bottom-k states — exactly the state of
    the union of the underlying sets (bottom-k is a lattice join)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    gcols = [c for c in merged.columns if not c.startswith("__")]
    # states may repeat a hash (same value seen in two slices): re-dedup
    deduped = merged.select(*gcols, "__h").distinct()
    w = Window.partitionBy(*gcols).orderBy("__h")
    return (
        deduped.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= k)
    )


def kmv_intersect(
    state_a: DataFrame, state_b: DataFrame, *, k: int = 16
) -> DataFrame:
    """Set-overlap estimates from two bottom-k states (Beyer et al.
    2007): within the union's bottom-k, the fraction ρ of hashes
    present in BOTH input sets estimates Jaccard, and ρ·|A∪B|̂
    estimates the intersection.

    Membership in the bottom-k STATES suffices: the union's k-th
    smallest hash is ≤ either input's k-th smallest, so any union-
    sketch member that belongs to A at all is inside A's bottom-k
    (same for B) — no false negatives, and the estimator arithmetic
    (two divisions, one multiply, IEEE doubles) is engine-portable
    like kmv_estimate's.

    One row: (n_matched, est_union, est_intersection, est_jaccard).
    All inputs are ≤ k-row states — every join here is trivially
    broadcast-sized regardless of the underlying data volume.
    """
    union = merge_states(state_a, state_b, k=k)
    in_a = state_a.select("__h").distinct().withColumn("__ina", F.lit(1))
    in_b = state_b.select("__h").distinct().withColumn("__inb", F.lit(1))
    flagged = (
        union.join(F.broadcast(in_a), "__h", "left")
        .join(F.broadcast(in_b), "__h", "left")
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("__kprime"),
        F.sum(
            F.when(
                F.col("__ina").isNotNull() & F.col("__inb").isNotNull(), 1
            ).otherwise(0)
        ).alias("n_matched"),
        F.max(F.when(F.col("__rank") == k, F.col("__h"))).alias("__kth"),
    )
    u_k = (
        F.conv(F.substring("__kth", 1, _NIBBLES), 16, 10).cast("long").cast("double")
        / F.lit(_DENOM)
    )
    raw_union = F.when(
        F.col("__kprime") < k, F.col("__kprime").cast("double")
    ).otherwise(F.lit(float(k - 1)) / u_k)
    rho = F.col("n_matched") / F.col("__kprime")
    return agg.select(
        F.col("n_matched"),
        F.round(raw_union, 4).alias("est_union"),
        F.round(rho * raw_union, 4).alias("est_intersection"),
        F.round(rho, 4).alias("est_jaccard"),
    )


def kmv_estimate(state: DataFrame, *, k: int = 16) -> DataFrame:
    """Collapse a bottom-k state to (group…, est_distinct, kth_hash).

    Fewer than k sampled hashes ⇒ the sketch saw every distinct value
    and the count is exact (kth_hash NULL); otherwise (k-1)/U_k with
    U_k from the first 13 nibbles of the k-th hash (exact in double).
    """
    gcols = [c for c in state.columns if not c.startswith("__")]
    agg = state.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(F.when(F.col("__rank") == k, F.col("__h"))).alias("kth_hash"),
    )
    u_k = (
        F.conv(F.substring("kth_hash", 1, _NIBBLES), 16, 10).cast("long").cast("double")
        / F.lit(_DENOM)
    )
    est = F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) / u_k, 4)
    )
    return agg.select(*gcols, est.alias("est_distinct"), "kth_hash")
