"""Skew-tolerant join via key salting.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime; salting is the explicit fallback for pathological keys
(one customer with 10% of all events, a null-heavy FK).  Mechanics:
replicate the small side R times, scatter the big side's hot keys across
R salt values, join on (key, salt) — the hot key's rows now land on R
tasks instead of one.

Result-identical to the plain join (asserted in tests); only the
physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame,
    *,
    group_cols: list[str],
    distinct_col: str,
    alias: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT distinct_col) per group via explicit salted
    two-phase aggregation.

    Salting by the *value* space is exact: ``salt = pmod(xxhash64(v),
    R)`` partitions the distinct values of v into R disjoint classes,
    so

        COUNT(DISTINCT v) == SUM over salt of COUNT(DISTINCT v within salt)

    with no approximation.  Phase 1 groups by (k, salt) — a hot key's
    distinct set is built by R tasks — phase 2 sums the R tiny partial
    counts.

    Honesty note (verified against the executed plan): for the plain
    built-in ``countDistinct``, Catalyst's distinct-aggregate rewrite
    ALREADY produces an equivalent shape — the dedup stage shuffles on
    (k, v), spreading a hot key's values, before a per-key partial
    count.  This function therefore exists as (a) the explicit,
    plan-visible form of that contract, equality-pinned against the
    built-in, and (b) the pattern to reach for where the rewrite does
    NOT apply — set-building aggregates like ``collect_set``/
    ``collect_list`` (single task per key, no rewrite) and custom
    distinct-like UDAF state, which salt-split the same way.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.count_distinct(distinct_col).alias("__partial")
    )
    return partial.groupBy(*group_cols).agg(F.sum("__partial").alias(alias))


def salted_collect_set(
    df: DataFrame,
    *,
    group_cols: list[str],
    value_col: str,
    alias: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """``collect_set(v)`` per group with the set built by R tasks.

    This is the case the salt pattern genuinely exists for: Catalyst
    has NO rewrite for set-building aggregates — a plain
    ``groupBy(k).agg(collect_set(v))`` materializes each key's whole
    set in one task.  Salting by value partitions the set into R
    disjoint sub-sets built independently; the merge flattens R small
    arrays per key.  The result is the same set, returned sorted so
    it is deterministic (collect_set's native order is not).
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.collect_set(value_col).alias("__part")
    )
    return partial.groupBy(*group_cols).agg(
        F.array_sort(F.flatten(F.collect_list("__part"))).alias(alias)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    *,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `key` with the big side salted across
    `salt_buckets` partitions per key and the small side replicated.

    Use when one/few keys dominate; cost = small side × salt_buckets
    (keep the small side genuinely small or the buckets modest).

    Only inner and left joins are result-identical under salting: an
    unmatched small-side row exists once per replica, so right/full
    outer joins would emit it salt_buckets times.  Those shapes are
    rejected rather than silently wrong.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "replicating the small side would duplicate unmatched rows "
            "under right/full outer semantics"
        )
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    replicated_small = small.select("*", salts)
    joined = salted_big.join(replicated_small, on=[key, "__salt"], how=how)
    return joined.drop("__salt")

# ---------------------------------------------------- skew PROFILING
# (r08) The diagnostic side of this module: BEFORE shuffling 100 TB on
# a key, measure how hot the key actually is.  key_skew_profile
# reduces a keyed relation to one row of shuffle-planning facts —
# n_keys / n_rows / max_count / max_share (is there a single killer
# key?), top10_share (would the classic hot-key split fix it?), and
# the Gini coefficient of the per-key count distribution.  Exactness:
# counts are exact integers; Gini uses the exact rank identity
#   G = (2·Σᵢ i·xᵢ − (n+1)·Σᵢ xᵢ) / (n·Σᵢ xᵢ)
# over counts sorted ascending by (count, key) — a total order, and
# tied counts are interchangeable in the sum — with Σ i·xᵢ an exact
# DECIMAL and ONE correctly-rounded double division per reported
# ratio.  The ranking is the distributed global ranking
# (operators/ranking.py), so no single task sorts the key table;
# everything after the counts aggregation is bounded by |keys|.


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """One row: (n_keys, n_rows, max_count, max_share, top10_share,
    gini) for the distribution of rows over `key_col` (NULL keys
    count as a key of their own — they hash to one partition like any
    other value, which is exactly why a profiler must see them)."""
    from ..cache import persist_stage
    from .ranking import global_row_number

    counts = persist_stage(
        df.groupBy(F.col(key_col).alias("__k")).agg(
            F.count(F.lit(1)).alias("__c")
        )
    )
    ranked = global_row_number(
        counts, [F.col("__c"), F.col("__k")], rank_col="__i"
    )
    dec = "decimal(38,0)"
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("__c").cast("long").alias("n_rows"),
        F.max("__c").cast("long").alias("max_count"),
        F.sum((F.col("__i").cast(dec) * F.col("__c").cast(dec))).alias(
            "__ix"
        ),
    )
    # top-10 hottest = global ranks n_keys-9 .. n_keys (ascending sort)
    top10 = (
        ranked.join(F.broadcast(agg.select("n_keys")))
        .where(F.col("__i") > F.col("n_keys") - 10)
        .agg(F.sum("__c").cast("long").alias("__top10"))
    )
    out = agg.join(F.broadcast(top10))
    n = F.col("n_keys").cast(dec)
    tot = F.col("n_rows").cast(dec)
    gini_num = (
        F.lit(2).cast(dec) * F.col("__ix")
        - (n + F.lit(1).cast(dec)) * tot
    ).cast("double")
    gini_den = (n.cast("double")) * (tot.cast("double"))
    return out.select(
        "n_keys",
        "n_rows",
        "max_count",
        (F.col("max_count").cast("double") / F.col("n_rows").cast("double"))
        .alias("max_share"),
        (F.col("__top10").cast("double") / F.col("n_rows").cast("double"))
        .alias("top10_share"),
        (gini_num / gini_den).alias("gini"),
    )
