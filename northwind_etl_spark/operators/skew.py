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
    """Exact COUNT(DISTINCT distinct_col) per group via salted two-phase
    aggregation — the canonical hot-key fix for distinct aggregation.

    A plain ``groupBy(k).agg(countDistinct(v))`` builds one per-key
    distinct set on one reduce task; a key holding 10% of a 100 TB
    table's values makes that task the job.  Salting by the *value*
    space fixes it exactly: ``salt = pmod(xxhash64(v), R)`` partitions
    the distinct values of v into R disjoint classes, so

        COUNT(DISTINCT v) == SUM over salt of COUNT(DISTINCT v within salt)

    with no approximation.  Phase 1 groups by (k, salt) — the hot key's
    set is now built by R tasks — phase 2 sums the R partial counts
    (one row per (k, salt), trivially small).

    Unlike salting a SUM/COUNT (which Spark's map-side partial
    aggregation already de-skews), distinct aggregation genuinely needs
    this: the reduce side must see every raw value, and salting is what
    spreads them.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.count_distinct(distinct_col).alias("__partial")
    )
    return partial.groupBy(*group_cols).agg(F.sum("__partial").alias(alias))


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
