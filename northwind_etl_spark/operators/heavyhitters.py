"""Exact distributed heavy hitters — the two-pass pigeonhole pattern.

Finding every value with global count >= T normally costs a full
groupBy over the corpus — at 100 TB that shuffle carries one row per
distinct value PER MAP TASK (the partial-agg output), which for a
heavy-tailed vocabulary is the dominant cost even though almost none
of the values can possibly reach T.

The pigeonhole pass cuts the candidate set first, exactly:

    If a value's global count across P partitions is >= T, then by
    pigeonhole its count in at least one partition is >= ceil(T / P).

so `local count >= ceil(T/P) in ANY partition` yields a guaranteed
SUPERSET of the true heavy hitters (never a miss — the classic
distributed Misra-Gries argument without the approximation).  Pass 1
groups by (value, partition-id): because the partition id is constant
within each map task, Catalyst's partial aggregation compacts this to
at most one row per value per task BEFORE the exchange, and only the
tiny filtered candidate set survives.  Pass 2 recounts candidates
exactly behind a broadcast semi-join, so the full-width shuffle only
ever carries rows whose value is already known to be near-threshold.

The threshold is scale-free: T = ceil(total_rows / denom), computed
in-plan (1-row aggregate broadcast-joined, the q11/q22 scalar
pattern) — no driver action, no collected scalar.

Verified (tests/test_heavyhitters.py): result equality with the plain
one-pass groupBy under 1/3/17-partition repartitions of the input,
superset property on a planted-skew fixture, and a plan assertion
that the candidate filter runs BEFORE the recount join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    *,
    denom: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact values with count >= ceil(n_rows / denom).

    Returns (value_col, cnt, threshold) — `threshold` is included so
    callers (and the oracle) can see the scale-free cutoff that was
    applied.  `weight_col` switches count to a weighted sum (counts
    stay exact integers).
    """
    from ..cache import persist_stage

    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    v = F.col(value_col)

    # Scalar totals as a 1-row broadcast: n rows and P partitions.
    # spark_partition_id() is evaluated on the same scan that feeds
    # the local counts, so the pigeonhole bound uses the real P.
    # persist_stage: three plan branches (totals, local counts,
    # recount) consume this stage and AQE does not dedup branches —
    # without the persist the upstream (often an explode over the
    # corpus) runs three times, and a re-scan could even change P
    # between the bound and the counts it bounds.
    base = persist_stage(
        df.select(
            v.alias(value_col),
            w.alias("__w"),
            F.spark_partition_id().alias("__pid"),
        )
    )
    totals = base.agg(
        F.sum("__w").alias("__total"),
        (F.max("__pid") + F.lit(1)).alias("__nparts"),
    )
    # T = ceil(total/denom); local cutoff = ceil(T/P).  Integer-exact:
    # ceil(a/b) = (a + b - 1) DIV b on non-negative longs (`/` would
    # be double division — inexact past 2^53 and wrong to truncate).
    totals = totals.select(
        F.expr(f"(__total + {denom} - 1) DIV {denom}").alias("__T"),
        "__nparts",
    ).select(
        "__T",
        F.expr("(__T + __nparts - 1) DIV __nparts").alias("__local_T"),
    )

    local = (
        base.groupBy(value_col, "__pid")
        .agg(F.sum("__w").alias("__local_cnt"))
        .join(F.broadcast(totals))
        .where(F.col("__local_cnt") >= F.col("__local_T"))
        .select(value_col)
        .distinct()
    )

    return (
        base.join(F.broadcast(local), value_col, "left_semi")
        .groupBy(value_col)
        .agg(F.sum("__w").alias("cnt"))
        .join(F.broadcast(totals.select("__T")))
        .where(F.col("cnt") >= F.col("__T"))
        .select(value_col, "cnt", F.col("__T").alias("threshold"))
    )


def plain_heavy_hitters(
    df: DataFrame, value_col: str, *, denom: int, weight_col: str | None = None
) -> DataFrame:
    """The single-pass trap form (full-vocabulary shuffle) — kept for
    the equality tests; result must be identical to heavy_hitters."""
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    base = df.select(F.col(value_col), w.alias("__w"))
    totals = base.agg(F.sum("__w").alias("__total")).select(
        F.expr(f"(__total + {denom} - 1) DIV {denom}").alias("__T")
    )
    return (
        base.groupBy(value_col)
        .agg(F.sum("__w").alias("cnt"))
        .join(F.broadcast(totals))
        .where(F.col("cnt") >= F.col("__T"))
        .select(value_col, "cnt", F.col("__T").alias("threshold"))
    )


def mergeable_topk_sketch(
    df: DataFrame,
    value_col: str,
    *,
    k: int,
    shards: int,
    shard_key: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Mergeable approximate top-k — the deterministic Misra–Gries /
    SpaceSaving summary build + merge (Misra & Gries 1982; the
    mergeability theorem is Agarwal et al., "Mergeable Summaries",
    PODS 2012): each shard compresses its counts to at most k
    counters by subtracting the (k+1)-th largest local count t_s and
    dropping non-positives; summaries merge by plain counter
    addition, and the merged undercount of ANY value is bounded by
    Σ_s t_s regardless of how many merge levels happened.

    Complements the exact two-pass `heavy_hitters`: that one answers
    "every value with count >= T, exactly"; this one answers "a k-row
    bounded-size summary you can store per file / micro-batch / day
    and fold incrementally WITHOUT re-scanning history" — the sketch
    a 100 TB ingest keeps next to each partition manifest.  The shard
    here is a logical split on md5(shard_key) so the build is
    deterministic and SQL-replayable; production builds the same
    summary per physical unit and only k-row summaries ever move.

    Returns the merged top-k by estimate: (value_col, est_count,
    err_bound) with est_count <= true count <= est_count + err_bound.
    Deterministic total order everywhere: counts tie-break on the
    value itself, so both engines release identical rows.
    """
    from pyspark.sql import Window

    from ..cache import persist_stage
    from .sampling import split_bucket_expr

    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    counts = (
        df.select(
            F.col(value_col),
            w.alias("__w"),
            split_bucket_expr(shard_key, buckets=shards).alias("__shard"),
        )
        .groupBy("__shard", value_col)
        .agg(F.sum("__w").alias("__c"))
    )
    rk = Window.partitionBy("__shard").orderBy(
        F.desc("__c"), F.asc(value_col)
    )
    # THREE consumers hang off the ranked stage (the t_s filter, the
    # compress join, and the shard spine for the error bound) — AQE
    # does not dedup plan branches, so without the persist the full
    # scan + count + window would run three times (the theil_sen
    # lesson from the r10 self-review).
    ranked = persist_stage(counts.withColumn("__r", F.row_number().over(rk)))
    # t_s = (k+1)-th largest count in the shard (0 when the shard has
    # <= k distinct values: nothing is dropped, the summary is exact)
    ts = ranked.where(F.col("__r") == k + 1).select(
        "__shard", F.col("__c").alias("__t")
    )
    compressed = (
        ranked.join(ts, "__shard", "left")
        .withColumn("__t", F.coalesce("__t", F.lit(0).cast("long")))
        .where(F.col("__c") > F.col("__t"))
        .select("__shard", value_col, (F.col("__c") - F.col("__t")).alias("__cnt"), "__t")
    )
    # merge = counter addition; the bound adds EVERY shard's t_s (a
    # value absent from a shard's summary may have had up to t_s mass
    # there), including shards that kept all values only if t_s > 0
    err = (
        ranked.select("__shard").distinct()
        .join(ts, "__shard", "left")
        .agg(F.coalesce(F.sum("__t"), F.lit(0).cast("long")).alias("err_bound"))
    )
    merged = compressed.groupBy(value_col).agg(
        F.sum("__cnt").alias("est_count")
    )
    return (
        merged.join(F.broadcast(err))
        .orderBy(F.desc("est_count"), F.asc(value_col))
        .limit(k)
        .select(value_col, "est_count", "err_bound")
    )


def topk_churn(
    df: DataFrame,
    key_col: str,
    side_col: str,
    *,
    k: int = 20,
    count_col: str | None = None,
) -> DataFrame:
    """Top-k CHURN between two sides of a corpus (two time windows, two
    crawl snapshots, two sources): rank keys per side by exact count
    (ties broken by key), keep each side's top-k, and full-outer join
    the two lists — the drift report a monitoring pipeline reads to
    see which heavy hitters entered, left, or moved.  `side_col` must
    be a two-valued column ('a'/'b' by convention; validated
    in-plan: a third side raises through the consumed count).

    One hash aggregation to (side, key, count), one row_number per
    side over the aggregated rows (two sorts of |keys| rows, never the
    data), one join of 2k rows.  Returns (key, count_a, rank_a,
    count_b, rank_b, status) with status in/out/moved/held, ordered by
    coalesce(rank_a, k+1), key."""
    from pyspark.sql import Window

    cnt = (
        F.sum(F.col(count_col)).cast("long")
        if count_col
        else F.count(F.lit(1)).cast("long")
    )
    counts = df.groupBy(
        F.col(side_col).alias("__side"), F.col(key_col).alias("key")
    ).agg(cnt.alias("__c"))
    # in-plan two-side contract: an AGGREGATE guard joined back (the
    # delta_candidate_pairs pattern) — a per-row fold would be pruned
    # the moment the per-side filters below push past it, because a
    # third side's rows never survive those filters
    guard = counts.agg(
        F.max(
            F.when(
                F.col("__side").isin("a", "b"), F.lit(0).cast("long")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("topk_churn: side_col value "),
                        F.col("__side"),
                        F.lit(" outside {'a','b'}"),
                    )
                )
            )
        ).alias("__z")
    )
    counts = counts.join(F.broadcast(guard)).select(
        "__side",
        "key",
        (F.col("__c") + F.coalesce(F.col("__z"), F.lit(0))).alias("__c"),
    )
    w = Window.partitionBy("__side").orderBy(F.desc("__c"), F.asc("key"))
    ranked = counts.withColumn("__r", F.row_number().over(w)).where(
        F.col("__r") <= k
    )
    a = ranked.where(F.col("__side") == "a").select(
        "key", F.col("__c").alias("count_a"), F.col("__r").alias("rank_a")
    )
    b = ranked.where(F.col("__side") == "b").select(
        "key", F.col("__c").alias("count_b"), F.col("__r").alias("rank_b")
    )
    joined = a.join(b, "key", "full_outer")
    status = (
        F.when(F.col("rank_a").isNull(), F.lit("in"))
        .when(F.col("rank_b").isNull(), F.lit("out"))
        .when(F.col("rank_a") == F.col("rank_b"), F.lit("held"))
        .otherwise(F.lit("moved"))
    )
    return joined.select(
        "key", "count_a", "rank_a", "count_b", "rank_b",
        status.alias("status"),
    ).orderBy(F.coalesce(F.col("rank_a"), F.lit(k + 1)), F.asc("key"))
