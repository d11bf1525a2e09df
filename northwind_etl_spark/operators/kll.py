"""Mergeable quantile sketch by deterministic level compaction — the
KLL/MRL family (Karnin–Lang–Liberty 2016; Manku–Rajagopalan–Lindsay
1998) adapted to the engine's cross-engine-exactness discipline.

The exact selection operators (exact_median / exact_p90 / weighted_kth)
answer one quantile with log(range) passes; a pipeline that monitors
MANY quantiles per key wants a bounded SUMMARY it can store and merge
across days/shards instead.  The sketch here:

- level-l items carry weight 2^l; a level over capacity COMPACTS: keep
  half its items, double their weight — rank error grows by at most
  (weight/2) per compaction, the classic MRL bound;
- the keep/drop coin is the item's md5 parity AT THAT LEVEL (bit l of
  the key's md5) — deterministic, partition-independent, and exactly
  replayable in SQL by both engines (the engine's keyed-uniform move;
  KLL's random coin de-randomized the same way the reservoir and
  mixture samplers are);
- compaction is expressed as a FIXED unrolled chain of
  count-window + filter stages (n_levels rounds).  All rounds hash to
  the same group key, so Spark plans ONE exchange and n_levels
  in-partition window passes over geometrically shrinking data — and
  DuckDB replays the identical chain as nested CTEs;
- MERGE = union survivor sets and re-compact: levels are keyed by the
  same md5 bits, so merge-then-compact and compact-then-merge agree on
  which items survive (pinned in tests/test_kll.py).

`sketch_quantiles` finalizes: per group, order survivors by (value,
id), take the first row whose cumulative weight covers q·W — exact
integer comparisons, released as one correctly-rounded double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _md5_bit(key: Column, level: int) -> Column:
    """Bit `level` of the key's md5 — one hex nibble, tested with
    integer arithmetic both engines share (conv/%)."""
    nibble = F.conv(
        F.substring(F.md5(key.cast("string")), level // 4 + 1, 1), 16, 10
    ).cast("int")
    return F.shiftright(nibble, level % 4) % 2


def kll_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    capacity: int = 256,
    n_levels: int = 6,
) -> DataFrame:
    """Compact (group, value, id) rows into a bounded weighted summary:
    returns (group, value, id, weight, level) survivors.  Each of the
    `n_levels` rounds halves a group's survivors (md5 bit of the id at
    that level) ONLY while the group still exceeds `capacity` —
    undersized groups pass through exactly (their sketch is the data).

    A group of n rows leaves at most max(capacity, n/2^n_levels)
    survivors; size n_levels ~ log2(n/capacity) for a true cap (the
    fixed unroll keeps the oracle replay fixed-depth — documented
    residual: a group beyond capacity·2^n_levels keeps n/2^n_levels
    rows, still a 64× reduction at the defaults).
    """
    if capacity < 1 or n_levels < 0 or n_levels > 60:
        raise ValueError("capacity must be >= 1 and 0 <= n_levels <= 60")
    cur = df.select(
        F.col(group_col).alias("group"),
        F.col(value_col).alias("value"),
        F.col(id_col).alias("id"),
        F.lit(1).cast("long").alias("weight"),
        F.lit(0).cast("int").alias("level"),
    )
    g = Window.partitionBy("group")
    for lvl in range(n_levels):
        # materialize the group count first — a window function can't
        # sit inside WHERE
        cur = cur.withColumn("__cnt", F.count(F.lit(1)).over(g))
        keep = (F.col("__cnt") <= F.lit(capacity)) | (
            _md5_bit(F.col("id"), lvl) == 0
        )
        cur = (
            cur.withColumn("__over", F.col("__cnt") > F.lit(capacity))
            .where(keep)
            .select(
                "group",
                "value",
                "id",
                F.when(F.col("__over"), F.col("weight") * 2)
                .otherwise(F.col("weight"))
                .alias("weight"),
                F.when(F.col("__over"), F.col("level") + 1)
                .otherwise(F.col("level"))
                .alias("level"),
            )
        )
    return cur


def sketch_quantiles(
    sketch: DataFrame, quantiles_pct: list[int]
) -> DataFrame:
    """Estimate quantiles from a weighted sketch: per group, the first
    survivor (by (value, id) total order) whose cumulative weight
    reaches ceil(q·W) — all comparisons in exact integer arithmetic
    (cum·100 >= W·pct), one correctly-rounded cast on the released
    value.  Output: (group, n_sketch_rows, total_weight,
    p<pct> for each requested pct), one row per group."""
    for p in quantiles_pct:
        if not 0 < p <= 100:
            raise ValueError("quantile percentages must be in (0, 100]")
    w = (
        Window.partitionBy("group")
        .orderBy("value", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("group")
    cum = sketch.withColumn("cum_w", F.sum("weight").over(w)).withColumn(
        "tot_w", F.sum("weight").over(tot)
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_sketch_rows"),
        F.max("tot_w").cast("long").alias("total_weight"),
    ]
    for p in quantiles_pct:
        hit = F.col("cum_w") * 100 >= F.col("tot_w") * p
        aggs.append(
            F.min(F.when(hit, F.col("value").cast("double"))).alias(f"p{p}")
        )
    return cum.groupBy("group").agg(*aggs)
