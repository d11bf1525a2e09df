"""Distributed global ranking — dense global row numbers WITHOUT the
single-task global window.

The trap: ``row_number().over(Window.orderBy(...))`` (no partitionBy)
is correct and fine on a vocabulary of thousands, but Catalyst compiles
it to ``Exchange SinglePartition`` + one task sorting the entire
relation — at a 100 TB corpus's vocabulary (10⁸+ terms) that is THE
scale-killer, and it's silent: the plan runs, it just runs on one core
with one task's memory.

The fix is the classic two-phase shape (the DataFrame rendering of
``RDD.zipWithIndex``):

1. ``repartitionByRange`` on the order keys — a range exchange whose
   bounds come from a distributed sample, so partition i holds keys
   strictly before partition i+1 (unique total order ⇒ well-defined);
2. per-partition LOCAL ranking — a window partitioned by
   ``spark_partition_id()`` (captured before the window's own
   exchange, so membership is the range partition, wherever the row
   physically lands);
3. per-partition counts — P rows, driver-sized by construction —
   broadcast back as cumulative offsets; global rank = offset + local
   rank.

The result is bit-identical to the single-window form when the order
is total (pinned in tests/test_ranking.py), costs two exchanges of
which neither is SinglePartition, and the only driver-side data is the
P-row count list.

North-star use: stable vocabulary ids for tokenizer export
(`term_vocabulary_ids`), global sort positions for deterministic
sharding — anywhere "number every row of a huge sorted relation" comes
up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    *,
    rank_col: str = "global_rank",
    partitions: int | None = None,
) -> DataFrame:
    """Append 1-based `rank_col` following `order_cols` — which must be
    a TOTAL order (include a unique tie-breaker; with ties across a
    range-partition boundary the split, and therefore the ranks, would
    be sample-dependent)."""
    from ..cache import persist_stage

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    # persisted: the counts action and the ranking plan must see the
    # SAME range split (and the range exchange runs once, not twice)
    ranged = persist_stage(
        df.repartitionByRange(p, *cols).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    local = F.row_number().over(Window.partitionBy("__pid").orderBy(*cols))
    ranked = ranged.withColumn("__local", local)
    counts = (
        ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy("__pid")
        .collect()
    )
    offset = 0
    offsets = []
    for r in counts:
        offsets.append((r["__pid"], offset))
        offset += r["__n"]
    spark = df.sparkSession
    # offsets attach via a broadcast join on __pid — O(1) per row; a
    # CASE chain would be O(P) comparisons per row and a P-ary codegen
    # expression tree, both of which blow up at cluster parallelism
    off_df = spark.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long"
    )
    return (
        ranked.join(F.broadcast(off_df), "__pid", "left")
        .withColumn(
            rank_col,
            (F.col("__local") + F.coalesce(F.col("__off"), F.lit(0))).cast(
                "long"
            ),
        )
        .drop("__pid", "__local", "__off")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    *,
    out_col: str = "running_sum",
    partitions: int | None = None,
) -> DataFrame:
    """Append the INCLUSIVE prefix sum of `value_col` following
    `order_cols` (a TOTAL order — same contract as global_row_number)
    WITHOUT a single-partition window: range-partition on the order,
    local cumulative window per partition, then one bounded collect of
    per-partition totals whose exclusive prefix becomes a broadcast
    offset.  Driver state is P rows — the two-phase ranking pattern
    extended from ranks to sums (rank = prefix sum of 1).

    `value_col` must be an INTEGRAL type: the per-partition offsets
    travel as BIGINTs, so a decimal/float column would be silently
    truncated — rejected up front instead.  (Decimal prefix sums need
    a decimal offset channel; add it when a caller exists.  Float
    prefix sums are order-dependent and never exact.)
    """
    from ..cache import persist_stage

    vtype = df.schema[value_col].dataType.simpleString()
    if vtype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"global_running_sum: {value_col!r} is {vtype}; only"
            " integral value columns merge exactly through the BIGINT"
            " offset channel"
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = persist_stage(
        df.repartitionByRange(p, *cols).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    local = F.sum(value_col).over(
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = (
        ranged.groupBy("__pid")
        .agg(F.sum(value_col).cast("long").alias("__s"))
        .orderBy("__pid")
        .collect()
    )
    offset = 0
    offsets = []
    for r in totals:
        offsets.append((r["__pid"], offset))
        offset += r["__s"]
    off_df = df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long"
    )
    return (
        ranged.withColumn("__local", local)
        .join(F.broadcast(off_df), "__pid", "left")
        .withColumn(
            out_col,
            (
                F.col("__local").cast("long")
                + F.coalesce(F.col("__off"), F.lit(0))
            ).cast("long"),
        )
        .drop("__pid", "__local", "__off")
    )
