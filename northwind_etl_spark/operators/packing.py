"""Sequence packing — assemble documents into fixed token-budget
training batches, the batching stage that feeds an LLM trainer.

Greedy first-fit packing is inherently sequential (each decision
depends on the previous batch's remaining room), so it cannot be a
window expression and would serialize 100 TB through one task.  This
implements the standard distributed compromise, QUOTA PACKING:

1. bucket documents by length (floor(n_tokens / bucket_width)) so
   batch-mates have similar lengths — the same reason trainers bucket
   before padding: packing mixed lengths wastes pad tokens;
2. shard each bucket deterministically (md5 of the id, mod n_shards)
   so one giant bucket does not serialize into one task — packing
   needs determinism, not a global order, and each shard packs
   independently (this is the keyed-window hot-key mitigation applied
   at design time rather than patched in later);
3. within each (bucket, shard): a single cumulative-sum window ordered
   by (n_tokens, id) assigns batch_id = floor(tokens_before / budget).

Each emitted batch fills to budget ± the longest member (quota
packing's documented slack) — deterministic on any partitioning and
SQL-oracle-checkable, which greedy RNG-shuffled packing is not.

Per-shard state is one running sum — the window is agg-like, so even
a hot (bucket, shard) costs memory O(1), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _shard_expr(key: Column, n_shards: int) -> Column:
    """Deterministic engine-portable shard: md5/conv mod n_shards (the
    split_bucket_expr trick from operators/sampling.py)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % n_shards
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    *,
    budget: int = 2048,
    bucket_width: int = 32,
    n_shards: int = 8,
) -> DataFrame:
    """Assign every document a (bucket, shard, batch_id); one row per
    input document with its batch assignment."""
    bucket = F.floor(F.col(len_col) / bucket_width).cast("int")
    shard = _shard_expr(F.col(id_col), n_shards).cast("int")
    w = (
        Window.partitionBy("bucket", "shard")
        .orderBy(F.col(len_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = (
        df.select(
            F.col(id_col),
            F.col(len_col),
            bucket.alias("bucket"),
            shard.alias("shard"),
        )
        .withColumn(
            "tokens_before", F.coalesce(F.sum(len_col).over(w), F.lit(0))
        )
        .withColumn(
            "batch_id", F.floor(F.col("tokens_before") / budget).cast("int")
        )
    )
    return assigned.drop("tokens_before")


def batch_fill_stats(packed: DataFrame, len_col: str) -> DataFrame:
    """Per-batch fill report: document count and token total — the
    packing-efficiency view a pipeline monitors (batch_tokens should
    hug the budget; chronic underfill means bucket_width or n_shards
    is mis-tuned for the corpus)."""
    return packed.groupBy("bucket", "shard", "batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(len_col).alias("batch_tokens"),
    )


def shard_manifest(
    df: DataFrame,
    id_col: str,
    len_col: str,
    source_col: str,
    *,
    n_shards: int = 4,
    part_budget: int = 4096,
) -> DataFrame:
    """Training-data EXPORT manifest: assign every document to a
    (shard, part) under a per-part token budget and summarize each
    planned output file — the manifest a trainer's data loader reads
    instead of listing storage.

    Layout discipline (the pack_sequences contract, minus the length
    bucketing — an export preserves corpus order-independence, not
    batch shape): shard = md5(id) % n_shards levels documents across
    writers; within a shard documents take the deterministic
    (md5(id), id) order and part = tokens_before DIV part_budget —
    integral division on longs, one running-sum window per shard with
    O(1) state.

    Manifest row per (shard, part): n_docs, n_tokens, n_sources, and
    the dominant source with its doc count (ties to the LARGER source
    name — (count, name) struct max, a total order), the mixture-drift
    signal reviewers check before a training run.
    """
    if n_shards < 1 or part_budget < 1:
        raise ValueError("n_shards and part_budget must be >= 1")
    shard = _shard_expr(F.col(id_col), n_shards).cast("int")
    order_key = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy("shard")
        .orderBy("order_key", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = (
        df.select(
            F.col(id_col),
            F.col(len_col).cast("long").alias("__len"),
            F.col(source_col).alias("__src"),
            shard.alias("shard"),
            order_key.alias("order_key"),
        )
        .withColumn(
            "tokens_before",
            F.coalesce(F.sum("__len").over(w), F.lit(0)).cast("long"),
        )
        .withColumn(
            "part", F.expr(f"tokens_before DIV {int(part_budget)}").cast("int")
        )
    )
    per_source = assigned.groupBy("shard", "part", "__src").agg(
        F.count(F.lit(1)).cast("long").alias("__src_docs"),
        F.sum("__len").cast("long").alias("__src_tokens"),
    )
    return (
        per_source.groupBy("shard", "part")
        .agg(
            F.sum("__src_docs").cast("long").alias("n_docs"),
            F.sum("__src_tokens").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.max(F.struct(F.col("__src_docs"), F.col("__src"))).alias(
                "__top"
            ),
        )
        .select(
            "shard",
            "part",
            "n_docs",
            "n_tokens",
            "n_sources",
            F.col("__top.__src").alias("top_source"),
            F.col("__top.__src_docs").alias("top_source_docs"),
        )
        .orderBy("shard", "part")
    )
