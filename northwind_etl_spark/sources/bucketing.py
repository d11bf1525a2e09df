"""Bucketed tables: the shuffle-free co-located join strategy.

The reference never faces this (2,155 rows, one process); at 100 TB the
fact⋈fact join (e.g. lineitem ⋈ orders when orders is too big to
broadcast) is THE shuffle that hurts — both sides move over the network
every query.  Bucketing pre-partitions each table by the join key at
write time, so every subsequent join on that key is exchange-free: each
task reads bucket i of both sides and joins locally.

``write_bucketed`` + ``co_located_join`` demonstrate the pattern; the
test asserts the physical plan contains NO Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    num_buckets: int,
    path: str,
) -> None:
    """Persist as a bucketed+sorted external parquet table (metastore
    entry records the bucketing spec so reads can exploit it)."""
    (
        df.write.format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — Catalyst plans
    a SortMergeJoin with zero Exchange when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
