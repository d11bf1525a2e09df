"""Storage-layout operators — the reference's load stage (L1/L2
truncate/delete-reload) grown up for partitioned, append-heavy,
100 TB storage.

- ``incremental_overwrite``: reload only the partitions present in the
  incoming batch (dynamic partition overwrite) — the idempotent
  re-run story the reference approximates with DELETE+reload.
- ``compact``: rewrite a directory into N right-sized files — small
  files are the silent killer of big parquet tables (one task per
  file, metadata bloat).
- ``write_clustered``: range-partition + sort within partitions on the
  cluster keys before writing, so parquet row-group min/max stats
  become selective and scans skip aggressively (poor-man's Z-order
  for the single-key case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def incremental_overwrite(
    df: DataFrame, path: str, *, partition_by: list[str]
) -> None:
    """Overwrite exactly the partitions present in `df`, leave the rest."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact(spark: SparkSession, path: str, *, target_files: int) -> None:
    """Rewrite `path` into `target_files` files (read → coalesce →
    staged write → swap via overwrite)."""
    df = spark.read.parquet(path)
    staging = f"{path}__compact"
    # coalesce (not repartition): merging files needs no shuffle
    df.coalesce(target_files).write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").parquet(path)
    # drop the staging dir via the Hadoop FS API (works on any DFS)
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(spark._jsc.hadoopConfiguration())
    fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)


def write_clustered(
    df: DataFrame, path: str, *, cluster_by: list[str], num_files: int
) -> None:
    """Range-partition on cluster keys + sort within partitions, so each
    output file covers a narrow, non-overlapping key range."""
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in cluster_by])
        .sortWithinPartitions(*cluster_by)
        .write.mode("overwrite")
        .parquet(path)
    )
