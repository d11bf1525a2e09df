"""Dataset splitting and sampling — the selection operators a
training-data pipeline runs after dedup/quality filtering.

- ``hash_split``: deterministic, engine-independent train/eval split by
  md5 of a key column.  No RNG, no state: the same row lands in the
  same split on any engine, any partitioning, any rerun — exactly what
  reproducible dataset builds need (and SQL-oracle-checkable).
- ``stratified_sample``: per-stratum Bernoulli sampling via
  ``sampleBy`` with a fixed seed — balanced subsets (e.g. per-language)
  without a shuffle; fractions hold in expectation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket_expr(key: Column | str, *, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): first 8 hex chars of md5(key) mod
    buckets.  conv() of 8 hex chars fits in a long — no overflow."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % buckets
    ).alias("split_bucket")


def hash_split(
    df: DataFrame, key: str, *, train_pct: int = 80, buckets: int = 100
) -> DataFrame:
    """Label every row train/eval by its stable hash bucket."""
    bucket = split_bucket_expr(key, buckets=buckets)
    return df.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < train_pct, F.lit("train")).otherwise(
            F.lit("eval")
        ),
    )


def stratified_sample(
    df: DataFrame, stratum_col: str, fractions: dict[str, float], *, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (map-only, no shuffle)."""
    return df.sampleBy(stratum_col, fractions, seed=seed)
