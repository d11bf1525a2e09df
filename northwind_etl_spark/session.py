"""SparkSession factory tuned for this engine.

The reference has no session concept (one process, one ODBC connection,
``config.py:11-24``); here the session is where scale knobs live:
AQE for runtime re-planning (skew joins, partition coalescing),
a shuffle-partition count sized to the local harness, and Arrow for
any pandas exchange.  On a real cluster the same factory applies —
only ``master`` and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(app_name: str = "northwind-etl-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    - AQE on: runtime join-strategy selection, skew-join splitting, and
      post-shuffle partition coalescing — the knobs that matter at 100 TB.
    - Runtime bloom-filter join pruning stays at its default (ON):
      selective dimension filters inject fact-scan bloom filters once
      the application side crosses the 10 GB scan threshold — a no-op
      locally, free pruning at cluster scale (tests/test_runtime_filters
      .py proves the q3/q5 shapes accept the injection).
    - Arrow on: any pandas_udf / toPandas hop is columnar, not pickled rows.
    - nanosAsLong: the events table carries parquet TIMESTAMP(NANOS)
      which Spark's vectorized reader rejects; we read it as raw int64
      and convert exactly (sources/parquet.py).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()


def harden(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally-provided session.

    The correctness driver hands us *its* SparkSession; these settings make
    our queries behave identically there (UTC timestamps, nanos reading,
    AQE).  All of these are runtime SQL confs — safe to set post-start.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
