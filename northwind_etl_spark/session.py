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
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

# Engine confs shared by every deployment (local harness, spark-submit,
# the driver's vanilla session via harden()).
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


@dataclass(frozen=True)
class ClusterSpec:
    """Cluster sizing for spark-submit deployment.

    ``shuffle_partitions`` defaults to 2× total executor cores — enough
    tasks for AQE to coalesce downward, never so few that a partition
    exceeds executor memory; override per-job when input size is known
    (target ≤ ~200 MB of shuffle data per partition).
    """

    master: str  # "yarn", "k8s://https://...", "spark://host:7077"
    executor_instances: int
    executor_cores: int
    executor_memory: str
    driver_memory: str = "8g"
    shuffle_partitions: int | None = None
    dynamic_allocation: bool = False
    extra: dict[str, str] = field(default_factory=dict)

    @property
    def total_cores(self) -> int:
        return self.executor_instances * self.executor_cores


def session_confs(spec: ClusterSpec | None = None) -> dict[str, str]:
    """The full conf map for a session: ENGINE_CONFS plus either local
    defaults (spec=None; env-overridable, unchanged harness behavior) or
    the spec's cluster sizing."""
    confs = dict(ENGINE_CONFS)
    if spec is None:
        confs["spark.sql.shuffle.partitions"] = str(DEFAULT_SHUFFLE_PARTITIONS)
        confs["spark.driver.memory"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        return confs
    confs["spark.executor.instances"] = str(spec.executor_instances)
    confs["spark.executor.cores"] = str(spec.executor_cores)
    confs["spark.executor.memory"] = spec.executor_memory
    confs["spark.driver.memory"] = spec.driver_memory
    confs["spark.sql.shuffle.partitions"] = str(
        spec.shuffle_partitions
        if spec.shuffle_partitions is not None
        else 2 * spec.total_cores
    )
    if spec.dynamic_allocation:
        confs["spark.dynamicAllocation.enabled"] = "true"
        confs["spark.dynamicAllocation.shuffleTracking.enabled"] = "true"
    confs.update(spec.extra)
    return confs


def get_spark(
    app_name: str = "northwind-etl-spark",
    master: str | None = None,
    spec: ClusterSpec | None = None,
) -> SparkSession:
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
    if spec is not None:
        master = spec.master
    elif master is None:
        # SPARK_GRAFT_MASTER lets spark-submit point the same entry
        # points at a cluster without code changes; default stays the
        # local harness shape.
        master = os.environ.get("SPARK_GRAFT_MASTER")
        if master is None:
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
            master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in session_confs(spec).items():
        builder = builder.config(k, v)
    if master.startswith("local"):
        builder = builder.config("spark.ui.enabled", "false")
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
    # batch plans coalesce 200 default partitions via AQE anyway, but
    # Structured Streaming state shuffles have no AQE — a vanilla
    # session would pin 200 state partitions for 10k-row micro-batches.
    # Results are partition-count independent; only task overhead moves.
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
    return spark
