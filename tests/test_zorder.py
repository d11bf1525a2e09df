"""Z-order layout: content preservation + a quantitative clustering
check — per-file bounding boxes over BOTH dimensions must be much
tighter than a single-column sort gives, which is exactly the property
parquet min/max row-group pruning monetizes."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from northwind_etl_spark.sources.parquet import read_events
from northwind_etl_spark.sources.zorder import morton_code, zorder_layout


def _per_dim_avg_span(spark, path: str, col_x: str, col_y: str, spans):
    """Average normalized per-file [min,max] span on each dimension —
    the expected fraction of files a point query on that dimension must
    read (what parquet stat pruning pays)."""
    rows = (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.min(col_x).alias("x0"), F.max(col_x).alias("x1"),
            F.min(col_y).alias("y0"), F.max(col_y).alias("y1"),
        )
        .collect()
    )
    xspan, yspan = spans
    ax = sum((r.x1 - r.x0) / xspan for r in rows) / len(rows)
    ay = sum((r.y1 - r.y0) / yspan for r in rows) / len(rows)
    return ax, ay


def test_morton_code_interleaves_bits(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "x LONG, y LONG").select(
        morton_code(F.col("x"), F.col("y"), bits=3).alias("z")
    )
    # x=101 on even positions -> 1_0_1 at bits 4,2,0 = 10001
    # y=011 on odd  positions -> 0_1_1 at bits 5,3,1 = 01010
    assert df.collect()[0].z == 0b011011


def test_zorder_layout_preserves_content_and_bounds_worst_dimension(spark, sf_dir):
    # independent dimensions: event_id is sequence-assigned, user_id is
    # per-event — a single-column sort on either leaves the other at
    # ~full span per file, which is the scan-cost z-order removes
    ev = read_events(spark, sf_dir).select("event_id", "user_id", "value")
    base = tempfile.mkdtemp(prefix="zorder_")
    n_files = 16

    # baseline layout: lexicographic sort by user_id only
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(f"{base}/linear")
    )
    zorder_layout(ev, "user_id", "event_id", out_partitions=n_files).write.mode(
        "overwrite"
    ).parquet(f"{base}/zorder")

    # content identical — layout must never change data
    assert (
        spark.read.parquet(f"{base}/zorder")
        .exceptAll(ev)
        .union(ev.exceptAll(spark.read.parquet(f"{base}/zorder")))
        .count()
        == 0
    )

    bounds = ev.agg(
        (F.max("user_id") - F.min("user_id")).alias("xs"),
        (F.max("event_id") - F.min("event_id")).alias("ys"),
    ).collect()[0]
    spans = (bounds.xs, bounds.ys)
    lin = _per_dim_avg_span(spark, f"{base}/linear", "user_id", "event_id", spans)
    zor = _per_dim_avg_span(spark, f"{base}/zorder", "user_id", "event_id", spans)
    # single-column sort is perfect on its key, ~full-span on the other:
    # a filter on event_id reads every file
    assert lin[0] < 0.15 and lin[1] > 0.8, lin
    # z-order bounds BOTH dimensions: worst dimension far below the
    # linear layout's worst, so either-dimension filters prune.  The
    # absolute bound is loose because sf0.001 has only ~15 distinct
    # user_ids — per-file spans quantize to multiples of ~1/15
    assert max(zor) < max(lin) / 2, (zor, lin)
    assert max(zor) < 0.55, zor


def test_zorder_rejects_reserved_column_and_has_no_global_window(spark, sf_dir):
    import pytest

    ev = read_events(spark, sf_dir).select("event_id", "user_id")
    with pytest.raises(ValueError, match="__z"):
        zorder_layout(ev.withColumn("__z", F.lit(1)), "user_id", "event_id")
    # the layout plan must contain no Window node: quantile binning is a
    # driver-side boundary list, not an orderBy-without-partition window
    # (which would funnel every row through one task)
    plan = (
        zorder_layout(ev, "user_id", "event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
