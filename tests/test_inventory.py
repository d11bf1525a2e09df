"""File-inventory modeling (sources/inventory.py) and REAL parquet
footer stats (sources/layout.py::parquet_footer_stats) — including the
cross-engine footer check against DuckDB's parquet_metadata(), which
the registry's view-only oracle harness can't express."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.sources.inventory import (
    compaction_plan,
    model_inventory,
    size_histogram,
    zonemap_skip_report,
)


def _inv(spark, sizes):
    rows = [(i, 1, s) for i, s in enumerate(sizes)]
    return spark.createDataFrame(
        rows, "file_id LONG, n_rows LONG, est_bytes LONG"
    )


def test_compaction_plan_bins_and_conserves(spark):
    inv = _inv(spark, [30, 30, 30, 30, 120, 10])
    plan = {r.out_bin: r for r in compaction_plan(inv, 100).collect()}
    # running sums before: 0,30,60,90,120,240 → bins 0,0,0,0,1,2
    assert plan[0].n_input_files == 4 and plan[0].total_bytes == 120
    assert plan[1].n_input_files == 1 and plan[1].total_bytes == 120
    assert plan[2].n_input_files == 1 and plan[2].total_bytes == 10
    assert sum(r.total_bytes for r in plan.values()) == 250
    assert sum(r.total_rows for r in plan.values()) == 6
    with pytest.raises(ValueError, match="target_bytes"):
        compaction_plan(inv, 0)


def test_size_histogram_power_of_two_buckets(spark):
    inv = _inv(spark, [1, 2, 3, 4, 1024, 0])
    rows = {r.log2_bytes: r for r in size_histogram(inv).collect()}
    # 0-byte files excluded; 1→bucket0, 2,3→bucket1, 4→2, 1024→10
    assert rows[0].n_files == 1 and rows[1].n_files == 2
    assert rows[2].n_files == 1 and rows[10].n_files == 1
    assert abs(rows[10].byte_share - 1024 / 1034) < 1e-12


def test_zonemap_skipping_and_depth(spark):
    # three disjoint ranges + one file spanning everything
    inv = spark.createDataFrame(
        [(0, 10, 0, 9), (1, 10, 10, 19), (2, 10, 20, 29), (3, 10, 0, 29)],
        "file_id LONG, n_rows LONG, zmin LONG, zmax LONG",
    )
    r = zonemap_skip_report(inv, "t", F.lit(0), F.lit(9)).collect()[0]
    # predicate [0,9]: files 0 and 3 overlap; 1 and 2 skip
    assert (r.n_files, r.n_skipped, r.rows_scanned, r.rows_total) == (
        4, 2, 20, 40,
    )
    # depths: each disjoint file overlaps itself + the spanning file
    # (2); the spanning file overlaps all 4 → avg (2+2+2+4)/4, max 4
    assert r.max_overlap_depth == 4
    assert abs(r.avg_overlap_depth - 2.5) < 1e-12


def test_model_inventory_counts_and_zonemaps(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    inv = model_inventory(
        li,
        F.col("l_orderkey") % 4,
        bytes_expr=F.lit(10),
        stat_col="l_suppkey",
    ).collect()
    assert sum(r.n_rows for r in inv) == li.count()
    for r in inv:
        assert r.est_bytes == 10 * r.n_rows
        assert r.zmin <= r.zmax


def test_parquet_footer_stats_matches_duckdb_metadata(spark, tmp_path):
    """The REAL footer reader: write a multi-file parquet table, read
    every footer via the distributed pyarrow operator, and verify file
    names, row counts, row-group counts, and compressed byte totals
    against DuckDB's parquet_metadata() — a genuinely independent
    parquet-footer implementation."""
    import duckdb

    from northwind_etl_spark.sources.layout import parquet_footer_stats

    out = str(tmp_path / "t")
    spark.range(10000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    ).repartition(4).write.parquet(out)
    paths = sorted(glob.glob(os.path.join(out, "*.parquet")))
    assert len(paths) == 4
    got = {
        r.file_name: r
        for r in parquet_footer_stats(spark, paths).collect()
    }
    con = duckdb.connect()
    comp = dict(
        con.execute(
            "SELECT parse_filename(file_name),"
            " CAST(SUM(total_compressed_size) AS BIGINT)"
            " FROM parquet_metadata(?) GROUP BY 1",
            [os.path.join(out, "*.parquet")],
        ).fetchall()
    )
    rows = con.execute(
        "SELECT f, CAST(SUM(nr) AS BIGINT), CAST(COUNT(*) AS BIGINT)"
        " FROM (SELECT parse_filename(file_name) AS f, row_group_id,"
        "        MAX(row_group_num_rows) AS nr"
        "       FROM parquet_metadata(?) GROUP BY 1, 2)"
        " GROUP BY 1",
        [os.path.join(out, "*.parquet")],
    ).fetchall()
    assert set(comp) == set(got)
    for f, n_rows, n_groups in rows:
        assert got[f].compressed_bytes == comp[f]
        assert got[f].n_rows == n_rows
        assert got[f].n_row_groups == n_groups
    assert sum(r.n_rows for r in got.values()) == 10000
