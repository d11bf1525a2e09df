"""JDBC source/sink option plumbing (no database in the container —
validation logic and reader construction only)."""

from __future__ import annotations

import pytest

from northwind_etl_spark.sources.jdbc import jdbc_reader


def test_requires_exactly_one_of_table_or_query(spark):
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_reader(spark, "jdbc:postgresql://h/db")
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_reader(spark, "jdbc:postgresql://h/db", table="t", query="SELECT 1")


def test_partitioned_read_requires_bounds(spark):
    with pytest.raises(ValueError, match="partitioned read"):
        jdbc_reader(
            spark,
            "jdbc:postgresql://h/db",
            table="t",
            partition_column="id",
            num_partitions=8,
        )


def test_reader_builds_with_full_partition_spec(spark):
    reader = jdbc_reader(
        spark,
        "jdbc:postgresql://h/db",
        query="SELECT a, b FROM t WHERE c > 0",
        partition_column="a",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
        properties={"user": "u"},
    )
    # construction succeeds; no load() without a driver jar
    assert reader is not None
