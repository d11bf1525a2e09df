"""End-to-end JDBC round-trip against embedded Derby (the driver jars
ship with Spark for the Hive metastore, so a real RDBMS hop is testable
even in this container).

This closes the reference's live-database surface: its source AND sink
are an ODBC RDBMS (etl_category.py:10-13 connect, 55-61 executemany
load; etl_orders.py:47-50 cross-DB dim read).  Here the same lifecycle
runs through sources/jdbc.py: partitioned extract, pushed-down query
extract, truncate-and-reload sink, re-read parity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.sources.jdbc import jdbc_reader, write_jdbc_reload

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "nes_db"
    return f"jdbc:derby:{db};create=true"


def _props() -> dict[str, str]:
    return {"driver": DERBY_DRIVER}


def test_jdbc_write_read_roundtrip(spark, sf_dir, derby_url):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc_reload(nation, derby_url, "NATION", properties=_props())
    back = jdbc_reader(spark, derby_url, table="NATION", properties=_props()).load()
    assert back.count() == nation.count()
    # value parity (Derby returns the same rows; compare as sorted sets)
    a = sorted(tuple(r) for r in nation.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_jdbc_truncate_and_reload_is_idempotent(spark, sf_dir, derby_url):
    """L1 semantics: a second overwrite load must replace, not append."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet").select(
        "r_regionkey", "r_name"
    )
    write_jdbc_reload(region, derby_url, "REGION", properties=_props())
    write_jdbc_reload(region, derby_url, "REGION", properties=_props())
    back = jdbc_reader(spark, derby_url, table="REGION", properties=_props()).load()
    assert back.count() == region.count()


def test_jdbc_pushed_down_query(spark, sf_dir, derby_url):
    """The reference's source-side join/projection (etl_orders.py:22-23)
    as a query pushdown: the database executes the SQL, Spark receives
    only the result."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc_reload(nation, derby_url, "NATION_Q", properties=_props())
    got = (
        jdbc_reader(
            spark,
            derby_url,
            # Spark's JDBC writer creates quoted (case-exact) column names,
        # so the pushed-down SQL must quote them too
        query='SELECT "n_nationkey", "n_name" FROM NATION_Q WHERE "n_regionkey" = 0',
            properties=_props(),
        )
        .load()
        .collect()
    )
    want = nation.where(F.col("n_regionkey") == 0).count()
    assert len(got) == want
    assert {len(r) for r in got} == {2}  # projection pushed down


def test_jdbc_partitioned_extract(spark, sf_dir, derby_url):
    """Partitioned parallel extract: numPartitions JDBC slices instead
    of one socket — the 100 TB shape of the reference's single-cursor
    pd.read_sql."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    write_jdbc_reload(cust, derby_url, "CUSTOMER_P", properties=_props())
    hi = cust.agg(F.max("c_custkey")).first()[0]
    back = jdbc_reader(
        spark,
        derby_url,
        table="CUSTOMER_P",
        partition_column="c_custkey",
        lower_bound=0,
        upper_bound=int(hi) + 1,
        num_partitions=4,
        properties=_props(),
    ).load()
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == cust.count()
