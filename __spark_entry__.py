"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``northwind_etl_spark`` (see SURVEY.md §7's
build plan); this module only adapts it to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from northwind_etl_spark.plans.oracles import ORACLES
from northwind_etl_spark.plans.queries import QUERIES
from northwind_etl_spark.session import harden


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A1 — revenue by nation) on /root/testdata/sf0.001."""
    harden(spark)
    return QUERIES["flagship_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL oracles (DuckDB dialect) for the oracle-checkable subset;
    LSH/multimodal entries are intentionally absent → rows-only checks."""
    return dict(ORACLES)
