"""Every oracle-checkable query must match its DuckDB oracle at sf0.001
(the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from northwind_etl_spark.plans.oracles import ORACLES
from northwind_etl_spark.plans.queries import QUERIES

from .oracle_harness import assert_safe_oracle_types, compare, duck_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, duck):
    assert name in QUERIES, f"oracle {name} has no query"
    df = QUERIES[name](spark, sf_dir)
    result = compare(df, duck, ORACLES[name])
    assert result["ok"], f"{name}: {result}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_result_types_driver_safe(name, duck):
    """Regression guard for the r02 HUGEINT hash-fails: every oracle
    column must stay within the driver-safe DuckDB type set."""
    assert_safe_oracle_types(duck, name, ORACLES[name])


def test_every_query_registered():
    missing = sorted(set(ORACLES) - set(QUERIES))
    assert not missing
