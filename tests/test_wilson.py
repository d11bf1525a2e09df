"""Wilson score interval (operators/modelfit.py::wilson_bounds):
bit-exact pure-Python IEEE replay, interval properties, n=0 guard."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.modelfit import wilson_bounds


def _py_wilson(k, n, z=1.96):
    kd, nd = float(k), float(n)
    p = kd / nd
    z2 = z * z
    denom = 1.0 + z2 / nd
    center = p + z2 / (2.0 * nd)
    rad = math.sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd))
    return (center - z * rad) / denom, (center + z * rad) / denom


@pytest.fixture(scope="module")
def counts(spark):
    rows = [(37, 150), (7, 37), (0, 12), (12, 12), (1, 2), (0, 0)]
    return spark.createDataFrame(rows, "k long, n long")


def test_bit_exact_vs_python(counts):
    lo, hi = wilson_bounds(F.col("k"), F.col("n"))
    got = counts.select("k", "n", lo.alias("lo"), hi.alias("hi")).collect()
    for r in got:
        if r["n"] == 0:
            assert r["lo"] is None and r["hi"] is None
            continue
        plo, phi = _py_wilson(r["k"], r["n"])
        assert r["lo"] == plo and r["hi"] == phi  # EXACT doubles


def test_interval_properties(counts):
    lo, hi = wilson_bounds(F.col("k"), F.col("n"))
    for r in counts.where("n > 0").select(
        "k", "n", lo.alias("lo"), hi.alias("hi")
    ).collect():
        p = r["k"] / r["n"]
        # at p-hat in {0, 1} the bound EQUALS p analytically; floating
        # rounding can land 2 ulp inside, hence the epsilon
        eps = 1e-12
        assert -eps <= r["lo"] <= p + eps
        assert p - eps <= r["hi"] <= 1.0 + eps


def test_wider_at_smaller_n(spark):
    df = spark.createDataFrame([(5, 10), (500, 1000)], "k long, n long")
    lo, hi = wilson_bounds(F.col("k"), F.col("n"))
    rows = {r["n"]: r["hi"] - r["lo"]
            for r in df.select("n", lo.alias("lo"), hi.alias("hi")).collect()}
    assert rows[10] > rows[1000]
