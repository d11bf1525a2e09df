"""md5-register HLL (operators/hll.py): register-scheme replay against
an independent Python md5, merge losslessness, both estimator branches,
error envelopes on planted cardinalities, and the eval/overlap entries.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.hll import (
    EST_NUMERATOR,
    LC_TABLE,
    LC_THRESHOLD,
    M_REGISTERS,
    REL_3SIGMA,
    RHO_CAP,
    hll_estimate,
    hll_state,
    merge_states,
    register_exprs,
)


def _py_reg_rho(value: str) -> tuple[int, int]:
    """Independent Python replay of the register scheme."""
    hx = hashlib.md5(value.encode()).hexdigest()
    reg = int(hx[:2], 16)
    tail = hx[2:17]  # 15 nibbles, 60 bits
    v = int(tail, 16)
    rho = RHO_CAP if v == 0 else 60 - v.bit_length() + 1
    return reg, rho


def _py_estimate(values: list[str]) -> float:
    regs: dict[int, int] = {}
    for v in values:
        r, rho = _py_reg_rho(v)
        regs[r] = max(regs.get(r, 0), rho)
    s = sum(1 << (RHO_CAP - m) for m in regs.values())
    s += (M_REGISTERS - len(regs)) << RHO_CAP
    raw = EST_NUMERATOR / float(s)
    nzero = M_REGISTERS - len(regs)
    if raw <= LC_THRESHOLD and nzero > 0:
        return LC_TABLE[nzero - 1]
    return raw


def test_register_scheme_matches_python_replay(spark):
    df = spark.range(500).select(F.col("id").cast("string").alias("v"))
    reg, rho = register_exprs(F.col("v"))
    got = {
        r["v"]: (r["reg"], r["rho"])
        for r in df.select("v", reg.alias("reg"), rho.alias("rho")).collect()
    }
    for v, pair in got.items():
        assert pair == _py_reg_rho(v), (v, pair, _py_reg_rho(v))


@pytest.mark.parametrize("n", [1, 7, 120, 641, 3000, 20000])
def test_estimate_matches_python_replay_both_branches(spark, n):
    """Exact agreement with the independent Python fold across the
    linear-counting / raw-harmonic boundary (n=641 straddles it)."""
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    got = hll_estimate(hll_state(df, [], "v"), round_to=6).collect()[0][0]
    assert got == round(_py_estimate([str(i) for i in range(n)]), 6)


@pytest.mark.parametrize("n", [50, 1000, 30000])
def test_error_envelope_on_planted_cardinality(spark, n):
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    est = hll_estimate(hll_state(df, [], "v")).collect()[0][0]
    assert abs(est - n) <= max(3.0, REL_3SIGMA * n), (est, n)


def test_merge_is_lossless(spark):
    """merge(state(A), state(B)) has EXACTLY the registers of
    state(A ∪ B) — max is a lattice join (the reaggregation
    guarantee)."""
    a = spark.range(0, 4000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2000, 9000).select(F.col("id").cast("string").alias("v"))
    merged = merge_states(hll_state(a, [], "v"), hll_state(b, [], "v"))
    direct = hll_state(a.unionAll(b), [], "v")
    mrows = {(r["reg"], r["maxrho"]) for r in merged.collect()}
    drows = {(r["reg"], r["maxrho"]) for r in direct.collect()}
    assert mrows == drows


def test_states_equal_catches_asymmetric_registers(spark):
    """A register present on only ONE side must flip matches to False
    (the NULL-skipping-min hole found in the r12 self-review)."""
    from northwind_etl_spark.operators.hll import states_equal

    a = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, 7)], "k string, reg int, maxrho int"
    )
    b_same = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, 7)], "k string, reg int, maxrho int"
    )
    b_missing = spark.createDataFrame(
        [("g", 1, 5)], "k string, reg int, maxrho int"
    )
    b_extra = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, 7), ("g", 3, 1)],
        "k string, reg int, maxrho int",
    )
    b_diff = spark.createDataFrame(
        [("g", 1, 5), ("g", 2, 8)], "k string, reg int, maxrho int"
    )
    assert states_equal(a, b_same).collect()[0]["matches"] is True
    assert states_equal(a, b_missing).collect()[0]["matches"] is False
    assert states_equal(a, b_extra).collect()[0]["matches"] is False
    assert states_equal(a, b_diff).collect()[0]["matches"] is False


def test_nulls_are_skipped(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), (None,), ("a",)], "v string"
    )
    state = hll_state(df, [], "v")
    expect = {}
    for v in ("a", "b"):
        r, rho = _py_reg_rho(v)
        expect[r] = max(expect.get(r, 0), rho)
    got = {r["reg"]: r["maxrho"] for r in state.collect()}
    assert got == expect


def test_grouped_state_is_per_group(spark):
    df = spark.createDataFrame(
        [("g1", i) for i in range(300)] + [("g2", i) for i in range(10)],
        "g string, v long",
    )
    est = {
        r["g"]: r["est_distinct"]
        for r in hll_estimate(hll_state(df, ["g"], "v")).collect()
    }
    assert abs(est["g1"] - 300) <= max(3.0, REL_3SIGMA * 300)
    assert abs(est["g2"] - 10) <= max(3.0, REL_3SIGMA * 10)


def test_lc_table_frozen_values():
    """The linear-counting table is m·ln(m/V) — spot-pin endpoints so a
    regeneration with different constants can't slip through."""
    assert LC_TABLE[0] == 256 * math.log(256.0)
    assert LC_TABLE[255] == 0.0
    assert len(LC_TABLE) == 256


def test_error_eval_entry_within_bound(spark, sf_dir):
    from northwind_etl_spark.plans.queries import hll_md5_error_eval

    rows = hll_md5_error_eval(spark, sf_dir).collect()
    assert rows and all(r["within_3sigma"] for r in rows), rows


def test_overlap_entry_inclusion_exclusion(spark, sf_dir):
    """est_intersection must reproduce a+b−u from the entry's own
    columns, and the exact intersection must be a plausible anchor
    (error bounded by the union-scale envelope — inclusion–exclusion
    error scales with |A∪B|, not |A∩B|)."""
    from northwind_etl_spark.plans.queries import hll_click_purchase_overlap

    r = hll_click_purchase_overlap(spark, sf_dir).collect()[0]
    assert r["est_intersection"] == round(
        r["est_click_users"] + r["est_purchase_users"] - r["est_union"], 4
    )
    assert r["abs_error"] <= 3 * REL_3SIGMA * r["est_union"], dict(
        r.asDict()
    )
