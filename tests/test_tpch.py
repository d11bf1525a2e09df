"""Plan-shape and invariant tests for the TPC-H-shaped suite
(plans/tpch.py).  Value correctness is covered query-by-query in
test_oracle_parity.py; these pin the SCALE contracts: subquery shapes
must plan as hash joins (semi/anti/broadcast), never a nested loop —
except the one designed exception, a 1-row scalar-threshold broadcast.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.plans import tpch as T

TPCH = [
    "q4_late_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q13_customer_order_counts",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_promo_part_suppliers",
    "q21_late_supplier",
    "q22_dormant_customers",
    "q12_shipmode_priority",
]

# q22's threshold is a 1-row aggregate cross-joined in — Spark plans a
# BroadcastNestedLoopJoin whose build side is that single row, i.e. the
# standard scalar-subquery shape (linear in the probe side).  Every
# other nested loop is a defect.
_SCALAR_BNLJ_OK = {"q22_dormant_customers"}


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", TPCH)
def test_no_nested_loop_or_cartesian(name, spark, sf_dir):
    plan = _executed_plan(getattr(T, name)(spark, sf_dir))
    assert "CartesianProduct" not in plan, name
    if name not in _SCALAR_BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, name


@pytest.mark.parametrize(
    "name,node",
    [
        ("q4_late_order_priority", r"BroadcastHashJoin .*LeftSemi"),
        ("q16_supplier_part_variety", r"BroadcastHashJoin .*LeftAnti"),
        ("q18_large_volume_customers", r"LeftSemi"),
        ("q20_promo_part_suppliers", r"BroadcastHashJoin .*LeftSemi"),
        ("q22_dormant_customers", r"LeftAnti"),
    ],
)
def test_subquery_shapes_are_hash_joins(name, node, spark, sf_dir):
    plan = _executed_plan(getattr(T, name)(spark, sf_dir))
    assert re.search(node, plan), f"{name}: expected {node} in plan"


def test_q19_disjunction_pushed_to_both_scans(spark, sf_dir):
    """Catalyst must extract each side's OR-envelope and push it into
    the parquet scan (quantity bounds → lineitem, brand/size →
    part) — the difference between scanning 100 TB and scanning the
    qualifying row groups."""
    # executedPlan().toString() truncates long filter lists; the
    # formatted explain prints them in full.
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        T.q19_disjunctive_revenue(spark, sf_dir).explain("formatted")
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", buf.getvalue())
    assert any("l_quantity" in f and "Or(" in f for f in m), m
    assert any("p_brand" in f and "Or(" in f for f in m), m


def test_q13_keeps_zero_order_customers(spark, sf_dir):
    """The left outer join must keep customers whose every order is
    filtered out by the join CONDITION (count 0), so the distribution
    covers the whole customer table."""
    dist = T.q13_customer_order_counts(spark, sf_dir)
    total = dist.agg(F.sum("custdist")).collect()[0][0]
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert total == n_cust


def test_q15_returns_all_tied_max_suppliers(spark, sf_dir):
    rows = T.q15_top_supplier(spark, sf_dir).collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1


def test_conditional_aggregates_stay_decimal(spark):
    """The q8/q14 CASE terms must be typed decimal end-to-end: an
    otherwise(lit(0.0)) branch would widen the CASE to DOUBLE and make
    the conditional sums order-dependent (the decimal contract's whole
    point).  Assert on the production helper, pre-rounding."""
    from northwind_etl_spark.functions.money import conditional_decimal

    df = spark.createDataFrame([("PROMO", 10.5), ("STD", 2.0)], "t STRING, rev DOUBLE")
    term = df.select(
        conditional_decimal(F.col("t") == "PROMO", F.col("rev")).alias("x")
    )
    assert dict(term.dtypes)["x"] == "decimal(38,6)"
    summed = term.agg(F.sum("x").alias("s"))
    assert dict(summed.dtypes)["s"].startswith("decimal")
    assert float(summed.collect()[0].s) == 10.5


def test_q2_min_per_group_is_window_not_rescan(spark, sf_dir):
    """The correlated min-per-group must plan as ONE window over the
    part key — no per-row re-aggregation join-back, no nested loop;
    all dimension sides broadcast."""
    plan = (
        T.q2_min_cost_supplier(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # part, supplier, nation⋈region
    rows = T.q2_min_cost_supplier(spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    # every returned supplier achieves its part's minimum cost
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, set()).add(r.supplycost)
    assert all(len(costs) == 1 for costs in by_part.values())


def test_q11_total_is_broadcast_not_collected(spark, sf_dir):
    """The global total must enter the plan as a broadcast 1-row join
    over the SAME grouped relation (exchange reuse), never a driver
    collect or a second fact scan."""
    df = T.q11_important_parts(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert len(rows) > 0
    # recompute the true threshold independently: 2x the mean per-part
    # revenue through NATION_3 suppliers — every kept row must clear it,
    # and the full grouped relation must contain below-threshold parts
    # (i.e. the cut actually cut something)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").where(F.col("n_name") == "NATION_3")
    g = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.expr("l_extendedprice * (1 - l_discount)")).alias("v"))
    )
    stats = g.agg(F.sum("v").alias("t"), F.count(F.lit(1)).alias("c")).collect()[0]
    threshold = 2.0 * stats.t / stats.c
    assert all(r.part_value > threshold * 0.999 for r in rows)
    assert len(rows) < stats.c  # the threshold excluded some parts
