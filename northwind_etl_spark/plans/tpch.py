"""TPC-H-shaped query suite beyond q1/q3/q5/q6 — the SQL-surface
breadth pass: correlated scalar subqueries, EXISTS / NOT EXISTS,
NOT IN, HAVING + join-back, disjunction pushdown, left-outer
distributions, and scalar-subquery joins, each as an idiomatic
DataFrame composition with an exact DuckDB oracle.

The testdata schema is a TPC-H subset (no partsupp, commit/receipt
dates, shipmode, phone, container, comment), so the classic queries
are adapted to the columns that exist while keeping each query's
*operator shape* intact — e.g. q4's EXISTS probe survives with
"shipped > 90 days after order" standing in for the commit/receipt
lateness test. q2's partsupp is SYNTHESIZED from lineitem (min unit
price per part×supplier — q2_min_cost_supplier), covering the
correlated-min-per-group shape; q11's value concentration runs on the
same synthesis (q11_important_parts), covering HAVING against a
global scalar subquery.

Scale notes (100 TB reading):
- every dimension side (part, supplier, nation, region, per-order /
  per-part aggregates bounded by dimension cardinality) is broadcast
  explicitly; lineitem/orders never shuffle except for their own
  aggregations;
- EXISTS / NOT EXISTS become leftsemi / leftanti hash joins on the
  equi key with the inequality as a residual condition — never a
  BroadcastNestedLoop;
- scalar subqueries (q15 max, q17/q22 thresholds) become a broadcast
  of a 1-row aggregate, not a driver-side collect;
- q21's double EXISTS collapses to ONE per-order aggregation
  (distinct-supplier and distinct-late-supplier counts) joined back —
  the set-based equivalent of the two correlated probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import conditional_decimal, decimal_sum
from ..operators.derive import revenue_expr
from ..sources.parquet import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _ts(lit: str):
    return F.expr(f"TIMESTAMP_NTZ '{lit} 00:00:00'")


def q4_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4 shape: EXISTS probe as a leftsemi join with a residual
    inequality (shipped >90 days after order date)."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 90 DAY")),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7: bidirectional nation-pair volume; both nation lookups are
    broadcasts, the pair filter prunes before aggregation."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate").cast("int"))
        .withColumn("volume", revenue_expr())
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(decimal_sum("volume", "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8: NATION_2's share of ASIA ECONOMY-part revenue per year —
    conditional aggregation over one joined scan."""
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1995-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    n1 = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk"))
    n2 = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("nation"))
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(r), F.col("crk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("snk"))
    )
    dec = "decimal(38,6)"
    vol = revenue_expr().cast(dec)
    target = conditional_decimal(F.col("nation") == "NATION_2", revenue_expr())
    return (
        joined.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum(vol).cast("double"), 6
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 shape without partsupp: revenue on name-matched parts by
    supplier nation and order year."""
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%ring%")).select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .withColumn("amount", revenue_expr())
        .groupBy("nation", "o_year")
        .agg(decimal_sum("amount", "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10: top-20 customers by returned-item revenue in a quarter."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    grouped = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rev", revenue_expr())
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(decimal_sum("rev", "revenue"))
    )
    return grouped.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20).select(
        "c_custkey", "c_name", "revenue", "c_acctbal", "n_name"
    )


def q13_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13: order-count distribution via a left outer join whose
    condition filters the RIGHT side (kept customers with 0 orders),
    then a second aggregation over the counts."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14: promo revenue percentage — conditional sum ratio, decimal
    sums divided in double (same rounding contract as money._davg)."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    dec = "decimal(38,6)"
    rev = revenue_expr()
    promo = conditional_decimal(F.col("p_type") == "PROMO", rev)
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev.cast(dec)).cast("double"),
            6,
        )
        .cast("double")
        .alias("promo_revenue")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15: scalar subquery on an aggregate — the per-supplier revenue
    view is computed once, its max broadcast back as a 1-row join
    (never collected to the driver)."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = (
        li.withColumn("rev", revenue_expr())
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(decimal_sum("rev", "total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 shape without partsupp: distinct suppliers per part group
    from lineitem, with the NOT IN subquery as a broadcast leftanti."""
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("bad_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17: correlated per-part average as a broadcast aggregate join.
    The threshold avg is decimal-sum/count (order-independent), the
    same formula the oracle uses, so the < comparison is exact."""
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    brand_li = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part_avg = (
        brand_li.groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg(
            (
                F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
                / F.count("l_quantity")
            ).alias("avg_qty")
        )
    )
    small = brand_li.join(
        F.broadcast(per_part_avg), F.col("l_partkey") == F.col("avg_partkey")
    ).where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double") / 7.0, 2
        )
        .cast("double")
        .alias("avg_yearly")
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18: HAVING on a fact aggregate, joined back as a leftsemi —
    the IN-subquery shape."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 250)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "leftsemi"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(decimal_sum("l_quantity", "sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19: three-branch OR over (brand, size, quantity) — the
    disjunction lives UNDER one broadcast join, so Catalyst pushes the
    common l_quantity bounds and part filter into the scans."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.where(branch).withColumn("rev", revenue_expr()).agg(
        decimal_sum("rev", "revenue")
    )


def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 shape without partsupp: suppliers whose 1996 shipped volume
    of PROMO parts beats a threshold — nested IN as agg + leftsemi."""
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    qualified = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 300)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(qualified), s.s_suppkey == F.col("l_suppkey"), "leftsemi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q21_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21: the EXISTS / NOT EXISTS pair collapses to one per-order
    aggregation — distinct suppliers and distinct LATE suppliers per
    order — joined back to the late rows.  A row survives iff its
    order has >1 supplier (EXISTS another) and exactly one late
    supplier (NOT EXISTS another late), which is then l1's own.
    Set-based twin of the correlated form; the oracle runs the
    correlated original."""
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "leftsemi"
    ).select("s_suppkey", "s_name")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lio = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late", F.expr("l_shipdate > o_orderdate + INTERVAL 60 DAY")
    )
    per_order = lio.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    waiting = (
        lio.where(F.col("is_late"))
        .join(per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)), "l_orderkey")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22: above-average-balance customers with no recent orders —
    scalar avg threshold (broadcast 1-row) + leftanti on orders.
    The avg is decimal-sum/count on both engines so the > compare
    cannot flip on FP summation order."""
    c = _t(spark, sf_dir, "customer")
    threshold = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
                / F.count("c_acctbal")
            ).alias("avg_bal")
        )
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= _ts("1999-01-01"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            decimal_sum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape (correlated min-per-group) on a SYNTHESIZED partsupp:
    the testdata has no partsupp table, so the part–supplier bridge is
    derived from lineitem — supplycost(part, supp) = the minimum unit
    price (l_extendedprice / l_quantity) that supplier ever charged for
    that part.  The q2 semantics are then exact: for each qualifying
    part, the EUROPE supplier(s) achieving the region-wide minimum
    supplycost, ordered by supplier balance.

    The correlated `supplycost = (SELECT MIN ... WHERE same part)`
    becomes a MIN window over p_partkey on the region-restricted bridge
    — one hash shuffle on the part key, no re-scan per row, no join
    back.  All dimension sides (part, supplier, nation⋈region) are
    broadcast; the bridge aggregation itself is the only full shuffle
    of fact-scale data, with map-side partial MIN.

    Determinism: (p_partkey, s_suppkey) is unique per output row, so
    the ORDER BY + LIMIT 100 cut is total and engine-independent.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    ps = (
        li.where(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"))
    )
    p = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_name")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", F.col("n_name").alias("nation"))
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE").select("r_regionkey")
    euro_n = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey", "nation")
    regional = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(euro_n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("p_partkey")
    return (
        regional.withColumn("min_cost", F.min("supplycost").over(w))
        .where(F.col("supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "nation",
            "p_partkey",
            "p_name",
            # raw double, no round: MIN of a double quotient is
            # bit-identical across engines; rounding would ADD a
            # rounding-mode dependency
            "supplycost",
        )
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
        .limit(100)
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 shape (HAVING vs a global scalar subquery): per-part revenue
    through NATION_3 suppliers, keeping parts above 2× the MEAN part
    value.  partsupp value is stood in by lineitem revenue, same
    synthesis rationale as q2_min_cost_supplier.

    TPC-H's fixed `0.0001/SF` fraction shrinks with scale because a
    fixed share of the total selects nothing once the part count grows
    (at sf0.1 the largest part here is 0.037% of the total — a fixed
    0.1% cut returns zero rows and the oracle check degenerates to
    empty-vs-empty).  A multiple-of-the-mean threshold is scale-free:
    `total / n_parts` tracks SF automatically, so the cut stays
    non-vacuous at every fixture size.

    The scalar (total, count) is a second aggregation OVER THE SAME
    grouped relation, broadcast back as a 1-row join — never collected,
    never recomputed from the fact table.  Threshold comparison happens
    in double on both engines after exact decimal sums, so the cut
    cannot flip on FP summation order.
    """
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3").select("n_nationkey")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    grouped = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(revenue_expr().cast("decimal(38,6)")).alias("__v"))
    )
    mean = grouped.agg(
        (F.sum("__v").cast("double") / F.count(F.lit(1))).alias("__mean")
    )
    return (
        grouped.crossJoin(F.broadcast(mean))
        .where(F.col("__v").cast("double") > F.lit(2.0) * F.col("__mean"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("__v", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12 shape: orders joined to late-shipped lines with a
    conditional-count split on priority class, grouped by a lineitem
    attribute (l_returnflag stands in for l_shipmode; "shipped > 60
    days after order" stands in for the commit/receipt lateness test —
    the testdata schema has neither shipmode nor those dates).

    Scale: the join shuffles both sides on the order key once; the
    CASE split is a map-side conditional aggregate, and the final
    groupBy has dimension cardinality (3 flags). No subqueries, no
    broadcast needed beyond AQE's own choice at small SF.

    Reference parity: the reference's conditional-count reporting shape
    (Project Plan7.md:23-36 query list) widened to TPC-H q12 semantics.
    """
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .select("l_orderkey", "l_returnflag", "l_shipdate")
    )
    joined = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAY")),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )
