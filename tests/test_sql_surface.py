"""The raw-SQL surface (sql.py): ad-hoc queries over registered views,
with optimizer behavior intact through the view layer."""

from __future__ import annotations

from northwind_etl_spark.catalog import list_registered_tables
from northwind_etl_spark.sql import register_star_views, run_sql


def test_adhoc_sql_over_views(spark, sf_dir):
    out = run_sql(
        spark,
        sf_dir,
        """
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_customers DESC LIMIT 5
        """,
    )
    rows = out.collect()
    assert len(rows) == 5 and rows[0].n_customers >= rows[-1].n_customers


def test_filter_pushes_through_view(spark, sf_dir):
    df = run_sql(
        spark, sf_dir, "SELECT l_orderkey FROM lineitem WHERE l_quantity < 5"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan


def test_q1_pushes_shipdate_predicate_to_scan(spark, sf_dir):
    """PLANS.md claim, locked: q1's shipdate bound must reach the
    parquet scan (row-group pruning; partition pruning at scale)."""
    from northwind_etl_spark.plans.queries import q1_pricing_summary

    plan = (
        q1_pricing_summary(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_flagship_prunes_lineitem_columns(spark, sf_dir):
    """PLANS.md claim, locked: the flagship reads only the lineitem
    columns it needs — measure columns and join key, never the rest."""
    from northwind_etl_spark.plans.queries import flagship_revenue_by_nation

    plan = (
        flagship_revenue_by_nation(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    li_schemas = [s for s in read_schemas if "l_extendedprice" in s]
    assert li_schemas, plan
    for s in li_schemas:
        cols = {c.split(":")[0] for c in s.split(",")}
        assert cols == {"l_orderkey", "l_extendedprice", "l_discount"}, cols


def test_star_views_and_catalog_listing(spark, sf_dir):
    register_star_views(spark, sf_dir)
    listed = {r.name for r in list_registered_tables(spark).collect()}
    for view in ("lineitem", "dim_part", "fact_ordermetrics", "dim_category"):
        assert view in {n.lower() for n in listed}, (view, listed)
    fact = spark.table("Fact_OrderMetrics")
    li = spark.table("lineitem")
    assert fact.count() == li.count()
