"""SQL entry point — the reference's user-facing query surface.

Reference users typed T-SQL into SSMS (all of §2's A-queries,
``Project Plan7.md:23-36``); here the same experience is
``run_sql(spark, sf_dir, query)``: every test table plus the star-schema
outputs (Dim_Category, Dim_Part, Fact_OrderMetrics) are registered as
views and the query runs through Catalyst with the full optimizer
(predicate pushdown into the underlying parquet scans works through
the views).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .plans import star
from .sources.parquet import register_views

# A1, the reference's flagship analytical query (Project Plan7.md:23-36),
# transliterated to the test star schema — runnable verbatim via run_sql.
FLAGSHIP_SQL = """
SELECT DP.Brand,
       CAST(ROUND(SUM(CAST(FOM.ExtendedPrice AS DECIMAL(38,6))), 2) AS DOUBLE)
           AS TotalSalesRevenue
FROM Fact_OrderMetrics FOM
JOIN Dim_Part DP ON FOM.PartKey = DP.PartKey
GROUP BY DP.Brand
ORDER BY TotalSalesRevenue DESC, DP.Brand
"""


def register_star_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the source tables AND the star outputs as temp views."""
    register_views(spark, sf_dir)
    star.dim_category(spark, sf_dir).createOrReplaceTempView("Dim_Category")
    dim = star.dim_part(spark, sf_dir)
    dim.createOrReplaceTempView("Dim_Part")
    star.fact_order_metrics(spark, sf_dir, dim=dim).createOrReplaceTempView(
        "Fact_OrderMetrics"
    )


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """The SSMS replacement: arbitrary SQL over the registered schema."""
    register_star_views(spark, sf_dir)
    return spark.sql(query)
