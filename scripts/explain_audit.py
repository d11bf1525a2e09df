#!/usr/bin/env python
"""Regenerate the physical-plan audit data behind PLANS.md.

Usage: python scripts/explain_audit.py [query ...]
Prints the formatted plan for each named registry query (default: the
headline set) at $SPARK_GRAFT_SF_DIR — rerun after touching
plans/queries.py and diff against expectations (broadcasts present,
filters pushed, no stray Exchange).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from northwind_etl_spark.plans.queries import QUERIES  # noqa: E402
from northwind_etl_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "flagship_revenue_by_nation",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "star_fact_order_metrics",
    "minhash_near_dup_pairs",
    "knn_bruteforce_topk",
    "embedding_near_dup_pairs",
    "contamination_check",
    "fuzzy_name_match_pairs",
    # r06 scale-pattern batch
    "bloom_filtered_orders",
    "table_diff_summary",
    "kmv_distinct_users",
    "incremental_price_quantiles",
    "source_length_drift",
    "orders_expectations",
    # r06 late additions
    "boilerplate_cleaned_docs",
    "cms_term_counts",
    "per_source_doc_sample",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        print(f"{'=' * 20} {name} {'=' * 20}")
        print(buf.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
