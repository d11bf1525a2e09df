"""Golden-record survivorship — the step AFTER entity resolution: each
duplicate cluster collapses to one canonical record, per-field, under
an explicit precedence rule (the MDM "survivorship" contract; Talend/
Informatica ship this as a first-class stage, and Hernández-Stolfo's
merge/purge paper calls it the merge half).

Rule implemented: FRESHEST NON-NULL WINS per field — for every output
field take the value from the cluster member with the highest
precedence key AMONG MEMBERS WHERE THAT FIELD IS NON-NULL.  That is
one `max_by(field, CASE WHEN field IS NOT NULL THEN precedence END)`
per field: both Spark's max_by and DuckDB's arg_max skip rows whose
ordering argument is NULL, so the null-gating CASE is the whole
null-skipping semantics, replayed identically by the oracle (pinned
by a planted-null test).

Scale shape: ONE hash aggregation over (cluster) — no window, no
self-join; singletons (rows in no duplicate pair) pass through as
their own cluster via the caller's COALESCE(cluster, own id) spine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def golden_records(
    df: DataFrame,
    cluster_col: str,
    precedence_col: str,
    fields: Sequence[str],
) -> DataFrame:
    """One row per cluster: (cluster_col, n_members, golden_key, one
    golden_<field> per requested field).  golden_key is the highest
    precedence value in the cluster (the surviving record's id);
    golden_<field> follows freshest-non-null-wins."""
    if not fields:
        raise ValueError("fields must name at least one column")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.max(F.col(precedence_col)).alias("golden_key"),
    ]
    for f in fields:
        aggs.append(
            F.max_by(
                F.col(f),
                F.when(F.col(f).isNotNull(), F.col(precedence_col)),
            ).alias(f"golden_{f}")
        )
    return df.groupBy(cluster_col).agg(*aggs)
