"""Join family: inner equi-join (J1), broadcast dimension lookup (J2),
anti-join audits (A4 generalized).

Reference J1: fact extraction joins ``[Order Details] ⋈ Orders`` inside
SQL Server (``etl_orders.py:22-23``).  Here it is a Spark join over two
scans — AQE picks sort-merge vs broadcast at runtime from actual sizes.

Reference J2: the surrogate-key lookup pulls the whole dim map into
pandas and left-merges (``etl_orders.py:57-63``) — a single-node
broadcast join in disguise.  We make it an explicit ``F.broadcast``
hash join: at 100 TB the fact side streams through executors while the
(by-definition small) dim ships once per executor; no shuffle of the
fact table at all.

Reference A4: the null-key audit ``WHERE ProductKey IS NULL``
(``Project Plan6.md:159``) generalizes to a left-anti join — the
referential-integrity check that replaces enforced FK constraints
(``Project Plan4.md``'s abandoned constraint toggling, C1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inner_join(left: DataFrame, right: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J1 — inner equi-join; strategy left to Catalyst/AQE."""
    return left.join(right, on=on, how="inner")


def broadcast_lookup(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    carry: Sequence[str],
    drop_dim_key: bool = True,
) -> DataFrame:
    """J2 — left broadcast lookup attaching `carry` columns from dim.

    Left join preserves fact cardinality (the reference's row-count
    conservation invariant, Project Plan7.md:6: all 2,155 rows survive);
    misses surface as NULLs for the A4 audit to find.
    """
    dim_slim = dim.select(dim_key, *carry)
    joined = fact.join(
        F.broadcast(dim_slim), on=fact[fact_key] == dim_slim[dim_key], how="left"
    )
    if drop_dim_key and dim_key != fact_key:
        joined = joined.drop(dim_slim[dim_key])
    return joined


def anti_join_audit(fact: DataFrame, dim: DataFrame, *, fact_key: str, dim_key: str) -> DataFrame:
    """A4 — rows in fact with no match in dim; MUST be empty after a
    correct load (Project Plan6.md:158-159 'Should return 0 rows')."""
    dim_keys = dim.select(F.col(dim_key).alias("__dim_key"))
    return fact.join(
        F.broadcast(dim_keys), on=fact[fact_key] == F.col("__dim_key"), how="left_anti"
    )


def semi_join(left: DataFrame, right: DataFrame, *, left_key: str, right_key: str) -> DataFrame:
    """Existence filter — the positive twin of the A4 audit."""
    right_keys = right.select(F.col(right_key).alias("__sj_key"))
    return left.join(right_keys, on=left[left_key] == F.col("__sj_key"), how="left_semi")
