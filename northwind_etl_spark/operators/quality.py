"""Data-quality guards: V1 arity check, V2 empty-input guard, and the
zero-null-key audit the reference runs manually.

Reference V1: ``if len(data_to_insert[0]) != 9: raise``
(``etl_orders.py:123-124``) → structural column assertion here.
Reference V2: ``if df.empty: return`` (``etl_category.py:38``) →
``df.isEmpty()`` (a cheap limit-1 job, not a full count).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assert_columns(df: DataFrame, expected: Sequence[str]) -> DataFrame:
    """V1 — schema arity/order check, statically against the plan."""
    if list(df.columns) != list(expected):
        raise ValueError(f"schema mismatch: {df.columns} != {list(expected)}")
    return df


def is_empty(df: DataFrame) -> bool:
    """V2 — empty-input guard; isEmpty scans at most one row."""
    return df.isEmpty()


def null_key_count(df: DataFrame, key: str) -> DataFrame:
    """Zero-null surrogate-key invariant (Project Plan6.md:158-159),
    as a 1-row DataFrame for oracle checking."""
    return df.agg(F.sum(F.col(key).isNull().cast("long")).alias("n_null_keys"))
