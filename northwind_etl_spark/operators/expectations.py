"""Declarative data-quality expectations — the generalized form of the
reference's verification queries (row counts, null-key audits,
select-star eyeballing; ``Project Plan6.md:154-163``) and of its V1/V2
load guards.

A rule set compiles into the MINIMUM number of passes over the data:

- all ROW-LOCAL rules (not-null, in-set, in-range, regex, custom
  predicate) fold into ONE aggregation — one scan, one 1-row result,
  unpivoted to (rule, n_violations);
- each KEYED rule (unique) adds one map-side-combined aggregation on
  its key;
- each RELATIONAL rule (foreign-key) adds one join, broadcast when the
  dimension side is small.

At 100 TB this is the difference between "a checklist of 12 rules = 12
table scans" and "12 rules = 1 scan + the two keyed/relational passes
the semantics force".  The report is a DataFrame, so it composes (gate
a load on ``report.where(n_violations > 0)`` being empty) instead of
collecting.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowRule:
    """A rule violated row-by-row: `pred` marks VIOLATING rows."""

    name: str
    pred: Column


def not_null(col: str) -> RowRule:
    return RowRule(f"not_null({col})", F.col(col).isNull())


def in_set(col: str, values: list) -> RowRule:
    # NULL is not a set-membership violation — pair with not_null
    return RowRule(
        f"in_set({col})", F.col(col).isNotNull() & ~F.col(col).isin(values)
    )


def in_range(col: str, lo, hi) -> RowRule:
    return RowRule(
        f"in_range({col})",
        F.col(col).isNotNull() & ~F.col(col).between(lo, hi),
    )


def matches(col: str, regex: str) -> RowRule:
    return RowRule(
        f"matches({col})", F.col(col).isNotNull() & ~F.col(col).rlike(regex)
    )


def violates(name: str, pred: Column) -> RowRule:
    """Escape hatch: any boolean Column marking violating rows."""
    return RowRule(name, pred)


def _row_rule_report(df: DataFrame, rules: list[RowRule]) -> DataFrame:
    aggs = [
        F.sum(F.when(r.pred, 1).otherwise(0)).cast("long").alias(f"v{i}")
        for i, r in enumerate(rules)
    ]
    wide = df.agg(*aggs)  # ONE pass for every row-local rule
    stack = ", ".join(
        f"'{r.name.replace(chr(39), '')}', v{i}" for i, r in enumerate(rules)
    )
    return wide.selectExpr(
        f"stack({len(rules)}, {stack}) as (rule, n_violations)"
    )


def unique_rule(df: DataFrame, cols: list[str]) -> DataFrame:
    """n_violations = rows beyond the first per duplicated key."""
    name = f"unique({','.join(cols)})"
    dupes = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > 1)
        .agg(F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)).cast("long").alias("n"))
    )
    return dupes.select(F.lit(name).alias("rule"), F.col("n").alias("n_violations"))


def foreign_key_rule(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """n_violations = rows whose non-null key has no dimension match
    (the reference's C1 anti-join audit, as an expectation)."""
    name = f"foreign_key({col})"
    orphans = (
        df.where(F.col(col).isNotNull())
        .join(
            F.broadcast(dim.select(F.col(dim_col).alias("__dk")).distinct()),
            on=F.col(col) == F.col("__dk"),
            how="left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return orphans.select(
        F.lit(name).alias("rule"), F.col("n").alias("n_violations")
    )


def expectation_report(
    df: DataFrame,
    row_rules: list[RowRule] | None = None,
    extra: list[DataFrame] | None = None,
) -> DataFrame:
    """Union the compiled rule reports into one (rule, n_violations)
    DataFrame, ordered by rule name.  `extra` takes pre-built keyed /
    relational rule reports (unique_rule, foreign_key_rule, or any
    1-row (rule, n_violations) DataFrame)."""
    parts: list[DataFrame] = []
    if row_rules:
        parts.append(_row_rule_report(df, row_rules))
    parts.extend(extra or [])
    if not parts:
        raise ValueError("no rules given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("rule")
