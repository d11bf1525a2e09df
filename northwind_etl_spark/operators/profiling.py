"""Schema profiling at corpus scale: functional-dependency auditing
and histogram-based join-cardinality estimation — the statistics a
cost-based optimizer (or a data engineer about to shuffle 100 TB)
derives FROM the data before trusting the schema.

- `fd_audit` (the Metanome/TANE single-check primitive, Huhtala et
  al. 1999 reduced to the verification step): a candidate dependency
  lhs → rhs HOLDS iff every lhs group takes exactly one rhs value,
  i.e. count(distinct lhs) == count(distinct (lhs, rhs)) with NULL
  treated as a VALUE — via concatenated per-component md5 digests
  (injective up to hash collision; a raw separator/sentinel scheme
  collided when values contained the separator bytes — ADVICE r08),
  because bare SQL COUNT(DISTINCT a, b) drops any-NULL rows in Spark
  but keeps them inside DuckDB's row-struct form; the digest key makes
  both engines count the same thing.  One
  fused aggregation per candidate — the
  violation count (n_pairs − n_lhs) quantifies HOW broken a failed
  dependency is, which matters more than the boolean at cleaning
  time.

- `join_size_estimate` (the System-R / Selinger 1979 formula applied
  per equi-depth-ish bucket): split both join keys into B md5 hash
  buckets (hash buckets align across relations by construction — the
  property range buckets need co-sorting for), estimate each bucket's
  join output as n1·n2 DIV max(d1, d2) (the containment-of-value-sets
  assumption), sum — then JOIN THE RELATIONS and report the actual
  count next to the estimate.  Exact integer arithmetic end to end;
  the est/actual ratio is the calibration signal an AQE-less planner
  would act on.

Both are one-or-two hash aggregations, |buckets|- or
|candidates|-bounded after the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fd_audit(
    df: DataFrame, candidates: list[tuple[str, str]]
) -> DataFrame:
    """One row per candidate (lhs_col, rhs_col): (lhs, rhs, n_lhs,
    n_pairs, violations, holds).  Candidates audit in one pass each
    (two distinct counts fused into a single aggregation)."""
    if not candidates:
        raise ValueError("candidates must name at least one (lhs, rhs) pair")

    def _key(*cols: str) -> F.Column:
        # Per-component md5 digests, THEN concat (ADVICE r08): a raw
        # separator/sentinel scheme collides when values themselves
        # contain the separator or sentinel bytes ('a\x1fb' + NULL vs
        # 'a' + 'b\x1f\x00'), understating violations.  Fixed-width
        # digests make the concatenation injective (up to md5
        # collision); the 'v'/'n' prefix keeps NULL distinct from the
        # literal string 'n'.
        return F.concat(
            *[
                F.md5(
                    F.coalesce(
                        F.concat(F.lit("v"), F.col(c).cast("string")),
                        F.lit("n"),
                    )
                )
                for c in cols
            ]
        )

    outs = []
    for lhs, rhs in candidates:
        agg = df.agg(
            F.count_distinct(_key(lhs)).alias("n_lhs"),
            F.count_distinct(_key(lhs, rhs)).alias("n_pairs"),
        )
        outs.append(
            agg.select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.col("n_lhs").cast("long").alias("n_lhs"),
                F.col("n_pairs").cast("long").alias("n_pairs"),
                (F.col("n_pairs") - F.col("n_lhs"))
                .cast("long")
                .alias("violations"),
                (F.col("n_pairs") == F.col("n_lhs")).alias("holds"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def _bucket(col: F.Column, buckets: int) -> F.Column:
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    ).cast("int")


def join_size_estimate(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    *,
    buckets: int = 64,
) -> DataFrame:
    """One row: (buckets, est_rows, actual_rows, n_left, n_right).
    est_rows = Σ_b n1_b·n2_b DIV max(d1_b, d2_b, 1) over md5 hash
    buckets — the per-bucket Selinger containment estimate; actual
    from the real join's count aggregate.  NULL keys join nothing and
    are excluded from both sides (equi-join semantics)."""
    lk, rk = F.col(left_key), F.col(right_key)
    lstats = (
        left.where(lk.isNotNull())
        .groupBy(_bucket(lk, buckets).alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.count_distinct(lk).alias("d1"),
        )
    )
    rstats = (
        right.where(rk.isNotNull())
        .groupBy(_bucket(rk, buckets).alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n2"),
            F.count_distinct(rk).alias("d2"),
        )
    )
    per_bucket = lstats.join(rstats, "b")
    est = per_bucket.agg(
        F.sum(
            F.expr("(n1 * n2) DIV greatest(d1, d2, 1L)")
        ).cast("long").alias("est_rows"),
    )
    # rename before joining: identically-named key columns (k vs k)
    # would make the join condition ambiguous
    lkeys = left.where(lk.isNotNull()).select(lk.alias("__lk"))
    rkeys = right.where(rk.isNotNull()).select(rk.alias("__rk"))
    actual = lkeys.join(
        rkeys, F.col("__lk") == F.col("__rk")
    ).agg(F.count(F.lit(1)).cast("long").alias("actual_rows"))
    sizes = left.agg(
        F.count(F.lit(1)).cast("long").alias("n_left")
    ).join(
        F.broadcast(
            right.agg(F.count(F.lit(1)).cast("long").alias("n_right"))
        )
    )
    return (
        est.join(F.broadcast(actual))
        .join(F.broadcast(sizes))
        .select(
            F.lit(buckets).cast("int").alias("buckets"),
            "est_rows",
            "actual_rows",
            "n_left",
            "n_right",
        )
    )
