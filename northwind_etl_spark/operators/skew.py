"""Key-distribution skew profiling — the diagnostic this repo's own
scale rules keep invoking ("skewed keys hurt", salting, AQE skew
joins) turned into a first-class operator: BEFORE shuffling 100 TB on
a key, measure how hot that key actually is.

`key_skew_profile` reduces a keyed relation to one row of
shuffle-planning facts:

- n_keys, n_rows, max_count, max_share — is there a single killer key?
- top10_share — would broadcasting the 10 hottest keys' rows (the
  classic skew-join split) fix it?
- gini — the Gini coefficient of the per-key count distribution
  (0 = perfectly even, →1 = one key owns everything), the standard
  one-number inequality summary.

Exactness discipline: per-key counts are exact integers; the Gini is
computed from the exact identity
    G = (2·Σᵢ i·xᵢ − (n+1)·Σᵢ xᵢ) / (n·Σᵢ xᵢ)
over counts sorted ascending with rank i (1-based, ties broken by
key so the rank is a total order — any tie order yields the same sum
because tied x's are equal), with Σ i·xᵢ an exact BIGINT/DECIMAL and
ONE correctly-rounded double division at the end — hash-exact on any
engine.  The ranking uses the distributed global ranking machinery
(operators/ranking.py::global_row_number: range partition + local
row_number + offset broadcast), so no single task ever sorts the
whole key table; everything after the counts aggregation is bounded
by |keys|, not |rows|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """One row: (n_keys, n_rows, max_count, max_share, top10_share,
    gini) for the distribution of rows over `key_col` (NULL keys
    count as a key of their own — they hash to one partition like any
    other value, which is exactly why a profiler must see them)."""
    from ..cache import persist_stage
    from .ranking import global_row_number

    counts = persist_stage(
        df.groupBy(F.col(key_col).alias("__k")).agg(
            F.count(F.lit(1)).alias("__c")
        )
    )
    ranked = global_row_number(
        counts, [F.col("__c"), F.col("__k")], rank_col="__i"
    )
    dec = "decimal(38,0)"
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("__c").cast("long").alias("n_rows"),
        F.max("__c").cast("long").alias("max_count"),
        F.sum((F.col("__i").cast(dec) * F.col("__c").cast(dec))).alias(
            "__ix"
        ),
    )
    # top-10 hottest = global ranks n_keys-9 .. n_keys (ascending sort)
    top10 = (
        ranked.join(F.broadcast(agg.select("n_keys")))
        .where(F.col("__i") > F.col("n_keys") - 10)
        .agg(F.sum("__c").cast("long").alias("__top10"))
    )
    out = agg.join(F.broadcast(top10))
    n = F.col("n_keys").cast(dec)
    tot = F.col("n_rows").cast(dec)
    gini_num = (
        F.lit(2).cast(dec) * F.col("__ix")
        - (n + F.lit(1).cast(dec)) * tot
    ).cast("double")
    gini_den = (n.cast("double")) * (tot.cast("double"))
    return out.select(
        "n_keys",
        "n_rows",
        "max_count",
        (F.col("max_count").cast("double") / F.col("n_rows").cast("double"))
        .alias("max_share"),
        (F.col("__top10").cast("double") / F.col("n_rows").cast("double"))
        .alias("top10_share"),
        (gini_num / gini_den).alias("gini"),
    )
