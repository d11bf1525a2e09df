"""Market-basket affinity: co-occurrence pair counts without a
self-join.

The textbook co-purchase query self-joins the fact table on the order
key — at 100 TB that shuffles the fact table twice and materializes
every candidate pair as a join row.  Here each order is collapsed to
its sorted DISTINCT item array (one groupBy — items cross the shuffle
once), pairs are expanded ARRAY-LOCALLY inside the row (the
dedup/ranges expansion idiom: a candidate pair that doesn't exist
never materializes anywhere), and the pair counts are one more
map-side-combined groupBy.  Cost per order is |basket|², bounded by
`max_basket` with the repo's no-silent-truncation contract: an
oversized basket RAISES in-plan (truncating it would silently
undercount supports).

Verified: tests/test_basket.py (planted baskets: pair counts, support
cut, duplicate-line dedup, ordering, the max_basket raise) and the
oracle-checked `copurchase_part_pairs` entry (oracle: the plain
DISTINCT self-join + HAVING it must equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_pairs(
    df: DataFrame,
    order_col: str,
    item_col: str,
    *,
    min_support: int = 2,
    max_basket: int = 1000,
) -> DataFrame:
    """(item_a, item_b, n_orders) for every unordered item pair that
    co-occurs in at least `min_support` orders (counted once per
    order, however many lines repeat the item)."""
    items = F.array_sort(F.collect_set(item_col)).alias("items")
    baskets = df.groupBy(order_col).agg(items)
    # The guard lives INSIDE n (the expression every downstream step
    # uses), so Catalyst cannot prune it — the ranges.py in-plan-raise
    # idiom; the cast gives when() a concrete branch type.
    n = F.when(
        F.size("items") > max_basket,
        F.raise_error(
            F.concat(
                F.lit(
                    f"basket exceeds max_basket={max_basket} for "
                    f"{order_col}="
                ),
                F.col(order_col).cast("string"),
            )
        ).cast("int"),
    ).otherwise(F.size("items"))
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.slice(F.col("items"), i + 1, n - i),
                lambda y: F.struct(
                    F.element_at(F.col("items"), i).alias("item_a"),
                    y.alias("item_b"),
                ),
            ),
        )
    )
    return (
        baskets.where(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy("p.item_a", "p.item_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= min_support)
    )


def association_rules(
    df: DataFrame,
    order_col: str,
    item_col: str,
    *,
    min_support: int = 2,
    max_basket: int = 1000,
) -> DataFrame:
    """Directional association rules from the co-occurrence pairs:
    (antecedent, consequent, pair_orders, confidence, lift).

    confidence = P(consequent | antecedent) = pair / s_antecedent;
    lift = confidence / P(consequent) = pair·N / (s_a·s_c) — computed
    with ONE integer product and ONE division each, mirrored exactly
    by the oracle so the doubles hash-match.  Item supports come from
    the same DISTINCT (order, item) relation that feeds the pairs
    (one extra map-side-combined count), joined back by item key; the
    order total is the 1-row broadcast scalar pattern.
    """
    distinct_oi = df.select(order_col, item_col).distinct()
    supports = distinct_oi.groupBy(item_col).agg(
        F.count(F.lit(1)).alias("__s")
    )
    totals = distinct_oi.select(order_col).distinct().agg(
        F.count(F.lit(1)).alias("__n")
    )
    pairs = copurchase_pairs(
        df, order_col, item_col,
        min_support=min_support, max_basket=max_basket,
    )
    # both rule directions from each unordered pair
    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "n_orders",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "n_orders",
        )
    )
    sa = supports.select(
        F.col(item_col).alias("antecedent"), F.col("__s").alias("__sa")
    )
    sc = supports.select(
        F.col(item_col).alias("consequent"), F.col("__s").alias("__sc")
    )
    return (
        directed.join(sa, "antecedent")
        .join(sc, "consequent")
        .join(F.broadcast(totals))
        .select(
            "antecedent",
            "consequent",
            F.col("n_orders").alias("pair_orders"),
            F.round(F.col("n_orders") / F.col("__sa"), 6).alias("confidence"),
            F.round(
                (F.col("n_orders") * F.col("__n"))
                / (F.col("__sa") * F.col("__sc")),
                6,
            ).alias("lift"),
        )
    )
