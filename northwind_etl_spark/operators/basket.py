"""Market-basket affinity: co-occurrence pair counts and association
rules without a self-join.

The textbook co-purchase query self-joins the fact table on the order
key — at 100 TB that shuffles the fact table twice and materializes
every candidate pair as a join row.  Here each order is collapsed to
its sorted DISTINCT item array (ONE groupBy — the fact table crosses
the shuffle once, and every downstream statistic derives from that
baskets relation), pairs are expanded ARRAY-LOCALLY inside the row
(functions/arrays.py::sorted_pairs: a candidate pair that doesn't
exist never materializes anywhere), and the pair counts are one more
map-side-combined groupBy.  Cost per order is |basket|², bounded by
`max_basket` with the repo's no-silent-truncation contract: an
oversized basket RAISES in-plan (truncating it would silently
undercount supports).

Verified: tests/test_basket.py (planted baskets: pair counts, support
cut, duplicate-line dedup, rule confidence/lift, the max_basket
raise) and the oracle-checked `copurchase_part_pairs` /
`copurchase_rules` entries (oracle: the plain DISTINCT self-join +
HAVING they must equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import sorted_pairs


def _baskets(
    df: DataFrame, order_col: str, item_col: str, *, max_basket: int
) -> DataFrame:
    """(order, items, n) — sorted distinct item array per order, with
    the oversize guard fused into `n` (the expression every consumer
    uses, so Catalyst cannot prune it — the ranges.py in-plan-raise
    idiom; the cast gives when() a concrete branch type)."""
    baskets = df.groupBy(order_col).agg(
        F.array_sort(F.collect_set(item_col)).alias("items")
    )
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
    return baskets.withColumn("n", n)


def _pair_counts(baskets: DataFrame, *, min_support: int) -> DataFrame:
    pairs = sorted_pairs(F.col("items"), "item_a", "item_b")
    return (
        baskets.where(F.col("n") >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy("p.item_a", "p.item_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= min_support)
    )


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
    return _pair_counts(
        _baskets(df, order_col, item_col, max_basket=max_basket),
        min_support=min_support,
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
    by the oracle so the doubles hash-match.  Every statistic (pair
    counts, item supports, order total) derives from the ONE persisted
    baskets relation — the fact table is shuffled once, not three
    times (supports = explode + count over the basket arrays; the
    order total is a count of baskets, a 1-row broadcast).
    """
    from ..cache import persist_stage

    baskets = persist_stage(
        _baskets(df, order_col, item_col, max_basket=max_basket)
    )
    pairs = _pair_counts(baskets, min_support=min_support)
    supports = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("__s"))
    )
    totals = baskets.agg(F.count(F.lit(1)).alias("__n"))
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
        F.col("item").alias("antecedent"), F.col("__s").alias("__sa")
    )
    sc = supports.select(
        F.col("item").alias("consequent"), F.col("__s").alias("__sc")
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


def frequent_triples(
    df: DataFrame,
    order_col: str,
    item_col: str,
    *,
    min_support: int = 2,
    max_basket: int = 1000,
) -> DataFrame:
    """(item_a, item_b, item_c, n_orders) for every unordered item
    TRIPLE co-occurring in ≥ min_support orders — the level-3 Apriori
    step (Agrawal & Srikant 1994) on top of the pair machinery.

    Scale shape: the Apriori closure does the heavy lifting BEFORE any
    triple exists — an item in a qualifying triple must itself have
    support ≥ min_support, so baskets are first thinned to frequent
    items (explode + one hash-agg + shuffle-join back, no broadcast
    assumption on |L1|), and only the thinned, re-sorted arrays expand.
    Expansion is the two-step anchor-index/slice discipline extended to
    rank 3: explode i, explode j > i, then slice for c — no row ever
    holds the O(n³) triple array.  Thinning cannot change any
    qualifying triple's count (removed items only kill triples that
    could never qualify), so the output equals the definitional
    three-way self-join the oracle runs.  Cost per basket is
    C(|frequent items|, 3), bounded by the same max_basket raise as
    pairs — made a PLAN dependency (not a caching side effect) by
    exploding `slice(items, 1, n)` in the thinning path: the slice is
    ≡ items (n = size(items) when no raise fires) but forces the
    guarded `n` to evaluate for every basket even if persist_stage is
    removed and Catalyst prunes _baskets' other columns.
    """
    from ..cache import persist_stage

    baskets = persist_stage(
        _baskets(df, order_col, item_col, max_basket=max_basket)
    )
    guarded_items = F.slice("items", F.lit(1), F.col("n"))
    l1 = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("__s"))
        .where(F.col("__s") >= min_support)
        .select("item")
    )
    thinned = (
        baskets.select(F.col(order_col), F.explode(guarded_items).alias("item"))
        .join(l1, "item")
        .groupBy(order_col)
        .agg(F.array_sort(F.collect_list("item")).alias("items"))
        .withColumn("n", F.size("items"))
        .where(F.col("n") >= 3)
    )
    t1 = thinned.select(
        "items", "n",
        F.explode(F.sequence(F.lit(1), F.col("n") - 2)).alias("i"),
    )
    t2 = t1.select(
        "items", "n", "i",
        F.explode(F.sequence(F.col("i") + 1, F.col("n") - 1)).alias("j"),
    )
    triples = t2.select(
        F.element_at("items", F.col("i")).alias("item_a"),
        F.element_at("items", F.col("j")).alias("item_b"),
        F.explode(
            F.slice("items", F.col("j") + 1, F.col("n") - F.col("j"))
        ).alias("item_c"),
    )
    return (
        triples.groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= min_support)
    )
