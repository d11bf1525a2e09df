"""Basket-affinity proofs (operators/basket.py): planted baskets give
exact pair counts, duplicate lines dedup per order, the support cut
applies, singleton baskets vanish, and oversized baskets raise
in-plan rather than truncate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.basket import copurchase_pairs

from northwind_etl_spark.operators.sessionize import event_transitions


@pytest.fixture(scope="module")
def lines(spark):
    rows = [
        # order 1: {10, 20, 30}; order 2: {10, 20}; order 3: {10, 20}
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 20), (3, 10), (3, 10),  # duplicate line: still ONE co-occurrence
        (4, 99),                     # singleton: no pairs
    ]
    return spark.createDataFrame(rows, ["o", "p"])


def test_pair_counts_and_support(lines):
    got = {
        (r.item_a, r.item_b): r.n_orders
        for r in copurchase_pairs(lines, "o", "p", min_support=1).collect()
    }
    assert got == {(10, 20): 3, (10, 30): 1, (20, 30): 1}
    cut = {
        (r.item_a, r.item_b): r.n_orders
        for r in copurchase_pairs(lines, "o", "p", min_support=2).collect()
    }
    assert cut == {(10, 20): 3}


def test_max_basket_raises(spark):
    rows = [(1, i) for i in range(12)]
    df = spark.createDataFrame(rows, ["o", "p"])
    with pytest.raises(Exception, match="max_basket"):
        copurchase_pairs(df, "o", "p", max_basket=10).collect()
    # at the limit it still works
    assert copurchase_pairs(df, "o", "p", min_support=1, max_basket=12).count() == 66


def test_transitions_planted(spark):
    rows = [
        (1, 1, "a", 100), (1, 2, "b", 200), (1, 3, "a", 300), (1, 4, "c", 400),
        (2, 5, "a", 100), (2, 6, "b", 150),
        (3, 7, "c", 50),  # single event: no transition
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "event_type", "ts"]
    )
    got = {
        (r.from_type, r.to_type): (r.cnt, r.prob)
        for r in event_transitions(df).collect()
    }
    # from 'a': a→b twice (u1, u2), a→c once → 2/3 and 1/3; from 'b':
    # b→a once → 1.0.  No cross-user transition (u1's c is terminal).
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
    }


def test_transitions_tie_deterministic(spark):
    # two events with the SAME ts: the event_id tiebreak pins the order
    rows = [(1, 2, "y", 100), (1, 1, "x", 100), (1, 3, "z", 200)]
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "event_type", "ts"]
    )
    got = {(r.from_type, r.to_type) for r in event_transitions(df).collect()}
    assert got == {("x", "y"), ("y", "z")}


def test_association_rules_planted(spark):
    from northwind_etl_spark.operators.basket import association_rules

    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 20), (3, 10), (3, 10),
        (4, 99),
    ]
    df = spark.createDataFrame(rows, ["o", "p"])
    got = {
        (r.antecedent, r.consequent): (r.pair_orders, r.confidence, r.lift)
        for r in association_rules(df, "o", "p", min_support=2).collect()
    }
    # s(10)=3, s(20)=3, N=4; pair(10,20)=3
    # conf(10→20) = 3/3 = 1.0; lift = 3*4/(3*3) = 1.333333
    assert got == {
        (10, 20): (3, 1.0, round(12 / 9, 6)),
        (20, 10): (3, 1.0, round(12 / 9, 6)),
    }


def test_source_entropy_planted(spark):
    import math

    from northwind_etl_spark.operators.text import source_term_entropy

    docs = spark.createDataFrame(
        [
            (1, "x x x x", "uniform0"),   # one term → H = 0
            (2, "a b", "twoterm"),        # uniform over 2 → H = ln 2
            (3, "a a a b", "skewed"),     # p = (3/4, 1/4)
        ],
        ["doc_id", "text", "source"],
    )
    got = {r.source: r for r in source_term_entropy(docs).collect()}
    assert got["uniform0"].entropy == 0.0
    assert got["uniform0"].vocab == 1 and got["uniform0"].n_tokens == 4
    assert got["twoterm"].entropy == round(math.log(2), 6)
    want = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert abs(got["skewed"].entropy - round(want, 6)) <= 1e-6


def test_frequent_triples_planted(spark):
    from northwind_etl_spark.operators.basket import frequent_triples

    rows = [
        # triple (1,2,3) in orders 10, 11; item 9 infrequent (1 order)
        (10, 1), (10, 2), (10, 3), (10, 9),
        (11, 1), (11, 2), (11, 3),
        (12, 1), (12, 2),          # pair only — no triple
        (13, 4),                   # singleton
    ]
    df = spark.createDataFrame(rows, "o long, i long")
    out = frequent_triples(df, "o", "i", min_support=2).collect()
    assert [(r.item_a, r.item_b, r.item_c, r.n_orders) for r in out] == [
        (1, 2, 3, 2)
    ]


def test_frequent_triples_thinning_keeps_counts(spark):
    """Apriori thinning must not change surviving triples' counts even
    when an infrequent item sits INSIDE an order that carries a
    qualifying triple (regression for off-by-slice bugs)."""
    from northwind_etl_spark.operators.basket import frequent_triples

    rows = [
        (1, 5), (1, 1), (1, 2), (1, 3),   # 5 sorts FIRST pre-thinning
        (2, 1), (2, 2), (2, 3), (2, 7),   # 7 sorts last
        (3, 1), (3, 2), (3, 3),
    ]
    df = spark.createDataFrame(rows, "o long, i long")
    out = frequent_triples(df, "o", "i", min_support=3).collect()
    assert [(r.item_a, r.item_b, r.item_c, r.n_orders) for r in out] == [
        (1, 2, 3, 3)
    ]


def test_frequent_triples_duplicate_lines_count_once(spark):
    from northwind_etl_spark.operators.basket import frequent_triples

    rows = [(1, 1), (1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 3)]
    df = spark.createDataFrame(rows, "o long, i long")
    out = frequent_triples(df, "o", "i", min_support=2).collect()
    assert [(r.item_a, r.item_b, r.item_c, r.n_orders) for r in out] == [
        (1, 2, 3, 2)
    ]
