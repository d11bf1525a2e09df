"""jaccard_threshold_pairs (operators/setjoin.py): the prefix filter
misses NOTHING — results equal the brute-force definition on random
corpora at several thresholds — and the boundary semantics hold."""

from __future__ import annotations

import random

import pytest

from northwind_etl_spark.operators.setjoin import jaccard_threshold_pairs


def brute_force(docs, num, den):
    out = {}
    sets = {i: set(t.split()) for i, t in docs if t.split()}
    ids = sorted(sets)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[ids[i]], sets[ids[j]]
            inter = len(a & b)
            uni = len(a | b)
            if inter * den >= num * uni:
                out[(ids[i], ids[j])] = (inter, uni)
    return out


def _run(spark, docs, num, den):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = jaccard_threshold_pairs(
        df, "text", "doc_id", threshold=(num, den)
    ).collect()
    return {(r.doc_a, r.doc_b): (r.inter, r.uni) for r in rows}


def _random_corpus(rng, n_docs, vocab, lo, hi):
    words = [f"w{k}" for k in range(vocab)]
    docs = []
    for i in range(n_docs):
        n = rng.randint(lo, hi)
        docs.append((i, " ".join(rng.sample(words, n))))
    return docs


def test_no_false_negatives_random_sweep(spark):
    rng = random.Random(5)
    docs = _random_corpus(rng, 60, 40, 5, 25)
    # seed guaranteed near-dups: clones with 1-2 words changed
    for i in range(10):
        base = docs[i][1].split()
        base[0] = "swapped"
        docs.append((1000 + i, " ".join(base)))
    for num, den in ((1, 2), (7, 10), (9, 10), (1, 1)):
        assert _run(spark, docs, num, den) == brute_force(docs, num, den)


def test_exact_duplicates_and_empty(spark):
    docs = [
        (1, "alpha beta gamma"),
        (2, "gamma beta alpha"),   # same set, different order -> J=1
        (3, "alpha beta gamma alpha"),  # duplicates collapse -> J=1
        (4, ""),                   # zero tokens: excluded entirely
        (5, "   "),                # whitespace only: excluded
        (6, "unrelated words here"),
    ]
    got = _run(spark, docs, 1, 1)
    assert got == {(1, 2): (3, 3), (1, 3): (3, 3), (2, 3): (3, 3)}


def test_threshold_boundary_inclusive(spark):
    # J exactly = threshold must be KEPT (>= contract): 3 shared of
    # 4 union = 0.75 with threshold 3/4
    docs = [(1, "a b c d"), (2, "a b c")]  # inter 3, uni 4
    got = _run(spark, docs, 3, 4)
    assert got == {(1, 2): (3, 4)}
    # and one epsilon above excludes it
    assert _run(spark, docs, 76, 100) == {}


def test_max_bucket_raises(spark):
    # every doc shares the single token -> one posting of size 40
    docs = [(i, "common") for i in range(40)]
    with pytest.raises(Exception, match="max_bucket"):
        jaccard_threshold_pairs(
            spark.createDataFrame(docs, ["doc_id", "text"]),
            "text",
            "doc_id",
            threshold=(1, 2),
            max_bucket=10,
        ).collect()
