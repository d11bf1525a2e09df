"""Hashing-trick features (operators/text.py::hashed_features): exact
replay against a pure-Python md5 reference, sign balance, and the
empty/validation contracts."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest

from northwind_etl_spark.operators.text import hashed_features


def _ref(rows, n_buckets):
    out = defaultdict(int)
    for doc_id, text in rows:
        tf = defaultdict(int)
        for t in text.split():
            tf[t] += 1
        for term, c in tf.items():
            d = hashlib.md5(term.encode()).hexdigest()
            bucket = int(d[:8], 16) % n_buckets
            sign = 1 if int(d[8], 16) % 2 == 0 else -1
            out[(doc_id, bucket)] += sign * c
    return {k: v for k, v in out.items() if True}


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta alpha gamma"),
        (2, "beta beta delta"),
        (3, "epsilon"),
        (4, ""),
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_python_reference(docs):
    rows, df = docs
    got = {
        (r["doc_id"], r["bucket"]): r["weight"]
        for r in hashed_features(df, n_buckets=16).collect()
    }
    assert got == _ref(rows, 16)


def test_signed_sum_invariant(docs):
    """Summing every bucket weight of a doc recovers the signed token
    sum regardless of collisions (linearity of the trick)."""
    rows, df = docs
    per_doc = defaultdict(int)
    for (d, _b), w in _ref(rows, 4).items():
        per_doc[d] += w
    got = defaultdict(int)
    for r in hashed_features(df, n_buckets=4).collect():
        got[r["doc_id"]] += r["weight"]
    assert dict(got) == {k: v for k, v in per_doc.items()}


def test_empty_doc_emits_nothing_and_validation(docs):
    _rows, df = docs
    assert (
        hashed_features(df, n_buckets=16)
        .where("doc_id = 4")
        .count()
        == 0
    )
    with pytest.raises(ValueError):
        hashed_features(df, n_buckets=1)
