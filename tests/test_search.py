"""Keyword-retrieval proofs (operators/search.py): the two physical
shapes agree on planted data, the scan shape is genuinely shuffle-free,
and the inverted index caps hot-term postings without losing df."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.search import (
    build_term_index,
    keyword_search_grouped,
    keyword_search_scan,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "alpha beta"),
        (3, "beta gamma gamma"),
        (4, "alpha beta gamma beta alpha alpha"),
        (5, "delta"),
        (6, "  alpha   beta\tgamma  "),  # whitespace-run tokenization
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_scan_conjunction_and_ranking(docs):
    got = keyword_search_scan(docs, ["alpha", "beta", "gamma"], k=10).collect()
    # docs 1, 4, 6 contain all three; ranked by summed TF then doc_id
    assert [(r.doc_id, r.score) for r in got] == [(4, 6), (1, 4), (6, 3)]
    assert (got[0].tf_alpha, got[0].tf_beta, got[0].tf_gamma) == (3, 2, 1)


def test_shapes_agree(docs):
    scan = keyword_search_scan(docs, ["alpha", "beta"], k=10)
    grouped = keyword_search_grouped(docs, ["alpha", "beta"], k=10)
    assert [(r.doc_id, r.score) for r in scan.collect()] == [
        (r.doc_id, r.score) for r in grouped.collect()
    ]


def test_shapes_agree_on_corpus(spark, sf_dir):
    from northwind_etl_spark.sources.parquet import read_table

    corpus = read_table(spark, sf_dir, "documents")
    terms = ["merge", "vector"]
    scan = [(r.doc_id, r.score) for r in keyword_search_scan(corpus, terms, k=25).collect()]
    grouped = [
        (r.doc_id, r.score) for r in keyword_search_grouped(corpus, terms, k=25).collect()
    ]
    assert scan == grouped and len(scan) > 0


def test_scan_plan_is_shuffle_free(docs):
    q = keyword_search_scan(docs, ["alpha", "beta"], k=5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]
    assert "TakeOrderedAndProject" in plan


def test_empty_terms_rejected(docs):
    for fn in (keyword_search_scan, keyword_search_grouped):
        with pytest.raises(ValueError):
            fn(docs, [])


def test_index_df_exact_and_postings_capped(docs):
    idx = {r.term: r for r in build_term_index(docs, max_df=2).collect()}
    # df exact for every term (doc-level: array_distinct before explode)
    assert idx["alpha"].df == 4 and idx["beta"].df == 5 and idx["delta"].df == 1
    # hot terms (df > max_df) keep postings NULL; rare terms materialize sorted
    assert idx["alpha"].postings is None and idx["beta"].postings is None
    assert idx["gamma"].df == 4 and idx["gamma"].postings is None
    assert idx["delta"].postings == [5]
