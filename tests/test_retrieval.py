"""Ranked retrieval (operators/retrieval.py): BM25-shaped scoring
semantics on planted corpora and reciprocal-rank fusion behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.retrieval import bm25_topk, rrf_fuse


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_bm25_more_matching_terms_score_higher(spark):
    docs = _docs(
        spark,
        [
            (1, "spark merge join"),
            (2, "spark merge merge vector"),
            (3, "filler filler filler"),
        ],
    )
    out = {r.doc_id: r for r in bm25_topk(docs, ["merge", "vector"]).collect()}
    assert 3 not in out  # no match, no row
    assert out[2].score > out[1].score  # extra term + extra tf


def test_bm25_length_normalization(spark):
    """Same tf, longer doc → lower score (the b·dl/avgdl penalty)."""
    docs = _docs(
        spark,
        [
            (1, "merge alpha beta"),
            (2, "merge " + " ".join(f"w{i}" for i in range(40))),
        ],
    )
    out = {r.doc_id: r for r in bm25_topk(docs, ["merge"]).collect()}
    assert out[1].score > out[2].score


def test_bm25_rare_term_outweighs_common(spark):
    """idf: a term present in 1 of 5 docs outweighs one in 4 of 5 at
    equal tf and equal length."""
    docs = _docs(
        spark,
        [
            (1, "common rare aa"),
            (2, "common xx bb"),
            (3, "common yy cc"),
            (4, "common zz dd"),
            (5, "filler qq ee"),
        ],
    )
    out = {r.doc_id: r for r in bm25_topk(docs, ["common", "rare"]).collect()}
    # doc 1 has both; its rare-term contribution dominates any
    # common-only doc's total
    assert out[1].score > max(out[d].score for d in (2, 3, 4))


def test_bm25_tf_saturation(spark):
    """Okapi's tf curve saturates: tf 1→2 must gain MORE than tf 9→10
    (diminishing returns, unlike raw tf scoring)."""
    docs = _docs(
        spark,
        [
            (1, "merge " + "x " * 9),
            (2, "merge merge " + "x " * 8),
            (9, "merge " * 9 + "x "),
            (10, "merge " * 10),
        ],
    )
    out = {r.doc_id: r.score for r in bm25_topk(docs, ["merge"], k=10).collect()}
    assert (out[2] - out[1]) > (out[10] - out[9]) > 0


def test_bm25_empty_terms_raise(spark):
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark, [(1, "a")]), [])


def test_rrf_both_lists_beat_one(spark):
    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id LONG, rank INT"
    )
    b = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id LONG, rank INT"
    )
    out = {r.doc_id: r for r in rrf_fuse(a, b).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 2 appears in both lists -> highest fused score
    assert out[2].rrf_score == max(r.rrf_score for r in out.values())
    # exact arithmetic: 1/(60+2) + 1/(60+1)
    assert out[2].rrf_score == 1.0 / 62.0 + 1.0 / 61.0
    assert out[4].rank_a is None and out[4].rrf_score == 1.0 / 62.0


def test_rrf_rank_monotone_within_one_list(spark):
    a = spark.createDataFrame(
        [(i, i) for i in range(1, 6)], "doc_id LONG, rank INT"
    )
    b = spark.createDataFrame([], "doc_id LONG, rank INT")
    rows = rrf_fuse(a, b).collect()
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_plan_shape_scan_bound(spark, sf_dir):
    """The PLANS.md claim, pinned: TakeOrderedAndProject top-k, the
    corpus stats attached by a 1-row broadcast (BNLJ), and NO wide
    exchange other than the stats reduction — the ad-hoc query never
    shuffles the corpus on a key."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        bm25_topk(docs, ["merge", "vector"], k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # the only exchanges: the 1-row stats SinglePartition reduction +
    # its broadcast — no hash-partitioned corpus shuffle
    assert "hashpartitioning" not in plan.lower()
