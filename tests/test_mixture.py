"""Deterministic data-mixing sample (operators/sampling.py::
mixture_sample): exact integer ratios, tight feasibility, exclusion /
impossible-mix semantics, and two-phase == single-window equality."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from northwind_etl_spark.operators.sampling import mixture_sample


@pytest.fixture(scope="module")
def corpus(spark):
    rows = (
        [(i, "A") for i in range(10)]
        + [(100 + i, "B") for i in range(5)]
        + [(200 + i, "C") for i in range(3)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_exact_ratio_and_tightness(corpus):
    # m = min(10 DIV 2, 5 DIV 1) = 5 -> A:10, B:5; C excluded
    got = mixture_sample(corpus, "source", "doc_id", shares={"A": 2, "B": 1})
    sizes = {r["source"]: r["n"] for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"A": 10, "B": 5}


def test_binding_source_limits_units(corpus):
    # shares A:1, B:2 -> m = min(10, 5 DIV 2 = 2) = 2 -> A:2, B:4
    got = mixture_sample(corpus, "source", "doc_id", shares={"A": 1, "B": 2})
    sizes = {r["source"]: r["n"] for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"A": 2, "B": 4}


def test_missing_weighted_source_forces_empty(corpus):
    got = mixture_sample(corpus, "source", "doc_id", shares={"A": 1, "Z": 1})
    assert got.count() == 0


def test_two_phase_equals_single_window(corpus):
    two = mixture_sample(
        corpus, "source", "doc_id", shares={"A": 3, "B": 1}, salt_buckets=4
    )
    # naive single-window reference with the same quota arithmetic
    # (m = min(10 DIV 3, 5 DIV 1) = 3 -> A:9, B:3)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    k = {"A": 9, "B": 3}
    naive = (
        corpus.where(F.col("source").isin(*k))
        .withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .where(
            F.col("sample_rank")
            <= F.when(F.col("source") == "A", 9).otherwise(3)
        )
        .select("doc_id", "source", "sample_rank")
    )
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, naive.collect()))


def test_partitioning_invariance(corpus):
    a = sorted(map(tuple, mixture_sample(corpus, "source", "doc_id", shares={"A": 2, "B": 1}).collect()))
    b = sorted(map(tuple, mixture_sample(corpus.repartition(7), "source", "doc_id", shares={"A": 2, "B": 1}).collect()))
    assert a == b


def test_validation(corpus):
    with pytest.raises(ValueError):
        mixture_sample(corpus, "source", "doc_id", shares={})
    with pytest.raises(ValueError):
        mixture_sample(corpus, "source", "doc_id", shares={"A": 0})


# --- token-budget variant --------------------------------------------

@pytest.fixture(scope="module")
def weighted_corpus(spark):
    rows = (
        [(i, "A", 10) for i in range(10)]      # W_A = 100
        + [(100 + i, "B", 7) for i in range(5)]  # W_B = 35
    )
    return spark.createDataFrame(rows, "doc_id long, source string, tok long")


def test_budget_ratio_and_cutoff(weighted_corpus):
    from northwind_etl_spark.operators.sampling import mixture_sample_by_budget

    # shares A:2, B:1 -> m = min(100 DIV 2, 35 DIV 1) = 35 -> k_A=70, k_B=35
    got = mixture_sample_by_budget(
        weighted_corpus, "source", "doc_id", "tok", shares={"A": 2, "B": 1}
    )
    rows = got.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    # greedy prefix: A keeps 7 docs (70 tokens), B all 5 (35 tokens)
    assert sum(r["weight"] for r in by_src["A"]) == 70
    assert sum(r["weight"] for r in by_src["B"]) == 35
    assert len(by_src["A"]) == 7 and len(by_src["B"]) == 5
    # cum_weight never exceeds the budget
    assert max(r["cum_weight"] for r in by_src["A"]) <= 70


def test_budget_null_weights_are_free(spark):
    from northwind_etl_spark.operators.sampling import mixture_sample_by_budget

    df = spark.createDataFrame(
        [(1, "A", None), (2, "A", 4)], "doc_id long, source string, tok long"
    )
    rows = mixture_sample_by_budget(
        df, "source", "doc_id", "tok", shares={"A": 1}
    ).collect()
    # m = 4 DIV 1 = 4; both docs fit (NULL counts as 0)
    assert {r["doc_id"] for r in rows} == {1, 2}


def test_budget_validation(weighted_corpus):
    from northwind_etl_spark.operators.sampling import mixture_sample_by_budget

    with pytest.raises(ValueError):
        mixture_sample_by_budget(
            weighted_corpus, "source", "doc_id", "tok", shares={}
        )
