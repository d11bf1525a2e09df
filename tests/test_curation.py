"""Unit tests for operators/curation.py (DSIR importance weights,
greedy max-coverage selection) and the r09 sampling additions
(Efraimidis–Spirakis weighted reservoir, Neyman allocation).
Cross-engine value-exactness is pinned by the registry oracles
(test_oracle_parity); these tests pin the operator SEMANTICS on
planted fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.curation import (
    dsir_importance_weights,
    greedy_coverage_select,
)
from northwind_etl_spark.operators.sampling import (
    neyman_allocation,
    weighted_reservoir,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


# ------------------------------------------------------------- DSIR


def test_dsir_targetlike_docs_outscore(spark):
    # target distribution is pure "alpha"; a doc of alphas must get a
    # strictly higher log-weight than a doc of "omega"s never seen in
    # the target.
    raw = _docs(
        spark,
        [
            (1, "alpha alpha alpha alpha"),
            (2, "omega omega omega omega"),
            (3, "alpha omega"),
        ],
    )
    target = _docs(spark, [(10, "alpha alpha alpha")])
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(raw, target).collect()
    }
    assert w[1] > w[3] > w[2]


def test_dsir_token_counts_and_determinism(spark):
    raw = _docs(spark, [(1, "a b b"), (2, "c")])
    target = _docs(spark, [(9, "a")])
    out1 = sorted(
        dsir_importance_weights(raw, target).collect(),
        key=lambda r: r["doc_id"],
    )
    out2 = sorted(
        dsir_importance_weights(
            raw.repartition(7), target.repartition(3)
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r["n_tokens"] for r in out1] == [3, 1]
    # partitioning-invariant, bit-identical (order-independent decimal sum)
    assert [(r["doc_id"], r["log_weight"]) for r in out1] == [
        (r["doc_id"], r["log_weight"]) for r in out2
    ]


def test_dsir_rejects_bad_buckets(spark):
    d = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_importance_weights(d, d, n_buckets=1)


# --------------------------------------------------- greedy coverage


def test_greedy_coverage_forced_order_and_ties(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c"),
            (2, "a b"),
            (3, "c d"),
            (4, "e"),
        ],
    )
    rows = greedy_coverage_select(docs, 4).collect()
    # round 1: doc 1 covers {a,b,c} (3).  round 2: doc 3 adds {d} and
    # doc 4 adds {e} — tie on gain 1, smaller id wins.  round 3: doc 4.
    # round 4: universe exhausted -> early stop.
    got = [(r["round"], r["doc_id"], r["gain"], r["covered_total"]) for r in rows]
    assert got == [(1, 1, 3, 3), (2, 3, 1, 4), (3, 4, 1, 5)]


def test_greedy_coverage_k1_and_validation(spark):
    docs = _docs(spark, [(1, "x y"), (2, "x")])
    rows = greedy_coverage_select(docs, 1).collect()
    assert [(r["doc_id"], r["gain"]) for r in rows] == [(1, 2)]
    with pytest.raises(ValueError, match="k must be"):
        greedy_coverage_select(docs, 0)


# ------------------------------------------------- weighted reservoir


def test_reservoir_deterministic_and_partition_invariant(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("w")
    )
    a = weighted_reservoir(df, "w", "k", 10).collect()
    b = weighted_reservoir(df.repartition(13), "w", "k", 10).collect()
    assert [(r["sample_id"], r["sample_key"]) for r in a] == [
        (r["sample_id"], r["sample_key"]) for r in b
    ]
    assert len(a) == 10


def test_reservoir_zero_weight_never_sampled(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 5), (3, 0), (4, 1)], "k LONG, w LONG"
    )
    got = {r["sample_id"] for r in weighted_reservoir(df, "w", "k", 10).collect()}
    assert got == {2, 4}


def test_reservoir_weight_bias(spark):
    # one row with overwhelming weight must appear in a small sample:
    # its key ln(u)/w is within LUT[0]/10^6 of 0, larger than any
    # unit-weight key unless that row drew the top grid cell AND this
    # one drew the bottom — impossible simultaneously with these ids
    # (deterministic, so just assert).
    df = spark.range(200).select(
        F.col("id").alias("k"),
        F.when(F.col("id") == 77, 1000000).otherwise(1).alias("w"),
    )
    got = {r["sample_id"] for r in weighted_reservoir(df, "w", "k", 5).collect()}
    assert 77 in got


# ---------------------------------------------------- Neyman allocation


def test_neyman_total_and_zero_variance_stratum(spark):
    df = spark.createDataFrame(
        [("a", 0.0), ("a", 10.0), ("a", 0.0), ("a", 10.0),
         ("b", 5.0), ("b", 5.0)],
        "s STRING, v DOUBLE",
    )
    rows = {r["stratum"]: r for r in neyman_allocation(df, "s", "v", 10).collect()}
    # stratum a: std 5, N*S = 20; stratum b: std 0 -> all budget to a
    assert rows["a"]["n_alloc"] == 10
    assert rows["b"]["n_alloc"] == 0
    assert rows["b"]["std"] == 0.0


def test_neyman_all_zero_variance_falls_back_proportional(spark):
    """ADVICE r09: when EVERY stratum has zero std the Neyman total is
    0 and share was 0/0 = NaN — the fallback allocates proportional to
    stratum size and keeps the sum(n_alloc) == n invariant."""
    df = spark.createDataFrame(
        [("a", 5.0)] * 6 + [("b", 7.0)] * 2,
        "s STRING, v DOUBLE",
    )
    rows = {r["stratum"]: r for r in neyman_allocation(df, "s", "v", 8).collect()}
    assert rows["a"]["n_alloc"] == 6 and rows["b"]["n_alloc"] == 2
    assert abs(rows["a"]["alloc_share"] - 0.75) < 1e-12
    assert sum(r["n_alloc"] for r in rows.values()) == 8


def test_neyman_sum_matches_budget_on_real_data(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rows = neyman_allocation(cust, "c_mktsegment", "c_acctbal", 1000).collect()
    assert sum(r["n_alloc"] for r in rows) == 1000
    assert all(r["n_alloc"] >= 0 for r in rows)
    with pytest.raises(ValueError, match="n must be"):
        neyman_allocation(cust, "c_mktsegment", "c_acctbal", 0)


def test_dsir_filter_path_equals_target_path(spark):
    raw = _docs(
        spark,
        [(1, "alpha alpha beta"), (2, "omega omega"), (3, "alpha omega")],
    ).withColumn("grp", F.col("doc_id") % 2 == 1)
    via_filter = sorted(
        dsir_importance_weights(raw, target_filter=F.col("grp")).collect(),
        key=lambda r: r["doc_id"],
    )
    via_target = sorted(
        dsir_importance_weights(
            raw, raw.where(F.col("grp"))
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [(r["doc_id"], r["n_tokens"], r["log_weight"]) for r in via_filter] == [
        (r["doc_id"], r["n_tokens"], r["log_weight"]) for r in via_target
    ]
    with pytest.raises(ValueError, match="exactly one"):
        dsir_importance_weights(raw)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_importance_weights(raw, raw, target_filter=F.col("grp"))
