"""SemDeDup (operators/semdedup.py): planted-twin dedup, keep-set
separation, greedy paper ordering, determinism, and the cluster-cap
contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.semdedup import semantic_dedup


def _corpus_with_twins(spark, sf_dir, *, every: int = 10):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    twins = emb.where(F.col("vec_id") % every == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            * (F.lit(1.0) + F.when(i == 0, F.lit(0.001)).otherwise(F.lit(0.0))),
        ).alias("embedding"),
    )
    return emb.unionByName(twins)


@pytest.fixture(scope="module")
def verdicts(spark, sf_dir):
    corpus = _corpus_with_twins(spark, sf_dir)
    out = semantic_dedup(corpus, k=8, iters=2, threshold=0.99).collect()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in _corpus_with_twins(spark, sf_dir).collect()
    }
    return out, vecs


def _unit(v):
    return v / (np.linalg.norm(v) or 1.0)


def test_exactly_one_of_each_twin_pair_survives(verdicts):
    out, _ = verdicts
    by_id = {r["vec_id"]: r for r in out}
    twin_ids = [i for i in by_id if i >= 1000000]
    assert twin_ids, "fixture must plant twins"
    for tid in twin_ids:
        a, b = by_id[tid - 1000000], by_id[tid]
        assert a["keep"] != b["keep"], f"twin pair {tid}: both {a['keep']}"
        dropped = a if not a["keep"] else b
        kept = b if dropped is a else a
        assert dropped["kept_by"] == kept["vec_id"]


def test_originals_without_twin_are_kept(verdicts):
    out, _ = verdicts
    # corpus max natural cosine ≈ 0.51 << 0.99 → only twins collide
    for r in out:
        if r["vec_id"] < 1000000 and r["vec_id"] % 10 != 0:
            assert r["keep"] and r["kept_by"] is None


def test_kept_set_is_separated_and_drops_are_covered(verdicts):
    out, vecs = verdicts
    thr = 0.99
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for rows in by_cluster.values():
        kept = [r for r in rows if r["keep"]]
        mat = np.vstack([_unit(vecs[r["vec_id"]]) for r in kept])
        gram = mat @ mat.T
        np.fill_diagonal(gram, 0.0)
        assert gram.max() < thr, "two kept items are semantic dups"
        for r in rows:
            if not r["keep"]:
                sim = float(
                    _unit(vecs[r["vec_id"]]) @ _unit(vecs[r["kept_by"]])
                )
                assert sim >= thr


def test_paper_order_keeps_farther_from_centroid(verdicts):
    out, _ = verdicts
    by_id = {r["vec_id"]: r for r in out}
    for r in out:
        if not r["keep"]:
            keeper = by_id[r["kept_by"]]
            # greedy order uses the EXACT cosine; the emitted value is
            # rounded to 6 decimals, so compare with that tolerance
            assert keeper["centroid_cosine"] <= r["centroid_cosine"] + 1e-6


def test_deterministic_across_runs(spark, sf_dir):
    corpus = _corpus_with_twins(spark, sf_dir)
    a = sorted(map(tuple, semantic_dedup(corpus, k=8, threshold=0.99).collect()))
    b = sorted(map(tuple, semantic_dedup(corpus, k=8, threshold=0.99).collect()))
    assert a == b


def test_overflow_raises_by_default(spark, sf_dir):
    corpus = _corpus_with_twins(spark, sf_dir)
    with pytest.raises(Exception, match="max_cluster"):
        semantic_dedup(corpus, k=2, threshold=0.99, max_cluster=10).collect()


def test_overflow_keep_never_drops_content(spark, sf_dir):
    corpus = _corpus_with_twins(spark, sf_dir)
    out = semantic_dedup(
        corpus, k=2, threshold=0.99, max_cluster=10, on_overflow="keep"
    )
    n_in = corpus.count()
    assert out.count() == n_in  # over-cap items stay, un-deduped
    # only in-cap items can be dropped → ≤ max_cluster per cluster
    assert out.where(~F.col("keep")).count() <= 2 * 10
