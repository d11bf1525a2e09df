"""Planted-fixture semantics for the r10 training-export operators:
shard manifest (operators/packing.py::shard_manifest) and the
interleaving curriculum (operators/curation.py::interleave_schedule).
Cross-engine value parity is pinned by their registry oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.curation import interleave_schedule
from northwind_etl_spark.operators.packing import shard_manifest


def test_shard_manifest_conserves_and_respects_budget(spark):
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100 + 1).cast("long").alias("n_tokens"),
        F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias("source"),
    )
    man = shard_manifest(
        docs, "doc_id", "n_tokens", "source", n_shards=4, part_budget=500
    ).collect()
    assert sum(r.n_docs for r in man) == 500
    assert sum(r.n_tokens for r in man) == 500 * 0 + sum(
        i % 100 + 1 for i in range(500)
    )
    by_shard = {}
    for r in man:
        by_shard.setdefault(r.shard, []).append(r)
        assert 1 <= r.n_sources <= 3
        assert r.top_source_docs >= (r.n_docs + r.n_sources - 1) // r.n_sources
    for shard, parts in by_shard.items():
        idx = sorted(p.part for p in parts)
        assert idx == list(range(len(idx)))  # contiguous parts from 0
        # every part except the last stopped because the budget filled:
        # tokens_before of its successor's first doc >= budget * part
        # ⇒ each non-final part carries >= budget − max_len slack; the
        # cheap invariant: cumulative tokens through part p >= 500 * p
        cum = 0
        for p in sorted(parts, key=lambda r: r.part):
            if p.part > 0:
                assert cum >= 500 * p.part
            cum += p.n_tokens
    with pytest.raises(ValueError, match="n_shards"):
        shard_manifest(docs, "doc_id", "n_tokens", "source", n_shards=0)


def test_shard_manifest_dominant_source_tie_rule(spark):
    docs = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")], "doc_id LONG, n_tokens LONG, source STRING"
    )
    man = shard_manifest(
        docs, "doc_id", "n_tokens", "source", n_shards=1, part_budget=10000
    ).collect()
    # one shard, one part, 1-1 tie on docs → larger name wins
    assert len(man) == 1 and man[0].top_source == "b"


def test_interleave_schedule_permutation_and_quotas(spark):
    docs = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20, "source STRING"
    )
    k = 200
    rows = interleave_schedule(docs, "source", k_steps=k).collect()
    steps = sorted(r.step for r in rows)
    assert steps == list(range(1, k + 1))  # a permutation of 1..K
    served = {}
    for r in rows:
        served[r.source] = served.get(r.source, 0) + 1
    # exact largest-remainder quotas of 50/30/20%
    assert served == {"a": 100, "b": 60, "c": 40}
    # even spacing: consecutive occurrences of a source are at most
    # ceil(K/n_s) + 1 steps apart
    by_src = {}
    for r in sorted(rows, key=lambda r: r.step):
        by_src.setdefault(r.source, []).append(r.step)
    for s, positions in by_src.items():
        n_s = served[s]
        bound = -(-k // n_s) + 1
        gaps = [b - a for a, b in zip(positions, positions[1:])]
        assert max(gaps) <= bound, (s, max(gaps), bound)
    with pytest.raises(ValueError, match="k_steps"):
        interleave_schedule(docs, "source", k_steps=0)


def test_interleave_schedule_single_source(spark):
    docs = spark.createDataFrame([("only",)] * 7, "source STRING")
    rows = interleave_schedule(docs, "source", k_steps=10).collect()
    assert sorted(r.step for r in rows) == list(range(1, 11))
    assert all(r.source == "only" for r in rows)


def test_bloom_file_skipping_no_false_negatives(spark):
    from northwind_etl_spark.sources.inventory import bloom_file_skipping

    rows = [(k % 5, k) for k in range(200)]  # 5 files, keys 0..199
    df = spark.createDataFrame(rows, "f LONG, k LONG")
    out = {
        r.query_key: r
        for r in bloom_file_skipping(
            df, F.col("f"), "k", [0, 5, 7, 9999], n_words=8
        ).collect()
    }
    # key 0 lives in file 0 only; key 5 in file 0; key 7 in file 2
    assert out[0].n_files_actual == 1
    assert out[5].n_files_actual == 1
    assert out[7].n_files_actual == 1
    assert out[9999].n_files_actual == 0
    for r in out.values():
        assert r.n_files_total == 5
        # the bloom can never miss a file that really holds the key
        assert r.n_files_bloom_pass >= r.n_files_actual
        assert r.n_false_positive_files == (
            r.n_files_bloom_pass - r.n_files_actual
        )
    with pytest.raises(ValueError, match="bits_per_word"):
        bloom_file_skipping(df, F.col("f"), "k", [1], bits_per_word=63)
