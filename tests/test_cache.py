"""Tracked persist + release for shared multi-consumer stages
(cache.py), and the reliable-checkpoint variant of duplicate_clusters.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.cache import persist_stage, release_stages, stage_cache_scope
from northwind_etl_spark.operators.dedup import duplicate_clusters
from northwind_etl_spark.operators.text import tf_idf


def _cached_rdd_count(spark) -> int:
    jsc = spark.sparkContext._jsc.sc()
    return jsc.getPersistentRDDs().size()


def test_release_stages_unpersists(spark, sf_dir):
    release_stages()  # start from a clean slate
    base = _cached_rdd_count(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tf_idf(docs, "text", "doc_id").count()  # persists _doc_tokens + _doc_term_counts
    assert _cached_rdd_count(spark) > base
    assert release_stages() >= 2
    assert _cached_rdd_count(spark) == base
    # correctness is unaffected: a released stage recomputes
    assert tf_idf(docs, "text", "doc_id").count() > 0
    release_stages()


def test_stage_cache_scope_releases_only_inner(spark, sf_dir):
    release_stages()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    outer = persist_stage(docs.select("doc_id"))
    outer.count()
    with stage_cache_scope():
        tf_idf(docs, "text", "doc_id").count()
        inside = _cached_rdd_count(spark)
        assert inside >= 3  # outer + the two text stages
    after = _cached_rdd_count(spark)
    assert after < inside  # inner stages released on exit
    assert release_stages() >= 1  # outer still tracked
    assert _cached_rdd_count(spark) == 0


def test_persist_tracking_is_thread_safe(spark, sf_dir):
    """Concurrent persist_stage registrations must neither drop nor
    double-track entries (Spark drivers run multi-threaded jobs)."""
    import threading

    release_stages()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def register(i: int) -> None:
        persist_stage(docs.where(F.col("doc_id") % 7 == i).select("doc_id"))

    threads = [threading.Thread(target=register, args=(i,)) for i in range(7)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert release_stages() == 7
    assert release_stages() == 0


def test_duplicate_clusters_reliable_checkpoint(spark, tmp_path):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a LONG, id_b LONG")
    sc = spark.sparkContext
    # without a checkpoint dir the reliable path must fail loudly
    if sc.getCheckpointDir() is None:
        with pytest.raises(ValueError, match="checkpoint dir"):
            duplicate_clusters(pairs, reliable=True).collect()
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    labels = {
        r.id: r.cluster for r in duplicate_clusters(pairs, reliable=True).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
