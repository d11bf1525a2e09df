"""Duplicate-cluster resolution (connected components) and sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from northwind_etl_spark.operators.dedup import duplicate_clusters, keep_canonical
from northwind_etl_spark.operators.sampling import hash_split, stratified_sample


def test_duplicate_clusters_transitive(spark):
    # chain 1-2-3, pair 10-11, singleton 99 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a LONG, id_b LONG"
    )
    labels = {r.id: r.cluster for r in duplicate_clusters(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_keep_canonical_drops_non_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in [1, 2, 3, 10, 11, 99]], "doc_id LONG, text STRING"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a LONG, id_b LONG")
    kept = keep_canonical(docs, duplicate_clusters(pairs), "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 10, 99]


def test_hash_split_deterministic_and_proportional(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = hash_split(docs, "doc_id").select("doc_id", "split")
    b = hash_split(docs.repartition(7), "doc_id").select("doc_id", "split")
    assert a.subtract(b).count() == 0  # partitioning-independent
    n = docs.count()
    n_train = a.where(F.col("split") == "train").count()
    assert 0.7 * n <= n_train <= 0.9 * n


def test_stratified_sample_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frac = {lang: 0.5 for lang in ["en", "de", "fr", "es", "zh"]}
    sampled = stratified_sample(docs, "lang", frac)
    per = {r.lang: r.n for r in sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, total in totals.items():
        got = per.get(lang, 0)
        assert 0.2 * total <= got <= 0.8 * total, (lang, got, total)
    # seeded → reproducible
    again = stratified_sample(docs, "lang", frac).count()
    assert again == sampled.count()
