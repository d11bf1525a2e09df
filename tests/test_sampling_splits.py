"""Leakage-safe group split / GroupKFold (operators/sampling.py::
group_split, group_kfold): co-assignment guarantees on planted twins,
fold disjointness, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from northwind_etl_spark.operators.sampling import group_kfold, group_split


def _twin_corpus(spark, sf_dir, n=60):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(n)
    twins = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), F.col("text")
    )
    return docs.select("doc_id", "text").unionAll(twins)


def test_exact_twins_never_straddle_split(spark, sf_dir):
    corpus = _twin_corpus(spark, sf_dir)
    labeled = group_split(corpus.withColumn("gk", F.md5("text")), "gk")
    straddle = (
        labeled.groupBy("gk")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert straddle == 0
    # and the split is non-degenerate on this corpus
    sides = {r.split for r in labeled.select("split").distinct().collect()}
    assert sides == {"train", "eval"}


def test_row_hash_split_would_straddle(spark, sf_dir):
    """The contrast that makes group_split worth having: bucketing by
    doc_id DOES separate at least one twin pair on this corpus."""
    from northwind_etl_spark.operators.sampling import hash_split

    corpus = _twin_corpus(spark, sf_dir)
    labeled = hash_split(corpus, "doc_id")
    straddle = (
        labeled.groupBy(F.md5("text").alias("gk"))
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert straddle > 0


def test_group_kfold_users_disjoint(spark, sf_dir):
    from northwind_etl_spark.sources.parquet import read_events

    ev = read_events(spark, sf_dir)
    folded = group_kfold(ev, "user_id", k=5)
    per_user = folded.groupBy("user_id").agg(
        F.countDistinct("fold").alias("k")
    )
    assert per_user.where(F.col("k") > 1).count() == 0
    folds = sorted(r.fold for r in folded.select("fold").distinct().collect())
    assert folds == [0, 1, 2, 3, 4]


def test_group_split_deterministic_across_partitionings(spark, sf_dir):
    corpus = _twin_corpus(spark, sf_dir)
    a = group_split(corpus.withColumn("gk", F.md5("text")), "gk")
    b = group_split(
        corpus.repartition(13).withColumn("gk", F.md5("text")), "gk"
    )
    assert (
        a.select("doc_id", "split")
        .exceptAll(b.select("doc_id", "split"))
        .count()
        == 0
    )
