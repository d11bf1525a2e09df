"""End-to-end training-corpus build: quality gate → dedup → split."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from northwind_etl_spark.plans.llm_pipeline import build_training_corpus


def test_build_training_corpus(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="corpus_") + "/corpus"
    labeled, rep = build_training_corpus(spark, sf_dir, out)
    assert rep.n_input >= rep.n_after_quality >= rep.n_after_dedup > 0
    assert rep.n_train + rep.n_eval == rep.n_after_dedup
    assert rep.n_train > rep.n_eval  # 80/20-ish
    # contamination audit counts a subset of eval docs, never negative
    assert 0 <= rep.n_contaminated_eval <= rep.n_eval
    # written partitioned by split
    assert labeled.select("split").distinct().count() == 2


def test_corpus_build_removes_planted_near_dups(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    dup = docs.select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    corpus_dir = tempfile.mkdtemp(prefix="planted_")
    docs.select("doc_id", "text", "lang", "source", "n_chars").unionAll(
        dup
    ).write.parquet(f"{corpus_dir}/documents.parquet")
    labeled, rep = build_training_corpus(spark, corpus_dir)
    # most planted dups collapse back to ~the original corpus size
    assert rep.n_after_dedup <= rep.n_after_quality - 0.7 * 40


def test_corpus_build_boilerplate_stage_strips_templates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.lit("SITE NAV menu home\n"), F.col("text"),
            F.lit("\nCOPYRIGHT footer terms"),
        ).alias("text"),
        "lang",
        "source",
        F.length("text").alias("n_chars"),
    )
    corpus_dir = tempfile.mkdtemp(prefix="boiler_")
    seeded.write.parquet(f"{corpus_dir}/documents.parquet")
    labeled, rep = build_training_corpus(
        spark, corpus_dir, boilerplate_min_df_frac=0.5
    )
    # 2 planted template lines struck from each of the 40 docs
    assert rep.n_boiler_lines_dropped == 80
    # the templates are gone from the surviving corpus text
    assert (
        labeled.where(
            F.col("text").contains("SITE NAV")
            | F.col("text").contains("COPYRIGHT footer")
        ).count()
        == 0
    )
    # without the stage the report field stays 0
    _, rep0 = build_training_corpus(spark, corpus_dir)
    assert rep0.n_boiler_lines_dropped == 0
