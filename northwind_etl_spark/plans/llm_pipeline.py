"""End-to-end training-data pipeline over the documents corpus — the
north-star §2b operators composed the way a real LLM data build runs
them, each stage a lazy DataFrame plan:

    [line-level boilerplate removal] → quality filter → near-dup dedup
    (MinHash+LSH → clusters → keep canonical) → deterministic
    train/eval split → train→eval contamination audit → partitioned
    write

Scale shape: the optional boilerplate stage is two explodes + one
digest agg + a broadcast anti-filter (operators/lines.py); quality
scoring is map-only; dedup is the bounded LSH pipeline
(operators/dedup.py); cluster resolution touches only docs that appear
in near-dup pairs (tiny vs corpus); the split is a stateless hash; the
contamination audit builds postings on the EVAL side only (tiny) and
streams train past them; the write partitions by split for downstream
pruning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    duplicate_clusters,
    keep_canonical,
    minhash_near_duplicates,
)
from ..operators.sampling import hash_split
from ..operators.text import text_quality
from ..sources.parquet import read_table


@dataclass
class CorpusReport:
    n_input: int
    n_after_quality: int
    n_after_dedup: int
    n_train: int
    n_eval: int
    n_contaminated_eval: int
    n_boiler_lines_dropped: int = 0


def build_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    *,
    min_tokens: int = 10,
    max_stopword_ratio: float = 0.9,
    near_dup_threshold: float = 0.7,
    train_pct: int = 80,
    boilerplate_min_df_frac: float | None = None,
) -> tuple[DataFrame, CorpusReport]:
    """Returns (final corpus with split labels, stage-count report).

    `boilerplate_min_df_frac` switches on the CCNet line-removal stage
    ahead of everything else: lines recurring in ≥ that fraction of
    the corpus are struck and the document text rewritten, so the
    downstream quality/dedup stages score CONTENT, not templates
    (shared boilerplate otherwise inflates MinHash similarity between
    unrelated docs)."""
    docs = read_table(spark, sf_dir, "documents")
    n_input = docs.count()

    # 0. optional boilerplate line removal (operators/lines.py)
    n_boiler = 0
    if boilerplate_min_df_frac is not None:
        from ..cache import persist_stage
        from ..operators.lines import remove_boilerplate_lines

        # persisted: every downstream action (quality count, dedup
        # count, contamination count, split counts, write) re-evaluates
        # the docs plan — without this the two explodes + frequency agg
        # would re-run per action
        cleaned = persist_stage(
            remove_boilerplate_lines(docs, min_df_frac=boilerplate_min_df_frac)
        )
        n_boiler = (
            cleaned.agg(F.sum("n_dropped").alias("s")).first()["s"] or 0
        )
        docs = docs.drop("text", "n_chars").join(
            cleaned.select(
                "doc_id",
                F.col("cleaned_text").alias("text"),
                F.length("cleaned_text").alias("n_chars"),
            ),
            "doc_id",
        )

    # 1. quality gate (map-only)
    quality = text_quality(docs)
    keep_ids = quality.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.coalesce(F.col("stopword_ratio"), F.lit(0.0)) <= max_stopword_ratio)
    ).select("doc_id")
    filtered = docs.join(keep_ids, "doc_id", "left_semi")
    n_quality = filtered.count()

    # 2. near-dup dedup: pairs → clusters → keep canonical member
    pairs = minhash_near_duplicates(
        filtered, "text", "doc_id", threshold=near_dup_threshold
    )
    clusters = duplicate_clusters(pairs)
    deduped = keep_canonical(filtered, clusters, "doc_id")
    n_dedup = deduped.count()

    # 3. deterministic split
    labeled = hash_split(deduped, "doc_id", train_pct=train_pct)

    # 4. contamination audit: eval docs sharing shingles with train are
    # the leakage a benchmark split must not carry; near-dup dedup
    # already removed exact/near copies, so what remains is partial
    # overlap (quotes, boilerplate) — reported, not silently dropped,
    # because the cut threshold is a policy decision
    from ..operators.contamination import cross_corpus_overlap

    train = labeled.where(F.col("split") == "train").select("doc_id", "text")
    ev = labeled.where(F.col("split") == "eval").select("doc_id", "text")
    n_contam = (
        cross_corpus_overlap(train, ev, "text", "doc_id", min_shared=2)
        .select("eval_id")
        .distinct()
        .count()
    )

    # 5. optional partitioned write
    if out_dir:
        labeled.write.mode("overwrite").partitionBy("split").parquet(out_dir)
        labeled = spark.read.parquet(out_dir)
    counts = {
        r["split"]: r["n"]
        for r in labeled.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return labeled, CorpusReport(
        n_input=n_input,
        n_after_quality=n_quality,
        n_after_dedup=n_dedup,
        n_train=counts.get("train", 0),
        n_eval=counts.get("eval", 0),
        n_contaminated_eval=n_contam,
        n_boiler_lines_dropped=int(n_boiler),
    )
