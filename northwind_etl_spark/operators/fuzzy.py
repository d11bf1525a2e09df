"""Fuzzy string matching / entity resolution (north-star §2b family):
pairs of records whose normalized text is within a small edit
distance — the name/title reconciliation step of a data-cleaning or
record-linkage pipeline.

Scale shape: classic q-gram blocking, NOT an all-pairs levenshtein.
- normalize (lower/trim) once;
- explode distinct character 3-grams, build per-gram posting lists,
  and DROP grams with document frequency > max_df (a gram present in
  every record — 'cus' in 'customer#...' — generates quadratic
  candidates while carrying no discriminating signal: the identical
  df-cutoff contract as dedup.py::ngram_jaccard);
- expand candidate pairs array-locally per surviving gram (the
  no-self-join _bucket_pairs shape), dedupe, then verify candidates
  with a codegen'd levenshtein.

Recall contract: a true pair is found iff it shares ≥1 sub-max_df
gram.  Strings of length L at edit distance d share ≥ L−2−3d of their
3-grams, so misses require every shared gram to be corpus-common —
rare in practice and tunable via max_df (raise it for recall, at
candidate-volume cost).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cache import persist_stage


def char_ngrams_expr(s: Column, n: int = 3) -> Column:
    """Distinct character n-grams; strings shorter than n contribute
    themselves as their single gram."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: s.substr(i, F.lit(n))))


def fuzzy_match_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_distance: int = 1,
    ngram_n: int = 3,
    max_df: int = 100,
) -> DataFrame:
    """(id_a, id_b, edit_distance) for pairs within max_distance after
    lower/trim normalization, candidates blocked on shared rare
    character n-grams.  Fully SQL-oracle-checkable."""
    par = df.sparkSession.sparkContext.defaultParallelism
    norm = F.lower(F.trim(F.col(text_col)))
    # tiny (id, name) projection consumed by three branches (gram
    # explode + both verify joins) — persist, same policy as the
    # text-stage caches
    base = persist_stage(
        df.repartition(par, F.col(id_col))
        .select(F.col(id_col).alias("id"), norm.alias("__name"))
    )
    grams = base.select(
        "id", F.explode(char_ngrams_expr(F.col("__name"), ngram_n)).alias("g")
    )
    postings = (
        grams.groupBy("g")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= max_df))
    )
    n = F.size("ids")
    pair_arr = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.slice(F.col("ids"), i + 1, n - i),
                lambda y: F.struct(
                    F.element_at(F.col("ids"), i).alias("id_a"), y.alias("id_b")
                ),
            ),
        )
    )
    # id_a != id_b: a duplicated id value would appear twice in a
    # posting list and emit a degenerate self-pair (edit_distance 0);
    # the oracle's a.id < b.id already excludes those
    cands = (
        postings.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    a = base.select(F.col("id").alias("id_a"), F.col("__name").alias("__na"))
    b = base.select(F.col("id").alias("id_b"), F.col("__name").alias("__nb"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__na", "__nb").alias("edit_distance"),
        )
        .where(F.col("edit_distance") <= max_distance)
    )
