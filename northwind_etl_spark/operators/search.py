"""Boolean keyword retrieval over the documents table: conjunctive
(AND-of-terms) search ranked by summed term frequency, plus an
inverted-index builder — the corpus-exploration primitive next to the
reference's verification SELECTs (Project Plan7.md:23-36) and the
lookup half of the text family in operators/text.py.

Two physical shapes, equality-pinned in tests/test_search.py:

- `keyword_search_scan` — the ad-hoc 100 TB shape: per-doc TFs of the
  q query terms computed INSIDE the tokens array (map-only codegen,
  `F.filter` + `F.size` per term), conjunction as a scan-level
  predicate, top-k via TakeOrderedAndProject.  ZERO shuffle: for a
  one-off query nothing beats reading the corpus once and keeping k
  rows per task.
- `keyword_search_grouped` — the term-at-a-time shape an inverted
  index would execute: explode only the matching (doc, term) pairs
  (the non-matching tokens are dropped BEFORE the exchange), one
  groupBy(doc) counting distinct matched terms == q.  Shuffles only
  rows containing ≥1 query term — the selective-query regime.

`build_term_index` materializes the index itself: (term, df, postings)
with postings arrays capped by `max_df` — an uncapped hot-term posting
list ("the") is one unboundedly long array in one reducer, the same
hot-key hazard the dedup family's posting lists guard against
(operators/dedup.py::ngram_jaccard's max_df contract).  df is always
exact; only the materialized doc-id list is suppressed for hot terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texttools import tokens_expr


def _tf(toks: F.Column, term: str) -> F.Column:
    # NB: a one-parameter lambda only — PySpark treats a second lambda
    # parameter as the array INDEX, so `lambda x, t=t: ...` would bind
    # t to the index column, not the captured term
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def _tf_cols(terms: list[str]) -> list[F.Column]:
    toks = tokens_expr(F.col("text"))
    return [_tf(toks, t).alias(f"tf_{t}") for t in terms]


def keyword_search_scan(
    docs: DataFrame,
    terms: list[str],
    *,
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs containing EVERY term, ranked by summed term
    frequency (ties broken by id for a total order).  Map-only +
    TakeOrderedAndProject; plan-asserted shuffle-free."""
    if not terms:
        raise ValueError("terms must be non-empty")
    scored = docs.select(F.col(id_col), *_tf_cols(terms))
    for t in terms:
        scored = scored.where(F.col(f"tf_{t}") > 0)
    score = sum(F.col(f"tf_{t}") for t in terms).alias("score")
    scored = scored.select(id_col, *[f"tf_{t}" for t in terms], score)
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def keyword_search_grouped(
    docs: DataFrame,
    terms: list[str],
    *,
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Same result as keyword_search_scan via the term-at-a-time plan:
    explode tokens pre-filtered to the query terms (everything else is
    dropped before the exchange), one groupBy(doc) requiring all q
    terms present.  Output schema: (id, score) — per-term TFs live in
    the pivoted aggregate only."""
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = tokens_expr(F.col("text"))
    term_arr = F.array(*[F.lit(t) for t in terms])
    hits = docs.select(
        F.col(id_col),
        F.explode(F.filter(toks, lambda x: F.array_contains(term_arr, x))).alias(
            "term"
        ),
    )
    agg = hits.groupBy(id_col).agg(
        F.count_distinct("term").alias("__nt"), F.count("term").alias("score")
    )
    return (
        agg.where(F.col("__nt") == len(terms))
        .select(id_col, "score")
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def build_term_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    max_df: int = 10_000,
) -> DataFrame:
    """Inverted index: (term, df, postings).  df is exact for every
    term; postings (the sorted doc-id array) is materialized only when
    df <= max_df — hot terms keep postings=NULL so no reducer ever
    assembles an unbounded array.  One tokenize + one groupBy(term)."""
    toks = docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokens_expr(F.col("text")))).alias("term")
    )
    return toks.groupBy("term").agg(
        F.count(id_col).alias("df"),
        F.when(
            F.count(id_col) <= max_df, F.sort_array(F.collect_list(id_col))
        ).alias("postings"),
    )
