"""Ranked retrieval over the documents corpus: BM25-shaped scoring and
reciprocal-rank fusion — the query side of a RAG / search pipeline,
sitting on top of the boolean machinery in operators/search.py.

Two operators:

- `bm25_topk` — Okapi BM25's exact plan shape (Robertson &
  Spärck Jones probabilistic weighting; the SMART/Okapi tf saturation
  curve) with one deliberate substitution: the idf factor is the RAW
  Robertson odds ratio (N - df + 0.5)/(df + 0.5) instead of its log.
  Reason: ln is the single non-correctly-rounded step in the formula,
  and this repo's one cross-engine hash failure ever (r07 DP noise)
  was a libm ulp — so the hash-checked entry keeps the score a pure
  chain of correctly-rounded IEEE ops on exact integer inputs
  (the proven corr/OLS float recipe) and documents that a production
  deployment would wrap the odds in ln (a monotone transform of the
  per-term weight; tf saturation and length normalization are
  untouched).  k1 = 1.25 and b = 0.75 are chosen binary-EXACT (5/4,
  3/4), so every intermediate is reproducible bit-for-bit on any
  IEEE-754 engine.

- `rrf_fuse` — reciprocal-rank fusion (Cormack, Clarke & Buettcher
  2009): given two bounded rankings, score(d) = Σ 1/(k0 + rank_i(d))
  over the lists that retrieved d.  Ranks are small exact integers,
  each reciprocal is one correctly-rounded division, and the sum is a
  fixed two-term add — exact cross-engine again.

Scale shape: BM25 here is the AD-HOC query regime — per-doc term
frequencies computed INSIDE the tokens array (map-only codegen, no
explode), corpus stats (N, Σdl, per-term df) reduced once into a
1-row broadcast, score evaluated scan-side, top-k via
TakeOrderedAndProject.  ZERO wide shuffle for a one-off query; a
standing query workload would flip to the inverted-index shape
(search.py::build_term_index) with per-term posting joins.  RRF joins
two ALREADY-BOUNDED top-n lists (k·2 rows), a broadcast-size problem
wherever it runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texttools import token_count_expr, tokens_expr

# binary-exact constants: 5/4 and 3/4 have terminating base-2 forms,
# so k1*x and b*x are single correctly-rounded ops from exact inputs
BM25_K1 = 1.25
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    *,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs by the BM25-shaped score over `terms` (disjunctive:
    any matching term contributes; docs matching none are dropped).
    Returns (id, per-term tf columns, dl, score) ordered by
    (score desc, id).

    Float determinism contract: dl, tf, df, N are exact integers;
    avgdl = Σdl/N is ONE correctly-rounded division; each term's
    weight is the fixed chain
        idf = (N - df + 0.5) / (df + 0.5)
        den = tf + k1*((1 - b) + b*(dl/avgdl))
        w   = (tf*(k1+1)) / den * idf
    and the doc score sums the per-term weights LEFT TO RIGHT in the
    caller's term order — the same expression tree the DuckDB oracle
    evaluates, so scores hash-match bit-for-bit.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = tokens_expr(F.col(text_col))

    # helper, NOT a default-arg lambda: PySpark treats a second lambda
    # parameter as the array INDEX (the search.py::_tf trap), so
    # `lambda x, t=t` would bind t to the index column
    def _tf(term: str) -> F.Column:
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"tf_{t}") for t in terms]
    base = docs.select(
        F.col(id_col),
        token_count_expr(F.col(text_col)).alias("dl"),
        *tf_cols,
    )
    # one corpus reduction -> 1-row broadcast: N, Σdl, df per term
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("dl").alias("__sumdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"__df_{t}")
            for t in terms
        ],
    )
    scored = base.join(F.broadcast(stats))
    avgdl = F.col("__sumdl").cast("double") / F.col("__n").cast("double")
    dl_norm = F.col("dl").cast("double") / avgdl
    score = None
    for t in terms:
        tf = F.col(f"tf_{t}").cast("double")
        df_t = F.col(f"__df_{t}").cast("double")
        idf = (F.col("__n").cast("double") - df_t + F.lit(0.5)) / (
            df_t + F.lit(0.5)
        )
        den = tf + F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dl_norm
        )
        w = tf * F.lit(BM25_K1 + 1.0) / den * idf
        score = w if score is None else score + w
    any_match = None
    for t in terms:
        cond = F.col(f"tf_{t}") > 0
        any_match = cond if any_match is None else (any_match | cond)
    return (
        scored.where(any_match)
        .select(id_col, *[f"tf_{t}" for t in terms], "dl", score.alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def rrf_fuse(
    list_a: DataFrame,
    list_b: DataFrame,
    *,
    id_col: str = "doc_id",
    k0: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two bounded rankings.

    Inputs must carry (id_col, rank) with rank a 1-based exact integer
    under a TOTAL order (the caller breaks ties).  Output: one row per
    id present in either list — (id, rank_a, rank_b, rrf_score) with
    absent-from-a-list contributing 0, ordered by (rrf_score desc,
    id).  rrf_score = 1/(k0 + rank_a) + 1/(k0 + rank_b): two
    correctly-rounded divisions + one add, exact on any IEEE engine.
    """
    a = list_a.select(F.col(id_col), F.col("rank").alias("rank_a"))
    b = list_b.select(F.col(id_col), F.col("rank").alias("rank_b"))
    both = a.join(b, id_col, "full_outer")
    contrib = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(),
        F.lit(1.0) / (F.lit(float(k0)) + F.col(c).cast("double")),
    ).otherwise(F.lit(0.0))
    return both.select(
        id_col,
        "rank_a",
        "rank_b",
        (contrib("rank_a") + contrib("rank_b")).alias("rrf_score"),
    ).orderBy(F.desc("rrf_score"), F.col(id_col))
