"""Exact Jaccard-threshold set-similarity self-join via prefix
filtering — the PPJoin family (Chaudhuri et al. 2006; Xiao et al.
2008), the scalable EXACT complement to this repo's capped heuristics:

- `dedup.py::ngram_jaccard` bounds candidate volume with a `max_df`
  posting-list cut, trading recall for cost (documented there);
- MinHash/SimHash are probabilistic by construction.

Prefix filtering keeps exactness with a provable candidate bound: sort
every set's tokens by ONE global order (document frequency ascending,
token as tie-break — rarest first), keep only each set's first
``n − ⌈θ·n⌉ + 1`` tokens as its *prefix*, and generate candidates only
from shared PREFIX tokens.  The lemma (Jaccard case): if
``J(A,B) ≥ θ`` then ``|A∩B| ≥ ⌈θ·max(|A|,|B|)⌉``, and two sets whose
prefixes are disjoint can share at most ``⌈θ·n⌉ − 1`` tokens — so
every qualifying pair shares a prefix token and NO true pair is
missed.  Because prefixes hold each set's RAREST tokens, posting
lists are structurally biased small — the hot-token quadratic mode
that forces ngram_jaccard's max_df cut cannot arise from common
tokens (they land in suffixes); `max_bucket` remains as an in-plan
raise, not a silent truncation.

Shape: one tokenization (the shared `_doc_tokens` stage), one df
aggregation, one per-doc sort (state bounded by doc size), prefix
posting lists → TWO-STEP pair expansion (explode the anchor index,
then slice — the similarity.py discipline: no row ever holds the
O(bucket²) pair array; the one-step `sorted_pairs` form OOM'd a 1 GiB
driver on sf0.1's ~3000-id postings), then an exact verify that joins
the two full token arrays back and computes
``|A∩B| · den ≥ num · |A∪B|`` in INTEGERS (θ = num/den rational — no
float threshold compare anywhere; the reported jaccard is one final
double division both engines replay identically).

Honest cost reading on SATURATED corpora: prefix filtering's pruning
power needs vocabulary diversity.  The synthetic documents table draws
long docs from a small vocabulary, so token SETS collide massively —
at sf0.1 even exact set-equality holds for 35,606 pairs and J ≥ 0.9
for 964,854: the OUTPUT is quadratic in the equivalence-class sizes
and any exact algorithm pays for it (measured 43–48 s at sf0.1,
candidates ≈ 22 M from ~19-token prefixes over fat postings).  On a
real large-vocabulary corpus the prefix postings are rare-token-small
and the join is candidate-bound, not output-bound.  The entry is
therefore driver-checked at sf0.01 (~9 k pairs) but deliberately NOT
an sf0.1 bench headline.

Verified: tests/test_setjoin.py (no-false-negative sweep vs the
brute-force definition, prefix-length boundary cases, empty/identical
docs) and the oracle-checked `jaccard_prefix_join_pairs` entry (the
quadratic definitional self-join in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import persist_stage


def jaccard_threshold_pairs(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: tuple[int, int] = (3, 5),
    max_bucket: int = 4096,
) -> DataFrame:
    """(doc_a, doc_b, inter, uni, jaccard) for every pair of documents
    with token-set Jaccard ≥ num/den — exact, by prefix filtering.
    Zero-token documents are excluded (Jaccard is undefined on ∅)."""
    from .text import _doc_tokens

    num, den = threshold
    if not (0 < num <= den):
        raise ValueError("threshold must be a rational in (0, 1]")
    toks = _doc_tokens(docs, text_col, id_col)
    dt = toks.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct("__toks")).alias("tok"),
    )
    dfreq = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # per-doc token array in the ONE global (df asc, tok) order; the
    # prefix is a slice of it, the full array feeds the exact verify
    ordered = persist_stage(
        dt.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"],
            ).alias("ts")
        )
        .withColumn("n", F.size("ts"))
        .where(F.col("n") > 0)
    )
    # prefix length n - ceil(num*n/den) + 1, exact in integers
    p = F.col("n") - F.floor(
        (F.lit(num) * F.col("n") + F.lit(den - 1)) / F.lit(den)
    ).cast("int") + F.lit(1)
    posting = (
        ordered.select(
            "doc_id", F.explode(F.slice("ts", 1, p)).alias("ptok")
        )
        .groupBy("ptok")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
    )
    nb = F.when(
        F.size("ids") > max_bucket,
        F.raise_error(
            F.concat(
                F.lit(f"prefix posting exceeds max_bucket={max_bucket} "
                      "for token="),
                F.col("ptok").cast("string"),
            )
        ).cast("int"),
    ).otherwise(F.size("ids"))
    # two-step pair expansion (the similarity.py discipline): explode
    # the anchor INDEX first, then slice — no row ever holds the
    # O(bucket²) pair array, only one ≤bucket-length slice
    cands = (
        posting.withColumn("nb", nb)
        .where(F.col("nb") >= 2)
        .select(
            "ids",
            "nb",
            F.explode(F.sequence(F.lit(1), F.col("nb") - 1)).alias("i"),
        )
        .select(
            F.element_at("ids", F.col("i")).alias("doc_a"),
            F.explode(
                F.slice("ids", F.col("i") + 1, F.col("nb") - F.col("i"))
            ).alias("doc_b"),
        )
        .distinct()
    )
    a = ordered.select(
        F.col("doc_id").alias("doc_a"),
        F.col("ts").alias("__ta"),
        F.col("n").alias("__na"),
    )
    b = ordered.select(
        F.col("doc_id").alias("doc_b"),
        F.col("ts").alias("__tb"),
        F.col("n").alias("__nb"),
    )
    inter = F.size(F.array_intersect("__ta", "__tb"))
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("inter", inter)
        .withColumn("uni", F.col("__na") + F.col("__nb") - F.col("inter"))
        .where(F.col("inter") * den >= num * F.col("uni"))
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("uni").cast("long").alias("uni"),
            (F.col("inter") / F.col("uni")).alias("jaccard"),
        )
    )
