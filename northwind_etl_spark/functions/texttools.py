"""Text column expressions — all JVM-side (split/filter/transform are
Catalyst higher-order functions, no Python in the hot path).

Tokenization contract (shared with the DuckDB oracles): trim, split on
runs of whitespace, drop empty tokens.  Both engines implement this
identically, so token counts hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens_expr(text: Column | str) -> Column:
    """Whitespace tokens, empties dropped."""
    return F.filter(F.split(F.trim(_col(text)), r"\s+"), lambda t: t != F.lit(""))


def token_count_expr(text: Column | str) -> Column:
    return F.size(tokens_expr(text))


def punct_count_expr(text: Column | str) -> Column:
    """Count of punctuation chars (fixed class, same regex both engines)."""
    return F.length(F.regexp_replace(_col(text), r"[^!,.;:?]", ""))


def salted_vocabulary_text(
    text: Column | str, id_col: Column | str, groups: int = 100
) -> Column:
    """Deterministic REALISTIC-VOCABULARY derivation of a corpus: every
    whitespace token ``t`` of a document becomes ``t_g{id % groups}``,
    so documents in different id-groups share ZERO tokens while
    within-group token-set similarity is exactly what it was on the
    original corpus (the suffix is a bijection per group).

    Why this exists: the synthetic documents table draws long docs from
    a tiny vocabulary, so token SETS collide massively and every exact
    set-similarity output there is quadratic in the dup-class sizes
    (operators/setjoin.py docstring — the r06 verdict's "saturated
    corpus" finding).  Real web corpora have power-law vocabularies
    where rare tokens discriminate; salting the vocabulary by id-group
    reproduces that regime deterministically — same row count, same
    per-doc token multiset shape, |V|·groups vocabulary — and lets
    prefix filtering demonstrate its CANDIDATE-BOUND behavior.  Both
    engines replay the identical rewrite (DuckDB: list_transform with
    ``x || '_g' || CAST(doc_id % groups AS VARCHAR)``), so derived
    entries stay hash-checkable end to end.
    """
    gid = (_col(id_col) % F.lit(groups)).cast("string")
    return F.array_join(
        F.transform(tokens_expr(text), lambda t: F.concat(t, F.lit("_g"), gid)),
        " ",
    )


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array — the
    MinHash/Jaccard unit.

    transform+slice (no UDF): shingle i is tokens[i..i+n-1] joined by
    single spaces; distinct set per doc.
    """
    k = F.size(toks) - F.lit(n - 1)
    # guard: sequence(1, 0) yields a DESCENDING [1, 0] in Spark, not an
    # empty array — docs shorter than n tokens must produce no shingles
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def shingles_expr(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles, direct from text."""
    return shingles_from_tokens(tokens_expr(text), n)


def normalize_text_expr(text: Column | str) -> Column:
    """Aggressive dedup normalization (the RefinedWeb / CCNet key
    recipe): lowercase → digits to 0 → strip everything outside
    [a-z0 ] (punctuation, accents-as-bytes stay out of the key) →
    collapse runs of whitespace with the EXPLICIT class (Java \\s vs
    RE2 \\s diverge on \\x0B — the html_to_text lesson) → trim.  Two
    documents differing only in case, punctuation, digits, or spacing
    normalize to the same key.  Map-only, RE2-safe, oracle-replayable
    verbatim."""
    c = F.lower(_col(text))
    c = F.regexp_replace(c, r"[0-9]", "0")
    c = F.regexp_replace(c, r"[^a-z0 \t\n\f\r\x0B]", " ")
    return F.trim(F.regexp_replace(c, r"[ \t\n\f\r\x0B]+", " "))


def char_ngrams_expr(text: Column | str, n: int = 3) -> Column:
    """Character n-grams WITH multiplicity of lower(text) — the
    language-ID feature unit (spaces kept: whitespace context around
    function words is signal).  transform over a position sequence +
    substr, no UDF; replayed in SQL as
    list_transform(range(1, length(lower(text)) - (n-2)),
                   i -> substring(lower(text), i, n))."""
    t = F.lower(_col(text))
    k = F.length(t) - F.lit(n - 1)
    # sequence(1, 0) yields DESCENDING [1, 0], not empty — guard
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: t.substr(i, F.lit(n)))


def bigrams_from_tokens(toks: Column) -> Column:
    """Word bigrams WITH multiplicity from a token array (frequency
    counting wants repeats — contrast shingles_expr, which is the
    distinct-set form for MinHash/Jaccard)."""
    k = F.size(toks) - F.lit(1)
    # sequence(1, 0) yields DESCENDING [1, 0], not empty — guard
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, 2), " "))


def bigrams_expr(text: Column | str) -> Column:
    """Word bigrams with multiplicity, direct from text."""
    return bigrams_from_tokens(tokens_expr(text))


def rolling_hash_expr(text: Column | str, *, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash over characters: h = (h*base + ascii(c)) % mod.

    Pure fold via `aggregate` — sequential by construction, so the value
    is deterministic and reproducible by any engine with a left fold.
    Intermediate stays < mod*base + 127 ≪ 2^63: no overflow under ANSI.
    """
    chars = F.split(_col(text), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda h, c: (h * F.lit(base) + F.ascii(c)) % F.lit(mod),
    )
