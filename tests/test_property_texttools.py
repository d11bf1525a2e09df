"""Property-based checks (hypothesis): the Catalyst expressions in
functions/texttools.py must agree with straightforward Python reference
implementations on arbitrary ASCII text — the tokenization contract
every text/dedup oracle is built on.

ASCII-only alphabet on purpose: Java's regex \\s is ASCII while
Python's re \\s is unicode-aware, and the engine↔oracle contract is
defined over the fixture corpus (ASCII); the property pins the
contract where both regex dialects agree.
"""

from __future__ import annotations

import re
import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from northwind_etl_spark.functions.texttools import (
    bigrams_expr,
    rolling_hash_expr,
    shingles_expr,
    token_count_expr,
    tokens_expr,
)

TEXT = st.text(alphabet=string.ascii_letters + string.digits + " \t\n.,;:!?", max_size=80)


def _py_tokens(s: str) -> list[str]:
    return [t for t in re.split(r"\s+", s.strip()) if t != ""]


def _py_shingles(s: str, n: int = 3) -> list[str]:
    toks = _py_tokens(s)
    out, seen = [], set()
    for i in range(max(len(toks) - n + 1, 0)):
        sh = " ".join(toks[i : i + n])
        if sh not in seen:
            seen.add(sh)
            out.append(sh)
    return out


def _py_bigrams(s: str) -> list[str]:
    toks = _py_tokens(s)
    return [" ".join(toks[i : i + 2]) for i in range(max(len(toks) - 1, 0))]


def _py_rolling_hash(s: str, mod: int = 1_000_000_007, base: int = 31) -> int:
    h = 0
    for ch in s:
        h = (h * base + ord(ch)) % mod
    return h


def test_texttools_match_python_reference(spark):
    # hypothesis drives an inner function so the session-scoped spark
    # fixture stays outside the example loop

    @settings(max_examples=8, deadline=None)
    @given(st.lists(TEXT, min_size=1, max_size=24))
    def check(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i LONG, text STRING"
        )
        rows = df.select(
            "i",
            tokens_expr(F.col("text")).alias("toks"),
            token_count_expr(F.col("text")).alias("n"),
            shingles_expr(F.col("text"), 3).alias("sh"),
            bigrams_expr(F.col("text")).alias("bg"),
            rolling_hash_expr(F.col("text")).alias("rh"),
        ).collect()
        for r in rows:
            t = texts[r.i]
            assert list(r.toks) == _py_tokens(t), t
            assert r.n == len(_py_tokens(t)), t
            assert list(r.sh) == _py_shingles(t), t
            assert list(r.bg) == _py_bigrams(t), t
            assert r.rh == _py_rolling_hash(t), t

    check()
