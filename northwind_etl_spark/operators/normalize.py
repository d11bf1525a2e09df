"""Unicode NFC normalization — the canonical-form cleaning step of a
text-corpus pipeline (dedup keys, tokenizers, and hash fingerprints
all silently fracture when 'café' arrives both precomposed (U+00E9)
and decomposed (e + U+0301)).

Spark has no built-in Unicode-normalization expression, so this is a
deliberate Arrow-batched Pandas UDF (pandas ``Series.str.normalize``
→ a single C-backed pass per batch; never per-row Python).  The plan
stays map-only — normalization adds no exchange anywhere.

Cross-engine contract: Python's ``unicodedata.normalize('NFC', ...)``
and DuckDB's native ``nfc_normalize`` both implement Unicode NFC, so
the registry entry pins md5(normalized) — byte-for-byte equality of
the normalized UTF-8 payload across two independent NFC
implementations, plus code-point-length deltas.  Both engines'
``length()`` counts code points, so the delta arithmetic matches too.

Verified: tests/test_normalize.py (precomposed/decomposed round
trips, already-NFC idempotence, non-BMP passthrough) and the
oracle-checked ``unicode_nfc_stats`` registry entry.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


@F.pandas_udf(StringType())
def _nfc(s: pd.Series) -> pd.Series:
    return s.str.normalize("NFC")


def nfc_normalize(
    df: DataFrame, text_col: str = "text", out_col: str = "text_nfc"
) -> DataFrame:
    """Append an NFC-normalized copy of `text_col`."""
    return df.withColumn(out_col, _nfc(F.col(text_col)))


def nfc_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc normalization report: code-point lengths before/after,
    how many compositions NFC applied, whether the doc changed, and
    the md5 of the normalized payload (the cross-engine pin)."""
    out = nfc_normalize(df, text_col)
    before = F.length(text_col)
    after = F.length("text_nfc")
    return out.select(
        F.col(id_col),
        before.alias("len_raw"),
        after.alias("len_nfc"),
        (before - after).alias("n_composed"),
        (F.col(text_col) != F.col("text_nfc")).alias("changed"),
        F.md5("text_nfc").alias("nfc_md5"),
    )
