"""PII detection and redaction over text columns — the scrubbing pass a
training-data pipeline runs before corpus export.

Design (100 TB): pure JVM-side regex expressions (`regexp_count` /
`regexp_replace`) — map-only, no shuffle, whole-stage codegen; cost is
one linear scan of the text column regardless of cluster size.

Every pattern is written in the syntax subset valid AND identical in
Java regex (Spark) and RE2 (the DuckDB oracle): no backreferences, no
lookaround, ASCII classes only.  Redaction is applied in the fixed
``REDACTION_ORDER`` so overlapping families (an email inside a URL, an
IPv4 inside a URL path) resolve identically on any engine: a family
earlier in the order consumes its text before later families see it.

Extends the reference's quality/validation surface
(/root/reference/etl_orders.py:31-44 null-key auditing) from keys to
content: same "inspect before load" role, applied to text payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Family -> (pattern, replacement token).  Order of application is
# REDACTION_ORDER; counts are always taken on the ORIGINAL text.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "url": (r"https?://[^\s]+", "<URL>"),
    "ipv4": (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    "phone": (r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
}
REDACTION_ORDER: list[str] = ["email", "url", "ipv4", "phone"]


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append one ``n_<family>`` match-count column per PII family.

    Counts are independent per family over the original text (an email
    that is also part of a URL counts for both) — the unambiguous,
    order-free definition, and the one an oracle can reproduce with
    ``len(regexp_extract_all(...))``.
    """
    out = df
    for fam in REDACTION_ORDER:
        pat, _ = PII_PATTERNS[fam]
        out = out.withColumn(f"n_{fam}", F.regexp_count(F.col(text_col), F.lit(pat)))
    return out


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Replace every PII match with its family token, in REDACTION_ORDER."""
    expr = F.col(text_col)
    for fam in REDACTION_ORDER:
        pat, token = PII_PATTERNS[fam]
        expr = F.regexp_replace(expr, pat, token)
    return df.withColumn(out_col, expr)
