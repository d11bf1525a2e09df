"""URL extraction + structural parsing — the web-corpus provenance
step (host-level quality priors, per-domain dedup scopes, UTM/source
attribution all start from "what URLs does this document carry").

Extraction is a single Java-regex ``regexp_extract_all`` kept
RE2-compatible (no backrefs / lookaround — the redact.py discipline,
so the DuckDB oracle can replay it verbatim); parsing is Spark's
native ``parse_url`` expression (JVM-side, codegen) for HOST / PATH /
QUERY-key components.  Everything is map-only until the caller
aggregates — no exchange is introduced here.

At 100 TB this is the motivating case for staying JVM-side: one
regex pass + parse_url per document, no Python in the loop, filters
on host push down to the scan when the URL column is materialized in
the source.

Verified: tests/test_web.py (planted URLs: multi-URL docs, query-key
extraction, no-URL docs yield empty arrays) and the oracle-checked
``url_host_stats`` registry entry, whose oracle recomputes every
component from the deterministic seed formula — checking the whole
extract→parse chain, not just counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-safe (and Java-safe): scheme, then any run of non-space,
# non-quote, non-angle-bracket URL characters.
URL_PATTERN = r"https?://[A-Za-z0-9._~:/?#@!$&'*+,;=%()\[\]-]+"


def extract_urls(
    df: DataFrame, text_col: str = "text", out_col: str = "urls"
) -> DataFrame:
    """Array of every URL occurrence in `text_col` (order preserved)."""
    return df.withColumn(
        out_col,
        F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), F.lit(0)),
    )


def url_parts(url: Column, query_key: str | None = None) -> list[Column]:
    """(host, path[, query-param]) columns from a URL column via the
    native parse_url expression."""
    cols = [
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
    ]
    if query_key is not None:
        cols.append(
            F.parse_url(url, F.lit("QUERY"), F.lit(query_key)).alias(query_key)
        )
    return cols


def doc_url_components(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_key: str | None = None,
) -> DataFrame:
    """One row per (doc, URL occurrence) with parsed components —
    docs without URLs drop out (inner explode by design; keep the
    no-URL population via the caller's left join if needed)."""
    urls = extract_urls(df, text_col)
    exploded = urls.select(
        F.col(id_col), F.explode("urls").alias("url")
    )
    return exploded.select(id_col, "url", *url_parts(F.col("url"), query_key))


# ----------------------------------------------- HTML text extraction
# The WET-extraction step of a web-corpus pipeline (what Common-Crawl
# preprocessing does before any quality/dedup stage): strip
# script/style/comment blocks, then tags, then decode the five
# predefined character entities, then collapse whitespace.  Every
# pattern is RE2-safe (no backrefs — script and style are separate
# patterns precisely because RE2 lacks \1) so the DuckDB oracle
# replays the chain verbatim; everything is map-only JVM regex, no
# Python, no shuffle.

HTML_BLOCK_PATTERNS = (
    r"(?s)<script[^>]*>.*?</script>",
    r"(?s)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)
# decode order matters: &amp; LAST, the standard rule that keeps
# '&amp;lt;' from double-decoding into '<'
HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def html_to_text(html: Column) -> Column:
    """Visible text of an HTML column: block strip → tag strip →
    entity decode → whitespace collapse (tags become single spaces so
    adjacent words never merge).

    The collapse uses the EXPLICIT class [ \\t\\n\\f\\r\\x0B] instead
    of \\s: Java's \\s includes vertical tab (\\x0B) while RE2's does
    not, so the shorthand would silently hash-mismatch the DuckDB
    oracle on any document containing \\x0B.  The explicit class is
    bit-identical to Java \\s (so Spark results are unchanged) and
    engine-portable."""
    c = html
    for pat in HTML_BLOCK_PATTERNS:
        c = F.regexp_replace(c, pat, " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"[ \t\n\f\r\x0B]+", " "))


def html_title(html: Column) -> Column:
    """First <title> element's text ('' when absent)."""
    return F.regexp_extract(html, r"<title>([^<]*)</title>", 1)


def html_link_count(html: Column) -> Column:
    """Number of href attributes (double-quoted form)."""
    return F.regexp_count(html, F.lit(r'href="'))


# query params that never identify content — the standard
# tracking-decoration families every crawler canonicalizer strips.
# Bare `ref=` is deliberately NOT here: unlike utm_*/gclid it is
# content-identifying on many real sites (GitHub ?ref=branch,
# docs-site ?ref=page anchors), so stripping it would merge genuinely
# distinct pages into one dedup group.  Only the referral-tracking
# forms (ref_src, ref_url) are decoration.
TRACKING_PARAM_PATTERN = r"^(utm_[a-z]+|gclid|fbclid|msclkid|ref_src|ref_url|mc_[a-z]+)="


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL — the dedup key for crawl frontiers and
    web-corpus URL-level dedup (the same page arrives decorated with
    tracking params, default ports, fragments, WWW-case and
    trailing-slash variants; byte-equality dedup misses all of them).

    Normalization, in order (each step RE2-safe so the DuckDB oracle
    replays it verbatim — the redact.py discipline):
      1. scheme and host lowercased; default ports :80 (http) and
         :443 (https) stripped
      2. fragment dropped
      3. tracking params (TRACKING_PARAM_PATTERN) dropped; surviving
         params byte-sorted (query-string order never identifies a
         resource)
      4. empty path unified to '/' (RFC 3986 http(s) equivalence),
         then trailing '/' stripped from a non-root path
      5. '?' dropped when no params survive

    Pure string expressions — map-only, JVM codegen, no UDF; the hot
    path at 100 TB is one regex pass per URL.
    """
    # 1. split once around the first '?' or '#'
    head = F.regexp_extract(url, r"^([^?#]*)", 1)
    query = F.regexp_extract(url, r"^[^?#]*\?([^#]*)", 1)
    scheme = F.lower(F.regexp_extract(head, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(head, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", 1)
    )
    host = F.when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - F.lit(4)),
    ).when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - F.lit(3)),
    ).otherwise(hostport)
    path = F.regexp_extract(head, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$", 1)
    # RFC 3986: for http(s) an EMPTY path is equivalent to '/' — the
    # homepage pair (example.com vs example.com/) is the most common
    # trailing-slash variant of all, so unify before the strip rule
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # 4. non-root trailing slash
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - F.lit(1)),
    ).otherwise(path)
    # 3. param filter + byte sort
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit(""))
            & ~p.rlike(TRACKING_PARAM_PATTERN),
        )
    )
    qcanon = F.concat_ws("&", params)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )


# ---------------------------------------------------------------- r11:
# crawl-compliance rollups (license tags + robots-style path rules) —
# the curation step RefinedWeb/C4-style pipelines run after URL
# canonicalization and before any text reaches training shards.


def license_rollup(
    df: DataFrame,
    host_col: str,
    license_col: str,
    *,
    permissive: tuple[str, ...] = ("cc-by", "cc-by-sa", "cc0", "public-domain"),
    blocked: tuple[str, ...] = ("noai", "all-rights-reserved"),
    weight_col: str | None = None,
) -> DataFrame:
    """Per-host license-compliance rollup: how much of each host's
    content is permissively licensed, how much carries an opt-out
    (noai / all-rights-reserved), and whether the host is train-
    eligible under a strict no-opt-out policy.

    One hash aggregation over (host, license-class flags) — the flags
    are computed map-side so the shuffle carries three longs per
    host, never text.  Fractions are single divisions of exact longs
    (cross-engine identical); train_eligible is the strict policy
    n_blocked = 0, surfaced as a column rather than a filter so the
    audit shows WHY a host is out, not just that it vanished.

    Returns (host, n_docs, weight, n_permissive, n_blocked,
    permissive_frac, blocked_frac, train_eligible) ordered by host.
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    lic = F.col(license_col)
    base = df.select(
        F.col(host_col).alias("host"),
        w.alias("__w"),
        F.when(lic.isin(*permissive), F.lit(1)).otherwise(F.lit(0)).alias("__p"),
        F.when(lic.isin(*blocked), F.lit(1)).otherwise(F.lit(0)).alias("__b"),
    )
    agg = base.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__w").alias("weight"),
        F.sum("__p").cast("long").alias("n_permissive"),
        F.sum("__b").cast("long").alias("n_blocked"),
    )
    n = F.col("n_docs").cast("double")
    return agg.select(
        "host",
        "n_docs",
        "weight",
        "n_permissive",
        "n_blocked",
        F.round(F.col("n_permissive").cast("double") / n, 6).alias(
            "permissive_frac"
        ),
        F.round(F.col("n_blocked").cast("double") / n, 6).alias(
            "blocked_frac"
        ),
        (F.col("n_blocked") == 0).alias("train_eligible"),
    ).orderBy("host")


def longest_prefix_match(
    df: DataFrame,
    rules: DataFrame,
    path_col: str,
    *,
    prefix_col: str = "prefix",
    default: Column | None = None,
    out_col: str = "verdict",
) -> DataFrame:
    """Longest-prefix-match rule join — robots.txt Allow/Disallow
    resolution (RFC 9309 §2.2.2: the most specific, i.e. longest,
    matching rule wins), and the same shape as IP-prefix/ACL tables.

    The rules side is a small table (a robots file is bounded), so
    the match is a BROADCAST theta-join on startswith — no shuffle of
    the data side — followed by one max_by per row to keep the
    longest matching prefix.  Two DISTINCT prefixes of equal length
    matching the same path must be equal strings, so length ties
    reduce to duplicate-prefix rules; the rules side is therefore
    deduped per prefix to the MIN verdict before the join, making a
    rules table with a duplicated prefix and conflicting verdicts
    resolve deterministically — and for robots-style 'allow' vs
    'deny'/'disallow' strings, MIN prefers 'allow', matching RFC 9309
    §2.2.2's least-restrictive tie rule.

    `rules` columns: `prefix_col` (string) and `out_col` (the rule's
    verdict, any orderable type).  Rows matching NO rule get
    `default` (NULL when omitted).  Returns df + (matched_prefix,
    out_col).

    Contract: `df`'s rows must be UNIQUE across its columns (carry a
    row id) — the longest-match selection re-groups by every df
    column, so fully-duplicate rows would collapse to one.
    """
    r = F.broadcast(
        rules.select(
            F.col(prefix_col).alias("__pfx"), F.col(out_col).alias("__v")
        )
        # duplicate-prefix conflicts resolve to MIN verdict (see above)
        .groupBy("__pfx")
        .agg(F.min("__v").alias("__v"))
    )
    joined = df.join(r, F.col(path_col).startswith(F.col("__pfx")), "left")
    keys = [c for c in df.columns]
    best = joined.groupBy(*keys).agg(
        F.max_by(
            F.struct(F.col("__pfx").alias("matched_prefix"), F.col("__v")),
            F.struct(F.length("__pfx"), F.col("__pfx")),
        ).alias("__m")
    )
    dflt = default if default is not None else F.lit(None)
    return best.select(
        *keys,
        F.col("__m.matched_prefix").alias("matched_prefix"),
        F.coalesce(F.col("__m.__v"), dflt).alias(out_col),
    )
