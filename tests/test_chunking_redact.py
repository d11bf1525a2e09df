"""Planted-fixture tests for operators/chunking.py and
operators/redact.py — exact expected chunks / counts / redacted text,
independent of the DuckDB parity check in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from northwind_etl_spark.operators.chunking import chunk_documents
from northwind_etl_spark.operators.redact import pii_counts, redact_pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_chunk_grammar_exact(spark):
    # 80 tokens, chunk_size=32, stride=24 -> 1 + ceil(48/24) = 3 chunks:
    # tokens [1..32], [25..56], [49..80]
    toks = [f"t{i}" for i in range(1, 81)]
    df = _docs(spark, [(1, " ".join(toks))])
    got = {
        r.chunk_id: (r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(df, chunk_size=32, stride=24).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[0] == (32, " ".join(toks[0:32]))
    assert got[1] == (32, " ".join(toks[24:56]))
    assert got[2] == (32, " ".join(toks[48:80]))


def test_chunk_short_and_exact_boundary(spark):
    df = _docs(
        spark,
        [
            (1, "only three tokens"),  # shorter than chunk_size -> 1 chunk
            (2, " ".join(f"w{i}" for i in range(32))),  # == chunk_size
            (3, " ".join(f"w{i}" for i in range(33))),  # one over
            (4, "   "),  # whitespace-only -> 1 empty chunk
        ],
    )
    out = chunk_documents(df, chunk_size=32, stride=24)
    counts = {
        r.doc_id: r.n
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # doc 3: ceil((33-32)/24) = 1 extra chunk (tokens 25..33, 9 tokens)
    assert counts == {1: 1, 2: 1, 3: 2, 4: 1}
    d3 = {r.chunk_id: r.n_chunk_tokens for r in out.where("doc_id = 3").collect()}
    assert d3 == {0: 32, 1: 9}
    d4 = out.where("doc_id = 4").collect()[0]
    assert (d4.n_chunk_tokens, d4.chunk_text) == (0, "")


def test_chunk_every_token_covered(spark):
    # coverage invariant: union of chunk tokens == all tokens, for a
    # spread of lengths around the chunk/stride boundary
    rows = [(n, " ".join(f"x{n}_{i}" for i in range(n))) for n in (1, 8, 24, 31, 32, 33, 55, 56, 57, 100)]
    df = _docs(spark, rows)
    chunks = chunk_documents(df, chunk_size=32, stride=24)
    covered = (
        chunks.select("doc_id", F.explode(F.split("chunk_text", " ")).alias("tok"))
        .where("tok != ''")
        .select("doc_id", "tok")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_covered"))
    )
    got = {r.doc_id: r.n_covered for r in covered.collect()}
    assert got == {n: n for n, _ in rows if n > 0}


def test_chunk_stride_validation(spark):
    import pytest

    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, stride=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_size=8, stride=9)


def test_chunk_and_redact_plans_are_map_only(spark, sf_dir):
    """Scale claim, locked: both r06 text operators are one linear
    scan — no Exchange (shuffle) anywhere in either plan."""
    from northwind_etl_spark.plans.queries import chunk_docs, pii_redaction_stats

    for fn in (chunk_docs, pii_redaction_stats):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, fn.__name__


def test_pii_counts_and_redaction_planted(spark):
    df = _docs(
        spark,
        [
            (1, "mail a@b.co and c.d+x@e-f.org now"),
            (2, "go to https://x.y/z?q=1 or http://plain.site"),
            (3, "hosts 10.0.0.1 and 192.168.255.3"),
            (4, "call +1-555-123-4567 or +44-800-555-0199"),
            (5, "clean text with no secrets"),
            (6, "mixed a@b.co https://u.v/w 1.2.3.4 +1-555-000-1111"),
        ],
    )
    counted = pii_counts(df)
    got = {
        r.doc_id: (r.n_email, r.n_url, r.n_ipv4, r.n_phone)
        for r in counted.collect()
    }
    assert got == {
        1: (2, 0, 0, 0),
        2: (0, 2, 0, 0),
        3: (0, 0, 2, 0),
        4: (0, 0, 0, 2),
        5: (0, 0, 0, 0),
        6: (1, 1, 1, 1),
    }
    red = {r.doc_id: r.redacted for r in redact_pii(df).collect()}
    assert red[1] == "mail <EMAIL> and <EMAIL> now"
    assert red[3] == "hosts <IP> and <IP>"
    assert red[4] == "call <PHONE> or <PHONE>"
    assert red[5] == "clean text with no secrets"
    assert red[6] == "mixed <EMAIL> <URL> <IP> <PHONE>"


def test_redaction_order_resolves_overlaps(spark):
    # an email inside a URL: email family runs first (-> <EMAIL>), then
    # the URL family consumes the whole non-space run including the
    # token — deterministic on any engine because the order is fixed
    df = _docs(spark, [(1, "see https://host.com/mail/a@b.co here")])
    r = redact_pii(df).collect()[0]
    assert r.redacted == "see <URL> here"
