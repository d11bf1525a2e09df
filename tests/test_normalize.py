"""NFC normalization proofs (operators/normalize.py): decomposed
sequences compose, precomposed text is a fixed point, non-BMP text
passes through, and the per-doc stats arithmetic is exact."""

from __future__ import annotations

import unicodedata

import pytest

from northwind_etl_spark.operators.normalize import nfc_normalize, nfc_stats

DECOMP = "cafe\u0301"    # e + combining acute (5 cps -> NFC 4)
PRECOMP = "caf\u00e9"    # precomposed - NFC fixed point
UMLAUT_D = "u\u0308ber"  # u + combining diaeresis
NON_BMP = "math \U0001d400 bold"  # no NFC interaction


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, DECOMP),
        (2, PRECOMP),
        (3, UMLAUT_D),
        (4, NON_BMP),
        (5, "plain ascii"),
        (6, DECOMP + " " + UMLAUT_D + " " + DECOMP),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_matches_unicodedata(docs):
    got = {r.doc_id: r.text_nfc for r in nfc_normalize(docs).collect()}
    raw = {r.doc_id: r.text for r in docs.collect()}
    for i, t in raw.items():
        assert got[i] == unicodedata.normalize("NFC", t)


def test_composition_and_fixed_points(docs):
    got = {r.doc_id: r for r in nfc_stats(docs).collect()}
    assert (got[1].len_raw, got[1].len_nfc, got[1].n_composed) == (5, 4, 1)
    assert got[1].changed
    assert not got[2].changed and got[2].n_composed == 0
    assert (got[3].len_raw, got[3].len_nfc) == (5, 4)
    assert not got[4].changed  # non-BMP untouched
    assert not got[5].changed
    assert got[6].n_composed == 3  # two acutes + one diaeresis


def test_nfc_idempotent(spark, docs):
    once = nfc_normalize(docs).select("doc_id", "text_nfc")
    twice = nfc_normalize(
        once.withColumnRenamed("text_nfc", "text")
    ).collect()
    for r in twice:
        assert r.text == r.text_nfc


def test_map_only_plan(docs):
    plan = nfc_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_normalize_text_expr_collapses_twin_families(spark):
    """The dedup key recipe: case, punctuation, digits and whitespace
    runs all normalize away; distinct words stay distinct."""
    from pyspark.sql import functions as F

    from northwind_etl_spark.functions.texttools import normalize_text_expr

    df = spark.createDataFrame(
        [
            (1, "Hello,  World!"),
            (2, "hello world"),
            (3, "HELLO\tWORLD!!!"),
            (4, "hello there"),
            (5, "build 42 done"),
            (6, "build 77 done"),
            (7, "build nothing done"),
        ],
        "id LONG, text STRING",
    )
    out = {r.id: r.k for r in df.select("id", normalize_text_expr(F.col("text")).alias("k")).collect()}
    assert out[1] == out[2] == out[3] == "hello world"
    assert out[4] != out[1]
    assert out[5] == out[6] == "build 00 done"
    assert out[7] != out[5]
