"""URL extraction/parsing proofs (operators/web.py): multi-URL docs,
query-key extraction and its NULL case, no-URL docs, and the map-only
plan shape (no exchange before aggregation)."""

from __future__ import annotations

import pytest

from northwind_etl_spark.operators.web import (
    doc_url_components,
    extract_urls,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "see https://a.example.com/x?src=s1&u=9 and http://b.example.org/y/z here"),
        (2, "no links at all"),
        (3, "tail https://c.example.com/only"),
        (4, "dup https://a.example.com/x?src=s1&u=9 twice https://a.example.com/x?src=s1&u=9"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_extract_arrays(docs):
    got = {r.doc_id: r.urls for r in extract_urls(docs).collect()}
    assert got[1] == [
        "https://a.example.com/x?src=s1&u=9",
        "http://b.example.org/y/z",
    ]
    assert got[2] == []
    assert got[4][0] == got[4][1]


def test_components_and_query_key(docs):
    rows = doc_url_components(docs, query_key="src").collect()
    by = {}
    for r in rows:
        by.setdefault(r.doc_id, []).append((r.host, r.path, r.src))
    assert by[1] == [
        ("a.example.com", "/x", "s1"),
        ("b.example.org", "/y/z", None),  # no src param → NULL
    ]
    assert 2 not in by  # inner explode drops no-URL docs
    assert by[3] == [("c.example.com", "/only", None)]
    assert len(by[4]) == 2


def test_map_only_until_aggregation(docs):
    plan = (
        doc_url_components(docs, query_key="src")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
