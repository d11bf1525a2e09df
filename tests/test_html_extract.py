"""HTML text extraction (operators/web.py::html_to_text & friends):
block-before-entity ordering, the &amp;-last decode rule, tag-to-space
joining, and absent-element defaults."""

from __future__ import annotations

from pyspark.sql import functions as F

from northwind_etl_spark.operators.web import (
    html_link_count,
    html_title,
    html_to_text,
)


def _extract(spark, html: str) -> tuple[str, str, int]:
    row = (
        spark.range(1)
        .select(
            html_to_text(F.lit(html)).alias("t"),
            html_title(F.lit(html)).alias("title"),
            html_link_count(F.lit(html)).alias("n"),
        )
        .first()
    )
    return row.t, row.title, row.n


def test_script_and_style_stripped_before_entities(spark):
    t, _, _ = _extract(
        spark,
        "<p>a</p><script type='x'>if (1 &lt; 2) {}</script>"
        "<style>b{}</style><p>z</p>",
    )
    assert t == "a z"  # script entity never decoded: the block is gone


def test_multiline_blocks_and_comments(spark):
    t, _, _ = _extract(
        spark, "<script>\nvar a;\n</script>x<!-- multi\nline -->y"
    )
    assert t == "x y"


def test_amp_last_prevents_double_decode(spark):
    t, _, _ = _extract(spark, "<p>&amp;lt; &amp; &lt;</p>")
    assert t == "&lt; & <"


def test_tags_become_word_boundaries(spark):
    t, _, _ = _extract(spark, "<h1>one</h1><p>two</p>")
    assert t == "one two"


def test_title_and_links(spark):
    _, title, n = _extract(
        spark,
        '<title>hi</title><a href="/a">x</a><a href="/b">y</a>'
        "<a href='/single-quoted'>z</a>",
    )
    assert title == "hi"
    assert n == 2  # the double-quoted-form contract


def test_absent_title_is_empty(spark):
    _, title, n = _extract(spark, "<p>no head</p>")
    assert title == "" and n == 0
