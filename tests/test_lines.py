"""Line-level boilerplate removal (operators/lines.py) on planted
fixtures: keep/drop decisions, threshold boundary, order preservation,
normalization, and the broadcast-anti-join plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from northwind_etl_spark.operators.lines import (
    line_doc_frequency,
    remove_boilerplate_lines,
    split_lines,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


FOOTER = "copyright 2026 example corp"
HEADER = "welcome to example.com"


def _fixture(spark):
    # 6 docs; HEADER on all (df=6), FOOTER on exactly 3 (df=3 — the
    # threshold boundary at min_df_frac=0.5), "shared pair" on 2
    # (df=2, below threshold → kept).  doc 5 is pure boilerplate.
    rows = [
        (0, f"{HEADER}\nalpha beta\nshared pair line\n{FOOTER}"),
        (1, f"{HEADER}\ngamma delta\nshared pair line"),
        (2, f"{HEADER}\n   \nepsilon zeta\n{FOOTER}"),
        (3, f"{HEADER}\neta theta\niota kappa"),
        (4, f"Welcome To EXAMPLE.com\nlambda mu"),
        (5, f"{HEADER}\n{FOOTER}"),
    ]
    return _docs(spark, rows)


def test_split_lines_drops_blanks(spark):
    lines = split_lines(_docs(spark, [(0, "a\n   \n\nb")]))
    got = [(r["pos"], r["line"]) for r in lines.collect()]
    assert got == [(0, "a"), (3, "b")]


def test_line_doc_frequency_is_distinct_docs(spark):
    # the same line twice in one doc counts once
    lines = split_lines(_docs(spark, [(0, "x\nx"), (1, "x"), (2, "y")]))
    freq = {
        r["line_key"]: r["line_df"]
        for r in line_doc_frequency(lines).collect()
    }
    lk = lambda s: F.md5(F.lower(F.trim(F.lit(s))))
    key_x = spark.range(1).select(lk("x").alias("k")).first()["k"]
    key_y = spark.range(1).select(lk("y").alias("k")).first()["k"]
    assert freq[key_x] == 2 and freq[key_y] == 1


def test_keep_drop_decisions_and_boundary(spark):
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            _fixture(spark), min_df_frac=0.5
        ).collect()
    }
    # HEADER df=6 (lower/trim normalization folds doc 4's casing in)
    # and FOOTER df=3 both hit df*2 >= 6 → dropped everywhere;
    # "shared pair line" df=2 → kept.
    assert out[0]["cleaned_text"] == "alpha beta\nshared pair line"
    assert out[1]["cleaned_text"] == "gamma delta\nshared pair line"
    assert out[2]["cleaned_text"] == "epsilon zeta"
    assert out[3]["cleaned_text"] == "eta theta\niota kappa"
    assert out[4]["cleaned_text"] == "lambda mu"
    # pure-boilerplate doc survives with empty text, not a missing row
    assert out[5]["n_kept"] == 0 and out[5]["cleaned_text"] == ""
    # counts: blank line in doc 2 is neither counted nor kept
    assert out[2]["n_lines"] == 3 and out[2]["n_dropped"] == 2
    assert all(
        r["n_lines"] == r["n_kept"] + r["n_dropped"] for r in out.values()
    )


def test_doc_with_no_real_lines_still_emits_a_row(spark):
    # contract: one output row per input document — blank-only and
    # NULL texts included (no silent drop)
    rows = [(0, "a b\nshared"), (1, "   \n  "), (2, None), (3, "shared")]
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            _docs(spark, rows), min_df_frac=0.5
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    for d in (1, 2):
        assert out[d]["n_lines"] == 0 and out[d]["cleaned_text"] == ""
    # 'shared' df=2 of 4 docs → 2*2 >= 4 → dropped
    assert out[0]["cleaned_text"] == "a b" and out[3]["n_kept"] == 0


def test_regex_metachar_delimiter_is_literal(spark):
    rows = [(0, "keep me|boiler|also kept"), (1, "boiler"), (2, "boiler")]
    out = remove_boilerplate_lines(
        _docs(spark, rows), min_df_frac=0.6, delim="|"
    )
    got = out.where(F.col("doc_id") == 0).first()
    assert got["n_lines"] == 3 and got["cleaned_text"] == "keep me|also kept"


def test_order_preserved_across_removals(spark):
    rows = [
        (0, "boiler\nfirst\nboiler\nsecond\nboiler\nthird"),
        (1, "boiler"),
    ]
    out = remove_boilerplate_lines(_docs(spark, rows), min_df_frac=0.9)
    got = out.where(F.col("doc_id") == 0).first()
    assert got["cleaned_text"] == "first\nsecond\nthird"


def test_no_boilerplate_below_threshold_is_identity(spark):
    rows = [(0, "a b\nc d"), (1, "e f\ng h"), (2, "i j")]
    out = remove_boilerplate_lines(_docs(spark, rows), min_df_frac=0.9)
    assert out.where(F.col("n_dropped") > 0).count() == 0
    texts = {r["doc_id"]: r["cleaned_text"] for r in out.collect()}
    assert texts == {0: "a b\nc d", 1: "e f\ng h", 2: "i j"}


def test_removal_is_broadcast_join_single_agg(spark):
    """The boilerplate filter must never shuffle the line table: the
    flagged join against the (small by definition) boilerplate key set
    has to be broadcast, with no SortMergeJoin anywhere — counting and
    reassembly share one aggregation, so there is no per-doc join."""
    plan = (
        remove_boilerplate_lines(_fixture(spark), min_df_frac=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_global_line_dedup_keeps_first_occurrence_only(spark):
    from northwind_etl_spark.operators.lines import global_line_dedup

    df = spark.createDataFrame(
        [
            (1, "shared header\nunique one\nshared footer"),
            (2, "shared header\nunique two\nshared footer"),
            (3, "shared header\nshared footer"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in global_line_dedup(df).collect()}
    # doc 1 is first everywhere: keeps all 3 lines
    assert out[1].n_lines == 3 and out[1].kept_lines == 3
    # doc 2 keeps only its unique line
    assert out[2].n_lines == 3 and out[2].kept_lines == 1
    # doc 3 is all duplicates: empty rebuild hashes md5('')
    import hashlib

    assert out[3].kept_lines == 0
    assert out[3].cleaned_md5 == hashlib.md5(b"").hexdigest()
    # doc 2's rebuilt text is exactly its unique line
    assert out[2].cleaned_md5 == hashlib.md5(b"unique two").hexdigest()


def test_global_line_dedup_case_insensitive_key_order_preserved(spark):
    import hashlib

    from northwind_etl_spark.operators.lines import global_line_dedup

    df = spark.createDataFrame(
        [(1, "Alpha\nbeta"), (2, "ALPHA\ngamma\nBETA")],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in global_line_dedup(df).collect()}
    # doc 2's ALPHA/BETA normalize to doc 1's keys -> struck; gamma
    # survives in original position
    assert out[2].kept_lines == 1
    assert out[2].cleaned_md5 == hashlib.md5(b"gamma").hexdigest()
    assert out[1].kept_lines == 2
    assert out[1].cleaned_md5 == hashlib.md5(b"Alpha\nbeta").hexdigest()
