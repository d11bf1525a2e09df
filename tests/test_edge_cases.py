"""Failure-mode and edge-case behavior: the engine must degrade
predictably, not crash or silently corrupt."""

from __future__ import annotations

from pyspark.sql import functions as F

from northwind_etl_spark.operators.dedup import minhash_signatures, ngram_jaccard
from northwind_etl_spark.operators.sessionize import extract_props, sessionize
from northwind_etl_spark.operators.text import lang_id, text_quality


def test_empty_and_whitespace_documents(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two three four")], "doc_id LONG, text STRING"
    )
    q = {r.doc_id: r for r in text_quality(docs).collect()}
    assert q[1].n_tokens == 0 and q[1].uniq_ratio is None
    assert q[2].n_tokens == 0
    assert q[3].n_tokens == 4
    # docs with no shingles simply emit no signature rows
    assert minhash_signatures(docs, "text", "doc_id").count() == 1
    # lang_id: no markers → 'und'
    preds = {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}
    assert preds[1] == "und" and preds[2] == "und"


def test_jaccard_no_shared_shingles_is_empty(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "v w x y z")], "doc_id LONG, text STRING"
    )
    assert ngram_jaccard(docs, "text", "doc_id", threshold=0.01).count() == 0


def test_jaccard_hot_shingle_capped_by_max_df(spark):
    """A boilerplate shingle shared by every doc must not explode into
    O(n²) pairs: with max_df below the corpus size, the hot shingle is
    dropped and only genuinely-similar pairs (sharing rare shingles)
    survive."""
    boiler = "click here to unsubscribe"
    rows = [(i, f"{boiler} item{i} alpha{i} beta{i}") for i in range(1, 31)]
    # docs 100/101 share their full rare tail → a real near-dup pair
    rows += [(100, f"{boiler} same rare tail here"), (101, f"{boiler} same rare tail here")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = ngram_jaccard(docs, "text", "doc_id", threshold=0.5, max_df=10)
    got = [(r.id_a, r.id_b) for r in out.collect()]
    assert got == [(100, 101)]
    # with the cap above corpus size the boilerplate links everything:
    # the pair count jumps — proving the cap was what bounded the work
    uncapped = ngram_jaccard(docs, "text", "doc_id", threshold=0.01, max_df=1000)
    assert uncapped.count() > 100


def test_contamination_finds_planted_leak(spark):
    from northwind_etl_spark.operators.contamination import cross_corpus_overlap

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated training material here today"),
        ],
        "doc_id LONG, text STRING",
    )
    ev = spark.createDataFrame(
        [
            (100, "quick brown fox jumps over a fence"),  # leaked prefix
            (101, "nothing in common with anything else"),
        ],
        "doc_id LONG, text STRING",
    )
    hits = cross_corpus_overlap(train, ev, "text", "doc_id", min_shared=2)
    got = {(r.train_id, r.eval_id): r.n_shared for r in hits.collect()}
    assert set(got) == {(1, 100)}
    assert got[(1, 100)] >= 3  # shared 3-gram shingles of the leaked span


def test_contamination_hot_shingle_dropped(spark):
    from northwind_etl_spark.operators.contamination import cross_corpus_overlap

    boiler = "click here to unsubscribe now"
    train = spark.createDataFrame([(1, boiler)], "doc_id LONG, text STRING")
    ev = spark.createDataFrame(
        [(100 + i, boiler) for i in range(5)], "doc_id LONG, text STRING"
    )
    # every eval doc carries the boilerplate → its shingles exceed
    # max_df and are dropped: no pairs, instead of 5 spurious hits
    assert (
        cross_corpus_overlap(train, ev, "text", "doc_id", min_shared=1, max_df=3).count()
        == 0
    )


def test_fuzzy_match_finds_planted_typos(spark):
    from northwind_etl_spark.operators.fuzzy import fuzzy_match_pairs

    rows = [
        (1, "Jonathan Smith"),
        (2, "Jonathan Smyth"),   # 1 substitution from 1
        (3, "Jonathan Smithe"),  # 1 insertion from 1
        (4, "Margaret Jones"),   # unrelated
        (5, "MARGARET JONES "),  # normalization twin of 4 (distance 0)
    ]
    df = spark.createDataFrame(rows, "id LONG, name STRING")
    got = {
        (r.id_a, r.id_b): r.edit_distance
        for r in fuzzy_match_pairs(df, "name", "id", max_distance=1).collect()
    }
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(4, 5)] == 0
    assert (1, 4) not in got  # unrelated names never pair
    assert (2, 3) not in got  # smyth↔smithe is 2 edits, over max_distance


def test_fuzzy_match_hot_gram_capped(spark):
    from northwind_etl_spark.operators.fuzzy import fuzzy_match_pairs

    # every name shares the common prefix; only the planted twin pair
    # shares a RARE gram → with a tight max_df only that pair survives
    rows = [(i, f"record common prefix {i:04d}") for i in range(1, 40)]
    rows += [(100, "record common prefix zq7x"), (101, "record common prefix zq7y")]
    df = spark.createDataFrame(rows, "id LONG, name STRING")
    got = {(r.id_a, r.id_b) for r in fuzzy_match_pairs(df, "name", "id", max_distance=1, max_df=5).collect()}
    assert (100, 101) in got


def test_repetition_stats_flags_repeated_docs(spark):
    from northwind_etl_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "all words here differ fully"),
            (3, "solo"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert rows[1].top_term_frac == 1.0 and rows[1].top_bigram_frac == 1.0
    assert rows[2].top_term_frac == 0.2
    assert rows[3].n_tokens == 1 and rows[3].top_bigram_frac is None


def test_corrupt_json_props_become_null(spark):
    ev = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "not json"), (3, None)], "event_id LONG, props STRING"
    )
    out = {r.event_id: r.prop_k for r in extract_props(ev).collect()}
    assert out == {1: 5, 2: None, 3: None}


def test_single_event_user_gets_one_session(spark):
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7, 1.0)],
        "event_id LONG, ts STRING, user_id LONG, value DOUBLE",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    rows = sessionize(ev).collect()
    assert len(rows) == 1
    assert rows[0].session_id == 1 and rows[0].n_events == 1


def test_lang_id_scored_real_signal_and_edge_cases(spark):
    """The trained scorer (frozen weights, langid_weights.py) must
    classify real-signal function-word text correctly, emit exact
    BIGINT margins, and degrade to 'und' when no trigram exists."""
    from northwind_etl_spark.operators.text import lang_id_scored

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog are in that house with them"),
            (2, "der hund und die katze sind nicht mit ihm auf dem dach"),
            (3, "le chien et la maison sont dans les rues avec elle"),
            (4, "el perro y los gatos en una casa para este"),
            (5, "wo3 shi4 zai4 zhe4 ge4 de5 he2 bu4 le5 you3"),
            (6, "ab"),  # too short for a trigram
            (7, ""),
        ],
        "doc_id LONG, text STRING",
    )
    rows = {r.doc_id: r for r in lang_id_scored(docs).collect()}
    assert rows[1].lang_pred == "en"
    assert rows[2].lang_pred == "de"
    assert rows[3].lang_pred == "fr"
    assert rows[4].lang_pred == "es"
    assert rows[5].lang_pred == "zh"
    assert rows[6].lang_pred == "und" and rows[6].s_en == 0
    assert rows[7].lang_pred == "und"
    # margins are integers and the argmax margin is strictly dominant
    # for the real-signal docs
    r2 = rows[2]
    assert isinstance(r2.s_de, int)
    assert r2.s_de > max(r2.s_en, r2.s_es, r2.s_fr, r2.s_zh)


def test_lang_id_scored_weights_are_frozen_source(spark):
    """Weight module invariants the oracle depends on: 5 languages x
    256 integer buckets, stable language order."""
    from northwind_etl_spark.functions.langid_weights import (
        LANGID_LANGS,
        LANGID_WEIGHTS,
    )

    assert LANGID_LANGS == ("de", "en", "es", "fr", "zh")
    for lang in LANGID_LANGS:
        w = LANGID_WEIGHTS[lang]
        assert len(w) == 256 and all(isinstance(x, int) for x in w)
