"""Planted-fixture semantics for the r11 operators (mergeable
Misra-Gries top-k, md5-MinHash incremental candidates, longest-prefix
robots match, license rollup, int8 ANN recall helpers).  Cross-engine
value parity is pinned by their registry oracles
(tests/test_oracle_parity.py); these tests pin BEHAVIOR — the MG
error bound, delta==full-restricted equivalence, LPM override chains,
guard raises — on fixtures where the right answer is derivable by
hand."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# ------------------------------------------------- mergeable top-k


def _items_df(spark, counts: dict[str, int]):
    rows = []
    i = 0
    for item, c in counts.items():
        for _ in range(c):
            rows.append((i, item))
            i += 1
    return spark.createDataFrame(rows, "rid LONG, item STRING")


def test_mergeable_topk_bound_holds_on_skew(spark):
    from northwind_etl_spark.operators.heavyhitters import (
        mergeable_topk_sketch,
    )

    counts = {f"t{i:02d}": 3 + i for i in range(30)}
    counts["whale"] = 500
    counts["shark"] = 200
    df = _items_df(spark, counts)
    out = mergeable_topk_sketch(
        df, "item", k=5, shards=4, shard_key="rid"
    ).collect()
    assert len(out) == 5
    exact = counts
    got = {r["item"]: r for r in out}
    # the two dominant items must survive any MG compress with k=5
    assert "whale" in got and "shark" in got
    for r in out:
        true = exact[r["item"]]
        assert r["est_count"] <= true <= r["est_count"] + r["err_bound"], (
            r,
            true,
        )
    # estimates ranked by est keep the true giants on top
    assert out[0]["item"] == "whale" and out[1]["item"] == "shark"


def test_mergeable_topk_exact_when_shards_small(spark):
    from northwind_etl_spark.operators.heavyhitters import (
        mergeable_topk_sketch,
    )

    # <= k distinct values per shard -> no compress anywhere: the
    # summary IS the exact counts and err_bound = 0
    counts = {"a": 7, "b": 5, "c": 3}
    df = _items_df(spark, counts)
    out = mergeable_topk_sketch(
        df, "item", k=10, shards=3, shard_key="rid"
    ).collect()
    assert {r["item"]: r["est_count"] for r in out} == counts
    assert all(r["err_bound"] == 0 for r in out)


# ------------------------------------- md5 MinHash + delta candidates


def _docs_df(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(texts.items())], "doc_id LONG, text STRING"
    )


_BASE_TEXT = "the quick brown fox jumps over the lazy dog near the river bank today"


def test_minhash_md5_twins_collide_all_bands(spark):
    from northwind_etl_spark.operators import dedup as D

    texts = {
        1: _BASE_TEXT,
        2: _BASE_TEXT,  # exact twin: identical shingles -> identical sig
        3: "completely different words about spark catalyst tungsten engines",
    }
    sigs = D.minhash_signatures_md5(
        _docs_df(spark, texts), "text", "doc_id", num_hashes=12, shingle_n=3
    )
    banded = D.band_keys_md5(sigs, "doc_id", bands=4, num_hashes=12)
    pairs = D.delta_candidate_pairs(banded, banded, "doc_id").collect()
    got = {(r["id_a"], r["id_b"]): r["n_shared_bands"] for r in pairs}
    assert got.get((1, 2)) == 4  # all four bands collide
    assert (1, 3) not in got and (2, 3) not in got


def test_delta_candidates_equal_full_restricted(spark):
    """Incremental maintenance invariant: candidates(store, delta) ==
    full-corpus candidates restricted to pairs touching a delta id."""
    from northwind_etl_spark.operators import dedup as D

    texts = {
        1: _BASE_TEXT,
        2: _BASE_TEXT + " extra",
        3: _BASE_TEXT,
        4: "unrelated text streaming shuffle partitions broadcast join",
        5: _BASE_TEXT + " extra",
        6: "unrelated text streaming shuffle partitions broadcast join",
    }
    sigs = D.minhash_signatures_md5(
        _docs_df(spark, texts), "text", "doc_id", num_hashes=12, shingle_n=3
    )
    banded = D.band_keys_md5(sigs, "doc_id", bands=4, num_hashes=12)
    delta_ids = {5, 6}
    delta = banded.where(F.col("doc_id").isin(*delta_ids))
    inc = {
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in D.delta_candidate_pairs(banded, delta, "doc_id").collect()
    }
    full = {
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in D.delta_candidate_pairs(banded, banded, "doc_id").collect()
        if r["id_a"] in delta_ids or r["id_b"] in delta_ids
    }
    assert inc == full and len(inc) > 0


def test_delta_candidates_hot_bucket_raises(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from northwind_etl_spark.operators import dedup as D

    texts = {i: _BASE_TEXT for i in range(1, 7)}  # 6 identical docs
    sigs = D.minhash_signatures_md5(
        _docs_df(spark, texts), "text", "doc_id", num_hashes=12, shingle_n=3
    )
    banded = D.band_keys_md5(sigs, "doc_id", bands=4, num_hashes=12)
    with pytest.raises(SparkRuntimeException, match="exceeds max_bucket"):
        D.delta_candidate_pairs(
            banded, banded, "doc_id", max_bucket=3
        ).collect()


# -------------------------------------------- longest-prefix match


def test_longest_prefix_match_override_chain(spark):
    from northwind_etl_spark.operators.web import longest_prefix_match

    rules = spark.createDataFrame(
        [
            ("/", "allow"),
            ("/static", "deny"),
            ("/static/css", "allow"),
            ("/p", "allow"),
            ("/p/private", "deny"),
        ],
        "prefix STRING, verdict STRING",
    )
    df = spark.createDataFrame(
        [
            (1, "/static/css/site.css"),  # deny overridden back to allow
            (2, "/static/js/app.js"),  # deny
            (3, "/p/private/doc9"),  # allow overridden to deny
            (4, "/p/123"),  # allow
            (5, "/"),  # root allow
            (6, "no-leading-slash"),  # matches nothing
        ],
        "doc_id LONG, path STRING",
    )
    out = {
        r["doc_id"]: (r["matched_prefix"], r["verdict"])
        for r in longest_prefix_match(
            df, rules, "path", default=F.lit("default-allow")
        ).collect()
    }
    assert out[1] == ("/static/css", "allow")
    assert out[2] == ("/static", "deny")
    assert out[3] == ("/p/private", "deny")
    assert out[4] == ("/p", "allow")
    assert out[5] == ("/", "allow")
    assert out[6] == (None, "default-allow")


# ------------------------------------------------- license rollup


def test_license_rollup_fractions_and_eligibility(spark):
    from northwind_etl_spark.operators.web import license_rollup

    rows = [
        ("a.org", "cc-by", 10),
        ("a.org", "cc0", 20),
        ("a.org", "mystery-license", 5),  # neither permissive nor blocked
        ("b.org", "cc-by", 10),
        ("b.org", "noai", 1),
    ]
    df = spark.createDataFrame(rows, "host STRING, lic STRING, w LONG")
    out = {
        r["host"]: r
        for r in license_rollup(df, "host", "lic", weight_col="w").collect()
    }
    a, b = out["a.org"], out["b.org"]
    assert (a["n_docs"], a["n_permissive"], a["n_blocked"]) == (3, 2, 0)
    assert a["weight"] == 35 and a["train_eligible"] is True
    assert a["permissive_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert b["train_eligible"] is False and b["blocked_frac"] == 0.5


# ------------------------------------------------ int8 ANN helpers


def test_int8_cosine_exact_properties(spark):
    from northwind_etl_spark.functions.vectors import (
        int8_codes_expr,
        int8_cosine_expr,
        int_dot_expr,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, -3.0]),
            (2, [2.0, 4.0, -6.0]),  # same direction -> quant cosine 1
            (3, [0.0, 0.0, 0.0]),  # zero vector -> NULL cosine
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    coded = df.select(
        "vec_id", int8_codes_expr("embedding").alias("codes")
    )
    rows = {r["vec_id"]: r["codes"] for r in coded.collect()}
    assert rows[1] == [42, 85, -127]  # floor(x/3*127 + .5)
    assert rows[2] == [42, 85, -127]  # scale-invariant codes
    assert rows[3] == [0, 0, 0]
    a = coded.where(F.col("vec_id") == 1).select(
        F.col("codes").alias("ca")
    )
    pairs = (
        coded.crossJoin(F.broadcast(a))
        .select(
            "vec_id",
            int8_cosine_expr("codes", "ca").alias("cq"),
            int_dot_expr("codes", "ca").alias("dq"),
        )
        .collect()
    )
    got = {r["vec_id"]: (r["cq"], r["dq"]) for r in pairs}
    assert got[1][0] == pytest.approx(1.0)
    assert got[2][0] == pytest.approx(1.0)
    assert got[3][0] is None and got[3][1] == 0
    assert got[1][1] == 42 * 42 + 85 * 85 + 127 * 127
