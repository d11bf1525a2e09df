"""Jaro-Winkler proofs (operators/fuzzy.py::jaro_winkler /
jaro_winkler_match_pairs): the Python implementation is BIT-identical
to DuckDB's native jaro_winkler_similarity (the oracle's verifier), the
definition's edge cases hold, and the pair operator keeps the blocking
family's recall/ordering contract."""

from __future__ import annotations

import random

import duckdb
import pytest

from northwind_etl_spark.operators.fuzzy import (
    jaro_winkler,
    jaro_winkler_match_pairs,
)


def test_known_values():
    # classic published fixtures
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111111111, abs=0)
    assert jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133333333333332, abs=0)
    # definition edges: no window clamp, boost threshold, empty convention
    assert jaro_winkler("ab", "ba") == 0.0  # window floor(2/2)-1 = 0
    assert jaro_winkler("abcdef", "abczzz") == pytest.approx(2 / 3)  # jaro<=0.7: no boost
    assert jaro_winkler("", "") == 0.0 and jaro_winkler("", "abc") == 0.0
    assert jaro_winkler("abc", "abc") == 1.0


def test_bit_identical_to_duckdb_fuzz():
    con = duckdb.connect()
    rng = random.Random(42)
    alpha = "abcdefg #0123"
    for _ in range(1500):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        exp = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == exp, (a, b)


def test_pair_operator_matches_direct_allpairs(spark):
    rows = [
        (1, "small ring"),
        (2, "small rings"),
        (3, "smal ring"),
        (4, "blue bolt"),
        (5, "blue belt"),
        (6, "zzzz qqqq"),
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.id_a, r.id_b): r.jw
        for r in jaro_winkler_match_pairs(
            df, "name", "id", threshold=0.9, max_df=100
        ).collect()
    }
    # direct all-pairs ground truth with the same metric
    import itertools

    exp = {}
    for (ia, na), (ib, nb) in itertools.combinations(rows, 2):
        v = jaro_winkler(na, nb)
        if v >= 0.9:
            exp[(ia, ib)] = v
    assert got == exp and (1, 2) in got and (4, 5) in got
    assert all(a < b for a, b in got)  # sorted-posting pair orientation


def test_normalization_and_threshold(spark):
    df = spark.createDataFrame(
        [(1, "  Small Ring "), (2, "small ring"), (3, "SMALL RINGS")],
        ["id", "name"],
    )
    got = jaro_winkler_match_pairs(df, "name", "id", threshold=0.99).collect()
    # 1 and 2 normalize identical -> jw exactly 1.0; 3 is below 0.99? no:
    # 'small ring' vs 'small rings' jw > 0.98 -- compute and assert exactly
    pairs = {(r.id_a, r.id_b): r.jw for r in got}
    assert pairs[(1, 2)] == 1.0
    expected_13 = jaro_winkler("small ring", "small rings")
    for k, v in pairs.items():
        if k != (1, 2):
            assert v == expected_13


def test_sorted_neighborhood_matches_definition(spark):
    """SNM candidates are EXACTLY the pairs within `window` ranks of
    the (normalized name, id) total order; survivors match the direct
    JW evaluation over that candidate set."""
    from northwind_etl_spark.operators.fuzzy import sorted_neighborhood_pairs

    rows = [
        (10, "  Alpha Widget "),
        (11, "alpha widgets"),
        (12, "alpha widgetz"),
        (13, "beta gadget"),
        (14, "beta gadgets"),
        (15, "zeta unrelated"),
        (16, "alpha widget"),  # exact dup of 10 after normalization
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    w = 2
    got = {
        (r.id_a, r.id_b): r.jw
        for r in sorted_neighborhood_pairs(
            df, "name", "id", window=w, threshold=0.85
        ).collect()
    }
    # ground truth: rank by (normalized, id), pair ranks within w
    norm = sorted((n.strip().lower(), i) for i, n in rows)
    exp = {}
    for a in range(len(norm)):
        for b in range(a + 1, min(a + w + 1, len(norm))):
            v = jaro_winkler(norm[a][0], norm[b][0])
            if v >= 0.85:
                exp[(norm[a][1], norm[b][1])] = v
    assert got == exp
    # the exact-dup pair must surface with jw == 1.0 (adjacent ranks)
    assert got[(10, 16)] == 1.0
    # data-independent candidate bound: never more than n*w survivors
    assert len(got) <= len(rows) * w


def test_sorted_neighborhood_recall_tradeoff(spark):
    """The documented SNM miss: prefix-divergent near-identical names
    that sort far apart are NOT candidates (q-gram blocking's case),
    while a wide-enough window recovers sort-adjacent pairs."""
    from northwind_etl_spark.operators.fuzzy import sorted_neighborhood_pairs

    rows = [
        (1, "aaaa cable kit"),
        (2, "zzzz cable kit"),  # JW-similar suffix, sorts to the far end
        (3, "aaab cable kit"),
        (4, "mmmm mmmm mmmm"),
        (5, "mmmm mmmm mmmn"),
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, "name", "id", window=1, threshold=0.8
        ).collect()
    }
    assert (1, 3) in got and (4, 5) in got  # sort-adjacent pairs found
    assert (1, 2) not in got and (3, 2) not in got  # prefix-divergent missed


def test_blocking_quality_metrics_planted(spark, tmp_path):
    """The metrics entry on a planted dictionary where every count is
    hand-checkable: candidates, relative truths, and both ratios."""
    from northwind_etl_spark.plans.queries import blocking_quality_metrics

    # 4 names: two JW-close pairs; one pair also sort-adjacent
    rows = [
        (1, "alpha widget"),
        (2, "alpha widgets"),
        (3, "beta gadget"),
        (4, "beta gadgets"),
    ]
    full = [(k, n, "B", "T", 1, 1.0) for k, n in rows]
    spark.createDataFrame(
        full,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    out = {
        r.method: r
        for r in blocking_quality_metrics(spark, str(tmp_path)).collect()
    }
    n_pairs = 4 * 3 / 2
    for m in ("qgram", "snm"):
        r = out[m]
        assert 0 < r.n_candidates <= n_pairs
        assert r.n_true_found <= r.n_candidates
        assert r.reduction_ratio == 1.0 - r.n_candidates * 2.0 / (4.0 * 3.0)
        assert 0.0 <= r.relative_recall <= 1.0
    # both pairs are sort-adjacent AND share rare grams -> both
    # blockers see both true pairs here
    assert out["qgram"].n_true_found == out["snm"].n_true_found == 2
    assert out["qgram"].relative_recall == 1.0
    assert out["snm"].relative_recall == 1.0


def test_snm_plan_has_no_single_partition_exchange(spark):
    """SNM inherits global_row_number's two-exchange ranking — the
    candidate plan must stay free of Exchange SinglePartition."""
    from northwind_etl_spark.operators.fuzzy import (
        sorted_neighborhood_candidates,
    )

    df = spark.createDataFrame(
        [(i, f"name {i % 50} v{i}") for i in range(300)], ["id", "name"]
    )
    out = sorted_neighborhood_candidates(df, "name", "id", window=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
