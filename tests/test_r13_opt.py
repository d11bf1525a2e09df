"""Focused tests for the r13 OPTIMIZATION-round changes.  Every change
must be result-identical — these tests pin that:

- the one-parse literal builders (functions/arrays.py) equal the old
  element-wise F.lit spelling value-for-value (the equality the r12
  header comment promised — ADVICE r12);
- source_parquet_bytes handles single-file AND directory-layout
  parquet sources (ADVICE r12: getsize on a directory returned the
  inode size and degraded the adaptive partition count to 1);
- the selection walk's struct-isin predicate (ADVICE r12) keeps the
  exact per-group answers, and NULL group keys are rejected up front
  with an actionable error instead of a deep AssertionError.
"""

from __future__ import annotations

import os
import random
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.functions.arrays import (
    lit_decimal_array,
    lit_double_array,
    lit_double_matrix,
    lit_long_array,
)
from northwind_etl_spark.operators import selection as SEL
from northwind_etl_spark.streaming.events_stream import source_parquet_bytes


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_lit_double_array_equals_elementwise_lits(spark):
    rng = random.Random(5)
    vals = [rng.uniform(-1e12, 1e12) for _ in range(200)] + [
        0.0, -0.0, 1e-300, 1.7976931348623157e308, 5e-324, 123456.789
    ]
    fast = _one(spark, lit_double_array(vals))
    slow = _one(spark, F.array(*[F.lit(float(v)) for v in vals]))
    assert len(fast) == len(slow) == len(vals)
    for a, b, v in zip(fast, slow, vals):
        # bit-identical doubles, not approx: repr() round-trips and
        # string->double casts are correctly rounded
        assert a == b == v
        assert str(a) == str(b) == str(float(v))


def test_lit_long_array_equals_elementwise_lits(spark):
    vals = [0, 1, -1, 2**62, -(2**62), 42]
    fast = _one(spark, lit_long_array(vals))
    slow = _one(
        spark, F.array(*[F.lit(int(v)).cast("long") for v in vals])
    )
    assert fast == slow == vals


def test_lit_decimal_array_equals_elementwise_lits(spark):
    strs = ["0.000000000001", "-3.141592653589", "99.999999999999", "0E-12"]
    fast = _one(spark, lit_decimal_array(strs, 14, 12))
    slow = _one(
        spark,
        F.array(
            *[F.lit(s).cast("decimal(14,12)") for s in strs]
        ),
    )
    assert fast == slow == [Decimal(s) for s in strs]


def test_lit_double_matrix_equals_elementwise_lits(spark):
    rng = random.Random(11)
    rows = [[rng.gauss(0, 10) for _ in range(8)] for _ in range(16)]
    fast = _one(spark, lit_double_matrix(rows))
    slow = _one(
        spark,
        F.array(
            *[F.array(*[F.lit(float(v)) for v in row]) for row in rows]
        ),
    )
    assert fast == slow
    for frow, row in zip(fast, rows):
        assert list(frow) == [float(v) for v in row]


def test_source_parquet_bytes_file_dir_missing(tmp_path):
    f = tmp_path / "single.parquet"
    f.write_bytes(b"x" * 1234)
    assert source_parquet_bytes(str(f)) == 1234

    d = tmp_path / "dataset.parquet"
    sub = d / "k=1"
    sub.mkdir(parents=True)
    (d / "part-0.parquet").write_bytes(b"a" * 100)
    (sub / "part-1.parquet").write_bytes(b"b" * 50)
    (d / "_SUCCESS").write_bytes(b"")
    (d / ".hidden.crc").write_bytes(b"c" * 999)
    # data files only: 100 + 50; markers and dotfiles excluded
    assert source_parquet_bytes(str(d)) == 150

    assert source_parquet_bytes(str(tmp_path / "absent.parquet")) is None


def test_stream_reads_directory_layout_source(spark, tmp_path):
    """A DIRECTORY-layout events.parquet must stream the same rows as
    the single-file fixture (the first r13 scale-lane run drained 0
    rows: the symlink watch-dir made the file source see a
    subdirectory, which it silently skips)."""
    import shutil

    from northwind_etl_spark.plans.queries import stream_tumbling_event_counts

    src = "/root/testdata/sf0.001"
    sf_dir = tmp_path / "sfdir"
    evdir = sf_dir / "events.parquet"
    evdir.mkdir(parents=True)
    shutil.copy(f"{src}/events.parquet", evdir / "part-00000.parquet")
    (evdir / "_SUCCESS").write_bytes(b"")

    got = sorted(
        tuple(r) for r in stream_tumbling_event_counts(spark, str(sf_dir)).collect()
    )
    want = sorted(
        tuple(r) for r in stream_tumbling_event_counts(spark, src).collect()
    )
    assert got == want and len(got) > 0


def test_group_selection_rejects_null_group_keys(spark):
    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), ("a", 3.0)], ["g", "x"]
    )
    with pytest.raises(ValueError, match="NULL group key"):
        SEL.group_kth_smallest(df, "x", "g")


def test_group_selection_walk_isin_many_groups(spark):
    """Many (group, quantile) keys exercise the flat struct-isin walk
    predicate; answers must equal the per-group numpy sort."""
    rng = random.Random(23)
    rows = [
        (f"g{rng.randrange(40)}", rng.uniform(-1e3, 1e3))
        for _ in range(6000)
    ]
    df = spark.createDataFrame(rows, ["g", "x"])
    res = SEL.group_quantiles(df, "x", "g", [0.1, 0.5, 0.9])
    import math

    by_g: dict[str, list[float]] = {}
    for g, x in rows:
        by_g.setdefault(g, []).append(x)
    for g in by_g:
        by_g[g].sort()
    assert len(res) == 3 * len(by_g)
    for g, qq, v, k, n in res:
        assert n == len(by_g[g])
        assert k == max(1, math.ceil(qq * n))
        assert v == by_g[g][k - 1]


def _dense_pagerank_reference(spark, edges, *, iterations, damping, scale):
    """The pre-r13 DENSE loop (ranks zero-filled against nodes every
    round), kept as the reference the sparse rewrite must equal."""
    num, den = damping
    e = edges.select("src", "dst")
    nodes = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    edges_od = e.join(outdeg, "src")
    base = (scale * (den - num)) // den
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iterations):
        contribs = (
            ranks.join(edges_od, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("rank DIV od")).alias("m"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.expr(f"({num} * coalesce(m, 0L)) DIV {den}")
            ).alias("rank"),
        )
    return ranks


@pytest.mark.parametrize("iterations", [1, 3, 8])
def test_pagerank_sparse_equals_dense_reference(spark, iterations):
    """The r13 sparse-mass pagerank must be bit-identical to the old
    dense loop — including dangling nodes (in-edges only) and source
    nodes (out-edges only, absent from every m relation)."""
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
            ("d", "a"),            # d: out-only (never in m)
            ("c", "e"),            # e: dangling (no out-edges)
            ("f", "e"), ("f", "b"),
        ],
        ["src", "dst"],
    )
    from northwind_etl_spark.operators.graph import pagerank_fixed_point

    got = sorted(
        (r["node"], r["rank"])
        for r in pagerank_fixed_point(
            edges, iterations=iterations, checkpoint_every=2
        ).collect()
    )
    want = sorted(
        (r["node"], r["rank"])
        for r in _dense_pagerank_reference(
            spark, edges, iterations=iterations,
            damping=(85, 100), scale=10**12,
        ).collect()
    )
    assert got == want


@pytest.mark.parametrize("iterations", [1, 4])
def test_lpa_union_equals_leftjoin_reference(spark, iterations):
    """The r13 isolated-union LPA must equal the old per-round
    left-join form — including a node with NO in-neighbor (directed
    edge input), which keeps its own label every round."""
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),
            ("b", "c"), ("c", "b"),
            ("x", "a"),            # x: no in-edges, out only
            ("d", "e"), ("e", "d"),
        ],
        ["src", "dst"],
    )
    from northwind_etl_spark.operators.graph import label_propagation

    got = sorted(
        (r["node"], r["label"])
        for r in label_propagation(
            edges, iterations=iterations, checkpoint_every=2
        ).collect()
    )

    # old left-join reference
    e = edges.select(F.col("src").alias("__s"), F.col("dst").alias("__d"))
    labels = (
        e.select(F.col("__s").alias("node"))
        .union(e.select("__d"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(iterations):
        pick = (
            e.join(labels.withColumnRenamed("node", "__s"), "__s")
            .groupBy(F.col("__d").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("__c"))
            .groupBy("node")
            .agg(F.max(F.struct("__c", "label")).alias("__b"))
            .select("node", F.col("__b.label").alias("__new"))
        )
        labels = labels.join(pick, "node", "left").select(
            "node", F.coalesce("__new", "label").alias("label")
        )
    want = sorted((r["node"], r["label"]) for r in labels.collect())
    assert got == want


def test_simhash_expr_rewrite_identical(spark):
    """The r13 SQL-string spelling of the packed simhash (16 packed
    sums + 64-term fingerprint OR) must equal the untouched
    Column-API unpacked path bit-for-bit."""
    from northwind_etl_spark.operators.dedup import simhash_fingerprints

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),
        (3, "one two three four five six seven"),
        (4, "lorem ipsum dolor sit amet consectetur"),
        (5, "alpha alpha alpha beta"),
        (6, "x"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fast = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(df, "text", "doc_id").collect()
    }
    slow = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(
            df, "text", "doc_id", packed=False
        ).collect()
    }
    assert fast == slow


def test_simhash_md5_expr_rewrite(spark):
    """The r13 SQL-string spelling of the md5 simhash twin must equal
    a pure-Python replay of the definition (md5 leading 16 hex chars
    as two 32-bit halves, ±count votes, bit 63 first)."""
    import hashlib

    from northwind_etl_spark.operators.dedup import simhash_fingerprints_md5

    rows = [
        (1, "alpha beta gamma  beta"),
        (2, "delta epsilon zeta eta theta"),
        (3, "one one one two"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["simhash_bits"]
        for r in simhash_fingerprints_md5(df, "text", "doc_id").collect()
    }

    def expected(text: str) -> str:
        counts: dict[str, int] = {}
        for tok in text.split():
            counts[tok] = counts.get(tok, 0) + 1
        votes = [0] * 64
        for tok, c in counts.items():
            hx = hashlib.md5(tok.encode()).hexdigest()
            h_hi, h_lo = int(hx[:8], 16), int(hx[8:16], 16)
            for b in range(64):
                src = h_hi if b >= 32 else h_lo
                bit = (src >> (b % 32)) & 1
                votes[b] += c if bit == 1 else -c
        return "".join(
            "1" if votes[b] > 0 else "0" for b in range(63, -1, -1)
        )

    assert got == {i: expected(t) for i, t in rows}


def test_bpe_one_fold_encode_equals_chained(spark):
    """The r13 single nested-fold merge application must equal the
    chained per-merge folds — including tokens carrying SQL-hostile
    characters (quotes, backslashes) through the escaped literals."""
    from northwind_etl_spark.operators.bpe import (
        _apply_all_merges_expr,
        _apply_merge,
    )

    words = [
        "banana", "bandana", "aaa", "ab", "o'brien", "a\\b'c", "x",
    ]
    df = spark.createDataFrame([(w,) for w in words], ["word"]).select(
        "word",
        F.lit(1).alias("freq"),
        F.split(F.col("word"), "(?!^)(?=.)").alias("syms"),
    )
    merges = [("a", "n"), ("an", "a"), ("'", "b"), ("\\", "b")]
    chained = df
    for left, right in merges:
        chained = _apply_merge(chained, left, right)
    got_chained = {
        r["word"]: r["syms"] for r in chained.collect()
    }
    one_fold = df.select(
        "word", _apply_all_merges_expr(merges).alias("syms")
    )
    got_fold = {r["word"]: r["syms"] for r in one_fold.collect()}
    assert got_fold == got_chained
    # spot-check the classic run semantics: a,a,a -> (aa),a under ("a","a")
    run = spark.createDataFrame([("aaa",)], ["word"]).select(
        "word",
        F.lit(1).alias("freq"),
        F.split(F.col("word"), "(?!^)(?=.)").alias("syms"),
    )
    got = run.select(
        _apply_all_merges_expr([("a", "a")]).alias("syms")
    ).first()["syms"]
    assert got == ["aa", "a"]


def test_group_selection_int_group_keys_walk(spark):
    """Integer group keys go through the same struct-isin walk (the
    literal structs are cast to the frame's exact key type)."""
    rows = [(i % 5, float((i * 13) % 101)) for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "x"])
    res = SEL.group_kth_smallest(df, "x", "g", q=0.5)
    for g, v, k, n in res:
        mine = sorted(x for gg, x in rows if gg == g)
        assert v == mine[k - 1]
