"""Count-Min Sketch (operators/cms.py): no-undercount guarantee,
error bound, merge linearity, weighted-build equivalence, and the
broadcast probe-join plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from northwind_etl_spark.operators.cms import cms_build, cms_estimate, cms_merge


def _items(spark, counts: dict[str, int]):
    rows = [(v,) for v, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "term string")


COUNTS = {f"w{i}": (i % 7) + 1 for i in range(200)} | {"hot": 500, "warm": 50}


def _estimates(spark, *, depth=4, width=1024):
    items = _items(spark, COUNTS)
    sketch = cms_build(items, "term", depth=depth, width=width)
    queries = spark.createDataFrame([(t,) for t in COUNTS], "term string")
    est = cms_estimate(sketch, queries, "term", depth=depth, width=width)
    return {r["term"]: r["cms_estimate"] for r in est.collect()}


def test_never_undercounts(spark):
    est = _estimates(spark)
    for term, true_n in COUNTS.items():
        assert est[term] >= true_n, term


def test_overcount_within_bound(spark):
    # E[overcount] ≤ N/width per row; MIN over 4 rows ⇒ exceeding
    # 10·N/width on any query is ~impossible at this size
    est = _estimates(spark)
    n_total = sum(COUNTS.values())
    bound = 10 * n_total / 1024
    for term, true_n in COUNTS.items():
        assert est[term] - true_n <= bound, (term, est[term], true_n)


def test_unknown_item_reads_like_absent(spark):
    items = _items(spark, {"a": 3, "b": 5})
    sketch = cms_build(items, "term", depth=4, width=1024)
    q = spark.createDataFrame([("zzz_never_seen",)], "term string")
    (got,) = cms_estimate(sketch, q, "term").collect()
    # may collide upward but never reads negative / null
    assert 0 <= got["cms_estimate"] <= 8


def test_merge_is_linear(spark):
    half_a = {t: n for t, n in COUNTS.items() if hash(t) % 2 == 0}
    half_b = {t: n for t, n in COUNTS.items() if hash(t) % 2 == 1}
    merged = cms_merge(
        cms_build(_items(spark, half_a), "term"),
        cms_build(_items(spark, half_b), "term"),
    )
    direct = cms_build(_items(spark, COUNTS), "term")
    m = {(r["row"], r["cell"]): r["cnt"] for r in merged.collect()}
    d = {(r["row"], r["cell"]): r["cnt"] for r in direct.collect()}
    assert m == d


def test_weighted_build_equals_raw_build(spark):
    raw = cms_build(_items(spark, COUNTS), "term")
    agg = spark.createDataFrame(
        [(t, n) for t, n in COUNTS.items()], "term string, n long"
    )
    weighted = cms_build(agg, "term", weight_col="n")
    r = {(x["row"], x["cell"]): x["cnt"] for x in raw.collect()}
    w = {(x["row"], x["cell"]): x["cnt"] for x in weighted.collect()}
    assert r == w


def test_grid_mismatch_raises_instead_of_underestimating(spark):
    import pytest

    items = _items(spark, {"a": 3})
    sketch = cms_build(items, "term", depth=4, width=2048)
    q = spark.createDataFrame([("a",)], "term string")
    # stamped grid is used when params are omitted
    (got,) = cms_estimate(sketch, q, "term").collect()
    assert got["cms_estimate"] >= 3
    # contradicting the stamp must raise, never silently estimate 0
    with pytest.raises(ValueError, match="contradicts"):
        cms_estimate(sketch, q, "term", width=1024)
    with pytest.raises(ValueError, match="incompatible"):
        cms_merge(sketch, cms_build(items, "term", depth=4, width=1024))


def test_probe_join_is_broadcast(spark):
    items = _items(spark, COUNTS)
    sketch = cms_build(items, "term")
    q = spark.createDataFrame([("hot",)], "term string")
    plan = (
        cms_estimate(sketch, q, "term")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_group_sample_equals_single_window(spark, sf_dir):
    from pyspark.sql import Window
    from northwind_etl_spark.operators.sampling import group_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    two_phase = group_sample(docs, ["source"], "doc_id", k=20)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    single = (
        docs.select("source", "doc_id")
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= 20)
    )
    a = sorted(map(tuple, two_phase.select("source", "doc_id", "sample_rank").collect()))
    b = sorted(map(tuple, single.collect()))
    assert a == b


def test_group_sample_counts_and_partitioning_invariance(spark, sf_dir):
    from northwind_etl_spark.operators.sampling import group_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = group_sample(docs, ["source"], "doc_id", k=20)
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {s: min(20, n) for s, n in sizes.items()}
    rep = group_sample(docs.repartition(16), ["source"], "doc_id", k=20)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, rep.collect()))


def test_group_sample_plans_partial_window_group_limit(spark, sf_dir):
    """group_sample's own built plan must carry the Partial
    WindowGroupLimit — its window orders by an md5 EXPRESSION (not a
    plain column), and the rewrite could regress on expression
    ordering without group_topk's plain-column assertion noticing."""
    from northwind_etl_spark.operators.sampling import group_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = group_sample(docs, ["source"], "doc_id", k=20)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan
