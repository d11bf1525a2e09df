"""The loop-invariant-input lint itself (tests/iterative_lint.py):
green on the shipped operators, and RED when the persist discipline is
broken (the r07 label_propagation regression replayed on purpose)."""

from __future__ import annotations

from .iterative_lint import lint_iterative_operators, uncached_relation_leaves


def test_iterative_operators_persist_loop_invariants(spark, sf_dir):
    assert lint_iterative_operators(spark, sf_dir) == []


def test_lint_goes_red_when_persist_is_removed(spark, sf_dir, monkeypatch):
    """Red-team the lint: with persist_stage a no-op (exactly the r07
    LPA bug shape), the lint MUST flag both loop operators."""
    import northwind_etl_spark.cache as cache

    monkeypatch.setattr(cache, "persist_stage", lambda df, **kw: df)
    failures = lint_iterative_operators(spark, sf_dir)
    assert any("label_propagation" in f for f in failures)
    assert any("pagerank_fixed_point" in f for f in failures)


def test_uncached_leaf_counter_sees_through_persist(spark, sf_dir):
    """InMemoryRelation hides its cached plan from children() — the
    property the whole lint rests on."""
    spark.catalog.clearCache()
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    assert uncached_relation_leaves(df) == 1
    cached = df.persist()
    try:
        assert uncached_relation_leaves(cached.select("r_name")) == 0
    finally:
        cached.unpersist()
