"""Distributed global ranking (operators/ranking.py): equality with the
single-window form, partitioning invariance, and the no-SinglePartition
plan contract."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from northwind_etl_spark.operators.ranking import global_row_number


def _vocab(spark, sf_dir):
    from northwind_etl_spark.operators.text import term_frequencies

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return term_frequencies(docs)


def test_equals_single_window_form(spark, sf_dir):
    vocab = _vocab(spark, sf_dir)
    order = [F.desc("term_count"), F.asc("term")]
    two_phase = global_row_number(vocab, order, rank_col="rk")
    single = vocab.withColumn(
        "rk", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    a = sorted(map(tuple, two_phase.select("term", "term_count", "rk").collect()))
    b = sorted(map(tuple, single.select("term", "term_count", "rk").collect()))
    assert a == b


def test_ranks_are_dense_and_partitioning_invariant(spark, sf_dir):
    vocab = _vocab(spark, sf_dir)
    order = [F.desc("term_count"), F.asc("term")]
    out = global_row_number(vocab, order, rank_col="rk")
    n = vocab.count()
    ranks = sorted(r["rk"] for r in out.select("rk").collect())
    assert ranks == list(range(1, n + 1))
    again = global_row_number(vocab.repartition(16), order, rank_col="rk")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_few_partitions_edge(spark):
    df = spark.createDataFrame([(i,) for i in range(5)], "v long")
    out = global_row_number(df, [F.asc("v")], rank_col="rk", partitions=1)
    got = {r["v"]: r["rk"] for r in out.collect()}
    assert got == {i: i + 1 for i in range(5)}


def test_no_single_partition_exchange(spark, sf_dir):
    """The whole point: the ranking plan must not contain the global
    window's Exchange SinglePartition (the one-task sort)."""
    vocab = _vocab(spark, sf_dir)
    out = global_row_number(
        vocab, [F.desc("term_count"), F.asc("term")], rank_col="rk"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # and the single-window form DOES (the trap being avoided)
    single = vocab.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.desc("term_count"), F.asc("term"))
        ),
    )
    trap = single._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in trap
