"""Planted-fixture semantics for the r09 operator batch (attribution,
bitemporal as-of, k-center coreset).  Cross-engine value parity is
pinned by their registry oracles; these tests pin behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.similarity import kcenter_select


def test_kcenter_farthest_point_order_and_radius(spark):
    # 1-D embeddings padded to length 4: points at 0, 1, 10, 21.
    # seed=0 -> farthest is 21 (441), then 10 (min(100,121)=100),
    # then 1 (min(1,81,400)=1).  Radii non-increasing.
    def v(x):
        return [float(x), 0.0, 0.0, 0.0]

    df = spark.createDataFrame(
        [(0, v(0)), (1, v(1)), (2, v(10)), (3, v(21))],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    rows = kcenter_select(df, 4, seed_id=0).collect()
    got = [(r["round"], r["vec_id"], r["radius"]) for r in rows]
    assert got == [(1, 0, None), (2, 3, 441.0), (3, 2, 100.0), (4, 1, 1.0)]
    radii = [r["radius"] for r in rows[1:]]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_stops_when_universe_exhausted(spark):
    """ADVICE r09: k beyond the number of DISTINCT points must stop
    (remaining max distance 0), not re-emit a chosen point with
    radius 0.0 — duplicate points share one selection slot."""
    def v(x):
        return [float(x), 0.0, 0.0, 0.0]

    df = spark.createDataFrame(
        [(0, v(0)), (1, v(0)), (2, v(5)), (3, v(5))],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    rows = kcenter_select(df, 4, seed_id=0).collect()
    got = [(r["round"], r["vec_id"], r["radius"]) for r in rows]
    # two distinct locations -> exactly two rounds, then early stop
    assert got == [(1, 0, None), (2, 2, 25.0)]


def test_kcenter_validation(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    with pytest.raises(ValueError, match="seed id"):
        kcenter_select(df, 2, seed_id=99)
    with pytest.raises(ValueError, match="k must be"):
        kcenter_select(df, 0)


def test_attribution_u_shape_planted(spark, sf_dir):
    # replicate the entry's credit expression on a planted 4-touch
    # path: 0.4 / 0.1 / 0.1 / 0.4
    from northwind_etl_spark.plans.queries import attribution_credit_by_type

    out = {
        r["event_type"]: r
        for r in attribution_credit_by_type(spark, sf_dir).collect()
    }
    # conservation: total credit == number of users with >= 1 event
    total = sum(r["credit"] for r in out.values())
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = e.select("user_id").distinct().count()
    assert abs(total - n_users) < 1e-6 * max(n_users, 1)


def test_bitemporal_late_correction_flips_state(spark, sf_dir):
    from northwind_etl_spark.plans.queries import bitemporal_user_state

    df = bitemporal_user_state(spark, sf_dir)
    rows = df.collect()
    assert rows  # non-empty
    for r in rows:
        # believed valid_from can only move FORWARD as txn time grows
        # (more knowledge, never less)
        assert r["from_t2"] >= r["from_t1"]
        if r["revised"]:
            assert (r["from_t1"], r["value_t1"]) != (
                r["from_t2"],
                r["value_t2"],
            )


def test_cusum_detects_planted_level_shift(spark):
    from northwind_etl_spark.operators.timeseries import cusum_alarms_by_key
    import datetime as dt

    # 20 flat days at 100 then 10 days at 200: upward shift must alarm
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("k", base + dt.timedelta(days=i), 100.0 if i < 20 else 200.0)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "k STRING, ts TIMESTAMP, v DOUBLE")
    out = cusum_alarms_by_key(
        df, "k", "ts", "v", slack="0", threshold="100"
    ).collect()[0]
    assert out["n_buckets"] == 30
    assert out["n_alarms"] > 0
    assert out["cusum_final"] > 0
    # flat series never alarms
    flat = spark.createDataFrame(
        [("k", base + dt.timedelta(days=i), 100.0) for i in range(30)],
        "k STRING, ts TIMESTAMP, v DOUBLE",
    )
    f = cusum_alarms_by_key(flat, "k", "ts", "v", threshold="1").collect()[0]
    assert (f["n_alarms"], f["cusum_final"]) == (0, 0.0)


def test_cusum_raises_on_pack_factor_overflow(spark):
    """ADVICE r09 (medium): a key with >= 2048 buckets would overflow
    the packed alarm counter into S' — the promised guard must raise
    in-plan instead of silently corrupting both outputs."""
    from northwind_etl_spark.operators.timeseries import cusum_alarms_by_key

    long_series = spark.range(2048).select(
        F.lit("k").alias("k"),
        F.to_timestamp(
            F.date_add(F.lit("2018-01-01").cast("date"), F.col("id").cast("int"))
        ).alias("ts"),
        F.lit(1.0).alias("v"),
    )
    with pytest.raises(Exception, match="pack factor 2048"):
        cusum_alarms_by_key(long_series, "k", "ts", "v").collect()
    # one bucket fewer is within the pack bound and must succeed
    ok = cusum_alarms_by_key(long_series.limit(2047), "k", "ts", "v").collect()
    assert ok[0]["n_buckets"] == 2047


def test_cusum_validation(spark):
    import pytest
    from northwind_etl_spark.operators.timeseries import cusum_alarms_by_key

    df = spark.createDataFrame([("k", None, 1.0)], "k STRING, ts TIMESTAMP, v DOUBLE")
    with pytest.raises(ValueError, match="non-negative"):
        cusum_alarms_by_key(df, "k", "ts", "v", slack="-1")


def test_zorder_locality_beats_lex_on_y(spark, sf_dir):
    from northwind_etl_spark.plans.queries import zorder_locality_report

    rows = {r["scheme"]: r for r in zorder_locality_report(spark, sf_dir).collect()}
    z, lex = rows["zorder"], rows["lexicographic"]
    # the layout's whole point: z-order bounds BOTH dims' spans;
    # lexicographic is perfect on x and full-span on y
    assert z["avg_span_y"] < lex["avg_span_y"]
    assert z["avg_span_x"] <= 4.0 and z["avg_span_y"] <= 4.0
