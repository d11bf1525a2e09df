"""Equality proofs for the keyed-window hot-key mitigations: the
pre-aggregated / bucket-collapsed paths must return EXACTLY the direct
paths' results — on the real events table and on planted data that sits
on every boundary the bucketing could get wrong."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from northwind_etl_spark.operators.scd2 import scd2_history
from northwind_etl_spark.operators.sessionize import sessionize
from northwind_etl_spark.sources.parquet import read_events

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _sess_key(rows):
    return sorted(
        (r.user_id, r.session_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in rows
    )


def test_sessionize_pre_aggregate_matches_direct_on_events(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    direct = _sess_key(sessionize(ev, pre_aggregate=False).collect())
    mitigated = _sess_key(sessionize(ev, pre_aggregate=True).collect())
    assert mitigated == direct
    assert len(direct) > 0


def test_sessionize_pre_aggregate_boundary_cases(spark):
    # every adversarial placement for gap=30min buckets:
    #  u1: events exactly 30min apart  -> merge (break needs > gap)
    #  u2: events 30min+1s apart       -> break
    #  u3: straddle a bucket boundary 1s apart -> merge (cross-bucket)
    #  u4: single event
    #  u5: burst inside one bucket + far-away second session
    m = dt.timedelta(minutes=1)
    s = dt.timedelta(seconds=1)
    rows = []
    rows += [(1, 100 + i, T0 + i * 30 * m, 1.0) for i in range(3)]
    rows += [(2, 200 + i, T0 + i * (30 * m + s), 2.0) for i in range(3)]
    b = dt.datetime(2024, 3, 1, 13, 0, 0)  # bucket boundary (hour-aligned)
    rows += [(3, 300, b - s, 3.0), (3, 301, b + s, 4.0)]
    rows += [(4, 400, T0, 5.0)]
    rows += [(5, 500 + i, T0 + i * s, 0.5) for i in range(5)]
    rows += [(5, 600, T0 + dt.timedelta(hours=6), 0.5)]
    ev = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, ts TIMESTAMP_NTZ, value DOUBLE"
    )
    direct = _sess_key(sessionize(ev, pre_aggregate=False).collect())
    mitigated = _sess_key(sessionize(ev, pre_aggregate=True).collect())
    assert mitigated == direct
    by_user = {}
    for u, *_ in direct:
        by_user[u] = by_user.get(u, 0) + 1
    assert by_user == {1: 1, 2: 3, 3: 1, 4: 1, 5: 2}


def _hist_key(rows):
    return sorted(
        (r.k, r.attr, r.eff_from, r.eff_to, r.version, r.is_current) for r in rows
    )


def test_scd2_collapse_bucket_matches_direct_planted(spark):
    # runs that cross bucket (1 day) boundaries, repeat after a gap,
    # and change inside one bucket
    d = dt.timedelta
    rows = [
        (1, T0 + d(hours=0), "A"),
        (1, T0 + d(hours=5), "A"),     # same run, same bucket
        (1, T0 + d(days=1), "A"),      # same run, next bucket
        (1, T0 + d(days=1, hours=2), "B"),  # change inside bucket 2
        (1, T0 + d(days=3), "A"),      # A again after B — new version
        (2, T0, "X"),
        (2, T0 + d(days=2), "X"),      # run across empty bucket
        (2, T0 + d(days=4), "Y"),
    ]
    changes = spark.createDataFrame(rows, "k LONG, ct TIMESTAMP_NTZ, attr STRING")
    direct = _hist_key(
        scd2_history(
            changes, key_cols=["k"], ts_col="ct", attr_cols=["attr"],
            collapse_unchanged=True,
        ).collect()
    )
    mitigated = _hist_key(
        scd2_history(
            changes, key_cols=["k"], ts_col="ct", attr_cols=["attr"],
            collapse_unchanged=True, collapse_bucket="1 day",
        ).collect()
    )
    assert mitigated == direct
    k1_by_version = sorted((x for x in direct if x[0] == 1), key=lambda t: t[4])
    assert [x[1] for x in k1_by_version] == ["A", "B", "A"]


def test_scd2_collapse_bucket_matches_direct_on_events(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    changes = ev.groupBy("user_id", "ts").agg(
        F.max_by("event_type", "event_id").alias("event_type")
    )
    kw = dict(key_cols=["user_id"], ts_col="ts", attr_cols=["event_type"],
              collapse_unchanged=True)
    key = lambda rows: sorted(  # noqa: E731
        (r.user_id, r.event_type, r.eff_from, r.eff_to, r.version) for r in rows
    )
    direct = key(scd2_history(changes, **kw).collect())
    mitigated = key(scd2_history(changes, **kw, collapse_bucket="1 day").collect())
    assert mitigated == direct


def test_scd2_collapse_bucket_requires_collapse(spark):
    import pytest

    changes = spark.createDataFrame(
        [(1, T0, "A")], "k LONG, ct TIMESTAMP_NTZ, attr STRING"
    )
    with pytest.raises(ValueError, match="collapse_unchanged"):
        scd2_history(
            changes, key_cols=["k"], ts_col="ct", attr_cols=["attr"],
            collapse_bucket="1 day",
        )


def _full_hist_key(rows):
    return sorted(
        (r.user_id, r.event_type, r.eff_from, r.eff_to, r.version, r.is_current)
        for r in rows
    )


def test_scd2_merge_equals_full_rebuild_on_events(spark, sf_dir):
    """Append-only CDC merge == full rebuild, collapse regime."""
    from northwind_etl_spark.operators.scd2 import scd2_history, scd2_merge

    ev = read_events(spark, sf_dir)
    changes = ev.groupBy("user_id", "ts").agg(
        F.max_by("event_type", "event_id").alias("event_type")
    )
    cut = F.lit("2024-01-20").cast("timestamp_ntz")
    kw = dict(key_cols=["user_id"], ts_col="ts", attr_cols=["event_type"],
              collapse_unchanged=True, collapse_bucket="1 day")
    initial = scd2_history(changes.where(F.col("ts") < cut), **kw)
    merged = scd2_merge(initial, changes.where(F.col("ts") >= cut), **kw)
    full = scd2_history(changes, **kw)
    assert _full_hist_key(merged.collect()) == _full_hist_key(full.collect())


def test_scd2_merge_late_data_without_collapse(spark):
    """Without collapse, the merge is exact even for out-of-order
    deltas (late changes landing between existing versions)."""
    from northwind_etl_spark.operators.scd2 import scd2_history, scd2_merge

    d = dt.timedelta
    first = [(1, T0, "A"), (1, T0 + d(days=2), "B"), (2, T0, "X")]
    late = [(1, T0 + d(days=1), "C"),          # between A and B
            (3, T0 + d(days=1), "N")]           # brand-new key
    kw = dict(key_cols=["k"], ts_col="ct", attr_cols=["attr"])
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "k LONG, ct TIMESTAMP_NTZ, attr STRING"
    )
    merged = scd2_merge(scd2_history(mk(first), **kw), mk(late), **kw)
    full = scd2_history(mk(first + late), **kw)
    key = lambda rows: sorted(  # noqa: E731
        (r.k, r.attr, r.eff_from, r.eff_to, r.version, r.is_current) for r in rows
    )
    assert key(merged.collect()) == key(full.collect())
    # untouched key 2 kept its row; key 1 renumbered A,C,B
    k1 = sorted((r.version, r.attr) for r in merged.where("k = 1").collect())
    assert k1 == [(1, "A"), (2, "C"), (3, "B")]
