"""As-of join, range joins, and grouped-map model fit: planted-fixture
semantics plus plan assertions (no nested-loop/cartesian anywhere —
the whole point of the bucketed/union-window shapes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.asof import asof_join
from northwind_etl_spark.operators.modelfit import fit_linear_by_group
from northwind_etl_spark.operators.ranges import (
    interval_overlap_pairs,
    point_in_interval_join,
)


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c, t in df.dtypes:
        if t == "string" and c.endswith("t"):
            df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


@pytest.fixture(scope="module")
def asof_fixture(spark):
    left = _ts(
        spark,
        [
            (1, "2024-01-01 10:00:00", 100),
            (1, "2024-01-01 12:00:00", 101),  # tie with right at 12:00
            (1, "2024-01-01 08:00:00", 102),  # before any right row
            (2, "2024-01-01 09:00:00", 200),  # key with no right rows
        ],
        "k LONG, lt STRING, lid LONG",
    )
    right = _ts(
        spark,
        [
            (1, "2024-01-01 09:30:00", "a"),
            (1, "2024-01-01 12:00:00", "b"),
            (3, "2024-01-01 01:00:00", "z"),  # key with no left rows
        ],
        "k LONG, rt STRING, v STRING",
    )
    return left, right


def test_asof_backward_inclusive(spark, asof_fixture):
    left, right = asof_fixture
    out = asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt", right_cols=["rt", "v"]
    )
    got = {r.lid: r.v for r in out.collect()}
    # 100 → most recent at-or-before 10:00 is 09:30 'a'
    # 101 → equal timestamps match (inclusive): 'b'
    # 102 → nothing at-or-before 08:00; 200 → key never seen on right
    assert got == {100: "a", 101: "b", 102: None, 200: None}
    assert out.count() == left.count()  # left join keeps every left row


def test_asof_inner_drops_unmatched(spark, asof_fixture):
    left, right = asof_fixture
    out = asof_join(
        left,
        right,
        on=["k"],
        left_time="lt",
        right_time="rt",
        right_cols=["v"],
        how="inner",
    )
    assert {r.lid for r in out.collect()} == {100, 101}


def test_asof_null_payload_does_not_skip_back(spark):
    """A right row whose payload FIELD is null must still win over an
    older non-null row — the struct packing prevents last(ignorenulls)
    from skipping it."""
    left = _ts(spark, [(1, "2024-01-01 12:00:00", 1)], "k LONG, lt STRING, lid LONG")
    right = _ts(
        spark,
        [(1, "2024-01-01 09:00:00", "old"), (1, "2024-01-01 11:00:00", None)],
        "k LONG, rt STRING, v STRING",
    )
    out = asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt", right_cols=["rt", "v"]
    ).collect()[0]
    assert out.v is None and out.rt.hour == 11


def test_asof_single_shuffle_no_join(spark, asof_fixture):
    """The plan must be union → one exchange → window — no join node of
    any kind (that's the scalability claim)."""
    left, right = asof_fixture
    out = asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt", right_cols=["v"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_rejects_column_collisions(spark):
    """Scratch-name shadowing and ambiguous payload/right_cols overlap
    must fail loudly, not silently corrupt the fill."""
    left = _ts(spark, [(1, "2024-01-01 10:00:00", 5.0)], "k LONG, lt STRING, v DOUBLE")
    right = _ts(spark, [(1, "2024-01-01 09:00:00", 7.0)], "k LONG, rt STRING, v DOUBLE")
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left, right, on=["k"], left_time="lt", right_time="rt", right_cols=["v"]
        )
    poisoned = left.withColumn("__t", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        asof_join(
            poisoned,
            right.withColumnRenamed("v", "rv"),
            on=["k"],
            left_time="lt",
            right_time="rt",
            right_cols=["rv"],
        )


def test_point_in_interval_join(spark):
    pts = _ts(
        spark,
        [(1, "2024-01-01 10:30:00"), (2, "2024-01-02 00:00:00"), (3, "2024-03-01 00:00:00")],
        "pid LONG, pt STRING",
    )
    ivs = _ts(
        spark,
        [
            (7, "2024-01-01 09:00:00", "2024-01-01 11:00:00"),
            (8, "2024-01-01 23:00:00", "2024-01-02 01:00:00"),  # crosses midnight
            (9, "2024-01-01 10:30:00", "2024-01-01 10:30:00"),  # zero-length, == point
        ],
        "iid LONG, st STRING, et STRING",
    )
    out = point_in_interval_join(pts, ivs, point_ts="pt", start_ts="st", end_ts="et")
    pairs = {(r.pid, r.iid) for r in out.collect()}
    assert pairs == {(1, 7), (1, 9), (2, 8)}
    # bucket equality is a hash-join key: no nested loop in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_interval_overlap_pairs_planted(spark):
    ivs = _ts(
        spark,
        [
            (1, 1, "2024-01-01 10:00:00", "2024-01-01 14:00:00"),  # spans 5 buckets
            (2, 1, "2024-01-01 13:59:00", "2024-01-01 15:00:00"),  # overlaps 1 in 2 buckets
            (3, 1, "2024-01-01 14:00:00", "2024-01-01 14:30:00"),  # touches 1's end exactly
            (4, 1, "2024-01-02 00:00:00", "2024-01-02 01:00:00"),  # disjoint
        ],
        "uid LONG, sid LONG, st STRING, et STRING",
    )
    out = interval_overlap_pairs(
        ivs, id_cols=["uid", "sid"], start_ts="st", end_ts="et", bucket="hour"
    )
    pairs = {(r.uid_a, r.uid_b) for r in out.collect()}
    # inclusive bounds: (1,3) touch at exactly 14:00 and count as overlap
    assert pairs == {(1, 2), (1, 3), (2, 3)}
    row = {(r.uid_a, r.uid_b): r for r in out.collect()}[(1, 2)]
    assert row.overlap_start.minute == 59 and row.overlap_end.hour == 14
    # multi-bucket pair (1,2) appears exactly once despite 2 shared buckets
    assert out.count() == 3


def test_interval_overlap_pairs_hot_bucket_overflow(spark):
    """No silent caps: a bucket wider than max_bucket must fail loudly
    by default; truncation is opt-in and bounds the work explicitly."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    hot = _ts(
        spark,
        [(i, "2024-01-01 10:00:00", "2024-01-01 10:30:00") for i in range(12)],
        "uid LONG, st STRING, et STRING",
    )
    strict = interval_overlap_pairs(
        hot, id_cols=["uid"], start_ts="st", end_ts="et", bucket="hour", max_bucket=8
    )
    with pytest.raises((PySparkException, Py4JJavaError), match="max_bucket=8"):
        strict.collect()
    capped = interval_overlap_pairs(
        hot,
        id_cols=["uid"],
        start_ts="st",
        end_ts="et",
        bucket="hour",
        max_bucket=8,
        on_overflow="truncate",
    )
    # explicit truncation: 8 survivors → C(8,2) pairs, all co-overlapping
    assert capped.count() == 28
    # a cap that nothing exceeds is inert in strict mode
    ok = interval_overlap_pairs(
        hot, id_cols=["uid"], start_ts="st", end_ts="et", bucket="hour", max_bucket=64
    )
    assert ok.count() == 66  # C(12,2)
    with pytest.raises(ValueError, match="on_overflow"):
        interval_overlap_pairs(
            hot, id_cols=["uid"], start_ts="st", end_ts="et", on_overflow="warn"
        )


def test_fit_linear_by_group_exact_and_degenerate(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 1.0), (1, 1.0, 3.0), (1, 2.0, 5.0),   # exact y = 2x + 1
         (2, 5.0, 7.0),                                   # n=1 → degenerate
         (3, 4.0, 1.0), (3, 4.0, 9.0)],                   # zero x-variance
        "g LONG, x DOUBLE, y DOUBLE",
    )
    rows = {r.g: r for r in fit_linear_by_group(
        df, group_cols=["g"], x_col="x", y_col="y"
    ).collect()}
    assert rows[1].slope == 2.0 and rows[1].intercept == 1.0 and rows[1].n_points == 3
    assert rows[2].slope is None and rows[2].intercept is None
    assert rows[3].slope is None  # var(x) == 0


def test_scd2_history_planted(spark):
    from northwind_etl_spark.operators.scd2 import scd2_history

    changes = _ts(
        spark,
        [
            (1, "2024-01-01 00:00:00", "A"),
            (1, "2024-01-02 00:00:00", "A"),  # unchanged → collapsed
            (1, "2024-01-03 00:00:00", "B"),
            (1, "2024-01-04 00:00:00", "A"),  # back to A → NEW version
            (2, "2024-01-01 00:00:00", "X"),
        ],
        "k LONG, ct STRING, attr STRING",
    )
    hist = scd2_history(
        changes, key_cols=["k"], ts_col="ct", attr_cols=["attr"],
        collapse_unchanged=True,
    )
    rows = sorted(hist.collect(), key=lambda r: (r.k, r.version))
    assert [(r.k, r.attr, r.version, r.is_current) for r in rows] == [
        (1, "A", 1, False), (1, "B", 2, False), (1, "A", 3, True),
        (2, "X", 1, True),
    ]
    # half-open chain: eff_to of version v == eff_from of version v+1
    assert rows[0].eff_to == rows[1].eff_from
    assert rows[1].eff_to == rows[2].eff_from
    assert rows[2].eff_to is None
    # without collapsing, the duplicate 01-02 row is its own version
    full = scd2_history(changes, key_cols=["k"], ts_col="ct", attr_cols=["attr"])
    assert full.where("k = 1").count() == 4


def test_scd2_single_shuffle(spark):
    from northwind_etl_spark.operators.scd2 import scd2_history

    changes = _ts(spark, [(1, "2024-01-01 00:00:00", "A")], "k LONG, ct STRING, attr STRING")
    plan = (
        scd2_history(changes, key_cols=["k"], ts_col="ct", attr_cols=["attr"],
                     collapse_unchanged=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1 and "Join" not in plan


def test_asof_forward_planted(spark):
    """Forward direction: each left matches the nearest right AT OR
    AFTER its time; ties inclusive; no subsequent right -> NULL."""
    import datetime as dt

    from northwind_etl_spark.operators.asof import asof_join

    t = lambda m: dt.datetime(2024, 3, 1, 12, m, 0)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(0), "l0"), (1, t(10), "l1"), (1, t(40), "l2"), (2, t(5), "l3")],
        "k LONG, ts TIMESTAMP_NTZ, tag STRING",
    )
    right = spark.createDataFrame(
        [(1, t(10), "r_at_10"), (1, t(30), "r_at_30")],
        "k LONG, rts TIMESTAMP_NTZ, state STRING",
    )
    out = {
        (r.k, r.tag): r.state
        for r in asof_join(
            left, right, on=["k"], left_time="ts", right_time="rts",
            right_cols=["state"], direction="forward",
        ).collect()
    }
    assert out == {
        (1, "l0"): "r_at_10",   # next right after 12:00
        (1, "l1"): "r_at_10",   # inclusive tie at 12:10
        (1, "l2"): None,         # nothing after 12:40
        (2, "l3"): None,         # no rights for key 2
    }
    # inner drops the unmatched rows
    inner = asof_join(
        left, right, on=["k"], left_time="ts", right_time="rts",
        right_cols=["state"], how="inner", direction="forward",
    )
    assert {r.tag for r in inner.collect()} == {"l0", "l1"}


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("how", ["left", "inner"])
def test_asof_chunked_equals_direct(spark, direction, how):
    """The chunk_seconds hot-key mitigation must be result-identical
    to the direct single-window pass — randomized hot-key data with
    ties and null LEFT times, tiny chunks so many boundaries are
    crossed, both directions, both join modes."""
    import datetime as dt
    import random

    rnd = random.Random(13)
    t0 = dt.datetime(2024, 1, 1)
    lrows, rrows = [], []
    for i in range(400):
        k = 1 if i % 4 else 2 + (i % 3)  # key 1 is hot (75% of rows)
        t = t0 + dt.timedelta(seconds=rnd.randint(0, 86400))
        lrows.append((k, t, i))
    for i in range(150):
        k = 1 if i % 3 else 2 + (i % 3)
        t = t0 + dt.timedelta(seconds=rnd.randint(0, 86400))
        rrows.append((k, t, f"v{i}"))
    # planted exact ties between a left and a right
    tie = t0 + dt.timedelta(hours=5)
    lrows.append((1, tie, 9001))
    rrows.append((1, tie, "tied"))
    # a null-time left: must match nothing in both variants
    lrows.append((1, None, 9002))
    left = spark.createDataFrame(lrows, "k LONG, lt TIMESTAMP_NTZ, lid LONG")
    right = spark.createDataFrame(rrows, "k LONG, rt TIMESTAMP_NTZ, v STRING")
    # right side deduped to one row per (k, rt) for determinism
    right = right.groupBy("k", "rt").agg(F.min("v").alias("v"))

    def run(chunk):
        return sorted(
            (
                (r["k"], r["lt"], r["lid"], r["v"])
                for r in asof_join(
                left,
                right,
                on=["k"],
                left_time="lt",
                right_time="rt",
                right_cols=["v"],
                how=how,
                direction=direction,
                chunk_seconds=chunk,
            ).collect()
            ),
            key=lambda t: (t[0], t[2]),
        )

    direct = run(None)
    chunked = run(3600)  # 1 h chunks over a 24 h timeline
    assert chunked == direct
    # degenerate chunk sizes also agree
    assert run(86400 * 7) == direct  # one chunk swallows everything
