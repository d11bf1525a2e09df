"""Planted-fixture proofs for the scale-pattern operators added late in
round 6: bloom join pruning, snapshot reconciliation, mergeable partial
aggregates, and salted distinct counting.  Each pattern's contract is
exactness — the scale trick may only change the physical plan, never
the result — so every test pins equality against the direct form."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from northwind_etl_spark.operators import incremental as I
from northwind_etl_spark.operators import kmv
from northwind_etl_spark.operators.bloomjoin import (
    bloom_prefilter,
    bloom_positions,
    bloom_semi_join,
)
from northwind_etl_spark.operators.reconcile import snapshot_diff
from northwind_etl_spark.operators.skew import (
    salted_collect_set,
    salted_distinct_count,
)


# ------------------------------------------------------------- bloom join


def test_bloom_prefilter_has_no_false_negatives(spark):
    # tiny m forces false positives; the contract is zero false negatives
    probe = spark.createDataFrame([(i,) for i in range(500)], ["k"])
    build = spark.createDataFrame([(i,) for i in range(0, 500, 7)], ["bk"])
    positions = bloom_positions(build.withColumnRenamed("bk", "__k"), "__k", m=64, k=3)
    kept = {r.k for r in bloom_prefilter(probe, "k", positions, m=64, k=3).collect()}
    true_matches = set(range(0, 500, 7))
    assert true_matches <= kept  # every true match survives the pre-cut


def test_bloom_semi_join_equals_plain_semi_join(spark):
    probe = spark.createDataFrame(
        [(i, f"row{i}") for i in range(1000)], ["k", "payload"]
    )
    build = spark.createDataFrame([(i,) for i in range(0, 1000, 13)], ["bk"])
    got = sorted(
        (r.k, r.payload)
        for r in bloom_semi_join(
            probe, build, probe_key="k", build_key="bk", m=256, k=3
        ).collect()
    )
    want = sorted(
        (r.k, r.payload)
        for r in probe.join(
            build, on=probe.k == build.bk, how="left_semi"
        ).collect()
    )
    assert got == want and len(want) == len(range(0, 1000, 13))


def test_bloom_prefilter_plan_is_broadcast_only(spark):
    # the pre-cut must not shuffle the probe side: k broadcast hash
    # joins, no SortMergeJoin/Exchange introduced by the filter itself
    probe = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    build = spark.createDataFrame([(i,) for i in range(0, 100, 5)], ["bk"])
    positions = bloom_positions(build.withColumnRenamed("bk", "__k"), "__k", m=1 << 12, k=3)
    plan = (
        bloom_prefilter(probe, "k", positions, m=1 << 12, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_bloom_false_positive_rate_is_bounded(spark):
    # m=8·n, k=3 → theoretical fp ≈ (1-e^{-3/8})³ ≈ 3.1%; assert an
    # order-of-magnitude sane cut so a hashing bug (everything passes)
    # cannot hide
    probe = spark.createDataFrame([(i,) for i in range(4000)], ["k"])
    build = spark.createDataFrame([(i,) for i in range(0, 4000, 40)], ["bk"])  # 100 keys
    positions = bloom_positions(build.withColumnRenamed("bk", "__k"), "__k", m=800, k=3)
    kept = bloom_prefilter(probe, "k", positions, m=800, k=3).count()
    assert kept >= 100  # all true matches
    assert kept <= 100 + int(0.10 * 3900)  # fp well under 10%


# ---------------------------------------------------------- reconciliation


def _diff_row(spark, old_rows, new_rows, **kw):
    schema = "id int, val double, note string"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    [r] = snapshot_diff(old, new, key="id", **kw).collect()
    return (r.n_added, r.n_removed, r.n_changed, r.n_unchanged)


def test_snapshot_diff_planted(spark):
    old = [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (4, 40.0, None)]
    new = [(1, 10.0, "a"), (2, 99.0, "b"), (4, 40.0, None), (5, 50.0, "e")]
    assert _diff_row(spark, old, new, buckets=4) == (1, 1, 1, 2)


def test_snapshot_diff_null_vs_empty_string_is_a_change(spark):
    # the NULL sentinel must keep NULL distinct from '' (a bare
    # concat_ws would collapse them into 'unchanged')
    old = [(1, 1.0, None)]
    new = [(1, 1.0, "")]
    assert _diff_row(spark, old, new, buckets=2) == (0, 0, 1, 0)


def test_snapshot_diff_identical_snapshots(spark):
    rows = [(i, float(i), f"n{i}") for i in range(50)]
    assert _diff_row(spark, rows, rows, buckets=8) == (0, 0, 0, 50)


def test_snapshot_diff_clean_buckets_settled_without_row_join(spark):
    # mutation confined to one bucket: with key%4 bucketing, only ids
    # ≡1 (mod 4) are touched — every other bucket must be settled from
    # fingerprints alone, and the counts must still be exact
    rows = [(i, float(i), "x") for i in range(100)]
    new = [(i, float(i) + (1.0 if i % 4 == 1 else 0.0), "x") for i in range(100)]
    assert _diff_row(spark, rows, new, buckets=4) == (0, 0, 25, 75)


# ------------------------------------------------------- partial-agg merge


def test_merge_states_equals_direct(spark):
    rows = [
        (f"g{i % 3}", float(i) + 0.25) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    direct = I.finalize(I.partial_states(df, ["g"], "v"), prefix="v")
    a = I.partial_states(df.where(F.col("v") < 60), ["g"], "v")
    b = I.partial_states(df.where((F.col("v") >= 60) & (F.col("v") < 140)), ["g"], "v")
    c = I.partial_states(df.where(F.col("v") >= 140), ["g"], "v")
    merged = I.finalize(I.merge_states(a, b, c), prefix="v")
    key = lambda d: sorted(map(tuple, d.collect()))  # noqa: E731
    assert key(merged) == key(direct)


def test_merge_states_with_empty_delta(spark):
    df = spark.createDataFrame([("g", 1.5), ("g", 2.5)], ["g", "v"])
    empty = df.where(F.lit(False))
    merged = I.finalize(
        I.merge_states(I.partial_states(df, ["g"], "v"), I.partial_states(empty, ["g"], "v")),
        prefix="v",
    )
    [r] = merged.collect()
    assert (r.v_total, r.v_count, r.v_avg, r.v_min, r.v_max) == (4.0, 2, 2.0, 1.5, 2.5)


def test_merge_states_key_only_in_delta(spark):
    hist = spark.createDataFrame([("old", 1.0)], ["g", "v"])
    delta = spark.createDataFrame([("new", 2.0)], ["g", "v"])
    merged = I.finalize(
        I.merge_states(I.partial_states(hist, ["g"], "v"), I.partial_states(delta, ["g"], "v")),
        prefix="v",
    )
    got = {r.g: (r.v_total, r.v_count) for r in merged.collect()}
    assert got == {"old": (1.0, 1), "new": (2.0, 1)}


def test_snapshot_diff_property_random_edits(spark):
    # one batched property sweep (Spark-roundtrip-per-example would be
    # minutes): several deterministic pseudo-random edit scripts, each
    # checked against a pure-Python diff of the same scripts
    import hashlib

    def h(seed, i):
        return int.from_bytes(
            hashlib.md5(f"{seed}:{i}".encode()).digest()[:4], "big"
        )

    for seed in ("a", "b", "c"):
        ids = list(range(40))
        old = {i: float(h(seed, i) % 97) for i in ids}
        new = {}
        for i in ids:
            r = h(seed, i + 1000) % 10
            if r < 2:
                continue  # removed
            new[i] = old[i] + (1.0 if r < 4 else 0.0)  # 2-3 → changed
        for j in range(41, 46):
            if h(seed, j) % 2:
                new[j] = 7.0  # added
        exp_added = sum(1 for k in new if k not in old)
        exp_removed = sum(1 for k in old if k not in new)
        exp_changed = sum(1 for k in new if k in old and new[k] != old[k])
        exp_same = sum(1 for k in new if k in old and new[k] == old[k])
        got = _diff_row(
            spark,
            [(k, v, "x") for k, v in old.items()],
            [(k, v, "x") for k, v in new.items()],
            buckets=8,
        )
        assert got == (exp_added, exp_removed, exp_changed, exp_same), seed


def test_aqe_splits_skewed_join_partitions(spark):
    # end-to-end evidence for the PLANS.md claim that AQE's runtime
    # skew handling covers JOIN skew: one key holds ~95% of the big
    # side; with broadcast disabled and tiny skew thresholds the final
    # adaptive plan must mark the sort-merge join skew=true
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        from pyspark.sql import functions as SF

        big = spark.range(400_000).select(
            SF.when(SF.col("id") % 20 != 0, 7).otherwise(SF.col("id")).alias("k"),
            SF.concat(SF.lit("payload-"), SF.col("id")).alias("pad"),
        )
        small = spark.range(400_000).select(SF.col("id").alias("k"), SF.lit(1).alias("m"))
        # Two traps this test had to dodge: (1) inspect the SAME
        # QueryExecution the action finalizes — .count() builds a
        # separate plan whose AdaptiveSparkPlan this df never executes;
        # (2) aggregate over the payload column, else column pruning
        # drops it and the hot partition (one constant key) compresses
        # to under every skew threshold in the shuffle.
        counted = big.join(small, "k").groupBy().agg(
            SF.count(SF.lit(1)).alias("n"),
            SF.sum(SF.length("pad")).alias("pad_bytes"),
        )
        [row] = counted.collect()
        assert row.n == 400_000 and row.pad_bytes > 0
        plan = counted._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


# ------------------------------------------------- histogram quantiles


def test_hist_state_merge_equals_direct(spark):
    rows = [("g", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    kw = dict(lo=0.0, hi=1024.0, nbins=64)
    direct = I.hist_states(df, ["g"], "v", **kw)
    merged = I.merge_hist_states(
        I.hist_states(df.where(F.col("v") < 300), ["g"], "v", **kw),
        I.hist_states(df.where(F.col("v") >= 300), ["g"], "v", **kw),
    )
    key = lambda d: sorted((r.g, r["__bin"], r["__cnt"]) for r in d.collect())  # noqa: E731
    assert key(merged) == key(direct)


def test_hist_quantiles_accuracy_and_clamping(spark):
    # uniform 0..999 → p50 ≈ 500 within half a bin (bin width 16);
    # outliers beyond hi land in the top bin instead of vanishing
    rows = [("g", float(i)) for i in range(1000)] + [("g", 10_000.0), ("g", -5.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    kw = dict(lo=0.0, hi=1024.0, nbins=64)
    [r] = I.hist_quantiles(
        I.hist_states(df, ["g"], "v", **kw), quantiles=[("p50", 0.5)], **kw
    ).collect()
    assert abs(r.p50 - 500.0) <= 16.0
    state = {row["__bin"]: row["__cnt"] for row in I.hist_states(df, ["g"], "v", **kw).collect()}
    assert state[63] >= 1 and state[0] >= 1  # clamped outliers counted


# ------------------------------------------------ time-weighted avg


def test_time_weighted_avg_planted(spark):
    import datetime as dt

    from northwind_etl_spark.operators.timeseries import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # u1: 10.0 holds 10 s, 20.0 holds 30 s, last excluded
        # → (10·10 + 20·30) / 40 = 17.5
        (1, at(0), 10.0),
        (1, at(10), 20.0),
        (1, at(40), 99.0),
        # u2: tie at t=0 — (ts, value) order gives 1.0 zero duration,
        # 3.0 holds 4 s → twa = 3.0
        (2, at(0), 3.0),
        (2, at(0), 1.0),
        (2, at(4), 99.0),
        # u3: single event → no interval, user absent
        (3, at(0), 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    got = {
        r.user_id: (r.n_intervals, r.twa_value)
        for r in time_weighted_avg(
            df, key_col="user_id", ts_col="ts", value_col="value"
        ).collect()
    }
    assert got == {1: (2, 17.5), 2: (2, 3.0)}


# ------------------------------------------------ compression ratio


def test_compression_ratio_discriminates_repetition(spark):
    import zlib

    from northwind_etl_spark.operators.text import compression_ratio

    prose = (
        "The quick brown fox jumps over the lazy dog while seventeen "
        "wizards briskly mix quartz vials of zesty pomegranate juice."
    ) * 4
    boiler = "click here to subscribe now " * 18
    df = spark.createDataFrame(
        [(1, prose), (2, boiler), (3, None), (4, "")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.compression_ratio for r in compression_ratio(df).collect()}
    # pinned to the exact stdlib arithmetic, not just a direction
    exp = round(len(zlib.compress(prose.encode(), 6)) / len(prose.encode()), 6)
    assert got[1] == exp
    assert got[2] < got[1] / 2  # boilerplate compresses far harder
    assert got[3] is None and got[4] is None


# ------------------------------------------------------- expectations


def test_expectations_planted_violations(spark):
    from northwind_etl_spark.operators import expectations as X

    df = spark.createDataFrame(
        [
            (1, 10.0, "O", "1-URGENT"),
            (1, 20.0, "F", "2-HIGH"),  # duplicate key 1
            (None, 30.0, "O", "3-MEDIUM"),  # null custkey-ish
            (4, -5.0, "Z", "bad"),  # range + set + regex
            (99, 40.0, "P", "5-LOW"),  # orphan FK
        ],
        "k int, price double, status string, prio string",
    )
    dim = spark.createDataFrame([(1,), (4,)], ["dk"])
    report = X.expectation_report(
        df,
        row_rules=[
            X.not_null("k"),
            X.in_range("price", 0, 100),
            X.in_set("status", ["O", "F", "P"]),
            X.matches("prio", r"^[1-5]-[A-Z ]+$"),
        ],
        extra=[
            X.unique_rule(df, ["k"]),
            X.foreign_key_rule(df, "k", dim, "dk"),
        ],
    )
    got = {r.rule: r.n_violations for r in report.collect()}
    assert got == {
        "not_null(k)": 1,
        "in_range(price)": 1,
        "in_set(status)": 1,
        "matches(prio)": 1,
        "unique(k)": 1,
        "foreign_key(k)": 1,
    }


def test_expectations_row_rules_are_one_scan(spark):
    from northwind_etl_spark.operators import expectations as X

    df = spark.createDataFrame([(i, float(i)) for i in range(100)], ["k", "v"])
    report = X.expectation_report(
        df,
        row_rules=[X.not_null("k"), X.in_range("v", 0, 1000), X.in_set("k", [1])],
    )
    plan = report._jdf.queryExecution().executedPlan().toString()
    # one aggregation pass: a single pair of partial/final HashAggregate
    # nodes (or Sort+ObjectHash fallbacks), never one scan per rule
    assert plan.count("Scan ") + plan.count("LocalTableScan") <= 1, plan[:1500]


# ----------------------------------------------------------- KS drift


def test_ks_drift_planted_shift(spark):
    from northwind_etl_spark.operators.drift import ks_drift_by_group

    # identical uniform slices → ks ≈ 0; one shifted slice → ks ≈ 1
    rows = [("a", float(i % 100)) for i in range(500)]
    rows += [("b", float(i % 100)) for i in range(500)]
    rows += [("shifted", 500.0 + float(i % 100)) for i in range(500)]
    df = spark.createDataFrame(rows, ["src", "v"])
    got = {
        r.src: r.ks_stat
        for r in ks_drift_by_group(
            df, group_col="src", value_col="v", lo=0.0, hi=1024.0, nbins=128
        ).collect()
    }
    assert got["shifted"] == 1.0  # disjoint supports → sup |ΔCDF| = 1
    # a vs (b ∪ shifted): half the rest is identical, half disjoint
    assert 0.4 < got["a"] < 0.6 and got["a"] == got["b"]


# ----------------------------------------------------------- KMV sketch


def _kmv_rows(state):
    return sorted((r[0], r["__rank"], r["__h"]) for r in state.collect())


def test_kmv_merge_is_exact_lattice_join(spark):
    # state(A ∪ B) == resketch(state(A) ∪ state(B)), including values
    # present in both slices (the re-dedup path)
    rows = [("g", i) for i in range(200)]
    df = spark.createDataFrame(rows, ["g", "v"])
    a = df.where(F.col("v") < 120)  # overlap: 100..119 in both
    b = df.where(F.col("v") >= 100)
    direct = kmv.kmv_state(df, ["g"], "v", k=16)
    merged = kmv.merge_states(
        kmv.kmv_state(a, ["g"], "v", k=16),
        kmv.kmv_state(b, ["g"], "v", k=16),
        k=16,
    )
    assert _kmv_rows(merged) == _kmv_rows(direct)


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([("g", i % 7) for i in range(50)], ["g", "v"])
    [r] = kmv.kmv_estimate(kmv.kmv_state(df, ["g"], "v", k=16), k=16).collect()
    assert r.est_distinct == 7.0 and r.kth_hash is None


def test_kmv_estimate_error_bound(spark):
    # 1000 distinct values, k=64 → stddev ≈ 1/√62 ≈ 12.7%; 4σ bound
    df = spark.createDataFrame([("g", i) for i in range(1000)], ["g", "v"])
    [r] = kmv.kmv_estimate(kmv.kmv_state(df, ["g"], "v", k=64), k=64).collect()
    assert abs(r.est_distinct - 1000) / 1000 < 0.51
    assert r.kth_hash is not None and len(r.kth_hash) == 32


def test_kmv_intersect_planted_overlap(spark):
    # |A| = 600 (0..599), |B| = 600 (300..899), |A∩B| = 300, J = 1/3
    a = spark.createDataFrame([("x", i) for i in range(600)], ["g", "v"])
    b = spark.createDataFrame([("x", i) for i in range(300, 900)], ["g", "v"])
    sa = kmv.kmv_state(a, [], "v", k=64)
    sb = kmv.kmv_state(b, [], "v", k=64)
    [r] = kmv.kmv_intersect(sa, sb, k=64).collect()
    assert abs(r.est_union - 900) / 900 < 0.5
    assert abs(r.est_jaccard - 1 / 3) < 0.25
    assert 0 < r.n_matched < 64


def test_kmv_intersect_exact_when_small(spark):
    a = spark.createDataFrame([("x", i) for i in range(10)], ["g", "v"])
    b = spark.createDataFrame([("x", i) for i in range(5, 15)], ["g", "v"])
    sa = kmv.kmv_state(a, [], "v", k=64)
    sb = kmv.kmv_state(b, [], "v", k=64)
    [r] = kmv.kmv_intersect(sa, sb, k=64).collect()
    assert r.est_union == 15.0 and r.n_matched == 5
    assert abs(r.est_intersection - 5.0) < 1e-9


def test_kmv_state_determinism_and_salt_invariance(spark):
    # the two-phase salted ranking must produce the same state as a
    # single global ranking (salt_buckets=1)
    df = spark.createDataFrame([("g", i) for i in range(300)], ["g", "v"])
    s8 = kmv.kmv_state(df, ["g"], "v", k=16, salt_buckets=8)
    s1 = kmv.kmv_state(df, ["g"], "v", k=16, salt_buckets=1)
    assert _kmv_rows(s8) == _kmv_rows(s1)


# ------------------------------------------------------- salted distinct


def test_salted_distinct_count_equals_plain_with_hot_key(spark):
    # one group holds 90% of rows and a repeated-value hot set
    rows = [("hot", i % 37) for i in range(900)]
    rows += [("cold", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        r.g: r.n
        for r in salted_distinct_count(
            df, group_cols=["g"], distinct_col="v", alias="n", salt_buckets=16
        ).collect()
    }
    want = {
        r.g: r.n
        for r in df.groupBy("g").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert got == want == {"hot": 37, "cold": 100}


def test_salted_collect_set_equals_plain(spark):
    # the no-Catalyst-rewrite case the salt pattern exists for: the
    # salted set merge must equal the plain collect_set, sorted
    rows = [("hot", i % 37) for i in range(900)] + [("cold", i) for i in range(50)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        r.g: r.vals
        for r in salted_collect_set(
            df, group_cols=["g"], value_col="v", alias="vals", salt_buckets=16
        ).collect()
    }
    want = {
        r.g: sorted(r.vals)
        for r in df.groupBy("g").agg(F.collect_set("v").alias("vals")).collect()
    }
    assert got == want and len(got["hot"]) == 37 and len(got["cold"]) == 50


def test_salted_distinct_count_null_values(spark):
    # COUNT(DISTINCT) ignores NULLs; the salted plan must too (xxhash64
    # of NULL lands in one salt class, count_distinct drops it there)
    df = spark.createDataFrame(
        [("g", None), ("g", 1), ("g", 1), ("g", None), ("g", 2)],
        "g string, v int",
    )
    [r] = salted_distinct_count(
        df, group_cols=["g"], distinct_col="v", alias="n", salt_buckets=4
    ).collect()
    assert r.n == 2
