"""k-anonymity audit + suppression-ladder stats (operators/privacy.py):
planted equivalence classes, NULL QI values vs rollup subtotals, and
the one-pass rollup ladder against brute-force per-level groupBys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.operators.privacy import (
    equivalence_classes,
    k_anonymity_audit,
    l_diversity_audit,
    smallest_k_level,
    suppression_level_stats,
    t_closeness_audit,
    t_closeness_distances,
)

QI = ["region", "segment", "tier"]


@pytest.fixture(scope="module")
def people(spark):
    # region/segment/tier classes with planted sizes:
    #   (N, A, hi) x3, (N, A, lo) x1, (N, B, hi) x2, (S, A, hi) x5,
    #   (S, None, hi) x2  -- a REAL NULL QI value, size 2
    rows = (
        [("N", "A", "hi")] * 3
        + [("N", "A", "lo")]
        + [("N", "B", "hi")] * 2
        + [("S", "A", "hi")] * 5
        + [("S", None, "hi")] * 2
    )
    return spark.createDataFrame(rows, "region string, segment string, tier string")


def test_equivalence_classes_exact(people):
    got = {
        (r["region"], r["segment"], r["tier"]): r["class_size"]
        for r in equivalence_classes(people, QI).collect()
    }
    assert got == {
        ("N", "A", "hi"): 3,
        ("N", "A", "lo"): 1,
        ("N", "B", "hi"): 2,
        ("S", "A", "hi"): 5,
        ("S", None, "hi"): 2,
    }


def test_audit_flags_only_small_classes(people):
    risky = {
        (r["region"], r["segment"], r["tier"]): r["class_size"]
        for r in k_anonymity_audit(people, QI, k=3).collect()
    }
    # classes of size < 3 -- including the genuine-NULL class
    assert risky == {
        ("N", "A", "lo"): 1,
        ("N", "B", "hi"): 2,
        ("S", None, "hi"): 2,
    }


def test_audit_empty_when_k_satisfied(people):
    assert k_anonymity_audit(people, ["region"], k=2).count() == 0


def test_k_below_two_raises(people):
    with pytest.raises(ValueError):
        k_anonymity_audit(people, QI, k=1)
    with pytest.raises(ValueError):
        smallest_k_level(people, QI, k=0)


def test_empty_quasi_cols_raise(people):
    with pytest.raises(ValueError):
        equivalence_classes(people, [])
    with pytest.raises(ValueError):
        suppression_level_stats(people, [])


def test_ladder_matches_bruteforce_groupbys(people):
    """The single rollup pass must equal the d+1 definitional
    aggregations -- including level assignment for the NULL QI value
    (which must land in level 0, not be mistaken for a subtotal)."""
    got = {
        r["level"]: (r["n_classes"], r["min_class_size"])
        for r in suppression_level_stats(people, QI).collect()
    }
    expect = {}
    for lvl in range(len(QI) + 1):
        cols = QI[: len(QI) - lvl]
        cls = (
            people.groupBy(*cols).count()
            if cols
            else people.groupBy().count()
        )
        stats = cls.agg(
            F.count(F.lit(1)).alias("n"), F.min("count").alias("m")
        ).first()
        expect[lvl] = (stats["n"], stats["m"])
    assert got == expect
    # spot values: level 0 has 5 classes (NULL class counted), min 1
    assert got[0] == (5, 1)
    assert got[3] == (1, 13)


def test_smallest_k_level(people):
    # level 0 min=1, level 1 (region, segment) classes: (N,A)=4,
    # (N,B)=2, (S,A)=5, (S,NULL)=2 -> min 2; level 2 (region): N=6,
    # S=7 -> min 6 >= 3
    assert smallest_k_level(people, QI, k=3) == 2
    assert smallest_k_level(people, QI, k=2) == 1
    assert smallest_k_level(people, QI, k=14) is None


def test_ladder_single_aggregation_plan(people):
    """The ladder must come from ONE rollup (Expand + aggregate), not
    d+1 scans: the physical plan contains a single Expand node and no
    Union."""
    plan = suppression_level_stats(people, QI)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") >= 1
    assert "Union" not in plan


# --- l-diversity / t-closeness (sensitive-attribute audits) ---------

@pytest.fixture(scope="module")
def patients(spark):
    # class A: diags x,x,y,z (distinct 3); class B: x,x (distinct 1);
    # class C: NULL,NULL -- NULL is a sensitive VALUE (distinct 1).
    rows = (
        [("A", "x"), ("A", "x"), ("A", "y"), ("A", "z")]
        + [("B", "x"), ("B", "x")]
        + [("C", None), ("C", None)]
    )
    return spark.createDataFrame(rows, "region string, diag string")


def test_l_diversity_planted(patients):
    risky = {
        r["region"]: (r["class_size"], r["distinct_sensitive"])
        for r in l_diversity_audit(patients, ["region"], "diag", l=3).collect()
    }
    # A has 3 distinct (not risky at l=3); B and the all-NULL C have 1
    assert risky == {"B": (2, 1), "C": (2, 1)}


def test_l_diversity_null_is_a_value(spark):
    # mixed NULL + one real value -> distinct 2, passes l=2
    df = spark.createDataFrame(
        [("A", None), ("A", "x")], "region string, diag string"
    )
    assert l_diversity_audit(df, ["region"], "diag", l=2).count() == 0
    with pytest.raises(ValueError):
        l_diversity_audit(df, ["region"], "diag", l=1)


def test_t_closeness_hand_computed(spark):
    # A: x,x,y,z  B: x,x ; global N=6, N_x=4, N_y=1, N_z=1
    # tvd(A) = 1/2(|2/4-4/6| + |1/4-1/6|*2) = 1/6
    # tvd(B) = 1/2(|1-4/6| + 1/6 + 1/6)    = 1/3  (absent y,z folded)
    df = spark.createDataFrame(
        [("A", "x"), ("A", "x"), ("A", "y"), ("A", "z"),
         ("B", "x"), ("B", "x")],
        "region string, diag string",
    )
    got = {
        r["region"]: (r["class_size"], r["tvd"])
        for r in t_closeness_distances(df, ["region"], "diag").collect()
    }
    assert got["A"][0] == 4 and got["B"][0] == 2
    assert abs(got["A"][1] - 1 / 6) < 1e-15
    assert abs(got["B"][1] - 1 / 3) < 1e-15


def test_t_closeness_uniform_class_is_zero(spark):
    # one class == whole relation -> its distribution IS the global one
    df = spark.createDataFrame(
        [("A", "x"), ("A", "y"), ("A", "y")], "region string, diag string"
    )
    rows = t_closeness_distances(df, ["region"], "diag").collect()
    assert len(rows) == 1 and rows[0]["tvd"] == 0.0


def test_t_closeness_audit_threshold(spark):
    df = spark.createDataFrame(
        [("A", "x"), ("A", "x"), ("A", "y"), ("A", "z"),
         ("B", "x"), ("B", "x")],
        "region string, diag string",
    )
    flagged = [
        r["region"]
        for r in t_closeness_audit(df, ["region"], "diag", t=0.25).collect()
    ]
    assert flagged == ["B"]  # 1/3 > 0.25 > 1/6
    with pytest.raises(ValueError):
        t_closeness_audit(df, ["region"], "diag", t=0.0)
    with pytest.raises(ValueError):
        t_closeness_distances(df, [], "diag")


# --- DP noisy counts (Laplace release) ------------------------------

@pytest.fixture(scope="module")
def grouped(spark):
    # 200 groups x 3 rows
    return spark.range(600).select(
        (F.col("id") % 200).cast("int").alias("g")
    )


def test_dp_noisy_counts_deterministic(grouped):
    from northwind_etl_spark.operators.privacy import dp_noisy_counts

    a = {r["g"]: r["noisy_count"]
         for r in dp_noisy_counts(grouped, ["g"], scale="2.0", salt="s").collect()}
    b = {r["g"]: r["noisy_count"]
         for r in dp_noisy_counts(grouped, ["g"], scale="2.0", salt="s").collect()}
    assert a == b and len(a) == 200


def test_dp_noise_bounded_and_laplace_shaped(grouped):
    from northwind_etl_spark.operators.privacy import dp_noisy_counts

    rows = dp_noisy_counts(grouped, ["g"], scale="2.0", salt="s").collect()
    noises = [float(r["noisy_count"]) - 3.0 for r in rows]
    # hard bound: |noise| <= scale * |ln(1/2048)| (the LUT's first cell
    # is the grid midpoint ln((0+0.5)/1024) = ln(1/2048))
    assert max(abs(x) for x in noises) <= 2.0 * 7.624619

    # Laplace(scale=2): E[X]=0, E|X|=2 -- loose empirical bands at n=200
    assert abs(sum(noises) / len(noises)) < 0.75
    assert 1.0 < sum(abs(x) for x in noises) / len(noises) < 3.5
    # noise must actually vary across groups
    assert len({round(x, 6) for x in noises}) > 150


def test_dp_salt_changes_noise(grouped):
    from northwind_etl_spark.operators.privacy import dp_noisy_counts

    a = {r["g"]: r["noisy_count"]
         for r in dp_noisy_counts(grouped, ["g"], scale="2.0", salt="s1").collect()}
    b = {r["g"]: r["noisy_count"]
         for r in dp_noisy_counts(grouped, ["g"], scale="2.0", salt="s2").collect()}
    assert sum(a[g] != b[g] for g in a) > 190


def test_dp_null_group_key_and_errors(spark):
    from northwind_etl_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame([("x",), (None,), (None,)], "g string")
    rows = dp_noisy_counts(df, ["g"], scale="0.5", salt="s").collect()
    got = {r["g"]: float(r["noisy_count"]) for r in rows}
    assert set(got) == {"x", None} and abs(got[None] - 2) < 16.1
    with pytest.raises(ValueError):
        dp_noisy_counts(df, [], scale="2.0", salt="s")
