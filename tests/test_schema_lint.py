"""Registry-wide output-schema lint (r09): no driver-facing entry may
emit a DECIMAL column — the driver's canonicalizer has never hashed a
cross-engine DECIMAL equal in 8 rounds (VERDICT r08 "What's wrong" #1),
and the local oracle harness str()s Decimals identically on both sides
so it can NEVER catch the class.  Red-team case plants a DECIMAL frame
and demands a hit; the registry sweep demands zero."""

from __future__ import annotations

from pyspark.sql import functions as F

from northwind_etl_spark.plans.queries import QUERIES

from .schema_lint import decimal_output_columns


def test_registry_emits_no_decimal(spark, sf_dir):
    bad = {}
    for name, fn in QUERIES.items():
        hits = decimal_output_columns(fn(spark, sf_dir))
        if hits:
            bad[name] = hits
    assert not bad, (
        f"DECIMAL output columns (driver has never hash-greenlit one; "
        f"release via one final cast to DOUBLE or scaled BIGINT): {bad}"
    )


def test_redteam_planted_decimal_flagged(spark):
    planted = spark.range(3).select(
        F.col("id").cast("decimal(38,12)").alias("v")
    )
    assert decimal_output_columns(planted) == ["v: decimal(38,12)"]


def test_redteam_nested_decimal_flagged(spark):
    nested = spark.range(3).select(
        F.array(F.struct(F.col("id").cast("decimal(10,2)").alias("d"))).alias(
            "a"
        ),
        F.create_map(
            F.lit("k"), F.col("id").cast("decimal(5,1)")
        ).alias("m"),
    )
    hits = decimal_output_columns(nested)
    assert hits == ["a[].d: decimal(10,2)", "m<value>: decimal(5,1)"]


def test_internal_decimal_is_fine_after_final_cast(spark):
    ok = spark.range(3).select(
        (F.col("id").cast("decimal(38,12)") * F.lit(2))
        .cast("double")
        .alias("v")
    )
    assert decimal_output_columns(ok) == []
