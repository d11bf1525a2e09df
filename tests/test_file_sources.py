"""CSV/JSON source semantics: schema'd round-trips and the three
malformed-record modes (PERMISSIVE + quarantine column, DROPMALFORMED,
FAILFAST) — the ingest-robustness contract of sources/files.py."""

from __future__ import annotations

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from northwind_etl_spark.sources.files import read_csv, read_json, write_reload

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("qty", IntegerType()),
    ]
)


@pytest.fixture()
def csv_dir(tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,qty\n"
        "1,alpha,10\n"
        "2,beta,twenty\n"  # malformed qty
        "3,gamma,30\n"
    )
    return str(p)


def test_csv_roundtrip_matches_parquet_source(spark, sf_dir, tmp_path):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out = str(tmp_path / "nation_csv")
    nation.write.option("header", "true").mode("overwrite").csv(out)
    back = read_csv(spark, out, schema=nation.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_csv_permissive_quarantines_bad_rows(spark, csv_dir):
    # fresh StructType: .add() would mutate the shared SCHEMA in place
    schema = StructType(list(SCHEMA.fields) + [StructField("_bad", StringType())])
    df = read_csv(spark, csv_dir, schema=schema, corrupt_col="_bad").cache()
    rows = {r.id: r for r in df.collect()}
    assert rows[1].qty == 10 and rows[1]._bad is None
    assert rows[2].qty is None and "twenty" in rows[2]._bad  # quarantined raw line
    assert rows[3].qty == 30


def test_csv_dropmalformed_drops_bad_rows(spark, csv_dir):
    df = read_csv(spark, csv_dir, schema=SCHEMA, mode="DROPMALFORMED")
    assert sorted(r.id for r in df.collect()) == [1, 3]


def test_csv_failfast_raises(spark, csv_dir):
    with pytest.raises(Exception) as exc:
        read_csv(spark, csv_dir, schema=SCHEMA, mode="FAILFAST").collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_json_lines_with_corrupt_record(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "alpha"}\n'
        "this is not json\n"
        '{"id": 3, "name": "gamma"}\n'
    )
    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("name", StringType()),
            StructField("_bad", StringType()),
        ]
    )
    df = read_json(spark, str(p), schema=schema, corrupt_col="_bad").cache()
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._bad is not None]
    assert len(bad) == 1 and "not json" in bad[0]._bad


def test_write_reload_partitioned_roundtrip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    out = str(tmp_path / "docs_part")
    write_reload(docs, out, partition_by=["lang"])
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # overwrite again — idempotent (truncate-and-reload semantics)
    write_reload(docs, out, partition_by=["lang"])
    assert spark.read.parquet(out).count() == docs.count()


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC as a second columnar format through the same sink: values
    survive the round-trip and filters still reach the ORC scan."""
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = str(tmp_path / "nation_orc")
    write_reload(src, out, fmt="orc")
    back = spark.read.orc(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    plan = (
        back.where(F.col("n_nationkey") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "orc" in plan.lower() and "n_nationkey" in plan


def test_read_evolved_adds_drops_and_null_fills(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from northwind_etl_spark.sources.files import read_evolved

    root = str(tmp_path / "evolved")
    # epoch 1: (a, b); epoch 2 adds c and an extra column the target
    # does not want
    spark.createDataFrame([(1, "x"), (2, "y")], "a long, b string").write.parquet(
        f"{root}/e1"
    )
    spark.createDataFrame(
        [(3, "z", 1.5, "junk")], "a long, b string, c double, extra string"
    ).write.parquet(f"{root}/e2")

    target = StructType(
        [
            StructField("a", LongType()),
            StructField("b", StringType()),
            StructField("c", DoubleType()),
            StructField("d", StringType()),  # absent everywhere
        ]
    )
    out = read_evolved(spark, f"{root}/*", target)
    assert out.columns == ["a", "b", "c", "d"]
    rows = {r["a"]: r for r in out.collect()}
    assert rows[1]["c"] is None and rows[3]["c"] == 1.5
    assert all(r["d"] is None for r in rows.values())
    assert "extra" not in out.columns


def test_read_evolved_type_drift_degrades_to_null(spark, tmp_path):
    from pyspark.sql.types import IntegerType, StructField, StructType

    from northwind_etl_spark.sources.files import read_evolved

    root = str(tmp_path / "drift")
    spark.createDataFrame([("12",), ("not_a_number",)], "v string").write.parquet(root)
    target = StructType([StructField("v", IntegerType())])
    got = sorted(
        (r["v"] for r in read_evolved(spark, root, target).collect()),
        key=lambda x: (x is None, x),
    )
    # try_cast: numeric string converts, garbage becomes NULL (no ANSI throw)
    assert got == [12, None]


def test_jsonl_corrupt_quarantine_modes(spark, tmp_path):
    """The landing-zone contract: PERMISSIVE quarantines bad lines into
    the corrupt column (good fields parse, bad rows carry raw text);
    FAILFAST raises on the same input."""
    import pytest

    from northwind_etl_spark.sources.files import read_json

    p = str(tmp_path / "in")
    lines = [
        '{"a": 1, "b": "x"}',
        '{"a": 2, "b":',          # truncated
        '{"a": 3, "b": "z"}',
        "not json at all",
    ]
    spark.createDataFrame([(l,) for l in lines], "value string").coalesce(
        1
    ).write.mode("overwrite").text(p)

    out = read_json(
        spark, p, "a long, b string, _c string", corrupt_col="_c"
    )
    rows = out.collect()
    assert len(rows) == 4
    bad = [r for r in rows if r._c is not None]
    assert len(bad) == 2
    assert {r.a for r in rows if r._c is None} == {1, 3}

    from py4j.protocol import Py4JJavaError  # noqa: F401

    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        read_json(spark, p, "a long, b string", mode="FAILFAST").collect()
