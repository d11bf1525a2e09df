"""File sinks/readers beyond the driver's parquet tables.

The reference's loads (L1 truncate-reload ``etl_category.py:51-61``,
L2 delete-reload ``etl_product.py:79-95``) both collapse to Spark
``mode("overwrite")`` — there is no row-at-a-time marshaling
(``etl_orders.py:120``'s list-of-tuples) anywhere in this engine; writes
are partition-parallel and columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def write_reload(df: DataFrame, path: str, *, fmt: str = "parquet", partition_by: list[str] | None = None) -> None:
    """Overwrite sink = the reference's truncate/delete-and-reload.

    `partition_by` is the 100 TB story: facts partitioned by a date-ish
    column get partition pruning on read and idempotent re-loads via
    dynamic partition overwrite.
    """
    writer = df.write.format(fmt).mode("overwrite")
    if partition_by:
        writer = writer.option("partitionOverwriteMode", "dynamic").partitionBy(*partition_by)
    writer.save(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    *,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Schema'd CSV reader with explicit malformed-record semantics —
    the knob a production ingest actually needs:

    - PERMISSIVE (default): malformed fields become NULL; pass
      `corrupt_col` to additionally capture the raw offending line in
      that column (add it to the schema as StringType) so bad records
      can be quarantined instead of silently nulled;
    - DROPMALFORMED: bad rows vanish (count the delta to audit);
    - FAILFAST: die on the first bad row (the strict-load contract).

    Always prefer an explicit schema at scale: inferSchema is a full
    extra pass over the data.
    """
    reader = spark.read.option("header", str(header).lower()).option("mode", mode)
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_evolved(
    spark: SparkSession,
    path: str,
    target_schema: StructType,
    *,
    fmt: str = "parquet",
) -> DataFrame:
    """Schema-evolution-safe read of a long-lived dataset whose files
    were written across epochs with columns ADDED or REMOVED over time
    — the normal life of a 100 TB lake table.

    ``mergeSchema`` unions the per-file footers (a metadata operation —
    files older than a column simply read it as NULL, no rewrite), then
    the result is projected onto `target_schema`:

    - a target column absent from every file → typed NULL column;
    - file columns outside the target → dropped (column pruning still
      reaches the scan for them);
    - present columns → ``try_cast`` to the target type, so an
      epoch-over-epoch type drift degrades to NULLs instead of killing
      the job under ANSI mode (count the NULL delta to audit).

    Same-name columns whose PARQUET types are incompatible across files
    (e.g. int32 vs int64) are a write-side versioning error: Spark's
    schema merge raises, and this function deliberately lets that
    surface rather than guessing a winner.
    """
    df = spark.read.option("mergeSchema", "true").format(fmt).load(path)
    cols = []
    for f in target_schema.fields:
        if f.name in df.columns:
            cols.append(df[f.name].try_cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def read_json(
    spark: SparkSession,
    path: str,
    schema=None,
    *,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Schema'd JSON-lines reader; same malformed-record contract as
    read_csv."""
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
