"""File-inventory modeling: small-file compaction planning, file-size
histograms, and zone-map (min/max) skipping reports.

At 100 TB the inputs to table maintenance are not the rows but the FILE
INVENTORY — (file, rows, bytes, per-column min/max) — which comes from
the table format's manifest/metastore listing.  These operators take an
inventory DataFrame and plan maintenance over it:

- `compaction_plan`: greedy cumulative binning of adjacent files into
  target-size outputs — the OPTIMIZE/rewrite planner,
- `size_histogram`: power-of-two size buckets with byte share — the
  small-file-problem detector,
- `zonemap_skip_report`: per-layout file skipping under a predicate
  plus clustering overlap depth — the data-skipping evidence that
  justifies (or indicts) a sort order, the z-order report's sibling.

For the oracle-paired registry entries the inventory itself is MODELED
from table data (each date/hash partition is one "file"; bytes follow
an exact integer per-row encoding model), so DuckDB can replay every
number; `sources/layout.py::parquet_footer_stats` is the REAL-footer
counterpart (pyarrow footer reads, verified against DuckDB's
parquet_metadata() in tests/test_inventory.py).

All arithmetic is integer-exact; the only windows run over the
inventory relation, which is bounded by the file count (the
aggregate-child class of the plan lint).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import lit_long_array


def model_inventory(
    df: DataFrame,
    file_expr: Column,
    *,
    bytes_expr: Column | None = None,
    stat_col: str | None = None,
) -> DataFrame:
    """Collapse a table into a modeled file inventory: one row per
    `file_expr` value with an exact n_rows count, the est_bytes sum
    when a byte model is given, and, when `stat_col` is given, the
    per-file min/max zone map of that column.  ONE hash aggregation —
    the shape of a manifest build."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    if bytes_expr is not None:
        aggs.append(
            F.sum(bytes_expr.cast("long")).cast("long").alias("est_bytes")
        )
    if stat_col is not None:
        aggs += [
            F.min(stat_col).alias("zmin"),
            F.max(stat_col).alias("zmax"),
        ]
    return df.groupBy(file_expr.alias("file_id")).agg(*aggs)


def compaction_plan(inventory: DataFrame, target_bytes: int) -> DataFrame:
    """Greedy cumulative binning: walk files in file_id order, assign
    each to output bin floor(bytes_before / target_bytes) — adjacent
    small files coalesce, files at or above the target stand alone-ish
    (the classic bin-by-running-sum compaction planner; deterministic,
    no first-fit backtracking).  Returns one row per planned output:
    (out_bin, n_input_files, total_bytes, total_rows).

    The window is a single-partition running sum — over the INVENTORY,
    whose cardinality is the file count (bounded: it is itself an
    aggregation output), not the table.  Integer-exact via DIV."""
    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    w = Window.orderBy("file_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    before = F.coalesce(F.sum("est_bytes").over(w), F.lit(0)).cast("long")
    binned = inventory.withColumn("__before", before).withColumn(
        "out_bin", F.expr(f"__before DIV {int(target_bytes)}").cast("long")
    )
    return (
        binned.groupBy("out_bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_input_files"),
            F.sum("est_bytes").cast("long").alias("total_bytes"),
            F.sum("n_rows").cast("long").alias("total_rows"),
        )
        .orderBy("out_bin")
    )


def size_histogram(inventory: DataFrame) -> DataFrame:
    """Power-of-two file-size histogram: bucket = floor(log2(bytes))
    computed EXACTLY as length(base-2 digits) − 1 (conv to binary —
    no floating log; DuckDB replays with bin()).  Returns per bucket:
    file count, total bytes, and byte share of the table — the
    small-file detector (mass piled in low buckets = compact me)."""
    bucket = (
        F.length(F.conv(F.col("est_bytes").cast("string"), 10, 2)) - 1
    ).cast("int")
    per = (
        inventory.where(F.col("est_bytes") > 0)
        .groupBy(bucket.alias("log2_bytes"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("est_bytes").cast("long").alias("bucket_bytes"),
        )
    )
    total = F.sum("bucket_bytes").over(Window.partitionBy())
    return per.select(
        "log2_bytes",
        "n_files",
        "bucket_bytes",
        (F.col("bucket_bytes").cast("double") / total.cast("double")).alias(
            "byte_share"
        ),
    ).orderBy("log2_bytes")


def zonemap_skip_report(
    inventory: DataFrame,
    layout_name: str,
    lo: Column,
    hi: Column,
) -> DataFrame:
    """Data-skipping evidence for one layout's zone maps under the
    predicate stat BETWEEN lo AND hi: which files' [zmin, zmax] ranges
    prove they hold no matching row (zmax < lo OR zmin > hi), plus the
    layout's clustering OVERLAP DEPTH (per file, how many files' ranges
    intersect its own — depth 1 means perfectly clustered; depth ~
    n_files means the zone maps are useless).  Depth uses the sweep
    identity |{j: zmin_j <= zmax_i}| − |{j: zmax_j < zmin_i}| computed
    against two broadcast SORTED ARRAYS of the inventory's endpoints —
    no range self-join (a BNLJ shape), O(F²) array scans over the
    manifest-sized F, never the table.  Returns ONE summary row:
    (layout, n_files, n_skipped, rows_scanned, rows_total,
     avg_overlap_depth, max_overlap_depth)."""
    inv = inventory.select("file_id", "n_rows", "zmin", "zmax")
    skipped = (F.col("zmax") < lo) | (F.col("zmin") > hi)
    flagged = inv.withColumn("__skip", skipped)
    ends = inv.agg(
        F.array_sort(F.collect_list("zmin")).alias("__mins"),
        F.array_sort(F.collect_list("zmax")).alias("__maxs"),
    )
    depth_expr = (
        F.size(F.filter("__mins", lambda m: m <= F.col("zmax")))
        - F.size(F.filter("__maxs", lambda m: m < F.col("zmin")))
    ).cast("long")
    depth = flagged.join(F.broadcast(ends)).withColumn("__depth", depth_expr)
    return depth.agg(
        F.lit(layout_name).alias("layout"),
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.when(F.col("__skip"), 1).otherwise(0))
        .cast("long")
        .alias("n_skipped"),
        F.sum(F.when(F.col("__skip"), 0).otherwise(F.col("n_rows")))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("n_rows").cast("long").alias("rows_total"),
        (
            F.sum("__depth").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_overlap_depth"),
        F.max("__depth").cast("long").alias("max_overlap_depth"),
    )


def bloom_file_skipping(
    df: DataFrame,
    file_expr: Column,
    key_col: str,
    query_keys: list[int],
    *,
    n_words: int = 4,
    bits_per_word: int = 62,
) -> DataFrame:
    """Per-file BLOOM signatures for point-lookup file skipping — the
    equality complement of the zone-map report (ranges prune range
    predicates; blooms prune `key = ?`).  Each file gets a
    n_words×bits_per_word filter over `key_col` (k = 2 salted md5
    probes per key; bits stay below 62 because a 1<<63 overflows
    DuckDB's checked shift — the cross-engine bit-arithmetic bound),
    built with ONE bit_or hash aggregation.  Each query key then probes
    every file's signature (a map-side explode over the file-count-
    bounded bloom relation — no join) and the report compares
    bloom-pass file counts against ACTUAL file membership:

    (query_key, n_files_total, n_files_bloom_pass, n_files_actual,
     n_false_positive_files) — zero false negatives by construction
    (bloom_pass ⊇ actual, asserted in tests).

    100 TB shape: signatures live in the manifest (n_words longs per
    file); a point lookup touches only bloom-pass files.  Build is one
    scan; probing is arithmetic over the manifest.
    """
    if n_words < 1 or not 1 <= bits_per_word <= 62:
        raise ValueError("n_words >= 1 and 1 <= bits_per_word <= 62")
    nbits = n_words * bits_per_word

    def _wb(expr_sql: str, salt: str) -> tuple[str, str]:
        """(word, bit) SQL snippets for one salted md5 probe — SQL
        strings because PySpark's shiftleft() only takes a Python int
        for the shift amount; Spark SQL's shiftleft takes a column."""
        h = (
            f"(CAST(conv(substring(md5(concat('{salt}:', "
            f"CAST(({expr_sql}) AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            f" % {nbits})"
        )
        return f"(({h}) DIV {bits_per_word})", f"(({h}) % {bits_per_word})"

    aggs = []
    for w in range(n_words):
        parts = []
        for salt in ("b1", "b2"):
            word, bit = _wb(key_col, salt)
            parts.append(
                f"CASE WHEN {word} = {w}"
                f" THEN shiftleft(CAST(1 AS BIGINT), {bit})"
                f" ELSE CAST(0 AS BIGINT) END"
            )
        aggs.append(F.bit_or(F.expr(" | ".join(parts))).alias(f"w{w}"))
    blooms = df.groupBy(file_expr.alias("file_id")).agg(*aggs)

    qk = F.explode(
        lit_long_array(query_keys)
    ).alias("query_key")
    probed = blooms.select("*", qk)
    tests = []
    for salt in ("b1", "b2"):
        word, bit = _wb("query_key", salt)
        arms = " OR ".join(
            f"({word} = {w} AND (w{w} & shiftleft(CAST(1 AS BIGINT), {bit}))"
            f" = shiftleft(CAST(1 AS BIGINT), {bit}))"
            for w in range(n_words)
        )
        tests.append(f"({arms})")
    passes = F.expr(" AND ".join(tests))
    bloom_counts = (
        probed.withColumn("__pass", passes)
        .groupBy("query_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files_total"),
            F.sum(F.when(F.col("__pass"), 1).otherwise(0))
            .cast("long")
            .alias("n_files_bloom_pass"),
        )
    )
    actual = (
        df.where(F.col(key_col).isin([int(k) for k in query_keys]))
        .select(
            F.col(key_col).cast("long").alias("query_key"),
            file_expr.alias("f"),
        )
        .groupBy("query_key")
        .agg(F.count_distinct(F.col("f")).cast("long").alias("n_actual"))
    )
    return (
        bloom_counts.join(F.broadcast(actual), "query_key", "left")
        .select(
            "query_key",
            "n_files_total",
            "n_files_bloom_pass",
            F.coalesce(F.col("n_actual"), F.lit(0))
            .cast("long")
            .alias("n_files_actual"),
            (
                F.col("n_files_bloom_pass")
                - F.coalesce(F.col("n_actual"), F.lit(0))
            )
            .cast("long")
            .alias("n_false_positive_files"),
        )
        .orderBy("query_key")
    )


def bloom_fpr_report(
    df: DataFrame,
    key_col: str,
    *,
    n_words: int = 64,
    bits_per_word: int = 62,
    n_probes: int = 2048,
) -> DataFrame:
    """Measured bloom false-positive rate vs the rate its OWN load
    predicts — the measured-quality eval for the bloom family
    (bloom_file_skipping reports pass counts; this closes the loop on
    the probabilistic claim).  One global n_words x bits_per_word
    filter is built over `key_col` (k=2 salted md5 probes, bits < 62
    for DuckDB's checked shift), then probed with `n_probes`
    GUARANTEED non-members (negative keys; fixture keys are positive
    at every SF), so every pass is a false positive.  The expectation
    uses the MEASURED load: with rho = bits_set/n_bits, an
    independent-probe pass has probability rho^2 — computed from the
    filter itself, so the claim survives saturation (a saturated
    filter predicts rho^2 ~ 1 and still verifies, the custkey_bloom
    sizing-signal story).  Verdict: |measured − expected| within the
    binomial 3-sigma band + 2/n_probes slack for the
    both-probes-same-bit correction the independence model ignores.

    Shape: the filter is a RELATIONAL signature — an (word, bits)
    table of <= n_words rows built by one groupBy(word)·bit_or
    aggregation over the key's two (word, bit) probe positions, and
    the probe pass is a broadcast join against that table (the first
    cut materialized the filter as one 64-column row with per-word
    CASE chains; the resulting 128-arm codegen tree cost ~14 s of
    compile at ANY scale — measured — while this relational form runs
    ~1 s and is what a manifest would store anyway).  Every value
    replays in DuckDB: the oracle rebuilds the bit SET (membership is
    equivalent to the word signature), the same loads, and the same
    one-sqrt verdict chain.
    """
    if not 1 <= bits_per_word <= 62:
        raise ValueError("1 <= bits_per_word <= 62")
    nbits = n_words * bits_per_word

    def _positions(frame: DataFrame, expr: str, out: str) -> DataFrame:
        """(…, word, bit) for both salted probes of `expr` (2 rows per
        input row)."""
        h = (
            "CAST(conv(substring(md5(concat(s.salt, ':', "
            f"CAST(({expr}) AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            f" % {nbits}"
        )
        return (
            frame.join(
                F.broadcast(
                    frame.sparkSession.createDataFrame(
                        [("b1",), ("b2",)], "salt string"
                    ).alias("s")
                )
            )
            .select(
                F.col(expr).alias(out) if expr != out else F.col(out),
                F.expr(h).alias("__gb"),
            )
            .select(
                out,
                F.expr(f"__gb DIV {bits_per_word}").cast("long").alias("word"),
                (F.col("__gb") % bits_per_word).cast("int").alias("bit"),
            )
        )

    keys = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("long").alias("k")
    )
    words = (
        _positions(keys, "k", "k")
        .groupBy("word")
        .agg(
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias(
                "w_bits"
            )
        )
    )
    stats = words.agg(
        F.sum(F.bit_count("w_bits")).cast("long").alias("bits_set")
    ).join(
        F.broadcast(
            keys.agg(F.count_distinct("k").cast("long").alias("n_keys"))
        )
    )

    spark = df.sparkSession
    probes = spark.range(1, n_probes + 1).select(
        (-F.col("id")).cast("long").alias("p")
    )
    hit = (
        _positions(probes, "p", "p")
        .join(F.broadcast(words), "word", "left")
        .select(
            "p",
            (
                F.coalesce(
                    F.col("w_bits").bitwiseAND(
                        F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
                    ),
                    F.lit(0),
                )
                != 0
            )
            .cast("int")
            .alias("__present"),
        )
        .groupBy("p")
        .agg(F.min("__present").alias("__pass"))
    )
    pass_agg = hit.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum("__pass").cast("long").alias("n_false_pass"),
    )
    agg = pass_agg.join(F.broadcast(stats))
    rho = F.col("bits_set").cast("double") / F.lit(float(nbits))
    measured = F.col("n_false_pass").cast("double") / F.col(
        "n_probes"
    ).cast("double")
    expected = rho * rho
    band = 3.0 * F.sqrt(
        expected * (F.lit(1.0) - expected) / F.col("n_probes").cast("double")
    ) + F.lit(2.0) / F.col("n_probes").cast("double")
    return agg.select(
        "n_keys",
        F.lit(nbits).cast("long").alias("n_bits"),
        "bits_set",
        F.round(rho, 6).alias("load_rho"),
        "n_probes",
        "n_false_pass",
        F.round(measured, 6).alias("measured_fpr"),
        F.round(expected, 6).alias("expected_fpr"),
        (F.abs(measured - expected) <= band).alias("within_3sigma"),
    )
