"""Line-level boilerplate removal — the CCNet-style corpus cleaning
step (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", §4.2 line-level deduplication): a line
that recurs across many documents (headers, footers, cookie banners,
nav menus) is boilerplate and is struck from every document that
carries it, preserving the order of the surviving lines.

North-star extension operator (not in the reference — the reference is
a batch star-schema ETL, roberthpchao/Northwind-ETL `etl_orders.py`;
this belongs to the mandated LLM-pipeline family).

100 TB shape — the whole operator is three bounded passes:

1. **Line doc-frequency**: one `posexplode` of the split text (map
   side, no shuffle), then ONE aggregation keyed by the 16-byte
   `md5(lower(trim(line)))` digest — the shuffle carries digests and
   doc ids, never line text.  `countDistinct(doc_id)` is Catalyst's
   two-phase distinct rewrite: partial (key, doc_id) dedup map-side,
   so a boilerplate line that appears 10⁹ times still ships one row
   per (partition, key, doc) to the exchange.
2. **Boilerplate set**: filtering the frequency table to
   `line_df · denom ≥ num · total_docs` (an integer-exact fraction
   test, no float) leaves only the boilerplate keys.  *By definition
   of boilerplate this set is small* — it is the distinct lines shared
   across ≥ the threshold fraction of a corpus, i.e. templates, not
   content — so it is explicitly `F.broadcast` and the removal is a
   broadcast LEFT ANTI join: the line table is never shuffled for the
   filter.  (A corpus where the "boilerplate" set itself is huge
   violates the operator's premise; the knob to tighten is
   `min_df_frac`.)  The join is a flagged LEFT OUTER rather than an
   anti join so the drop COUNTS survive into the same pass.
3. **Reassembly**: one `groupBy(doc_id)` whose per-key state is the
   document's own surviving lines (bounded by document size, the same
   per-key bound every keyed window in this repo relies on), sorted
   array-locally by position — no window function.  Counting and
   reassembly share this single aggregation, so the corpus is exploded
   exactly twice end-to-end (once feeding the frequency agg, once
   feeding the reassembly) — there is no third per-doc counting scan.

The total-docs scalar joins in as a broadcast 1-row cross join (the
same shape as q11/q22's scalar subqueries) — no driver action, no
collect.

Determinism: line keys are md5 of the lower/trimmed line; the fraction
test is pure integer arithmetic (`line_df * denom >= num * total`), so
DuckDB reproduces every keep/drop decision bit-for-bit and the
reassembled text hashes identically (see plans/oracles.py
::boilerplate_cleaned_docs).
"""

from __future__ import annotations

import re
from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_lines(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
) -> DataFrame:
    """One row per (doc, position, line).  Blank / whitespace-only
    lines are dropped before counting (they are neither content nor
    boilerplate; both engines agree on the trim).  `delim` is a
    LITERAL separator — it is regex-escaped before F.split so '|',
    '.', etc. split where the delimiter actually occurs."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(delim))).alias(
            "pos", "line"
        ),
    )
    return lines.where(F.trim("line") != "")


def line_doc_frequency(
    lines: DataFrame, *, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct-document frequency per normalized line key.

    The shuffle key is the md5 digest (16 bytes), never the line text;
    countDistinct gets Catalyst's two-phase rewrite so the hot
    boilerplate keys partially deduplicate map-side.
    """
    keyed = lines.select(
        F.md5(F.lower(F.trim("line"))).alias("line_key"), F.col(id_col)
    )
    return keyed.groupBy("line_key").agg(
        F.countDistinct(id_col).alias("line_df")
    )


def remove_boilerplate_lines(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df_frac: float = 0.05,
    delim: str = "\n",
) -> DataFrame:
    """Strike every line whose document frequency is ≥ `min_df_frac`
    of the corpus; return one row per document with the cleaned text
    and keep/drop counts.

    Output: (id_col, n_lines int, n_kept int, n_dropped int,
    cleaned_text string) — cleaned_text is the surviving lines joined
    by `delim` in their original order ('' when everything was
    boilerplate).
    """
    frac = Fraction(min_df_frac).limit_denominator(10**6)
    num, denom = frac.numerator, frac.denominator

    # keep blank rows flagged (not filtered) so a document with zero
    # non-blank lines still reaches the final groupBy — contract: one
    # output row per input document, with no extra join.  NULL text
    # reads as '' (split('') yields [''] → one blank row per doc).
    all_rows = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), re.escape(delim))
        ).alias("pos", "line"),
    ).withColumn("__blank", F.trim("line") == "")
    lines = all_rows.where(~F.col("__blank")).drop("__blank")
    keyed = all_rows.withColumn("line_key", F.md5(F.lower(F.trim("line"))))

    total = df.select(F.count(F.lit(1)).alias("total_docs"))
    freq = line_doc_frequency(lines, id_col=id_col)
    # integer-exact fraction test: df/total >= num/denom
    boiler = (
        freq.crossJoin(F.broadcast(total))
        .where(F.col("line_df") * denom >= F.col("total_docs") * num)
        .select("line_key")
    )

    # flagged broadcast LEFT OUTER (not anti) so counting and
    # reassembly fold into ONE aggregation pass over ONE explode —
    # collect_list skips the NULL that when() leaves on boilerplate
    # rows, so the kept-only struct array comes out of the same agg
    # that counts all lines.
    marked = keyed.join(
        F.broadcast(boiler.withColumn("__boiler", F.lit(True))),
        "line_key",
        "left",
    )
    real_line = F.count(F.when(~F.col("__blank"), 1))
    kept_struct = F.when(
        ~F.col("__blank") & F.col("__boiler").isNull(),
        F.struct(F.col("pos"), F.col("line")),
    )
    return marked.groupBy(id_col).agg(
        real_line.cast("int").alias("n_lines"),
        F.count(kept_struct).cast("int").alias("n_kept"),
        (real_line - F.count(kept_struct)).cast("int").alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["line"],
            ),
            delim,
        ).alias("cleaned_text"),
    )


def global_line_dedup(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
) -> DataFrame:
    """CORPUS-GLOBAL exact line dedup (the Lee et al. 2022 /
    RefinedWeb paragraph-dedup step, at line granularity): every
    repeated line keeps exactly its FIRST occurrence — minimum
    (doc, position) over the whole corpus per normalized line key —
    and every other copy is struck, complementing
    remove_boilerplate_lines' frequency threshold (that removes ALL
    copies of hot lines; this keeps one canonical copy of EVERY line).

    Output: one row per document — (id_col, n_lines int,
    kept_lines long, cleaned_md5 string) with cleaned_md5 the digest
    of the surviving lines joined by `delim` in original order (''
    hashes when nothing survives) — the dedup_span_removed_docs
    reporting convention, which keeps the oracle hash over the FULL
    rebuilt text without shipping it.

    Scale shape: lines explode once; the first-occurrence choice is
    ONE groupBy(line_key).min(struct(doc, pos)) — md5 keys shuffle,
    never line text — then a broadcast-size join back and one
    per-doc rebuild aggregation.  Deterministic: min over a total
    (doc, pos) order.
    """
    lines = split_lines(df, text_col=text_col, id_col=id_col, delim=delim)
    keyed = lines.select(
        F.col(id_col),
        "pos",
        "line",
        F.md5(F.lower(F.trim("line"))).alias("line_key"),
    )
    from ..cache import persist_stage

    keyed = persist_stage(keyed)
    first = keyed.groupBy("line_key").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__first")
    )
    kept = keyed.join(first, "line_key").where(
        (F.col(id_col) == F.col("__first")[id_col])
        & (F.col("pos") == F.col("__first.pos"))
    )
    per_doc_total = keyed.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_lines")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("kept_lines"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "line"))
                    ),
                    lambda s: s["line"],
                ),
                delim,
            )
        ).alias("cleaned_md5"),
    )
    empty_md5 = F.md5(F.lit(""))
    return per_doc_total.join(rebuilt, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce("kept_lines", F.lit(0).cast("long")).alias("kept_lines"),
        F.coalesce("cleaned_md5", empty_md5).alias("cleaned_md5"),
    )
