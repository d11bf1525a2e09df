"""Document chunking — split each document into overlapping fixed-size
token windows, the unit a context-length-bounded training pipeline
feeds to a model.

Design (100 TB): tokens via the shared whitespace contract
(functions.texttools.tokens_expr), chunk starts generated with
`sequence` and expanded array-locally with `slice` under `explode` —
all Catalyst higher-order functions, map-only, no shuffle, no UDF.
Output size is ~len/stride rows per doc; cost is one linear scan.

Chunk grammar (1-based token positions, mirrored exactly by the DuckDB
oracle): starts are 1, 1+stride, ... with
``n_chunks = 1 + max(0, ceil((n_tokens - chunk_size) / stride))`` —
every token is covered, consecutive chunks overlap by
``chunk_size - stride`` tokens, the final chunk may be short, and a doc
shorter than ``chunk_size`` yields exactly one chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texttools import tokens_expr


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """One row per (doc, chunk): ``chunk_id`` (0-based), ``chunk_text``,
    ``n_chunk_tokens``.

    ceil((n - chunk_size) / stride) is computed as
    ``greatest(0, (n - chunk_size + stride - 1) div stride)`` — for the
    only case where truncating (Spark DIV) and flooring (DuckDB //)
    integer division differ, a negative numerator, both land in the
    greatest(0, ·) clamp, so the grammar is engine-identical.
    """
    if not (0 < stride <= chunk_size):
        raise ValueError("require 0 < stride <= chunk_size")
    toks = tokens_expr(text_col)
    last = F.greatest(
        F.lit(0),
        F.expr(
            f"(size(filter(split(trim({text_col}), '\\\\s+'), t -> t != '')) "
            f"- {chunk_size} + {stride - 1}) div {stride}"
        ).cast("int"),
    )
    exploded = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), last)).alias("chunk_id"),
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_size)
    return exploded.select(
        id_col,
        "chunk_id",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_chunk_tokens"),
    )
