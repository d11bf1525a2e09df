"""Multimodal columns (north-star §2b): opaque binary payloads + typed
metadata, processed by Arrow-batched Python over mapInPandas.

Design (the part that must be right at 100 TB):
- blobs are `binary` columns with a sibling metadata struct — parquet
  stores them page-compressed, scans prune them unless projected;
- per-blob work (decode/resize/feature-extract) is mapInPandas: Arrow
  ships each partition to Python in columnar batches, numpy processes
  them vectorized, results stream back — no driver involvement, no
  collect, partition-parallel;
- batch size is bounded via spark.sql.execution.arrow.maxRecordsPerBatch
  when blobs are large (set by callers; default fine for test blobs).

The actual image/audio decode is STUBBED (`decode_image` raises
NotImplementedError) because no codec libraries exist in this container;
`extract_blob_features` uses a deterministic fake (byte stats) so the
plumbing — schema, batching, UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_FEATURES_SCHEMA = "doc_id long, n_bytes int, byte_sum long, byte_entropy_q double"


def make_blob_table(documents: DataFrame) -> DataFrame:
    """Build a multimodal-shaped table from documents: text→utf-8 blob +
    typed metadata struct (what a real pipeline carries next to images)."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("blob"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").cast("int").alias("declared_len"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def decode_image(blob: bytes) -> "np.ndarray":
    """Real decode path — requires an image codec not present here.

    STUB: the Spark-side plumbing calls extract_blob_features instead;
    swap this in when Pillow/ffmpeg are available.
    """
    raise NotImplementedError("image/audio codecs not available in this environment")


RESIZE_SCHEMA = "doc_id long, blob binary, n_bytes int"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame binary, frame_bytes int"


def resize_blobs(blobs: DataFrame, *, target_bytes: int = 64) -> DataFrame:
    """'Resize' plumbing: deterministic stand-in for image resize —
    truncate/keep each blob to `target_bytes` via mapInPandas.  A real
    implementation swaps the numpy slice for PIL/cv2 resize; the Spark
    contract (schema, batching, per-row transform) is identical."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [bytes(b[:target_bytes]) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": out,
                    "n_bytes": [len(b) for b in out],
                }
            )

    return blobs.select("doc_id", "blob").mapInPandas(do_resize, RESIZE_SCHEMA)


def sample_frames(blobs: DataFrame, *, frame_bytes: int = 32, every_n: int = 4) -> DataFrame:
    """'Frame-sample' plumbing: one input blob → many frame rows (every
    n-th fixed-size chunk), the 1→N row shape video frame sampling
    needs.  mapInPandas lets a batch yield more rows than it received —
    no explode of a pre-materialized array, frames stream out."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, chunks = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                n_frames = max(1, len(blob) // frame_bytes)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    chunks.append(bytes(blob[i * frame_bytes : (i + 1) * frame_bytes]))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame": chunks,
                    "frame_bytes": [len(c) for c in chunks],
                }
            )

    return blobs.select("doc_id", "blob").mapInPandas(frames, FRAMES_SCHEMA)


def extract_blob_features(blobs: DataFrame) -> DataFrame:
    """Deterministic per-blob features via mapInPandas (the decode
    stand-in): byte length, byte sum, quantized byte entropy."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            arrs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["blob"]]
            n_bytes = np.array([a.size for a in arrs], dtype=np.int32)
            byte_sum = np.array([int(a.sum()) for a in arrs], dtype=np.int64)
            ent = []
            for a in arrs:
                if a.size == 0:
                    ent.append(0.0)
                    continue
                counts = np.bincount(a, minlength=256).astype(np.float64)
                p = counts[counts > 0] / a.size
                ent.append(round(float(-(p * np.log2(p)).sum()), 4))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "byte_sum": byte_sum,
                    "byte_entropy_q": ent,
                }
            )

    return blobs.select("doc_id", "blob").mapInPandas(features, BLOB_FEATURES_SCHEMA)
