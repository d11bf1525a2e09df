"""Product quantization (PQ) approximate nearest neighbor — the
byte-code compression path of the ANN family (Jégou et al. 2011,
"Product Quantization for Nearest Neighbor Search"), complementing
brute force (exact), LSH buckets, and IVF partition pruning.

Why PQ is THE 100 TB similarity-search shape:
- the corpus is stored as m single-byte codes per vector instead of
  dim floats (64-dim float32 → 8 bytes here, a 32× compression): a
  100 TB float corpus becomes ~3 TB of codes that scan from parquet
  at memory-bandwidth speed;
- a query never touches the original vectors: the driver builds an
  (m × k) lookup table of subspace distances, and each row's
  approximate distance is m ARRAY LOOKUPS + adds, executed here as a
  pure Catalyst `aggregate` over the code array (no UDF, stays in
  whole-stage codegen) feeding TakeOrderedAndProject — zero shuffle;
- codebooks train on a bounded deterministic sample (lowest-id rows,
  faiss-style sample training); only the (m × k × dim/m) codebook
  matrix ever lives on the driver.

Vectors are L2-normalized at encode AND query time, so squared-L2 ADC
ordering equals cosine ordering (‖a−b‖² = 2−2·cos for unit vectors) —
consistent with the rest of the ANN family, and the emitted
approx_cosine = 1 − dist/2 is directly comparable to the exact path.

Determinism: sample selection (orderBy id), per-subspace k-means
seeding (first k sample rows), and Lloyd iterations are all
deterministic, so codes and rankings reproduce on any partitioning —
the property the rows-only driver check depends on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import lit_double_array
from pyspark.sql.functions import pandas_udf

__all__ = ["train_pq_codebooks", "encode_pq", "pq_topk"]


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def train_pq_codebooks(
    embeddings: DataFrame,
    *,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    max_train: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train per-subspace codebooks on a bounded deterministic sample;
    returns an (m, k, dim//m) float64 array."""
    rows = (
        embeddings.orderBy(id_col).limit(max_train).select(vec_col).collect()
    )
    sample = _normalize_rows(np.array([r[0] for r in rows], dtype=np.float64))
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"train_pq_codebooks: dim {dim} not divisible by m {m}")
    dsub = dim // m
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        cent = sub[:k].copy()  # deterministic seed: first k sample rows
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        books[j] = cent
    return books


def encode_pq(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach `codes` (array<int>, length m): per-subspace nearest
    codeword ids — one numpy distance matrix per Arrow batch."""
    m, k, dsub = codebooks.shape
    books = codebooks.copy()

    @pandas_udf("array<int>")
    def code(vecs: pd.Series) -> pd.Series:
        mat = _normalize_rows(np.vstack(vecs.to_numpy()).astype(np.float64))
        out = np.empty((mat.shape[0], m), dtype=np.int32)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            out[:, j] = d2.argmin(axis=1)
        return pd.Series(list(out))

    return embeddings.select(F.col(id_col), code(F.col(vec_col)).alias("codes"))


def pq_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over the code table: the (m × k)
    query-to-codeword LUT is inlined as a literal nested array and the
    per-row distance is a codegen fold — scan + TakeOrderedAndProject,
    no shuffle, no UDF, never touching a stored vector."""
    m, kk, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    lut = np.empty((m, kk), dtype=np.float64)
    for j in range(m):
        qsub = q[j * dsub : (j + 1) * dsub]
        lut[j] = ((codebooks[j] - qsub[None, :]) ** 2).sum(axis=1)
    lut_lit = F.array(
        *[lit_double_array(row) for row in lut]
    )
    idx = F.sequence(F.lit(1), F.lit(m))
    dist = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.element_at(lut_lit, j), F.element_at("codes", j) + 1
        ),
    )
    scored = encoded.select(
        F.col(id_col),
        F.round(F.lit(1.0) - dist / F.lit(2.0), 6).alias("approx_cosine"),
    )
    return scored.orderBy(F.desc("approx_cosine"), F.asc(id_col)).limit(k)
