"""Distributed PCA over an embedding column — the dimensionality-
reduction stage of an LLM data pipeline (project 64-dim embeddings to
the top-k principal components before ANN indexing / clustering /
visualization).

Scale shape (the classic moments decomposition):

- **Train**: the covariance matrix needs only the additive moment
  triple (n, Σx, Σx·xᵀ).  One `mapInPandas` pass emits ONE partial
  state per Arrow batch group (a (1 + dim + dim²)-vector of float64 —
  ~33 kB at dim 64); the driver sums the P partials and runs
  `numpy.linalg.eigh` on the dim×dim covariance.  Driver-side data is
  O(P + dim²) — never the corpus.  This is also the mergeable-state
  pattern (incremental.py): moment states from disjoint shards merge
  by plain addition.
- **Project**: one Arrow-batched matmul `(X − mean) @ Wᵀ` per batch
  (the assign_clusters idiom from ivf.py) — map-only, no shuffle.

Determinism contract (the SemDeDup honesty rule): float64 partial
sums are deterministic for a FIXED partitioning; across different
partitionings the reduction order can differ in the last ulps, which
`eigh` can amplify near degenerate eigenvalues.  Tests pin numpy
agreement, orthonormality, descending eigenvalues, and fixed-
partitioning determinism — not cross-partitioning bit-equality.
Sign convention: each component is flipped so its largest-|entry|
coordinate is positive (numpy and Spark sides agree by construction).

Verified: tests/test_pca.py; driver-visible via the rows-only
`pca_label_projection` entry (eigendecomposition is not expressible
in SQL — the declared no-oracle class).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


class PCAModel:
    """mean (dim,), components (k, dim) row-major, eigenvalues (k,),
    explained_ratio (k,) — plain numpy state, small by construction."""

    def __init__(self, mean, components, eigenvalues, total_variance):
        self.mean = mean
        self.components = components
        self.eigenvalues = eigenvalues
        self.total_variance = total_variance

    @property
    def explained_ratio(self):
        return self.eigenvalues / self.total_variance


def train_pca(
    embeddings: DataFrame, *, k: int = 8, vec_col: str = "embedding"
) -> PCAModel:
    """Fit the top-k principal components of `vec_col` (exact moments,
    not iterative/stochastic)."""
    first = embeddings.select(vec_col).first()
    if first is None:
        raise ValueError("train_pca on an empty relation")
    dim = len(first[0])
    if not 1 <= k <= dim:
        raise ValueError(f"k={k} outside 1..{dim}")

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:  # empty Arrow batch: nothing to add
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            state = np.concatenate(
                [[float(len(mat))], mat.sum(axis=0), (mat.T @ mat).ravel()]
            )
            yield pd.DataFrame({"state": [state.tolist()]})

    rows = (
        embeddings.select(vec_col)
        .mapInPandas(partials, schema="state array<double>")
        .collect()
    )
    total = np.zeros(1 + dim + dim * dim)
    # deterministic reduction order for a fixed partitioning (full
    # lexicographic key; equal states commute exactly anyway)
    for r in sorted(rows, key=lambda r: r["state"]):
        total += np.array(r["state"])
    n = total[0]
    if n < 2:
        raise ValueError("train_pca needs at least 2 vectors")
    mean = total[1 : 1 + dim] / n
    gram = total[1 + dim :].reshape(dim, dim)
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()  # (k, dim)
    # sign convention: largest-|entry| coordinate positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total_var = float(np.clip(evals, 0, None).sum())
    return PCAModel(mean, comps, np.clip(evals[order], 0, None), total_var)


def project_pca(
    embeddings: DataFrame,
    model: PCAModel,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append `out_col` = the k-dim projection (X − mean) @ Wᵀ — one
    numpy matmul per Arrow batch, map-only."""
    mean, wt = model.mean, model.components.T.copy()  # (dim, k)

    @pandas_udf("array<double>")
    def proj(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        out = (mat - mean) @ wt
        return pd.Series(list(out))

    return embeddings.withColumn(out_col, proj(F.col(vec_col)))
