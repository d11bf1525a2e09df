"""IVF (inverted-file) approximate nearest neighbor — the partition-
pruning counterpart to the LSH path in operators/similarity.py.

Shape of the index at 100 TB:
- **build**: pick k centroids (deterministic seed rows + a few Lloyd
  refinement passes, each one groupBy-mean over the assignments — pure
  DataFrame aggregation), then write the corpus *partitioned by
  cluster_id*.  The index IS the physical layout.
- **query**: score the k centroids driver-side (k·dim floats — tiny),
  take the nprobe nearest lists, and brute-force only those partitions.
  With partitioned storage that is literal partition pruning: the scan
  never touches the other k−nprobe lists.

Assignments use the same Arrow-batched numpy matmul as the LSH
bucketer — one (batch×dim)@(dim×k) product per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.vectors import cosine_expr


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def train_centroids(
    embeddings: DataFrame,
    *,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """k cosine centroids: seeded with the k lowest-id vectors
    (deterministic), refined with `iters` Lloyd passes where each pass
    is one distributed assign + one groupBy-mean.

    The only driver-side data is the (k × dim) centroid matrix itself.
    """
    seeds = (
        embeddings.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids = _normalize(np.array([r[0] for r in seeds], dtype=np.float64))
    for _ in range(iters):
        assigned = assign_clusters(embeddings, centroids, vec_col=vec_col)
        sums = (
            assigned.groupBy("cluster_id")
            .agg(
                F.array(
                    *[
                        F.sum(F.col(vec_col)[i].cast("double")).alias(f"s{i}")
                        for i in range(centroids.shape[1])
                    ]
                ).alias("vec_sum"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = centroids.copy()
        for row in sums:
            new[row["cluster_id"]] = np.array(row["vec_sum"]) / row["n"]
        centroids = _normalize(new)
    return centroids


def assign_clusters(
    embeddings: DataFrame, centroids: np.ndarray, *, vec_col: str = "embedding"
) -> DataFrame:
    """Attach cluster_id = argmax cosine(centroid, vec) via one numpy
    matmul per Arrow batch."""
    cent = centroids.T.copy()  # (dim, k)

    @pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        mat = _normalize(np.vstack(vecs.to_numpy()).astype(np.float64))
        return pd.Series(np.argmax(mat @ cent, axis=1).astype(np.int32))

    return embeddings.withColumn("cluster_id", nearest(F.col(vec_col)))


def write_ivf_index(
    embeddings: DataFrame, centroids: np.ndarray, path: str, *, vec_col: str = "embedding"
) -> None:
    """Materialize the index: corpus partitioned by cluster_id, so
    probe-time reads prune whole directories."""
    assign_clusters(embeddings, centroids, vec_col=vec_col).write.mode(
        "overwrite"
    ).partitionBy("cluster_id").parquet(path)


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    *,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over the nprobe nearest inverted lists only.

    `indexed` is either assign_clusters output or a read of the
    partitioned index (where the cluster_id filter prunes partitions).
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probes = np.argsort(-(centroids @ qn))[:nprobe].tolist()
    from ..functions.arrays import lit_double_array

    qlit = lit_double_array(query_vec)
    candidates = indexed.where(F.col("cluster_id").isin(probes))
    scored = candidates.select(
        F.col(id_col), F.round(cosine_expr(F.col(vec_col), qlit), 6).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
