"""SemDeDup — semantic deduplication of an embedding corpus (Abbas et
al., "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", 2023): k-means-cluster the embeddings, then inside each
cluster strike every item whose cosine similarity to an already-kept
item exceeds a threshold, keeping one representative per semantic-
duplicate group.

North-star extension operator (not in the reference — the reference is
a batch star-schema ETL; this belongs to the mandated LLM-pipeline
dedup family alongside operators/dedup.py's MinHash/SimHash and
operators/similarity.py's LSH near-dup).

Why clustering first: the paper's observation is that semantic dups
land in the same k-means cluster with overwhelming probability, so the
O(n²) cosine matrix never has to be built — only per-cluster matrices
of size ≤ max_cluster².  That is exactly the bucket-grouped candidate
discipline every other near-dup operator in this repo uses, with the
k-means assignment as the bucketing function.

100 TB shape:
- **train**: `operators/ivf.py::train_centroids` — seeds are the k
  lowest-id vectors (deterministic), each Lloyd pass is one
  distributed assign + one groupBy-mean; the only driver-side state is
  the (k × dim) centroid matrix.
- **assign**: one Arrow-batched numpy matmul per batch
  (`assign_clusters`), map-only.
- **dedup**: ONE shuffle keyed by cluster_id into `applyInPandas`;
  each task holds one cluster's (≤ max_cluster × dim) matrix, computes
  its pairwise-cosine upper triangle with a single numpy gram product,
  and runs the paper's greedy keep pass.  Per-task cost is bounded by
  max_cluster²·dim flops; k scales the parallelism.
- A corpus-sized k (the paper uses k ≈ n/10⁴) keeps clusters at the
  cap; `on_overflow` decides whether an over-cap cluster raises
  (default — the honest signal to re-train with larger k) or keeps its
  overflow items un-deduped (`'keep'` — the safe direction: never
  silently drop content).

Greedy order inside a cluster follows the paper: items are visited in
DESCENDING distance from the centroid (ascending centroid-cosine,
vec_id tie-break), so the kept representative of each duplicate group
is the one farthest from the centroid — the paper's choice, keeping
the "edge" examples and discarding redundant near-centroid mass.

Determinism: seeds by lowest id, numpy argmax breaks ties at the first
index, greedy order is (centroid_cos, id)-lexicographic — two runs on
the same data UNDER THE SAME PARTITIONING produce identical verdicts
(pinned in tests/test_semdedup.py).  Across different partitionings
the Lloyd passes' distributed double sums can accumulate in a
different order, so centroids — and, for a vector nearly equidistant
between two of them, an assignment — may differ in low-order bits;
the keep/drop GUARANTEES (separation of the kept set, coverage of
dropped items) hold regardless.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ivf import _normalize, assign_clusters, train_centroids

VERDICT_SCHEMA = (
    "vec_id long, cluster_id int, centroid_cosine double, "
    "keep boolean, kept_by long"
)


def semantic_dedup(
    embeddings: DataFrame,
    *,
    k: int = 16,
    iters: int = 2,
    threshold: float = 0.97,
    max_cluster: int = 4096,
    on_overflow: str = "raise",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One verdict row per input vector: (vec_id, cluster_id,
    centroid_cosine, keep, kept_by) — `kept_by` is the id of the kept
    representative a dropped item matched (NULL for kept items).
    """
    if on_overflow not in ("raise", "keep"):
        raise ValueError(f"on_overflow must be 'raise' or 'keep', got {on_overflow!r}")
    centroids = train_centroids(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    assigned = assign_clusters(embeddings, centroids, vec_col=vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"), "cluster_id"
    )

    cent = centroids  # (k, dim), unit rows

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(pdf["cluster_id"].iloc[0])
        if len(pdf) > max_cluster and on_overflow == "raise":
            raise ValueError(
                f"semantic_dedup: cluster {cid} holds {len(pdf)} items "
                f"(max_cluster={max_cluster}); re-train with larger k or "
                "pass on_overflow='keep'"
            )
        mat = _normalize(np.vstack(pdf["v"].to_numpy()).astype(np.float64))
        cc = mat @ cent[cid]
        ids = pdf["vec_id"].to_numpy()
        # paper order: farthest-from-centroid first; id tie-break
        order = np.lexsort((ids, cc))
        in_cap = order[:max_cluster]  # over-cap tail stays kept
        keep = np.ones(len(pdf), dtype=bool)
        # nullable Int64 (pd.NA for kept rows) — an in-band sentinel
        # like -1 would corrupt corpora with negative ids
        kept_by = np.zeros(len(pdf), dtype=np.int64)
        has_keeper = np.zeros(len(pdf), dtype=bool)
        # the gram matrix is built ONLY over the in-cap prefix — this
        # is what makes max_cluster a real memory/compute bound
        # (≤ cap²), not just a candidate-count knob
        sub = mat[in_cap]
        gram = sub @ sub.T
        kept_local = np.empty(len(in_cap), dtype=np.int64)
        m = 0
        for j, pos in enumerate(in_cap):
            if m:
                hit = gram[j, kept_local[:m]] >= threshold
                if hit.any():
                    keep[pos] = False
                    # first kept item (in greedy order) it matched
                    kept_by[pos] = ids[in_cap[kept_local[:m][int(np.argmax(hit))]]]
                    has_keeper[pos] = True
                    continue
            kept_local[m] = j
            m += 1
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster_id": np.full(len(pdf), cid, dtype=np.int32),
                "centroid_cosine": np.round(cc, 6),
                "keep": keep,
                "kept_by": pd.array(
                    [int(k) if h else pd.NA for k, h in zip(kept_by, has_keeper)],
                    dtype="Int64",
                ),
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(
        dedup_cluster, schema=VERDICT_SCHEMA
    )
