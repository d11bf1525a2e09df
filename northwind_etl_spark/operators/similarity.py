"""Similarity search over embedding columns (north-star §2b).

Two tiers, per the scale plan:

- **Brute-force top-k** (`knn_bruteforce`): score every row against the
  query with the Catalyst fold from functions/vectors.py, then
  TakeOrderedAndProject.  Linear scan, embarrassingly parallel, zero
  shuffle until the final k·partitions merge — the correct baseline and
  the oracle-checkable semantics.
- **LSH-bucketed ANN** (`rp_lsh_buckets` / `ann_lsh_topk`): sign-random-
  projection buckets computed by a *vectorized* pandas UDF (numpy matmul
  over Arrow batches — the Python-but-fast path).  Probing only the
  query's bucket turns the 100 TB scan into a bucket-sized scan;
  multi-probe widens recall.  Projections are seeded → deterministic.

Embedding near-dup (`embedding_near_duplicates`): cosine ≥ τ pairs found
inside LSH buckets only — same no-O(n²) discipline as operators/dedup.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.vectors import cosine_expr, norm_expr


def knn_bruteforce(
    embeddings: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    from ..functions.arrays import lit_double_array

    q = lit_double_array(query_vec)
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def _projection_matrix(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def rp_lsh_buckets(
    embeddings: DataFrame,
    *,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-random-projection bucket id per row (deterministic, seeded).

    numpy does (batch × dim) @ (dim × planes) per Arrow batch — one
    matmul per ~10k rows instead of 64·12 expression nodes per row.
    """
    planes = _projection_matrix(dim, n_planes, seed)

    @pandas_udf("long")
    def bucket_of(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())  # (batch, dim) float32
        signs = (mat.astype(np.float64) @ planes) > 0  # (batch, planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(signs @ weights)

    return embeddings.withColumn("bucket", bucket_of(F.col(vec_col)))


def ann_lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only rows whose bucket is within
    `multiprobe_hamming` bit-flips of the query's bucket."""
    dim = len(query_vec)
    planes = _projection_matrix(dim, n_planes, seed)
    qsigns = (np.asarray(query_vec, dtype=np.float64) @ planes) > 0
    qbucket = int((qsigns * (1 << np.arange(n_planes))).sum())
    probe = {qbucket}
    if multiprobe_hamming >= 1:
        probe |= {qbucket ^ (1 << b) for b in range(n_planes)}
    if multiprobe_hamming >= 2:
        probe |= {
            qbucket ^ (1 << b1) ^ (1 << b2)
            for b1 in range(n_planes)
            for b2 in range(b1 + 1, n_planes)
        }
    bucketed = rp_lsh_buckets(
        embeddings, dim=dim, n_planes=n_planes, seed=seed, vec_col=vec_col
    )
    candidates = bucketed.where(F.col("bucket").isin(*[int(b) for b in probe]))
    return knn_bruteforce(candidates, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ann_lsh_topk_frozen(
    embeddings: DataFrame,
    query_vec: list[float],
    *,
    k: int = 10,
    n_planes: int = 6,
    multiprobe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "ann-lsh-r12",
) -> DataFrame:
    """ann_lsh_topk with the md5-FROZEN Achlioptas sign planes
    (functions/vectors.py::rp_signs) instead of the numpy-seeded
    Gaussian matrix — same probe semantics (score only rows whose
    sign-bucket is within `multiprobe_hamming` bit flips of the
    query's), but every projection coordinate is a sequential
    Catalyst double fold over sign LITERALS, so a SQL oracle replays
    the buckets, the probe set, and the final cosine top-k
    bit-for-bit (the rp_lsh_recall_eval machinery, pointed at the
    search path).  The query's bucket is computed driver-side with
    the IDENTICAL left-to-right fold (python float adds are the same
    correctly-rounded IEEE ops), one pure-python pass over the sign
    rows — no job, unlike the .first() that fetched the query vector.

    Production keeps ann_lsh_topk's vectorized-numpy bucket pass for
    throughput; this twin is the oracle-checkable semantics of the
    same index, and the registry's driver-verified search entry."""
    from ..functions.vectors import rp_signs, sparse_rp_exprs

    dim = len(query_vec)
    signs = rp_signs(dim, n_planes, seed=seed)
    qbucket = 0
    for j, row in enumerate(signs):
        acc = 0.0
        for s, x in zip(row, query_vec):
            acc = acc + (float(s) * float(x))
        if acc > 0:
            qbucket |= 1 << j
    probe = {qbucket}
    if multiprobe_hamming >= 1:
        probe |= {qbucket ^ (1 << b) for b in range(n_planes)}
    if multiprobe_hamming >= 2:
        probe |= {
            qbucket ^ (1 << b1) ^ (1 << b2)
            for b1 in range(n_planes)
            for b2 in range(b1 + 1, n_planes)
        }
    ys = sparse_rp_exprs(F.col(vec_col), signs)
    proj = embeddings.select(F.col(id_col), F.col(vec_col), *ys)
    bucket = None
    for j in range(n_planes):
        term = F.when(F.col(f"y{j:02d}") > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        bucket = term if bucket is None else bucket + term
    cand = proj.where(bucket.isin(*sorted(probe))).select(
        F.col(id_col), F.col(vec_col)
    )
    return knn_bruteforce(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def embedding_near_duplicates(
    embeddings: DataFrame,
    *,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 256,
    bands: int = 4,
) -> DataFrame:
    """Cosine-near-dup pairs discovered within shared LSH buckets,
    OR-amplified across `bands` independent plane-sets.

    One plane-set misses a true pair whenever any plane splits it
    (miss probability grows with n_planes); running `bands` independent
    plane-sets and accepting a pair that collides in ANY of them drives
    recall to 1-(1-p^k)^b — the same AND/OR amplification the MinHash
    banding uses.  All bands are computed in ONE pandas_udf pass (one
    (batch×dim)·(dim×bands·planes) matmul, then per-band sign-packing)
    and candidates from all bands share one shuffle keyed (band,
    bucket).

    Candidate generation is the same no-self-join discipline as
    operators/dedup.py::_bucket_pairs: one groupBy collects each
    bucket's (id, vector) structs into a sorted, max_bucket-capped
    array, and pairs expand array-locally in two explode steps (anchor
    → tail, then tail element) so no single row ever holds O(n²)
    vectors.  The LSH bucketing subtree is computed exactly once — the
    old bucketed-self-join shape both recomputed the pandas_udf on each
    join side and blew up O(n²) on a degenerate bucket.

    max_bucket bounds the worst case (max_bucket²/2 comparisons per
    bucket); vectors past the cap in a degenerate bucket are dropped
    from candidacy — the recall/cost knob, identical contract to the
    MinHash/SimHash paths.  A pair colliding in several bands is
    deduplicated by the final distinct (cosine is deterministic, so
    duplicate rows are identical).
    """
    planes = _projection_matrix(dim, n_planes * bands, seed)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<long>")
    def band_buckets_of(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        signs = (mat @ planes) > 0  # (batch, bands·planes), one matmul
        per_band = signs.reshape(len(mat), bands, n_planes)
        return pd.Series(list(per_band @ weights))  # (batch, bands)

    bucketed = embeddings.select(
        id_col,
        vec_col,
        F.posexplode(band_buckets_of(F.col(vec_col))).alias("band", "bucket"),
    )
    buckets = (
        bucketed.groupBy("band", "bucket")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
                    )
                ),
                1,
                max_bucket,
            ).alias("items")
        )
        .where(F.size("items") > 1)
    )
    n = F.size("items")
    # step 1: one row per anchor, carrying only its tail slice (≤ n·dim
    # floats per row, never the full n² pair expansion in one row)
    anchored = buckets.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at(F.col("items"), i).alias("a"),
                    F.slice(F.col("items"), i + 1, n - i).alias("tail"),
                ),
            )
        ).alias("s")
    )
    # step 2: explode the tail; items were sorted by id → id_a < id_b
    return (
        anchored.select(
            F.col("s.a.id").alias("id_a"),
            F.col("s.a.v").alias("__va"),
            F.explode("s.tail").alias("t"),
        )
        .select(
            "id_a",
            F.col("t.id").alias("id_b"),
            F.round(cosine_expr(F.col("__va"), F.col("t.v")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        # a pair can collide in several bands; rows are identical
        # (deterministic cosine) so distinct dedups the survivors —
        # shuffling only (id, id, double), never vectors
        .distinct()
    )


def embedding_norms(
    embeddings: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """L2 norm per row — the sanity/oracle query for the vector fold."""
    return embeddings.select(
        F.col(id_col), F.round(norm_expr(F.col(vec_col)), 6).alias("l2_norm")
    )


def kcenter_select(
    df: DataFrame,
    k: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed_id: int = 0,
) -> DataFrame:
    """Greedy k-center (Gonzalez 1985 farthest-point traversal) — the
    coreset/diversity selection over an embedding column: start from
    `seed_id`, then k−1 times pick the point FARTHEST from the
    selected set (squared euclidean, min over centers), ties to the
    smallest id.  The classic 2-approximation to the k-center
    clustering objective, and the diversity counterpart of SemDeDup's
    redundancy removal.

    Returns (round, vec_id, radius): `radius` is the selected point's
    distance-to-set at selection time — the non-increasing coverage
    radius curve (round 1, the seed, has radius NULL).  If k exceeds
    the number of DISTINCT points the traversal stops early (the
    remaining max distance is 0 — re-selecting a chosen point would
    emit duplicate vec_ids with radius 0.0), so the result may have
    fewer than k rounds.

    Scale shape: each of the k−1 rounds is ONE map-only distance
    expression over broadcast center LITERALS (k×dim driver state —
    the ivf/semdedup bound) into a 1-row TakeOrderedAndProject; the
    relation is never self-joined.  Iteration count is k, fixed by the
    caller — no convergence loop.

    Cross-engine float recipe (the knn precedent): per-center squared
    distances are ROUNDED to 6 decimals before the min/argmax
    comparisons, so the oracle — which unrolls the same rounds as
    CTEs, re-deriving each center from the previous argmax — matches
    bit-for-bit; ulp-level fold-order drift is absorbed by the
    rounding, ties by the id total order.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    spark = df.sparkSession
    vec, ident = F.col(vec_col), F.col(id_col)

    seed_rows = df.where(ident == F.lit(seed_id)).select(vec_col).collect()
    if not seed_rows:
        raise ValueError(f"seed id {seed_id!r} not present in {id_col!r}")
    centers = [[float(x) for x in seed_rows[0][0]]]
    sel = [(1, seed_id, None)]

    def dist_to(center: list[float]) -> F.Column:
        from ..functions.arrays import lit_double_array

        c = lit_double_array(center)
        return F.round(
            F.aggregate(
                F.zip_with(
                    vec,
                    c,
                    lambda a, b: (a.cast("double") - b)
                    * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    for rnd in range(2, k + 1):
        d = F.least(*[dist_to(c) for c in centers]) if len(centers) > 1 else dist_to(centers[0])
        top = (
            df.select(ident.alias("__id"), d.alias("__d"), vec.alias("__v"))
            .orderBy(F.desc("__d"), F.asc("__id"))
            .limit(1)
            .collect()
        )
        row = top[0]
        if float(row["__d"]) <= 0.0:
            # universe exhausted (ADVICE r09): every remaining point
            # coincides with a selected center, so the argmax would
            # re-select an already-chosen point with radius 0.0 —
            # stop instead (greedy_coverage_select's early-stop rule);
            # the result simply has fewer than k rounds.
            break
        sel.append((rnd, row["__id"], float(row["__d"])))
        centers.append([float(x) for x in row["__v"]])
    return spark.createDataFrame(
        sel, "round INT, vec_id BIGINT, radius DOUBLE"
    )
