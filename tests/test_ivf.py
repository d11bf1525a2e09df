"""IVF ANN: index round-trip through partitioned storage + recall vs
brute force."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from northwind_etl_spark.operators import ivf
from northwind_etl_spark.operators.similarity import knn_bruteforce


def test_ivf_recall_and_partition_pruning(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]

    centroids = ivf.train_centroids(emb, k=8, iters=2)
    assert centroids.shape == (8, 64)

    path = tempfile.mkdtemp(prefix="ivf_") + "/index"
    ivf.write_ivf_index(emb, centroids, path)
    indexed = spark.read.parquet(path)

    approx = ivf.ivf_topk(indexed, centroids, qvec, k=10, nprobe=3)
    exact = {r.vec_id for r in knn_bruteforce(emb, qvec, k=10).collect()}
    got = {r.vec_id for r in approx.collect()}
    assert 0 in got  # the query vector itself
    recall = len(exact & got) / 10
    assert recall >= 0.5, f"IVF recall {recall}"

    # partition pruning: the probe filter must reach the scan as a
    # partition filter, not a post-scan predicate
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan


def test_assignments_cover_all_rows(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = ivf.train_centroids(emb, k=4, iters=1)
    assigned = ivf.assign_clusters(emb, centroids)
    assert assigned.where(F.col("cluster_id").isNull()).count() == 0
    assert assigned.count() == emb.count()
    n_clusters = assigned.select("cluster_id").distinct().count()
    assert 2 <= n_clusters <= 4
