"""Product-quantization ANN (operators/pq.py): recall against the
exact ranking, self-retrieval, planted-twin recovery, determinism,
and the no-shuffle plan contract."""

from __future__ import annotations

import statistics

import pytest
from pyspark.sql import functions as F

from northwind_etl_spark.functions.vectors import cosine_expr
from northwind_etl_spark.operators import pq as P


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df.cache().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def books_enc(emb):
    books = P.train_pq_codebooks(emb, m=32, k=32)
    enc = P.encode_pq(emb, books)
    enc.cache().count()
    yield books, enc
    enc.unpersist()


def _exact_topk(emb, qvec, k=10):
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    return {
        r["vec_id"]
        for r in emb.select(
            "vec_id", cosine_expr(F.col("embedding"), qlit).alias("c")
        )
        .orderBy(F.desc("c"), F.asc("vec_id"))
        .limit(k)
        .collect()
    }


def test_pq_recall_and_self_hit(emb, books_enc):
    """Random gaussian vectors are PQ's worst case (no cluster
    structure, near-equidistant neighbors); m=32/k=32 measured 0.70
    mean recall@10 here — pin a margin below.  The query vector itself
    must always rank (its own reconstruction distance is minimal)."""
    books, enc = books_enc
    recalls = []
    for qid in range(0, 60, 6):
        qvec = [
            float(x)
            for x in emb.where(F.col("vec_id") == qid).first()["embedding"]
        ]
        approx = [r["vec_id"] for r in P.pq_topk(enc, books, qvec).collect()]
        assert qid in approx  # self-retrieval
        recalls.append(len(_exact_topk(emb, qvec) & set(approx)) / 10)
    assert statistics.mean(recalls) >= 0.55, recalls


def test_pq_planted_twin_recovered(spark, emb, books_enc):
    """A near-duplicate of a corpus vector (tiny perturbation) encodes
    to (nearly) the same codes, so querying with the twin must surface
    the original in the top-k."""
    books, enc = books_enc
    base = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    twin = [x * 1.001 + 1e-4 for x in base]
    got = [r["vec_id"] for r in P.pq_topk(enc, books, twin).collect()]
    assert 7 in got


def test_pq_deterministic_codes(emb):
    books1 = P.train_pq_codebooks(emb, m=16, k=16)
    books2 = P.train_pq_codebooks(emb, m=16, k=16)
    assert (books1 == books2).all()
    c1 = {r["vec_id"]: r["codes"] for r in P.encode_pq(emb, books1).collect()}
    c2 = {r["vec_id"]: r["codes"] for r in P.encode_pq(emb, books2).collect()}
    assert c1 == c2


def test_pq_topk_plan_has_no_shuffle(emb, books_enc):
    """ADC scoring must stay a scan + codegen fold + TakeOrdered: no
    Exchange, no join — the property that makes a 100 TB code table
    searchable in one pass."""
    books, enc = books_enc
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    plan = (
        P.pq_topk(enc, books, qvec)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_pq_rejects_indivisible_dim(emb):
    with pytest.raises(ValueError, match="not divisible"):
        P.train_pq_codebooks(emb, m=7, k=8)
