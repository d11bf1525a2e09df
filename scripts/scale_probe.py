#!/usr/bin/env python
"""Scale probe: replicate the test tables N× in memory and time the
heavy operators — evidence for the PLANS.md sublinearity claims.

Usage: python scripts/scale_probe.py [factor]   (default 10)

Replication emulates a DIVERSE corpus at N× size, not N copies of the
same corpus: document replicas get every token suffixed with the
replica index (disjoint shingle spaces — otherwise each doc has N-1
planted near-dups and pair counts explode quadratically in N, which
measures the corpus, not the engine), and embedding replicas are
cyclic rotations of the source vector (cosine between rotations of
random vectors ≈ 0).  Ids shift per replica.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from northwind_etl_spark.operators import dedup as D  # noqa: E402
from northwind_etl_spark.operators import similarity as V  # noqa: E402
from northwind_etl_spark.session import get_spark  # noqa: E402


def replicate(df, times: int, id_col: str, shift: int, variant=None):
    parts = []
    for i in range(times):
        p = df.withColumn(id_col, F.col(id_col) + F.lit(i * shift))
        if variant is not None:
            p = variant(p, i)
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _doc_variant(df, i: int):
    # suffix every token with the replica index → disjoint shingles
    return df.withColumn(
        "text", F.regexp_replace(F.col("text"), r"(\S+)", rf"$1_{i}")
    )


def _vec_variant(df, i: int):
    if i == 0:
        return df
    dim = 64
    rotated = F.concat(
        F.slice(F.col("embedding"), i + 1, dim - i), F.slice(F.col("embedding"), 1, i)
    )
    return df.withColumn("embedding", rotated)


def timed(name: str, action) -> dict:
    only = os.environ.get("PROBE_ONLY")
    if only and not any(tok in name for tok in only.split(",")):
        return {"probe": name, "skipped": True}
    t0 = time.perf_counter()
    n = action()
    dt = round(time.perf_counter() - t0, 2)
    rec = {"probe": name, "sec": dt, "rows": n}
    print(json.dumps(rec))
    return rec



def _want(*names) -> bool:
    only = os.environ.get("PROBE_ONLY")
    if not only:
        return True
    toks = only.split(",")
    return any(tok in n for n in names for tok in toks)

def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    if _want("minhash", "simhash", "ngram_jaccard", "contamination"):
        _docs_section(spark, sf_dir, factor)
    if _want("embedding"):
        _emb_section(spark, sf_dir, factor)
    if _want("fuzzy"):
        _cust_section(spark, sf_dir, factor)
    if _want("asof", "overlap", "scd2"):
        _temporal_section(spark, sf_dir, factor)
    if _want("skew"):
        _skew_section(spark, sf_dir, factor)
    if _want("dedup_hot"):
        _dedup_hot_section(spark, sf_dir, factor)
    if _want("emb_hot"):
        _emb_hot_section(spark, sf_dir, factor)
    if _want("q1_shape"):
        _li_section(spark, sf_dir, factor)
    if _want("reconcile"):
        _reconcile_section(spark, sf_dir, factor)
    if _want("bloom"):
        _bloom_section(spark, sf_dir, factor)
    if _want("lines"):
        _lines_section(spark, sf_dir, factor)
    if _want("semdedup"):
        _semdedup_section(spark, sf_dir, factor)
    if _want("rank"):
        _rank_section(spark, sf_dir, factor)
    if _want("heavy_hitters"):
        _hh_section(spark, sf_dir, factor)
    if _want("pagerank", "triangles"):
        _graph_section(spark, sf_dir, factor)
    if _want("r08"):
        _r08_section(spark, sf_dir, factor)
    if _want("r09"):
        _r09_section(spark, sf_dir, factor)
    if _want("r10", "pmi"):
        _r10_section(spark, sf_dir, factor)
    if _want("r10b"):
        _r10b_section(spark, sf_dir, factor)
    if _want("r11"):
        _r11_section(spark, sf_dir, factor)
    if _want("r12"):
        _r12_section(spark, sf_dir, factor)
    spark.stop()


def _r08_section(spark, sf_dir, factor):
    """Round-8 operators: retrieval scan, weighted selection, skew
    profile, global line dedup, half-sample CI.  Replicas carry
    disjoint tokens (retrieval TFs scale with corpus size, df with N);
    orders/lineitem replicate with shifted keys."""
    from northwind_etl_spark.operators.lines import global_line_dedup
    from northwind_etl_spark.operators.resample import half_sample_ci
    from northwind_etl_spark.operators.retrieval import bm25_topk
    from northwind_etl_spark.operators.selection import weighted_kth_smallest
    from northwind_etl_spark.operators.skew import key_skew_profile
    from northwind_etl_spark.plans.queries import _line_seeded_docs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dbase, obase = docs.count(), orders.count()
    for times in (1, factor):
        # keep the query terms alive in every replica: suffixing makes
        # replica tokens disjoint, so probe on the UNsuffixed corpus
        # unioned times-fold with shifted ids (TF/df scale linearly)
        corp = replicate(docs, times, "doc_id", dbase * 10)
        timed(
            f"r08_bm25_topk x{times}",
            lambda c=corp: bm25_topk(c, ["merge", "vector", "dup"], k=20)
            .count(),
        )
        lw = replicate(li, times, "l_orderkey", 6_000_000)
        timed(
            f"r08_weighted_median x{times}",
            lambda l=lw: weighted_kth_smallest(
                l.select(
                    F.col("l_extendedprice").cast("double").alias("v"),
                    F.col("l_quantity").cast("long").alias("w"),
                ),
                "v",
                "w",
            )[0],
        )
        ow = replicate(orders, times, "o_orderkey", 6_000_000)
        timed(
            f"r08_skew_profile x{times}",
            lambda o=ow: key_skew_profile(o, "o_custkey").count(),
        )
        seeded = _line_seeded_docs(
            replicate(docs, times, "doc_id", dbase * 10, _doc_variant)
        )
        timed(
            f"r08_global_line_dedup x{times}",
            lambda sd=seeded: global_line_dedup(sd)
            .agg(F.sum("kept_lines"))
            .count(),
        )
        timed(
            f"r08_half_sample_ci x{times}",
            lambda o=ow: half_sample_ci(
                o, "o_totalprice", "o_orderkey", replicas=64
            ).count(),
        )


def _hh_section(spark, sf_dir, factor):
    """Heavy hitters: diverse corpus growth (vocab scales with size, so
    the candidate set per partition stays proportional) vs a hot-vocab
    adversary (every doc also carries one shared token ≈ 1% of all
    tokens — the candidate pass must stay tiny because ONE candidate
    is not a cost, and the recount semi-join only carries that term)."""
    from northwind_etl_spark.functions.texttools import tokens_expr
    from northwind_etl_spark.operators.heavyhitters import heavy_hitters
    from northwind_etl_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    shift = 10_000_000

    def toks_of(df):
        return df.select(F.explode(tokens_expr(F.col("text"))).alias("term"))

    for f in sorted({1, 2, factor}):
        corpus = replicate(docs, f, "doc_id", shift, _doc_variant)
        timed(
            f"heavy_hitters_x{f}",
            lambda c=corpus: heavy_hitters(
                toks_of(c), "term", denom=300
            ).count(),
        )
    hot = replicate(docs, factor, "doc_id", shift, _doc_variant).withColumn(
        "text", F.concat(F.col("text"), F.lit(" hotshared hotshared"))
    )
    timed(
        f"heavy_hitters_x{factor}_hotvocab",
        lambda: heavy_hitters(toks_of(hot), "term", denom=300).count(),
    )


def _graph_section(spark, sf_dir, factor):
    """Graph family: F disjoint namespaced copies of the trade graph
    (edge count scales F×; PageRank per-iteration join and the wedge
    pass must scale linearly — each copy's wedges never cross copies)."""
    from northwind_etl_spark.operators.graph import (
        pagerank_fixed_point,
        triangles_oriented,
    )
    from northwind_etl_spark.plans.queries import (
        _above_mean,
        _nation_trade_pairs,
    )

    pairs = _nation_trade_pairs(spark, sf_dir)
    dedges = _above_mean(pairs, "cnt").select("src", "dst").persist()
    upairs = (
        pairs.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "cnt",
        )
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("ucnt"))
    )
    uedges = _above_mean(upairs, "ucnt").select("a", "b").persist()

    def suffixed(df, times, cols):
        parts = []
        for i in range(times):
            p = df
            for c in cols:
                p = p.withColumn(c, F.concat(F.col(c), F.lit(f"_{i}")))
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    for f in sorted({1, 2, factor}):
        de = suffixed(dedges, f, ["src", "dst"])
        timed(
            f"pagerank8_x{f}",
            lambda e=de: pagerank_fixed_point(e, iterations=8).count(),
        )
        ue = suffixed(uedges, f, ["a", "b"])
        timed(
            f"triangles_x{f}",
            lambda e=ue: triangles_oriented(e).count(),
        )


def _rank_section(spark, sf_dir, factor):
    """Distributed global ranking vs the single-task global window, on
    a relation big enough for the difference to be structural (orders
    replicated with shifted keys — the order keys stay a total order)."""
    from pyspark.sql import Window

    from northwind_etl_spark.cache import release_stages
    from northwind_etl_spark.operators.ranking import global_row_number

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    base = orders.count()
    for times in (1, factor):
        corp = replicate(orders, times, "o_orderkey", base * 10)
        order = [F.desc("o_totalprice"), F.asc("o_orderkey")]
        timed(
            f"rank_two_phase x{times}",
            lambda c=corp, o=order: global_row_number(c, o, rank_col="rk")
            .write.format("noop")
            .mode("overwrite")
            .save()
            or c.sparkSession.sparkContext.defaultParallelism,
        )
        release_stages()
        timed(
            f"rank_single_window_trap x{times}",
            lambda c=corp, o=order: c.withColumn(
                "rk", F.row_number().over(Window.orderBy(*o))
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
            or 0,
        )


def _lines_section(spark, sf_dir, factor):
    """Boilerplate line removal: runtime vs corpus size, and vs the
    SIZE OF THE BOILERPLATE SET (the broadcast side).  Replicas carry
    disjoint tokens so natural body lines stay unique; the seeded
    HEADER/FOOTER/PROMO keep scaling their df with N (boilerplate by
    construction).  The wide variant plants 200 distinct boilerplate
    lines (each on 1/3 of docs) to grow the broadcast key set."""
    from northwind_etl_spark.operators.lines import remove_boilerplate_lines
    from northwind_etl_spark.plans.queries import _line_seeded_docs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.count()
    for times in (1, factor):
        corp = replicate(docs, times, "doc_id", base * 10, _doc_variant)
        seeded = _line_seeded_docs(corp)
        timed(
            f"boilerplate_lines x{times}",
            lambda s=seeded: remove_boilerplate_lines(s, min_df_frac=0.05)
            .where(F.col("n_dropped") > 0)
            .count(),
        )
        # wide boilerplate set: 200 distinct planted lines, each on
        # 1/200 of docs — above the min_df_frac=0.001 threshold, so
        # all 200 join the broadcast key set
        wide = seeded.withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.lit("\nBANNER variant "),
                (F.col("doc_id") % 200).cast("string"),
            ),
        )
        timed(
            f"boilerplate_lines_wideset x{times}",
            lambda w=wide: remove_boilerplate_lines(w, min_df_frac=0.001)
            .where(F.col("n_dropped") > 0)
            .count(),
        )


def _semdedup_section(spark, sf_dir, factor):
    """SemDeDup: runtime vs corpus size in the paper's regime (k grows
    with N so expected cluster size stays flat → per-task gram cost
    flat, parallelism carries the scale), plus the degenerate
    hot-cluster corpus (every vector identical direction) where the
    max_cluster cap must bound the gram cost."""
    from northwind_etl_spark.operators.semdedup import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.count()
    for times in (1, factor):
        corp = replicate(emb, times, "vec_id", base * 10, _vec_variant)
        k = 8 * times  # paper regime: cluster size ~ constant
        timed(
            f"semdedup x{times} k={k}",
            lambda c=corp, kk=k: semantic_dedup(
                c, k=kk, iters=2, threshold=0.99
            )
            .where(~F.col("keep"))
            .count(),
        )
    hot = emb.withColumn(
        "embedding",
        F.transform(F.col("embedding"), lambda x, i: F.lit(1.0) + 0.0001 * F.col("vec_id") * F.when(i == 0, 1.0).otherwise(0.0)),
    )
    hot_corp = replicate(hot, factor, "vec_id", base * 10)
    timed(
        f"semdedup_hotcluster x{factor} capped",
        lambda: semantic_dedup(
            hot_corp, k=4, iters=1, threshold=0.999999, max_cluster=512,
            on_overflow="keep",
        )
        .where(~F.col("keep"))
        .count(),
    )


def _reconcile_section(spark, sf_dir, factor):
    """snapshot_diff at factor× orders: sparse drift (0.1% of keys,
    bucket-confined) vs dense drift (~3% spread over every bucket) vs
    zero drift.  The claim under test: clean buckets never reach the
    row-level join, so sparse-drift cost ≈ fingerprint cost."""
    from northwind_etl_spark.operators.reconcile import snapshot_diff

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    big = replicate(o, factor, "o_orderkey", 10_000_000).persist()
    n = big.count()
    k = F.col("o_orderkey")

    def run(tag, new_df):
        timed(
            f"reconcile_{tag}_{factor}x_{n}rows",
            lambda: snapshot_diff(big, new_df, key="o_orderkey", buckets=256)
            .collect()[0]
            .n_unchanged,
        )

    run("zero_drift", big)
    # sparse: reprice keys ≡ 0 (mod 1024·256) — same residue mod 256,
    # so every mutation lands in ONE bucket of 256
    sparse = big.withColumn(
        "o_totalprice",
        F.when(k % (1024 * 256) == 0, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    )
    run("sparse_drift_1bucket", sparse)
    # dense: reprice ~3% spread across all buckets
    dense = big.withColumn(
        "o_totalprice",
        F.when(k % 31 == 0, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    )
    run("dense_drift_allbuckets", dense)
    big.unpersist()


def _bloom_section(spark, sf_dir, factor):
    """bloom_semi_join vs plain left-semi at factor× orders, varying
    build selectivity (1 segment ≈ 20% of customers vs a 0.4% name
    slice).  Local[32] has no network, so the bloom's shuffle saving
    can't show as wall-clock win here; the probe pins the pre-cut's
    bounded overhead and records the candidate-row reduction the
    shuffle WOULD see at cluster scale."""
    from northwind_etl_spark.operators.bloomjoin import (
        bloom_positions,
        bloom_prefilter,
        bloom_semi_join,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    big = replicate(o, factor, "o_orderkey", 10_000_000).persist()
    n = big.count()
    for tag, build in (
        ("seg20pct", c.where(F.col("c_mktsegment") == "BUILDING")),
        ("slice0.4pct", c.where(F.col("c_custkey") % 256 == 0)),
    ):
        timed(
            f"bloom_plain_semi_{tag}_{factor}x_{n}rows",
            lambda b=build: big.join(
                b, on=big.o_custkey == b.c_custkey, how="left_semi"
            ).count(),
        )
        timed(
            f"bloom_precut_semi_{tag}_{factor}x_{n}rows",
            lambda b=build: bloom_semi_join(
                big, b, probe_key="o_custkey", build_key="c_custkey", m=1 << 18, k=3
            ).count(),
        )
        pos = bloom_positions(
            build.select(F.col("c_custkey").alias("__k")), "__k", m=1 << 18, k=3
        )
        timed(
            f"bloom_candidates_{tag}_{factor}x_{n}rows",
            lambda p=pos: bloom_prefilter(big, "o_custkey", p, m=1 << 18, k=3).count(),
        )
    big.unpersist()


def _docs_section(spark, sf_dir, factor):
    docs = replicate(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text"),
        factor, "doc_id", 10_000_000, variant=_doc_variant,
    ).persist()
    n_docs = docs.count()  # materialize input so probes time the operator
    print(json.dumps({"probe": "corpus", "factor": factor, "docs": n_docs}))

    timed(
        "minhash_near_duplicates",
        lambda: D.minhash_near_duplicates(docs, "text", "doc_id", threshold=0.5).count(),
    )
    timed(
        "simhash_near_duplicates",
        lambda: D.simhash_near_duplicates(docs, "text", "doc_id", max_hamming=3).count(),
    )
    timed(
        "ngram_jaccard",
        lambda: D.ngram_jaccard(docs, "text", "doc_id", threshold=0.2).count(),
    )

    from northwind_etl_spark.operators.contamination import cross_corpus_overlap
    from northwind_etl_spark.operators.sampling import hash_split

    split = hash_split(docs, "doc_id")
    train = split.where("split = 'train'").select("doc_id", "text")
    ev = split.where("split = 'eval'").select("doc_id", "text")
    timed(
        "contamination_check",
        lambda: cross_corpus_overlap(train, ev, "text", "doc_id", min_shared=2).count(),
    )


_BOILER = " ".join(f"corp legal header clause b{i} standard notice" for i in range(10))
_TWIN_OFF = 700_000_000


def _dedup_hot_section(spark, sf_dir, factor):
    """Hot-bucket probe for the near-dup family: a boilerplate-heavy
    corpus (30% of docs share one 60-token prefix) drives many docs
    into the SAME MinHash/SimHash band buckets — the degenerate-bucket
    pathology max_bucket exists for.  Records runtime, emitted pairs,
    and planted-twin recall per (variant, cap) so the cap's cost/recall
    trade-off is measured, not assumed.

    Planted twins: every 89th doc gets a copy (id + 7e8) with its last
    token dropped — near-identical under shingling.  Twins are planted
    AFTER the boilerplate prefix, so in the boiler variant ~30% of
    planted pairs also sit inside the hot buckets where capping can
    cost recall.
    """
    base = replicate(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text"),
        factor, "doc_id", 10_000_000, variant=_doc_variant,
    )
    for variant in ("clean", "boiler"):
        docs = base
        if variant == "boiler":
            docs = docs.withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 10 < 3,
                    F.concat(F.lit(_BOILER + " "), F.col("text")),
                ).otherwise(F.col("text")),
            )
        seeds = docs.where(F.col("doc_id") % 89 == 0)
        twins = seeds.select(
            (F.col("doc_id") + _TWIN_OFF).alias("doc_id"),
            F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
        )
        corpus = docs.unionByName(twins).persist()
        n = corpus.count()
        expected = seeds.select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + _TWIN_OFF).alias("id_b"),
        ).persist()
        n_planted = expected.count()
        print(json.dumps({
            "probe": f"dedup_hot_corpus_{variant}", "factor": factor,
            "docs": n, "planted": n_planted,
        }))

        caps = (64, 256, 1024) if variant == "boiler" else (256,)
        for cap in caps:
            pairs = D.minhash_near_duplicates(
                corpus, "text", "doc_id", threshold=0.5, max_bucket=cap
            ).persist()
            rec = timed(f"dedup_hot_minhash_{variant}_cap{cap}", pairs.count)
            if not rec.get("skipped"):
                found = pairs.join(expected, ["id_a", "id_b"]).count()
                print(json.dumps({
                    "probe": f"dedup_hot_minhash_{variant}_cap{cap}_recall",
                    "recall": round(found / max(n_planted, 1), 4),
                }))
            pairs.unpersist()

        pairs = D.simhash_near_duplicates(
            corpus, "text", "doc_id", max_hamming=3
        ).persist()
        rec = timed(f"dedup_hot_simhash_{variant}", pairs.count)
        if not rec.get("skipped"):
            found = pairs.join(expected, ["id_a", "id_b"]).count()
            print(json.dumps({
                "probe": f"dedup_hot_simhash_{variant}_recall",
                "recall": round(found / max(n_planted, 1), 4),
            }))
        pairs.unpersist()
        corpus.unpersist()
        expected.unpersist()


def _emb_hot_section(spark, sf_dir, factor):
    """Embedding near-dup under a degenerate LSH bucket: 10% of vectors
    replaced by ONE constant vector, so every band funnels them into a
    single bucket.  The cap turns an O((0.1 n)²) pair explosion into
    O(max_bucket²) per bucket; planted identical twins measure what
    recall the cap costs among the NON-degenerate vectors."""
    import math

    const_vec = F.array(*[F.lit(math.sin(i + 1)) for i in range(64)])
    base = replicate(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding"),
        factor, "vec_id", 10_000_000, variant=_vec_variant,
    )
    for variant in ("clean", "hot"):
        emb = base
        if variant == "hot":
            emb = emb.withColumn(
                "embedding",
                F.when(F.col("vec_id") % 10 == 0, const_vec).otherwise(
                    F.col("embedding")
                ),
            )
        seeds = emb.where((F.col("vec_id") % 89 == 0) & (F.col("vec_id") % 10 != 0))
        twins = seeds.select(
            (F.col("vec_id") + _TWIN_OFF).alias("vec_id"), "embedding"
        )
        corpus = emb.unionByName(twins).persist()
        n = corpus.count()
        expected = seeds.select(
            F.col("vec_id").alias("id_a"),
            (F.col("vec_id") + _TWIN_OFF).alias("id_b"),
        ).persist()
        n_planted = expected.count()
        print(json.dumps({
            "probe": f"emb_hot_corpus_{variant}", "factor": factor,
            "vecs": n, "planted": n_planted,
        }))
        default_caps = "256,1024" if variant == "hot" else "256"
        caps = [
            int(c) for c in os.environ.get("PROBE_EMB_CAPS", default_caps).split(",")
        ]
        for cap in caps:
            pairs = V.embedding_near_duplicates(
                corpus, dim=64, threshold=0.95, max_bucket=cap
            ).persist()
            rec = timed(f"emb_hot_neardup_{variant}_cap{cap}", pairs.count)
            if not rec.get("skipped"):
                found = pairs.select("id_a", "id_b").join(
                    expected, ["id_a", "id_b"]
                ).count()
                print(json.dumps({
                    "probe": f"emb_hot_neardup_{variant}_cap{cap}_recall",
                    "recall": round(found / max(n_planted, 1), 4),
                }))
            pairs.unpersist()
        corpus.unpersist()
        expected.unpersist()


def _emb_section(spark, sf_dir, factor):
    emb = replicate(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding"),
        factor, "vec_id", 10_000_000, variant=_vec_variant,
    ).persist()
    n_vecs = emb.count()
    print(json.dumps({"probe": "embeddings", "factor": factor, "vecs": n_vecs}))
    timed(
        "embedding_near_duplicates",
        lambda: V.embedding_near_duplicates(emb, dim=64, threshold=0.95).count(),
    )


def _cust_section(spark, sf_dir, factor):
    from northwind_etl_spark.operators.fuzzy import fuzzy_match_pairs

    # replica tag is 3 copies of one distinct letter → cross-replica
    # edit distance >= 3 > max_distance, so true-pair volume scales
    # linearly in factor (N diverse corpora, not N^2 planted matches);
    # max_df scales with factor to hold the relative df-cutoff fixed.
    cust = replicate(
        spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_name"),
        factor, "c_custkey", 10_000_000,
        variant=lambda df, i: df.withColumn(
            "c_name", F.concat(F.lit(chr(ord("a") + i % 26) * 3), F.col("c_name"))
        ),
    ).persist()
    n_cust = cust.count()
    print(json.dumps({"probe": "customers", "factor": factor, "rows": n_cust}))
    timed(
        "fuzzy_match_pairs",
        lambda: fuzzy_match_pairs(
            cust, "c_name", "c_custkey", max_distance=1, max_df=100 * factor
        ).count(),
    )


def _temporal_section(spark, sf_dir, factor):
    # temporal family: replicate events with disjoint user spaces →
    # linear growth in sessions/pairs; each op is one keyed window or
    # one binned shuffle, so the probe checks they track input size.
    from northwind_etl_spark.operators.asof import asof_join
    from northwind_etl_spark.operators.ranges import interval_overlap_pairs
    from northwind_etl_spark.operators.scd2 import scd2_history
    from northwind_etl_spark.operators.sessionize import sessionize
    from northwind_etl_spark.sources.parquet import read_table

    # time-shift each replica past the 30-day source window: otherwise
    # every replica's sessions overlap every other's in the same hour
    # buckets and the overlap ANSWER (cross-user concurrency) grows
    # quadratically — measuring the corpus, not the engine.
    ev = replicate(
        read_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type"),
        factor, "user_id", 10_000_000,
        variant=lambda df, i: df.withColumn(
            "event_id", F.col("event_id") + F.lit(i * 100_000_000)
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {40 * i} DAY")),
    ).persist()
    n_ev = ev.count()
    print(json.dumps({"probe": "events", "factor": factor, "rows": n_ev}))
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    touches = (
        ev.where(F.col("event_type") != "purchase")
        .select("user_id", F.col("ts").alias("touch_ts"), "event_id")
        .groupBy("user_id", "touch_ts")
        .agg(F.max("event_id").alias("touch_event_id"))
    )
    timed(
        "asof_join",
        lambda: asof_join(
            purchases, touches, on=["user_id"], left_time="ts",
            right_time="touch_ts", right_cols=["touch_event_id"],
        ).count(),
    )
    sess = sessionize(ev.withColumn("value", F.lit(1.0)), gap_minutes=30).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    timed(
        "interval_overlap_pairs",
        lambda: interval_overlap_pairs(
            sess, id_cols=["user_id", "session_id"],
            start_ts="session_start", end_ts="session_end", bucket="hour",
        ).count(),
    )
    timed(
        "scd2_history",
        lambda: scd2_history(
            ev.groupBy("user_id", "ts").agg(F.max("event_type").alias("event_type")),
            key_cols=["user_id"], ts_col="ts", attr_cols=["event_type"],
            collapse_unchanged=True,
        ).count(),
    )


def _skew_section(spark, sf_dir, factor):
    """Hot-key probe for the temporal family: the same replicated event
    stream, once with disjoint per-replica user spaces (uniform) and
    once with ~10% of ALL events remapped onto ONE user_id (hot).

    The keyed-window operators (sessionize, scd2) put every row of a
    key into one task by construction — AQE's skew handling splits
    JOIN partitions, not window partitions — so the hot variant's
    ceiling is the straggler task holding 10% of the input.  The probe
    records that penalty (hot/uniform ratio at each factor) so the
    claim in PLANS.md is measured, not assumed.  interval_overlap_pairs
    buckets by TIME, not user, so its hot penalty instead tracks the
    merged hot user's sessions joining every hour bucket.
    """
    from northwind_etl_spark.operators.ranges import interval_overlap_pairs
    from northwind_etl_spark.operators.scd2 import scd2_history
    from northwind_etl_spark.operators.sessionize import sessionize
    from northwind_etl_spark.sources.parquet import read_table

    base = replicate(
        read_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type"),
        factor, "user_id", 10_000_000,
        variant=lambda df, i: df.withColumn(
            "event_id", F.col("event_id") + F.lit(i * 100_000_000)
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {40 * i} DAY")),
    )
    for variant in ("uniform", "hot"):
        ev = base
        if variant == "hot":
            ev = ev.withColumn(
                "user_id",
                F.when(F.col("event_id") % 10 == 0, F.lit(77)).otherwise(F.col("user_id")),
            )
        ev = ev.persist()
        n = ev.count()
        print(json.dumps({"probe": f"skew_{variant}_events", "factor": factor, "rows": n}))
        sess = sessionize(ev.withColumn("value", F.lit(1.0)), gap_minutes=30).select(
            "user_id", "session_id", "session_start", "session_end"
        )

        def overlap(s=sess):
            return interval_overlap_pairs(
                s, id_cols=["user_id", "session_id"],
                start_ts="session_start", end_ts="session_end", bucket="hour",
                # the hot user's sessions sit in every bucket; answer-size
                # growth is the point here, not a correctness run — cap
                # explicitly rather than fail on the planted pathology
                max_bucket=100_000, on_overflow="truncate",
            ).count()

        def scd2(e=ev):
            return scd2_history(
                e.groupBy("user_id", "ts").agg(F.max("event_type").alias("event_type")),
                key_cols=["user_id"], ts_col="ts", attr_cols=["event_type"],
                collapse_unchanged=True,
            ).count()

        def scd2_bucketed(e=ev):
            return scd2_history(
                e.groupBy("user_id", "ts").agg(F.max("event_type").alias("event_type")),
                key_cols=["user_id"], ts_col="ts", attr_cols=["event_type"],
                collapse_unchanged=True, collapse_bucket="1 day",
            ).count()

        # snapshot-style attribute (changes ~weekly): the regime
        # collapse_unchanged exists for — here the bucket pre-collapse
        # can actually shrink the hot key's window input (event_type
        # changes nearly every row, so the probes above measure the
        # irreducible every-row-is-a-version regime instead)
        snap = ev.groupBy("user_id", "ts").agg(
            F.date_trunc("week", F.max("ts")).cast("string").alias("state")
        )

        def scd2_snap_direct(s=snap):
            return scd2_history(
                s, key_cols=["user_id"], ts_col="ts", attr_cols=["state"],
                collapse_unchanged=True,
            ).count()

        def scd2_snap_bucketed(s=snap):
            return scd2_history(
                s, key_cols=["user_id"], ts_col="ts", attr_cols=["state"],
                collapse_unchanged=True, collapse_bucket="1 day",
            ).count()

        # the r06 mitigation pair: the same sessionization with the
        # keyed window fed raw events (direct) vs gap-width bucket
        # summaries (preagg) — the hot/uniform ratio of each path at
        # growing factors is the straggler evidence in PLANS.md
        def sess_direct(e=ev):
            return sessionize(
                e.withColumn("value", F.lit(1.0)), gap_minutes=30,
                pre_aggregate=False,
            ).count()

        def sess_preagg(e=ev):
            return sessionize(
                e.withColumn("value", F.lit(1.0)), gap_minutes=30,
                pre_aggregate=True,
            ).count()

        # warmup before timing: the uniform variant runs first in a cold
        # JVM and would otherwise absorb all codegen/broadcast setup,
        # flattering the hot variant's ratio
        overlap(), scd2(), scd2_bucketed(), sess_direct(), sess_preagg()
        scd2_snap_direct(), scd2_snap_bucketed()
        timed(f"skew_{variant}_session_overlap", overlap)
        timed(f"skew_{variant}_scd2", scd2)
        timed(f"skew_{variant}_scd2_bucketed", scd2_bucketed)
        timed(f"skew_{variant}_scd2_snap_direct", scd2_snap_direct)
        timed(f"skew_{variant}_scd2_snap_bucketed", scd2_snap_bucketed)
        timed(f"skew_{variant}_sessionize_direct", sess_direct)
        timed(f"skew_{variant}_sessionize_preagg", sess_preagg)
        ev.unpersist()


def _li_section(spark, sf_dir, factor):
    li = replicate(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"), factor, "l_orderkey", 100_000_000
    ).persist()
    n_li = li.count()
    print(json.dumps({"probe": "lineitem", "factor": factor, "rows": n_li}))
    timed(
        "q1_shape_agg",
        lambda: li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("s"))
        .count(),
    )

    # TPC-H subquery shapes at scale: q18 (fact agg HAVING → leftsemi
    # join-back) and q21 (per-order distinct/late-supplier aggregate
    # joined back to late rows).  Orders replicate with the same
    # orderkey shift so the fact⋈fact keys stay consistent.
    o = replicate(
        spark.read.parquet(f"{sf_dir}/orders.parquet"), factor, "o_orderkey", 100_000_000
    ).persist()
    o.count()

    def q18_shape():
        big = (
            li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("qty"))
            .where(F.col("qty") > 250)
            .select("l_orderkey")
        )
        sel = o.join(big, o.o_orderkey == big.l_orderkey, "leftsemi")
        return (
            sel.join(li, sel.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey", "o_totalprice")
            .agg(F.sum("l_quantity").alias("sum_qty"))
            .count()
        )

    timed("q18_shape_having_semi", q18_shape)

    def q21_shape():
        of = o.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
        lio = li.select("l_orderkey", "l_suppkey", "l_shipdate").join(
            of, F.col("l_orderkey") == of.o_orderkey
        ).withColumn("is_late", F.expr("l_shipdate > o_orderdate + INTERVAL 60 DAY"))
        per_order = lio.groupBy("l_orderkey").agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
                "n_late_supp"
            ),
        )
        return (
            lio.where(F.col("is_late"))
            .join(
                per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
                "l_orderkey",
            )
            .groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .count()
        )

    timed("q21_shape_exists_collapse", q21_shape)


def _r10_section(spark, sf_dir, factor):
    """Round-10 operators: PMI collocations (the one r09 entry without
    probe evidence — its doc-keyed pair join is bounded by <=100 vocab
    terms per doc, so it must scale with corpus size, not pairs²),
    the KLL sketch (windows over geometrically shrinking survivors),
    deletion-vector MOR (broadcast anti probe), snapshot expiration /
    changelog (keyed windows / state-sized joins), the inventory
    planners (single-scan aggregations), and the export manifest
    (per-shard running sums).  Docs replicate with SHARED vocabulary
    for PMI (the vocabulary cut is corpus-level) and for the manifest
    (shards grow with docs)."""
    from northwind_etl_spark.operators.kll import (
        kll_sketch,
        sketch_quantiles,
    )
    from northwind_etl_spark.operators.lakehouse import (
        apply_deletion_vector,
        snapshot_changelog,
        snapshot_expiration,
        snapshot_state,
    )
    from northwind_etl_spark.operators.packing import shard_manifest
    from northwind_etl_spark.operators.selection import group_kth_smallest
    from northwind_etl_spark.sources.inventory import bloom_file_skipping
    from northwind_etl_spark.plans.queries import pmi_collocations
    from northwind_etl_spark.sources.inventory import (
        compaction_plan,
        model_inventory,
        zonemap_skip_report,
    )
    from northwind_etl_spark.sources.parquet import read_events

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    events = read_events(spark, sf_dir)
    dbase = docs.count()
    for times in (1, factor):
        corp = replicate(docs, times, "doc_id", dbase * 10)
        timed(
            f"r10_pmi x{times}",
            lambda c=corp: pmi_collocations(c).count(),
        )
        timed(
            f"r10_manifest x{times}",
            lambda c=corp: shard_manifest(
                c.withColumn("n_tokens", F.length("text").cast("long")),
                "doc_id",
                "n_tokens",
                "source",
                n_shards=8,
                part_budget=65536,
            ).count(),
        )
        ow = replicate(orders, times, "o_orderkey", 60_000_000)
        timed(
            f"r10_kll x{times}",
            lambda o=ow: sketch_quantiles(
                kll_sketch(
                    o, "o_orderpriority", "o_totalprice", "o_orderkey",
                    capacity=256, n_levels=6,
                ),
                [50, 90, 99],
            ).count(),
        )
        lw = replicate(li, times, "l_orderkey", 60_000_000).withColumn(
            "pos",
            (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("long"),
        )
        timed(
            f"r10_deletion_vector x{times}",
            lambda l=lw: apply_deletion_vector(
                l,
                l.select("pos").where(
                    F.conv(
                        F.substring(F.md5(F.col("pos").cast("string")), 1, 8),
                        16,
                        10,
                    ).cast("long")
                    % 20
                    == 0
                ),
                "pos",
            ).count(),
        )
        evw = replicate(events, times, "event_id", 50_000_000)
        log = evw.select(
            "user_id", "event_id", "event_type", "value",
            F.when(
                F.col("event_id") % 7 == 0,
                F.col("ts") + F.expr("INTERVAL 4 HOURS"),
            ).otherwise(F.col("ts")).alias("txn_ts"),
        )
        cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
        timed(
            f"r10_snapshot_expiration x{times}",
            lambda g=log, c=cutoff: snapshot_expiration(
                g, "user_id", "txn_ts", c, tiebreak_col="event_id"
            )
            .groupBy("version_status")
            .count()
            .count(),
        )
        timed(
            f"r10_snapshot_changelog x{times}",
            lambda g=log: snapshot_changelog(
                snapshot_state(
                    g, "user_id", "txn_ts",
                    F.lit("2024-01-10 00:00:00").cast("timestamp"),
                    value_col="value", tiebreak_col="event_id",
                    tombstone=F.col("event_type") == "error",
                ),
                snapshot_state(
                    g, "user_id", "txn_ts",
                    F.lit("2024-01-20 00:00:00").cast("timestamp"),
                    value_col="value", tiebreak_col="event_id",
                    tombstone=F.col("event_type") == "error",
                ),
                "user_id",
            ).count(),
        )
        timed(
            f"r10_compaction_plan x{times}",
            lambda o=ow: compaction_plan(
                model_inventory(
                    o,
                    F.date_trunc("month", F.col("o_orderdate")),
                    bytes_expr=(
                        F.lit(40)
                        + F.length("o_orderstatus")
                        + F.length("o_orderpriority")
                        + F.col("o_custkey") % 32
                    ).cast("long"),
                ),
                65536,
            ).count(),
        )
        timed(
            f"r10_bloom_build x{times}",
            lambda o=ow: bloom_file_skipping(
                o,
                F.date_trunc("month", F.col("o_orderdate")),
                "o_custkey",
                [1, 2, 3, 5, 8, 13, 21, 34],
            ).count(),
        )
        timed(
            f"r10_lag_quantiles x{times}",
            lambda e=evw: len(
                group_kth_smallest(
                    e.select(
                        "event_type",
                        (
                            (F.col("event_id") % 600) * 1_000_000
                            + F.when(
                                F.col("event_id") % 7 == 0, 14_400_000_000
                            ).otherwise(0)
                        ).cast("long").alias("lag_us"),
                    ),
                    "lag_us",
                    "event_type",
                    q=0.95,
                )
            ),
        )
        timed(
            f"r10_sketch_rollup x{times}",
            lambda o=ow: sketch_quantiles(
                kll_sketch(
                    o.withColumn(
                        "pw",
                        F.concat(
                            F.col("o_orderpriority"),
                            F.lit("|"),
                            F.date_trunc("week", F.col("o_orderdate"))
                            .cast("string"),
                        ),
                    ),
                    "pw", "o_totalprice", "o_orderkey",
                    capacity=64, n_levels=6,
                ).withColumn(
                    "group", F.substring_index(F.col("group"), "|", 1)
                ),
                [50, 90],
            ).count(),
        )
        timed(
            f"r10_zonemap x{times}",
            lambda l=lw: zonemap_skip_report(
                model_inventory(
                    l,
                    F.date_trunc("week", F.col("l_shipdate")),
                    stat_col="l_shipdate",
                ),
                "w",
                F.lit("1998-01-01 00:00:00").cast("timestamp"),
                F.lit("1998-03-31 23:59:59").cast("timestamp"),
            ).count(),
        )


def _r09_section(spark, sf_dir, factor):
    """Round-9 operators: DSIR weighting, greedy coverage, k-center,
    signed bidelta IVM, attribution, CUSUM.  Docs replicate with
    DIVERSE tokens for coverage (vocab scales with corpus — the greedy
    frontier stays proportional) and with SHARED tokens for DSIR (the
    bucket models are corpus-level; both regimes are linear);
    embeddings replicate as rotations; events replicate with shifted
    ids (CUSUM's series length is time-bounded, so it must be FLAT in
    event volume)."""
    from northwind_etl_spark.operators.curation import (
        dsir_importance_weights,
        greedy_coverage_select,
    )
    from northwind_etl_spark.operators.incremental import join_view_bidelta
    from northwind_etl_spark.operators.similarity import kcenter_select
    from northwind_etl_spark.operators.timeseries import cusum_alarms_by_key
    from northwind_etl_spark.plans.queries import attribution_credit_by_type
    from northwind_etl_spark.sources.parquet import read_events

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    events = read_events(spark, sf_dir)
    dbase, ebase = docs.count(), emb.count()
    for times in (1, factor):
        corp = replicate(docs, times, "doc_id", dbase * 10)
        timed(
            f"r09_dsir x{times}",
            lambda c=corp: dsir_importance_weights(
                c, c.where(F.col("lang") == "en")
            ).count(),
        )
        dcorp = replicate(docs, times, "doc_id", dbase * 10, _doc_variant)
        timed(
            f"r09_greedy_coverage x{times}",
            lambda c=dcorp: greedy_coverage_select(c, 5).count(),
        )
        ew = replicate(emb, times, "vec_id", ebase * 10, _vec_variant)
        timed(
            f"r09_kcenter x{times}",
            lambda e=ew: kcenter_select(e, 6).count(),
        )
        evw = replicate(events, times, "event_id", 50_000_000)
        timed(
            f"r09_cusum x{times}",
            lambda e=evw: cusum_alarms_by_key(
                e, "event_type", "ts", "value", threshold="1000"
            ).count(),
        )
        timed(
            f"r09_attribution x{times}",
            lambda e=evw: e.sparkSession.createDataFrame(
                [], "x int"
            ).count()
            if False
            else __r09_attr(e),
        )
        ow = replicate(orders, times, "o_orderkey", 6_000_000)
        cw = replicate(cust, times, "c_custkey", 6_000_000).withColumnRenamed(
            "c_custkey", "o_custkey"
        )
        o_ins = F.col("o_orderkey") % 101 == 0
        c_ins = F.col("o_custkey") % 97 == 0
        timed(
            f"r09_bidelta_ivm x{times}",
            lambda o=ow, c=cw: join_view_bidelta(
                o.where(~o_ins),
                o.where(o_ins),
                o.where((~o_ins) & (F.col("o_orderkey") % 89 == 0)),
                c.where(~c_ins),
                c.where(c_ins),
                c.where((~c_ins) & (F.col("o_custkey") % 83 == 0)),
                on="o_custkey",
                b_pk=["o_custkey"],
            ).count(),
        )


def __r09_attr(e):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    wo = w.orderBy("ts", "event_id")
    n, rn = F.count(F.lit(1)).over(w), F.row_number().over(wo)
    credit = (
        F.when(n == 1, F.lit(1.0))
        .when((rn == 1) | (rn == n), F.when(n == 2, 0.5).otherwise(0.4))
        .otherwise(F.lit(0.2) / (n - F.lit(2)).cast("double"))
    )
    return (
        e.select("event_type", credit.cast("decimal(18,12)").alias("c"))
        .groupBy("event_type")
        .agg(F.sum("c"))
        .count()
    )



def _r10b_section(spark, sf_dir, factor):
    """Round-10 batches 3-4: robust trend (days²-bounded pairs per
    type — flat past the scan), KM survival (subjects grow, distinct
    event times stay horizon-bounded), canonical-URL dedup (map-only
    + one groupBy), source-pair JSD (one (source,term) agg; the pair
    frame is vocab × source² bounded), exact AUC (margin-level prefix
    sum — distinct margins grow with docs), and decile gains (one
    distributed ranking).  Docs replicate with SHARED sources so the
    JSD pair count stays fixed while counts grow; events replicate
    with shifted event ids (same users — per-user histories deepen,
    the adversarial direction for KM's per-user min aggregations)."""
    from northwind_etl_spark.operators.mleval import (
        auc_exact,
        cumulative_gains,
    )
    from northwind_etl_spark.operators.text import (
        gopher_quality_filter,
    )
    from northwind_etl_spark.operators.timeseries import (
        theil_sen_mann_kendall,
    )
    from northwind_etl_spark.operators.survival import km_log_survival
    from northwind_etl_spark.operators.web import canonical_url
    from northwind_etl_spark.plans.queries import source_term_jsd_pairs
    from northwind_etl_spark.sources.parquet import read_events

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = read_events(spark, sf_dir)
    dbase = docs.count()
    for times in (1, factor):
        evw = replicate(events, times, "event_id", 50_000_000)
        timed(
            f"r10b_theil_sen x{times}",
            lambda e=evw: theil_sen_mann_kendall(
                e, "event_type", "ts", "value"
            ).count(),
        )

        def _km(e):
            s = (
                e.where(F.col("event_type") == "signup")
                .groupBy("user_id")
                .agg(F.min("ts").alias("st"))
            )
            p = (
                e.where(F.col("event_type") == "purchase")
                .groupBy("user_id")
                .agg(F.min("ts").alias("pt"))
            )
            subj = s.join(p, "user_id", "left").select(
                F.when(
                    F.col("pt") > F.col("st"),
                    F.expr(
                        "timestampdiff(MICROSECOND, st, pt)"
                        " DIV 3600000000"
                    ),
                )
                .otherwise(F.lit(720))
                .alias("duration"),
                F.when(F.col("pt") > F.col("st"), F.lit(1))
                .otherwise(F.lit(0))
                .alias("observed"),
            )
            return km_log_survival(
                subj, "duration", "observed", horizon=72
            ).count()

        timed(f"r10b_km_survival x{times}", lambda e=evw: _km(e))

        corp = replicate(docs, times, "doc_id", dbase * 10)
        timed(
            f"r10b_canonical_url x{times}",
            lambda c=corp: c.select(
                canonical_url(
                    F.concat(
                        F.lit("https://WWW.Host.example.com:443/p/"),
                        F.expr("doc_id DIV 4").cast("string"),
                        F.lit("/?b=2&a=1&utm_source=s"),
                        (F.col("doc_id") % 3).cast("string"),
                    )
                ).alias("u")
            )
            .groupBy("u")
            .count()
            .count(),
        )
        # shared sources: the source dimension (and so the pair frame)
        # stays fixed while per-source counts grow
        import tempfile

        tmp = tempfile.mkdtemp(prefix="jsdprobe-")
        corp.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        timed(
            f"r10b_jsd x{times}",
            lambda t=tmp: source_term_jsd_pairs(spark, t).count(),
        )

        def _scored(c):
            from northwind_etl_spark.plans.queries import quality_margins

            labels = gopher_quality_filter(c).select(
                "doc_id", F.col("passes").cast("int").alias("pos")
            )
            return quality_margins(c).join(labels, "doc_id")

        timed(
            f"r10b_auc x{times}",
            lambda c=corp: auc_exact(_scored(c), "margin", "pos").count(),
        )
        timed(
            f"r10b_gains x{times}",
            lambda c=corp: cumulative_gains(
                _scored(c), "margin", "doc_id", "pos"
            ).count(),
        )




def _r11_section(spark, sf_dir, factor):
    """Round-11 operators.  Mergeable MG top-k: the (shard, value)
    agg is map-side combined and the per-shard compress window sorts
    only DISTINCT values per shard (users fixed under replication —
    counts deepen, distinct stays flat → flat probe).  Incremental
    MinHash: replicas get disjoint shingle spaces, so the delta probe
    measures signature+banding cost (linear in corpus) with the
    candidate count held structural — the delta side stays a fixed
    20% fraction.  int8 recall: the query panel is pinned to the
    base corpus's ids (a production recall eval samples a FIXED
    panel), so cost is queries × corpus = linear in corpus.  Robots
    LPM + license rollup: map-only broadcast joins + one bounded
    agg — linear scans."""
    from northwind_etl_spark.operators import dedup as D11
    from northwind_etl_spark.operators.heavyhitters import (
        mergeable_topk_sketch,
    )
    from northwind_etl_spark.functions.vectors import (
        int8_codes_expr,
        int8_cosine_expr,
    )
    from northwind_etl_spark.functions.vectors import cosine_expr as _cos
    from northwind_etl_spark.operators.web import (
        license_rollup,
        longest_prefix_match,
    )
    from northwind_etl_spark.sources.parquet import read_events
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = read_events(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ebase = emb.count()
    for times in (1, factor):
        evw = replicate(events, times, "event_id", 50_000_000)
        timed(
            f"r11_mergeable_topk x{times}",
            lambda e=evw: mergeable_topk_sketch(
                e, "user_id", k=20, shards=8, shard_key="event_id"
            ).count(),
        )
        dw = replicate(docs, times, "doc_id", 10_000_000, _doc_variant)
        def _delta(d):
            sigs = D11.minhash_signatures_md5(
                d, "text", "doc_id", num_hashes=12, shingle_n=3
            )
            banded = D11.band_keys_md5(
                sigs, "doc_id", bands=4, num_hashes=12
            )
            delta = banded.where(F.col("doc_id") % 10 >= 8)
            return D11.delta_candidate_pairs(
                banded, delta, "doc_id"
            ).count()
        timed(f"r11_minhash_delta x{times}", lambda d=dw: _delta(d))
        ew = replicate(emb, times, "vec_id", ebase, _vec_variant)
        def _recall(e):
            coded = e.select(
                "vec_id",
                "embedding",
                int8_codes_expr("embedding").alias("codes"),
            )
            q = coded.where(
                (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < ebase)
            ).select(
                F.col("vec_id").alias("qid"),
                F.col("embedding").alias("qv"),
                F.col("codes").alias("qc"),
            )
            scored = coded.join(F.broadcast(q)).select(
                "qid",
                "vec_id",
                _cos("embedding", "qv").alias("cf"),
                int8_cosine_expr("codes", "qc").alias("cq"),
            )
            wf = Window.partitionBy("qid").orderBy(
                F.desc("cf"), F.asc("vec_id")
            )
            wq = Window.partitionBy("qid").orderBy(
                F.desc("cq"), F.asc("vec_id")
            )
            r = scored.select(
                "qid",
                F.row_number().over(wf).alias("rf"),
                F.row_number().over(wq).alias("rq"),
            )
            return (
                r.where((F.col("rf") <= 10) & (F.col("rq") <= 10))
                .groupBy("qid")
                .count()
                .count()
            )
        timed(f"r11_int8_recall x{times}", lambda e=ew: _recall(e))
        def _lpm(d):
            rules = spark.createDataFrame(
                [
                    ("/", "allow"),
                    ("/admin", "deny"),
                    ("/static", "deny"),
                    ("/static/css", "allow"),
                    ("/p", "allow"),
                    ("/p/private", "deny"),
                ],
                "prefix STRING, verdict STRING",
            )
            did = F.col("doc_id")
            pid = (did % 97).cast("string")
            base = d.select(
                "doc_id",
                F.when(did % 5 == 0, F.concat(F.lit("/p/"), pid))
                .when(did % 5 == 1, F.concat(F.lit("/admin/job"), pid))
                .when(did % 5 == 2, F.concat(F.lit("/static/css/s"), pid))
                .when(did % 5 == 3, F.concat(F.lit("/p/private/d"), pid))
                .otherwise(F.lit("/"))
                .alias("path"),
            )
            return longest_prefix_match(base, rules, "path").count()
        timed(f"r11_robots_lpm x{times}", lambda d=dw: _lpm(d))
        def _lic(d):
            did = F.col("doc_id")
            base = d.select(
                (did % 23).cast("string").alias("host"),
                F.when(did % 3 == 0, F.lit("cc-by"))
                .otherwise(F.lit("noai"))
                .alias("license"),
                F.col("n_chars"),
            )
            return license_rollup(base, "host", "license").count()
        timed(f"r11_license_rollup x{times}", lambda d=dw: _lic(d))
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        ow = replicate(orders, times, "o_orderkey", 50_000_000)
        def _kll_eval(o):
            from northwind_etl_spark.operators.kll import (
                kll_sketch,
                sketch_quantiles,
            )
            sk = kll_sketch(
                o, "o_orderpriority", "o_totalprice", "o_orderkey",
                capacity=256, n_levels=6,
            )
            q = sketch_quantiles(sk, [25, 50, 75, 90])
            qlong = q.select(
                "group",
                F.explode(F.array(*[
                    F.struct(F.lit(p).alias("pct"),
                             F.col(f"p{p}").alias("sv"))
                    for p in (25, 50, 75, 90)
                ])).alias("qq"),
            ).select("group", "qq.pct", "qq.sv")
            j = o.select(
                F.col("o_orderpriority").alias("group"),
                F.col("o_totalprice").cast("double").alias("v"),
            ).join(F.broadcast(qlong), "group")
            return (
                j.groupBy("group", "pct")
                .agg(F.sum(F.when(F.col("v") < F.col("sv"), 1)
                           .otherwise(0)).alias("nb"))
                .count()
            )
        timed(f"r11_kll_eval x{times}", lambda o=ow: _kll_eval(o))
        def _rp_lsh(e):
            from northwind_etl_spark.functions.vectors import (
                rp_signs,
                sparse_rp_exprs,
            )
            signs = rp_signs(64, 8)
            proj = e.select(
                "vec_id", *sparse_rp_exprs(F.col("embedding"), signs)
            )
            bucket = None
            for j in range(8):
                bit = F.when(
                    F.col(f"y{j:02d}") > 0, F.lit(1 << j)
                ).otherwise(F.lit(0))
                bucket = bit if bucket is None else bucket + bit
            bk = proj.select("vec_id", bucket.alias("bucket"))
            a = bk.select(F.col("vec_id").alias("ia"), "bucket")
            b = bk.select(F.col("vec_id").alias("ib"), "bucket")
            return (
                a.join(b, "bucket")
                .where(F.col("ia") < F.col("ib"))
                .count()
            )
        timed(f"r11_rp_lsh_cand x{times}", lambda e=ew: _rp_lsh(e))
        def _simhash_md5(d):
            from northwind_etl_spark.operators.dedup import (
                simhash_fingerprints_md5,
            )
            return simhash_fingerprints_md5(d, "text", "doc_id").count()
        timed(f"r11_simhash_md5 x{times}", lambda d=dw: _simhash_md5(d))
        def _erasure(d):
            from northwind_etl_spark.operators import dedup as DD
            sigs = DD.minhash_signatures_md5(
                d, "text", "doc_id", num_hashes=12, shingle_n=3
            )
            from northwind_etl_spark.cache import persist_stage
            banded = persist_stage(
                DD.band_keys_md5(sigs, "doc_id", bands=4, num_hashes=12)
            )
            cand = DD.delta_candidate_pairs(banded, banded, "doc_id")
            directed = cand.select(
                F.col("id_a").alias("o"), F.col("id_b").alias("p")
            ).unionByName(
                cand.select(F.col("id_b").alias("o"), F.col("id_a").alias("p"))
            )
            return (
                directed.where(F.col("o") % 17 != 0)
                .groupBy("o")
                .agg(F.sum(F.when(F.col("p") % 17 == 0, 1).otherwise(0))
                     .alias("lost"))
                .where(F.col("lost") >= 1)
                .count()
            )
        timed(f"r11_erasure x{times}", lambda d=dw: _erasure(d))




def _r12_section(spark, sf_dir, factor):
    """Round-12 operators.  Containment: replicas carry disjoint
    shingle spaces, so the posting-list machinery is measured at N×
    corpus with the pair count structural.  topk_churn: user ids are
    fixed under replication — counts deepen, the per-side distinct
    stays flat, so the two |terms|-row window sorts stay flat.  Burn
    rate: one hash agg per hour — linear scan.  Floored allocation:
    aggregates to |sources| rows, flat.  PQ/IVF recall: the query
    panel is pinned to the base corpus ids (fixed panel), so cost is
    queries × corpus = linear; the codebook/centroid fetch stays 16/8
    rows at any scale.  Copy rate: md5-digest agg, linear."""
    from northwind_etl_spark.operators.annquality import (
        ivf_medoid_recall,
        pq_frozen_recall,
    )
    from northwind_etl_spark.operators.dedup import (
        exact_copy_rate,
        ngram_containment,
    )
    from northwind_etl_spark.operators.heavyhitters import topk_churn
    from northwind_etl_spark.operators.sampling import floored_allocation
    from northwind_etl_spark.operators.timeseries import burn_rate_windows
    from northwind_etl_spark.sources.parquet import read_events

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = read_events(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ebase = emb.count()
    for times in (1, factor):
        dw = replicate(docs, times, "doc_id", 10_000_000, _doc_variant)
        timed(
            f"r12_containment x{times}",
            lambda d=dw: ngram_containment(
                d, "text", "doc_id", threshold=0.8, min_shingles=5
            ).count(),
        )
        timed(
            f"r12_copy_rate x{times}",
            lambda d=dw: exact_copy_rate(
                d, "text", "doc_id", "source"
            ).count(),
        )
        evw = replicate(events, times, "event_id", 50_000_000)
        terms = evw.select(
            F.when(F.col("event_id") % 2 == 0, F.lit("a"))
            .otherwise(F.lit("b"))
            .alias("side"),
            F.col("user_id").cast("string").alias("term"),
        )
        timed(
            f"r12_topk_churn x{times}",
            lambda t=terms: topk_churn(t, "term", "side", k=20).count(),
        )
        lag_s = (F.col("event_id") % 600) + F.when(
            F.col("event_id") % 7 == 0, 14400
        ).otherwise(0)
        flagged = evw.select(
            "ts", F.when(lag_s > 600, 1).otherwise(0).alias("viol")
        )
        timed(
            f"r12_burn_rate x{times}",
            lambda fl=flagged: burn_rate_windows(
                fl, "ts", "viol", error_budget=0.14
            ).count(),
        )
        per = dw.select(
            "source", F.length("text").alias("w")
        )
        timed(
            f"r12_floored_alloc x{times}",
            lambda p=per: floored_allocation(
                p, "source", "w", floor_pct=5
            ).count(),
        )
        # query_max pins the panel to the BASE corpus ids (fixed-panel
        # eval: cost = queries × corpus = linear in corpus)
        ew = replicate(emb, times, "vec_id", 1_000_001, _vec_variant)
        timed(
            f"r12_pq_recall x{times}",
            lambda e=ew, m=ebase: pq_frozen_recall(
                e, query_mod=50, query_max=m
            ).count(),
        )
        timed(
            f"r12_ivf_recall x{times}",
            lambda e=ew, m=ebase: ivf_medoid_recall(
                e, query_mod=50, query_max=m
            ).count(),
        )
        from northwind_etl_spark.operators.profiling import (
            gini_by_weight,
            hill_tail_index,
            ks_by_group,
        )

        ow = replicate(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            times,
            "o_orderkey",
            6_000_000,
        )
        cents = ow.select(
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        timed(
            f"r12_gini x{times}",
            lambda c=cents: gini_by_weight(c, "o_custkey", "cents").count(),
        )
        timed(
            f"r12_hill x{times}",
            lambda o=ow: hill_tail_index(o, "o_totalprice", k=100).count(),
        )
        timed(
            f"r12_ks x{times}",
            lambda d=dw: ks_by_group(d, "n_chars", "source").count(),
        )


if __name__ == "__main__":
    main()
