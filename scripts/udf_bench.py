#!/usr/bin/env python
"""Micro-benchmark backing the engine's UDF policy (PLANS.md):
JVM builtins > Arrow-batched pandas UDF > row-at-a-time Python UDF.

Scores the same cosine-similarity computation over the embeddings table
three ways and prints a JSON line with seconds per variant.  Rerun with
SPARK_GRAFT_SF_DIR / REPEAT to reproduce the PLANS.md numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import DoubleType

from northwind_etl_spark.functions.vectors import cosine_expr
from northwind_etl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("REPEAT", "20"))
    spark = get_spark("udf-bench")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # replicate to a meaningful row count for the comparison
    big = emb
    for i in range(1, repeat):
        big = big.unionAll(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        )
    big = big.repartition(spark.sparkContext.defaultParallelism).cache()
    n = big.count()
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    qarr = np.asarray(q, dtype=np.float64)
    qlit = F.array(*[F.lit(x) for x in q])

    def run(label, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # 1. JVM builtin fold (whole-stage codegen)
    builtin = big.select(cosine_expr("embedding", qlit).alias("c"))
    t_builtin = min(run("builtin", builtin) for _ in range(3))

    # 2. Arrow-batched pandas UDF (numpy matmul per batch)
    @pandas_udf(DoubleType())
    def cos_pandas(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        dots = mat @ qarr
        norms = np.linalg.norm(mat, axis=1) * np.linalg.norm(qarr)
        return pd.Series(dots / norms)

    t_pandas = min(run("pandas", big.select(cos_pandas("embedding").alias("c"))) for _ in range(3))

    # 3. row-at-a-time Python UDF (the anti-pattern)
    def cos_row(vec):
        dot = na = 0.0
        for a, b in zip(vec, q):
            dot += a * b
            na += a * a
        import math

        return dot / (math.sqrt(na) * math.sqrt(sum(x * x for x in q)))

    cos_row_udf = udf(cos_row, DoubleType())
    t_row = min(run("row", big.select(cos_row_udf("embedding").alias("c"))) for _ in range(3))

    print(
        json.dumps(
            {
                "rows": n,
                "builtin_fold_sec": t_builtin,
                "pandas_udf_sec": t_pandas,
                "row_udf_sec": t_row,
                "row_vs_pandas_slowdown": round(t_row / t_pandas, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
