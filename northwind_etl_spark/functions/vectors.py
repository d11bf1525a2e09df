"""Vector column expressions over ArrayType(FloatType) embeddings.

All pure Catalyst higher-order functions (zip_with / aggregate): the
dot product is a sequential left fold in double precision — deterministic
element order, no Python, no shuffle.  For wide batch scoring the
pandas_udf path in operators/similarity.py (numpy matmul over Arrow
batches) is the 100 TB-scale alternative; these expressions are the
zero-dependency baseline and the semantics oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def to_double_expr(vec: Column | str) -> Column:
    return F.transform(_col(vec), lambda x: x.cast("double"))


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as a sequential double fold (cast first: float32 pairs
    multiplied in float would lose bits differently per engine)."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column | str) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    return dot_expr(a, b) / F.nullif(norm_expr(a) * norm_expr(b), F.lit(0.0))


def int8_quant_exprs(vec: Column | str) -> dict[str, Column]:
    """Symmetric per-vector int8 quantization (the vector-store
    compression layout: one float scale + dim int8 codes, 4×
    smaller than float32) as EXACT cross-engine expressions:

    - scale = max |x| (double max — exact);
    - code  = floor(x/scale·127 + 0.5)  (round-half-up; every step a
      single correctly-rounded IEEE op, so DuckDB replays it
      bit-for-bit — the knn float-recipe discipline);
    - reconstruction error x − code·scale/127, squared and folded
      sequentially in array order (both engines fold lists left to
      right, proven by the knn oracle).

    Returns {scale, sum_code, mse} column expressions; zero vectors
    quantize to all-zero codes with mse 0.
    """
    xd = to_double_expr(vec)
    scale = F.array_max(F.transform(xd, F.abs))
    code = lambda x: F.floor(x / scale * 127 + F.lit(0.5)).cast(  # noqa: E731
        "double"
    )
    err2 = F.transform(xd, lambda x: F.pow(x - code(x) * scale / 127, 2))
    nonzero = scale > 0
    return {
        "scale": scale,
        "sum_code": F.when(
            nonzero,
            F.aggregate(
                F.transform(xd, lambda x: code(x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        ).otherwise(F.lit(0).cast("long")),
        "mse": F.when(
            nonzero,
            F.aggregate(err2, F.lit(0.0), lambda acc, x: acc + x)
            / F.size(xd).cast("double"),
        ).otherwise(F.lit(0.0)),
    }


def rp_signs(in_dim: int, out_dim: int, *, seed: str = "rp-r08") -> list[list[int]]:
    """Deterministic Achlioptas sparse-projection sign matrix
    (Achlioptas 2003): s[j][i] ∈ {+1, 0, -1} with database-friendly
    probabilities {1/6, 2/3, 1/6}, derived from md5(seed|j|i) — a pure
    function of the seed, so Spark plan and SQL oracle embed the SAME
    literal matrix and no RNG exists anywhere.  hashlib, not Spark:
    the matrix is (out_dim × in_dim) driver-side literals, never data.
    """
    import hashlib

    signs: list[list[int]] = []
    for j in range(out_dim):
        row = []
        for i in range(in_dim):
            b = hashlib.md5(f"{seed}|{j}|{i}".encode()).digest()[0] % 6
            row.append(1 if b == 0 else (-1 if b == 1 else 0))
        signs.append(row)
    return signs


def sparse_rp_exprs(
    vec: Column | str, signs: list[list[int]]
) -> list[Column]:
    """One output column per projected dimension:
    y_j = Σ_i s[j][i]·x_i, folded SEQUENTIALLY in array order — every
    step one correctly-rounded IEEE add/multiply on exact sign
    literals, so the DuckDB oracle (list_sum over the same zipped
    products) reproduces each coordinate bit-for-bit (the int8-quant /
    knn fold discipline).  Johnson-Lindenstrauss-style dimensionality
    reduction at 3× the sparsity of dense Gaussian RP: two thirds of
    the terms are exact zeros the optimizer folds away.
    """
    from .arrays import lit_double_array

    xd = to_double_expr(vec)
    out = []
    for j, row in enumerate(signs):
        sarr = lit_double_array(row)
        prods = F.zip_with(xd, sarr, lambda x, s: x * s)
        out.append(
            F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x).alias(
                f"y{j:02d}"
            )
        )
    return out


def int8_codes_expr(vec: Column | str) -> Column:
    """The full int8 code vector as array<long> — the same per-element
    rounding chain as int8_quant_exprs (floor(x/scale·127 + 0.5), each
    step one correctly-rounded IEEE op), exposed as an array so
    downstream integer math (quantized dot products, ANN recall
    measurement) runs on EXACT integers.  Zero vectors code to all
    zeros."""
    xd = to_double_expr(vec)
    scale = F.array_max(F.transform(xd, F.abs))
    codes = F.transform(
        xd, lambda x: F.floor(x / scale * 127 + F.lit(0.5)).cast("long")
    )
    return F.when(scale > 0, codes).otherwise(
        F.transform(xd, lambda x: F.lit(0).cast("long"))
    )


def int_dot_expr(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ over two long arrays — pure integer fold, exact on both
    engines (64-dim int8 dots stay far below 2^63)."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x * y)
    return F.aggregate(
        prods, F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def int8_cosine_expr(a: Column | str, b: Column | str) -> Column:
    """Cosine of two int8 CODE vectors: the scales cancel, so this is
    integer-dot / sqrt(integer-dot · integer-dot) — one double
    division and one sqrt over exact longs, bit-identical cross-
    engine.  NULL when either code vector is all-zero."""
    num = int_dot_expr(a, b).cast("double")
    na = int_dot_expr(a, a).cast("double")
    nb = int_dot_expr(b, b).cast("double")
    return num / F.nullif(F.sqrt(na * nb), F.lit(0.0))
