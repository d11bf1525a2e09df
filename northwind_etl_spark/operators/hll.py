"""md5-register HyperLogLog — the ORACLE-VERIFIED twin of the
engine-native Datasketches HLL (Flajolet et al. 2007), the same move
`minhash_signatures_md5` / `simhash_fingerprints_md5` made for the
LSH families: replace the engine-private hash with md5, which exists
bit-identically in every SQL engine, and the whole sketch — registers,
merge, AND estimate — becomes value-checkable against an independent
DuckDB replay instead of rows-only.

Scheme (m = 256 registers, 60-bit tails):
- register index  = first 2 md5 hex nibbles of the value (0..255);
- tail            = next 15 nibbles (60 bits, fits a BIGINT);
- rho             = leading-zero count of the tail + 1, computed
  ENTIRELY in the string domain (strip leading '0' nibbles, then a
  16-case map for the first non-zero nibble) — no float log2, no
  engine-specific bit intrinsics, identical in Spark and DuckDB;
- register state  = MAX(rho) per (group…, register) — mergeable by
  construction (max of maxes), ≤ m rows per group no matter how many
  billions of rows fed it: the pre-aggregated-metric pattern shared
  with KMV/CMS/KLL (operators/kmv.py previously documented HLL as the
  sketch whose registers are "engine-private" — this module closes
  exactly that gap);
- estimate        = alpha_m·m²/Σ 2^(−M_j) with the standard
  linear-counting branch below 2.5m.  Exactness discipline: the
  harmonic sum is an EXACT integer (Σ 2^(61−M_j), summed as
  DECIMAL(38,0) — 256·2^61 < 10^38), the numerator is ONE frozen
  double literal, and the estimate is one correctly-rounded division;
  the linear-counting values 256·ln(256/V) are a 256-cell frozen table
  embedded verbatim in both engines (the lnlut.py discipline).  No
  large-range correction is needed: it exists to patch 32-bit-hash
  collisions, and the tails here are 60-bit.

Accuracy: σ ≈ 1.04/√m ≈ 6.5% relative.  Cross-engine probes at
n ∈ {3 … 50000} match DuckDB bit-for-bit through both branches.

100 TB shape: build is one groupBy(group, reg) MAX with map-side
combine — the shuffle carries ≤ tasks·m register rows, never values;
rollups/merges ride the same MAX over persisted per-slice states.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_REGISTERS = 256
_IDX_NIBBLES = 2
_TAIL_NIBBLES = 15
RHO_CAP = 4 * _TAIL_NIBBLES + 1  # all-zero tail
_ALPHA = 0.7213 / (1 + 1.079 / M_REGISTERS)
# numerator alpha·m²·2^61 of the scaled harmonic estimator, frozen as
# one double literal (repr round-trips; both engines parse to the same
# IEEE double)
EST_NUMERATOR = _ALPHA * M_REGISTERS * M_REGISTERS * float(1 << RHO_CAP)
LC_THRESHOLD = 2.5 * M_REGISTERS  # 640.0
# linear-counting table: LC_TABLE[V-1] = m·ln(m/V) for V zero registers
LC_TABLE = [M_REGISTERS * math.log(M_REGISTERS / v) for v in range(1, M_REGISTERS + 1)]
# relative 3-sigma accuracy bound (1.04/sqrt(m)), used by the eval entry
REL_3SIGMA = 3.0 * 1.04 / math.sqrt(M_REGISTERS)


def register_exprs(value: Column) -> tuple[Column, Column]:
    """(register, rho) columns for one value — string-domain only."""
    h = F.md5(value.cast("string"))
    reg = F.conv(F.substring(h, 1, _IDX_NIBBLES), 16, 10).cast("int")
    tail = F.substring(h, _IDX_NIBBLES + 1, _TAIL_NIBBLES)
    stripped = F.regexp_replace(tail, "^0+", "")
    first = F.substring(stripped, 1, 1)
    lz_in_nibble = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(stripped == "", F.lit(RHO_CAP)).otherwise(
        4 * (F.length(tail) - F.length(stripped)) + lz_in_nibble + 1
    )
    return reg, rho


def hll_state(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Register table (group…, reg INT, maxrho INT) — ≤ 256 rows per
    group; NULL values are skipped (COUNT DISTINCT semantics)."""
    gcols = list(group_cols)
    reg, rho = register_exprs(F.col(value_col))
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*gcols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*gcols, "reg")
        .agg(F.max("rho").cast("int").alias("maxrho"))
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Register-wise MAX — lossless: merge(state(A), state(B)) ≡
    state(A ∪ B) exactly (max is a lattice join, pinned in tests)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    gcols = [c for c in merged.columns if c not in ("reg", "maxrho")]
    return merged.groupBy(*gcols, "reg").agg(
        F.max("maxrho").cast("int").alias("maxrho")
    )


def states_equal(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-group register-table equality: (group…, matches BOOLEAN) —
    TRUE only when every register agrees AND both sides carry exactly
    the same register set.  The comparison COALESCEs to 0 before the
    MIN: a register present on only one side compares NULL, and min()
    skips NULLs, so without the coalesce an asymmetric table would
    sail through the identity check this exists to perform (caught in
    the r12 self-review; pinned by a planted test)."""
    gcols = [c for c in a.columns if c not in ("reg", "maxrho")]
    joined = a.join(
        b.withColumnRenamed("maxrho", "__other_maxrho"),
        [*gcols, "reg"],
        "full",
    )
    return (
        joined.groupBy(*gcols)
        .agg(
            F.min(
                F.coalesce(
                    (F.col("maxrho") == F.col("__other_maxrho")).cast("int"),
                    F.lit(0),
                )
            ).alias("__all_eq")
        )
        .select(*gcols, (F.col("__all_eq") == 1).alias("matches"))
    )


def estimate_expr(npres: Column, ssmall: Column) -> Column:
    """Estimate from (n present registers, exact Σ 2^(61−maxrho) over
    present registers): absent registers contribute 2^61 each; the
    linear-counting branch reads the frozen table."""
    v = F.lit(M_REGISTERS) - npres
    s = (
        ssmall
        + v.cast("decimal(38,0)") * F.lit(1 << RHO_CAP).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(EST_NUMERATOR) / s
    return F.when(
        (raw <= F.lit(LC_THRESHOLD)) & (v > 0),
        F.element_at(F.lit(LC_TABLE), v.cast("int")),
    ).otherwise(raw)


def hll_estimate(
    state: DataFrame, *, alias: str = "est_distinct", round_to: int = 4
) -> DataFrame:
    """Collapse a register state to (group…, estimate DOUBLE)."""
    gcols = [c for c in state.columns if c not in ("reg", "maxrho")]
    agg = state.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("__npres"),
        F.sum(
            F.expr(f"CAST(shiftleft(1L, {RHO_CAP} - maxrho) AS DECIMAL(38,0))")
        ).alias("__ssmall"),
    )
    est = estimate_expr(F.col("__npres"), F.col("__ssmall"))
    return agg.select(*gcols, F.round(est, round_to).alias(alias))


# ---------------------------------------------------------------------------
# SQL mirrors (imported by plans/oracles.py so the frozen constants and
# the rho chain exist VERBATIM in both engines' plans)

LC_TABLE_SQL = "[" + ",".join(repr(x) for x in LC_TABLE) + "]"


def reg_sql(hx: str) -> str:
    """DuckDB register index of an md5-hex expression."""
    return f"CAST('0x' || substring({hx},1,{_IDX_NIBBLES}) AS INT)"


def rho_sql(hx: str) -> str:
    """DuckDB rho of an md5-hex expression — same string-domain chain."""
    tail = f"substring({hx},{_IDX_NIBBLES + 1},{_TAIL_NIBBLES})"
    stripped = f"regexp_replace({tail}, '^0+', '')"
    return f"""CASE WHEN {stripped} = '' THEN {RHO_CAP}
        ELSE 4*(length({tail}) - length({stripped}))
             + CASE substring({stripped},1,1)
                 WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                 WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                 WHEN '7' THEN 1 ELSE 0 END + 1 END"""


def estimate_sql(npres: str, ssmall: str) -> str:
    """DuckDB estimate from (n present registers, exact scaled sum)."""
    s = (
        f"CAST({ssmall} + ({M_REGISTERS} - {npres})"
        f" * CAST({1 << RHO_CAP} AS DECIMAL(38,0)) AS DOUBLE)"
    )
    raw = f"({repr(EST_NUMERATOR)} / {s})"
    return f"""CASE WHEN {raw} <= {repr(LC_THRESHOLD)}
                AND ({M_REGISTERS} - {npres}) > 0
           THEN {LC_TABLE_SQL}[CAST({M_REGISTERS} - {npres} AS INT)]
           ELSE {raw} END"""


def ssmall_sql(maxrho: str) -> str:
    """DuckDB exact scaled harmonic sum over present registers."""
    return (
        f"SUM(CAST((CAST(1 AS BIGINT) << ({RHO_CAP} - {maxrho}))"
        f" AS DECIMAL(38,0)))"
    )
