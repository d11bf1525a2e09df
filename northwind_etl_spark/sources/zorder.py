"""Z-order (Morton) layout: multi-dimensional data clustering so
parquet min/max stats prune on EVERY query dimension, not just the
leading sort key.

A lexicographic sort by (a, b) gives perfect pruning on `a` and none
on `b`; at 100 TB, queries filtering on either dimension force a full
scan half the time.  Quantile-binning each column, interleaving the
bin bits into one Morton code, and range-partitioning + sorting by it
bounds the min/max box of BOTH columns per file/row-group — the same
layout trick Delta/Iceberg OPTIMIZE ZORDER applies, composed here from
plain DataFrame ops:

1. per column: `approxQuantile` computes 2^bits - 1 bin boundaries —
   a driver-side list of doubles from one sketch aggregation (NO
   global window; an orderBy-without-partition window would funnel
   every row through one task, exactly the bottleneck a layout job
   cannot afford).  Quantile bins are skew-tolerant: equal-width bins
   on a skewed column would put most rows in one bin and destroy
   clustering;
2. bin index = count of boundaries <= value, a `size(filter(...))`
   over a literal array — JVM-side, per-row, no shuffle;
3. Morton code via shiftleft/bitwiseAND expression tree — codegen, no
   UDF;
4. repartitionByRange + sortWithinPartitions on the code.

Cost model: one approxQuantile sketch pass per dimension (driver gets
only the boundary list) + the final range partition — a one-time
LAYOUT job at write time, amortized over every subsequent pruned scan,
exactly like any OPTIMIZE/clustering pass.

tests/test_zorder.py quantifies the claim: per-file worst-dimension
span over (user_id, event_id) drops from >80% (single-key sort) to
<45% under Z-order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_by_quantiles(df: DataFrame, col: str, bits: int) -> Column:
    """Bin index in [0, 2^bits) = how many quantile boundaries the
    value exceeds, RESCALED to span the full bit range.  NULLs compare
    to nothing and land in bin 0.

    The rescale matters for low-cardinality columns: 15 distinct
    values dedupe to 15 boundaries, and without it the bin occupies
    only the LOW 4 bits — the Morton code's high bits would then come
    entirely from the other dimension and the interleave degenerates
    to a single-column sort (measured: full-span files on the
    low-cardinality dimension)."""
    nbins = 1 << bits
    probs = [i / nbins for i in range(1, nbins)]
    # relativeError trades sketch size for boundary precision; 1/(4n)
    # keeps adjacent-bin confusion bounded well under one bin width
    bounds = df.stat.approxQuantile(col, probs, 1.0 / (4 * nbins))
    # deduplicate (heavy skew / low cardinality repeats boundaries)
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    if not uniq:  # constant (or all-NULL) column: one bin
        return F.lit(0).cast("long")
    from ..functions.arrays import lit_double_array

    arr = lit_double_array(uniq)
    x = F.col(col).cast("double")
    raw = F.size(F.filter(arr, lambda b: b <= x)).cast("long")  # 0..k
    return F.floor(raw * F.lit(float(nbins - 1) / len(uniq))).cast("long")


def morton_code(x: Column, y: Column, *, bits: int) -> Column:
    """Interleave the low `bits` bits of two long columns: x takes the
    even bit positions, y the odd — a pure expression tree (codegen)."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y, i).bitwiseAND(F.lit(1))
        out = out + F.shiftleft(xbit, 2 * i) + F.shiftleft(ybit, 2 * i + 1)
    return out


def zorder_layout(
    df: DataFrame,
    col_x: str,
    col_y: str,
    *,
    bits: int = 8,
    out_partitions: int = 8,
) -> DataFrame:
    """Return `df` re-laid-out in Z-order over (col_x, col_y): range-
    partitioned and sorted by the Morton code of the two quantile-
    binned columns.  Write the result with any sink; each output file
    then covers a tight min/max box in BOTH dimensions, so parquet
    stat pruning works for filters on either column.

    The ordering column is internal; output columns equal input columns.
    """
    if bits < 1 or bits > 31:
        raise ValueError(f"zorder_layout: bits must be in [1, 31], got {bits}")
    if "__z" in df.columns:
        # refuse instead of silently overwriting and then dropping a
        # data column (same reserved-name contract as asof_join)
        raise ValueError("zorder_layout: input already has a __z column")
    z = morton_code(
        _bin_by_quantiles(df, col_x, bits),
        _bin_by_quantiles(df, col_y, bits),
        bits=bits,
    )
    return (
        df.withColumn("__z", z)
        .repartitionByRange(out_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
