"""Count-Min Sketch — mergeable frequency estimation (Cormode &
Muthukrishnan 2005), the frequency-domain counterpart to the KMV
distinct sketch (operators/kmv.py) and the HLL rollup: a fixed
(depth × width) counter grid where each item increments one cell per
row and a point estimate is the MIN over its cells.  Never
undercounts; overcounts by < 2N/width with probability 1−2^−depth.

North-star extension operator (not in the reference): at 100 TB the
exact term-frequency table IS the scale problem (|vocab| grows with
the corpus); the CMS state is d·w counters regardless of corpus size —
the pre-aggregated-metric pattern for frequencies.

100 TB shape:
- **build**: explode each occurrence into `depth` (row, cell) keys and
  run ONE groupBy-sum.  The explode multiplies rows by depth, but the
  aggregation's map-side combine collapses every task's contribution
  to ≤ depth·width cells before the exchange — the shuffle moves
  O(tasks · d · w) counter rows, never O(tokens).
- **estimate**: the sketch is ≤ d·w rows (16 KB of longs at the
  defaults) — explicitly `F.broadcast` into the probe join; per-term
  MIN over depth matched cells.
- **merge**: the sketch is LINEAR — cell-wise sum of two sketches IS
  the sketch of the concatenated corpora, exactly (pinned in tests).
  Per-slice sketches roll up like the KMV/HLL/histogram states.

Engine portability (same discipline as KMV): the cell index is the
first 13 md5 nibbles (52 bits — exact in IEEE doubles and BIGINTs
alike) of ``"{row}:" + value``, mod width.  DuckDB reproduces every
cell index, every counter, and every MIN bit-for-bit
(plans/oracles.py::cms_term_counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NIBBLES = 13


def cell_expr(value: Column, row: int, width: int) -> Column:
    """Portable cell index: int(md5(f"{row}:" + value)[:13], 16) % width."""
    h = F.md5(F.concat(F.lit(f"{row}:"), value))
    return (
        F.conv(F.substring(h, 1, _NIBBLES), 16, 10).cast("long") % width
    ).alias(f"cell_{row}")


def cms_build(
    items: DataFrame,
    value_col: str,
    *,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Sketch table (row int, cell long, cnt long) — ≤ depth·width rows.

    `weight_col` lets a pre-aggregated (value, count) table build the
    identical sketch the raw occurrence stream would (linearity).
    """
    v = F.col(value_col).cast("string")
    w = F.col(weight_col) if weight_col else F.lit(1)
    exploded = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cell_expr(v, r, width).alias("cell"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
        w.alias("__w"),
    )
    return (
        exploded.groupBy(
            F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell")
        )
        .agg(
            F.sum("__w")
            .cast("long")
            # (depth, width) travel WITH the sketch: cms_estimate reads
            # them back, so a probe can never silently hash against the
            # wrong grid (which would return 0 and break the
            # never-undercounts guarantee)
            .alias("cnt", metadata={"cms_depth": depth, "cms_width": width})
        )
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — exact by linearity: merge(build(A), build(B))
    ≡ build(A ∪ B).  Refuses to merge sketches with different stamped
    grids (cell indices would not be comparable) and re-stamps the
    result."""
    metas = [s.schema["cnt"].metadata for s in sketches]
    grids = {
        (m.get("cms_depth"), m.get("cms_width")) for m in metas
    }
    if len(grids) > 1:
        raise ValueError(f"cms_merge: incompatible sketch grids {sorted(grids)}")
    meta = metas[0]
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "cell").agg(
        F.sum("cnt").cast("long").alias("cnt", metadata=dict(meta))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    *,
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Point estimates for `queries[value_col]`: MIN over the item's
    depth cells.  The sketch (≤ d·w rows) is broadcast; a cell no item
    ever hashed to reads as 0 (the true CMS semantics for absent
    counters).

    depth/width default to the values stamped on the sketch by
    cms_build; passing values that contradict the stamp raises —
    probing a sketch with the wrong grid would silently estimate 0.
    """
    meta = sketch.schema["cnt"].metadata if "cnt" in sketch.columns else {}
    for name, given, key in (("depth", depth, "cms_depth"), ("width", width, "cms_width")):
        stamped = meta.get(key)
        if given is None and stamped is None:
            raise ValueError(
                f"cms_estimate: {name} not given and the sketch carries no "
                f"{key} stamp — pass {name}= explicitly"
            )
        if given is not None and stamped is not None and given != stamped:
            raise ValueError(
                f"cms_estimate: {name}={given} contradicts the sketch's "
                f"{key}={stamped}"
            )
    depth = depth if depth is not None else int(meta["cms_depth"])
    width = width if width is not None else int(meta["cms_width"])
    v = F.col(value_col).cast("string")
    probes = queries.select(
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cell_expr(v, r, width).alias("cell"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select(value_col, F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
    joined = probes.join(F.broadcast(sketch), ["row", "cell"], "left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate")
    )
