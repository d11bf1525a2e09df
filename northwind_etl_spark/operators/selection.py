"""Exact distributed selection (k-th smallest / exact median) without
a global sort.

The naive exact median is ORDER BY + OFFSET — a single-task total sort
(the `Exchange SinglePartition` trap global ranking already documents).
`percentile_approx` avoids the sort but is approximate.  This operator
gets the EXACT order statistic with a driver-side binary search over
value space: each pass is one histogram aggregation (map-side
combined, 1024 bins), the driver keeps only the 1024 counts, picks
the bin containing the k-th element, and narrows to that bin.  A
double's exponent+mantissa range collapses in a handful of passes
(each divides the candidate interval by 1024); ties collapse the
interval to a point immediately.

Floating-point discipline: rows are filtered by the SAME bin
expression that produced the counts (`floor((v - lo)/width) ==
chosen`, identical literals), never by re-derived `lo + chosen·width`
bounds — product-form bounds and floor classification can round
differently at bin edges, which would desynchronize the rank
bookkeeping from the surviving rows.  The next pass's [lo, hi] is
then the measured min/max of the survivors (authoritative, not
arithmetic).  Non-finite values (NaN/±inf) have no place on the
histogram number line; the initial scan counts them and raises — the
caller decides how to clean them (the ANSI order-statistic convention
of silently sorting NaN greatest is exactly the kind of silent
semantics this repo's oracles exist to preclude).

Per pass: one filtered histogram aggregation + one min/max of the
survivors; driver state: 1024 longs.  At 100 TB the narrowed range
filter pushes into parquet row-group stats, so later passes read a
shrinking fraction of the data — the selection gets CHEAPER as it
converges.

Verified: tests/test_selection.py (vs numpy.partition on random data,
all-duplicates, k=1/k=n, negative values, adjacent-double stagnation,
NaN/inf rejection, quantile convention) and the oracle-checked
`exact_median_order_price` entry (DuckDB ORDER BY … OFFSET — the
unambiguous definition of the k-th element).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BINS = 1024

# Early-exit threshold (r12 optimization round, guide §1.2 "remove
# unnecessary passes"): once the surviving candidate set's APPROXIMATE
# distinct-value count (HLL, computed inside the same histogram
# aggregation — map-side combinable, no extra job) drops to this, stop
# narrowing and walk the per-distinct-value counts directly.  The walk
# collects one row per distinct value — the same driver cost class as
# the 1024-bin histogram itself — and it is EXACT regardless of the
# estimate's error: an under-estimate only makes that collect a few
# percent larger, an over-estimate only costs one more histogram pass.
# Measured on the sf0.1 bench this removes 1-2 full passes (jobs) from
# every selection call (orders prices resolve after ONE pass instead
# of three).
_WALK_MAX = 2048


def kth_smallest(
    df: DataFrame,
    col: str,
    k: int | None = None,
    *,
    q: float | None = None,
    max_passes: int = 12,
) -> tuple[float, int, int]:
    """Exact k-th smallest value of `col` (1-based k).  Exactly one of
    `k` / `q` may be given; default is the lower median.  With `q`,
    k = max(1, ceil(q·n)) — the `quantile_disc` convention.  Returns
    (value, k, n).

    NULLs are excluded (order statistics over present values);
    NaN/±inf raise.  The driver never holds more than the 1024-bin
    histogram.
    """
    if k is not None and q is not None:
        raise ValueError("pass k or q, not both")
    v = F.col("v")
    base = df.select(F.col(col).alias("v")).where(v.isNotNull())
    # ONE initial job: count, range, and the non-finite census.
    first = base.agg(
        F.count(v).alias("n"),
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
        F.approx_count_distinct(v).alias("nd"),
        F.sum(
            F.when(
                F.isnan(v) | (v == float("inf")) | (v == float("-inf")), 1
            ).otherwise(0)
        ).alias("bad"),
    ).first()
    total = first.n
    if total == 0:
        raise ValueError("kth_smallest on an empty relation")
    if first.bad:
        raise ValueError(
            f"kth_smallest: {first.bad} non-finite value(s) in {col!r};"
            " filter NaN/inf first — they have no place on the"
            " histogram number line"
        )
    if q is not None:
        k = max(1, math.ceil(q * total))
    elif k is None:
        k = (total + 1) // 2
    if not 1 <= k <= total:
        raise ValueError(f"k={k} outside 1..{total}")

    lo, hi = float(first.lo), float(first.hi)
    remaining_k = k
    cur = base
    for _ in range(max_passes):
        if first.nd <= _WALK_MAX:
            break  # few distinct values overall: walk immediately
        if lo == hi:
            return lo, k, total
        width = (hi - lo) / _BINS
        if width == 0 or not math.isfinite(width):
            break
        # THE bin expression — used for both counting and filtering,
        # so classification and survival can never disagree.
        b = F.least(
            F.lit(_BINS - 1),
            F.greatest(
                F.lit(0),
                F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"),
            ),
        )
        # ONE job per pass: each bin's count AND measured value range
        # (the chosen bin's min/max are the next pass's authoritative
        # bounds — no separate survivors scan, no re-derived edges)
        # plus the bin's approximate distinct count for the early walk.
        stats = {
            r.b: (r["count"], float(r.lo), float(r.hi), r.nd)
            for r in cur.groupBy(b.alias("b"))
            .agg(
                F.count(v).alias("count"),
                F.min(v).alias("lo"),
                F.max(v).alias("hi"),
                F.approx_count_distinct(v).alias("nd"),
            )
            .collect()
        }
        cum = 0
        chosen = _BINS - 1
        for i in range(_BINS):
            c = stats.get(i, (0,))[0]
            if cum + c >= remaining_k:
                chosen = i
                remaining_k -= cum
                break
            cum += c
        cur = cur.where(b == F.lit(chosen))
        if stats[chosen][3] <= _WALK_MAX:
            break  # chosen bin holds few distinct doubles: walk now
        new_lo, new_hi = stats[chosen][1], stats[chosen][2]
        if (new_lo, new_hi) == (lo, hi):
            break  # float stagnation: a handful of adjacent doubles
        lo, hi = new_lo, new_hi
    # Finish exactly: however many ROWS remain, they span few distinct
    # doubles — walk per-distinct-value counts (one row per value).
    vals = sorted(
        cur.groupBy("v").count().collect(), key=lambda r: r.v
    )
    cum = 0
    for r in vals:
        cum += r["count"]
        if cum >= remaining_k:
            return float(r.v), k, total
    raise AssertionError("selection invariant violated")  # pragma: no cover


def exact_quantile(
    df: DataFrame, col: str, q: float, **kw
) -> tuple[float, int, int]:
    """Exact discrete quantile — thin wrapper over kth_smallest(q=q)
    (one scan computes count/range/census; no separate count job)."""
    return kth_smallest(df, col, q=q, **kw)


def group_kth_smallest(
    df: DataFrame,
    col: str,
    group_col: str,
    *,
    k: int | None = None,
    q: float | None = None,
    max_passes: int = 12,
) -> list[tuple]:
    """Exact per-group order statistic — every group's k-th smallest
    (or q-quantile, k = max(1, ceil(q·n_g))) WITHOUT a per-group sort.

    All unresolved groups advance together: each pass is ONE histogram
    aggregation over (group, bin) — the bin expression reads each
    group's own [lo, width] from a broadcast-joined spec built from
    driver state — followed by one per-group min/max of the survivors.
    Driver state is O(#groups) plus the ≤ #groups·1024 histogram rows
    per pass; groups resolve (and leave the scan) as soon as their
    interval collapses or stagnates — or as soon as their surviving
    distinct-value count is small enough to walk exactly (_WALK_MAX).
    The same float discipline as kth_smallest: survivors are filtered
    by the IDENTICAL bin expression that produced the counts, never
    re-derived bounds.

    Returns [(group, value, k, n)] sorted by group.  Intended for
    LOW-cardinality groups (priorities, sources, partitions of an
    experiment); for millions of groups use hist_quantiles
    (operators/incremental.py), which trades exactness for one pass.
    """
    if k is not None and q is not None:
        raise ValueError("pass k or q, not both")
    spark = df.sparkSession
    v = F.col("v")
    # Local persist with deterministic release: the loop reads base
    # once per pass (the first-stats agg, then P histogram jobs and
    # any finish_by_walk), and every pass's `cur` lineage replays the
    # earlier passes' joins+filters FROM base — without the persist
    # each of those jobs re-runs the upstream scan/join, which also
    # makes the operator's latency track whatever else the session
    # has cached (the r09→r11 bench creep on unchanged code).  The
    # projected (g, v) pair is small; unpersist in `finally` so a
    # long-lived session never accumulates one entry per call.
    base = (
        df.select(
            F.col(group_col).alias("g"),
            F.lit("").alias("__t"),
            F.col(col).alias("v"),
        )
        .where(v.isNotNull())
        .persist()
    )

    def kfor(gk: object, tag: str, n: int) -> int:
        if q is not None:
            return max(1, math.ceil(q * n))
        return (n + 1) // 2 if k is None else k

    try:
        rows = _group_kth_smallest_loop(spark, base, kfor, max_passes)
    finally:
        base.unpersist()
    return sorted((gk, val, kk, n) for gk, _t, val, kk, n in rows)


def group_quantiles(
    df: DataFrame,
    col: str,
    group_col: str,
    qs: list[float],
    *,
    max_passes: int = 12,
) -> list[tuple]:
    """Exact per-group order statistics for SEVERAL quantiles in ONE
    selection loop (r12 optimization round, guide §1.2: remove whole
    passes before tuning anything else).  Every (group, quantile)
    pair advances together; each pass is still a single
    (group, tag, bin) histogram aggregation — for m quantiles this
    replaces m sequential loops (m initial scans + m independent pass
    chains + m walks) with one loop over an m-times-tagged base.  The
    tag expansion multiplies the SCANNED rows by m, but every pass is
    map-side-combined into ≤ groups·m·1024 histogram rows, and the
    job count — the actual latency driver — drops by ~m×.

    Returns [(group, q, value, k, n)] sorted by (group, q), with k/n
    exactly as group_kth_smallest(q=q) would report per quantile.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    qmap = {repr(float(qq)): float(qq) for qq in qs}
    if len(qmap) != len(qs):
        raise ValueError("duplicate quantiles in qs")
    spark = df.sparkSession
    v = F.col("v")
    tags = spark.createDataFrame([(t,) for t in sorted(qmap)], ["__t"])
    base = (
        df.select(F.col(group_col).alias("g"), F.col(col).alias("v"))
        .where(v.isNotNull())
        .crossJoin(F.broadcast(tags))
        .persist()
    )

    def kfor(gk: object, tag: str, n: int) -> int:
        return max(1, math.ceil(qmap[tag] * n))

    try:
        rows = _group_kth_smallest_loop(spark, base, kfor, max_passes)
    finally:
        base.unpersist()
    return sorted(
        (gk, qmap[t], val, kk, n) for gk, t, val, kk, n in rows
    )


def quantiles(
    df: DataFrame, col: str, qs: list[float], *, max_passes: int = 12
) -> dict[float, tuple[float, int, int]]:
    """Several exact quantiles of one ungrouped column in ONE loop —
    the single-group face of group_quantiles.  Returns
    {q: (value, k, n)}."""
    rows = group_quantiles(
        df.select(F.lit("").alias("__g"), F.col(col)),
        col,
        "__g",
        qs,
        max_passes=max_passes,
    )
    return {qq: (val, kk, n) for _g, qq, val, kk, n in rows}


def _group_kth_smallest_loop(spark, base, kfor, max_passes):
    """Driver-iterative selection loop over a PERSISTED (g, __t, v)
    base — split out so callers can release the persist in a finally
    regardless of which validation path raises.  `kfor(g, tag, n)`
    resolves each (group, tag) pair's target rank; single-statistic
    callers pass one "" tag, group_quantiles passes one tag per
    quantile.  Returns [(g, t, value, k, n)]."""
    v, g, t = F.col("v"), F.col("g"), F.col("__t")
    first = (
        base.groupBy("g", "__t")
        .agg(
            F.count(v).alias("n"),
            F.min(v).alias("lo"),
            F.max(v).alias("hi"),
            F.approx_count_distinct(v).alias("nd"),
            F.sum(
                F.when(
                    F.isnan(v) | (v == float("inf")) | (v == float("-inf")),
                    1,
                ).otherwise(0)
            ).alias("bad"),
        )
        .collect()
    )
    if not first:
        raise ValueError("group_kth_smallest on an empty relation")
    if any(r.g is None for r in first):
        # ADVICE r12: a NULL group key can never match the walk/spec
        # equality predicates (g == lit(None) is NULL, never true), so
        # it would surface as an AssertionError deep in the loop —
        # reject it up front with an actionable message instead.
        raise ValueError(
            "group_kth_smallest: NULL group key — selection groups"
            " must be non-null (filter or coalesce the group column"
            " first)"
        )
    bad = {r.g: r.bad for r in first if r.bad}
    if bad:
        raise ValueError(f"non-finite values in groups {sorted(bad)}")

    # driver state per (group, tag)
    state = {}
    immediate = []
    for r in first:
        kg = kfor(r.g, r["__t"], r.n)
        if not 1 <= kg <= r.n:
            raise ValueError(f"k={kg} outside 1..{r.n} for group {r.g!r}")
        key = (r.g, r["__t"])
        state[key] = {
            "k": kg, "n": r.n, "rem": kg,
            "lo": float(r.lo), "hi": float(r.hi), "done": None,
        }
        if r.nd <= _WALK_MAX:
            immediate.append(key)

    def finish_by_walk(frame, keys):
        """Resolve `keys` by walking their per-distinct-value counts
        — must run while `frame` still CONTAINS their rows (a later
        pass's inner spec-join would drop resolved/stagnant groups)."""
        if not keys:
            return
        # ONE flat membership test instead of an OR-chain of
        # per-key conjunctions (ADVICE r12: many groups × quantiles
        # built a very deep Catalyst tree).  Group keys are non-null
        # (validated on the first-stats rows above), so struct
        # equality here is exact; >10 foldable literals fold to an
        # InSet hash lookup.  Each literal struct is cast to the
        # frame's own (g, __t) struct type so field types match
        # exactly (the values came from collecting that very column,
        # so the cast is always lossless).
        key_t = frame.select(
            F.struct(g.alias("g"), t.alias("__t"))
        ).schema[0].dataType
        cond = F.struct(g.alias("g"), t.alias("__t")).isin(
            [
                F.struct(
                    F.lit(gk).alias("g"), F.lit(tk).alias("__t")
                ).cast(key_t)
                for gk, tk in keys
            ]
        )
        per = {}
        for r in (
            frame.where(cond).groupBy("g", "__t", "v").count()
        ).collect():
            per.setdefault((r.g, r["__t"]), []).append((r.v, r["count"]))
        for key in keys:
            s = state[key]
            cum = 0
            for val, c in sorted(per.get(key, [])):
                cum += c
                if cum >= s["rem"]:
                    s["done"] = float(val)
                    break
            if s["done"] is None:  # pragma: no cover
                raise AssertionError(
                    "group selection invariant violated"
                )

    # (group, tag) pairs whose whole value set is already walkable
    # resolve NOW — zero histogram passes (the lag/price columns with
    # a few thousand distinct doubles end here after ONE first-stats
    # job).
    finish_by_walk(base, immediate)

    cur = base
    for _ in range(max_passes):
        live = {key: s for key, s in state.items() if s["done"] is None}
        for key, s in list(live.items()):
            if s["lo"] == s["hi"]:
                s["done"] = s["lo"]
                del live[key]
        # Groups whose interval can no longer split (zero/non-finite
        # width) are finished NOW, while cur still holds their rows.
        spec_rows, stagnant = [], []
        for key, s in live.items():
            width = (s["hi"] - s["lo"]) / _BINS
            if width == 0 or not math.isfinite(width):
                stagnant.append(key)
            else:
                spec_rows.append((key[0], key[1], s["lo"], width))
        finish_by_walk(cur, stagnant)
        if not spec_rows:
            break
        spec = spark.createDataFrame(
            spec_rows, ["g", "__t", "__lo", "__width"]
        )
        cur = cur.join(F.broadcast(spec), ["g", "__t"]).select(
            "g", "__t", "v", "__lo", "__width"
        )
        b = F.least(
            F.lit(_BINS - 1),
            F.greatest(
                F.lit(0),
                F.floor((v - F.col("__lo")) / F.col("__width")).cast("int"),
            ),
        )
        # ONE job per pass: per-(group, tag, bin) count AND measured
        # value range — the chosen bin's min/max are the group's next
        # bounds, so no separate survivors scan is needed — plus the
        # bin's approximate distinct count for the early walk.
        stats = {}
        for r in (
            cur.groupBy("g", "__t", b.alias("b"))
            .agg(
                F.count(v).alias("count"),
                F.min(v).alias("lo"),
                F.max(v).alias("hi"),
                F.approx_count_distinct(v).alias("nd"),
            )
            .collect()
        ):
            stats.setdefault((r.g, r["__t"]), {})[r.b] = (
                r["count"], float(r.lo), float(r.hi), r.nd
            )
        chosen_rows, walkable = [], []
        for gk, tk, _lo, _w in spec_rows:
            key = (gk, tk)
            s = state[key]
            cum, chosen = 0, _BINS - 1
            for i in range(_BINS):
                c = stats.get(key, {}).get(i, (0,))[0]
                if cum + c >= s["rem"]:
                    chosen = i
                    s["rem"] -= cum
                    break
                cum += c
            chosen_rows.append((gk, tk, chosen))
            picked = stats[key][chosen]
            new = picked[1:3]
            # float stagnation OR few distinct survivors: walk now
            if new == (s["lo"], s["hi"]) or picked[3] <= _WALK_MAX:
                walkable.append(key)
            s["lo"], s["hi"] = new
        ch = spark.createDataFrame(
            chosen_rows, ["g", "__t", "__chosen"]
        )
        cur = (
            cur.join(F.broadcast(ch), ["g", "__t"])
            .where(b == F.col("__chosen"))
            .select("g", "__t", "v")
        )
        # Stagnated/walkable groups finish NOW (their rows are still
        # in cur; the next pass's spec-join would drop them).
        finish_by_walk(cur, walkable)

    # max_passes exhausted (or every group left the spec): finish the
    # rest — all still present in cur, since they were in its last spec.
    finish_by_walk(
        cur, [key for key, s in state.items() if s["done"] is None]
    )
    return sorted(
        (key[0], key[1], s["done"], s["k"], s["n"])
        for key, s in state.items()
    )


def group_median_mad(
    df: DataFrame,
    col: str,
    group_col: str,
    *,
    max_passes: int = 12,
) -> list[tuple]:
    """Exact per-group robust location/scale — (lower) median and MAD
    (median absolute deviation) — by composing two `group_kth_smallest`
    passes.  Median and MAD have a 50% breakdown point where
    mean/stddev have 0%: a single corrupt shard can move the mean
    arbitrarily but cannot move these, which is why robust z-scores
    (|v − med| > c·MAD) are the outlier rule for dirty corpora.

    Pass 1 selects each group's median; the deviations |v − med| are a
    derived column (med broadcast back, double IEEE arithmetic that an
    oracle can replay exactly); pass 2 selects the median deviation.
    Everything inherits the selection operator's scale shape — one
    histogram aggregation per pass, driver state O(#groups), no
    per-group sort anywhere.

    Returns [(group, median, mad, n)] sorted by group.
    """
    spark = df.sparkSession
    med = group_kth_smallest(
        df, col, group_col, max_passes=max_passes
    )
    med_df = spark.createDataFrame(
        [(gk, v) for gk, v, _, _ in med], ["g", "__med"]
    )
    dev = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(col).cast("double").alias("v"),
        )
        .where(F.col("v").isNotNull())
        .join(F.broadcast(med_df), "g")
        .select("g", F.abs(F.col("v") - F.col("__med")).alias("adev"))
    )
    mad = group_kth_smallest(dev, "adev", "g", max_passes=max_passes)
    n_by_g = {gk: n for gk, _, _, n in med}
    med_by_g = {gk: v for gk, v, _, _ in med}
    return sorted(
        (gk, med_by_g[gk], v, n_by_g[gk]) for gk, v, _, n in mad
    )


def weighted_kth_smallest(
    df: DataFrame,
    col: str,
    weight_col: str,
    k: int | None = None,
    *,
    max_passes: int = 12,
) -> tuple[float, int, int]:
    """Exact WEIGHTED order statistic: the smallest value v with
    Σ_{x ≤ v} w(x) ≥ k, for NON-NEGATIVE INTEGER weights (exactness
    contract: cumulative weights are exact longs — fractional weights
    would reintroduce summation-order float drift).  Default k is the
    weighted lower median, k = (W + 1) DIV 2.  Returns (value, k, W).

    Same histogram binary search as kth_smallest — ONE weighted
    histogram aggregation per pass, driver holds 1024 longs, the
    narrowing range filter pushes into parquet row-group stats — with
    F.sum(weight) in place of F.count.  Zero-weight rows carry no
    mass and are dropped up front; negative OR fractional weights
    raise — both are validated on the RAW column before the long
    cast, which would otherwise truncate 0.9 to zero mass and -0.5
    past the negative check (ADVICE r08); NULL values or weights are
    excluded.
    """
    v, w = F.col("v"), F.col("w")
    # validate on the RAW weight column, BEFORE the long cast: casting
    # first silently truncates fractional weights (0.9 -> zero mass and
    # dropped; -0.5 -> 0 and sneaks past the negative raise), breaking
    # the documented non-negative-INTEGER contract (ADVICE r08).
    raw_w = F.col(weight_col)
    base = (
        df.select(
            F.col(col).alias("v"),
            raw_w.cast("long").alias("w"),
            (
                raw_w.isNotNull()
                & (raw_w.cast("double") != raw_w.cast("long").cast("double"))
            ).alias("frac"),
            (raw_w < 0).alias("negraw"),
        )
        .where(v.isNotNull() & w.isNotNull() & ((w != 0) | F.col("frac") | F.col("negraw")))
    )
    first = base.agg(
        F.sum(F.when(~F.col("frac") & ~F.col("negraw"), w).otherwise(0)).alias("tw"),
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
        F.approx_count_distinct(v).alias("nd"),
        F.sum(
            F.when(F.col("negraw") | F.col("frac"), 1).otherwise(0)
        ).alias("neg"),
        F.sum(
            F.when(
                F.isnan(v) | (v == float("inf")) | (v == float("-inf")), 1
            ).otherwise(0)
        ).alias("bad"),
    ).first()
    if first.tw is None:
        raise ValueError("weighted_kth_smallest on an empty/zero-weight relation")
    if first.neg:
        raise ValueError(
            f"weighted_kth_smallest: {first.neg} negative or fractional"
            f" weight(s) in {weight_col!r} — the exactness contract is"
            " non-negative INTEGER weights (negative makes cumulative"
            " weight non-monotone; fractional would be silently"
            " truncated by the long cast)"
        )
    if first.bad:
        raise ValueError(
            f"weighted_kth_smallest: {first.bad} non-finite value(s) in"
            f" {col!r}; filter NaN/inf first"
        )
    total_w = int(first.tw)
    if k is None:
        k = (total_w + 1) // 2
    if not 1 <= k <= total_w:
        raise ValueError(f"k={k} outside 1..{total_w}")

    lo, hi = float(first.lo), float(first.hi)
    remaining_k = k
    cur = base
    for _ in range(max_passes):
        if first.nd <= _WALK_MAX:
            break  # few distinct values overall: walk immediately
        if lo == hi:
            return lo, k, total_w
        width = (hi - lo) / _BINS
        if width == 0 or not math.isfinite(width):
            break
        b = F.least(
            F.lit(_BINS - 1),
            F.greatest(
                F.lit(0),
                F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"),
            ),
        )
        stats = {
            r.b: (int(r["wsum"]), float(r.lo), float(r.hi), r.nd)
            for r in cur.groupBy(b.alias("b"))
            .agg(
                F.sum(w).alias("wsum"),
                F.min(v).alias("lo"),
                F.max(v).alias("hi"),
                F.approx_count_distinct(v).alias("nd"),
            )
            .collect()
        }
        cum = 0
        chosen = _BINS - 1
        for i in range(_BINS):
            c = stats.get(i, (0,))[0]
            if cum + c >= remaining_k:
                chosen = i
                remaining_k -= cum
                break
            cum += c
        cur = cur.where(b == F.lit(chosen))
        if stats[chosen][3] <= _WALK_MAX:
            break  # chosen bin holds few distinct doubles: walk now
        new_lo, new_hi = stats[chosen][1], stats[chosen][2]
        if (new_lo, new_hi) == (lo, hi):
            break
        lo, hi = new_lo, new_hi
    vals = sorted(
        cur.groupBy("v").agg(F.sum(w).alias("wsum")).collect(),
        key=lambda r: r.v,
    )
    cum = 0
    for r in vals:
        cum += int(r["wsum"])
        if cum >= remaining_k:
            return float(r.v), k, total_w
    raise AssertionError("weighted selection invariant violated")  # pragma: no cover
