"""As-of join (backward): for each left row, the most recent right row
with right_time <= left_time, per key — the "latest prior state" lookup
(last-touch attribution, slowly-changing-dimension versioning, price
as-of trade time) that plain equi-joins can't express.

The reference engine has no as-of operator; this is north-star custom-
operator territory ("e.g., as-of join") implemented as a composition of
built-in DataFrame ops — no UDFs, no range join:

    union(left, right) → one window pass per key → filter left rows

Why union+window instead of a range join: Spark executes a non-equi
time condition as a broadcast-nested-loop or a sort-merge with
per-row rescans, both of which degrade badly when either side is
large.  The union shape is ONE hash shuffle on the key followed by a
per-key sort — exactly the cost of a groupBy over the same data — and
every executor handles its keys independently, so it scales to 100 TB
the same way any keyed aggregation does.  (Skew caveat: all rows of
one key land in one task, inherent to per-key ordering; a hot key is
bounded by the same AQE skew handling as any window, and in practice
the key is a user/entity id with millions of distinct values.)

Right-side payload columns ride along packed in ONE struct filled via
last(ignorenulls) — packing matters for correctness: a legitimately
NULL payload FIELD must not make the fill skip back to an older right
row, and a whole-row struct is non-null whenever a right row exists.

Tie semantics: inclusive (right_time == left_time matches), matching
DuckDB's `ASOF JOIN ... ON l.t >= r.t` — rights sort before lefts at
equal timestamps.  Callers that need deterministic output when the
right side has duplicate (key, time) rows should pre-dedup to one row
per (key, time) (see plans/queries.py::asof_last_touch).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
    how: str = "left",
    direction: str = "backward",
    chunk_seconds: int | None = None,
) -> DataFrame:
    """As-of join, backward (default) or forward.

    Backward: all left columns plus `right_cols` taken from the most
    recent right row (right_time <= left_time) sharing the `on` keys.
    Forward (`direction="forward"`): from the NEXT right row
    (right_time >= left_time) — "earliest subsequent state" (next
    shipment after an order, next price tick after a quote).  Both
    inclusive at equal timestamps, matching DuckDB's `ASOF JOIN` with
    `>=` / `<=` respectively; the forward pass is the same one-shuffle
    union+window shape with the time sort reversed.  NULLs when no
    matching right row exists (how='left') or the left row dropped
    (how='inner').

    `chunk_seconds` turns on the EXACT hot-key mitigation (the
    chunked-timeline-with-boundary-stitching design from the r05 skew
    probe): the timeline is cut into coarse buckets and the one
    per-key window becomes
      (a) a per-(key, bucket) AGGREGATION of each bucket's latest
          right row — map-side combined, so a hot key costs partial
          aggregation, not a single-task sort;
      (b) a carry-in LOCF across buckets per key — a window whose
          partition size is #active buckets (time-range/chunk, i.e.
          INDEPENDENT of event volume); and
      (c) the original window partitioned by (key, bucket), seeded
          with the carry-in — the hot key's history is now split
          across time chunks instead of serialized in one task.
    Result-identical to the direct pass (equality-pinned in tests,
    including ties, null left times, and forward direction); choose
    chunk_seconds so a hot key's densest chunk fits one task
    comfortably (e.g. 1 day for user event streams).  One documented
    divergence: a NULL-time RIGHT row — which the direct pass sorts
    before everything, letting it fill real lefts — stays confined to
    the NULL chunk here and only meets NULL-time lefts.  Null-time
    state rows are data errors in every as-of use case; filter them
    out first if you have them.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be 'backward' or 'forward', got {direction!r}"
        )
    on = list(on)
    right_cols = [c for c in right_cols if c not in on]
    l_payload = [c for c in left.columns if c not in on and c != left_time]
    # the union/window pass reserves scratch names; an input column with
    # one of them would be silently shadowed — refuse instead of corrupt
    reserved = {"__t", "__is_l", "__r", "__m", "__tl", "__b", "__bl", "__carry"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join: reserved column names in input: {sorted(clash)}")
    dup = set(right_cols) & (set(l_payload) | {left_time})
    if dup:
        raise ValueError(
            f"asof_join: right_cols collide with left output columns {sorted(dup)};"
            " rename one side before joining"
        )

    lu = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_l"),
        *[F.col(c) for c in l_payload],
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols
            ) + ">"
        ).alias("__r"),
    )
    ru = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_l"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload],
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    # rights (0) before lefts (1) at equal __t ⇒ inclusive match;
    # NULL left times sort FIRST in both directions (desc_nulls_first
    # on the forward pass) and therefore match nothing.  forward =
    # identical pass over time reversed: the running last(ignorenulls)
    # then carries the NEXT right row backward.
    t_order = (
        F.col("__t").asc()
        if direction == "backward"
        else F.col("__t").desc_nulls_first()
    )
    union = lu.unionByName(ru)
    if chunk_seconds is None:
        w = (
            Window.partitionBy(*on)
            .orderBy(t_order, F.col("__is_l").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = union.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    else:
        filled = _chunked_fill(union, on, direction, chunk_seconds)
    out = filled.where(F.col("__is_l") == 1).select(
        *on,
        F.col("__t").alias(left_time),
        *[F.col(c) for c in l_payload],
        *[F.col("__m")[c].alias(c) for c in right_cols],
    )
    if how == "inner":
        out = out.where(F.col("__m").isNotNull())
    return out.drop("__m")


def _chunked_fill(
    union: DataFrame, on: list[str], direction: str, chunk_seconds: int
) -> DataFrame:
    """The hot-key-proof fill: per-(key, chunk) windows seeded with a
    cross-chunk carry-in.  Works on a monotone long time axis `__tl`
    (negated micros for the forward direction, so one backward code
    path serves both); NULL-time rows keep their own NULL chunk with
    no carry-in, reproducing the direct pass's nulls-first semantics
    (a NULL-time left can only see NULL-time rights).
    """
    micros = F.unix_micros(F.col("__t").cast("timestamp"))
    tl = micros if direction == "backward" else -micros
    chunk_us = int(chunk_seconds) * 1_000_000
    u = union.withColumn("__tl", tl).withColumn(
        "__b", F.floor(F.col("__tl") / F.lit(chunk_us))
    )
    # (a) each chunk's latest right row — an AGGREGATION (partial,
    # map-side combined), not a window: hot keys don't serialize here
    bl = (
        u.where(F.col("__b").isNotNull())
        .groupBy(*on, "__b")
        .agg(
            F.max_by(
                "__r", F.when(F.col("__is_l") == 0, F.col("__tl"))
            ).alias("__bl")
        )
    )
    # (b) carry-in: latest right from STRICTLY EARLIER chunks — LOCF
    # over the per-key chunk spine (#chunks rows per key, volume-free)
    wb = (
        Window.partitionBy(*on)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = bl.withColumn("__carry", F.last("__bl", ignorenulls=True).over(wb))
    # (c) the original ordered fill, now per (key, chunk), seeded with
    # the carry-in; the join and the window share (key, chunk)
    # partitioning so the exchange is reused
    u2 = u.join(carry.select(*on, "__b", "__carry"), [*on, "__b"], "left")
    w2 = (
        Window.partitionBy(*on, "__b")
        .orderBy(F.col("__tl").asc(), F.col("__is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return u2.withColumn(
        "__m",
        F.coalesce(F.last("__r", ignorenulls=True).over(w2), F.col("__carry")),
    ).drop("__tl", "__b", "__carry")
