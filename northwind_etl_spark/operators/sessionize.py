"""Event-time operators over the events table (north-star §2b):
tumbling windows, gap-based sessionization, JSON prop extraction.

Batch forms here (the harness is batch parquet); the streaming twins —
same semantics plus watermarks — live in streaming/events_stream.py.

Sessionization is the lag→flag→cumsum idiom: both window functions
partition by user_id, so the whole computation is one shuffle on
user_id and stays there — at 100 TB sessions never cross partitions and
no global ordering is ever needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.money import decimal_sum


def tumbling_counts(
    events: DataFrame, *, duration: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Tumbling-window counts per event_type: F.window on batch data.

    Emits window_start (not the struct) so the result is flat and
    oracle-comparable with date_trunc/time_bucket SQL.
    """
    return (
        events.groupBy(F.window(F.col(ts_col), duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            decimal_sum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    *,
    duration: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window counts per event_type: each event lands in
    duration/slide overlapping windows (F.window with a slide).

    Scale shape: the window expression EXPANDS each row into its
    duration/slide windows before the hash aggregation — a constant
    fan-out absorbed by map-side combine, then one shuffle on
    (window, event_type), same as the tumbling path.  Epoch-aligned
    window starts keep the result engine-reproducible (the oracle
    generates the same k-offset spine)."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), duration, slide).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            decimal_sum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    pre_aggregate: bool = True,
) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap to
    the previous event exceeds `gap_minutes`.  Returns one row per
    session with start/end, event count, and value sum.

    Hot-key mitigation (default on): the keyed window is the one shape
    AQE cannot split — a user holding 10% of a 100 TB stream lands its
    entire history in ONE task.  ``pre_aggregate`` collapses events to
    one summary row per (user, gap-width tumbling bucket) FIRST — a
    hash aggregation with map-side combine, skew-absorbing — then runs
    the lag→flag→cumsum on bucket summaries.  Exact, not approximate:
    any two events inside one half-open gap-width bucket are < gap
    apart, so a session can only break BETWEEN buckets, where the true
    inter-event gap is precisely next.min_ts − prev.max_ts; counts and
    decimal partial sums re-aggregate associatively.  The straggler
    task's input shrinks from the hot user's event count to its
    non-empty bucket count — bounded by time-range/gap (a year of
    30-min buckets is ≤17.5 k rows) regardless of event volume.
    Equality with the direct path is pinned by tests/test_operators.py
    and the sf0.001/sf0.01 driver oracle; the skew probe table in
    PLANS.md quantifies the straggler effect both ways."""
    gap = F.expr(f"INTERVAL '{int(gap_minutes)}' MINUTE")
    if pre_aggregate:
        pre = (
            events.groupBy(
                F.col(user_col),
                F.window(F.col(ts_col), f"{int(gap_minutes)} minutes").alias("__b"),
            )
            .agg(
                F.min(ts_col).alias("__min_ts"),
                F.max(ts_col).alias("__max_ts"),
                F.count(F.lit(1)).alias("__n"),
                F.sum(F.col("value").cast("decimal(38,6)")).alias("__v"),
            )
            .drop("__b")
        )
        # bucket min_ts values are distinct per user (buckets are
        # disjoint), so no id tie-break is needed for determinism
        w = Window.partitionBy(user_col).orderBy(F.col("__min_ts"))
        flagged = pre.withColumn("__prev_max", F.lag("__max_ts").over(w)).withColumn(
            "__new_session",
            (
                F.col("__prev_max").isNull()
                | ((F.col("__min_ts") - F.col("__prev_max")) > gap)
            ).cast("int"),
        )
        cum = Window.partitionBy(user_col).orderBy(F.col("__min_ts")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        sessioned = flagged.withColumn(
            "session_id", F.sum("__new_session").over(cum).cast("int")
        )
        return sessioned.groupBy(user_col, "session_id").agg(
            F.min("__min_ts").alias("session_start"),
            F.max("__max_ts").alias("session_end"),
            F.sum("__n").alias("n_events"),
            F.round(F.sum("__v"), 2).cast("double").alias("sum_value"),
        )
    order = [F.col(ts_col), F.col(id_col)]  # id breaks same-µs ties deterministically
    w = Window.partitionBy(user_col).orderBy(*order)
    flagged = events.withColumn("__prev_ts", F.lag(ts_col).over(w)).withColumn(
        "__new_session",
        (
            F.col("__prev_ts").isNull()
            | ((F.col(ts_col) - F.col("__prev_ts")) > gap)
        ).cast("int"),
    )
    cum = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessioned = flagged.withColumn("session_id", F.sum("__new_session").over(cum).cast("int"))
    return (
        sessioned.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            decimal_sum("value", "sum_value"),
        )
    )


def extract_props(events: DataFrame, *, props_col: str = "props") -> DataFrame:
    """JSON prop extraction: from_json with an explicit schema (never
    schema_of_json at scale — one pass, no sampling)."""
    parsed = F.from_json(F.col(props_col), "k INT")
    return events.withColumn("prop_k", parsed["k"])


def event_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: (from_type, to_type, cnt, prob).

    One keyed lead() window (total order: ts then id — deterministic
    under ties) and two map-side-combined aggregations; row-normalized
    probabilities come from a broadcast join on the tiny per-from_type
    totals, never a second window.  The per-key window state is one
    row (lead 1), so there is no hot-key timeline concern.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    seq = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.groupBy("from_type").agg(F.sum("cnt").alias("__tot"))
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "cnt",
        F.round(F.col("cnt") / F.col("__tot"), 6).alias("prob"),
    )
