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


def sessionize(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap to
    the previous event exceeds `gap_minutes`.  Returns one row per
    session with start/end, event count, and value sum."""
    order = [F.col(ts_col), F.col(id_col)]  # id breaks same-µs ties deterministically
    w = Window.partitionBy(user_col).orderBy(*order)
    gap = F.expr(f"INTERVAL '{int(gap_minutes)}' MINUTE")
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
