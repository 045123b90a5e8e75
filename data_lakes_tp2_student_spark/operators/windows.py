"""Event-time windowing operators (SURVEY.md §2 i1-i3, batch form).

Absent from the reference (batch pandas only); required extension surface
over the `events` table. Batch `F.window`/`F.session_window` share semantics
with Structured Streaming (streaming/ wraps these same aggregations), so the
operators are written once and reused on both paths.

Scale notes: tumbling/sliding windows are plain hash aggregations on
(window, keys) — partial aggregation applies; sliding with k overlapping
windows replicates each row k times at the aggregation input (here k=2).
Session windows hash-partition by user and sort within partition — the same
plan a 1000-executor cluster wants (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.money import dec2


def tumbling_window_agg(
    df: DataFrame, ts_col: str, keys: list[str], duration: str = "10 minutes"
) -> DataFrame:
    """i1 — fixed tumbling windows; epoch-aligned starts (matches DuckDB
    time_bucket alignment)."""
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("value")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "n", "sum_value")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    keys: list[str],
    duration: str = "10 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """i2 — overlapping sliding windows (each event lands in
    duration/slide windows)."""
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("value")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "n", "sum_value")
    )


def session_window_agg(
    df: DataFrame, ts_col: str, key: str, gap: str = "5 minutes"
) -> DataFrame:
    """i3 — session windows per key: sessions close after `gap` of silence;
    window end = last event + gap (Spark semantics, [start, end))."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
        )
    )
