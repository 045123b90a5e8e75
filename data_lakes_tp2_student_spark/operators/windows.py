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

from pyspark.sql import DataFrame, Window, functions as F

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
            F.sum(dec2("value")).cast("double").alias("sum_value"),
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
            F.sum(dec2("value")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "n", "sum_value")
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    key: str,
    tiebreak: str,
    gap_seconds: int = 300,
) -> DataFrame:
    """e3 — explicit gap-based sessionization (the window-function dual of
    `session_window_agg`, exposing a stable 0-based session id per key):
    break where the gap to the previous event exceeds `gap_seconds`, then a
    running sum of breaks numbers the sessions. Two window functions over
    ONE hash partitioning by key — a single exchange, no global sort; skew
    is bounded by the hottest key. Gap compare is in exact microseconds
    (`unix_micros`), portable to the oracle's interval compare."""
    order = [F.col(ts_col), F.col(tiebreak)]
    w = Window.partitionBy(key).orderBy(*order)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(ts_col).over(w)
    )
    brk = F.when(gap_us > gap_seconds * 1_000_000, 1).otherwise(0)
    run = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.withColumn("_brk", brk)
        .withColumn("session_id", F.sum("_brk").over(run))
        .groupBy(key, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
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


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_us: str,
    right_us: str,
    tolerance_us: int,
) -> DataFrame:
    """c6 scale path — big-to-big interval join (|t_l − t_r| ≤ tolerance)
    as an EQUI-join on coarse time bands: the right side keeps its own band,
    the left side explodes over the ≤3 bands its tolerance window can touch,
    band-equality prunes candidates, and the exact predicate refines.

    This is how a range join survives when NEITHER side broadcasts: a
    broadcast-nested-loop is O(|L|·|R|) and undistributable; banding makes
    cost ∝ matches + band occupancy, shuffled by band (time-uniform data →
    uniform partitions). A (l, r) pair can meet in only r's band, so no
    dedup stage is needed. Timestamps are compared in exact integer
    microseconds — no float, engine-portable."""
    w = int(tolerance_us)
    lb = left.withColumn(
        "_band",
        F.explode(
            F.sequence(
                F.expr(f"({left_us} - {w}) div {w}"),
                F.expr(f"({left_us} + {w}) div {w}"),
            )
        ),
    )
    rb = right.withColumn("_band", F.expr(f"{right_us} div {w}"))
    return (
        lb.join(rb, "_band")
        .filter(F.abs(F.col(left_us) - F.col(right_us)) <= w)
        .drop("_band")
    )
