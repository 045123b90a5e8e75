"""Measured watermark state eviction (round 8, VERDICT r7 item 6).

i4/i8/i12 prove VALUE correctness in complete mode over drained fixtures;
this suite proves the BOUNDED-STATE claim those docstrings make: in
append mode, once the watermark passes a window, the state store actually
REMOVES its rows (state-store `numRowsRemoved`/`numRowsTotal` metrics —
the same evidence `spark.sql.streaming.metricsEnabled` exports to
monitoring), and the closed windows are emitted exactly once. Without
eviction an infinite stream's state grows without bound — asserting the
metric makes the claim measured, not asserted.
"""

from __future__ import annotations

import datetime as dt
import os
import uuid

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, src, rows):
    spark.createDataFrame(rows, "ts timestamp, v int").coalesce(1).write.mode(
        "append"
    ).parquet(src)


def test_watermark_evicts_window_state_and_emits_once(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # phase 1: six 10-minute windows' worth of events around T0
    _write(
        spark,
        src,
        [(T0 + dt.timedelta(minutes=m), 1) for m in range(0, 60, 5)],
    )
    name = f"evict_{uuid.uuid4().hex[:8]}"
    agg = (
        spark.readStream.schema("ts timestamp, v int")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # after phase 1 every window is either LIVE STATE or already
        # closed-and-emitted (the watermark advanced to max event time −
        # 10 min within the drain) — never both, never neither
        emitted_p1 = spark.table(name).count()
        state_after_p1 = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        assert emitted_p1 + state_after_p1 == 6, (emitted_p1, state_after_p1)
        assert state_after_p1 >= 1  # the newest window cannot have closed

        # phase 2: one event far in the future advances the max event time;
        # the NEXT batch computes its watermark from it and evicts
        _write(spark, src, [(T0 + dt.timedelta(hours=10), 1)])
        q.processAllAvailable()
        _write(spark, src, [(T0 + dt.timedelta(hours=10, minutes=1), 1)])
        q.processAllAvailable()

        removed = sum(
            op["numRowsRemoved"]
            for pr in q.recentProgress
            for op in pr["stateOperators"]
        )
        final_total = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()

    # MEASURED eviction: the six phase-1 windows left the state store...
    assert removed >= 6, f"state rows removed: {removed}"
    # ...so live state is only the still-open future window(s)
    assert final_total <= 2, f"state rows still held: {final_total}"
    # ...and each closed window was emitted exactly once with full counts
    got = {
        (r.window_start, r.n) for r in spark.table(name).collect()
    }
    expect = {
        (T0 + dt.timedelta(minutes=10 * k), 2) for k in range(6)
    }
    assert got == expect


def test_dedup_within_watermark_state_is_evicted(spark, tmp_path):
    """The i5 operator's bounded-state contract, measured: seen-id state
    for dropDuplicatesWithinWatermark is REMOVED once the watermark
    passes each id's event time (plain dropDuplicates would hold every
    id forever — the review-r6 OOM hazard this operator exists to
    avoid)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(
        spark,
        src,
        [(T0 + dt.timedelta(seconds=k), k % 5) for k in range(10)],
    )
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    deduped = (
        spark.readStream.schema("ts timestamp, v int")
        .parquet(src)
        .withWatermark("ts", "1 minute")
        .dropDuplicatesWithinWatermark(["v"])
        .select("v")
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert q.lastProgress["stateOperators"][0]["numRowsTotal"] == 5
        _write(spark, src, [(T0 + dt.timedelta(hours=1), 99)])
        q.processAllAvailable()
        _write(spark, src, [(T0 + dt.timedelta(hours=1, minutes=1), 98)])
        q.processAllAvailable()
        removed = sum(
            op["numRowsRemoved"]
            for pr in q.recentProgress
            for op in pr["stateOperators"]
        )
        final_total = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()
    assert removed >= 5, f"dedup state rows removed: {removed}"
    assert final_total <= 2, f"dedup state rows still held: {final_total}"
    # every distinct id emitted exactly once despite duplicates
    vals = sorted(r.v for r in spark.table(name).collect())
    assert vals == [0, 1, 2, 3, 4, 98, 99]
