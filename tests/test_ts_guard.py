"""The UTC-adjustment guard (ADVICE r2): a testdata generation shipping
TIMESTAMP(isAdjustedToUTC=true) for events.ts must fail loudly instead of
silently diverging from the naive-UTC DuckDB oracle."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_lakes_tp2_student_spark.registry import (
    assert_ts_not_utc_adjusted,
    load,
)


def _write_events(tmp_path, tz):
    ts = pd.to_datetime(["2021-01-01 10:00:00"])
    if tz:
        ts = ts.tz_localize(tz)
    tbl = pa.table(
        {
            "event_id": [1],
            "ts": pa.array(ts),
            "user_id": [1],
            "event_type": ["view"],
            "value": [1.0],
            "props": ["{}"],
        }
    )
    path = os.path.join(str(tmp_path), "events.parquet")
    pq.write_table(tbl, path)
    return str(tmp_path)


def test_naive_timestamps_pass(tmp_path, spark):
    d = _write_events(tmp_path, tz=None)
    assert load(spark, d, "events").count() == 1


def test_utc_adjusted_trips_guard(tmp_path, spark):
    d = _write_events(tmp_path, tz="UTC")
    with pytest.raises(AssertionError, match="UTC-adjusted"):
        load(spark, d, "events")


def test_guard_ignores_missing_file(tmp_path):
    assert_ts_not_utc_adjusted(os.path.join(str(tmp_path), "nope.parquet"))


def test_cached_read_never_memoizes_directories(spark, tmp_path):
    """ADVICE r7: os.stat() succeeds on a directory, but a dir's
    size/mtime does not change when a part-file is rewritten in place —
    memoizing a directory dataset's schema could serve a stale schema.
    Directory paths must bypass the cache entirely."""
    from data_lakes_tp2_student_spark import registry

    d = str(tmp_path / "dir_dataset")
    spark.createDataFrame([(1,)], "a int").write.parquet(d)
    before = set(registry._SCHEMA_CACHE)
    assert registry._cached_read(spark, d).collect()[0].a == 1
    assert set(registry._SCHEMA_CACHE) == before  # no dir-keyed memo
    # and the rewrite-in-place hazard really is absent: a new schema at
    # the same directory path reads back with the NEW schema
    spark.createDataFrame([("x", 2)], "b string, a int").write.mode(
        "overwrite"
    ).parquet(d)
    assert set(registry._cached_read(spark, d).columns) == {"a", "b"}
