"""Streaming CDC apply (streaming/jobs.py:stream_cdc_merge, round 8).

The contract: each micro-batch of a U/D/I change feed lands as one atomic
clause-level MERGE commit on the manifest table; redelivery of the whole
feed converges to the same table state (at-least-once -> effectively-once
with deterministic images); a checkpointed resume processes only new
files; an intra-batch key conflict aborts rather than applying changes in
arbitrary order.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_lakes_tp2_student_spark.io.manifest import ManifestTable
from data_lakes_tp2_student_spark.streaming.jobs import stream_cdc_merge

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.StringType()),
        T.StructField("day", T.StringType()),
        T.StructField("op", T.StringType()),
    ]
)


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")],
        "id int, v string, day string",
    )


def _write_batch(spark, stage, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(stage)


def rows(df):
    return sorted((r.id, r.v, r.day) for r in df.collect())


def test_cdc_apply_and_atomic_batches(spark, tmp_path):
    """Three producer files -> three micro-batches -> three MERGE commits;
    the final state reflects every op exactly once and each batch is one
    version in history."""
    tab = ManifestTable(str(tmp_path / "tab"))
    tab.commit_overwrite(_base(spark))
    stage = str(tmp_path / "cdc")
    _write_batch(spark, stage, [(1, "A!", "d1", "U")])
    _write_batch(spark, stage, [(2, None, None, "D")])
    _write_batch(spark, stage, [(9, "new", "d9", "I")])
    seen = []
    stream_cdc_merge(
        spark, tab, stage, SCHEMA, "id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        on_batch=lambda b, i: seen.append(i),
    )
    assert rows(tab.read(spark)) == [(1, "A!", "d1"), (3, "c", "d2"), (9, "new", "d9")]
    assert len(seen) == 3  # one micro-batch per producer file
    # each applied batch committed atomically as its own version
    assert tab.latest_version() == 3


def test_cdc_redelivery_converges(spark, tmp_path):
    """The at-least-once story: replaying the ENTIRE feed from scratch
    (fresh checkpoint, same table) leaves the table state identical —
    a replayed U rewrites the same image, a replayed D matches nothing,
    a replayed I arrives matched and fires no clause."""
    tab = ManifestTable(str(tmp_path / "tab"))
    tab.commit_overwrite(_base(spark))
    stage = str(tmp_path / "cdc")
    _write_batch(spark, stage, [(1, "A!", "d1", "U"), (9, "new", "d9", "I")])
    _write_batch(spark, stage, [(3, None, None, "D")])
    stream_cdc_merge(
        spark, tab, stage, SCHEMA, "id", checkpoint_dir=str(tmp_path / "c1")
    )
    first = rows(tab.read(spark))
    assert first == [(1, "A!", "d1"), (2, "b", "d1"), (9, "new", "d9")]
    # full redelivery: fresh checkpoint -> the source replays every file
    stream_cdc_merge(
        spark, tab, stage, SCHEMA, "id", checkpoint_dir=str(tmp_path / "c2")
    )
    assert rows(tab.read(spark)) == first


def test_cdc_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    tab = ManifestTable(str(tmp_path / "tab"))
    tab.commit_overwrite(_base(spark))
    stage = str(tmp_path / "cdc")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, stage, [(1, "A!", "d1", "U")])
    stream_cdc_merge(spark, tab, stage, SCHEMA, "id", checkpoint_dir=ckpt)
    v_after_first = tab.latest_version()
    _write_batch(spark, stage, [(2, None, None, "D")])
    counted = []
    stream_cdc_merge(
        spark, tab, stage, SCHEMA, "id",
        checkpoint_dir=ckpt,
        on_batch=lambda b, i: counted.append(b.count()),
    )
    assert counted == [1]  # ONLY the new file, not a replay of the first
    assert tab.latest_version() == v_after_first + 1
    assert rows(tab.read(spark)) == [(1, "A!", "d1"), (3, "c", "d2")]


def test_cdc_intra_batch_key_conflict_aborts(spark, tmp_path):
    """Two modifying changes for one key in ONE batch: the merge's
    cardinality gate aborts the stream instead of picking an arbitrary
    winner — the CDC-compaction precondition made loud."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    tab = ManifestTable(str(tmp_path / "tab"))
    tab.commit_overwrite(_base(spark))
    stage = str(tmp_path / "cdc")
    _write_batch(
        spark, stage, [(1, "x", "d1", "U"), (1, None, None, "D")]
    )
    with pytest.raises(StreamingQueryException, match="[Mm]ultiple source rows|MergeCardinality"):
        stream_cdc_merge(spark, tab, stage, SCHEMA, "id")
    # the abort left the table at its pre-stream state
    assert rows(tab.read(spark)) == [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")]


def test_cdc_requires_op_column(spark, tmp_path):
    tab = ManifestTable(str(tmp_path / "tab"))
    tab.commit_overwrite(_base(spark))
    no_op = T.StructType([T.StructField("id", T.IntegerType())])
    with pytest.raises(ValueError, match="op"):
        stream_cdc_merge(spark, tab, str(tmp_path / "x"), no_op, "id")
