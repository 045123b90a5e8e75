"""Incremental orchestration (`dvc repro` semantics): first run executes
every stage, a clean re-run skips everything, and each invalidation class
— input edit, parameter change, deleted/modified output — re-runs exactly
the stages it should."""

from __future__ import annotations

import csv
import os
import random

import pytest

from data_lakes_tp2_student_spark.pipeline.incremental import (
    run_pipeline_incremental,
)

AA = "ACDEFGHIKLMNPQRSTVWY"


def _write_shards(root) -> None:
    rng = random.Random(7)
    rows = []
    for fam, n in {"PF1": 3, "PF2": 8, "PF3": 20}.items():
        for i in range(n):
            seq = "".join(rng.choice(AA) for _ in range(rng.randint(20, 60)))
            rows.append([seq, f"{fam}.1", f"{fam}_{i}/1-{len(seq)}", seq, fam])
    rng.shuffle(rows)
    for sub, sl in [("train", rows[:20]), ("dev", rows[20:25]), ("test", rows[25:])]:
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "data-00000"), "w", newline="") as f:
            csv.writer(f).writerows(sl)


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    shards = str(tmp_path_factory.mktemp("inc_shards"))
    wh = str(tmp_path_factory.mktemp("inc_wh"))
    _write_shards(shards)
    return shards, wh


def test_incremental_skip_and_invalidation(spark, roots):
    shards, wh = roots
    # 1. cold start: everything runs, state file lands
    out1 = run_pipeline_incremental(spark, shards, wh, max_len=64)
    assert out1 == {"unpack": "ran", "preprocess": "ran", "process": "ran"}
    assert os.path.exists(os.path.join(wh, ".pipeline_state.json"))

    # 2. nothing changed: everything skips
    out2 = run_pipeline_incremental(spark, shards, wh, max_len=64)
    assert out2 == {
        "unpack": "skipped",
        "preprocess": "skipped",
        "process": "skipped",
    }

    # 3. parameter change invalidates ONLY the tokenize stage
    out3 = run_pipeline_incremental(spark, shards, wh, max_len=32)
    assert out3 == {
        "unpack": "skipped",
        "preprocess": "skipped",
        "process": "ran",
    }
    curated = spark.read.parquet(os.path.join(wh, "curated", "pfam"))
    sizes = [r[0] for r in curated.selectExpr("size(tokens)").distinct().collect()]
    assert sizes == [32]  # the re-run actually applied the new param

    # 4. deleted output: only that stage re-runs
    import shutil

    shutil.rmtree(os.path.join(wh, "curated", "pfam"))
    out4 = run_pipeline_incremental(spark, shards, wh, max_len=32)
    assert out4 == {
        "unpack": "skipped",
        "preprocess": "skipped",
        "process": "ran",
    }

    # 5. input edit: everything downstream cascades
    with open(os.path.join(shards, "train", "data-00000"), "a", newline="") as f:
        csv.writer(f).writerow(["ACDE", "PF9.1", "PF9_0/1-4", "ACDE", "PF9"])
    out5 = run_pipeline_incremental(spark, shards, wh, max_len=32)
    assert out5 == {"unpack": "ran", "preprocess": "ran", "process": "ran"}
    raw = spark.read.parquet(os.path.join(wh, "raw", "pfam"))
    assert raw.filter("family_accession = 'PF9.1'").count() == 1

    # 6. force re-runs everything with no changes
    out6 = run_pipeline_incremental(spark, shards, wh, max_len=32, force=True)
    assert out6 == {"unpack": "ran", "preprocess": "ran", "process": "ran"}


def test_state_survives_partial_failure(spark, roots, tmp_path_factory):
    """A stage crash mid-pipeline keeps completed stages skippable on the
    next repro (per-stage atomic state writes)."""
    from unittest import mock

    from data_lakes_tp2_student_spark.pipeline import incremental, pfam

    shards = str(tmp_path_factory.mktemp("inc_shards2"))
    wh = str(tmp_path_factory.mktemp("inc_wh2"))
    _write_shards(shards)

    with mock.patch.object(
        pfam, "process_to_curated", side_effect=RuntimeError("boom")
    ):
        with pytest.raises(RuntimeError):
            run_pipeline_incremental(spark, shards, wh, max_len=64)
    # unpack + preprocess committed their state before the crash
    out = run_pipeline_incremental(spark, shards, wh, max_len=64)
    assert out == {
        "unpack": "skipped",
        "preprocess": "skipped",
        "process": "ran",
    }


def test_moving_file_between_dep_roots_invalidates(tmp_path):
    """Same bytes, same relative name, different dep root: the fingerprint
    must change — a stage whose fn treats roots differently (train/ vs
    dev/) would otherwise run on stale outputs (found in review)."""
    from data_lakes_tp2_student_spark.pipeline.incremental import (
        _paths_fingerprint,
    )

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    (a / "data.csv").write_text("x,y\n1,2\n")
    before = _paths_fingerprint([str(a), str(b)])
    (a / "data.csv").rename(b / "data.csv")
    after = _paths_fingerprint([str(a), str(b)])
    assert before != after
    # and adding an empty dep root is itself a visible change
    assert _paths_fingerprint([str(a)]) != _paths_fingerprint([str(a), str(b)])
