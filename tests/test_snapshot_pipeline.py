"""The flagship pfam pipeline through snapshot-committed zones
(io/zones.py:SnapshotWarehouse): same results as the plain warehouse,
plus the ACID properties — a re-run bumps every zone table's version and
the previous run's outputs stay time-travelable."""

from __future__ import annotations

import csv
import os
import random

import pytest

from data_lakes_tp2_student_spark.io.zones import SnapshotWarehouse, Warehouse
from data_lakes_tp2_student_spark.pipeline.pfam import run_pipeline

AA = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture(scope="module")
def shard_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("snap_shards")
    rng = random.Random(23)
    rows = []
    for fam, n in {"PF1": 3, "PF2": 8, "PF3": 40}.items():
        for i in range(n):
            seq = "".join(rng.choice(AA) for _ in range(rng.randint(20, 60)))
            rows.append([seq, f"{fam}.1", f"{fam}_{i}/1-{len(seq)}", seq, fam])
    rng.shuffle(rows)
    for sub, sl in [("train", rows[:35]), ("dev", rows[35:43]), ("test", rows[43:])]:
        d = root / sub
        os.makedirs(d, exist_ok=True)
        with open(d / "data-00000", "w", newline="") as f:
            csv.writer(f).writerows(sl)
    return str(root)


def test_snapshot_pipeline_matches_plain_and_time_travels(
    spark, shard_root, tmp_path_factory
):
    plain_root = str(tmp_path_factory.mktemp("wh_plain"))
    snap_root = str(tmp_path_factory.mktemp("wh_snap"))
    plain = run_pipeline(spark, shard_root, plain_root, max_len=32)
    swh = SnapshotWarehouse(snap_root)
    snap = run_pipeline(spark, shard_root, snap_root, max_len=32, wh=swh)

    # identical results through the committed zones
    for key in ("staged", "curated"):
        a = sorted(map(tuple, plain[key].collect()))
        b = sorted(map(tuple, snap[key].collect()))
        assert a == b, key

    # every zone table sits at version 0 after the first run
    for zone, table in [("raw", "pfam"), ("staging", "pfam"), ("curated", "pfam")]:
        assert swh.table(zone, table).latest_version() == 0

    v0_staged = snap["staged"].count()

    # re-run = new version per table; previous run still readable
    run_pipeline(spark, shard_root, snap_root, max_len=32, wh=swh)
    t = swh.table("staging", "pfam")
    assert t.latest_version() == 1
    assert t.read(spark, version=0).count() == v0_staged
    assert t.read(spark).count() == v0_staged  # same input → same rows

    # the staging table keeps its split partitioning through the commit
    assert t.manifest(1)["partition_by"] == ["split"]
