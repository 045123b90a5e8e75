"""Cross-PROCESS races over the round-14 DV machinery (VERDICT r14
item 5): `_merge_stacked_dvs` and `reorg` commit through the same
conditional-put loop as every other writer, but had no multi-process
race coverage — and the merge READS prior DV parquets whose entries a
racing process may supersede mid-derivation. These tests spawn real OS
processes (tests/race_worker.py, modes `dv_delete` /
`dv_staged_commit`) against ONE table on BOTH backends and pin:

- two processes repeatedly DV-deleting the SAME file serialize
  correctly: every delete lands, the log is gap-free, and the
  commit-time merge keeps dv depth EXACTLY 1 on the shared file no
  matter how the merges interleave (each retry re-derives from the new
  snapshot, folding the racer's freshly committed DV);
- a DV delete staged against a snapshot that a reorg then purges aborts
  LOUDLY (ConcurrentWriteConflict — never a silent resurrect of
  materialized deletes), and the abort leaves no staged orphan dirs
  (ADVICE r14 cleanup, exercised cross-process);
- a reorg whose snapshot a DV delete overtakes aborts loudly too, and a
  re-driven reorg then purges BOTH deletes' positions.

The table fixture stages one 64-row file where row position == id, so
positional DV assertions read directly as id assertions.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from data_lakes_tp2_student_spark.io.manifest import (
    ConcurrentWriteConflict,
    ManifestTable,
)

from .test_manifest import moto_endpoint  # noqa: F401

WORKER = os.path.join(os.path.dirname(__file__), "race_worker.py")
N = 64


@pytest.fixture(params=["local", "s3"])
def race_cfg(request, tmp_path):
    if request.param == "local":
        root = str(tmp_path / "tab")
        return ManifestTable(root), {"backend": "local", "root": root}
    import uuid as _uuid

    from data_lakes_tp2_student_spark.io.logstore import S3LogStore

    endpoint = request.getfixturevalue("moto_endpoint")
    prefix = f"dvrace-{_uuid.uuid4().hex[:10]}"
    store = S3LogStore(
        "lake", prefix, endpoint=endpoint, cache_dir=str(tmp_path / "cache0")
    )
    try:
        store.client.create_bucket(Bucket="lake")
    except store.client.exceptions.ClientError:
        pass
    tab = ManifestTable(f"s3://lake/{prefix}", log_store=store)
    return tab, {
        "backend": "s3",
        "bucket": "lake",
        "prefix": prefix,
        "endpoint": endpoint,
    }


@pytest.fixture()
def dv_tab(spark, race_cfg):
    """One 64-row single-file table (pos == id) already carrying a DV
    (id=60 deleted merge-on-read), so every racing commit exercises the
    MERGE path — reading prior DV parquets — from its first attempt."""
    tab, base_cfg = race_cfg
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(N)], "id long, v string"
    ).coalesce(1)
    tab.commit_overwrite(df)
    assert len(tab.manifest(tab.latest_version())["files"]) == 1
    tab.delete_where(spark, "id = 60", mode="dv")
    return tab, base_cfg


def _ids(tab, spark):
    return sorted(r.id for r in tab.read(spark).collect())


def _dv_depths(tab):
    m = tab.manifest(tab.latest_version())
    return [len(e.get("dv") or ()) for e in m["files"]]


def test_multiprocess_dv_delete_race_serializes(dv_tab, spark, tmp_path):
    tab, base_cfg = dv_tab
    go = str(tmp_path / "go")
    sets = {
        1: [[0, 1], [2, 3], [4, 5]],
        2: [[10, 11], [12, 13], [14, 15]],
    }
    cfgs = []
    for w, position_sets in sets.items():
        c = dict(
            base_cfg, mode="dv_delete", barrier=go,
            position_sets=position_sets,
        )
        if base_cfg["backend"] == "s3":
            c["cache_dir"] = str(tmp_path / f"cache{w}")
        cfgs.append(c)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, json.dumps(c)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for c in cfgs
    ]
    open(go, "w").close()  # both workers derive + commit concurrently
    results = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        results.append(json.loads(out.strip().splitlines()[-1]))

    # exactly-one-winner per version, gap-free log: 2 base commits
    # (overwrite + seed DV) + 6 racing DV commits
    claimed = [v for r in results for v in r["versions"]]
    assert len(claimed) == len(set(claimed)) == 6
    assert tab.versions() == list(range(8))
    # serialized correctness: EVERY worker's every delete applied
    deleted = {60} | {p for s in sets.values() for ps in s for p in ps}
    assert _ids(tab, spark) == [i for i in range(N) if i not in deleted]
    # the depth-1 invariant survived every interleaving of the merges
    assert _dv_depths(tab) == [1]
    # the losers' retries re-derived rather than clobbered: each retry's
    # merge folded the racer's committed DV, so the FINAL merged DV
    # alone reproduces the whole delete set (reorg proves it: purge
    # everything, read again)
    tab.reorg(spark)
    assert set(_dv_depths(tab)) <= {0}  # every DV materialized away
    assert _ids(tab, spark) == [i for i in range(N) if i not in deleted]


def test_reorg_aborts_staged_dv_commit_no_orphans(dv_tab, spark, tmp_path):
    """DV delete staged first, reorg lands first → the held DV commit
    must abort loudly (its positions were derived against a file the
    reorg REWROTE — rebasing would mark wrong rows of a dead file) and
    clean its staged dirs."""
    tab, base_cfg = dv_tab
    barrier = str(tmp_path / "commit_now")
    c = dict(base_cfg, mode="dv_staged_commit", barrier=barrier, positions=[5])
    if base_cfg["backend"] == "s3":
        c["cache_dir"] = str(tmp_path / "cache_w")
    dirs_before = set(tab.store.list_txn_dirs())
    p = subprocess.Popen(
        [sys.executable, WORKER, json.dumps(c)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        marker = json.loads(p.stdout.readline())
        assert marker["staged"]
        staged = set(tab.store.list_txn_dirs()) - dirs_before
        assert staged  # the worker really staged a (merged) DV dir
        v_reorg = tab.reorg(spark)  # purges id=60's DV, rewrites the file
        open(barrier, "w").close()
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, err[-2000:]
    finally:
        if p.poll() is None:
            p.kill()
    assert json.loads(out.strip().splitlines()[-1])["result"] == "conflict"
    # loud abort, not silent wrong data: the held delete did NOT apply
    assert tab.latest_version() == v_reorg
    assert _ids(tab, spark) == [i for i in range(N) if i != 60]
    # the abort's cleanup (ADVICE r14) removed every dir the worker
    # staged — no orphans left for vacuum
    assert staged.isdisjoint(set(tab.store.list_txn_dirs()))


def test_dv_commit_aborts_in_flight_reorg_then_retry_purges(
    dv_tab, spark, tmp_path, monkeypatch
):
    """Reorg derives first, DV delete lands first → the reorg must
    abort loudly (its rewrite materialized a DV set that no longer
    covers the racer's fresh delete — publishing would RESURRECT the
    freshly deleted row), and a re-driven reorg purges both."""
    tab, base_cfg = dv_tab
    go = str(tmp_path / "go")
    c = dict(
        base_cfg, mode="dv_delete", barrier=go, position_sets=[[7]]
    )
    if base_cfg["backend"] == "s3":
        c["cache_dir"] = str(tmp_path / "cache_w")
    p = subprocess.Popen(
        [sys.executable, WORKER, json.dumps(c)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    base_v = tab.latest_version()
    real_write_txn = type(tab)._write_txn

    def held_write_txn(df, partition_by, **kw):
        # reorg's rewrite lands on disk, then the racer commits BEFORE
        # our publish loop runs — the exact window _check_conflicts
        # guards
        res = real_write_txn(tab, df, partition_by, **kw)
        open(go, "w").close()
        import time as _time

        t0 = _time.time()
        while tab.latest_version() == base_v:
            assert _time.time() - t0 < 120, "worker never committed"
            _time.sleep(0.01)
        return res

    monkeypatch.setattr(tab, "_write_txn", held_write_txn)
    try:
        with pytest.raises(ConcurrentWriteConflict):
            tab.reorg(spark)
    finally:
        monkeypatch.undo()
        out, err = p.communicate(timeout=120)
    assert p.returncode == 0, err[-2000:]
    assert json.loads(out.strip().splitlines()[-1])["versions"], err[-500:]
    # the racer's delete is live; the aborted reorg resurrected nothing
    assert _ids(tab, spark) == [i for i in range(N) if i not in (7, 60)]
    # re-driven reorg purges BOTH deletes' positions
    tab.reorg(spark)
    assert set(_dv_depths(tab)) <= {0}  # every DV materialized away
    assert _ids(tab, spark) == [i for i in range(N) if i not in (7, 60)]
