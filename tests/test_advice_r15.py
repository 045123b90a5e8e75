"""ADVICE r14 items, pinned.

1. `_txn_dir_of` is the ONE shared grouping rule used by both
   `_coalesce_dirs` and `_load_snapshot`'s DV-branch split — the two
   previously duplicated the (len>=3, data/, txn=) predicate inline, so
   editing one without the other would silently desynchronize the split
   from coalescing (reintroducing the r13 per-file-path planning
   regression, PERF.md #71) with no loud failure.
2. A ConcurrentWriteConflict abort of a DV commit no longer strands the
   staged DV txn dir (merged or fresh) — nor, on the update path, the
   fresh updated-row data dir — as unreferenced orphans for vacuum's
   min-age sweep: the conflict is raised by `_check_conflicts` strictly
   before `_publish`, so the dirs are provably unreferenced and are
   deleted on the abort path.
"""

from __future__ import annotations

import os

import pytest

from data_lakes_tp2_student_spark.io.manifest import (
    ConcurrentWriteConflict,
    ManifestTable,
    _txn_dir_of,
)


def test_txn_dir_of_rule():
    assert _txn_dir_of("data/txn=abc/f.parquet") == "data/txn=abc"
    assert _txn_dir_of("data/txn=abc/p=1/f.parquet") == "data/txn=abc"
    # too shallow: the dir itself is not a member of itself
    assert _txn_dir_of("data/txn=abc") is None
    assert _txn_dir_of("loose.parquet") is None
    assert _txn_dir_of("data/other=abc/f.parquet") is None
    assert _txn_dir_of("notdata/txn=abc/f.parquet") is None


def test_shared_rule_has_single_definition():
    """The grouping predicate exists ONCE: neither _coalesce_dirs nor
    _load_snapshot re-spells `parts[1].startswith("txn=")` inline."""
    import data_lakes_tp2_student_spark.io.manifest as mod

    src = open(mod.__file__).read()
    assert src.count('parts[1].startswith("txn=")') == 1


def _txn_dirs(root: str) -> set:
    d = os.path.join(root, "data")
    if not os.path.isdir(d):
        return set()
    return {n for n in os.listdir(d) if n.startswith("txn=")}


@pytest.fixture()
def tab(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "t"), stats_cols=["id"])
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(32)], "id long, v string"
    ).repartitionByRange(8, "id")
    t.commit_overwrite(df)
    return t


def _race_merge(tab, spark, extra_rows):
    """Monkeypatch-shaped injector: wrap _merge_stacked_dvs so a racing
    append (via a SECOND handle on the same root) lands between the DV
    write and the commit — exactly the window ADVICE r14 names. Returns
    the dirs the racing append created (they must survive the abort)."""
    orig = ManifestTable._merge_stacked_dvs
    added = {}

    def patched(self, txn, dv_rel, hit, m):
        before = _txn_dirs(self.root)
        other = ManifestTable(self.root, stats_cols=["id"])
        other.commit_append(
            spark.createDataFrame(extra_rows, "id long, v string")
        )
        added["dirs"] = _txn_dirs(self.root) - before
        return orig(self, txn, dv_rel, hit, m)

    return patched, added


def test_dv_delete_abort_leaves_no_orphan(tab, spark, monkeypatch):
    # first DV so the second delete exercises the MERGE path (the
    # provisional dir is folded into a merged dir, which is what used
    # to strand)
    tab.delete_where(spark, "id = 1", mode="dv")
    patched, added = _race_merge(tab, spark, [(100, "x")])
    monkeypatch.setattr(ManifestTable, "_merge_stacked_dvs", patched)
    before = _txn_dirs(tab.root)
    with pytest.raises(ConcurrentWriteConflict):
        tab.delete_where(spark, "id = 2", mode="dv")
    # every dir the aborted commit staged — provisional DV, merged DV —
    # is gone; the racing append's dirs survive untouched
    assert _txn_dirs(tab.root) == before | added["dirs"]
    # and the table still reads exactly: the abort tore nothing
    ids = sorted(r.id for r in tab.read(spark).collect())
    assert ids == [i for i in range(32) if i != 1] + [100]


def test_dv_update_abort_leaves_no_orphan(tab, spark, monkeypatch):
    patched, added = _race_merge(tab, spark, [(200, "y")])
    monkeypatch.setattr(ManifestTable, "_merge_stacked_dvs", patched)
    before = _txn_dirs(tab.root)
    with pytest.raises(ConcurrentWriteConflict):
        tab.update_where(spark, "id = 3", {"v": "'upd'"}, mode="dv")
    # the staged DV dir AND the fresh updated-row data dir are both gone
    assert _txn_dirs(tab.root) == before | added["dirs"]
    rows = {(r.id, r.v) for r in tab.read(spark).collect()}
    assert (3, "r3") in rows and (200, "y") in rows


def test_dv_retry_after_abort_succeeds(tab, spark, monkeypatch):
    """The abort cleanup must not break the documented re-read-and-retry
    contract: the same delete re-issued against the new snapshot lands."""
    tab.delete_where(spark, "id = 1", mode="dv")
    patched, _added = _race_merge(tab, spark, [(300, "z")])
    monkeypatch.setattr(ManifestTable, "_merge_stacked_dvs", patched)
    with pytest.raises(ConcurrentWriteConflict):
        tab.delete_where(spark, "id = 2", mode="dv")
    monkeypatch.undo()
    tab.delete_where(spark, "id = 2", mode="dv")
    ids = sorted(r.id for r in tab.read(spark).collect())
    assert ids == [i for i in range(32) if i not in (1, 2)] + [300]
