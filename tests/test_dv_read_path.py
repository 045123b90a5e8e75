"""Round-14 DV read-path flattening (VERDICT r13 item 1).

Three coupled changes, each pinned here:

1. `_load_snapshot` reads ALL live files in ONE scan and applies every
   deletion vector with a single broadcast anti-join — the old
   plain/DV two-branch union broke `_coalesce_dirs` (a txn dir with one
   DV'd file stopped list-matching the plain subset), so a 16-DV read
   at 8192 files cost 5.7× the plain read (DATAPLANE_r13), growing
   with file count.
2. `_merge_stacked_dvs` folds a hit file's prior DVs plus the fresh one
   into a single merged DV parquet at commit time — dv depth stays
   exactly 1 per file (Delta merges its per-file DV bitmaps the same
   way).
3. `ManifestTable.reorg` materializes DVs into rewritten files past a
   deleted-row-ratio threshold (REORG TABLE ... APPLY (PURGE)).

Reference tie-in: the reference mutates rows by whole-file pandas
rewrites (/root/reference/src/preprocess_to_staging.py:14-74); the
merge-on-read path replaces that at scale, so its read must stay
byte-identical to the eager rewrite's result.
"""

from __future__ import annotations

import pytest

from data_lakes_tp2_student_spark.io.manifest import ManifestTable


@pytest.fixture()
def tab(spark, tmp_path):
    """8 files x 4 rows with per-file disjoint id ranges and honest
    stats — the dataplane soak's shape, small."""
    t = ManifestTable(str(tmp_path / "t"), stats_cols=["id"])
    df = spark.createDataFrame(
        [(i, f"r{i}") for i in range(32)], "id long, v string"
    ).repartitionByRange(8, "id")
    t.commit_overwrite(df)
    return t


def _ids(tab, spark, version=None):
    return sorted(r.id for r in tab.read(spark, version=version).collect())


def test_stacked_dv_deletes_read_exact(tab, spark):
    """Byte-equality of the single-scan anti-join read across stacked
    single-row DV deletes hitting DIFFERENT files and the SAME file
    repeatedly — every intermediate version still time-travels to its
    exact row set."""
    gone: list[int] = []
    expect_at: dict[int, list[int]] = {0: list(range(32))}
    v = 0
    for target in (1, 5, 6, 7, 30, 2):  # file0 x1, file1 x3, file7, file0
        v = tab.delete_where(spark, f"id = {target}", mode="dv")
        gone.append(target)
        expect_at[v] = [i for i in range(32) if i not in gone]
    for ver, expect in expect_at.items():
        assert _ids(tab, spark, version=ver) == expect, ver
    # full-row equality, not just ids
    rows = sorted(
        (r.id, r.v) for r in tab.read(spark).collect()
    )
    assert rows == [(i, f"r{i}") for i in range(32) if i not in gone]


def test_dv_depth_stays_one_per_file(tab, spark):
    """Three DV deletes landing in the same file leave its entry with ONE
    dv rel (merged), not a stack of three."""
    for target in (4, 5, 6):  # all in file1 (ids 4-7)
        tab.delete_where(spark, f"id = {target}", mode="dv")
    m = tab.manifest(tab.latest_version())
    dved = [e for e in m["files"] if e.get("dv")]
    assert len(dved) == 1
    assert len(dved[0]["dv"]) == 1, dved[0]["dv"]
    assert _ids(tab, spark) == [i for i in range(32) if i not in (4, 5, 6)]


def test_shared_dv_rel_partial_merge(tab, spark):
    """One DV delete spans files A and B (shared dv rel); a second hits
    only A. A re-points to the merged rel; B keeps the shared one; the
    read stays exact and nothing double-deletes."""
    tab.delete_where(spark, "id IN (2, 9)", mode="dv")  # file0 + file2
    m1 = tab.manifest(tab.latest_version())
    rels1 = {e["path"]: e["dv"] for e in m1["files"] if e.get("dv")}
    assert len(rels1) == 2
    (shared_rel,) = {r for v in rels1.values() for r in v}
    tab.delete_where(spark, "id = 3", mode="dv")  # file0 again
    m2 = tab.manifest(tab.latest_version())
    rels2 = {e["path"]: e["dv"] for e in m2["files"] if e.get("dv")}
    merged = {p: v for p, v in rels2.items() if v != [shared_rel]}
    kept = {p: v for p, v in rels2.items() if v == [shared_rel]}
    assert len(merged) == 1 and len(kept) == 1
    assert _ids(tab, spark) == [i for i in range(32) if i not in (2, 3, 9)]


def test_update_dv_merges_and_reads_exact(tab, spark):
    """update_where(mode='dv') on a file that already has a DV merges,
    keeps depth 1, and the read reflects both operations."""
    tab.delete_where(spark, "id = 8", mode="dv")
    tab.update_where(spark, "id = 9", {"v": "'nine'"}, mode="dv")
    m = tab.manifest(tab.latest_version())
    depths = [len(e["dv"]) for e in m["files"] if e.get("dv")]
    assert depths and max(depths) == 1, depths
    rows = {r.id: r.v for r in tab.read(spark).collect()}
    assert 8 not in rows and rows[9] == "nine"
    assert len(rows) == 31


def test_single_scan_when_dvs_present(tab, spark):
    """All files in one commit dir + a DV → the whole dir rides the
    meta branch: exactly TWO parquet scans (data + DV relation), no
    union, never the r13 file-aligned split (three scans with the dir's
    live set straddling branches, which broke `_coalesce_dirs`)."""
    tab.delete_where(spark, "id = 12", mode="dv")
    plan = tab.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 2, plan
    assert "Union" not in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_dir_aligned_split_keeps_undeleted_commits_plain(spark, tmp_path):
    """Two commits; the DV delete touches only the second: the first
    commit's dir must read on the PLAIN branch — no `_metadata`
    projection, no anti-join probe for its rows — while the DV'd dir
    carries the join. Plan: 3 scans (plain dir, DV'd dir, DV relation),
    one union, and the result is exact."""
    t = ManifestTable(str(tmp_path / "t"), stats_cols=["id"])
    mk = lambda lo, hi: spark.createDataFrame(
        [(i, f"r{i}") for i in range(lo, hi)], "id long, v string"
    ).coalesce(1)
    t.commit_overwrite(mk(0, 16))
    t.commit_append(mk(16, 32))
    t.delete_where(spark, "id = 20", mode="dv")  # second commit only
    df = t.read(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 3, plan
    assert plan.count("Union") == 1, plan
    # exactly ONE anti-join, on the DV'd branch only — the plain branch
    # is a bare scan (its rows never pay the probe)
    assert plan.count("BroadcastHashJoin") == 1 and "LeftAnti" in plan, plan
    assert sorted(r.id for r in df.collect()) == [
        i for i in range(32) if i != 20
    ]


def test_row_count_metadata_with_merged_dvs(tab, spark):
    """row_count subtracts merged-DV positions exactly (no double count
    across the merge)."""
    tab.delete_where(spark, "id = 16", mode="dv")
    tab.delete_where(spark, "id = 17", mode="dv")  # same file: merged
    assert tab.row_count() == 30


def test_reorg_materializes_past_threshold(tab, spark):
    """reorg(min_deleted_ratio=0.5) rewrites only files at least half
    dead; the untouched DV'd file keeps its DV; rows stay exact; the
    pre-reorg version still time-travels through its DVs."""
    # file1 (ids 4-7): 3 of 4 rows dead -> ratio 0.75
    for t in (4, 5, 6):
        tab.delete_where(spark, f"id = {t}", mode="dv")
    # file3 (ids 12-15): 1 of 4 dead -> ratio 0.25
    v_before = tab.delete_where(spark, "id = 13", mode="dv")
    expect = [i for i in range(32) if i not in (4, 5, 6, 13)]
    v = tab.reorg(spark, min_deleted_ratio=0.5)
    assert v == v_before + 1
    m = tab.manifest(v)
    dved = [e for e in m["files"] if e.get("dv")]
    assert len(dved) == 1  # only the 0.25 file keeps its DV
    assert _ids(tab, spark) == expect
    assert _ids(tab, spark, version=v_before) == expect  # time travel
    assert tab.row_count() == len(expect)
    # full purge: ratio 0.0 clears the last DV
    v2 = tab.reorg(spark, min_deleted_ratio=0.0)
    assert v2 == v + 1
    assert not any(
        e.get("dv") for e in tab.manifest(v2)["files"]
    )
    assert _ids(tab, spark) == expect
    # nothing left to reorg -> no-op
    assert tab.reorg(spark) == v2


def test_reorg_noop_without_dvs(tab, spark):
    assert tab.reorg(spark) == 0  # fresh table: no DVs, no commit


def test_plain_read_plan_unchanged_without_dvs(tab, spark):
    """No DVs, no provenance → no `_metadata` reference, no join: the
    pre-DV plan shape is untouched by the flattening."""
    plan = tab.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "_metadata" not in plan, plan
