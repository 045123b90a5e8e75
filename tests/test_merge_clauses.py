"""Clause-level MERGE INTO on the manifest table (round 8).

The contract under test (Delta `DeltaTable.merge` semantics on the
provenance-backed copy-on-write machinery): clauses evaluate in
declaration order and the first that fires wins; a target row multiple
source rows would modify aborts (MergeCardinalityError); execution is
file-selective (untouched files carry over BY REFERENCE); racing commits
abort; prior versions still time-travel; the read path composes with
deletion vectors. Runs against BOTH log-store backends via the shared
`tab` fixture pattern.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakes_tp2_student_spark.io.manifest import (
    ConcurrentWriteConflict,
    ManifestTable,
    MergeCardinalityError,
)

from .test_manifest import _df, moto_endpoint, tab  # noqa: F401  (fixtures)


def rows(df):
    return sorted((r.id, r.v, r.day) for r in df.collect())


def _src(spark, data):
    return spark.createDataFrame(data, "sid int, sv string, op string")


BASE = [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2"), (4, "d", "d3")]


def test_full_clause_surface(spark, tab):
    """All five clause kinds in one merge: matched-update, matched-delete,
    not-matched-insert, not-matched-by-source-update — each claiming the
    rows its condition selects and nothing else."""
    tab.commit_overwrite(_df(spark, BASE), partition_by=["day"])
    src = _src(
        spark,
        [
            (1, "A!", "U"),   # matched, op=U -> update
            (2, None, "D"),   # matched, op=D -> delete
            (9, "new", "I"),  # not matched -> insert
        ],
    )
    v = (
        tab.merge(spark, src, "t.id = s.sid")
        .when_matched_update(set={"v": "s.sv"}, condition="s.op = 'U'")
        .when_matched_delete(condition="s.op = 'D'")
        .when_not_matched_insert(
            values={"id": "s.sid", "v": "s.sv", "day": "'d9'"},
            condition="s.op = 'I'",
        )
        .when_not_matched_by_source_update(
            set={"v": "concat(t.v, '?')"}, condition="t.day = 'd2'"
        )
        .execute()
    )
    assert v == 1
    assert rows(tab.read(spark)) == [
        (1, "A!", "d1"),   # updated
        (3, "c?", "d2"),   # not-matched-by-source update
        (4, "d", "d3"),    # untouched
        (9, "new", "d9"),  # inserted
    ]
    # pre-merge snapshot intact (time travel)
    assert rows(tab.read(spark, version=0)) == sorted(BASE)


def test_clause_order_first_wins(spark, tab):
    """Two matched clauses both true for the same row: the FIRST declared
    wins (ANSI MERGE ordering) — flipping the declaration flips the
    outcome."""
    tab.commit_overwrite(_df(spark, [(1, "a", "d1")]))
    src = _src(spark, [(1, "X", "U")])
    tab.merge(spark, src, "t.id = s.sid").when_matched_update(
        set={"v": "'first'"}
    ).when_matched_delete().execute()
    assert rows(tab.read(spark)) == [(1, "first", "d1")]
    # now delete declared first
    tab.merge(spark, src, "t.id = s.sid").when_matched_delete().when_matched_update(
        set={"v": "'never'"}
    ).execute()
    assert rows(tab.read(spark)) == []


def test_file_selectivity_untouched_files_carry_by_reference(spark, tab):
    """A merge matching only day=d1 keys must carry the d2/d3 file
    entries over byte-identical (same paths) — the property that makes
    MERGE O(touched files), not O(table)."""
    v0 = tab.commit_overwrite(_df(spark, BASE), partition_by=["day"])
    before = {e["path"] for e in tab.manifest(v0)["files"]}
    untouched_before = {p for p in before if "day=d1" not in p}
    v1 = (
        tab.merge(spark, _src(spark, [(1, "A!", "U")]), "t.id = s.sid")
        .when_matched_update(set={"v": "s.sv"})
        .execute()
    )
    after = {e["path"] for e in tab.manifest(v1)["files"]}
    assert untouched_before <= after  # d2/d3 files carried by reference
    # the delta entry removed ONLY files in the matched partition — and
    # only those actually CONTAINING the matched key (file-granular, so
    # a d1 part file holding just id=2 also carries over)
    removed = tab._raw(v1)["remove"]["values"]
    assert removed and all("day=d1" in p for p in removed)
    assert set(removed) <= before and not set(removed) & after


def test_cardinality_violation_aborts(spark, tab):
    tab.commit_overwrite(_df(spark, [(1, "a", "d1")]))
    dup = _src(spark, [(1, "x", "U"), (1, "y", "U")])
    with pytest.raises(MergeCardinalityError):
        tab.merge(spark, dup, "t.id = s.sid").when_matched_update(
            set={"v": "s.sv"}
        ).execute()
    # the abort left no new version behind
    assert tab.latest_version() == 0
    assert rows(tab.read(spark)) == [(1, "a", "d1")]


def test_cardinality_ok_when_clauses_do_not_fire(spark, tab):
    """Multiple matches are only ambiguous if a clause would MODIFY the
    row more than once — two matches whose conditions are both false are
    harmless (Delta counts modifying pairs, not matching pairs)."""
    tab.commit_overwrite(_df(spark, [(1, "a", "d1")]))
    dup = _src(spark, [(1, "x", "N"), (1, "y", "N")])
    v = (
        tab.merge(spark, dup, "t.id = s.sid")
        .when_matched_update(set={"v": "s.sv"}, condition="s.op = 'U'")
        .execute()
    )
    assert v == 0  # nothing fired -> no-op, no commit
    assert rows(tab.read(spark)) == [(1, "a", "d1")]


def test_noop_merge_returns_current_version(spark, tab):
    tab.commit_overwrite(_df(spark, [(1, "a", "d1")]))
    v = (
        tab.merge(spark, _src(spark, [(77, "z", "U")]), "t.id = s.sid")
        .when_matched_update(set={"v": "s.sv"})
        .execute()
    )
    assert v == 0
    assert tab.versions() == [0]


def test_insert_only_merge_appends(spark, tab):
    """No matched clause fires and no file is touched: the merge reduces
    to an append (remove list empty), still one atomic commit."""
    v0 = tab.commit_overwrite(_df(spark, BASE), partition_by=["day"])
    v1 = (
        tab.merge(spark, _src(spark, [(9, "new", "I")]), "t.id = s.sid")
        .when_not_matched_insert(
            values={"id": "s.sid", "v": "s.sv", "day": "'d1'"}
        )
        .execute()
    )
    assert v1 == 1
    assert (9, "new", "d1") in rows(tab.read(spark))
    # every v0 file carried over
    assert {e["path"] for e in tab.manifest(v0)["files"]} <= {
        e["path"] for e in tab.manifest(v1)["files"]
    }


def test_not_matched_by_source_delete(spark, tab):
    """The retention idiom: rows the source no longer carries get
    deleted; everything the source still knows survives."""
    tab.commit_overwrite(_df(spark, BASE))
    keep = _src(spark, [(1, None, "K"), (3, None, "K")])
    tab.merge(spark, keep, "t.id = s.sid").when_not_matched_by_source_delete().execute()
    assert [r[0] for r in rows(tab.read(spark))] == [1, 3]


def test_insert_all_missing_source_columns_null(spark, tab):
    """INSERT * with a narrower source: target columns the source lacks
    become NULL (documented contract)."""
    tab.commit_overwrite(_df(spark, [(1, "a", "d1")]))
    narrow = spark.createDataFrame([(9, "n")], "id int, v string")
    tab.merge(spark, narrow, "t.id = s.id").when_not_matched_insert_all().execute()
    assert rows(tab.read(spark).fillna({"day": "<null>"})) == [
        (1, "a", "d1"),
        (9, "n", "<null>"),
    ]


def test_null_condition_counts_as_no_match(spark, tab):
    """A clause condition evaluating to NULL fires nothing (ANSI)."""
    tab.commit_overwrite(_df(spark, [(1, "a", "d1")]))
    src = _src(spark, [(1, None, None)])  # s.op IS NULL
    v = (
        tab.merge(spark, src, "t.id = s.sid")
        .when_matched_delete(condition="s.op = 'D'")
        .execute()
    )
    assert v == 0 and rows(tab.read(spark)) == [(1, "a", "d1")]


def test_merge_composes_with_deletion_vectors(spark, tab):
    """Merge over a DV'd snapshot: rows a deletion vector hides must be
    invisible to every phase — they neither match nor resurrect."""
    tab.commit_overwrite(_df(spark, BASE))
    tab.delete_where(spark, "id = 2", mode="dv")
    src = _src(spark, [(2, "back", "U")])  # id=2 is DV-deleted
    tab.merge(spark, src, "t.id = s.sid").when_matched_update(
        set={"v": "s.sv"}
    ).when_not_matched_insert(
        values={"id": "s.sid", "v": "s.sv", "day": "'d8'"}
    ).execute()
    got = rows(tab.read(spark))
    # id=2's old image stays dead; the source row INSERTED (not matched)
    assert (2, "back", "d8") in got and (2, "b", "d1") not in got


def test_racing_commit_aborts_merge(spark, tab):
    """A commit landing between the merge's snapshot read and its publish
    aborts the merge — the racer may carry rows the ON condition should
    have seen."""
    tab.commit_overwrite(_df(spark, [(1, "a", "d1")]))
    real_commit = tab._commit

    def racing_commit(df, partition_by, action, remove_kind, **kw):
        tab.clone().commit_append(_df(spark, [(99, "racer", "d1")]))
        return real_commit(df, partition_by, action, remove_kind, **kw)

    tab._commit = racing_commit
    try:
        with pytest.raises(ConcurrentWriteConflict):
            tab.merge(spark, _src(spark, [(1, "X", "U")]), "t.id = s.sid").when_matched_update(
                set={"v": "s.sv"}
            ).execute()
    finally:
        tab._commit = real_commit
    assert (99, "racer", "d1") in rows(tab.read(spark))


def test_guard_rails(spark, tab):
    tab.commit_overwrite(_df(spark, [(1, "a", "d1")]))
    with pytest.raises(ValueError, match="at least one WHEN"):
        tab.merge(spark, _src(spark, []), "t.id = s.sid").execute()
    poisoned = spark.createDataFrame([(1, "p")], "id int, _rel string")
    with pytest.raises(ValueError, match="reserved"):
        tab.merge(spark, poisoned, "t.id = s.id").when_matched_delete().execute()


def test_merge_on_empty_table_raises(spark, tmp_path):
    empty = ManifestTable(str(tmp_path / "none"))
    with pytest.raises(FileNotFoundError):
        empty.merge(
            spark, _df(spark, [(1, "a", "d1")]), "t.id = s.id"
        ).when_matched_delete().execute()


def test_merge_rewrite_phase_loads_only_touched_files(spark, tab, monkeypatch):
    """Pass 2's rewrite must LOAD only the touched file entries — not
    scan the snapshot and filter on `_rel` (a metadata-derived column
    the parquet source cannot prune on). Asserted by recording every
    entry list _load_snapshot receives."""
    tab.commit_overwrite(_df(spark, BASE), partition_by=["day"])
    calls = []
    real = type(tab)._load_snapshot

    def spying(self, spark_, m, files, provenance=False):
        calls.append([e["path"] for e in files])
        return real(self, spark_, m, files, provenance)

    monkeypatch.setattr(type(tab), "_load_snapshot", spying)
    (
        tab.merge(spark, _src(spark, [(1, "A!", "U")]), "t.id = s.sid")
        .when_matched_update(set={"v": "s.sv"})
        .execute()
    )
    all_files = {e["path"] for e in tab.manifest(0)["files"]}
    removed = set(tab._raw(tab.latest_version())["remove"]["values"])
    # some call saw a PROPER SUBSET (the touched files); d2/d3 files
    # were never in any rewrite-phase load
    assert removed in [set(c) for c in calls]
    assert removed < all_files


def test_merge_schema_evolution(spark, tab):
    """with_schema_evolution(): a new source column becomes a table
    column; matched rows take the source value, untouched/carried rows
    read NULL — and a later plain read returns the evolved schema."""
    tab.commit_overwrite(_df(spark, BASE), partition_by=["day"])
    src = spark.createDataFrame(
        [(1, "A!", 0.9)], "sid int, sv string, score double"
    )
    (
        tab.merge(spark, src, "t.id = s.sid")
        .with_schema_evolution()
        .when_matched_update(set={"v": "s.sv", "score": "s.score"})
        .execute()
    )
    got = {r.id: (r.v, r.score) for r in tab.read(spark).collect()}
    assert got[1] == ("A!", 0.9)
    # rows in untouched files AND unmatched rows in rewritten files: NULL
    assert got[2][1] is None and got[3][1] is None and got[4][1] is None


def test_merge_insert_all_evolution(spark, tab):
    tab.commit_overwrite(_df(spark, [(1, "a", "d1")]))
    src = spark.createDataFrame(
        [(9, "n", "d9", 5)], "id int, v string, day string, extra int"
    )
    (
        tab.merge(spark, src, "t.id = s.id")
        .with_schema_evolution()
        .when_not_matched_insert_all()
        .execute()
    )
    got = {r.id: r.extra for r in tab.read(spark).collect()}
    assert got == {1: None, 9: 5}


def test_merge_unknown_assignment_raises_without_evolution(spark, tab):
    tab.commit_overwrite(_df(spark, [(1, "a", "d1")]))
    src = spark.createDataFrame([(1, 0.5)], "sid int, score double")
    with pytest.raises(ValueError, match="unknown column.*schema_evolution"):
        tab.merge(spark, src, "t.id = s.sid").when_matched_update(
            set={"score": "s.score"}
        ).execute()


def test_multi_match_single_fire_no_duplicate_rows(spark, tab):
    """THE subtle pair-explosion case: a target row matching TWO source
    rows where only ONE fires must emit exactly one (updated) output row
    — and matching two NON-firing pairs in a hit file must emit exactly
    one pass-through copy (review r8: the left join emits one row per
    PAIR; without the per-target-row reduction both cases duplicated)."""
    tab.commit_overwrite(_df(spark, [(1, "a", "d1"), (2, "b", "d1")]))
    src = _src(
        spark,
        [
            (1, "X", "U"),   # fires on id=1
            (1, "y", "N"),   # matches id=1, does NOT fire
            (2, "p", "N"),   # two non-firing matches for id=2 ...
            (2, "q", "N"),   # ... in a file hit via id=1
        ],
    )
    (
        tab.merge(spark, src, "t.id = s.sid")
        .when_matched_update(set={"v": "s.sv"}, condition="s.op = 'U'")
        .execute()
    )
    assert rows(tab.read(spark)) == [(1, "X", "d1"), (2, "b", "d1")]


def test_column_typed_arguments(spark, tab):
    """`on`, conditions, and SET values as Column objects (not SQL
    strings) — both forms are first-class."""
    tab.commit_overwrite(_df(spark, [(1, "a", "d1"), (2, "b", "d1")]))
    src = _src(spark, [(1, "X", "U"), (2, None, "D")])
    (
        tab.merge(spark, src, F.expr("t.id = s.sid"))
        .when_matched_update(
            set={"v": F.upper(F.col("s.sv"))}, condition=F.col("s.op") == "U"
        )
        .when_matched_delete(condition=F.col("s.op") == "D")
        .execute()
    )
    assert rows(tab.read(spark)) == [(1, "X", "d1")]


def test_merge_auto_prunes_target_by_source_key_bounds(
    spark, tmp_path, monkeypatch
):
    """Round 11 (data-plane soak: touched-file discovery is linear in
    file count): a `t.c = s.c` conjunction ON clause triggers automatic
    target-file skipping — ONE source min/max agg prunes every target
    file whose stats cannot intersect the source key range from the
    matched-discovery join AND the insert anti-join (a disjoint file
    can hold no matched pair and cannot veto an insert). Pinned: the
    discovery really loads the pruned entry list, and the merge result
    is exact."""
    from data_lakes_tp2_student_spark.io.manifest import ManifestTable

    tab2 = ManifestTable(str(tmp_path / "mp"), stats_cols=["id"])
    df = spark.createDataFrame(
        [(i, f"v{i}", "d1") for i in range(60)],
        "id int, v string, day string",
    )
    tab2.commit_overwrite(df.repartitionByRange(6, "id"))
    n_files = len(tab2._snapshot_files(0))
    assert n_files >= 4

    seen: list = []
    orig = ManifestTable._load_snapshot

    def spy(self, spark_, m, files, **kw):
        if kw.get("provenance"):
            seen.append(len(files))
        return orig(self, spark_, m, files, **kw)

    monkeypatch.setattr(ManifestTable, "_load_snapshot", spy)
    src = spark.createDataFrame(
        [(55, "patched"), (61, "new")], "id int, v string"
    )
    (
        tab2.merge(spark, src, "t.id = s.id")
        .when_matched_update(set={"v": "s.v"})
        .when_not_matched_insert(
            values={"id": "s.id", "v": "s.v", "day": "'d9'"}
        )
        .execute()
    )
    monkeypatch.undo()
    # source bounds [55, 61] overlap exactly ONE target file: both the
    # pruned discovery load AND the pass-2 hit load see 1 entry (an
    # unpruned run shows only pass-2's); with no NMS clause the FULL
    # provenance frame is never even constructed (lazy, round-11 —
    # building both frames cost two driver file-index passes)
    assert seen.count(1) >= 2, seen
    assert max(seen) < n_files, seen
    got = {r.id: (r.v, r.day) for r in tab2.read(spark).collect()}
    assert got[55] == ("patched", "d1") and got[61] == ("new", "d9")
    assert got[54] == ("v54", "d1") and len(got) == 61
    # existing keys in PRUNED files must still veto inserts: id 7 lives
    # in a file the [55,61] bounds pruned, but a second merge sourcing
    # id 7 has bounds [7,7] — its file is kept, no duplicate insert
    src2 = spark.createDataFrame([(7, "dup")], "id int, v string")
    (
        tab2.merge(spark, src2, "t.id = s.id")
        .when_not_matched_insert(
            values={"id": "s.id", "v": "s.v", "day": "'d9'"}
        )
        .execute()
    )
    assert tab2.read(spark).filter("id = 7").count() == 1


def test_merge_nms_sees_full_table_despite_pruning(spark, tmp_path):
    """NOT-MATCHED-BY-SOURCE needs every target row — the automatic
    skipping must never apply to that pass: a one-key source deletes
    every other row across ALL files, including files the source key
    range would prune."""
    from data_lakes_tp2_student_spark.io.manifest import ManifestTable

    tab2 = ManifestTable(str(tmp_path / "nms"), stats_cols=["id"])
    df = spark.createDataFrame(
        [(i, f"v{i}", "d1") for i in range(60)],
        "id int, v string, day string",
    )
    tab2.commit_overwrite(df.repartitionByRange(6, "id"))
    src = spark.createDataFrame([(55, "keep")], "id int, v string")
    (
        tab2.merge(spark, src, "t.id = s.id")
        .when_matched_update(set={"v": "s.v"})
        .when_not_matched_by_source_delete()
        .execute()
    )
    got = [(r.id, r.v) for r in tab2.read(spark).collect()]
    assert got == [(55, "keep")], got


def test_merge_complex_on_disables_pruning_soundly(spark, tmp_path):
    """An ON clause the parser cannot fully reduce (OR / parentheses)
    disables the skip entirely; results stay exact."""
    from data_lakes_tp2_student_spark.io.manifest import ManifestTable

    tab2 = ManifestTable(str(tmp_path / "cx"), stats_cols=["id"])
    df = spark.createDataFrame(
        [(i, f"v{i}", "d1") for i in range(20)],
        "id int, v string, day string",
    )
    tab2.commit_overwrite(df.repartitionByRange(4, "id"))
    b = tab2.merge(
        spark,
        spark.createDataFrame([(3, "x")], "id int, v string"),
        "(t.id = s.id) OR (t.id = s.id + 1)",
    )
    assert b._equi_keys() == []
    b.when_matched_update(set={"v": "'hit'"}).execute()
    got = {r.id: r.v for r in tab2.read(spark).collect()}
    assert got[3] == "hit" and got[4] == "hit" and got[5] == "v5"
