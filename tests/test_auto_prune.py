"""Round 12: automatic WHERE-derived file skipping for DELETE/UPDATE
(VERDICT r11 #1 — CoW hit-discovery was linear in file count unless the
user passed a `range_filter` hint) plus the three ADVICE r11 MERGE-prune
soundness items (quoted ON literals, mixed-type bound compare, and
non-deterministic merge sources).

Reference tie-in: the reference's row-level mutations are whole-file
pandas rewrites (/root/reference/src/preprocess_to_staging.py); the
100 TB target (SURVEY §6) needs Delta-style data skipping instead.
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest

from data_lakes_tp2_student_spark.io.manifest import (
    ManifestTable,
    _plan_deterministic,
)


def _spy_loads(monkeypatch):
    """Record the file-list size of every _load_snapshot call."""
    seen: list[int] = []
    orig = ManifestTable._load_snapshot

    def spy(self, spark_, m, files, **kw):
        seen.append(len(files))
        return orig(self, spark_, m, files, **kw)

    monkeypatch.setattr(ManifestTable, "_load_snapshot", spy)
    return seen


# ---------------------------------------------------------------------------
# _cond_ranges: the conservative WHERE parser
# ---------------------------------------------------------------------------


def test_cond_ranges_conjunction_and_orientation():
    cr = ManifestTable._cond_ranges
    assert cr("id = 7") == {"id": (7, 7)}
    assert cr("7 = id") == {"id": (7, 7)}
    assert cr("id >= 3 and id <= 9") == {"id": (3, 9)}
    # reversed operands flip the operator
    assert cr("3 <= id AND 9 >= id") == {"id": (3, 9)}
    # strict ops widen to inclusive (over-approximation)
    assert cr("id > 3 and id < 9") == {"id": (3, 9)}
    # one-sided ranges survive
    assert cr("ts >= 100") == {"ts": (100, None)}
    assert cr("ts <= 100") == {"ts": (None, 100)}
    # repeated bounds tighten
    assert cr("id >= 3 and id >= 5 and id <= 9 and id <= 7") == {
        "id": (5, 7)
    }
    # multiple columns, unparsed conjuncts ignored (sound subset)
    assert cr("id = 4 and length(v) > 2") == {}  # parens bail entirely
    assert cr("id = 4 and v2 like 'x%'") == {"id": (4, 4)}


def test_cond_ranges_literals_and_bailouts():
    cr = ManifestTable._cond_ranges
    assert cr("day = 'd1'") == {"day": ("d1", "d1")}
    assert cr("ts >= timestamp'2024-01-05 00:00:00'") == {
        "ts": ("2024-01-05 00:00:00", None)
    }
    assert cr("d = date'2024-01-05'") == {"d": ("2024-01-05", "2024-01-05")}
    assert cr("id = 1.5") == {"id": (1.5, 1.5)}
    # a literal containing ' and ' can never fabricate an atom
    assert cr("name = 'a and id = 7 and b'") == {
        "name": ("a and id = 7 and b", "a and id = 7 and b")
    }
    # OR / NOT / parens / double quotes / Column conditions bail
    assert cr("id = 7 or id = 9") == {}
    assert cr("not id = 7") == {}
    assert cr("(id = 7)") == {}
    assert cr('id = "x"') == {}
    assert cr(object()) == {}  # non-string (Column) conditions bail
    assert cr(None) == {}
    # mixed literal types on one column poison it
    assert cr("id >= 3 and id <= 'x'") == {}
    # purely numeric LHS and RHS is not a column comparison
    assert cr("5 = 3") == {}


# ---------------------------------------------------------------------------
# hint-free DELETE/UPDATE discovery pruning (VERDICT r11 #1)
# ---------------------------------------------------------------------------


def test_delete_where_auto_prunes_discovery(spark, tmp_path, monkeypatch):
    """A 1-row delete with no hint schedules only the stats-overlapping
    file(s), and the result is byte-identical to the unpruned path."""
    tab = ManifestTable(str(tmp_path / "t"), stats_cols=["id"])
    df = spark.createDataFrame(
        [(i, f"v{i}", f"d{i % 3}") for i in range(60)],
        "id int, v string, day string",
    )
    tab.commit_overwrite(df.repartitionByRange(6, "id"))
    n_files = len(tab._snapshot_files(0))
    assert n_files >= 4

    seen = _spy_loads(monkeypatch)
    tab.delete_where(spark, "id = 7")  # NO range_filter
    monkeypatch.undo()
    assert seen and seen[0] < n_files, (seen, n_files)
    assert sorted(r.id for r in tab.read(spark).collect()) == [
        i for i in range(60) if i != 7
    ]

    # update_where gets the same lever, hint-free
    seen2 = _spy_loads(monkeypatch)
    tab.update_where(spark, "id >= 50 and id <= 52", {"v": "'patched'"})
    monkeypatch.undo()
    assert seen2 and seen2[0] < n_files, (seen2, n_files)
    got = {r.id: r.v for r in tab.read(spark).collect()}
    assert got[50] == got[51] == got[52] == "patched" and got[49] == "v49"


def test_delete_where_dv_auto_prunes_discovery(spark, tmp_path, monkeypatch):
    """Merge-on-read DELETE discovery takes the same automatic skipping:
    files outside the bounds hold no matched positions."""
    tab = ManifestTable(str(tmp_path / "t"), stats_cols=["id"])
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(60)], "id int, v string"
    )
    tab.commit_overwrite(df.repartitionByRange(6, "id"))
    n_files = len(tab._snapshot_files(0))
    seen = _spy_loads(monkeypatch)
    tab.delete_where(spark, "id = 7", mode="dv")
    monkeypatch.undo()
    assert seen and seen[0] < n_files, (seen, n_files)
    assert sorted(r.id for r in tab.read(spark).collect()) == [
        i for i in range(60) if i != 7
    ]


def test_auto_prune_timestamp_literal_domain(spark, tmp_path, monkeypatch):
    """Stats serialize datetimes as ISOFORMAT strings; a SQL
    `timestamp'Y-m-d H:M:S'` literal (space separator) must be
    re-canonicalized or the lexicographic compare would prune files
    that DO contain matches (' ' < 'T'). Pruning must engage AND the
    result must match the predicate exactly."""
    tab = ManifestTable(str(tmp_path / "t"), stats_cols=["ts"])
    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=6 * i))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id int, ts timestamp")
    tab.commit_overwrite(df.repartitionByRange(5, "ts"))
    n_files = len(tab._snapshot_files(0))
    assert n_files >= 4
    seen = _spy_loads(monkeypatch)
    tab.delete_where(spark, "ts >= timestamp'2024-01-09 12:00:00'")
    monkeypatch.undo()
    assert seen and seen[0] < n_files, (seen, n_files)
    cutoff = datetime.datetime(2024, 1, 9, 12)
    assert sorted(r.id for r in tab.read(spark).collect()) == [
        i for i, (_, ts) in enumerate(rows) if ts < cutoff
    ]


def test_auto_prune_date_stats_vs_timestamp_literal(spark, tmp_path):
    """Date-only stats vs a timestamp literal: the bound is floored to
    the day (exact on the hi side, over-approximating on lo) — the
    matched set is identical to the unpruned semantics."""
    tab = ManifestTable(str(tmp_path / "t"), stats_cols=["d"])
    rows = [(i, datetime.date(2024, 1, 1 + i)) for i in range(20)]
    df = spark.createDataFrame(rows, "id int, d date")
    tab.commit_overwrite(df.repartitionByRange(4, "d"))
    # Spark casts date→timestamp(midnight): d >= '…-05 05:00' ⇔ d >= …-06
    tab.delete_where(spark, "d >= timestamp'2024-01-05 05:00:00'")
    assert sorted(r.id for r in tab.read(spark).collect()) == [0, 1, 2, 3, 4]


def test_auto_prune_string_type_mismatch_is_noop(spark, tmp_path):
    """A numeric literal against STRING stats (raw Python compare would
    TypeError) silently skips pruning instead of crashing, and the
    delete still runs."""
    tab = ManifestTable(str(tmp_path / "t"), stats_cols=["k"])
    df = spark.createDataFrame(
        [(str(i), i) for i in range(20)], "k string, n int"
    )
    tab.commit_overwrite(df.repartitionByRange(3, "k"))
    # Spark casts: k = 7 matches the row '7'
    tab.delete_where(spark, "k = 7")
    assert sorted(r.n for r in tab.read(spark).collect()) == [
        i for i in range(20) if i != 7
    ]


def test_auto_prune_composes_with_explicit_hint(spark, tmp_path, monkeypatch):
    """An explicit range_filter and the automatic bounds apply together
    (both over-approximate, intersection stays sound)."""
    tab = ManifestTable(str(tmp_path / "t"), stats_cols=["id"])
    df = spark.createDataFrame([(i, i % 5) for i in range(60)], "id int, g int")
    tab.commit_overwrite(df.repartitionByRange(6, "id"))
    n_files = len(tab._snapshot_files(0))
    seen = _spy_loads(monkeypatch)
    tab.delete_where(spark, "id = 13", range_filter={"id": (0, 30)})
    monkeypatch.undo()
    assert seen and seen[0] < n_files
    assert 13 not in {r.id for r in tab.read(spark).collect()}


# ---------------------------------------------------------------------------
# ADVICE r11: MERGE-prune soundness
# ---------------------------------------------------------------------------


def test_merge_on_with_quoted_literal_disables_parse_and_stays_correct(
    spark, tmp_path
):
    """ADVICE r11 #1: an ON clause holding a quoted literal must not be
    AND-split (a literal containing ' and t.id = s.id and ' would
    fabricate a prune key the real join does not have)."""
    tab = ManifestTable(str(tmp_path / "t"), stats_cols=["id"])
    tab.commit_overwrite(
        spark.createDataFrame(
            [(i, f"v{i}", "a and t.id = s.id and b") for i in range(20)],
            "id int, v string, name string",
        ).repartitionByRange(4, "id")
    )
    b = tab.merge(
        spark,
        spark.createDataFrame([(5, "NEW")], "id int, v string"),
        on="t.name = 'a and t.id = s.id and b' and t.id = s.id",
    )
    assert b._equi_keys() == []  # quote present → parsing fully disabled
    b.when_matched_update({"v": "s.v"}).execute()
    got = {r.id: r.v for r in tab.read(spark).collect()}
    assert got[5] == "NEW" and got[6] == "v6" and len(got) == 20


def test_merge_prune_type_mismatch_falls_back_not_crashes(spark, tmp_path):
    """ADVICE r11 #2: string source keys vs numeric target stats — the
    raw-Python bounds compare raises TypeError inside
    _prune_files_range; the merge must fall back to the unpruned file
    list and produce the implicit-cast join result Spark gives."""
    tab = ManifestTable(str(tmp_path / "t"), stats_cols=["id"])
    tab.commit_overwrite(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], "id int, v string"
        ).repartitionByRange(4, "id")
    )
    src = spark.createDataFrame([("7", "NEW")], "id string, v string")
    tab.merge(spark, src, on="t.id = s.id").when_matched_update(
        {"v": "s.v"}
    ).execute()
    got = {r.id: r.v for r in tab.read(spark).collect()}
    assert got[7] == "NEW" and got[8] == "v8"


def test_merge_nondeterministic_source_is_pinned(spark, tmp_path):
    """ADVICE r11 #3: a non-deterministic source (rand()-ordered LIMIT)
    could otherwise emit rows OUTSIDE the collected bounds on its next
    evaluation. The source is localCheckpoint-pinned, so the bounds agg,
    cardinality gate, and all join passes see the SAME rows: exactly k
    target rows end up updated."""
    tab = ManifestTable(str(tmp_path / "t"), stats_cols=["id"])
    tab.commit_overwrite(
        spark.createDataFrame(
            [(i, "old") for i in range(200)], "id int, v string"
        ).repartitionByRange(8, "id")
    )
    k = 10
    src = (
        spark.range(200)
        .select(F.col("id").cast("int").alias("id"))
        .orderBy(F.rand(  ))
        .limit(k)
        .withColumn("v", F.lit("new"))
    )
    assert not _plan_deterministic(src)
    tab.merge(spark, src, on="t.id = s.id").when_matched_update(
        {"v": "s.v"}
    ).execute()
    rows = tab.read(spark).collect()
    assert sum(r.v == "new" for r in rows) == k
    assert len(rows) == 200


def test_plan_deterministic_detection(spark):
    assert _plan_deterministic(spark.range(5))
    assert not _plan_deterministic(spark.range(5).withColumn("r", F.rand()))
    assert not _plan_deterministic(object())  # introspection failure → False
