"""Model-based property test for the manifest layer (hypothesis): a random
sequence of commits must keep every historical snapshot equal to an
in-memory model of the table — the whole-layer invariant (snapshot
isolation + replace semantics + append semantics) under operation orders
no hand-written test enumerates."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lakes_tp2_student_spark.io.manifest import (
    CheckConstraintViolation,
    ManifestTable,
)


@pytest.fixture(scope="module")
def moto_endpoint():
    pytest.importorskip("moto", reason="moto not installed")
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0)
    server.start()
    host, port = server.get_host_and_port()
    yield f"http://127.0.0.1:{port}"
    server.stop()


@pytest.fixture(params=["local", "s3"])
def make_tab(request, tmp_path_factory):
    """Table factory parametrized over BOTH storage backends (round 8):
    every random-sequence property here must hold identically on the
    local-FS store and the S3 conditional-put store (moto)."""
    if request.param == "local":

        def mk(name, **kw):
            return ManifestTable(str(tmp_path_factory.mktemp(name) / "t"), **kw)

        return mk

    import uuid as _uuid

    from data_lakes_tp2_student_spark.io.logstore import S3LogStore

    endpoint = request.getfixturevalue("moto_endpoint")

    def mk(name, **kw):
        prefix = f"{name}-{_uuid.uuid4().hex[:10]}"
        store = S3LogStore(
            "lake",
            prefix,
            endpoint=endpoint,
            cache_dir=str(tmp_path_factory.mktemp(f"{name}_cache")),
        )
        try:
            store.client.create_bucket(Bucket="lake")
        except store.client.exceptions.ClientError:
            pass
        return ManifestTable(f"s3://lake/{prefix}", log_store=store, **kw)

    return mk


DAYS = ["d0", "d1", "d2", None]  # None = the NULL partition (r7 wave 3)

# one op = (kind, rows); rows are (id, v, day) with day from the small pool
_row = st.tuples(
    st.integers(0, 9),
    st.sampled_from(["a", "b", "c"]),
    st.sampled_from(DAYS),
)
_op = st.tuples(
    st.sampled_from(["overwrite", "append", "replace_partitions"]),
    st.lists(_row, min_size=1, max_size=4),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=5))
def test_random_commit_sequences_match_model(spark, make_tab, ops):
    tab = make_tab("model")
    model_history: list[list[tuple]] = []
    model: list[tuple] = []
    for kind, rows_in in ops:
        df = spark.createDataFrame(rows_in, "id int, v string, day string")
        if kind == "overwrite":
            tab.commit_overwrite(df, partition_by=["day"])
            model = list(rows_in)
        elif kind == "append":
            tab.commit_append(df, partition_by=["day"])
            model = model + list(rows_in)
        else:
            tab.commit_replace_partitions(df, ["day"])
            touched = {r[2] for r in rows_in}
            model = [r for r in model if r[2] not in touched] + list(rows_in)
        model_history.append(list(model))
    # EVERY version must still read as its model snapshot (isolation:
    # later commits must not disturb earlier versions)
    for v, snapshot in enumerate(model_history):
        # key=repr: day may be None alongside strings
        got = sorted(
            ((r.id, r.v, r.day) for r in tab.read(spark, version=v).collect()),
            key=repr,
        )
        assert got == sorted(snapshot, key=repr), f"version {v} diverged"


@pytest.mark.parametrize("seed", [0])
def test_model_smoke(spark, make_tab, seed):
    """Deterministic pin of one interesting sequence (replace after
    append after overwrite across all days)."""
    tab = make_tab("smoke")
    mk = lambda rows: spark.createDataFrame(rows, "id int, v string, day string")
    tab.commit_overwrite(mk([(1, "a", "d0"), (2, "b", "d1")]), ["day"])
    tab.commit_append(mk([(3, "c", "d2")]), ["day"])
    tab.commit_replace_partitions(mk([(4, "d", "d1"), (5, "e", "d1")]), ["day"])
    assert sorted((r.id, r.day) for r in tab.read(spark).collect()) == [
        (1, "d0"), (3, "d2"), (4, "d1"), (5, "d1"),
    ]
    assert tab.read(spark, version=0).count() == 2
    assert tab.read(spark, version=1).count() == 3


# --- round-7: random CONCURRENT interleavings (VERDICT r6 item 1a) ---------
#
# Each op may race a partner commit that lands between the op's data write
# and its publish attempt (the same interception the deterministic conflict
# tests use). The model predicts, per the documented semantics, whether the
# op rebases (append always; replace_partitions on disjoint partitions) or
# aborts with ConcurrentWriteConflict (overwrite-style always;
# replace_partitions when the partner touched one of its partitions) — and
# that every surviving version still reads as its model snapshot.

from data_lakes_tp2_student_spark.io.manifest import ConcurrentWriteConflict

_partner = st.none() | _op


def _apply_model(model, kind, rows_in):
    if kind == "overwrite":
        return list(rows_in)
    if kind == "append":
        return model + list(rows_in)
    touched = {r[2] for r in rows_in}
    return [r for r in model if r[2] not in touched] + list(rows_in)


def _expect_abort(kind, rows_in, partner_kind, partner_rows):
    if kind == "append":
        return False  # blind appends commute with anything
    if kind == "overwrite":
        return True  # overwrite-style conflicts with ANY concurrent commit
    # replace_partitions: conflict iff the partner touched a replaced day
    if partner_kind == "overwrite":
        return True
    mine = {r[2] for r in rows_in}
    theirs = {r[2] for r in partner_rows}
    return bool(mine & theirs)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(st.tuples(_op, _partner), min_size=1, max_size=4))
def test_random_concurrent_interleavings_match_model(
    spark, make_tab, ops
):
    tab = make_tab("race_model")
    model_history: list[list[tuple]] = []
    model: list[tuple] = []

    def commit(table, kind, rows_in):
        df = spark.createDataFrame(rows_in, "id int, v string, day string")
        if kind == "overwrite":
            table.commit_overwrite(df, partition_by=["day"])
        elif kind == "append":
            table.commit_append(df, partition_by=["day"])
        else:
            table.commit_replace_partitions(df, ["day"])

    for (kind, rows_in), partner in ops:
        if partner is None:
            commit(tab, kind, rows_in)
            model = _apply_model(model, kind, rows_in)
            model_history.append(list(model))
            continue
        p_kind, p_rows = partner
        real_publish = tab._publish
        fired = {"done": False}

        def racing_publish(entry, _p=(p_kind, p_rows), _real=real_publish, _f=fired):
            if not _f["done"]:
                _f["done"] = True
                commit(tab.clone(), *_p)
            return _real(entry)

        tab._publish = racing_publish
        aborted = False
        try:
            commit(tab, kind, rows_in)
        except ConcurrentWriteConflict:
            aborted = True
        finally:
            tab._publish = real_publish
        assert aborted == _expect_abort(kind, rows_in, p_kind, p_rows), (
            kind, rows_in, p_kind, p_rows,
        )
        # partner landed first; the op follows only if it survived
        model = _apply_model(model, p_kind, p_rows)
        model_history.append(list(model))
        if not aborted:
            model = _apply_model(model, kind, rows_in)
            model_history.append(list(model))

    assert tab.latest_version() == len(model_history) - 1
    for v, snapshot in enumerate(model_history):
        got = sorted(
            ((r.id, r.v, r.day) for r in tab.read(spark, version=v).collect()),
            key=repr,
        )
        assert got == sorted(snapshot, key=repr), f"version {v} diverged"


# --- round-7: vacuum-vs-reader safety property (VERDICT r6 item 6) ---------
#
# Overwrite-only sequences make each version's files referenced by exactly
# that version, so retention maps 1:1 to file liveness: a reader pinned
# WITHIN the retention window must survive vacuum bit-exactly; a reader
# pinned OUTSIDE it must fail LOUD (missing files / missing log entry),
# never return a silently wrong answer.

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_vacuum_reader_safety_contract(spark, make_tab, data):
    from py4j.protocol import Py4JJavaError

    n_commits = data.draw(st.integers(2, 5), label="n_commits")
    pinned_v = data.draw(st.integers(0, n_commits - 1), label="pinned_version")
    keep = data.draw(st.integers(1, n_commits), label="keep_versions")

    tab = make_tab("vac_model")
    snapshots = []
    for v in range(n_commits):
        rows_in = [(v * 10 + k, f"w{v}", f"d{k}") for k in range(2)]
        df = spark.createDataFrame(rows_in, "id int, v string, day string")
        tab.commit_overwrite(df)
        snapshots.append(rows_in)

    pinned = tab.read(spark, version=pinned_v)  # file list resolved NOW
    tab.vacuum(keep_versions=keep, min_age_seconds=0)

    within_retention = pinned_v >= n_commits - keep
    if within_retention:
        got = sorted((r.id, r.v, r.day) for r in pinned.collect())
        assert got == sorted(snapshots[pinned_v])
        fresh = tab.read(spark, version=pinned_v)
        assert sorted((r.id, r.v, r.day) for r in fresh.collect()) == sorted(
            snapshots[pinned_v]
        )
    else:
        with pytest.raises((Py4JJavaError, FileNotFoundError)):
            pinned.collect()
        with pytest.raises(FileNotFoundError):
            tab.read(spark, version=pinned_v)


# --- round-7: full-lifecycle model soak -------------------------------------
#
# The commit-only model above never exercises restore/compact/vacuum inside
# a random sequence. This soak mixes ALL table operations (deterministic
# seed, version-number-keyed model snapshots) and checks every RETAINED
# version against its model — the property that caught nothing here but
# exposed an index-aliasing bug in a draft audit harness: snapshots must be
# keyed by the ACTUAL version number a commit returns, because vacuum
# shifts positional indices.

def test_full_lifecycle_random_sequences_match_model(spark, make_tab):
    import random

    rng = random.Random(4242)
    days = ["d0", "d1", "d2", None]
    for trial in range(4):
        tab = make_tab("lifecycle", checkpoint_interval=rng.choice([0, 2, 3, 5]))
        model: list = []
        snap: dict[int, list] = {}
        # round 9: the value column's LOGICAL name toggles v <-> w via
        # rename_column ops; every later op must bind to the live name,
        # and each retained version must read under ITS contemporaneous
        # name (snap_name books it per version)
        vname = "v"
        snap_name: dict[int, str] = {}
        cons_thresholds: dict[str, int] = {}  # name -> "id < thr" bound

        def book(v):
            snap[v] = list(model)
            snap_name[v] = vname

        for _ in range(rng.randint(8, 12)):
            kind = rng.choice(
                ["overwrite", "append", "replace", "restore", "compact",
                 "vacuum", "delete", "update", "delete_dv", "update_dv",
                 "merge", "selective_compact", "add_constraint",
                 "drop_constraint", "dsv2_append", "rename_value",
                 "rename_value", "reorg"]
            )
            if kind in ("overwrite", "append", "replace"):
                rows_in = [
                    (rng.randint(0, 20), rng.choice("abc"), rng.choice(days))
                    for _ in range(rng.randint(1, 4))
                ]
                df = spark.createDataFrame(
                    rows_in, f"id int, {vname} string, day string"
                )
                # an active CHECK constraint may reject the batch — the
                # abort is atomic (txn dir deleted, no version), so the
                # model simply doesn't change (round 8)
                try:
                    if kind == "overwrite":
                        v = tab.commit_overwrite(df, partition_by=["day"])
                        model = list(rows_in)
                    elif kind == "append":
                        v = tab.commit_append(df, partition_by=["day"])
                        model = model + rows_in
                    else:
                        v = tab.commit_replace_partitions(df, ["day"])
                        touched = {r[2] for r in rows_in}
                        model = [r for r in model if r[2] not in touched] + rows_in
                except CheckConstraintViolation:
                    # only possible when a constraint is active and some
                    # row's id breaches its threshold
                    assert any(
                        r[0] >= thr
                        for r in rows_in
                        for thr in cons_thresholds.values()
                    )
                    continue
                book(v)
            elif kind in ("delete", "delete_dv") and tab.versions() and model:
                # row-level delete (round 8): CoW rewrite or merge-on-read
                # deletion vector — same model either way, the mode is a
                # physical strategy, not a semantic one
                thr = rng.randint(0, 20)
                mode = "dv" if kind == "delete_dv" else "cow"
                nv = tab.delete_where(spark, f"id < {thr}", mode=mode)
                model = [r for r in model if not (r[0] < thr)]
                book(nv)  # no-op returns the current version
            elif kind in ("update", "update_dv") and tab.versions() and model:
                thr = rng.randint(0, 20)
                mode = "dv" if kind == "update_dv" else "cow"
                nv = tab.update_where(
                    spark, f"id >= {thr}", {vname: "'U'"}, mode=mode
                )
                model = [
                    (r[0], "U" if r[0] >= thr else r[1], r[2]) for r in model
                ]
                book(nv)
            elif kind == "merge" and tab.versions() and model:
                # clause-level MERGE (round 8): key-unique source carrying
                # updates, deletes, and an insert; duplicate TARGET ids all
                # take the clause (one source row may touch many rows)
                ids = sorted({r[0] for r in model})
                u = [i for i in ids if rng.random() < 0.3][:3]
                d = [i for i in ids if i not in u and rng.random() < 0.3][:3]
                new_id = rng.randint(0, 25)
                src_rows = (
                    [(i, "M", None, "U") for i in u]
                    + [(i, None, None, "D") for i in d]
                    + ([(new_id, "I", rng.choice(days), "I")]
                       if new_id not in u + d else [])
                )
                if not src_rows:
                    continue
                src = spark.createDataFrame(
                    src_rows, "sid int, sv string, sday string, op string"
                )
                try:
                    nv = (
                        tab.merge(spark, src, "t.id = s.sid")
                        .when_matched_update(
                            set={vname: "s.sv"}, condition="s.op = 'U'"
                        )
                        .when_matched_delete(condition="s.op = 'D'")
                        .when_not_matched_insert(
                            values={"id": "s.sid", vname: "s.sv", "day": "s.sday"},
                            condition="s.op = 'I'",
                        )
                        .execute()
                    )
                except CheckConstraintViolation:
                    assert any(
                        new_id >= thr for thr in cons_thresholds.values()
                    )
                    continue
                model = [
                    (r[0], "M" if r[0] in u else r[1], r[2])
                    for r in model
                    if r[0] not in d
                ]
                if new_id not in ids and new_id not in u + d:
                    model = model + [(new_id, "I", src_rows[-1][2])]
                book(nv)
            elif kind == "dsv2_append":
                # the DataSource writer path (round 8): executor-style
                # Arrow staging + the same commit loop, interleaved with
                # every other op under the same model — local store only
                # (the writer requires the shared POSIX namespace)
                from data_lakes_tp2_student_spark.io.datasource import (
                    ManifestBatchWriter,
                )
                from data_lakes_tp2_student_spark.io.logstore import (
                    LocalLogStore,
                )

                if not isinstance(tab.store, LocalLogStore):
                    continue
                rows_in = [
                    (rng.randint(0, 20), rng.choice("abc"), rng.choice(days))
                    for _ in range(rng.randint(1, 4))
                ]
                df = spark.createDataFrame(
                    rows_in, f"id int, {vname} string, day string"
                )
                if tab.column_mapping() is not None:
                    # round 9: the DataSource writer refuses column-mapped
                    # tables (it stages logical names verbatim) — pinned
                    # here so the refusal survives inside random sequences
                    import pytest as _pytest

                    with _pytest.raises(ValueError, match="column mapping"):
                        ManifestBatchWriter(
                            df.schema,
                            {"path": tab.root, "partitionby": "day"},
                            overwrite=False,
                        )
                    continue
                w = ManifestBatchWriter(
                    df.schema,
                    {"path": tab.root, "partitionby": "day"},
                    overwrite=False,
                )
                try:
                    msg = w.write(iter(df.toArrow().to_batches()))
                    w.commit([msg])
                except CheckConstraintViolation:
                    assert any(
                        r[0] >= thr
                        for r in rows_in
                        for thr in cons_thresholds.values()
                    )
                    continue
                model = model + rows_in
                book(tab.latest_version())
            elif kind == "add_constraint" and tab.versions():
                thr = rng.randint(5, 25)
                name = f"c{len(cons_thresholds)}_{thr}"
                try:
                    nv = tab.add_check_constraint(spark, name, f"id < {thr}")
                    cons_thresholds[name] = thr
                    book(nv)
                except CheckConstraintViolation:
                    # existing data already breaches the bound — rejected
                    assert any(r[0] >= thr for r in model)
            elif kind == "drop_constraint" and cons_thresholds:
                name = rng.choice(sorted(cons_thresholds))
                nv = tab.drop_check_constraint(name)
                del cons_thresholds[name]
                book(nv)
            elif kind == "selective_compact" and tab.versions():
                nv = tab.compact(
                    spark, small_file_bytes=rng.choice([1, 10**9])
                )
                book(nv)
            elif kind == "restore" and tab.versions():
                rv = rng.choice(tab.versions())
                nv = tab.restore(rv)
                model = list(snap[rv])
                # RESTORE brings back the version's contemporaneous
                # logical names (schema + mapping travel with it)
                vname = snap_name[rv]
                book(nv)
                # RESTORE republishes the restored version's metadata —
                # its constraint set comes back with it
                cons_thresholds = {
                    n: int(e.rsplit(" ", 1)[1])
                    for n, e in tab.constraints().items()
                }
            elif kind == "compact" and tab.versions():
                nv = tab.compact(spark)
                book(nv)
            elif kind == "reorg" and tab.versions():
                # DV purge (round 15, VERDICT r14 item 5): materializes
                # deletion vectors into rewritten files — physical-only,
                # the model is unchanged; interleaved here with every
                # other op (incl. the dv arms that stack what it purges)
                nv = tab.reorg(
                    spark, min_deleted_ratio=rng.choice([0.0, 0.5])
                )
                book(nv)
            elif kind == "rename_value" and tab.versions():
                new = "w" if vname == "v" else "v"
                nv = tab.rename_column(vname, new)
                vname = new
                book(nv)  # metadata-only: rows unchanged, name relabeled
            elif kind == "vacuum" and tab.versions() and rng.random() < 0.5:
                tab.vacuum(keep_versions=rng.randint(2, 6), min_age_seconds=0)
        for v in tab.versions():
            name = snap_name[v]
            got = sorted(
                (
                    (r.id, getattr(r, name), r.day)
                    for r in tab.read(spark, version=v).collect()
                ),
                key=repr,
            )
            assert got == sorted(snap[v], key=repr), (trial, v)
