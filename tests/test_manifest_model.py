"""Model-based property test for the manifest layer (hypothesis): a random
sequence of commits must keep every historical snapshot equal to an
in-memory model of the table — the whole-layer invariant (snapshot
isolation + replace semantics + append semantics) under operation orders
no hand-written test enumerates."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_lakes_tp2_student_spark.io.manifest import ManifestTable

DAYS = ["d0", "d1", "d2"]

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
def test_random_commit_sequences_match_model(spark, tmp_path_factory, ops):
    tab = ManifestTable(str(tmp_path_factory.mktemp("model") / "t"))
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
        got = sorted(
            (r.id, r.v, r.day) for r in tab.read(spark, version=v).collect()
        )
        assert got == sorted(snapshot), f"version {v} diverged"


@pytest.mark.parametrize("seed", [0])
def test_model_smoke(spark, tmp_path, seed):
    """Deterministic pin of one interesting sequence (replace after
    append after overwrite across all days)."""
    tab = ManifestTable(str(tmp_path / "t"))
    mk = lambda rows: spark.createDataFrame(rows, "id int, v string, day string")
    tab.commit_overwrite(mk([(1, "a", "d0"), (2, "b", "d1")]), ["day"])
    tab.commit_append(mk([(3, "c", "d2")]), ["day"])
    tab.commit_replace_partitions(mk([(4, "d", "d1"), (5, "e", "d1")]), ["day"])
    assert sorted((r.id, r.day) for r in tab.read(spark).collect()) == [
        (1, "d0"), (3, "d2"), (4, "d1"), (5, "d1"),
    ]
    assert tab.read(spark, version=0).count() == 2
    assert tab.read(spark, version=1).count() == 3
