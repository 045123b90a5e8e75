"""Property test for the manifest DataSource's pushFilters pruning
(io/datasource.py): file skipping must be SOUND — every file containing
at least one row that satisfies the conjunction of pushed predicates
must survive pruning. (Completeness is not required: extra surviving
files are fine, Spark re-applies every predicate row-level.)

The table is built once; each hypothesis example then exercises
pushFilters + partitions() purely driver-side against the known
file→rows mapping — hundreds of random filter conjunctions without
launching a Spark job per example.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    LessThan,
    LessThanOrEqual,
)

from data_lakes_tp2_student_spark.io.datasource import ManifestBatchReader
from data_lakes_tp2_student_spark.io.manifest import ManifestTable


@pytest.fixture(scope="module")
def table_and_rows(spark, tmp_path_factory):
    """A partitioned, stats-carrying table plus the exact rows each
    committed file holds (read back per file via pyarrow)."""
    import pyarrow.parquet as pq

    root = str(tmp_path_factory.mktemp("pushdown") / "t")
    rows = [
        (i, (i * 7919) % 50, f"g{i % 4}", float((i * 31) % 23))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id int, k int, g string, x double")
    tab = ManifestTable(root, stats_cols=["id", "k", "x"])
    tab.commit_overwrite(df.repartition(8, "id"), partition_by=["g"])
    m = tab.manifest(0)
    _b, paths = tab.store.resolve_read([e["path"] for e in m["files"]])
    per_file = []
    for e, p in zip(m["files"], paths):
        t = pq.read_table(p)
        g = e["partition"]["g"]
        per_file.append(
            (
                e["path"],
                [
                    (i_, k_, g, x_)
                    for i_, k_, x_ in zip(
                        t["id"].to_pylist(),
                        t["k"].to_pylist(),
                        t["x"].to_pylist(),
                    )
                ],
            )
        )
    schema = tab.read(spark).schema
    return root, schema, per_file


_COLS = ["id", "k", "g", "x"]


def _col_value(draw, col):
    if col == "g":
        return draw(st.sampled_from(["g0", "g1", "g2", "g3", "g9"]))
    if col == "x":
        return draw(
            st.one_of(
                st.floats(-5, 30, allow_nan=False),
                st.just(float("nan")),
            )
        )
    return draw(st.integers(-10, 60))


@st.composite
def _filters(draw):
    n = draw(st.integers(1, 4))
    out = []
    for _ in range(n):
        col = draw(st.sampled_from(_COLS))
        kind = draw(
            st.sampled_from(["eq", "eqns", "gt", "ge", "lt", "le", "in"])
        )
        v = _col_value(draw, col)
        attr = (col,)
        if kind == "eq":
            out.append(EqualTo(attr, v))
        elif kind == "eqns":
            out.append(EqualNullSafe(attr, v))
        elif kind == "gt":
            out.append(GreaterThan(attr, v))
        elif kind == "ge":
            out.append(GreaterThanOrEqual(attr, v))
        elif kind == "lt":
            out.append(LessThan(attr, v))
        elif kind == "le":
            out.append(LessThanOrEqual(attr, v))
        else:
            vs = tuple(
                _col_value(draw, col) for _ in range(draw(st.integers(1, 3)))
            )
            out.append(In(attr, vs))
    return out


def _spark_semantics(op, a, b):
    """Row-level truth of `a <op> b` under Spark's total order where NaN
    sorts GREATER than every double (the semantics pruning must never
    contradict)."""
    fa = isinstance(a, float)
    if fa and (math.isnan(a) or (isinstance(b, float) and math.isnan(b))):
        an = math.isnan(a)
        bn = isinstance(b, float) and math.isnan(b)
        if op == "eq":
            return an and bn
        key_a = (1 if an else 0, a if not an else 0)
        key_b = (1 if bn else 0, b if not bn else 0)
        if op == "gt":
            return key_a > key_b
        if op == "ge":
            return key_a >= key_b
        if op == "lt":
            return key_a < key_b
        return key_a <= key_b
    if op == "eq":
        return a == b
    if op == "gt":
        return a > b
    if op == "ge":
        return a >= b
    if op == "lt":
        return a < b
    return a <= b


def _row_matches(row, f):
    val = dict(zip(_COLS, row))[f.attribute[0]]
    if isinstance(f, In):
        return any(_spark_semantics("eq", val, v) for v in f.value)
    if isinstance(f, (EqualTo, EqualNullSafe)):
        return _spark_semantics("eq", val, f.value)
    op = {
        GreaterThan: "gt",
        GreaterThanOrEqual: "ge",
        LessThan: "lt",
        LessThanOrEqual: "le",
    }[type(f)]
    return _spark_semantics(op, val, f.value)


@settings(
    max_examples=200,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(filters=_filters())
def test_pruning_never_drops_a_file_with_qualifying_rows(
    table_and_rows, filters
):
    root, schema, per_file = table_and_rows
    reader = ManifestBatchReader(schema, {"path": root})
    handed_back = list(reader.pushFilters(filters))
    assert handed_back == filters  # every predicate returns to Spark
    survivors = {
        p.rel for p in reader.partitions() if getattr(p, "rel", "")
    }
    for rel, rows in per_file:
        if any(all(_row_matches(r, f) for f in filters) for r in rows):
            assert rel in survivors, (rel, filters)


def test_pruned_scan_results_exact_under_random_conjunction(
    spark, table_and_rows
):
    """One end-to-end sanity pass through Spark for a representative
    conjunction (partition eq + int range + float bound incl. NaN)."""
    from data_lakes_tp2_student_spark.io.datasource import ManifestDataSource

    spark.dataSource.register(ManifestDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    root, _schema, per_file = table_and_rows
    got = (
        spark.read.format("manifest").option("path", root).load()
        .filter((F.col("g") == "g1") & (F.col("k") >= 25) & (F.col("x") > 10.0))
    )
    exp = [
        r
        for _rel, rows in per_file
        for r in rows
        if r[2] == "g1" and r[1] >= 25 and (math.isnan(r[3]) or r[3] > 10.0)
    ]
    assert sorted(map(tuple, got.collect())) == sorted(exp)
