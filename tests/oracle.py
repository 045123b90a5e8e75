"""Local replica of the driver's DuckDB-oracle differential check.

For a registered query: run the Spark DataFrame and the oracle SQL on the
same parquet tables, then compare row count, sorted column names, and the
full multiset of values (columns sorted by name — the driver's hash is
order-insensitive over that layout). Exact equality is required: queries are
expected to round floating aggregates identically on both sides.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from data_lakes_tp2_student_spark.registry import REGISTRY, TABLES


def run_duckdb(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _canon(v):
    """Canonicalize one value for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, _dt.date):
        return v
    if isinstance(v, bytes):
        return v
    return v


def _sorted_multiset(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_query(spark, name: str, sf_dir: str) -> None:
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        assert len(s_rows) >= 0  # rows-only smoke
        return
    d_cols, d_rows = run_duckdb(q.oracle, sf_dir)
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_ms = _sorted_multiset(s_cols, s_rows)
    d_ms = _sorted_multiset(d_cols, d_rows)
    if s_ms != d_ms:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_ms, d_ms)) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
