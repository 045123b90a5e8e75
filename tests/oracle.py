"""Local replica of the driver's DuckDB-oracle differential check.

Driver-grade strictness (VERDICT r2 item 2): the driver lands both sides in
pandas (Spark ``toPandas``, DuckDB ``.df()``), sorts, STRINGIFIES values and
hashes the strings — so ``Decimal('123.40')`` vs ``123.4`` and bigint ``5``
vs float ``5.0`` are driver-RED even though they compare equal as Python
numbers. This module reproduces that: every value is canonicalized to a
string before comparison, so local green ⇒ driver green.

Observed driver tolerances reproduced here: timestamp RESOLUTION differences
(datetime64[ns] vs [us]) and date-vs-midnight-timestamp hash EQUAL (r02:
i3/i7/i8/c7/x8/x13 all pass with unit-mismatched dtypes), so datetimes
canonicalize through ``pd.Timestamp(...).isoformat()``. Int WIDTH (int32 vs
int64) stringifies identically and is tolerated. Array/map/struct outputs
crash the driver's canonicalizer (r02: d8c, x5b) → hard local failure.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import numpy as np
import pandas as pd

from data_lakes_tp2_student_spark.registry import REGISTRY, TABLES

NON_PORTABLE_SPARK_TYPES = ("array", "map", "struct", "decimal")


def run_duckdb_df(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    df = con.execute(sql).df()
    con.close()
    return df


def _str(v) -> str:
    """One value → the canonical comparison string (mirrors the driver's
    stringify-after-pandas hashing, with its observed datetime tolerance)."""
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, np.datetime64):
        v = pd.Timestamp(v)
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        if pd.isna(v):
            return "NULL"
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_localize(None)
        return ts.isoformat()
    if isinstance(v, _dt.date):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (np.floating, float)):
        return str(float(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def canon_strings(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    """(sorted column names, row-multiset as sorted tuples of canonical
    strings). Sorting happens on the stringified tuples, so both engines
    order identically regardless of landing dtype."""
    cols = sorted(pdf.columns)
    rows = [
        tuple(_str(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def spark_nonportable_fields(sdf) -> list[str]:
    """Output columns whose Spark type cannot survive the driver's
    pandas-stringify-hash round trip."""
    return [
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName() in NON_PORTABLE_SPARK_TYPES
    ]


def check_tolerance(name: str, spd: pd.DataFrame, opd: pd.DataFrame) -> None:
    """Sketch-bound gate (VERDICT r9 item 5): for a rows-only sketch query
    with a ``tol_oracle``, assert every Spark value sits inside the exact
    [``<col>_lo``, ``<col>_hi``] interval the oracle computed. Single-row
    contract (both registered sketches are 1-row aggregates): a sketch
    whose output is per-group would need a keyed variant — fail loudly
    rather than guess an alignment."""
    assert len(spd) == 1 and len(opd) == 1, (
        f"{name}: tolerance oracle requires exactly one row on both sides "
        f"(spark={len(spd)}, oracle={len(opd)})"
    )
    want = sorted([f"{c}_lo" for c in spd.columns] + [f"{c}_hi" for c in spd.columns])
    assert sorted(opd.columns) == want, (
        f"{name}: tol_oracle columns {sorted(opd.columns)} != expected {want}"
    )
    srow, orow = spd.iloc[0], opd.iloc[0]
    for c in spd.columns:
        v, lo, hi = float(srow[c]), float(orow[f"{c}_lo"]), float(orow[f"{c}_hi"])
        assert lo <= v <= hi, (
            f"{name}: sketch value {c}={v} outside exact bound [{lo}, {hi}]"
        )


def compare_query(spark, name: str, sf_dir: str) -> None:
    try:
        _compare_query(spark, name, sf_dir)
    finally:
        # Some operators persist() intermediates (graph ops, k-means,
        # sparse cosine) and leave eviction to the session; the full
        # 178-query gate would otherwise accumulate cached blocks
        # (review r5). The bench harness does the same per query.
        spark.catalog.clearCache()


def _compare_query(spark, name: str, sf_dir: str) -> None:
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    bad = spark_nonportable_fields(sdf)
    assert not bad, (
        f"{name}: non-portable Spark output dtypes {bad} "
        f"(decimal renders trailing zeros; containers crash the driver canon)"
    )
    spd = sdf.toPandas()
    if q.oracle is None:
        if q.tol_oracle is not None:
            check_tolerance(name, spd, run_duckdb_df(q.tol_oracle, sf_dir))
            return
        assert len(spd) >= 0  # rows-only smoke
        return
    opd = run_duckdb_df(q.oracle, sf_dir)
    s_cols, s_rows = canon_strings(spd)
    d_cols, d_rows = canon_strings(opd)
    assert s_cols == d_cols, (
        f"{name}: column mismatch spark={s_cols} duckdb={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
