"""Sinks (SURVEY.md §2 a4, a7).

Reference behavior: `to_csv` into a local temp file, then boto3 upload, then
delete (/root/reference/build/unpack_to_raw.py:54-68) — the temp-materialize
dance (a7) is obsolete: Spark writers commit straight to the destination via
the Hadoop committer. Internal zones are Parquet (columnar, statistics,
partition pruning); CSV remains for export parity with the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Zone write. `partition_by` (e.g. ["split"]) gives partition pruning
    on downstream reads — the reference rewrites whole CSVs instead."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    """a4 — CSV with header (`to_csv(index=False)` parity)."""
    df.write.mode(mode).option("header", header).csv(path)
