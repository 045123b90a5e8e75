"""Sinks (SURVEY.md §2 a4, a7).

Reference behavior: `to_csv` into a local temp file, then boto3 upload, then
delete (/root/reference/build/unpack_to_raw.py:54-68) — the temp-materialize
dance (a7) is obsolete: Spark writers commit straight to the destination via
the Hadoop committer. Internal zones are Parquet (columnar, statistics,
partition pruning); CSV remains for export parity with the reference.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


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


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Partition-level upsert: with dynamic partitionOverwriteMode, an
    overwrite write replaces ONLY the partitions present in `df` — untouched
    partitions keep their existing files byte-for-byte.

    This is the idempotent incremental-load primitive at scale (the
    replaceWhere / INSERT OVERWRITE PARTITION pattern): a late-arriving or
    corrected day re-writes one date directory of a 100 TB table instead of
    the table, and re-running the same load is a no-op-equivalent. The
    reference re-uploads whole-table CSVs per stage instead
    (build/unpack_to_raw.py:57). Verified file-level in
    tests/test_plan_quality.py::test_dynamic_partition_overwrite."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ceil(total_bytes / target_file_bytes) files of ~target size.

    The small-files problem is the classic failure mode of streaming /
    per-batch ingestion at scale: a 100 TB table written in 1M × 100 MB-ish
    micro-batch files costs a scan 1M file-open round-trips and starves the
    scheduler with tiny splits. Sizing is read from the filesystem via the
    Hadoop FS API, so the same code paths work on local disk, HDFS, or s3a.
    Round-robin ``repartition(n)`` (not ``coalesce``) is deliberate:
    coalesce merges without a shuffle but inherits upstream skew — equal-size
    output files need the exchange. Returns the output file count."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src)
    fs = p.getFileSystem(hconf)
    total = fs.getContentSummary(p).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src).repartition(n).write.mode("overwrite").parquet(dst)
    return n
