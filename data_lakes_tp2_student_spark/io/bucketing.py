"""Bucketed tables: pre-shuffled storage for co-located joins/aggregates
(SURVEY.md §4 "Partitioning & shuffle"; the scale lever the other sinks
don't cover).

A bucketed table is hash-partitioned ON DISK by its bucket columns into a
fixed bucket count, recorded in the catalog. Every later equi-join or
aggregation on those columns then reads each bucket as an already-correct
partition — NO Exchange in the plan: the shuffle a fact-to-fact join would
otherwise pay per query is paid ONCE at write time. This is the standard
answer for a 100 TB fact table joined daily on the same key (Delta
clustering / Hive bucketing / Iceberg bucket transforms are the same
idea); broadcast handles the small-dim side, bucketing handles
big-to-big.

Requires a catalog (`saveAsTable`) — a plain `.parquet(path)` write keeps
the data but LOSES the bucket metadata, so path-reads cannot elide the
shuffle; that is a Spark contract, not a choice here. Plan-level proof in
`tests/test_bucketed_join.py`: bucketed join AND bucketed groupBy plans
contain zero Exchange nodes; the unbucketed twins contain them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a catalog table bucketed (and optionally
    sorted-within-bucket) by `bucket_cols`. Pick `n_buckets` so a bucket
    fits executor memory at the target scale (buckets do not split: a
    100 TB table wants thousands of buckets, not 8); joins elide their
    shuffle only when both sides agree on bucket columns and the counts
    are compatible."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read — carries the bucket spec into the plan (a path read
    would not)."""
    return spark.table(table_name)
