"""Physical-plan assertions (the 100 TB story, checked mechanically):
filter pushdown, partition pruning on partitioned zone writes, and
shuffle-free joins via bucketing.
"""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_column_pruning(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = li.filter(F.col("l_shipdate") < "1996-01-01").select(
        "l_orderkey", "l_extendedprice"
    )
    p = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in p
    # pruned scan: only the three referenced columns reach the reader
    schema_line = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in schema_line and "l_comment" not in schema_line
    assert schema_line.count(":") <= 4


def test_partition_pruning_on_partitioned_write(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "docs_by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    df = spark.read.parquet(out).filter(F.col("lang") == "en")
    p = plan_of(df)
    assert "PartitionFilters" in p and "lang" in p
    # only the lang=en directory is scanned
    n_en = docs.filter(F.col("lang") == "en").count()
    assert df.count() == n_en


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """bucketBy co-locates both sides on the join key: the sort-merge join
    plan contains NO Exchange — the shape that survives a 100× scale-up."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        orders.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy(
            "o_orderkey"
        ).saveAsTable("b_orders")
        li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy(
            "l_orderkey"
        ).saveAsTable("b_lineitem")
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        p = plan_of(j)
        assert "Exchange" not in p, f"bucketed join still shuffles:\n{p}"
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
