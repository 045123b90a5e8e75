"""s3a object-store integration (SURVEY.md §2 a5; VERDICT r2 item 6).

The reference moves every byte through S3 (LocalStack): build/unpack_to_raw.py
:17-22, src/preprocess_to_staging.py:104-109, src/process_to_curated.py:39-45.
The Spark-first equivalent is the Hadoop s3a filesystem + `io.s3.s3a_conf`.

This image bundles neither the hadoop-aws jars nor an S3 endpoint, and the
build may not install packages — so the end-to-end roundtrip here is GATED:
it runs (and must pass) in any environment that provides both, and skips
with an explicit reason otherwise. The config surface itself is always
unit-tested below.
"""

from __future__ import annotations

import os
import uuid

import pytest

from data_lakes_tp2_student_spark.io.s3 import s3a_conf


def test_s3a_conf_values():
    conf = s3a_conf(endpoint="https://s3.example.test", path_style=False)
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "https://s3.example.test"
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "true"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "false"
    assert (
        conf["spark.hadoop.fs.s3a.impl"]
        == "org.apache.hadoop.fs.s3a.S3AFileSystem"
    )


def _s3a_classes_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        return True
    except Exception:  # noqa: BLE001 — Py4J wraps ClassNotFoundException
        return False


def test_s3a_parquet_roundtrip(spark):
    """End-to-end s3a write+read. Requires hadoop-aws on the classpath AND
    an S3-compatible endpoint named by $SPARK_GRAFT_S3_ENDPOINT (e.g. a
    LocalStack as in the reference's docker-compose). Skips loudly when the
    environment cannot provide them — the skip reason IS the documented
    limitation."""
    if not _s3a_classes_available(spark):
        pytest.skip(
            "hadoop-aws jars not bundled in this image (pip/apt installs "
            "are not permitted here); s3a has config-surface parity only — "
            "see io/s3.py and README 'Limitations'"
        )
    endpoint = os.environ.get("SPARK_GRAFT_S3_ENDPOINT")
    if not endpoint:
        pytest.skip(
            "no S3-compatible endpoint available "
            "(set SPARK_GRAFT_S3_ENDPOINT, e.g. a LocalStack URL)"
        )
    for k, v in s3a_conf(endpoint=endpoint).items():
        spark.conf.set(k, v)
    uri = f"s3a://spark-graft-test/{uuid.uuid4().hex}/roundtrip.parquet"
    df = spark.range(100).selectExpr("id", "id * 2 AS doubled")
    df.write.mode("overwrite").parquet(uri)
    back = spark.read.parquet(uri)
    assert back.count() == 100
    assert back.selectExpr("sum(doubled)").first()[0] == 9900
