"""s3a connector configuration (SURVEY.md §2 a5).

Reference behavior: a boto3 client pointed at LocalStack with per-object
get/put calls (/root/reference/build/unpack_to_raw.py:17-22,
src/preprocess_to_staging.py:104-109). Spark replaces per-object code with
the Hadoop s3a filesystem: `spark.read.parquet("s3a://bucket/key")` works
once the endpoint/credentials are configured. This helper only produces the
config map — no network code lives in the engine.

Note: the hadoop-aws jars are not bundled in this image, so this is
config-surface parity; it is unit-tested for the produced values only.
"""

from __future__ import annotations


def s3a_conf(
    endpoint: str = "http://localhost:4566",
    access_key: str = "test",
    secret_key: str = "test",
    path_style: bool = True,
) -> dict[str, str]:
    """Config for an S3-compatible endpoint (defaults mirror the reference's
    LocalStack setup). Pass to `get_spark(extra_conf=...)`."""
    return {
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.access.key": access_key,
        "spark.hadoop.fs.s3a.secret.key": secret_key,
        "spark.hadoop.fs.s3a.path.style.access": str(path_style).lower(),
        "spark.hadoop.fs.s3a.connection.ssl.enabled": str(
            endpoint.startswith("https")
        ).lower(),
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
    }
