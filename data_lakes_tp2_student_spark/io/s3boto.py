"""Executable S3 object-store connector (SURVEY.md §2 a5/a6/a7).

The reference's ENTIRE inter-stage contract is boto3 against an
S3-compatible endpoint: ensure bucket, upload the stage's whole CSV,
download it in the next stage (ref: build/unpack_to_raw.py:17-22,54-68;
src/preprocess_to_staging.py:104-109; src/process_to_curated.py:39-45).
This module executes that exact contract with Spark DataFrames on both
ends — boto3 is bundled in this image (unlike the hadoop-aws jars the s3a
JVM path needs, which stay env-gated in `io/s3.py` / tests/test_s3a.py).

Scale honesty, stated once: whole-object CSV exchange routes every byte
through one process, because that IS the reference's semantics (each
stage is a separate pandas process doing full-file get/put). At lake
scale the seam swaps for `s3a://` direct reads/writes (config in
`io/s3.py`) — executors stream their own splits and the driver never
touches data; everything above the transport (zones, stage functions,
incremental repro) is unchanged. The tests run the FULL three-stage
pipeline across a real (moto) S3 endpoint.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class S3ObjectStore:
    """Thin boto3 wrapper for whole-object CSV exchange with Spark ends."""

    def __init__(
        self,
        endpoint: str,
        access_key: str = "test",
        secret_key: str = "test",
        region: str = "us-east-1",
    ) -> None:
        import boto3

        self.client = boto3.client(
            "s3",
            endpoint_url=endpoint,
            aws_access_key_id=access_key,
            aws_secret_access_key=secret_key,
            region_name=region,
        )
        self._tmp_files: list[str] = []

    def ensure_bucket(self, name: str) -> None:
        """a6 — the reference's per-stage create-if-missing boilerplate
        (idempotent; re-ensuring an owned bucket is a no-op)."""
        try:
            self.client.create_bucket(Bucket=name)
        except self.client.exceptions.ClientError as e:
            code = e.response.get("Error", {}).get("Code", "")
            if code not in ("BucketAlreadyOwnedByYou", "BucketAlreadyExists"):
                raise

    def put_csv(
        self, df: DataFrame, bucket: str, key: str, header: bool = True
    ) -> None:
        """a4/a7 — land a DataFrame as ONE CSV object: Spark writes the
        CSV (distributed), the parts are streamed into a single object in
        part order, and the temp dir is cleaned — the reference's
        to_csv → upload → delete dance with a distributed writer."""
        with tempfile.TemporaryDirectory() as tmp:
            out = os.path.join(tmp, "csv")
            # single part: one object per stage is the reference contract;
            # multi-part CSVs would repeat the header per part
            df.coalesce(1).write.option("header", header).csv(out)
            parts = sorted(
                f for f in os.listdir(out)
                if f.startswith("part-") and f.endswith(".csv")
            )
            body = b"".join(
                Path(out, p).read_bytes() for p in parts
            )
        self.client.put_object(Bucket=bucket, Key=key, Body=body)

    def get_csv(
        self,
        spark: SparkSession,
        bucket: str,
        key: str,
        schema=None,
        header: bool = True,
    ) -> DataFrame:
        """Fetch one CSV object and hand it to the Spark reader (schema
        imposed when given, else header inference) — the reference's
        read_csv-from-S3, Spark-ended. The temp file must OUTLIVE the
        returned DataFrame (Spark re-reads it lazily), so the store tracks
        it; call `cleanup()` once consumers are done materializing."""
        fd, path = tempfile.mkstemp(suffix=".csv", prefix="s3obj-")
        self._tmp_files.append(path)
        with os.fdopen(fd, "wb") as f:
            f.write(
                self.client.get_object(Bucket=bucket, Key=key)["Body"].read()
            )
        reader = spark.read.option("header", header)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.csv(path)

    def cleanup(self) -> None:
        """Remove every temp file fetched by get_csv. Safe to call more
        than once; DataFrames returned earlier become unreadable after."""
        for path in self._tmp_files:
            try:
                os.unlink(path)
            except OSError:
                pass
        self._tmp_files.clear()

    def list_keys(self, bucket: str, prefix: str = "") -> list[str]:
        out, token = [], None
        while True:
            kw = {"Bucket": bucket, "Prefix": prefix}
            if token:
                kw["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kw)
            out += [o["Key"] for o in resp.get("Contents", [])]
            if not resp.get("IsTruncated"):
                return sorted(out)
            token = resp.get("NextContinuationToken")


def run_pipeline_s3(
    spark: SparkSession,
    store: S3ObjectStore,
    shard_root: str,
    max_len: int = 1024,
) -> dict[str, DataFrame]:
    """EP1 with the reference's EXACT transport: three buckets, one CSV
    object per table, each stage reading its input back from the object
    store — executable parity for the LocalStack flow the reference's
    dvc.yaml drives (buckets raw/staging/curated, a5/a6/a7)."""
    from ..io.sources import PFAM_RAW_SCHEMA, read_csv_headerless
    from ..operators.label import apply_label_mapping, label_mapping
    from ..operators.split import stratified_split
    from ..operators.tokenize import tokenize_esm2
    from ..operators.weights import class_weights

    for b in ("raw", "staging", "curated"):
        store.ensure_bucket(b)

    # stage 1: shards -> one combined raw CSV object
    paths = [f"{shard_root}/{sub}" for sub in ("train", "test", "dev")]
    raw = read_csv_headerless(spark, paths, PFAM_RAW_SCHEMA)
    store.put_csv(raw, "raw", "combined_raw.csv")

    # stage 2: raw object -> clean/encode/split/weights -> staging objects
    raw_back = store.get_csv(
        spark, "raw", "combined_raw.csv", schema=PFAM_RAW_SCHEMA
    )
    clean = raw_back.na.drop("any")
    mapping = label_mapping(clean, "family_accession")
    encoded = apply_label_mapping(clean, mapping, "family_accession")
    split = stratified_split(encoded, "family_accession", "sequence_name")
    staged = split.drop("family_id", "sequence_name", "family_accession")
    store.put_csv(staged, "staging", "preprocessed.csv")
    store.put_csv(mapping, "staging", "label_mapping.csv")
    store.put_csv(class_weights(clean, "family_accession"), "staging", "class_weights.csv")

    # stage 3: staging object -> tokenize -> curated object (typed:
    # a schemaless CSV read would surface every column as string)
    staged_back = store.get_csv(
        spark, "staging", "preprocessed.csv", schema=staged.schema
    )
    tokens = tokenize_esm2(staged_back, "sequence", max_len=max_len)
    # CSV has no array type: export the reference's comma-joined form
    from pyspark.sql import functions as F

    flat = tokens.withColumn(
        "tokens", F.concat_ws(",", F.col("tokens").cast("array<string>"))
    )
    store.put_csv(flat, "curated", "tokenized.csv")
    # The curated write materialized every upstream temp fetch — drop them
    # now (review r5) instead of holding them for the whole process, and
    # hand back FRESH fetches whose temps the caller owns (next cleanup()).
    store.cleanup()
    return {
        "raw": store.get_csv(spark, "raw", "combined_raw.csv", schema=PFAM_RAW_SCHEMA),
        "staged": store.get_csv(spark, "staging", "preprocessed.csv", schema=staged.schema),
        "curated": store.get_csv(spark, "curated", "tokenized.csv"),
    }
