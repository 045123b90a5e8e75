"""Medallion zones (SURVEY.md §1): raw → staging → curated.

Reference behavior: three S3 buckets on LocalStack, whole-file CSV objects as
the inter-stage contract, with per-stage bucket-ensure boilerplate
(/root/reference/build/unpack_to_raw.py:24-29 etc., a6). Here a zone is a
namespace of Parquet tables under a warehouse root (filesystem or s3a:// —
same code path via the Hadoop filesystem layer). Bucket-ensure collapses to
`os.makedirs` / the writer creating the path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .sinks import write_parquet

ZONES = ("raw", "staging", "curated")


@dataclass(frozen=True)
class Warehouse:
    """Three-zone warehouse rooted at `root` (local dir or s3a:// URI)."""

    root: str

    def path(self, zone: str, table: str) -> str:
        if zone not in ZONES:
            raise ValueError(f"unknown zone {zone!r}; expected one of {ZONES}")
        return f"{self.root}/{zone}/{table}"

    def write(
        self,
        df: DataFrame,
        zone: str,
        table: str,
        partition_by: list[str] | None = None,
    ) -> str:
        p = self.path(zone, table)
        write_parquet(df, p, partition_by=partition_by)
        return p

    def read(self, spark: SparkSession, zone: str, table: str) -> DataFrame:
        return spark.read.parquet(self.path(zone, table))

    def ensure(self) -> None:
        """a6 — create-if-missing for local roots (s3a needs no pre-create;
        the committer writes keys directly)."""
        if "://" not in self.root:
            for z in ZONES:
                os.makedirs(os.path.join(self.root, z), exist_ok=True)


@dataclass(frozen=True)
class SnapshotWarehouse(Warehouse):
    """Zones as snapshot-committed manifest tables (io/manifest.py): every
    `write` is an atomic versioned commit and every `read` pins a
    snapshot — re-running a stage (or the whole dvc-repro flow) produces
    a NEW version of each refreshed table while the previous run stays
    byte-readable (time travel), and a stage killed mid-write leaves the
    zone exactly as it was. The reference's whole-file CSV clobbering
    (build/unpack_to_raw.py:57) offers none of this; the plain
    `Warehouse` improves it to parquet-dir overwrites but a failed
    overwrite still destroys the previous state. Drop-in: `run_pipeline`
    takes either via its `wh` parameter.

    Restriction (ADVICE r6): unlike the plain `Warehouse`, the root must
    be a LOCAL path — the manifest log's primitives (os.link publish,
    os.walk listing) don't traverse the Hadoop filesystem layer, so an
    s3a:// root would commit empty file lists; `ManifestTable.__init__`
    rejects `://` roots loudly."""

    def table(self, zone: str, table: str):
        from .manifest import ManifestTable

        return ManifestTable(self.path(zone, table))

    def write(
        self,
        df: DataFrame,
        zone: str,
        table: str,
        partition_by: list[str] | None = None,
    ) -> str:
        self.table(zone, table).commit_overwrite(df, partition_by=partition_by)
        return self.path(zone, table)

    def read(self, spark: SparkSession, zone: str, table: str) -> DataFrame:
        return self.table(zone, table).read(spark)
