"""MERGE / upsert emulation (CDC pattern).

Delta/Iceberg `MERGE INTO` needs their jars (not in this image); the
classic lakehouse emulation is anti-join + union: rows of the target whose
key has no update survive, updated/new rows come from the source. At scale
both sides hash-partition on the key — one shuffle each, no row-by-row
merge. SCD2 variants add validity-interval columns on the same skeleton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Upsert `source` into `target` by `key`: source rows win on conflict,
    unmatched target rows survive. Schemas must match by name."""
    kept = target.join(source.select(key), on=key, how="left_anti")
    return kept.unionByName(source)
