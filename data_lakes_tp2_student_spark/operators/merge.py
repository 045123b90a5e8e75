"""MERGE / upsert emulation (CDC pattern).

Delta/Iceberg `MERGE INTO` needs their jars (not in this image); the
classic lakehouse emulation is anti-join + union: rows of the target whose
key has no update survive, updated/new rows come from the source. At scale
both sides hash-partition on the key — one shuffle each, no row-by-row
merge. SCD2 variants add validity-interval columns on the same skeleton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Upsert `source` into `target` by `key`: source rows win on conflict,
    unmatched target rows survive. Schemas must match by name."""
    kept = target.join(source.select(key), on=key, how="left_anti")
    return kept.unionByName(source)


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attr: str,
    batch_id: int,
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge: apply an update batch to a
    history-keeping dimension.

    ``dim`` carries (key, attr, valid_from, valid_to) with open rows having
    ``valid_to IS NULL``; ``updates`` carries (key, attr) new values. Only
    the OPEN row of a key participates: if its tracked value actually
    CHANGES it is closed (``valid_to = batch_id``) and a new open row is
    appended; no-op updates and untouched keys pass through, and CLOSED
    history rows always pass through untouched (they are immutable audit
    records) — so replaying the same batch is idempotent and every key
    keeps exactly one open row.

    Scale shape: ONE left join hash-partitioned on the key (broadcast when
    the CDC batch is small — the normal case) and a union of three
    projections of that join; no window, no per-key loop. History grows by
    exactly the changed-row count per batch.

    NULL handling: the change test is null-safe (``eqNullSafe``), so an open
    row whose tracked value is NULL still closes when a non-null update
    arrives (plain ``!=`` would evaluate to NULL and silently drop the row
    from BOTH branches). ``_new IS NULL`` after the left join means "key not
    in batch" — an update that explicitly sets NULL is indistinguishable and
    treated as a no-op, which the docstring contract (updates carry new
    values) accepts. The update batch is deduplicated on the key so a dirty
    CDC feed cannot fan one open row out into several."""
    new = F.col("_new")
    open_row = F.col("valid_to").isNull()
    joined = dim.join(
        updates.select(key, F.col(attr).alias("_new")).dropDuplicates([key]),
        key,
        "left",
    )
    is_change = open_row & new.isNotNull() & ~new.eqNullSafe(F.col(attr))
    changed = joined.filter(is_change)
    untouched = joined.filter(~is_change).drop("_new")
    closed = changed.select(
        key,
        attr,
        "valid_from",
        F.lit(batch_id).cast("bigint").alias("valid_to"),
    )
    opened = changed.select(
        key,
        new.alias(attr),
        F.lit(batch_id).cast("bigint").alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
    )
    return untouched.unionByName(closed).unionByName(opened)
