"""Physical-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping.

A single-column sort gives parquet files tight min/max statistics on ONE
column; any predicate on a second column still scans every file. Z-ordering
interleaves the bits of several columns so rows close in the multi-dim space
land in the same files — every z-ordered column gets usable (if wider)
min/max ranges, and a scan with predicates on any subset of them can skip
most files/row-groups. This is the lakehouse OPTIMIZE ZORDER BY primitive
(Delta/Iceberg expose the same idea); here it is pure column expressions +
a range repartition, so it runs on any Spark and any store.

The reference (sarafa19/Data-Lakes-tp2-student) writes monolithic
unordered CSVs (build/unpack_to_raw.py:57) — no layout control at all.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton code: interleave the low `bits` bits of each (non-negative
    integer) column into one long. All bit ops — stays in whole-stage
    codegen; no UDF.

    With k columns, bit i of column j lands at position i*k + j, so the
    result fits 64 bits while k*bits <= 63."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long")
    parts = [
        F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), i * k + j)
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def quantize(c: Column, lo: Column, hi: Column, bits: int = 16) -> Column:
    """Scale a numeric column to the [0, 2^bits) integer grid given its
    bounds (pass exact min/max, or approximate bounds at scale — skipping
    quality degrades gracefully with bound error)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1))
    scaled = (c.cast("double") - lo) / span * F.lit((1 << bits) - 1)
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def zorder_by(df: DataFrame, cols: list[str], n_files: int, bits: int = 16) -> DataFrame:
    """Cluster `df` for multi-dim data skipping on `cols`: quantize each
    column against its global bounds, range-partition by the interleaved
    Morton key into `n_files` buckets, and sort within partitions.

    Scale shape: the bounds pass is one tiny all-column min/max aggregate
    (broadcast back as a 1-row crossJoin — no collect in the plan path);
    the clustering itself is ONE range exchange + local sort, the same cost
    as any total sort of the data. Write the result with one file per
    partition and every z-column's file-level min/max becomes selective."""
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    )
    with_key = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_z",
        zorder_key(
            [
                quantize(F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits)
                for c in cols
            ],
            bits,
        ),
    )
    clustered = (
        with_key.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])
    )
    return clustered
