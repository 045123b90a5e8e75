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


def hilbert_key(x: Column, y: Column, bits: int = 6) -> Column:
    """Hilbert-curve index of a 2-D grid point — the locality-tighter
    alternative to `zorder_key`: consecutive Hilbert indices are ALWAYS
    grid-adjacent (unit Manhattan step), while the Morton curve jumps
    across the plane at power-of-two boundaries; files cut from a
    Hilbert-sorted order therefore get tighter per-file min/max boxes on
    both dimensions (Delta's OPTIMIZE switched Z-order -> Hilbert for the
    same reason).

    Pure unrolled column expressions (the classic bitwise xy2d walk, one
    rotation/reflection level per bit) — no UDF, whole-stage codegen. The
    expression tree doubles per level, so `bits` stays small by default:
    6 bits = a 64x64 grid = 4096 buckets, plenty for FILE-level
    clustering (you need about as many cells as target files, not row
    resolution); 8 bits measured a planner/codegen heap blow-up on a
    loaded driver, so the guard stops at the measured-safe ceiling."""
    if bits > 6:
        raise ValueError("hilbert_key: expression tree doubles per bit; use <= 6")
    X, Y = x.cast("long"), y.cast("long")
    d = F.lit(0).cast("long")
    s = 1 << (bits - 1)
    while s > 0:
        rx = F.when(X.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(Y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        d = d + F.lit(s) * F.lit(s) * ((F.lit(3) * rx).bitwiseXOR(ry))
        # rotate/reflect the lower quadrant so the curve stays continuous
        nX = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - Y).otherwise(Y)
        ).otherwise(X)
        nY = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - X).otherwise(X)
        ).otherwise(Y)
        X, Y = nX, nY
        s >>= 1
    return d


def hilbert_by(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 6
) -> DataFrame:
    """`zorder_by` with the Hilbert key (2 columns): quantize against
    global bounds, range-partition by Hilbert index, sort within
    partitions. Same one-exchange cost, tighter file boxes.

    `bits` is capped at 6 (a 64x64 grid = 4096 curve cells): the unrolled
    key doubles in expression size per bit and the generated code blows
    the JVM heap around 8 bits (measured) — and file-level clustering
    only needs about as many cells as target FILES anyway. A deeper grid
    would belong to a numpy `mapInPandas` key, acceptable for a layout
    job (bulk rewrite, not a query hot path), but 4096 cells covers any
    realistic files-per-partition target."""
    if len(cols) != 2:
        raise ValueError("hilbert_by is 2-D; use zorder_by for other arities")
    if bits > 6:
        raise ValueError("hilbert_by: bits > 6 blows codegen; 64x64 cells suffice")
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    )
    # Materialize the quantized coordinates BEFORE the unrolled key: the
    # key expression references each coordinate O(2^bits) times, and every
    # reference would otherwise inline a copy of the whole quantize
    # subtree (measured: planner heap blow-up at bits=8). A select()
    # boundary makes each reference a plain attribute. An extra eager
    # projection keeps CollapseProject from re-inlining through it.
    quantized = df.crossJoin(F.broadcast(bounds)).select(
        *df.columns,
        *[
            quantize(F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits).alias(
                f"_q_{c}"
            )
            for c in cols
        ],
    )
    with_key = quantized.withColumn(
        "_h", hilbert_key(F.col(f"_q_{cols[0]}"), F.col(f"_q_{cols[1]}"), bits)
    )
    return (
        with_key.repartitionByRange(n_files, "_h")
        .sortWithinPartitions("_h")
        .drop("_h", *[f"_q_{c}" for c in cols])
    )
