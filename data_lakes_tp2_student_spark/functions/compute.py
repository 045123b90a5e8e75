"""Compute-layout helpers.

`spread` decouples compute parallelism from input file layout: a scan of one
parquet file (or a few large row groups) yields one task, so expression-heavy
per-row stages (shingling, hashing, tokenization — higher-order functions run
interpreted, not codegen'd) would run single-threaded no matter how many
cores exist. A cheap round-robin repartition before such stages buys full
parallelism; at cluster scale the same call evens out skewed file sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition to `parallelism` (default: cluster default
    parallelism) ahead of a compute-heavy stage."""
    n = parallelism or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def eager(df: DataFrame) -> DataFrame:
    """Persist AND materialize now.

    `persist()` alone is lazy; when the persisted subtree feeds several
    broadcast-exchange builds, Spark launches those builds concurrently
    (separate jobs) and each races to compute the not-yet-cached subtree —
    a cache stampede that multiplies the most expensive pipeline stage
    (measured 3-6× wall on the minhash→LSH→verify chain). One cheap count()
    fills the cache before the fan-out, so every consumer reads blocks."""
    df = df.persist()
    df.count()
    return df
