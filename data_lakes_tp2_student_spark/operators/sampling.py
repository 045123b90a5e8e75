"""Deterministic weighted sampling (SURVEY.md §2 X — corpus curation).

Training-data pipelines sample documents proportionally to a weight
(length, quality score, domain temperature) — but `df.sample()` is
partitioning-dependent and irreproducible across engines. This module
implements Efraimidis–Spirakis A-ES weighted sampling WITHOUT replacement
(Inf. Process. Lett. 97(5), 2006): each row gets key u^(1/w) for a uniform
u, and the k largest keys form an exact weighted sample. Taking logs,
key = ln(u)/w preserves the order and avoids pow underflow at tiny weights.

Determinism: u comes from the first 48 bits of md5(id) — the same
engine-portable hash trick as the e2 split and f6 stratified sample
(`F.conv(hex, 16, 10)` here and `CAST('0x'||hex AS BIGINT)` in the DuckDB
oracle are bit-identical, so the sample set is reproducible anywhere).

Scale shape: the key is a map-side expression; top-k goes through
TakeOrderedAndProject (per-partition heaps + a k-row final merge), so the
exchange carries k rows, never the corpus. The reference's only sampling is
`np.random.permutation` over in-memory indices
(src/preprocess_to_staging.py:144-148) — unseeded, single-node,
irreproducible; this operator is its distributed, reproducible analog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_U_BITS = 48


def md5_uniform(col: Column) -> Column:
    """Uniform (0, 1] double from the first 48 bits of md5(col).

    48 bits fit a double's 52-bit mantissa exactly, so the division is
    lossless and any engine parsing the same hex window computes the same
    bit pattern. Guarded away from 0 so ln(u) stays finite (Spark's log
    returns NULL at 0, DuckDB's -inf — the guard keeps both on the same
    branch)."""
    u = F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast(
        "double"
    ) / F.pow(F.lit(2.0), _U_BITS)
    return F.greatest(u, F.pow(F.lit(2.0), -_U_BITS))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    key_col: str = "sample_key",
    decimals: int = 9,
) -> DataFrame:
    """k-row weighted sample without replacement (A-ES): rows with the k
    largest ln(u)/w keys, deterministic ties broken by id. Rows with
    non-positive weight are excluded (zero weight = never sampled, matching
    the limit of the A-ES key as w → 0+)."""
    key = F.round(
        F.log(md5_uniform(F.col(id_col))) / F.col(weight_col), decimals
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn(key_col, key)
        .orderBy(F.desc(key_col), id_col)
        .limit(k)
    )


def stratified_weighted_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    key_col: str = "sample_key",
    decimals: int = 9,
) -> DataFrame:
    """Exactly k-per-stratum weighted sample without replacement: the A-ES
    key ranked WITHIN each stratum. Combines the f6 stratified shape with
    the x35 weighted key — domain-balanced, quality-weighted corpus draws
    in one pass.

    Scale shape: one hash exchange by stratum; Catalyst plans the ranked
    filter as WindowGroupLimit, so each map task keeps only its local
    top-k per stratum before the shuffle — the exchange carries ~k·strata
    rows (same property test_plan_quality pins for f6)."""
    key = F.round(
        F.log(md5_uniform(F.col(id_col))) / F.col(weight_col), decimals
    )
    w = Window.partitionBy(stratum_col).orderBy(F.desc(key_col), id_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn(key_col, key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(*df.columns, key_col, F.col("_rn").cast("bigint").alias("rank_in_stratum"))
    )
