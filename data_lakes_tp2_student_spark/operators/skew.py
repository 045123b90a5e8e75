"""Skew-safe aggregation (scale pattern; SURVEY.md §4 parallelism row).

A group-by on a low-cardinality/hot key (e.g. 3 return flags over billions of
lineitems) concentrates each key's rows in one reducer. Salting splits every
hot key into `salt_buckets` sub-keys for the first (partial) aggregation, then
combines the partials — two small shuffles instead of one skewed one. AQE's
skew-join handling covers joins; this covers aggregations with algebraic
aggregates (count/sum/min/max).

Results are identical to the direct group-by (count/sum are associative) —
the catalog oracle for the salted query is the PLAIN grouped SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.money import dec2


def salted_group_count_sum(
    df: DataFrame, key: str, sum_col: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-stage salted count+sum by `key`, equivalent to
    `df.groupBy(key).agg(count(*), sum(dec2(sum_col)))`."""
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(dec2(sum_col)).alias("_s"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").alias(f"sum_{sum_col}"),
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: every fact row gets a pseudo-random salt in
    [0, salt_buckets); the dim side is replicated once per salt value
    (explode of a literal range — dim_rows × salt_buckets, fine for any
    dimension you'd consider sort-merge-joining); the join key becomes
    (key, salt), so one hot key's rows spread across `salt_buckets`
    reducers instead of one.

    Result is row-identical to `facts.join(dim, fact_key == dim_key)` —
    salting only changes WHERE rows meet. Use when a key is hot enough to
    straggle a sort-merge join and the dim side is too big to broadcast;
    AQE's skew-join split handles moderate skew automatically, salting is
    the explicit/portable form."""
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    f = facts.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return f.join(
        d, (f["_salt"] == d["_salt"]) & (f[fact_key] == d[dim_key])
    ).drop("_salt")
