"""Entity resolution: sorted-neighborhood candidate generation + edit
distance verify (SURVEY.md §2 X — record linkage / fuzzy dedup).

Sorted-Neighborhood Method (Hernandez & Stolfo, SIGMOD'95): sort records by
a key, slide a fixed window of `w` over the sorted order, and compare only
records within the same window — candidate count is O(n·w), never O(n²).
It is the sort-based complement of the hash-based blockings already in the
engine (MinHash bands x2, SimHash x2c, sign-LSH x3b): hash blocking needs a
similarity-preserving hash; SNM only needs a sort key that co-locates
matches, so it covers typo-style variation that token hashing misses.

Scale shape — two pieces, both shuffle-bounded:

1. GLOBAL RANK without a single-task global sort: the same two-phase rank
   as e3c (catalog/analytics.py) with string-PREFIX bands instead of
   numeric ranges — band = first character of the sort key is a
   deterministic, monotone function of the key, so per-band local
   row_number + the band's cumulative row offset (a tiny broadcast
   aggregate) is the exact global rank; each sort task touches one band.
   At 100 TB widen the prefix (2–3 chars) until bands fit an executor.
2. WINDOW JOIN without a range join: ranks band into buckets of width
   `w`; a row can only pair with rows in its own or the adjacent bucket,
   so exploding each left row to (bucket, bucket+1) turns the range
   condition into an equi-join; the residual `1 <= rb - ra <= w` filter
   runs post-join. Same trick as the banded interval join (c6b).

Levenshtein runs only on the O(n·w) candidates — JVM builtin
(`F.levenshtein`), no UDF.

The reference deduplicates nothing (its pandas pipeline assumes clean
keys); Layer-B extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def snm_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 5,
    max_dist: int = 2,
) -> DataFrame:
    """Sorted-neighborhood match pairs: records within `window` positions
    of the (key, id)-sorted order whose keys are within `max_dist` edits.
    Output: (id_a, id_b, dist), id_a sorted before id_b."""
    rows = df.select(F.col(id_col).alias("_id"), F.col(key_col).alias("_key"))
    banded = rows.withColumn("_band", F.substring("_key", 1, 1))
    # tiny per-band counts -> each band's global rank offset (broadcast)
    pc = banded.groupBy("_band").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_band").rowsBetween(Window.unboundedPreceding, -1)
    offsets = pc.select(
        "_band", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    w_local = Window.partitionBy("_band").orderBy("_key", "_id")
    ranked = (
        banded.withColumn("_lrn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_band")
        .select("_id", "_key", (F.col("_off") + F.col("_lrn")).alias("_rnk"))
    )
    # window join as a bucketed equi-join: partner ranks live in this or
    # the next w-bucket
    left = ranked.select(
        F.col("_id").alias("id_a"),
        F.col("_key").alias("_ka"),
        F.col("_rnk").alias("_ra"),
        F.explode(
            F.array(
                (F.col("_rnk") / window).cast("bigint"),
                (F.col("_rnk") / window).cast("bigint") + 1,
            )
        ).alias("_bkt"),
    )
    right = ranked.select(
        F.col("_id").alias("id_b"),
        F.col("_key").alias("_kb"),
        F.col("_rnk").alias("_rb"),
        (F.col("_rnk") / window).cast("bigint").alias("_bkt"),
    )
    return (
        left.join(right, "_bkt")
        .filter(
            (F.col("_rb") > F.col("_ra"))
            & (F.col("_rb") <= F.col("_ra") + window)
        )
        .withColumn("dist", F.levenshtein("_ka", "_kb"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )
    # no pair dedup needed: partner's single bucket equals exactly one of
    # the two exploded left buckets, so each (ra, rb) joins at most once
