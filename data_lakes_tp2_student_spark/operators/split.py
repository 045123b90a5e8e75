"""Per-class stratified train/dev/test split (SURVEY.md §2 e2 — flagship).

Reference behavior (/root/reference/src/preprocess_to_staging.py:14-74):
for each class of size n —
  n == 1 -> the row goes to test;
  n == 2 -> one row to dev, one to test;
  n == 3 -> one row to each of train/dev/test;
  n >= 4 -> shuffle, then num_test = int(n*0.33),
            num_dev = int((n - num_test)*0.33), remainder train —
implemented there as a Python loop over ~18K classes with an *unseeded*
``np.random.permutation`` (irreproducible by design-accident).

Spark-first rebuild: the whole loop collapses into two window functions over
a deterministic shuffle key plus one CASE expression — one shuffle of the
fact table (hash-partition by class), no driver-side iteration, linear at any
scale. Determinism: rows are ordered inside each class by
``md5(cast(pk AS string))`` (tie-broken by pk), which is stable under any
repartitioning AND portable to the DuckDB oracle — `F.rand(seed)` is neither.

Canonical assignment order (ours, since the reference's is irreproducible):
within the md5 order, n>=4 classes take test first, then dev, then train;
n==2 -> (dev, test); n==3 -> (train, dev, test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def stratified_split(
    df: DataFrame,
    class_col: str,
    pk_col: str,
    test_ratio: float = 0.33,
    dev_ratio: float = 0.33,
    split_col: str = "split",
) -> DataFrame:
    """Attach a `split` column ('train'|'dev'|'test') per the reference's
    per-class-size rules, deterministically."""
    shuffle_key = F.md5(F.col(pk_col).cast("string"))
    w_order = Window.partitionBy(class_col).orderBy(shuffle_key, F.col(pk_col))
    w_class = Window.partitionBy(class_col)

    r = F.row_number().over(w_order)
    n = F.count(F.lit(1)).over(w_class)
    # int() truncates toward zero; counts are >= 0 so floor is exact (h3).
    num_test = F.floor(n * F.lit(float(test_ratio))).cast("bigint")
    num_dev = F.floor((n - num_test) * F.lit(float(dev_ratio))).cast("bigint")

    split = (
        F.when(n == 1, F.lit("test"))
        .when(n == 2, F.when(r == 1, "dev").otherwise("test"))
        .when(n == 3, F.when(r == 1, "train").when(r == 2, "dev").otherwise("test"))
        .otherwise(
            F.when(r <= num_test, "test")
            .when(r <= num_test + num_dev, "dev")
            .otherwise("train")
        )
    )
    return df.withColumn(split_col, split)


def split_counts(split_df: DataFrame, split_col: str = "split") -> DataFrame:
    """Per-split row counts (the reference prints these as progress)."""
    return (
        split_df.groupBy(split_col)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(split_col)
    )
