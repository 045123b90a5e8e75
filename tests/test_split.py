"""Unit + property tests for the stratified split (SURVEY.md §5.2/§5.4).

The reference's per-class-size arithmetic
(/root/reference/src/preprocess_to_staging.py:45-68):
n==1 -> test; n==2 -> dev+test; n==3 -> one per split;
n>=4 -> num_test=int(n*0.33), num_dev=int((n-num_test)*0.33), rest train.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_lakes_tp2_student_spark.operators.split import stratified_split


def expected_counts(n: int) -> dict[str, int]:
    if n == 1:
        return {"test": 1}
    if n == 2:
        return {"dev": 1, "test": 1}
    if n == 3:
        return {"train": 1, "dev": 1, "test": 1}
    num_test = int(n * 0.33)
    num_dev = int((n - num_test) * 0.33)
    out = {"test": num_test, "dev": num_dev, "train": n - num_test - num_dev}
    return {k: v for k, v in out.items() if v}


def _make_df(spark, class_sizes: list[int]):
    rows, pk = [], 0
    for ci, n in enumerate(class_sizes):
        for _ in range(n):
            rows.append((pk, f"class_{ci:04d}"))
            pk += 1
    return spark.createDataFrame(rows, "pk bigint, cls string")


def _split_counts(spark, class_sizes):
    df = stratified_split(_make_df(spark, class_sizes), "cls", "pk")
    out = {}
    for r in df.groupBy("cls", "split").count().collect():
        out.setdefault(r["cls"], {})[r["split"]] = r["count"]
    return out


def test_special_sizes(spark):
    counts = _split_counts(spark, [1, 2, 3, 4, 10, 100])
    assert counts["class_0000"] == {"test": 1}
    assert counts["class_0001"] == {"dev": 1, "test": 1}
    assert counts["class_0002"] == {"train": 1, "dev": 1, "test": 1}
    for ci, n in [(3, 4), (4, 10), (5, 100)]:
        assert counts[f"class_{ci:04d}"] == expected_counts(n)


def test_deterministic_across_partitioning(spark):
    df = _make_df(spark, [7, 13, 1, 2])
    a = stratified_split(df, "cls", "pk").select("pk", "split").collect()
    b = stratified_split(df.repartition(7, "pk"), "cls", "pk").select(
        "pk", "split"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=8))
def test_split_arithmetic_property(spark, class_sizes):
    counts = _split_counts(spark, class_sizes)
    for ci, n in enumerate(class_sizes):
        assert counts[f"class_{ci:04d}"] == expected_counts(n)
