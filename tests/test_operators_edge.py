"""Edge-case unit tests (SURVEY.md §5.2): empty input, all-null rows,
single-class weights, short-text tokenize/shingles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lakes_tp2_student_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    with_shingles,
)
from data_lakes_tp2_student_spark.operators.label import label_encode
from data_lakes_tp2_student_spark.operators.split import stratified_split
from data_lakes_tp2_student_spark.operators.stats import table_summary
from data_lakes_tp2_student_spark.operators.tokenize import tokenize_chars
from data_lakes_tp2_student_spark.operators.weights import class_weights


@pytest.fixture(scope="module")
def empty(spark):
    return spark.createDataFrame([], "pk bigint, cls string, text string")


def test_empty_input_flows_through(spark, empty):
    assert stratified_split(empty, "cls", "pk").count() == 0
    assert class_weights(empty, "cls").count() == 0
    assert label_encode(empty, "cls").count() == 0
    assert exact_dedup(empty, "text", "pk").count() == 0
    assert minhash_signatures(empty, "pk", "text").count() == 0
    row = table_summary(empty, "text", "cls").first()
    assert row["n_rows"] == 0 and row["n_classes"] == 0


def test_all_null_dropna(spark):
    df = spark.createDataFrame(
        [(None, None), (1, "a"), (None, "b")], "pk bigint, cls string"
    )
    assert df.na.drop("any").count() == 1


def test_single_class_weight_is_one(spark):
    df = spark.createDataFrame([(i, "only") for i in range(5)], "pk bigint, cls string")
    rows = class_weights(df, "cls").collect()
    assert len(rows) == 1 and rows[0]["weight"] == 1.0


def test_tokenize_short_and_exact_width(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "abcd"), (3, "")], "pk bigint, t string")
    out = {r["pk"]: r["tokens"] for r in tokenize_chars(df, "t", max_len=4).collect()}
    assert out[1] == [97, 98, 0, 0]
    assert out[2] == [97, 98, 99, 100]
    assert out[3] == [0, 0, 0, 0]


def test_shingles_short_text_fallback(spark):
    df = spark.createDataFrame([(1, "one two")], "pk bigint, t string")
    row = with_shingles(df, "t").first()
    assert row["shingles"] == ["one two"]  # < 3 words -> whole text


def test_exact_dedup_keeps_lowest_tiebreak(spark):
    df = spark.createDataFrame(
        [(3, "same"), (1, "same"), (2, "other")], "pk bigint, text string"
    )
    kept = sorted(r["pk"] for r in exact_dedup(df, "text", "pk").collect())
    assert kept == [1, 2]


def test_label_encode_dense_codes(spark):
    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "c"), (4, "a")], "pk bigint, cls string"
    )
    codes = {
        r["cls"]: r["class_encoded"]
        for r in label_encode(df, "cls").select("cls", "class_encoded").collect()
    }
    assert codes == {"a": 0, "b": 1, "c": 2}
