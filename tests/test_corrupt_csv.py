"""Resilient CSV ingest: malformed lines quarantine instead of killing
the job or silently null-filling (io/sources.py:read_csv_with_quarantine).
The reference's pandas ingest is all-or-nothing — one ragged shard line
raises and the whole unpack stage dies."""

from __future__ import annotations

from pyspark.sql import types as T

from data_lakes_tp2_student_spark.io.sources import read_csv_with_quarantine

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _write(tmp_path, lines):
    p = tmp_path / "data.csv"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_bad_typed_field_quarantines(spark, tmp_path):
    path = _write(
        tmp_path,
        [
            "1,alice,0.5",
            "2,bob,not_a_number",  # unparseable double
            "3,carol,0.9",
        ],
    )
    good, quarantine = read_csv_with_quarantine(spark, path, SCHEMA)
    assert sorted(r.id for r in good.collect()) == [1, 3]
    q = [r["_corrupt_record"] for r in quarantine.collect()]
    assert q == ["2,bob,not_a_number"]  # raw line preserved for repair


def test_clean_file_quarantines_nothing(spark, tmp_path):
    path = _write(tmp_path, ["1,a,0.1", "2,b,0.2"])
    good, quarantine = read_csv_with_quarantine(spark, path, SCHEMA)
    assert good.count() == 2
    assert quarantine.count() == 0


def test_good_rows_keep_declared_schema(spark, tmp_path):
    path = _write(tmp_path, ["1,a,0.1", "x,y,z"])
    good, _ = read_csv_with_quarantine(spark, path, SCHEMA)
    assert [f.name for f in good.schema.fields] == ["id", "name", "score"]
    row = good.collect()[0]
    assert row.id == 1 and abs(row.score - 0.1) < 1e-12
