"""Sources (SURVEY.md §2 a1-a3).

Reference behavior: per-file pandas `read_csv` loops with a hardcoded column
list for headerless shards (/root/reference/build/unpack_to_raw.py:34-44) and
boto3 get_object + BytesIO for staged files (src/preprocess_to_staging.py:
115-116). In Spark, multi-path + glob reads are native: one `spark.read.csv`
call covers the whole sharded layout, schema imposed explicitly (inference
off by default — a full-data pass at 100 TB), and each file becomes one or
more input splits processed in parallel (the reference serialized ~100 shards
through one process).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

# The reference's raw contract: 5 string columns, headerless
# (/root/reference/build/unpack_to_raw.py:42).
PFAM_RAW_SCHEMA = T.StructType(
    [
        T.StructField("sequence", T.StringType()),
        T.StructField("family_accession", T.StringType()),
        T.StructField("sequence_name", T.StringType()),
        T.StructField("aligned_sequence", T.StringType()),
        T.StructField("family_id", T.StringType()),
    ]
)


def read_csv_headerless(
    spark: SparkSession, paths: str | list[str], schema: T.StructType
) -> DataFrame:
    """a1/a2 — headerless CSV with imposed schema; `paths` may be a single
    path, a glob, or a list (e.g. the train/test/dev shard dirs) — the
    multi-path read subsumes the reference's per-file loop + concat (g1)."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.schema(schema).csv(paths, header=False)


def read_csv_headered(
    spark: SparkSession, paths: str | list[str], schema: T.StructType | None = None
) -> DataFrame:
    """a3 — headered CSV (staged files). Schema imposed when given;
    inference is opt-in only (extra full scan)."""
    if isinstance(paths, str):
        paths = [paths]
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(paths)


def read_csv_with_quarantine(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType,
    header: bool = False,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Resilient ingest: PERMISSIVE CSV read that returns
    ``(good_rows, quarantine)`` instead of failing the job or silently
    null-filling garbage.

    A malformed line (wrong arity, unparseable typed field) lands with
    its RAW TEXT in `corrupt_col` and nulls elsewhere; the split sends
    clean rows onward and quarantines the raw lines for repair/audit —
    the lakehouse badRecords pattern without a vendor sink. At 100 TB
    this is the difference between one bad shard killing a 10-hour
    ingest (FAILFAST), corrupting it silently (DROPMALFORMED), and a
    reviewable quarantine table.

    Spark only materializes `corrupt_col` when the parsed rows are
    cached or the column is selected from the same scan — both frames
    here derive from ONE cached PERMISSIVE scan, so the file is read
    once and the semantics are stable (the reference's pandas read_csv
    simply raises on ragged lines — its whole ingest is FAILFAST).

    The quarantine frame carries (`corrupt_col`) only."""
    if isinstance(paths, str):
        paths = [paths]
    full = T.StructType(
        schema.fields + [T.StructField(corrupt_col, T.StringType())]
    )
    parsed = (
        spark.read.schema(full)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(paths)
        .cache()
    )
    good = parsed.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = parsed.filter(F.col(corrupt_col).isNotNull()).select(
        corrupt_col
    )
    return good, quarantine
