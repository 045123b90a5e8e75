"""Catalog entries for sources/sinks (SURVEY.md §2 group A): CSV write+read
roundtrips prove format fidelity against the parquet-backed oracle views.

Roundtrip staging lives under <repo>/.tmp/ingest (driver testdata is
read-only); each query overwrites its own subdir, so reruns are idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..io.sinks import write_csv
from ..io.sources import read_csv_headered, read_csv_headerless
from ..registry import load, register

_TMP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".tmp",
    "ingest",
)

NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


@register("a2_csv_headerless_roundtrip", oracle="SELECT * FROM nation")
def a2_csv_headerless_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a2+a4 — headerless CSV sink then source with imposed schema
    (ref: pd.read_csv(names=[...]), build/unpack_to_raw.py:40-43).
    Lossless roundtrip ⇒ result equals the source parquet table."""
    path = f"{_TMP}/a2_nation"
    write_csv(load(spark, sf_dir, "nation"), path, header=False)
    return read_csv_headerless(spark, path, NATION_SCHEMA)


@register("a3_csv_headered_roundtrip", oracle="SELECT * FROM customer")
def a3_csv_headered_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a3+a4 — headered CSV roundtrip with imposed schema
    (ref: src/preprocess_to_staging.py:115-116)."""
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    path = f"{_TMP}/a3_customer"
    write_csv(load(spark, sf_dir, "customer"), path, header=True)
    return read_csv_headered(spark, path, schema)


@register("a1_multipath_scan", oracle="SELECT * FROM nation")
def a1_multipath_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a1+g1 — sharded directory layout ({train,test,dev} subdirs) read as
    one multi-path scan (ref walks subfolders per-file,
    build/unpack_to_raw.py:34-44; Spark's union is the read itself)."""
    n = load(spark, sf_dir, "nation")
    shards = {
        "train": n.filter("n_nationkey % 3 = 0"),
        "test": n.filter("n_nationkey % 3 = 1"),
        "dev": n.filter("n_nationkey % 3 = 2"),
    }
    root = f"{_TMP}/a1_nation"
    for sub, df in shards.items():
        write_csv(df, f"{root}/{sub}", header=False)
    return read_csv_headerless(
        spark, [f"{root}/{s}" for s in ("train", "test", "dev")], NATION_SCHEMA
    )
