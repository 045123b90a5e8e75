"""The reference's three-stage Pfam pipeline, rebuilt as one lazy Spark flow.

Reference (each stage a separate pandas process exchanging whole CSVs through
LocalStack S3 — SURVEY.md §3):
  1. unpack_to_raw      (/root/reference/build/unpack_to_raw.py)
  2. preprocess_to_staging (/root/reference/src/preprocess_to_staging.py)
  3. process_to_curated (/root/reference/src/process_to_curated.py)

Here each stage is a DataFrame function; zone writes are Parquet (staging
partitioned by split → downstream split reads are partition-pruned scans).
The whole pipeline is shuffle-minimal: one class-partition shuffle for the
split window, one K-row exchange for the label mapping and weights, zero
collect().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io.sinks import write_csv
from ..io.sources import PFAM_RAW_SCHEMA, read_csv_headerless
from ..io.zones import Warehouse
from ..operators.label import apply_label_mapping, label_mapping
from ..operators.split import stratified_split
from ..operators.tokenize import tokenize_esm2, widen_tokens
from ..operators.weights import class_weights


def unpack_to_raw(
    spark: SparkSession, shard_root: str, wh: Warehouse
) -> DataFrame:
    """Stage 1 — multi-path headerless CSV ingest over the train/test/dev
    shard dirs (a1/a2/g1), landed as one raw Parquet table
    (ref: build/unpack_to_raw.py:34-57)."""
    paths = [f"{shard_root}/{sub}" for sub in ("train", "test", "dev")]
    df = read_csv_headerless(spark, paths, PFAM_RAW_SCHEMA)
    wh.write(df, "raw", "pfam")
    return df


def preprocess_to_staging(
    spark: SparkSession, wh: Warehouse, class_col: str = "family_accession"
) -> dict[str, DataFrame]:
    """Stage 2 — clean, label-encode, stratified split, class weights
    (ref: src/preprocess_to_staging.py:85-190).

    Returns the staged tables; writes them under staging/ (the split table
    partitioned by `split` so per-split readers scan only their partition).
    """
    raw = wh.read(spark, "raw", "pfam")
    clean = raw.na.drop("any")  # b1

    mapping = label_mapping(clean, class_col)  # e1
    encoded = apply_label_mapping(clean, mapping, class_col)  # c1 broadcast

    # e2 — deterministic md5-keyed split (the reference's unseeded
    # np.random.permutation is irreproducible by construction).
    split = stratified_split(encoded, class_col, "sequence_name")
    staged = split.drop("family_id", "sequence_name", class_col)  # b2

    weights = class_weights(clean, class_col)  # d9/d10

    wh.write(staged, "staging", "pfam", partition_by=["split"])
    wh.write(mapping, "staging", "label_mapping")
    wh.write(weights, "staging", "class_weights")
    return {"staged": staged, "mapping": mapping, "weights": weights}


def process_to_curated(
    spark: SparkSession,
    wh: Warehouse,
    max_len: int = 1024,
    wide_export: bool = False,
) -> DataFrame:
    """Stage 3 — tokenize sequences to fixed width (ref:
    src/process_to_curated.py:22-29). Uses `tokenize_esm2` — EXACT vocab-id
    parity with the reference's HF ESM2 default (:85) via pure expressions;
    `tokenize_chars` remains the generic fallback. Tokens stay ArrayType
    internally (SURVEY.md §4 codegen note); `wide_export=True` adds the
    reference's token_0..token_N physical layout for export parity (b5)."""
    staged = wh.read(spark, "staging", "pfam")
    if "sequence" not in staged.columns:  # b4 schema guard
        raise ValueError("staging table must contain a 'sequence' column")
    tokens = tokenize_esm2(staged, "sequence", max_len=max_len)
    out = widen_tokens(tokens, width=max_len) if wide_export else tokens
    wh.write(out, "curated", "pfam")
    return out


def export_csv(df: DataFrame, path: str) -> None:
    """a4 — headered CSV export parity (`to_csv(index=False)`)."""
    write_csv(df, path, header=True)


def run_pipeline(
    spark: SparkSession,
    shard_root: str,
    warehouse_root: str,
    max_len: int = 1024,
    wh: Warehouse | None = None,
) -> dict[str, DataFrame]:
    """EP1 — the whole dvc-repro flow in one session (SURVEY.md §3).
    Pass `wh=SnapshotWarehouse(root)` for atomic versioned zone commits
    with time travel (io/zones.py); default is the plain parquet-dir
    warehouse."""
    wh = wh or Warehouse(warehouse_root)
    wh.ensure()
    unpack_to_raw(spark, shard_root, wh)
    staged = preprocess_to_staging(spark, wh)
    curated = process_to_curated(spark, wh, max_len=max_len)
    return {**staged, "curated": curated}
