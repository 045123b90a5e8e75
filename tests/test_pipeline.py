"""Pipeline E2E (SURVEY.md §5.3): pfam-shaped fixture through
raw → staging → curated, asserting the reference's invariants.

Fixture follows FIXTURES.md §1: headerless CSV shards under train/test/dev,
class sizes covering every split branch (1, 2, 3, ≥4), ~1% nulls.
"""

from __future__ import annotations

import csv
import os
import random

import pytest
from pyspark.sql import functions as F

from data_lakes_tp2_student_spark.io.zones import Warehouse
from data_lakes_tp2_student_spark.pipeline.pfam import run_pipeline

AA = "ACDEFGHIKLMNPQRSTVWY"
MAX_LEN = 128  # pipeline default is 1024; smaller keeps the test fast


@pytest.fixture(scope="module")
def shard_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pfam_shards")
    rng = random.Random(42)
    class_sizes = {"PF1": 1, "PF2": 2, "PF3": 3, "PF4": 7, "PF5": 40, "PF6": 200}
    rows = []
    for fam, n in class_sizes.items():
        for i in range(n):
            seq = "".join(rng.choice(AA) for _ in range(rng.randint(30, 200)))
            rows.append(
                [seq, f"{fam}.1", f"{fam}_{i}/1-{len(seq)}", seq, fam]
            )
    # ~1% nulls (empty CSV field -> null on read) to exercise dropna
    for i in range(0, len(rows), 100):
        rows[i][3] = ""
    rng.shuffle(rows)
    for sub, sl in [("train", rows[:200]), ("dev", rows[200:220]), ("test", rows[220:])]:
        d = root / sub
        os.makedirs(d, exist_ok=True)
        with open(d / "data-00000", "w", newline="") as f:
            csv.writer(f).writerows(sl)
    return str(root)


@pytest.fixture(scope="module")
def result(spark, shard_root, tmp_path_factory):
    wh_root = str(tmp_path_factory.mktemp("warehouse"))
    out = run_pipeline(spark, shard_root, wh_root, max_len=MAX_LEN)
    return {**out, "wh": Warehouse(wh_root), "root": wh_root}


def test_raw_zone_union(spark, result):
    raw = result["wh"].read(spark, "raw", "pfam")
    assert raw.count() == 253  # 1+2+3+7+40+200
    assert raw.columns == [
        "sequence",
        "family_accession",
        "sequence_name",
        "aligned_sequence",
        "family_id",
    ]


def test_splits_partition_clean_rows(spark, result):
    raw = result["wh"].read(spark, "raw", "pfam")
    clean_n = raw.na.drop("any").count()
    staged = result["wh"].read(spark, "staging", "pfam")
    assert staged.count() == clean_n
    per = dict(staged.groupBy("split").count().collect())
    assert set(per) <= {"train", "dev", "test"} and sum(per.values()) == clean_n


def test_split_branch_invariants(spark, result):
    staged = result["wh"].read(spark, "staging", "pfam")
    mapping = result["wh"].read(spark, "staging", "label_mapping")
    joined = staged.join(mapping, "class_encoded")
    per_class = {
        (r["family_accession"], r["split"]): r["count"]
        for r in joined.groupBy("family_accession", "split").count().collect()
    }
    fams = {f for f, _ in per_class}
    for fam in fams:
        splits = {s for (f, s) in per_class if f == fam}
        n = sum(v for (f, _), v in per_class.items() if f == fam)
        if n == 1:
            assert splits == {"test"}
        elif n == 2:
            assert splits == {"dev", "test"}
        elif n >= 3:
            assert splits == {"train", "dev", "test"}


def test_label_mapping_dense_lexicographic(spark, result):
    mapping = result["wh"].read(spark, "staging", "label_mapping").collect()
    by_class = sorted((r["family_accession"], r["class_encoded"]) for r in mapping)
    assert [c for _, c in by_class] == list(range(len(by_class)))


def test_rarest_class_weight_is_one(spark, result):
    weights = result["wh"].read(spark, "staging", "class_weights")
    assert weights.agg(F.max("weight")).first()[0] == pytest.approx(1.0)


def test_token_arrays_fixed_width(spark, result):
    curated = result["wh"].read(spark, "curated", "pfam")
    sizes = curated.select(F.size("tokens").alias("s")).distinct().collect()
    assert [r["s"] for r in sizes] == [MAX_LEN]


def test_tokens_are_esm2_vocab_ids(spark, result):
    """The curated stage emits EXACT ESM2 ids: every array opens with
    <cls>=0, every id is inside the 33-token vocab, and amino-acid
    sequences (all in-vocab) never produce <unk>=3."""
    curated = result["wh"].read(spark, "curated", "pfam")
    bad = curated.filter(
        (F.element_at("tokens", 1) != 0)
        | F.exists("tokens", lambda t: (t < 0) | (t > 32))
        | F.array_contains("tokens", 3)
    )
    assert bad.count() == 0


def test_staging_partitioned_by_split(result):
    parts = os.listdir(os.path.join(result["root"], "staging", "pfam"))
    assert {p for p in parts if p.startswith("split=")} == {
        "split=train",
        "split=dev",
        "split=test",
    }
