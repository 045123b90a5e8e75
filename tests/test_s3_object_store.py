"""Executable object-store integration (a5/a6/a7): the reference's
boto3-against-an-endpoint contract, run for real against an in-process
moto S3 server — bucket ensure, whole-CSV put/get roundtrips, and the
FULL three-stage pipeline with S3 as the only inter-stage transport.

The JVM s3a path stays separately gated in tests/test_s3a.py (needs
hadoop-aws jars this image lacks); this suite proves the object-store
SEMANTICS end to end with the bundled boto3/moto."""

from __future__ import annotations

import csv
import os
import random

import pytest

moto = pytest.importorskip("moto", reason="moto not installed")

from data_lakes_tp2_student_spark.io.s3boto import (  # noqa: E402
    S3ObjectStore,
    run_pipeline_s3,
)

AA = "ACDEFGHIKLMNPQRSTVWY"


@pytest.fixture(scope="module")
def store():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0)
    server.start()
    host, port = server.get_host_and_port()
    yield S3ObjectStore(endpoint=f"http://127.0.0.1:{port}")
    server.stop()


@pytest.fixture(scope="module")
def shard_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("s3_shards")
    rng = random.Random(11)
    rows = []
    for fam, n in {"PF1": 2, "PF2": 5, "PF3": 30, "PF4": 80}.items():
        for i in range(n):
            seq = "".join(rng.choice(AA) for _ in range(rng.randint(20, 80)))
            rows.append([seq, f"{fam}.1", f"{fam}_{i}/1-{len(seq)}", seq, fam])
    rng.shuffle(rows)
    for sub, sl in [("train", rows[:80]), ("dev", rows[80:95]), ("test", rows[95:])]:
        d = root / sub
        os.makedirs(d, exist_ok=True)
        with open(d / "data-00000", "w", newline="") as f:
            csv.writer(f).writerows(sl)
    return str(root)


def test_bucket_ensure_idempotent(store):
    store.ensure_bucket("idem")
    store.ensure_bucket("idem")  # re-ensure owned bucket: no-op, no raise
    assert store.list_keys("idem") == []


def test_csv_object_roundtrip(spark, store):
    df = spark.createDataFrame(
        [(1, "a,with,commas", 2.5), (2, None, -1.0), (3, "", 0.0)],
        "id bigint, s string, v double",
    )
    store.ensure_bucket("roundtrip")
    store.put_csv(df, "roundtrip", "t.csv")
    assert store.list_keys("roundtrip") == ["t.csv"]
    back = store.get_csv(spark, "roundtrip", "t.csv", schema=df.schema)
    # CSV transport canonicalizes empty-string -> NULL (both serialize to
    # an empty field) — the reference's pandas to_csv/read_csv does the
    # same, so this is contract-faithful, not a connector defect
    expect = [(1, "a,with,commas", 2.5), (2, None, -1.0), (3, None, 0.0)]
    assert sorted(map(tuple, back.collect())) == sorted(expect)


def test_pipeline_through_s3(spark, store, shard_root):
    """The whole raw→staging→curated flow with S3 objects as the ONLY
    inter-stage contract — the reference's LocalStack dvc flow, executed."""
    out = run_pipeline_s3(spark, store, shard_root, max_len=64)
    assert store.list_keys("raw") == ["combined_raw.csv"]
    assert store.list_keys("staging") == [
        "class_weights.csv",
        "label_mapping.csv",
        "preprocessed.csv",
    ]
    assert store.list_keys("curated") == ["tokenized.csv"]
    assert out["raw"].count() == 117
    staged = out["staged"]
    assert staged.count() == 117  # fixture has no nulls
    splits = {r["split"] for r in staged.select("split").distinct().collect()}
    assert splits == {"train", "dev", "test"}
    curated = out["curated"]
    assert curated.count() == 117
    # tokens survive the CSV roundtrip as the comma-joined export form:
    # every row opens with <cls>=0 and has exactly max_len ids
    tok0 = curated.select("tokens").first()[0]
    ids = tok0.split(",")
    assert len(ids) == 64 and ids[0] == "0"
