"""Differential fuzz: adversarial embeddings tables through the vector
surface, Spark vs DuckDB oracle.

Edge vectors real corpora contain: the all-zero vector (cosine 0/0),
denormal-scale magnitudes, garbage-magnitude coordinates (1e30 — found
ANSI long-overflow crashes in the x15/x46 fixed-point quantizers before
they clamped), exact duplicates, and antipodal pairs. Every vector query
must neither crash nor diverge from its oracle.

Deterministic seed — no flaky CI.
"""

from __future__ import annotations

import os
import random

import pytest

import data_lakes_tp2_student_spark.catalog  # noqa: F401
from data_lakes_tp2_student_spark.registry import TABLES

from .conftest import SF_SMOKE
from .oracle import compare_query

FUZZ_QUERIES = [
    "x3_knn_bruteforce",
    "x3b_knn_lsh",
    "x3c_knn_ivf",
    "x38_semdedup",
    "x15_embedding_centroids",
    "x46_kmeans",
    "x36_triangle_count",
    "x40_label_propagation",
]

_DIM = 64


def _gen_vectors(seed: int):
    rng = random.Random(seed)
    vecs = [
        [0.0] * _DIM,                       # zero vector: cosine 0/0 path
        [1e-30] * _DIM,                     # denormal-scale
        [1e30] * _DIM,                      # garbage magnitude (clamp path)
        [-1e30] * _DIM,
        [1.0] + [0.0] * (_DIM - 1),
        [1.0] + [0.0] * (_DIM - 1),         # exact duplicate
        [-1.0] + [0.0] * (_DIM - 1),        # antipodal
        [0.5] * _DIM,
    ]
    while len(vecs) < 60:
        vecs.append([rng.uniform(-1, 1) for _ in range(_DIM)])
    return vecs


@pytest.fixture(scope="module")
def fuzz_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_emb_sf")
    for t in TABLES:
        if t != "embeddings":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", str(d / f"{t}.parquet"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs = _gen_vectors(seed=7)
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 5 for i in range(len(vecs))], pa.int64()),
        }
    )
    pq.write_table(table, str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_vector_query_matches_oracle_on_adversarial_corpus(
    spark, fuzz_sf_dir, name
):
    compare_query(spark, name, fuzz_sf_dir)
