"""ANN operating-point table (VERDICT r12 item 2): recall@10 AND
candidate fraction for the multi-table sign-LSH at several
(planes, tables) points, plus the IVF row — on the driver embeddings
(near-isotropic 64-dim, the hard case for sign-LSH).

The r12 verdict's concern: the 16×4-bit x3b default hits recall 0.90 by
scoring a large share of the corpus per query (16 tables × ~1/16
bucket selectivity each). This script measures what each point BUYS
(recall) and what it COSTS (candidate fraction = distinct scored pairs
/ (|corpus|·|queries|)) so the default is a chosen point on the curve,
not an accident. Results are booked in PERF.md; the default's point is
gated in tests/test_ann_quality.py.

Usage: python scripts/ann_operating_points.py [--sf /root/testdata/sf0.01]
Prints one JSON line per operating point and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_lakes_tp2_student_spark.operators.similarity import (  # noqa: E402
    ivf_candidate_pairs,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
    ann_candidate_pairs,
    mean_recall,
    top_sets,
)
from data_lakes_tp2_student_spark.session import get_spark  # noqa: E402

K = 10
N_QUERIES = 20


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    spark = get_spark(app_name="ann-operating-points", shuffle_partitions=16)
    corpus = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    n_corpus = corpus.count()
    q = corpus.filter(F.col("vec_id") < N_QUERIES)
    truth = top_sets(knn_bruteforce(corpus, q, k=K))
    denom = n_corpus * N_QUERIES

    rows = []
    for planes, tables in [(4, 4), (4, 8), (4, 16), (6, 8), (6, 16),
                           (6, 32), (8, 16), (8, 32)]:
        t0 = time.perf_counter()
        r = mean_recall(
            truth,
            top_sets(
                knn_lsh(corpus, q, k=K, planes=planes, dim=64, tables=tables)
            ),
        )
        wall = time.perf_counter() - t0
        cand = ann_candidate_pairs(
            corpus, q, planes=planes, dim=64, tables=tables
        ).count()
        row = {
            "method": "lsh",
            "planes": planes,
            "tables": tables,
            "recall_at_10": round(r, 3),
            "candidate_fraction": round(cand / denom, 4),
            "candidates": cand,
            "knn_wall_s": round(wall, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    for n_cells, nprobe in [(16, 2), (32, 4), (max(16, n_corpus // 128), 2)]:
        t0 = time.perf_counter()
        r = mean_recall(
            truth,
            top_sets(knn_ivf(corpus, q, k=K, n_cells=n_cells, nprobe=nprobe)),
        )
        wall = time.perf_counter() - t0
        cand = ivf_candidate_pairs(
            corpus, q, n_cells=n_cells, nprobe=nprobe
        ).count()
        row = {
            "method": "ivf",
            "n_cells": n_cells,
            "nprobe": nprobe,
            "recall_at_10": round(r, 3),
            "candidate_fraction": round(cand / denom, 4),
            "candidates": cand,
            "knn_wall_s": round(wall, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"ann_operating_points": rows, "corpus": n_corpus,
                      "queries": N_QUERIES, "sf": args.sf}))
    spark.stop()


if __name__ == "__main__":
    main()
