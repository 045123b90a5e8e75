"""Scaling-exponent measurement for the heavy headline queries
(VERDICT r9 item 1): run each at sf0.1 and at the 10x replicated
dataset (scripts/gen_scale_data.py), book wall-time ratios against each
query's theoretical shape, and flag anything super-linear beyond it.

The sf0.1 instrument is saturated by fixed overhead (PERF.md); this is
the measurement that turns "at 100 TB this holds" plan arguments into
numbers. Interpreting ratios at factor F=10:

- linear (scans, map-only, hash aggs, broadcast joins):   ~10
- n log n (sort/shuffle-bound, window sorts):             ~11.7
  (n log n factor = F * log(F*N)/log(N) with N = 6e5 rows)
- fixed-probe ANN (corpus grows, query count fixed):      ~10

Plus per-query session/plan fixed overhead (~0.1-0.5 s) that DEFLATES
small ratios — a ratio well under F means fixed overhead still
dominates, not sub-linear magic. The verdict line per query compares
the measured ratio to `expected * SLACK` (default 1.5, covering the
spill/cache-locality cliff a 10x working set legitimately crosses).

Usage:
  python scripts/gen_scale_data.py 10
  python scripts/scaling_bench.py [out=SCALING_last.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from data_lakes_tp2_student_spark.catalog import REGISTRY  # noqa: E402
from data_lakes_tp2_student_spark.session import get_spark  # noqa: E402

SMALL = "/root/testdata/sf0.1"
BIG = "/tmp/scaledata/sfx10"
FACTOR = 10
ROUNDS = 3
SLACK = 1.5

# (query, expected shape). Shapes:
#   linear  — single scan + hash agg / map-only / broadcast join
#   nlogn   — sort- or shuffle-dominated (merge sorts grow log n)
#   fixedq  — corpus grows, probe count fixed (ANN paths)
HEAVY = [
    ("x1_exact_dedup", "linear"),
    ("x2_minhash_pairs", "linear"),
    ("x2b_jaccard_verify", "linear"),
    ("x2e_dup_clusters", "nlogn"),
    ("x2f_simhash_pairs", "linear"),
    ("x3_knn_bruteforce", "fixedq"),
    ("x3b_knn_lsh", "fixedq"),
    ("x3c_knn_ivf", "fixedq"),
    ("x16_pmi_cooccurrence", "linear"),
    ("x9_corpus_prep", "linear"),
    ("e2_stratified_split", "nlogn"),
    ("e3_window_functions", "nlogn"),
    ("j1_tokenize", "linear"),
    ("x4_quality_score", "linear"),
    ("x6_tpch_q1", "linear"),
    ("x6_tpch_q3", "nlogn"),
    ("x6_tpch_q8", "nlogn"),
    ("x6_tpch_q21", "nlogn"),
    ("i1_tumbling_window", "linear"),
    ("i3_session_window", "nlogn"),
    ("x12_funnel", "nlogn"),
    # round-10 wave-2 additions: the two that went quadratic before the
    # #54 rep-collapse restructure. x31b's OUTPUT relation is quadratic
    # in duplicate-group sizes by SEMANTICS (the fixture's 10x corpus
    # holds ~100x true pairs), so its wall is bounded by F^2 writes, not
    # linear scan — the rep-collapse keeps it far under that bound
    ("x31b_image_neardup_pairs", "quadratic_output"),
    ("x31c_image_dedup", "linear"),
    ("x19_bm25_topk", "linear"),
    ("x22_decontamination", "linear"),
    ("x38_semdedup", "fixedq"),
    ("x42_entity_resolution", "nlogn"),
    ("x47_sparse_cosine", "linear"),
]

N_SMALL = 600_000  # lineitem rows at sf0.1 (the dominant table)


def expected_factor(shape: str) -> float:
    if shape == "nlogn":
        return FACTOR * math.log(FACTOR * N_SMALL) / math.log(N_SMALL)
    if shape == "quadratic_output":
        # the result RELATION itself grows ~F^2 (pair queries over
        # heavily-duplicated corpora) — wall is output-write bound
        return float(FACTOR) ** 2
    return float(FACTOR)  # linear and fixedq


def run_side(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    # untimed warm-up (codegen + schema memo), then interleaved rounds,
    # best-of-N — the bench.py protocol
    for n in names:
        REGISTRY[n].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.catalog.clearCache()
    best: dict[str, float] = {n: float("inf") for n in names}
    for _ in range(ROUNDS):
        for n in names:
            t0 = time.perf_counter()
            REGISTRY[n].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best[n] = min(best[n], time.perf_counter() - t0)
            spark.catalog.clearCache()
    return {n: round(v, 3) for n, v in best.items()}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "SCALING_last.json"
    )
    if not os.path.isdir(BIG):
        sys.exit(f"{BIG} missing — run scripts/gen_scale_data.py {FACTOR} first")
    spark = get_spark(
        app_name="scaling_bench", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    names = [n for n, _ in HEAVY if n in REGISTRY]
    small = run_side(spark, SMALL, names)
    big = run_side(spark, BIG, names)
    rows = []
    for n, shape in HEAVY:
        if n not in small:
            continue
        ratio = round(big[n] / small[n], 2)
        exp = round(expected_factor(shape), 1)
        verdict = "ok" if ratio <= exp * SLACK else "SUPER-LINEAR"
        rows.append(
            {
                "query": n,
                "sf0.1_s": small[n],
                "sfx10_s": big[n],
                "ratio": ratio,
                "shape": shape,
                "expected": exp,
                "verdict": verdict,
            }
        )
        print(
            f"{n:28s} {small[n]:7.3f}s {big[n]:8.3f}s  x{ratio:<6} "
            f"(exp {shape} ~x{exp}) {verdict}"
        )
    with open(out_path, "w") as f:
        json.dump(
            {
                "factor": FACTOR,
                "rounds": ROUNDS,
                "slack": SLACK,
                "queries": rows,
                "flagged": [r["query"] for r in rows if r["verdict"] != "ok"],
            },
            f,
            indent=1,
        )
    print("artifact:", out_path)


if __name__ == "__main__":
    main()
