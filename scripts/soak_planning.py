"""Driver-side planning soak at 10^4–10^5 manifest files (VERDICT r11
item 3): DATAPLANE_r11 stopped at 8192 files; snapshot planning is
driver-side O(F) over the JSON checkpoint. This script measures, at
each file count F:

  - checkpoint load + snapshot reconstruction (`manifest(v)`) ms,
  - stats pruning over the full list (`_prune_files_range`) ms,
  - pruned-scan DataFrame construction (`_load_snapshot` on the
    pruned file subset) ms,
  - full-scan DataFrame construction ms (the unprunable worst case),
  - with both the JSON checkpoint path and the round-12 PARQUET
    (columnar) checkpoint path, to show the parquet checkpoint's
    O(columnar-read) advantage — Delta checkpoint parity.

The F data files are HARD LINKS of one tiny parquet (inode-only, so
10^5 files cost ~nothing to create); their manifest entries carry
synthetic DISJOINT id ranges so a point-lookup prune selects exactly
one file. This measures the metadata plane, not the data plane.

Usage: python scripts/soak_planning.py [--files 4096,16384,65536,131072]
Prints one JSON line per (F, checkpoint-format) combination and a
final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from data_lakes_tp2_student_spark.io.manifest import ManifestTable  # noqa: E402
from data_lakes_tp2_student_spark.session import get_spark  # noqa: E402


def build_table(root: str, n_files: int) -> ManifestTable:
    """One commit of `n_files` hard-linked parquet files with synthetic
    disjoint [lo, hi] id stats, through the REAL commit machinery."""
    # auto-checkpointing OFF during the build: the measured handles write
    # their own checkpoint at the final version, in their own format
    tab = ManifestTable(root, stats_cols=["id"], checkpoint_interval=0)
    txn = "0" * 32
    stage = tab.store.txn_stage_dir(txn)
    os.makedirs(stage, exist_ok=True)
    seed = os.path.join(stage, "part-0000000-link.parquet")
    pq.write_table(
        pa.table({"id": pa.array([0], pa.int64()), "v": ["x"]}), seed
    )
    nbytes = os.path.getsize(seed)
    entries = []
    for i in range(n_files):
        name = f"part-{i:07d}-link.parquet"
        if i and i % 50_000 == 0:
            # ext4 caps hard links at ~65k per inode — re-seed
            import shutil as _sh

            _sh.copyfile(seed, os.path.join(stage, name))
            seed = os.path.join(stage, name)
        elif i:
            os.link(seed, os.path.join(stage, name))
        entries.append(
            {
                "path": f"data/txn={txn}/{name}",
                "partition": {},
                "bytes": nbytes,
                "rows": 1,
                "stats": {"id": [i * 10, i * 10 + 9]},
            }
        )
    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    tab._commit_files(
        None, txn, entries, schema_json, None, "overwrite", "all", None, {},
        validate=False,
    )
    # Round 13: plan at a SMALL v1 on top of the checkpoint, not at the
    # giant v0 — `manifest(v)` parses v's RAW log entry first, and the
    # fixture's single 10^6-entry commit makes that O(F) json work that
    # NO production table pays (real commits are small deltas over a
    # checkpointed history; the r12 10^6 row booked 5.0 s of which ~4.5 s
    # was the v0 entry parse). v1 carries one file; planning at v1 reads
    # v1's tiny entry + the checkpoint.
    txn2 = "1" * 32
    stage2 = tab.store.txn_stage_dir(txn2)
    os.makedirs(stage2, exist_ok=True)
    seed2 = os.path.join(stage2, "part-0000000-tail.parquet")
    pq.write_table(
        pa.table(
            {"id": pa.array([n_files * 10], pa.int64()), "v": ["x"]}
        ),
        seed2,
    )
    tab._commit_files(
        None,
        txn2,
        [
            {
                "path": f"data/txn={txn2}/part-0000000-tail.parquet",
                "partition": {},
                "bytes": os.path.getsize(seed2),
                "rows": 1,
                "stats": {"id": [n_files * 10, n_files * 10]},
            }
        ],
        schema_json,
        None,
        "append",
        "none",
        None,
        {},
        validate=False,
    )
    return tab


def bench_once(
    spark, tab: ManifestTable, fmt: str, full_frame: bool = True
) -> dict:
    t0 = time.perf_counter()
    m = tab.manifest(tab.latest_version())
    t_load = time.perf_counter() - t0
    n = len(m["files"])

    t0 = time.perf_counter()
    pruned = tab._prune_files_range(m, m["files"], {"id": (42, 42)})
    t_prune = time.perf_counter() - t0
    assert len(pruned) == 1, len(pruned)

    # the fused path: checkpoint load + COARSE prune in one step (the
    # parquet checkpoint prunes columnar before materializing dicts)
    t0 = time.perf_counter()
    coarse = tab.manifest(
        tab.latest_version(), coarse_range={"id": (42, 42)}
    )["files"]
    t_coarse = time.perf_counter() - t0
    assert 1 <= len(coarse) <= n

    t0 = time.perf_counter()
    df = tab._load_snapshot(spark, m, pruned)
    got = df.count()
    t_pruned_scan = time.perf_counter() - t0
    assert got == 1, got

    t_full_frame = None
    if full_frame:
        t0 = time.perf_counter()
        full = tab._load_snapshot(spark, m, m["files"])
        _ = full.schema  # frame construction incl. driver file index
        t_full_frame = time.perf_counter() - t0

    return {
        "files": n,
        "checkpoint": fmt,
        "load_ms": round(t_load * 1e3, 1),
        "prune_ms": round(t_prune * 1e3, 1),
        "coarse_plan_ms": round(t_coarse * 1e3, 1),
        "coarse_entries": len(coarse),
        "pruned_scan_ms": round(t_pruned_scan * 1e3, 1),
        "full_frame_ms": (
            round(t_full_frame * 1e3, 1) if t_full_frame is not None else None
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--files", default="4096,16384,65536,131072",
        help="comma-separated file counts",
    )
    ap.add_argument(
        "--fmt", default="json,parquet",
        help="checkpoint formats to measure (round 13: the simulated 10^6"
             " run uses --fmt parquet — a 10^6-entry JSON checkpoint is"
             " the O(F)-parse shape the parquet format exists to replace)",
    )
    ap.add_argument(
        "--skip-full-frame", action="store_true",
        help="skip the full-scan frame construction (O(F) by definition;"
             " at 10^6 files it alone dominates the soak wall)",
    )
    args = ap.parse_args()
    counts = [int(x) for x in args.files.split(",")]
    fmts = tuple(args.fmt.split(","))
    spark = get_spark(app_name="soak-planning", shuffle_partitions=8)
    rows = []
    with tempfile.TemporaryDirectory() as td:
        for f in counts:
            root = os.path.join(td, f"t{f}")
            t0 = time.perf_counter()
            tab = build_table(root, f)
            build_s = time.perf_counter() - t0
            for fmt in fmts:
                try:
                    fresh = ManifestTable(
                        root, stats_cols=["id"], checkpoint_interval=1,
                        checkpoint_format=fmt,
                    )
                except TypeError:
                    if fmt == "parquet":
                        continue  # parquet checkpoints not built yet
                    fresh = ManifestTable(
                        root, stats_cols=["id"], checkpoint_interval=1,
                    )
                # each format handle checkpoints the FINAL (small) v1
                # in its own encoding; planning then reads v1's tiny
                # entry + this checkpoint — the production shape
                fresh._write_checkpoint(fresh.latest_version())
                r = bench_once(
                    spark, fresh, fmt, full_frame=not args.skip_full_frame
                )
                r["build_s"] = round(build_s, 2)
                rows.append(r)
                print(json.dumps(r), flush=True)
    print(json.dumps({"planning_soak": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
