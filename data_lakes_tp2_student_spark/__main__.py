"""CLI entry point — the `dvc repro` analog (SURVEY.md §3 EP1).

    python -m data_lakes_tp2_student_spark pipeline \
        --shards /path/to/{train,test,dev} --warehouse /path/to/wh \
        [--max-len 1024] [--cpus 8]

Runs raw → staging → curated in one SparkSession and prints per-zone row
counts (the reference's printed progress analog).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="data_lakes_tp2_student_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pipeline", help="run raw -> staging -> curated")
    p.add_argument("--shards", required=True, help="dir containing train/test/dev")
    p.add_argument("--warehouse", required=True, help="warehouse root dir")
    p.add_argument("--max-len", type=int, default=1024, help="token width")
    p.add_argument("--cpus", default=None, help="local cores (default: all)")

    r = sub.add_parser(
        "repro",
        help="incremental pipeline: skip stages whose deps/params/code/outs "
        "are unchanged (the dvc-repro analog)",
    )
    r.add_argument("--shards", required=True, help="dir containing train/test/dev")
    r.add_argument("--warehouse", required=True, help="warehouse root dir")
    r.add_argument("--max-len", type=int, default=1024, help="token width")
    r.add_argument("--cpus", default=None, help="local cores (default: all)")
    r.add_argument("--force", action="store_true", help="re-run all stages")

    args = ap.parse_args(argv)
    if args.cmd == "pipeline":
        from .pipeline.pfam import run_pipeline
        from .session import get_spark

        spark = get_spark(app_name="pfam-pipeline", cpus=args.cpus)
        out = run_pipeline(spark, args.shards, args.warehouse, max_len=args.max_len)
        for name in ("staged", "mapping", "weights", "curated"):
            print(f"{name}: {out[name].count()} rows")
        return 0
    if args.cmd == "repro":
        from .pipeline.incremental import run_pipeline_incremental
        from .session import get_spark

        spark = get_spark(app_name="pfam-repro", cpus=args.cpus)
        out = run_pipeline_incremental(
            spark,
            args.shards,
            args.warehouse,
            max_len=args.max_len,
            force=args.force,
        )
        for name, status in out.items():
            print(f"{name}: {status}")
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
