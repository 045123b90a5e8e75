"""Capture .explain("formatted") for every bench HEADLINE query into
plans/<tag>/<query>_<suffix>.txt (guide §1: record the plan shape —
Exchange count, join strategy, PushedFilters/ReadSchema, codegen spans,
Python-eval nodes — before and after each optimization).

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]
e.g.   python scripts/capture_plans.py r15 before
       python scripts/capture_plans.py r15 after x2f_simhash_pairs
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402
from data_lakes_tp2_student_spark.catalog import REGISTRY  # noqa: E402
from data_lakes_tp2_student_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or [n for n in HEADLINE if n in REGISTRY]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    for name in names:
        q = REGISTRY.get(name)
        if q is None:
            print(f"skip {name}: not in registry", file=sys.stderr)
            continue
        buf = io.StringIO()
        try:
            df = q.fn(spark, sf_dir)
            with redirect_stdout(buf):
                df.explain("formatted")
        except Exception as exc:  # noqa: BLE001 — record, keep capturing
            buf.write(f"\nEXPLAIN FAILED: {exc!r}\n")
        finally:
            spark.catalog.clearCache()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
