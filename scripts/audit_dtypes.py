"""Registry-wide driver-portability audit (VERDICT r2 items 1+2, r2 ADVICE).

For every registered query, run the Spark plan AND the DuckDB oracle at a
small SF, land both in pandas the way the driver does, and compare with the
SAME stringify-after-pandas canonicalization as ``tests/oracle.py`` (one
shared implementation — the local gate and this audit cannot drift apart).

Ordering fixes from r2 ADVICE: non-portable Spark dtypes (array/map/struct/
decimal) are detected from the SCHEMA before any pandas sort (no more
unhashable-ndarray tracebacks), and row-count mismatches are reported
explicitly instead of a zip() miss.

Usage: python scripts/audit_dtypes.py [sf_dir] [name_prefix...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lakes_tp2_student_spark.catalog import REGISTRY  # noqa: E402
from data_lakes_tp2_student_spark.session import get_spark  # noqa: E402
from tests.oracle import (  # noqa: E402
    canon_strings,
    run_duckdb_df,
    spark_nonportable_fields,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    prefixes = tuple(sys.argv[2:])
    spark = get_spark()
    bad = 0
    for name, q in sorted(REGISTRY.items()):
        if prefixes and not name.startswith(prefixes):
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            nonhash = spark_nonportable_fields(sdf)
            if nonhash:
                bad += 1
                print(f"RED  {name}: non-portable Spark output dtypes {nonhash}")
                continue
            spd = sdf.toPandas()
            if q.oracle is None:
                print(f"---  {name}: rows-only ({len(spd)} rows)")
                continue
            opd = run_duckdb_df(q.oracle, sf_dir)
            s_cols, s_rows = canon_strings(spd)
            d_cols, d_rows = canon_strings(opd)
            if s_cols != d_cols:
                bad += 1
                print(f"RED  {name}: columns spark={s_cols} oracle={d_cols}")
                continue
            if len(s_rows) != len(d_rows):
                bad += 1
                print(
                    f"RED  {name}: row count spark={len(s_rows)} "
                    f"oracle={len(d_rows)}"
                )
                continue
            if s_rows != d_rows:
                bad += 1
                i, a, b = next(
                    (i, a, b)
                    for i, (a, b) in enumerate(zip(s_rows, d_rows))
                    if a != b
                )
                cols_diff = [
                    (c, x, y) for c, x, y in zip(s_cols, a, b) if x != y
                ]
                print(f"RED  {name}: value mismatch at sorted row {i}: {cols_diff}")
            else:
                print(f"ok   {name}")
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            traceback.print_exc(limit=2)
    print(f"\n{bad} queries need attention")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
