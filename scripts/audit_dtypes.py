"""Registry-wide dtype portability audit (round-2, VERDICT item 1).

For every registered query, run the Spark plan AND the DuckDB oracle at a
small SF, land both in pandas the way the driver does (Spark ``toPandas``;
DuckDB ``.df()``), and report any column whose dtype or stringified values
differ between the two frames. Decimal outputs, hugeint->float64 coercions
and array-typed columns all surface here before the driver sees them.

Usage: python scripts/audit_dtypes.py [sf_dir] [name_prefix...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from data_lakes_tp2_student_spark.catalog import REGISTRY  # noqa: E402
from data_lakes_tp2_student_spark.registry import TABLES  # noqa: E402
from data_lakes_tp2_student_spark.session import get_spark  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    prefixes = tuple(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    for name, q in sorted(REGISTRY.items()):
        if prefixes and not name.startswith(prefixes):
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            spd = canon(sdf.toPandas())
            nonhash = [
                f.name
                for f in sdf.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct", "decimal")
            ]
            if nonhash:
                bad += 1
                print(f"RED  {name}: non-portable Spark output dtypes {nonhash}")
                continue
            if q.oracle is None:
                print(f"---  {name}: rows-only ({len(spd)} rows)")
                continue
            opd = canon(con.execute(q.oracle).df())
            issues = []
            for c in spd.columns:
                if c not in opd.columns:
                    issues.append(f"col {c} missing in oracle")
                    continue
                if str(spd[c].dtype) != str(opd[c].dtype):
                    issues.append(
                        f"{c}: spark={spd[c].dtype} oracle={opd[c].dtype}"
                    )
                elif spd[c].astype(str).tolist() != opd[c].astype(str).tolist():
                    sv = spd[c].astype(str).tolist()
                    ov = opd[c].astype(str).tolist()
                    d = next(
                        (i for i, (a, b) in enumerate(zip(sv, ov)) if a != b), -1
                    )
                    issues.append(
                        f"{c}: value str mismatch at row {d}: "
                        f"{sv[d] if d >= 0 else '?'} vs {ov[d] if d >= 0 else '?'}"
                    )
            for c in opd.columns:
                if c not in spd.columns:
                    issues.append(f"col {c} missing in spark")
            if issues:
                bad += 1
                print(f"RED  {name}: " + "; ".join(issues))
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
