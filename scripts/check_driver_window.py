"""Re-verify the leading driver-window prefix of the registry at the
driver's sf tier (sf0.01), with the same rows/schema/value compare the
driver applies. Usage: python scripts/check_driver_window.py [N] [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparklucene.driver_queries import TABLES, registry  # noqa: E402
from sparklucene.session import get_spark  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 55
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    entries = list(registry().items())[:n]
    bad = []
    for i, (name, (fn, sql)) in enumerate(entries):
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
            if sql is None:
                print(f"[{i:3d}] {name}: rows-only {len(sdf)} ({time.time()-t0:.1f}s)")
                continue
            odf = con.execute(sql).df()
            assert sorted(sdf.columns) == sorted(odf.columns), "schema"
            assert len(sdf) == len(odf), f"rows {len(sdf)} vs {len(odf)}"
            s = canon(sdf)
            o = canon(odf.astype({c: sdf[c].dtype for c in sdf.columns if c in odf.columns},
                                 errors="ignore"))
            pd.testing.assert_frame_equal(s, o, check_exact=True, check_dtype=False)
            print(f"[{i:3d}] {name}: OK {len(sdf)} rows ({time.time()-t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"[{i:3d}] {name}: FAIL {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{len(entries)-len(bad)}/{len(entries)} green; failures: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
