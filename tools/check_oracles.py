#!/usr/bin/env python
"""Development harness mirroring the driver's correctness gate:

run each `queries()` entry AND its `oracle_sql()` SQL side-by-side on an
sf dir, canonicalize (columns sorted by name, rows sorted by all
columns), and compare values. Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bool):
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def to_pandas(obj):
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, os_ = entry.queries(), entry.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in os_:
            print(f"{name:24s} (no oracle)")
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"{name:24s} QUERY ERROR: {e}")
            fails.append(name)
            continue
        tq = time.time() - t0
        t0 = time.time()
        try:
            oracle = canon(con.execute(os_[name]).fetchdf())
        except Exception as e:
            print(f"{name:24s} ORACLE ERROR: {str(e)[:300]}")
            fails.append(name)
            continue
        ts = time.time() - t0
        ok_rows = len(mine) == len(oracle)
        ok_cols = list(mine.columns) == list(oracle.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    mine, oracle, check_dtype=False, check_exact=True
                )
                ok_vals = True
            except AssertionError as e:
                print(f"--- {name} diff: {str(e)[:400]}")
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
        print(
            f"{name:24s} {status}  rows {len(mine)}/{len(oracle)} cols "
            f"{list(mine.columns) if not ok_cols else 'match'} (q {tq:.1f}s, sql {ts:.1f}s)"
        )
        if status != "OK":
            fails.append(name)
    print("FAILS:", fails if fails else "none")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
