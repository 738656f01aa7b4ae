"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 through Ray, runs the matching
``oracle_sql()`` through DuckDB (testdata tables pre-registered as
views), and compares row count, column names and order-insensitive
values. Usage: python tools/check_correctness.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, theirs: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ours.columns) != sorted(theirs.columns):
        return [f"schema: ours={sorted(ours.columns)} oracle={sorted(theirs.columns)}"]
    if len(ours) != len(theirs):
        problems.append(f"rows: ours={len(ours)} oracle={len(theirs)}")
        return problems
    a, b = canon(ours), canon(theirs)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        a_int = np.issubdtype(a[c].dtype, np.integer)
        b_int = np.issubdtype(b[c].dtype, np.integer)
        if a_int != b_int:
            # The driver's value hash is dtype-sensitive: an int64 engine
            # column vs a float64 oracle column (e.g. DuckDB HUGEINT sum
            # -> pandas float64) hash-mismatches even when values agree.
            problems.append(
                f"col {c}: DTYPE drift ours={a[c].dtype} oracle={b[c].dtype}"
                " (driver hash hazard — CAST the SQL aggregate)")
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            af, bf = av.astype(np.float64), bv.astype(np.float64)
            if not np.array_equal(af, bf):
                near = np.allclose(af, bf, atol=1e-12, rtol=1e-12)
                problems.append(
                    f"col {c}: float {'allclose but NOT bitwise' if near else 'MISMATCH'}"
                )
        else:
            if not np.array_equal(av, bv):
                bad = np.flatnonzero(av != bv)[:3]
                problems.append(f"col {c}: {len(np.flatnonzero(av != bv))} mismatches, e.g. idx {bad.tolist()} ours={av[bad].tolist()} oracle={bv[bad].tolist()}")
    return problems


def main() -> int:
    only = set(sys.argv[1:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False, ignore_reinit_error=True)
    import __ray_entry__ as M

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs, oracles = M.queries(), M.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = to_pandas(fn(SF_DIR))
        except Exception as e:
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(ours)} rows, cols={list(ours.columns)} ({dt:.1f}s)")
            continue
        try:
            theirs = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, ours, theirs)
        if problems:
            failures += 1
            print(f"[FAIL] {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"[OK]   {name}: {len(ours)} rows match oracle ({dt:.1f}s)")
    print(f"done, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
