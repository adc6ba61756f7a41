"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() side by side, compare row count, column
names, and order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    df = res.to_pandas()  # ray Dataset
    if len(df.columns) == 0:
        # Ray drops columns when every block is empty; rebuild from schema
        df = pd.DataFrame({n: pd.Series(dtype="object") for n in res.schema().names})
    return df


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"schema: got {sorted(got.columns)} want {sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rows: got {len(got)} want {len(want)}")
        return problems
    g, w = canon(got), canon(want)
    for c in g.columns:
        if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(w[c].dtype, np.floating):
            gv = g[c].to_numpy(dtype=np.float64)
            wv = w[c].to_numpy(dtype=np.float64)
            if not np.array_equal(gv, wv):
                bad = np.nonzero(gv != wv)[0][:3]
                problems.append(f"values[{c}]: first diffs at {bad.tolist()} got {gv[bad]} want {wv[bad]}")
        else:
            if not g[c].equals(w[c].astype(g[c].dtype)):
                problems.append(f"values[{c}]: mismatch")
    return problems


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            fails += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"OK?  {name}: rows={len(got)} ({dt:.1f}s) [no oracle — rows-only]")
            continue
        want = con.sql(oracles[name]).df()
        problems = compare(name, got, want)
        if problems:
            fails += 1
            print(f"FAIL {name}: ({dt:.1f}s) " + "; ".join(problems))
        else:
            print(f"PASS {name}: rows={len(got)} ({dt:.1f}s)")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
