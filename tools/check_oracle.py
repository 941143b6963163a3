"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle_sql() side-by-side at a given sf dir; compare row
count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(128 << 20))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(256 << 20))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    for c in df.select_dtypes("floating").columns:
        df[c] = df[c].round(6)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    return hashlib.sha1(pd.util.hash_pandas_object(normalize(df), index=False).values.tobytes()).hexdigest()[:12]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def main() -> None:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    os.environ["GRAFT_SF_DIR"] = sf_dir  # corpus-diagnostic oracles track sf
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            fails.append(name)
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(mine)} rows {dt:.1f}s cols={list(mine.columns)}")
            continue
        ref = con.sql(oracles[name]).df()
        ok_rows = len(mine) == len(ref)
        ok_cols = sorted(mine.columns) == sorted(ref.columns)
        ok_hash = ok_rows and ok_cols and value_hash(mine) == value_hash(ref)
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        print(f"{name:28s} {status} rows={len(mine)}/{len(ref)} cols_ok={ok_cols} hash_ok={ok_hash} {dt:.1f}s")
        if status != "OK":
            fails.append(name)
            print("  mine:", normalize(mine).head(3).to_dict("records"))
            print("  ref :", normalize(ref).head(3).to_dict("records"))
    if fails:
        print("FAILED:", fails)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
