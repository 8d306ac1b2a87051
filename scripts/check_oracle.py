"""Local simulation of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin at a given sf, compare row count, column
names, and order-insensitive value hash. Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

import sys

import duckdb
import numpy as np
import pandas as pd

import ray

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = set(sys.argv[2:])

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
    return df.sort_values(list(df.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    return hashlib.md5(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()


con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

queries = entrymod.queries()
oracles = entrymod.oracle_sql()
fails = []
stale = set(oracles) - set(queries)
if stale:
    # an oracle key matching no query would otherwise never execute — the
    # renamed/typo'd query silently downgrades to rows-only and the gate
    # still prints ALL OK (same failure mode as a typo'd `only` argument)
    print(f"ORACLE key(s) with no matching query: {sorted(stale)}")
    sys.exit(2)
if only:
    unknown = only - set(queries)
    if unknown:
        # a typo must not skip everything and still print ALL OK
        print(f"UNKNOWN query name(s): {sorted(unknown)}")
        sys.exit(2)
checked = 0
for name, fn in queries.items():
    if only and name not in only:
        continue
    checked += 1
    try:
        mine = to_pandas(fn(sf_dir))
    except Exception as e:
        print(f"{name:22s} ENGINE ERROR: {type(e).__name__}: {e}")
        fails.append(name)
        continue
    if name not in oracles:
        print(f"{name:22s} rows-only: {len(mine)} rows, cols={list(mine.columns)}")
        continue
    try:
        orc = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name:22s} ORACLE SQL ERROR: {e}")
        fails.append(name)
        continue
    a, b = canon(mine), canon(orc)
    # normalize integer dtypes for hashing
    for df in (a, b):
        for c in df.columns:
            if pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype(np.int64)
    ok_rows = len(a) == len(b)
    ok_cols = list(a.columns) == list(b.columns)
    ok_hash = ok_rows and ok_cols and value_hash(a) == value_hash(b)
    status = "OK" if ok_hash else "MISMATCH"
    print(f"{name:22s} {status}  rows={len(a)}/{len(b)} cols_match={ok_cols}")
    if not ok_hash:
        fails.append(name)
        if ok_cols and ok_rows:
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            print(f"   differing cols: {bad_cols}")
            for c in bad_cols[:2]:
                i = neq[c].idxmax()
                print(f"   e.g. {c}[{i}]: engine={a[c][i]!r} oracle={b[c][i]!r}")
        elif ok_cols:
            merged = a.merge(b, how="outer", indicator=True)
            print(merged[merged._merge != "both"].head(6))
        else:
            print(f"   engine cols: {list(a.columns)}  oracle cols: {list(b.columns)}")

print(f"\n({checked} queries checked)")
print("\nFAILED:" if fails else "\nALL OK", fails if fails else "")
ray.shutdown()
sys.exit(1 if fails else 0)
