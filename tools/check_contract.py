"""Driver-contract self-check: runs every queries() entry at sf0.01 and
compares row-count / schema / order-insensitive value-hash against its
oracle_sql() twin in DuckDB, mimicking the graft driver.

Usage: python tools/check_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, rows by all columns — order-insensitive form."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:   # structs/lists arrive as dicts — stringify to sort
        if df[c].dtype == object and len(df) and isinstance(
                df[c].iloc[0], (dict, list)):
            df[c] = df[c].astype(str)
    # normalize dtypes: ints to int64, floats to float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.9g").encode()).hexdigest()[:16]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()   # ray Dataset


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.min_parallelism = 64

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    import duckdb
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(mine)} rows  cols={list(mine.columns)}  {dt:.1f}s")
            n_rowsonly += 1
            continue
        try:
            ref = canon(con.execute(oracles[name]).df())
        except Exception as exc:
            print(f"FAIL {name}: oracle raised {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        problems = []
        if len(mine) != len(ref):
            problems.append(f"rows {len(mine)} vs {len(ref)}")
        if list(mine.columns) != list(ref.columns):
            problems.append(f"cols {list(mine.columns)} vs {list(ref.columns)}")
        if not problems and value_hash(mine) != value_hash(ref):
            diff = (mine != ref) if mine.shape == ref.shape else None
            problems.append("value-hash mismatch")
            if diff is not None:
                bad = diff.any(axis=1)
                problems.append(f"{int(bad.sum())} differing rows; first:\n"
                                f"mine:\n{mine[bad].head(3)}\nref:\n{ref[bad].head(3)}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(mine)} rows  {dt:.1f}s")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
