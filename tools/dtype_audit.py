"""Latent driver-hash-bomb audit: for every oracle-paired query, compare
the ENGINE result's canonical dtypes against the ORACLE's. A float64
engine column whose oracle twin is int64 passes check_contract (%.9g
formats 123.0 as "123" up to 9 significant digits) but can fail the
driver's hasher — exactly the grid_dbscan_clusters round-4 red row.

Usage: python tools/dtype_audit.py [sf_dir] [only ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_contract import canon, to_pandas  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    import duckdb
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    n_mismatch = n_err = n_ok = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
            ref = canon(con.execute(oracles[name]).df())
        except Exception as exc:
            print(f"ERR  {name}: {type(exc).__name__}: {exc}")
            n_err += 1
            continue
        bad = []
        for c in mine.columns:
            if c not in ref.columns:
                continue
            a, b = str(mine[c].dtype), str(ref[c].dtype)
            if a != b:
                bad.append(f"{c}: engine={a} oracle={b}")
        if bad:
            print(f"DTYPE {name}: " + "; ".join(bad))
            n_mismatch += 1
        else:
            n_ok += 1
        sys.stdout.flush()
    print(f"\n{n_ok} ok, {n_mismatch} dtype-mismatch, {n_err} err "
          f"({time.time()-t0:.0f}s last)")
    return 1 if (n_mismatch or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
