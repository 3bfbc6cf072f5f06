"""Driver-window repro drill (VERDICT r4 item 1).

Mimics the graft driver more faithfully than check_contract: runs the
FIRST ``--window`` queries() entries in dict order inside ONE Ray
session, with the DEFAULT DataContext (no min_parallelism override —
the one knob check_contract sets that the driver may not), optionally
after wiping the /tmp fixture cache. Every oracle-paired query in the
window is compared; on a hash mismatch both canonical tables are dumped
to /tmp/window_repro_<name>_{mine,ref}.csv.

Usage:
  python tools/window_repro.py [--cpus 32] [--window 50] [--wipe]
                               [--sf /root/testdata/sf0.01]
                               [--repeat 1] [--min-parallelism N]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_contract import canon, to_pandas, value_hash  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--wipe", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--min-parallelism", type=int, default=None)
    args = ap.parse_args()

    if args.wipe:
        from wrangle_openstreetmap_data_ray.pipelines import fixtures as fx
        d = fx.fixture_dir(args.sf)
        if os.path.isdir(d):
            shutil.rmtree(d)
            print(f"wiped {d}")

    import ray
    ray.init(address="local", num_cpus=args.cpus,
             include_dashboard=False, logging_level="ERROR")
    if args.min_parallelism is not None:
        from ray.data import DataContext
        DataContext.get_current().min_parallelism = args.min_parallelism

    import __ray_entry__ as entry_mod
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    window = list(qs.items())[:args.window]

    import duckdb
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf}/{t}.parquet')")

    n_fail = 0
    for rep in range(args.repeat):
        for name, fn in window:
            t0 = time.time()
            try:
                mine = canon(to_pandas(fn(args.sf)))
            except Exception as exc:
                print(f"FAIL {name}: raised {type(exc).__name__}: {exc}")
                n_fail += 1
                continue
            dt = time.time() - t0
            if name not in oracles:
                print(f"rows-only {name}: {len(mine)} rows  {dt:.1f}s")
                continue
            ref = canon(con.execute(oracles[name]).df())
            ok = (len(mine) == len(ref)
                  and list(mine.columns) == list(ref.columns)
                  and value_hash(mine) == value_hash(ref))
            if ok:
                print(f"PASS {name}: {len(mine)} rows  {dt:.1f}s")
            else:
                n_fail += 1
                print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}  "
                      f"hash {value_hash(mine)} vs {value_hash(ref)}")
                mine.to_csv(f"/tmp/window_repro_{name}_mine.csv", index=False)
                ref.to_csv(f"/tmp/window_repro_{name}_ref.csv", index=False)
                if mine.shape == ref.shape:
                    bad = (mine != ref).any(axis=1)
                    print("differing rows (mine/ref):")
                    print(mine[bad].head(5))
                    print(ref[bad].head(5))
    print(f"\nrepeat={args.repeat} window={args.window} "
          f"cpus={args.cpus} fail={n_fail}")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
