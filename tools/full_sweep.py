"""Full-contract sweep with a durable JSON artifact (VERDICT r4 item 7).

Runs EVERY queries() entry at the given sf dir through the same
canonicalization/value-hash comparator as tools/check_contract.py and
writes ``SWEEP_r<N>.json`` at the repo root:

    {"sf_dir": ..., "ts": ..., "n_pass": ..., "n_fail": ..., "n_rows_only": ...,
     "results": {name: {"status": "pass|fail|rows_only", "rows": N,
                        "secs": t, "err": null|str}}}

Usage: python tools/full_sweep.py [sf_dir] [--out SWEEP_r5.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_contract import canon, to_pandas, value_hash  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="SWEEP_r5.json")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.min_parallelism = 64

    import __ray_entry__ as entry_mod
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    import duckdb
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    results: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = 0
    t_start = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.time()
        rec: dict = {"status": None, "rows": None, "secs": None, "err": None}
        try:
            mine = canon(to_pandas(fn(args.sf_dir)))
            rec["rows"] = len(mine)
        except Exception as exc:  # noqa: BLE001
            rec.update(status="fail", err=f"query raised {type(exc).__name__}: {exc}"[:300],
                       secs=round(time.time() - t0, 2))
            results[name] = rec
            n_fail += 1
            print(f"[{i+1}/{len(qs)}] FAIL {name}: {rec['err']}", flush=True)
            continue
        rec["secs"] = round(time.time() - t0, 2)
        if name not in oracles:
            rec["status"] = "rows_only"
            n_rows_only += 1
            print(f"[{i+1}/{len(qs)}] rows-only {name}: {rec['rows']} rows  {rec['secs']}s",
                  flush=True)
        else:
            try:
                ref = canon(con.execute(oracles[name]).df())
            except Exception as exc:  # noqa: BLE001
                rec.update(status="fail", err=f"oracle raised {type(exc).__name__}: {exc}"[:300])
                results[name] = rec
                n_fail += 1
                print(f"[{i+1}/{len(qs)}] FAIL {name}: {rec['err']}", flush=True)
                continue
            problems = []
            if len(mine) != len(ref):
                problems.append(f"rows {len(mine)} vs {len(ref)}")
            if list(mine.columns) != list(ref.columns):
                problems.append(f"cols {list(mine.columns)} vs {list(ref.columns)}")
            if not problems and value_hash(mine) != value_hash(ref):
                problems.append("value-hash mismatch")
            if problems:
                rec.update(status="fail", err="; ".join(problems)[:300])
                n_fail += 1
                print(f"[{i+1}/{len(qs)}] FAIL {name}: {rec['err']}", flush=True)
            else:
                rec["status"] = "pass"
                n_pass += 1
                print(f"[{i+1}/{len(qs)}] PASS {name}: {rec['rows']} rows  {rec['secs']}s",
                      flush=True)
        results[name] = rec

    artifact = {
        "sf_dir": args.sf_dir,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "total_secs": round(time.time() - t_start, 1),
        "n_queries": len(qs),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "n_rows_only": n_rows_only,
        "results": results,
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), args.out)
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail "
          f"-> {out_path} ({artifact['total_secs']}s)", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
