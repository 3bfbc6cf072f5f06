"""`ray job submit` entrypoint for the flagship north-star pipeline.

On a real multi-node cluster (north_rule: fixed-size clusters at N and 4N
nodes)::

    ray job submit --working-dir /root/repo -- \
        python tools/flagship_job.py --sf-dir /data/sf100 \
            --out-root /data/checkpoints/flagship_full

In this sandbox the same script runs standalone (``ray.init`` falls back
to a local session; RAY_ADDRESS=local is preset). The job:

1. runs the complete lifecycle (join → clean/normalize/cell-encode →
   exact dedup → Lance-like checkpoint → PIP + kNN + tiles summary),
2. checkpoints the deduped table with per-fragment row counts, an input
   fingerprint and a commit-last manifest — a re-submitted job resumes
   past every finished fragment (stale checkpoints invalidate on
   fingerprint mismatch),
3. prints one JSON line with the summary counts + wall time (the
   throughput record for the two-cluster-size scaling comparison).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out-root", default=None,
                    help="Lance-like checkpoint root (enables resume)")
    ap.add_argument("--knn-res", type=int, default=11)
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray
    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; the
        # sandbox presets RAY_ADDRESS=local — both resolve correctly here
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from wrangle_openstreetmap_data_ray.pipelines import flagship

    t0 = time.time()
    summary = flagship.flagship_full(args.sf_dir, out_root=args.out_root,
                                     knn_res=args.knn_res, k=args.k)
    wall = round(time.time() - t0, 3)
    rec = {k: int(v) for k, v in summary.iloc[0].items()}
    rec.update({"wall_sec": wall, "sf_dir": args.sf_dir,
                "cluster_cpus": int(ray.cluster_resources().get("CPU", 0)),
                "rows_per_sec": round(rec["n_images"] / wall, 1)})
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
