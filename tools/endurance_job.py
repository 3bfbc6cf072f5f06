"""10× endurance run (round-3 VERDICT item 5): the north-star spatial
slice one order of magnitude above the XL scaling fixture — 600M synthetic
points (sf1-equivalent row count) through cell-encode → polygon PIP join →
partitioned Lance-like checkpoint → read-back verification — recording
wall time per phase, rows/s, peak driver RSS, and fragment/manifest
accounting, so "fragments/manifests/driver memory stay bounded one order
up" is evidenced, not asserted.

Run SOLO (like every bench)::

    python tools/endurance_job.py --n-points 600000000

Resume/kill drill::

    python tools/endurance_job.py --kill-after 60   # SIGKILL mid-write
    python tools/endurance_job.py                   # rerun: commits clean
    # the printed content_sig must equal an uninterrupted run's — the
    # manifest-last protocol means readers only ever see committed state.

A second identical run resumes instantly from the committed manifest
(fingerprint match) and reports resume=true.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import signal
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-points", type=int, default=600_000_000)
    ap.add_argument("--n-polys", type=int, default=500)
    ap.add_argument("--poly-detail", type=int, default=16)
    ap.add_argument("--out-root", default=None)
    ap.add_argument("--kill-after", type=float, default=None,
                    help="SIGKILL this process N seconds after the "
                         "checkpoint write starts (resume drill)")
    ap.add_argument("--skip-pip", action="store_true",
                    help="skip the PIP phase (write/verify/resume drills)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    out_root = args.out_root or f"/tmp/graft_endurance/points_{args.n_points}"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from wrangle_openstreetmap_data_ray import synth
    from wrangle_openstreetmap_data_ray.functions import geo
    from wrangle_openstreetmap_data_ray.sources import lancelike
    from wrangle_openstreetmap_data_ray.stages import pip_join

    rec: dict = {"n_points": args.n_points, "cpus": args.cpus}

    t0 = time.time()
    pts_dir = synth.materialize_fixture("points", args.n_points)
    rec["gen_sec"] = round(time.time() - t0, 1)

    # ---- phase 1: cell-encode + PIP join (the compute slice) ----------
    if not args.skip_pip:
        polys = synth.gen_polygons_table(args.n_polys,
                                         detail=args.poly_detail)
        t0 = time.time()
        n_inside = pip_join.pip_join(
            rd.read_parquet(pts_dir), polys, keep_cols=["image_id"],
            batch_size=65_536).count()
        rec["pip_sec"] = round(time.time() - t0, 1)
        rec["pip_rows"] = int(n_inside)
        rec["pip_rows_per_sec"] = round(args.n_points / rec["pip_sec"], 1)
    else:
        rec["pip_sec"] = 0.0

    # ---- phase 2: partitioned checkpoint (the store slice) ------------
    def encode(b: pa.Table) -> pa.Table:
        cell = geo.cell_encode(b["lon"].to_numpy(), b["lat"].to_numpy(), 14)
        shard = (cell % np.int64(64)).astype(np.int64)
        return (b.append_column("cell", pa.array(cell, pa.int64()))
                 .append_column("shard", pa.array(shard, pa.int64())))

    enc = rd.read_parquet(pts_dir).map_batches(encode, batch_format="pyarrow")
    fp = f"points_n{args.n_points}"   # deterministic input → stable resume key

    if args.kill_after is not None:
        def _kill(signum, frame):
            os.kill(os.getpid(), signal.SIGKILL)
        signal.signal(signal.SIGALRM, _kill)
        signal.setitimer(signal.ITIMER_REAL, args.kill_after)

    prev = lancelike.latest_manifest(out_root)
    t0 = time.time()
    man = lancelike.write_dataset_partitioned(
        enc, out_root, stage="endurance", partition_col="shard",
        parent=fp, fingerprint=fp)
    rec["write_sec"] = round(time.time() - t0, 1)
    rec["resume"] = bool(prev and man["version"] == prev["version"])
    rec["write_rows_per_sec"] = (None if rec["resume"] else
                                 round(args.n_points / rec["write_sec"], 1))
    if args.kill_after is not None:
        signal.setitimer(signal.ITIMER_REAL, 0)
    rec["n_fragments"] = len(man["fragments"])
    rec["manifest_rows"] = int(man["total_rows"])
    rec["n_partitions"] = len(man["metrics"]["partition_rows"])
    mpath = os.path.join(out_root, "_manifest")
    rec["manifest_bytes"] = sum(
        os.path.getsize(os.path.join(mpath, f)) for f in os.listdir(mpath))

    # ---- phase 3: read-back verification (order-insensitive sig) ------
    from ray.data.aggregate import Sum
    from wrangle_openstreetmap_data_ray.functions.hashing import splitmix64

    def sig(b: pa.Table) -> pa.Table:
        idx = pa.compute.cast(
            pa.compute.utf8_slice_codeunits(b["image_id"], 3, 15),
            pa.int64()).to_numpy().astype(np.uint64)
        cell = b["cell"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64(idx * np.uint64(0x9E3779B97F4A7C15) ^ cell)
        # per-block mod-2^64 sum split into two 32-bit limbs: the limb
        # sums are exactly associative across ANY block partitioning
        # (review finding: a single truncating mask made the sig depend
        # on where block boundaries fell), and each limb total stays
        # ≤ 2^32·n_blocks — far inside int64, so Ray's exact-Python-int
        # Sum cannot overflow Arrow conversion (seen live at 600M rows)
        s = int(h.sum(dtype=np.uint64))     # mod 2^64, order-insensitive
        return pa.table({"s_lo": pa.array([s & 0xFFFFFFFF], pa.int64()),
                         "s_hi": pa.array([s >> 32], pa.int64())})

    t0 = time.time()
    back = lancelike.read_dataset(out_root, columns=["image_id", "cell"])
    agg = back.map_batches(sig, batch_format="pyarrow") \
              .aggregate(Sum("s_lo"), Sum("s_hi")) or {}
    rec["verify_sec"] = round(time.time() - t0, 1)
    lo = int(agg.get("sum(s_lo)") or 0)
    hi = int(agg.get("sum(s_hi)") or 0)
    rec["content_sig"] = ((hi << 32) + lo) % (1 << 64)

    rec["driver_peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
    rec["total_sec"] = round(rec["gen_sec"] + rec["pip_sec"]
                             + rec["write_sec"] + rec["verify_sec"], 1)
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
