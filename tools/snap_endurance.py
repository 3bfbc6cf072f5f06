"""Map-matching endurance, BOTH regimes.

Broadcast regime (default): 60M synthetic geo points snapped to the
sf0.01 way network (exact full point×segment min, broadcast network,
zero shuffles), recording wall time, rows/s, pair-evals/s, an
order-insensitive checksum (resume / parallelism invariance evidence)
and peak driver RSS.

Bucketed regime (``--bucketed --synthetic-segments N``): the SAME snap
contract against an N-segment synthetic road network generated as a
DATASET (never driver-resident) via the cell-bucketed expanding-ring
join — the path that completes where the broadcast cap raises
(N > 5,000,000). ``--compare`` runs both regimes on the same inputs
(requires N under the broadcast cap) and asserts identical checksums.

Run SOLO (like every bench)::

    python tools/snap_endurance.py                       # broadcast, 60M pts
    python tools/snap_endurance.py --bucketed \\
        --synthetic-segments 6000000 --n-points 1000000  # beyond-cap demo
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-points", type=int, default=60_000_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="fixture dir supplying the way network")
    ap.add_argument("--bucketed", action="store_true",
                    help="use the cell-bucketed snap join")
    ap.add_argument("--synthetic-segments", type=int, default=0,
                    help="replace the fixture network with N synthetic "
                         "short segments (generated as a Dataset)")
    ap.add_argument("--res", type=int, default=16,
                    help="bucketed grid res (synthetic short segments)")
    ap.add_argument("--compare", action="store_true",
                    help="run BOTH regimes and assert equal checksums")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from wrangle_openstreetmap_data_ray import synth
    from wrangle_openstreetmap_data_ray.pipelines import fixtures as fx
    from wrangle_openstreetmap_data_ray.stages import pip_join

    rec: dict = {"n_points": args.n_points, "cpus": args.cpus}

    t0 = time.time()
    pts_dir = synth.materialize_fixture("points", args.n_points)
    rec["gen_sec"] = round(time.time() - t0, 1)

    if args.synthetic_segments:
        t0 = time.time()
        seg_dir = synth.materialize_fixture("segments",
                                            args.synthetic_segments)
        rec["seg_gen_sec"] = round(time.time() - t0, 1)
        rec["n_segments"] = args.synthetic_segments
        segs_ds = rd.read_parquet(seg_dir)
        segs = None
        if args.compare or not args.bucketed:
            segs = pq.read_table(os.path.join(seg_dir))
    else:
        # segment network from the fixture tables (dimension side, like
        # the registry's snap query — driver-built, way_id/position
        # ordered)
        fx.materialize(args.sf_dir)
        wn = pq.read_table(fx.fixture_path(args.sf_dir, "way_nodes")) \
            .to_pandas()
        nd = pq.read_table(fx.fixture_path(args.sf_dir, "nodes"),
                           columns=["id", "lon", "lat"]).to_pandas()
        j = wn.merge(nd.rename(columns={"id": "node_id"}), on="node_id") \
            .sort_values(["way_id", "position"], kind="mergesort")
        wid = j["way_id"].to_numpy()
        pos = j["position"].to_numpy()
        lon = j["lon"].to_numpy()
        lat = j["lat"].to_numpy()
        same = (wid[1:] == wid[:-1]) & (pos[1:] == pos[:-1] + 1)
        x1, y1 = lon[:-1][same], lat[:-1][same]
        x2, y2 = lon[1:][same], lat[1:][same]
        keep = (x2 - x1) ** 2 + (y2 - y1) ** 2 > 0
        segs = pa.table({"way_id": pa.array(wid[1:][same][keep], pa.int64()),
                         "x1": pa.array(x1[keep], pa.float64()),
                         "y1": pa.array(y1[keep], pa.float64()),
                         "x2": pa.array(x2[keep], pa.float64()),
                         "y2": pa.array(y2[keep], pa.float64())})
        rec["n_segments"] = segs.num_rows
        segs_ds = rd.from_arrow(segs)

    def run(regime: str):
        t0 = time.time()
        if regime == "bucketed":
            out = pip_join.snap_to_segments_bucketed(
                rd.read_parquet(pts_dir), segs_ds, res=args.res,
                id_col="image_id", verbose=True)
        else:
            out = pip_join.snap_to_segments(rd.read_parquet(pts_dir),
                                            segs, id_col="image_id")
        agg = out.map_batches(fold, batch_format="pyarrow") \
            .aggregate(Sum("lo", alias_name="lo"),
                       Sum("hi", alias_name="hi"),
                       Sum("n", alias_name="n"))
        sec = round(time.time() - t0, 1)
        sig = f"{int(agg['lo']) & ((1 << 62) - 1):x}-" \
              f"{int(agg['hi']) & ((1 << 62) - 1):x}"
        rec[f"{regime}_sec"] = sec
        rec[f"{regime}_rows"] = int(agg["n"])
        rec[f"{regime}_rows_per_sec"] = round(int(agg["n"]) / sec, 1)
        rec[f"{regime}_content_sig"] = sig
        return sig

    def fold(b: pa.Table) -> pa.Table:
        d9 = b["d9"].to_numpy().astype(np.uint64)
        w = b["way_id"].to_numpy().astype(np.uint64)
        mix = d9 * np.uint64(0x9E3779B97F4A7C15) + w
        # two 32-bit limb sums: associative under any partitioning and
        # inside int64 for Ray's Sum (NOTES_r4 checksum lesson)
        return pa.table({
            "lo": pa.array([int((mix & np.uint64(0xFFFFFFFF)).sum()
                                % (1 << 62))], pa.int64()),
            "hi": pa.array([int((mix >> np.uint64(32)).sum()
                                % (1 << 62))], pa.int64()),
            "n": pa.array([len(d9)], pa.int64())})

    if args.compare:
        sig_b = run("bucketed")
        sig_c = run("broadcast")
        assert sig_b == sig_c, f"checksum mismatch {sig_b} vs {sig_c}"
        rec["checksums_equal"] = True
    elif args.bucketed:
        run("bucketed")
    else:
        run("broadcast")
        rec["pair_evals_per_sec"] = round(
            rec["broadcast_rows"] * rec["n_segments"]
            / rec["broadcast_sec"], 1)
    rec["peak_driver_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
