"""Image-payload endurance run (round-4 companion to endurance_job.py):
the BYTE-heavy north-star slice one order above the XL scaling fixture —
500k encoded images (≈2 GB payloads) through decode+phash-verify →
geotag attach + per-tile raster render → phash-sorted Lance-like store
lifecycle (write w/ zone maps → copy-on-write merge_upsert → compaction →
zone-map-pruned range read) — per-phase wall, rows/s, peak driver RSS,
and an associative content checksum over (image_id, phash).

Run SOLO::

    python tools/endurance_images.py --n-images 500000
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
    ap.add_argument("--n-images", type=int, default=500_000)
    ap.add_argument("--out-root", default=None)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--gen-only", action="store_true",
                    help="materialize the fixture and exit (cache warm-up)")
    args = ap.parse_args()
    out_root = args.out_root or f"/tmp/graft_endurance/images_{args.n_images}"

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from wrangle_openstreetmap_data_ray import synth
    from wrangle_openstreetmap_data_ray.sources import lancelike
    from wrangle_openstreetmap_data_ray.stages import multimodal, tiles

    rec: dict = {"n_images": args.n_images, "cpus": args.cpus}

    t0 = time.time()
    img_dir = synth.materialize_fixture("images", args.n_images)
    rec["gen_sec"] = round(time.time() - t0, 1)
    if args.gen_only:
        print(json.dumps(rec))
        ray.shutdown()
        return

    # ---- phase 1: decode + phash verify (the per-image compute slice)
    t0 = time.time()
    n_dec = multimodal.decode_features(rd.read_parquet(img_dir),
                                       verify_phash=True).count()
    rec["decode_sec"] = round(time.time() - t0, 1)
    rec["decode_rows"] = int(n_dec)
    rec["decode_rows_per_s"] = round(n_dec / rec["decode_sec"], 1)

    # ---- phase 2: geotag attach + per-tile raster render (byte shuffle)
    t0 = time.time()
    imgs_geo = rd.read_parquet(img_dir).map_batches(
        synth.attach_lonlat, batch_format="pyarrow")
    n_tiles = tiles.render_tiles(imgs_geo, tile_res=14).count()
    rec["tiles"] = int(n_tiles)
    rec["tiles_sec"] = round(time.time() - t0, 1)

    # ---- phase 3: store lifecycle at 10× (bench.store_lifecycle shape)
    import shutil
    shutil.rmtree(out_root, ignore_errors=True)
    imgs = rd.read_parquet(img_dir)
    t0 = time.time()
    lancelike.write_dataset(imgs.sort("phash"), out_root, stage="base",
                            resume=False, zonemap_cols=["phash"])
    rec["write_sec"] = round(time.time() - t0, 1)

    def mk_upd(b: pa.Table) -> pa.Table:
        ph = b["phash"].to_numpy().astype(np.uint64)
        f = b.filter(pa.array((ph % np.uint64(64)) == 0))
        cap = pc.binary_join_element_wise(
            pa.array(["recaption:"] * f.num_rows, pa.string()),
            f["caption"], "")
        return f.set_column(f.schema.get_field_index("caption"),
                            "caption", cap)

    t0 = time.time()
    lancelike.merge_upsert(imgs.map_batches(mk_upd, batch_format="pyarrow"),
                           out_root, key_col="image_id", stage="upsert")
    rec["upsert_sec"] = round(time.time() - t0, 1)

    # ---- phase 3b: the SAME recaption shape via merge-on-read (round-5
    # VERDICT item 3): keys uniform over phash-sorted fragments is CoW's
    # worst case (every fragment rewrites); MoR commits delta fragments +
    # a sequence-scoped tombstone with zero existing-fragment I/O, reads
    # pay a scan-time anti-join until apply_tombstones materializes.
    def mk_upd2(b: pa.Table) -> pa.Table:
        ph = b["phash"].to_numpy().astype(np.uint64)
        f = b.filter(pa.array((ph % np.uint64(64)) == np.uint64(1)))
        cap = pc.binary_join_element_wise(
            pa.array(["recaption2:"] * f.num_rows, pa.string()),
            f["caption"], "")
        return f.set_column(f.schema.get_field_index("caption"),
                            "caption", cap)

    t0 = time.time()
    lancelike.merge_upsert_mor(
        imgs.map_batches(mk_upd2, batch_format="pyarrow"),
        out_root, key_col="image_id", stage="mor_upsert")
    rec["mor_upsert_sec"] = round(time.time() - t0, 1)
    t0 = time.time()
    n_through_ts = lancelike.read_dataset(
        out_root, columns=["image_id"]).count()
    rec["mor_scan_sec"] = round(time.time() - t0, 1)
    assert n_through_ts == args.n_images, n_through_ts
    t0 = time.time()
    lancelike.apply_tombstones(out_root, stage="materialize")
    rec["apply_ts_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    lancelike.compact(out_root, stage="compact", zonemap_cols=["phash"])
    rec["compact_sec"] = round(time.time() - t0, 1)
    lo = -(1 << 62)
    out, scanned, total = lancelike.read_dataset_range(
        out_root, "phash", lo, lo + (1 << 60),
        columns=["image_id", "phash"])
    rec["pruned_scan"] = f"{scanned}/{total}"
    man = lancelike.latest_manifest(out_root)
    rec["n_fragments"] = len(man["fragments"])
    rec["manifest_rows"] = int(man["total_rows"])

    # ---- phase 4: content sig over (image_id index, phash) — two-limb
    # mod-2^64 fold, associative under any partitioning
    from ray.data.aggregate import Sum
    from wrangle_openstreetmap_data_ray.functions.hashing import splitmix64

    def sig(b: pa.Table) -> pa.Table:
        idx = pc.cast(pc.utf8_slice_codeunits(b["image_id"], 3, 15),
                      pa.int64()).to_numpy().astype(np.uint64)
        ph = b["phash"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64(idx * np.uint64(0x9E3779B97F4A7C15) ^ ph)
        s = int(h.sum(dtype=np.uint64))
        return pa.table({"s_lo": pa.array([s & 0xFFFFFFFF], pa.int64()),
                         "s_hi": pa.array([s >> 32], pa.int64())})

    t0 = time.time()
    back = lancelike.read_dataset(out_root, columns=["image_id", "phash"])
    agg = back.map_batches(sig, batch_format="pyarrow") \
              .aggregate(Sum("s_lo"), Sum("s_hi")) or {}
    rec["verify_sec"] = round(time.time() - t0, 1)
    lo_s = int(agg.get("sum(s_lo)") or 0)
    hi_s = int(agg.get("sum(s_hi)") or 0)
    rec["content_sig"] = ((hi_s << 32) + lo_s) % (1 << 64)

    rec["driver_peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
    rec["total_sec"] = round(sum(v for k, v in rec.items()
                                 if k.endswith("_sec")), 1)
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
