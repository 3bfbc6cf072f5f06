"""Raster tile materialization (T3) — per BASELINE.json:north_star:
*"raster tiles materialized per cell from decoded image bytes"*.

Pipeline shape: points (image rows + lon/lat) → tile id = cell at
``tile_res`` (vectorized) → MAP-SIDE decode + nearest-neighbor thumbnail
(the canvas only ever shows a ``thumb_px``² thumb, so the shuffle ships
fixed 768-byte raw thumbs instead of full encoded images — a ~5× payload
cut that also moves ALL decode work to the embarrassingly-parallel map
side; round-4 change, tile bytes identical) → ``groupby(tile)`` hash
shuffle → per-tile render: paste each thumb at its pixel position on a
``tile_px``² RGB canvas, PNG-encode the canvas.

Determinism: images paste in ascending image_id order (last-write-wins on
overlap), so tile bytes are identical at any parallelism — the
"identical tile assignments" invariant of BASELINE.json.

The renderer needs no loaded state (in-repo codecs are table-free), so a
plain callable over bucketed tile groups is the right tool (one Ray group
per hash BUCKET of tiles, never per tile — bounded group overhead at
planetary tile counts); a heavyweight codec would move decode into a
``map_batches`` actor pool over tile-partitioned blocks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import codecs, geo

TILE_PX = 256
THUMB_PX = 16


def assign_tiles(ds, tile_res: int, lon_col="lon", lat_col="lat"):
    """Add the tile cell id column (vectorized; no shuffle)."""
    def fn(batch: pa.Table) -> pa.Table:
        tile = geo.cell_encode(batch[lon_col].to_numpy(),
                               batch[lat_col].to_numpy(), tile_res)
        return batch.append_column("tile_id", pa.array(tile, pa.int64()))
    return ds.map_batches(fn, batch_format="pyarrow")


def _thumb_stage(thumb_px: int):
    """map_batches fn: decode each image ONCE map-side and replace the
    encoded payload with its raw ``thumb_px``²×3 thumbnail — the only
    pixels the tile canvas ever uses. The downstream shuffle then moves
    a fixed 3·thumb_px² bytes/row instead of arbitrary encoded images,
    and decode parallelism is the full map width, not the tile-bucket
    count."""
    def fn(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        thumbs = [codecs.resize_nearest(
            codecs.decode(b, f, w, h), thumb_px, thumb_px).tobytes()
            for b, f, w, h in zip(blobs, fmts, ws, hs)]
        keep = [c for c in batch.column_names
                if c not in ("bytes", "fmt", "w", "h")]
        return batch.select(keep).append_column(
            "thumb", pa.array(thumbs, pa.binary()))
    return fn


def _render_one(g: pd.DataFrame, tile_px: int, thumb_px: int) -> pd.DataFrame:
    """Render ONE tile's rows (all share a tile_id) to its PNG row."""
    g = g.sort_values("image_id", kind="mergesort")
    tile_id = np.int64(g["tile_id"].iloc[0])
    w, s, e, n = (float(v[0]) for v in geo.cell_bounds(np.array([tile_id])))
    canvas = np.zeros((tile_px, tile_px, 3), dtype=np.uint8)
    for r in g.itertuples():
        thumb = np.frombuffer(r.thumb, np.uint8) \
                  .reshape(thumb_px, thumb_px, 3)
        px = int((r.lon - w) / (e - w) * tile_px)
        py = int((n - r.lat) / (n - s) * tile_px)   # raster y grows down
        x0, y0 = px - thumb_px // 2, py - thumb_px // 2
        sx0, sy0 = max(0, -x0), max(0, -y0)
        dx0, dy0 = max(0, x0), max(0, y0)
        dx1 = min(tile_px, x0 + thumb_px)
        dy1 = min(tile_px, y0 + thumb_px)
        if dx1 > dx0 and dy1 > dy0:
            canvas[dy0:dy1, dx0:dx1] = thumb[sy0:sy0 + dy1 - dy0,
                                             sx0:sx0 + dx1 - dx0]
    qx, qy, res = (int(v[0]) for v in geo.cell_decode(np.array([tile_id])))
    return pd.DataFrame({
        "tile_id": [tile_id], "tile_x": [qx], "tile_y": [qy],
        "res": np.array([res], dtype=np.int32),
        "n_images": [len(g)],
        "png": [codecs.encode_png(canvas)],
    })


def _render_bucket(tile_px: int, thumb_px: int):
    """Render ALL tiles of one shuffle bucket in a single group call.

    ``groupby("tile_id").map_groups`` pays ~1 ms of Ray per-group overhead
    per populated tile — fine at 1.1k tiles, ruinous at planetary tile
    counts (10^6-10^7 groups; round-2 review). The bucketed shuffle bounds
    the group count; per-tile determinism is unchanged (each tile still
    renders alone, in ascending image_id order), so tile bytes are
    identical at any parallelism AND any bucket count."""
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [_render_one(grp, tile_px, thumb_px)
             for _, grp in g.groupby("tile_id", sort=True)],
            ignore_index=True)
    return fn


def render_tiles(ds, tile_res: int = 12, lon_col="lon", lat_col="lat",
                 tile_px: int = TILE_PX, thumb_px: int = THUMB_PX,
                 coalesce: bool = True):
    """images+geo Dataset → one PNG tile row per populated cell.

    ``coalesce`` repartitions to ~2 blocks/CPU first: Ray's sort shuffle
    on byte-heavy rows is pathological when upstream blocks are tiny and
    misaligned (measured 21s for 25 × 4 MB gen blocks vs 4.8s after an
    explicit repartition(64) on the same 100 MB); an explicit repartition
    also sets the render stage's parallelism.
    """
    from ..util import bucketed_group_apply, cluster_cpus
    tiled = assign_tiles(ds, tile_res, lon_col, lat_col) \
        .map_batches(_thumb_stage(thumb_px), batch_format="pyarrow")
    if coalesce:
        tiled = tiled.repartition(2 * cluster_cpus())
    # bounded bucket count: ≥4×CPUs for render parallelism at small scale,
    # capped so planetary tile counts never pay per-tile Ray group overhead
    n_buckets = min(1024, max(32, 4 * cluster_cpus()))
    return bucketed_group_apply(tiled, ["tile_id"],
                                _render_bucket(tile_px, thumb_px), n_buckets)
