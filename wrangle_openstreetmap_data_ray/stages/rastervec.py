"""Raster → vector (north_rule "raster↔vector", the reverse direction of
``stages/tiles.py``): rasterize a point table onto per-tile count grids,
then vectorize the raster — 4-connected pixel regions become vector
bounding boxes in degrees.

Pipeline shape (all integer / exact-binary arithmetic so a DuckDB twin
can pin every row):

1. ``map_batches`` (pyarrow, zero-copy): (lon, lat) → fine-grid pixel
   coords at ``tile_res + grid_bits`` via the same equirectangular floor
   quantization as :func:`functions.geo.cell_xy`; the tile is the pixel's
   bit-shifted parent (derived from the FINE coords, never re-floored, so
   float rounding can't disagree between the two resolutions). Per-batch
   pixel counts are pre-aggregated (map-side combiner) — the shuffle
   carries ``pixels × blocks`` rows, not points.
2. ``bucketed_group_apply`` on (tile_qx, tile_qy): per tile, build the
   G×G count raster, label 4-connected occupied-pixel regions (vectorized
   min-label propagation over the whole bucket's tile stack at once), and
   emit one VECTOR row per region: pixel bbox + exact degree bbox.

Degree bboxes are exact doubles: the pixel step 360/2**(res+bits) is a
power-of-two multiple of 45, so ``k * step`` is exact for every in-range
k — the SQL twin reproduces the bytes with plain arithmetic, no rounding.

Scale notes: the raster never materializes globally — each tile's G×G
grid lives only inside its shuffle bucket; bucket count bounds Ray
per-group overhead at planetary tile counts (same rationale as the tile
renderer). The CC label loop is bounded by the longest geodesic path in
a G×G grid and runs vectorized over every tile of the bucket at once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import geo

GRID_BITS = 4            # G = 16 pixels per tile axis
_NO_LABEL = np.int32(2 ** 30)


def _pixelize(tile_res: int, grid_bits: int, lon_col: str, lat_col: str):
    """Map-side: points → partial (tile_qx, tile_qy, px, py, cnt) counts."""
    g = 1 << grid_bits

    def fn(batch: pa.Table) -> pa.Table:
        qxf, qyf = geo.cell_xy(batch[lon_col].to_numpy(),
                               batch[lat_col].to_numpy(),
                               tile_res + grid_bits)
        tqx, tqy = qxf >> grid_bits, qyf >> grid_bits
        px = qxf & (g - 1)
        py = (g - 1) - (qyf & (g - 1))      # raster convention: y grows down
        key = ((tqx * (np.int64(1) << 34) + tqy) << np.int64(2 * grid_bits)) \
            | (py << np.int64(grid_bits)) | px
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "tile_qx": (uniq >> np.int64(2 * grid_bits)) // (np.int64(1) << 34),
            "tile_qy": (uniq >> np.int64(2 * grid_bits)) % (np.int64(1) << 34),
            "px": (uniq & (g - 1)),
            "py": ((uniq >> np.int64(grid_bits)) & (g - 1)),
            "cnt": cnt.astype(np.int64),
        })
    return fn


def _label_stack(occ: np.ndarray) -> np.ndarray:
    """4-connected min-label propagation over a (T, G, G) occupancy stack.

    Labels init to the within-tile linear pixel id (py*G + px); each sweep
    takes the min over the four neighbors (axis 1/2 shifts never cross
    tiles). Converges in <= longest geodesic path iterations; every
    iteration is one numpy pass over the whole stack."""
    t, gy, gx = occ.shape
    base = (np.arange(gy, dtype=np.int32)[:, None] * gx
            + np.arange(gx, dtype=np.int32)[None, :])
    lab = np.where(occ, base[None, :, :], _NO_LABEL)
    while True:
        new = lab.copy()
        new[:, 1:, :] = np.minimum(new[:, 1:, :], lab[:, :-1, :])
        new[:, :-1, :] = np.minimum(new[:, :-1, :], lab[:, 1:, :])
        new[:, :, 1:] = np.minimum(new[:, :, 1:], lab[:, :, :-1])
        new[:, :, :-1] = np.minimum(new[:, :, :-1], lab[:, :, 1:])
        new = np.where(occ, new, _NO_LABEL)
        if np.array_equal(new, lab):
            return lab
        lab = new


def _vectorize_bucket(tile_res: int, grid_bits: int, min_count: int):
    g = 1 << grid_bits
    lon_step = (geo.LON_MAX - geo.LON_MIN) / (1 << (tile_res + grid_bits))
    lat_step = (geo.LAT_MAX - geo.LAT_MIN) / (1 << (tile_res + grid_bits))

    def fn(grp: pd.DataFrame) -> pd.DataFrame:
        # sum the map-side partials per pixel, then grid per tile
        pix = (grp.groupby(["tile_qx", "tile_qy", "px", "py"], sort=False,
                           as_index=False)["cnt"].sum())
        pix = pix[pix["cnt"] >= min_count]
        if not len(pix):
            return _EMPTY.copy()
        tiles, tinv = np.unique(
            pix["tile_qx"].to_numpy() * (np.int64(1) << 34)
            + pix["tile_qy"].to_numpy(), return_inverse=True)
        t = len(tiles)
        pxs = pix["px"].to_numpy()
        pys = pix["py"].to_numpy()
        occ = np.zeros((t, g, g), dtype=bool)
        cntg = np.zeros((t, g, g), dtype=np.int64)
        occ[tinv, pys, pxs] = True
        cntg[tinv, pys, pxs] = pix["cnt"].to_numpy()
        lab = _label_stack(occ)
        out = pd.DataFrame({
            "tile_qx": (tiles // (np.int64(1) << 34))[tinv],
            "tile_qy": (tiles % (np.int64(1) << 34))[tinv],
            "region_id": lab[tinv, pys, pxs].astype(np.int64),
            "px": pxs, "py": pys, "cnt": cntg[tinv, pys, pxs],
        })
        r = (out.groupby(["tile_qx", "tile_qy", "region_id"], as_index=False)
                .agg(n_px=("px", "size"), n_points=("cnt", "sum"),
                     px_min=("px", "min"), px_max=("px", "max"),
                     py_min=("py", "min"), py_max=("py", "max")))
        # exact degree bbox (raster y grows down: py=0 is the tile's north)
        fx0 = r["tile_qx"].to_numpy() * g + r["px_min"].to_numpy()
        fx1 = r["tile_qx"].to_numpy() * g + r["px_max"].to_numpy() + 1
        fy_top = (r["tile_qy"].to_numpy() + 1) * g - r["py_min"].to_numpy()
        fy_bot = (r["tile_qy"].to_numpy() + 1) * g - r["py_max"].to_numpy() - 1
        r["west"] = geo.LON_MIN + fx0 * lon_step
        r["east"] = geo.LON_MIN + fx1 * lon_step
        r["south"] = geo.LAT_MIN + fy_bot * lat_step
        r["north"] = geo.LAT_MIN + fy_top * lat_step
        return r
    return fn


_EMPTY = pd.DataFrame({c: pd.Series(dtype=d) for c, d in [
    ("tile_qx", "int64"), ("tile_qy", "int64"), ("region_id", "int64"),
    ("n_px", "int64"), ("n_points", "int64"),
    ("px_min", "int64"), ("px_max", "int64"),
    ("py_min", "int64"), ("py_max", "int64"),
    ("west", "float64"), ("east", "float64"),
    ("south", "float64"), ("north", "float64")]})


def rasterize_vectorize(ds, tile_res: int = 12, grid_bits: int = GRID_BITS,
                        min_count: int = 1, lon_col: str = "lon",
                        lat_col: str = "lat", n_buckets: int | None = None):
    """Point Dataset → one vector row per 4-connected raster region.

    Output: (tile_qx, tile_qy, region_id, n_px, n_points, pixel bbox,
    exact degree bbox). ``region_id`` is the region's minimum within-tile
    linear pixel id (py*G + px) — deterministic at any parallelism."""
    from ..util import bucketed_group_apply, cluster_cpus
    if n_buckets is None:
        n_buckets = min(1024, max(32, 4 * cluster_cpus()))
    pix = ds.map_batches(_pixelize(tile_res, grid_bits, lon_col, lat_col),
                         batch_format="pyarrow")
    return bucketed_group_apply(pix, ["tile_qx", "tile_qy"],
                                _vectorize_bucket(tile_res, grid_bits,
                                                  min_count), n_buckets)
