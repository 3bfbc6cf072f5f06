"""Spatial join: point-in-polygon with cell prefilter (J3 / T2).

Generalizes the reference's bounding-box membership check
([R:notebook::bbox check], SURVEY.md §2 M7) per BASELINE.json:north_star:
*"point-in-polygon tested against OSM admin/neighborhood polygons with a
cell-prefiltered ray-casting kernel"*.

Design (broadcast, no shuffle — the polygon side is small):
1. Driver: build a ``PolygonIndex`` — per polygon the ring arrays + its
   covering-cell set at a prefilter resolution; invert to cell → [polygon].
   ``ray.put`` the index ONCE.
2. Actor pool: per batch, vectorized cell encode → bucket points by
   candidate polygon via the inverted index → ONE ray-cast refine per
   (polygon, its candidate points) — the loop is over polygons touched by
   the batch, never over points.

Semantics: inner spatial join — one output row per (point, containing
polygon); points in N overlapping polygons emit N rows; points in no
polygon are dropped (use ``pip_tag`` for left-join/quarantine semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import geo
from ..state.broadcast import BroadcastLookup

DEFAULT_PREFILTER_RES = 13  # ~4.4 km cells at the equator


class PolygonIndex:
    """Driver-built, broadcast-once polygon index."""

    def __init__(self, polygons: pa.Table, res: int = DEFAULT_PREFILTER_RES):
        self.res = res
        self.ids: list[str] = polygons["polygon_id"].to_pylist()
        self.names: list[str] = polygons["name"].to_pylist()
        self.rings: list[tuple[np.ndarray, np.ndarray]] = []
        self.cell_to_polys: dict[int, list[int]] = {}
        for pi, ring in enumerate(polygons["ring"].to_pylist()):
            rx = np.array([p["lon"] for p in ring])
            ry = np.array([p["lat"] for p in ring])
            self.rings.append((rx, ry))
            for c in geo.polygon_cover_cells(rx, ry, res).tolist():
                self.cell_to_polys.setdefault(c, []).append(pi)

    def candidates(self, cells: np.ndarray) -> dict[int, np.ndarray]:
        """cell array → {polygon_idx: point positions with that candidate}."""
        out: dict[int, list[int]] = {}
        # group identical cells first: lookups once per distinct cell
        uniq, inv = np.unique(cells, return_inverse=True)
        for ui, c in enumerate(uniq.tolist()):
            polys = self.cell_to_polys.get(c)
            if not polys:
                continue
            pts = np.nonzero(inv == ui)[0]
            for pi in polys:
                out.setdefault(pi, []).append(pts)
        return {pi: np.concatenate(v) for pi, v in out.items()}


class PIPJoin(BroadcastLookup):
    """Actor-pool stage: batch of points → (point cols..., polygon_id, name).

    ``fn_constructor_args=(index_ref, lon_col, lat_col)`` — the index is
    fetched from the object store once per actor (zero-copy numpy views).
    """

    def __init__(self, ref, lon_col: str = "lon", lat_col: str = "lat",
                 keep_cols: list[str] | None = None):
        super().__init__(ref)
        self.lon_col, self.lat_col = lon_col, lat_col
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx: PolygonIndex = self.state
        lon = batch[self.lon_col].to_numpy()
        lat = batch[self.lat_col].to_numpy()
        cells = geo.cell_encode(lon, lat, idx.res)
        keep = self.keep_cols or [c for c in batch.column_names]
        take_rows, poly_ids, poly_names = [], [], []
        for pi, pts in idx.candidates(cells).items():
            rx, ry = idx.rings[pi]
            inside = geo.point_in_polygon(lon[pts], lat[pts], rx, ry)
            hit = pts[inside]
            if len(hit):
                take_rows.append(hit)
                poly_ids.extend([idx.ids[pi]] * len(hit))
                poly_names.extend([idx.names[pi]] * len(hit))
        if not take_rows:
            empty = batch.select(keep).slice(0, 0)
            return empty.append_column("polygon_id", pa.array([], pa.string())) \
                        .append_column("polygon_name", pa.array([], pa.string()))
        rows = np.concatenate(take_rows)
        out = batch.select(keep).take(pa.array(rows))
        return out.append_column("polygon_id", pa.array(poly_ids)) \
                  .append_column("polygon_name", pa.array(poly_names))


def pip_join(points_ds, polygons: pa.Table, lon_col: str = "lon",
             lat_col: str = "lat", res: int = DEFAULT_PREFILTER_RES,
             keep_cols: list[str] | None = None, concurrency=None,
             batch_size: int = 16384):
    """points ⨝ polygons (containment). Broadcast polygon index; TASK-based
    map by default: the index lives in the object store once per node and
    ``ray.get`` inside the task is a zero-copy local read after the first
    fetch, so plain tasks get actor-warm state while scaling up instantly
    (measured 3× faster than an autoscaling actor pool on a full node —
    the pool ramps too slowly). Pass ``concurrency`` to force a pool (e.g.
    when the index must be deserialized into Python objects per process).
    """
    import ray
    ref = ray.put(PolygonIndex(polygons, res))
    if concurrency is not None:
        return points_ds.map_batches(
            PIPJoin, fn_constructor_args=(ref, lon_col, lat_col, keep_cols),
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, num_cpus=1)

    def pip_task(batch: pa.Table) -> pa.Table:
        # memoize the deserialized index per long-lived worker process:
        # ray.get re-unpickles the Python dict/list parts on every call,
        # so tasks cache the constructed PIPJoin keyed by the object ref
        key = (ref.hex(), lon_col, lat_col, tuple(keep_cols or ()))
        fn = _PIP_TASK_CACHE.get(key)
        if fn is None:
            # bounded memo: long-lived workers serving many pip_join calls
            # with different polygon tables must not retain every
            # deserialized index forever — keep only a few recent entries
            if len(_PIP_TASK_CACHE) >= 4:
                _PIP_TASK_CACHE.clear()
            fn = _PIP_TASK_CACHE[key] = PIPJoin(ref, lon_col, lat_col,
                                                keep_cols)
        return fn(batch)

    return points_ds.map_batches(pip_task, batch_format="pyarrow",
                                 batch_size=batch_size)


_PIP_TASK_CACHE: dict = {}


def nearest_boundary_join(points_ds, polygons: pa.Table,
                          lon_col: str = "lon", lat_col: str = "lat",
                          id_col: str = "image_id",
                          point_chunk: int = 1024):
    """Distance from every point to the NEAREST polygon boundary — the
    spatial "distance to nearest facility/admin edge" join, exact by
    construction: the polygon side is a small broadcast dimension (rings
    exploded to directed edges, ``ray.put`` once), and each batch computes
    the full point×edge min vectorized (segment-projection distance with
    clamped parameter t), chunked so the (P, E) matrix stays
    cache-resident. No prefilter — a cell prefilter could miss the true
    nearest when the closest polygon is far away.

    Emits (id, d9): planar lon/lat degrees as integer nanodegrees
    (floor(sqrt(min d²)·1e9 + 0.5)) so the result is hash-stable and the
    SQL twin can reproduce the identical float expression tree.
    At 100 TB the points stream map-only (zero shuffles); the edge set is
    dimension-sized (admin boundaries), exactly like the PIP index.
    """
    import ray

    ex1, ey1, ex2, ey2, _ = geo.ring_edges(polygons)  # SAME edge def as
    dx, dy = ex2 - ex1, ey2 - ey1                     # the oracle fixture
    len2 = dx * dx + dy * dy
    if np.any(len2 == 0):
        raise ValueError("degenerate zero-length polygon edge")
    ref = ray.put((ex1, ey1, dx, dy, len2))

    def fn(batch: pa.Table) -> pa.Table:
        from ..util import _bcast_get
        bx1, by1, bdx, bdy, bl2 = _bcast_get(ref)
        px = batch[lon_col].to_numpy()
        py = batch[lat_col].to_numpy()
        best = np.full(len(px), np.inf)
        # chunk BOTH axes: at admin-boundary scale E can reach 10^4-10^5
        # edges, and an un-chunked (P, E) float64 temporary would be
        # gigabytes per task (review finding) — 1024×4096 keeps every
        # temporary ≤ 32 MB with a running min across edge chunks
        edge_chunk = 4096
        for c0 in range(0, len(px), point_chunk):
            p_x = px[c0:c0 + point_chunk, None]
            p_y = py[c0:c0 + point_chunk, None]
            acc = best[c0:c0 + point_chunk]
            for e0 in range(0, len(bx1), edge_chunk):
                x1 = bx1[None, e0:e0 + edge_chunk]
                y1 = by1[None, e0:e0 + edge_chunk]
                dx = bdx[None, e0:e0 + edge_chunk]
                dy = bdy[None, e0:e0 + edge_chunk]
                l2 = bl2[None, e0:e0 + edge_chunk]
                t = ((p_x - x1) * dx + (p_y - y1) * dy) / l2
                t = np.clip(t, 0.0, 1.0)
                cx = x1 + t * dx
                cy = y1 + t * dy
                d2 = (p_x - cx) * (p_x - cx) + (p_y - cy) * (p_y - cy)
                np.minimum(acc, d2.min(axis=1), out=acc)
        d9 = np.floor(np.sqrt(best) * 1e9 + 0.5).astype(np.int64)
        return pa.table({"id": batch[id_col],
                         "d9": pa.array(d9, pa.int64())})

    return points_ds.map_batches(fn, batch_format="pyarrow")


def _snap_tile_min(px, py, bw, bx1, by1, bdx, bdy, bil2,
                   best, bestw, point_chunk: int = 2048,
                   seg_chunk: int = 256) -> None:
    """Shared point×segment clamped-projection min kernel — updates
    ``best`` (d2) / ``bestw`` (way_id) IN PLACE with the lexicographic
    (d2, way_id) minimum over the given segments. Both the broadcast and
    the cell-bucketed snap paths run THIS function, so their float trees
    (multiply-by-reciprocal t, e = t·d − (p−a), squared in place) are
    bit-identical to each other and to the SQL twin. Segments MUST be
    way_id-sorted: per-tile argmin's first-min index then IS the
    smallest-way_id tiebreak."""
    for c0 in range(0, len(px), point_chunk):
        p_x = px[c0:c0 + point_chunk, None]
        p_y = py[c0:c0 + point_chunk, None]
        acc = best[c0:c0 + point_chunk]
        accw = bestw[c0:c0 + point_chunk]
        rows = np.arange(len(acc))
        for e0 in range(0, len(bx1), seg_chunk):
            x1 = bx1[None, e0:e0 + seg_chunk]
            y1 = by1[None, e0:e0 + seg_chunk]
            sdx = bdx[None, e0:e0 + seg_chunk]
            sdy = bdy[None, e0:e0 + seg_chunk]
            dpx = p_x - x1
            dpy = p_y - y1
            t = dpx * sdx
            t += dpy * sdy
            t *= bil2[None, e0:e0 + seg_chunk]
            np.clip(t, 0.0, 1.0, out=t)
            ex = t * sdx
            ex -= dpx                 # -(dpx - t·dx); square equal
            ey = t * sdy
            ey -= dpy
            ex *= ex
            ey *= ey
            ex += ey                  # d2, built in place
            j = ex.argmin(axis=1)     # first min = smallest way_id
            m = ex[rows, j]
            wm = bw[e0 + j]
            upd = (m < acc) | ((m == acc) & (wm < accw))
            acc[upd] = m[upd]
            accw[upd] = wm[upd]


def snap_to_segments(points_ds, segments: pa.Table,
                     lon_col: str = "lon", lat_col: str = "lat",
                     id_col: str = "image_id",
                     point_chunk: int = 2048,
                     max_segments: int = 5_000_000):
    """Map-matching primitive: snap every point to the NEAREST segment of
    a line network — (id, way_id, d9) with distance ties resolved to the
    smallest way_id, exact by construction (full point×segment min, no
    prefilter that could miss a far-away nearest).

    ``segments`` is the dimension side (way_id:int64, x1, y1, x2, y2 in
    lon/lat degrees): a road network is bounded (10^6-10^8 segments)
    while points scale to 10^12, so the network broadcasts once
    (``ray.put``) and points stream map-only with zero shuffles —
    exactly the PIP/boundary-join shape. Beyond ``max_segments`` this
    raises: at that size snap must become a cell-bucketed join with an
    expanding-ring guarantee (the kNN stage's pattern), not a broadcast.

    Zero-length segments (consecutive duplicate vertices) must be
    dropped by the CALLER on both engine and oracle sides — they have no
    projection and would divide by zero.
    """
    import ray

    if segments.num_rows > max_segments:
        raise ValueError(
            f"{segments.num_rows} segments exceeds the broadcast cap "
            f"({max_segments}); use a cell-bucketed snap join instead")
    w = segments["way_id"].to_numpy()
    # ascending way_id makes per-tile argmin's FIRST-min index the
    # smallest-way_id tiebreak for free (no tie-matrix passes)
    order = np.argsort(w, kind="stable")
    w = np.ascontiguousarray(w[order])
    sx1 = np.ascontiguousarray(segments["x1"].to_numpy()[order])
    sy1 = np.ascontiguousarray(segments["y1"].to_numpy()[order])
    dx = np.ascontiguousarray(segments["x2"].to_numpy()[order]) - sx1
    dy = np.ascontiguousarray(segments["y2"].to_numpy()[order]) - sy1
    len2 = dx * dx + dy * dy
    if np.any(len2 == 0):
        raise ValueError("degenerate zero-length segment (drop before snap)")
    il2 = 1.0 / len2      # divide ONCE per segment, multiply per pair
    ref = ray.put((w, sx1, sy1, dx, dy, il2))

    def fn(batch: pa.Table) -> pa.Table:
        from ..util import _bcast_get
        bw, bx1, by1, bdx, bdy, bil2 = _bcast_get(ref)
        px = batch[lon_col].to_numpy()
        py = batch[lat_col].to_numpy()
        best = np.full(len(px), np.inf)
        bestw = np.full(len(px), np.iinfo(np.int64).max, np.int64)
        # seg_chunk=256: the (P, S) tile set stays L2/L3-resident — the
        # 4096-wide tiles of the first version were memory-bound (4×
        # slower, measured); float tree documented on _snap_tile_min
        _snap_tile_min(px, py, bw, bx1, by1, bdx, bdy, bil2,
                       best, bestw, point_chunk=point_chunk)
        d9 = np.floor(np.sqrt(best) * 1e9 + 0.5).astype(np.int64)
        return pa.table({"id": batch[id_col],
                         "way_id": pa.array(bestw, pa.int64()),
                         "d9": pa.array(d9, pa.int64())})

    return points_ds.map_batches(fn, batch_format="pyarrow")


def snap_to_segments_bucketed(points_ds, segments_ds,
                              res: int = 12,
                              lon_col: str = "lon", lat_col: str = "lat",
                              id_col: str = "image_id",
                              n_buckets: int = 512,
                              needed_cells_cap: int = 2_000_000,
                              cover_cap: int = 4096,
                              verbose: bool = False):
    """Beyond-broadcast map matching (VERDICT r4 item 2): snap every
    point to its exact nearest segment when the network is too big to
    ``ray.put`` (``snap_to_segments``' 5M cap) — segments arrive as a
    DATASET and never materialize on the driver.

    Same contract as the broadcast path: (id, way_id, d9), ties to the
    smallest way_id, exact by the expanding-ring guarantee (the kNN
    stage's pattern, stages/knn.py):

    1. Segments explode map-side to the grid cells of their bbox at
       ``res`` (a superset of the cells they intersect — never misses
       the cell holding any closest point); replicated rows are
       materialized ONCE and reused by every pass.
    2. Pass A: each point probes its 3×3 home ring through ONE bounded
       bucketed shuffle on cell; the per-bucket kernel is the SAME
       ``_snap_tile_min`` float tree as the broadcast path, per cell
       group, way_id-sorted. A point whose best d2 < (1·cell_h)² is
       exact (any segment registered only in ring ≥ 2 cells is ≥ one
       cell-height away) and resolves immediately — the common case
       when ``res`` matches the network density.
    3. Pass B: an unresolved point with an upper bound d_ub explodes to
       the full cell rectangle covering radius d_ub (rx = ⌊d_ub/cell_w⌋+1
       per axis) — after that single extra pass its answer is exact.
       Points with NO ring-1 candidate get an upper bound from the
       coarse-occupancy broadcast instead, then take the
       same single definitive rectangle pass, with the upper bound
       coming from the broadcast coarse occupancy of the network.

    Scale/skew notes: each pass's exchange carries points × ring cells
    (9 in pass A) plus the replicated segment rows — no all-pairs
    anywhere; small straggler rounds broadcast their needed-cell set
    (capped at ``needed_cells_cap``) to semi-filter the segment side
    map-side, so late rounds touch only the cells they probe. A hot
    cell (urban skew) is bounded by its own point×segment product;
    a finer ``res`` splits the cell further without affecting exactness.
    """
    import pandas as pd
    import ray

    from ..util import bucketed_group_apply

    n = np.int64(1) << np.int64(res)
    cell_w, cell_h = 360.0 / float(n), 180.0 / float(n)

    def _gx(lon):
        return np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)

    def _gy(lat):
        return np.clip(((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)

    # ---- 1. segment → covering cells (chopped supercover), replicated
    # once. A LONG segment's bbox cover is quadratic in its length
    # (a 0.9° diagonal at res 15 covers 7000+ cells); instead the
    # segment is chopped into ≤half-cell steps and each step's 2×2
    # bbox-cell set is registered — a conservative supercover, LINEAR
    # in length. Distances are still computed against the ORIGINAL
    # segment geometry; only cell registration uses the chops.
    def seg_cover(b: pa.Table) -> pa.Table:
        w = b["way_id"].to_numpy()
        x1 = b["x1"].to_numpy().astype(np.float64)
        y1 = b["y1"].to_numpy().astype(np.float64)
        x2 = b["x2"].to_numpy().astype(np.float64)
        y2 = b["y2"].to_numpy().astype(np.float64)
        dx, dy = x2 - x1, y2 - y1
        len2 = dx * dx + dy * dy
        if np.any(len2 == 0):
            raise ValueError("degenerate zero-length segment (drop "
                             "before snap)")
        il2 = 1.0 / len2
        # steps per segment: ceil(2·span/cell) half-cell samples/axis
        nst = np.maximum(np.ceil(2.0 * np.maximum(
            np.abs(dx) / cell_w, np.abs(dy) / cell_h)), 1).astype(np.int64)
        if nst.max(initial=0) > cover_cap:
            raise ValueError(
                f"a segment chops to {int(nst.max())} steps at res={res} "
                f"(cap {cover_cap}); use a coarser res or pre-split the "
                "segment")
        idx = np.repeat(np.arange(len(w)), nst + 1)
        step = np.arange(len(idx)) - np.repeat(
            np.cumsum(nst + 1) - (nst + 1), nst + 1)
        f0 = step / nst[idx]                       # chop endpoints
        f1 = np.minimum((step + 1) / nst[idx], 1.0)
        cx0 = x1[idx] + f0 * dx[idx]
        cy0 = y1[idx] + f0 * dy[idx]
        cx1 = x1[idx] + f1 * dx[idx]
        cy1 = y1[idx] + f1 * dy[idx]
        gx_lo, gx_hi = _gx(np.minimum(cx0, cx1)), _gx(np.maximum(cx0, cx1))
        gy_lo, gy_hi = _gy(np.minimum(cy0, cy1)), _gy(np.maximum(cy0, cy1))
        # each chop's bbox is ≤2×2 cells by construction — emit the
        # (≤4) corner cells and dedupe (cell, segment) pairs
        cells, segi = [], []
        for ox in (0, 1):
            for oy in (0, 1):
                cgx = np.minimum(gx_lo + ox, gx_hi)
                cgy = np.minimum(gy_lo + oy, gy_hi)
                cells.append(cgx * n + cgy)
                segi.append(idx)
        cell = np.concatenate(cells)
        si = np.concatenate(segi)
        # dedupe (cell, segment) pairs without a composite key that
        # could overflow int64 at deep res: lexsort + adjacent-diff
        order = np.lexsort((si, cell))
        cell, si = cell[order], si[order]
        first = np.ones(len(cell), bool)
        first[1:] = (cell[1:] != cell[:-1]) | (si[1:] != si[:-1])
        cell, si = cell[first], si[first]
        return pa.table({
            "cell": pa.array(cell, pa.int64()),
            "way_id": pa.array(w[si], pa.int64()),
            "x1": pa.array(x1[si], pa.float64()),
            "y1": pa.array(y1[si], pa.float64()),
            "dx": pa.array(dx[si], pa.float64()),
            "dy": pa.array(dy[si], pa.float64()),
            "il2": pa.array(il2[si], pa.float64()),
            "side": pa.array(np.zeros(len(si), np.int8)),
            "pid": pa.nulls(len(si), pa.string()),
            "px": pa.nulls(len(si), pa.float64()),
            "py": pa.nulls(len(si), pa.float64()),
        })

    import time as _time
    _t0 = _time.time()

    def _vlog(msg: str) -> None:
        if verbose:
            print(f"[snap_bucketed +{_time.time() - _t0:6.1f}s] {msg}",
                  flush=True)

    seg_cells = segments_ds.map_batches(
        seg_cover, batch_format="pyarrow").materialize()
    _vlog(f"seg_cells materialized: {seg_cells.count()} rows")

    def _emit_probe(pid: np.ndarray, px: np.ndarray, py: np.ndarray,
                    cells: np.ndarray) -> pa.Table:
        k = len(cells)
        return pa.table({
            "cell": pa.array(cells.astype(np.int64), pa.int64()),
            "way_id": pa.nulls(k, pa.int64()),
            "x1": pa.nulls(k, pa.float64()),
            "y1": pa.nulls(k, pa.float64()),
            "dx": pa.nulls(k, pa.float64()),
            "dy": pa.nulls(k, pa.float64()),
            "il2": pa.nulls(k, pa.float64()),
            "side": pa.array(np.ones(k, np.int8)),
            "pid": pa.array(pid, pa.string()),
            "px": pa.array(px, pa.float64()),
            "py": pa.array(py, pa.float64()),
        })

    def probe_cells(pts_tab: pa.Table, rect: bool,
                    lo: int = 0, hi: int = 1) -> pa.Table:
        """Point rows → (cell, point) rows, fully vectorized. rect=True:
        per-point radius rectangle from the rx/ry columns (vectorized
        per distinct (rx, ry) — the radii quantize to few values);
        rect=False: one fixed Chebyshev ring-band offset set applied to
        every point at once."""
        pid = np.asarray(pts_tab["pid"].to_pylist(), dtype=object)
        px = pts_tab["px"].to_numpy().astype(np.float64)
        py = pts_tab["py"].to_numpy().astype(np.float64)
        gx, gy = _gx(px), _gy(py)
        if len(px) == 0:
            return _emit_probe(pid, px, py, np.empty(0, np.int64))

        def band_cells(sel: np.ndarray, ox: np.ndarray,
                       oy: np.ndarray) -> tuple:
            """All points in ``sel`` × one offset set, in-bounds mask."""
            cx = gx[sel][:, None] + ox[None, :]
            cy = gy[sel][:, None] + oy[None, :]
            m = (cx >= 0) & (cx < n) & (cy >= 0) & (cy < n)
            reps = m.sum(axis=1)
            return ((cx[m] * n + cy[m]).ravel(),
                    np.repeat(pid[sel], reps),
                    np.repeat(px[sel], reps), np.repeat(py[sel], reps))

        if not rect:
            d = np.arange(-hi, hi + 1)
            ox, oy = np.meshgrid(d, d, indexing="ij")
            keep = np.maximum(np.abs(ox), np.abs(oy)) >= lo
            cells, pids, pxs, pys = band_cells(
                np.arange(len(px)), ox[keep].ravel(), oy[keep].ravel())
            return _emit_probe(pids, pxs, pys, cells)

        rxs = pts_tab["rx"].to_numpy().astype(np.int64)
        rys = pts_tab["ry"].to_numpy().astype(np.int64)
        parts = []
        for rx, ry in {(int(a), int(b)) for a, b in zip(rxs, rys)}:
            sel = np.nonzero((rxs == rx) & (rys == ry))[0]
            ox, oy = np.meshgrid(np.arange(-rx, rx + 1),
                                 np.arange(-ry, ry + 1), indexing="ij")
            parts.append(band_cells(sel, ox.ravel(), oy.ravel()))
        return _emit_probe(np.concatenate([p[1] for p in parts]),
                           np.concatenate([p[2] for p in parts]),
                           np.concatenate([p[3] for p in parts]),
                           np.concatenate([p[0] for p in parts]))

    def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
        """Per bucket: for every cell group, the lexicographic (d2,
        way_id) min of each point against the cell's segments — the
        same tile kernel as the broadcast path."""
        out_pid, out_px, out_py, out_d2, out_w = [], [], [], [], []
        for _, cg in g.groupby("cell", sort=False):
            segs = cg[cg["side"] == 0]
            pts = cg[cg["side"] == 1]
            if not len(pts):
                continue
            if not len(segs):
                # keep the point visible downstream: an all-inf reduce
                # result marks a no-candidate point without a separate
                # anti-join pass
                k = len(pts)
                out_pid.append(pts["pid"].to_numpy())
                out_px.append(pts["px"].to_numpy().astype(np.float64))
                out_py.append(pts["py"].to_numpy().astype(np.float64))
                out_d2.append(np.full(k, np.inf))
                out_w.append(np.full(k, np.iinfo(np.int64).max, np.int64))
                continue
            order = np.argsort(segs["way_id"].to_numpy(), kind="stable")
            bw = segs["way_id"].to_numpy()[order].astype(np.int64)
            bx1 = np.ascontiguousarray(segs["x1"].to_numpy()[order])
            by1 = np.ascontiguousarray(segs["y1"].to_numpy()[order])
            bdx = np.ascontiguousarray(segs["dx"].to_numpy()[order])
            bdy = np.ascontiguousarray(segs["dy"].to_numpy()[order])
            bil2 = np.ascontiguousarray(segs["il2"].to_numpy()[order])
            px = pts["px"].to_numpy().astype(np.float64)
            py = pts["py"].to_numpy().astype(np.float64)
            best = np.full(len(px), np.inf)
            bestw = np.full(len(px), np.iinfo(np.int64).max, np.int64)
            _snap_tile_min(px, py, bw, bx1, by1, bdx, bdy, bil2,
                           best, bestw)
            out_pid.append(pts["pid"].to_numpy())
            out_px.append(px)
            out_py.append(py)
            out_d2.append(best)
            out_w.append(bestw)
        if not out_pid:
            return pd.DataFrame({
                "pid": pd.Series([], dtype="string"),
                "px": pd.Series([], dtype="float64"),
                "py": pd.Series([], dtype="float64"),
                "d2": pd.Series([], dtype="float64"),
                "way_id": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "pid": pd.Series(np.concatenate(out_pid), dtype="string"),
            "px": np.concatenate(out_px), "py": np.concatenate(out_py),
            "d2": np.concatenate(out_d2),
            "way_id": np.concatenate(out_w).astype(np.int64)})

    def reduce_best(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["pid", "d2", "way_id"], kind="mergesort")
        d = d.drop_duplicates("pid")
        return d[["pid", "px", "py", "d2", "way_id"]]

    def semi_filter_segs(needed: np.ndarray):
        """Map-side prune of the replicated segment rows to the cells a
        (small) straggler round actually probes."""
        ref = ray.put(np.unique(needed))

        def fn(b: pa.Table) -> pa.Table:
            from ..util import _bcast_get
            cells = _bcast_get(ref)
            return b.filter(pa.array(np.isin(
                b["cell"].to_numpy(), cells, assume_unique=False)))
        return seg_cells.map_batches(fn, batch_format="pyarrow")

    def probe_pass(pts_ds, segs_side, rect: bool, lo: int = 0,
                   hi: int = 1):
        probes = pts_ds.map_batches(
            lambda b, _r=rect, _lo=lo, _hi=hi:
                probe_cells(b, _r, _lo, _hi),
            batch_format="pyarrow")
        part = bucketed_group_apply(probes.union(segs_side), ["cell"],
                                    bucket_min, n_buckets)
        return bucketed_group_apply(part, ["pid"], reduce_best,
                                    n_buckets)

    def pts_state(ds):
        return ds.map_batches(
            lambda b: pa.table({
                "pid": pa.compute.cast(b[id_col], pa.string()),
                "px": pa.compute.cast(b[lon_col], pa.float64()),
                "py": pa.compute.cast(b[lat_col], pa.float64())}),
            batch_format="pyarrow")

    state = pts_state(points_ds).materialize()

    # ---- Pass A: home 3×3 ring
    best = probe_pass(state, seg_cells, rect=False, lo=0, hi=1) \
        .materialize()
    _vlog(f"pass A done: {best.count()} candidates")

    resolved_parts = []
    guard2 = (1.0 * cell_h) ** 2

    # three-way split on the pass-A bound: d2 < guard² is exact;
    # finite-but-unresolved points carry a real d_ub; d2 = inf marks
    # points whose whole ring was segment-free (the inf partial rows —
    # no separate anti-join pass needed)
    def _split(b: pa.Table, which: str) -> pa.Table:
        d2 = b["d2"].to_numpy()
        if which == "res":
            return b.filter(pa.array(d2 < guard2))
        if which == "unres":
            return b.filter(pa.array((d2 >= guard2) & np.isfinite(d2)))
        return b.filter(pa.array(np.isinf(d2)))

    res_a = best.map_batches(lambda b: _split(b, "res"),
                             batch_format="pyarrow")
    unres = best.map_batches(lambda b: _split(b, "unres"),
                             batch_format="pyarrow").materialize()
    nocand = best.map_batches(lambda b: _split(b, "nocand"),
                              batch_format="pyarrow").materialize()
    resolved_parts.append(res_a)

    # ---- Pass B: definitive rectangle for bounded-but-unresolved points
    def with_rect(b: pa.Table) -> pa.Table:
        d = np.sqrt(b["d2"].to_numpy())
        rx = np.floor(d / cell_w).astype(np.int64) + 1
        ry = np.floor(d / cell_h).astype(np.int64) + 1
        return b.append_column("rx", pa.array(rx, pa.int64())) \
                .append_column("ry", pa.array(ry, pa.int64()))

    def run_rect(unres_ds):
        rect_pts = unres_ds.map_batches(with_rect, batch_format="pyarrow")
        cnt = rect_pts.count()
        segs_side = seg_cells
        if 0 < cnt * 64 <= needed_cells_cap:   # small round: prune map-side
            import ray as _ray
            cells = []
            for t in _ray.get(rect_pts.to_arrow_refs()):
                if isinstance(t, pa.Table) and t.num_rows:
                    pr = probe_cells(t, rect=True)
                    cells.append(pr["cell"].to_numpy())
            if cells:
                segs_side = semi_filter_segs(np.concatenate(cells))
        return probe_pass(rect_pts, segs_side, rect=True)

    n_unres, n_nocand = unres.count(), nocand.count()
    _vlog(f"pass A split: {n_unres} unresolved, {n_nocand} no-candidate")

    # ---- stragglers: ALL remaining points take ONE definitive
    # rectangle pass. Pass-A unresolved already hold a real d_ub; the
    # no-candidate points get one from the broadcast COARSE occupancy
    # of the network (distinct cells at res−k, k escalated until the
    # set fits the broadcast cap): any occupied coarse cell came from a
    # chop bbox ≤1 fine cell from the segment, so (distance to the
    # cell's far corner) + one fine-cell diagonal is a true upper
    # bound. This replaces a per-band shuffle loop (measured 4 bands ×
    # ~15 s at sf0.01) with one map-side bound + one shuffle.
    rect_inputs = []
    if n_unres:
        rect_inputs.append(unres.map_batches(
            lambda b: b.select(["pid", "px", "py", "d2"]),
            batch_format="pyarrow"))
    if n_nocand:
        fine_diag = float(np.sqrt(cell_w * cell_w + cell_h * cell_h))
        k = 0   # fine occupancy first — tightest bound; coarsen only
                # when the distinct-cell set exceeds the broadcast cap
        while True:
            nc = n >> k
            kk = k  # bind

            def coarse_pre(b: pa.Table, _k=kk, _nc=nc) -> pa.Table:
                c = b["cell"].to_numpy()
                cc = ((c // n) >> _k) * _nc + ((c % n) >> _k)
                return pa.table({"cc": pa.array(np.unique(cc), pa.int64())})

            cds = seg_cells.map_batches(
                coarse_pre, batch_format="pyarrow").materialize()
            if cds.count() <= needed_cells_cap or nc <= 1:
                break
            k += 1
        ccs = []
        for t in ray.get(cds.to_arrow_refs()):
            if isinstance(t, pa.Table) and t.num_rows:
                ccs.append(t["cc"].to_numpy())
        cc = np.unique(np.concatenate(ccs)) if ccs else np.empty(0, np.int64)
        if cc.size == 0:
            raise ValueError("snap_to_segments_bucketed: empty segment "
                             "network")
        nc = n >> k
        ccw, cch = 360.0 / float(nc), 180.0 / float(nc)
        # degree bounds of each occupied coarse cell
        cxlo = (cc // nc).astype(np.float64) * ccw - 180.0
        cylo = (cc % nc).astype(np.float64) * cch - 90.0
        cref = ray.put((cxlo, cylo))
        _vlog(f"coarse occupancy: {cc.size} cells at res-{k}")

        def coarse_bound(b: pa.Table) -> pa.Table:
            from ..util import _bcast_get
            xlo, ylo = _bcast_get(cref)
            px = b["px"].to_numpy().astype(np.float64)
            py = b["py"].to_numpy().astype(np.float64)
            ub2 = np.full(len(px), np.inf)
            for e0 in range(0, len(xlo), 4096):
                xl = xlo[None, e0:e0 + 4096]
                yl = ylo[None, e0:e0 + 4096]
                dxm = np.maximum(np.abs(px[:, None] - xl),
                                 np.abs(px[:, None] - (xl + ccw)))
                dym = np.maximum(np.abs(py[:, None] - yl),
                                 np.abs(py[:, None] - (yl + cch)))
                dxm *= dxm
                dym *= dym
                dxm += dym
                np.minimum(ub2, dxm.min(axis=1), out=ub2)
            d_ub = np.sqrt(ub2) + fine_diag
            return pa.table({"pid": b["pid"], "px": b["px"], "py": b["py"],
                             "d2": pa.array(d_ub * d_ub, pa.float64())})

        rect_inputs.append(nocand.map_batches(coarse_bound,
                                              batch_format="pyarrow"))
    if rect_inputs:
        todo = rect_inputs[0]
        for p in rect_inputs[1:]:
            todo = todo.union(p)
        resolved_parts.append(run_rect(todo.materialize()))
        _vlog("definitive rect pass scheduled for all stragglers")

    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.union(p)

    def finalize(b: pa.Table) -> pa.Table:
        d2 = b["d2"].to_numpy().astype(np.float64)
        d9 = np.floor(np.sqrt(d2) * 1e9 + 0.5).astype(np.int64)
        return pa.table({
            "id": b["pid"],
            "way_id": pa.compute.cast(b["way_id"], pa.int64()),
            "d9": pa.array(d9, pa.int64())})

    return out.map_batches(finalize, batch_format="pyarrow")
