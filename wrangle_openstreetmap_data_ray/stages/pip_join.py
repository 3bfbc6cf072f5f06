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
        seg_chunk = 256    # (P, S) tile set stays L2/L3-resident — the
                           # 4096-wide tiles of the first version were
                           # memory-bound (4× slower, measured)
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
                # t = ((p-a)·d) * (1/len2), clamped — the oracle twin
                # mirrors this exact tree (multiply by the reciprocal,
                # NOT a per-pair divide; e = (p-a) - t*d, squared)
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
        d9 = np.floor(np.sqrt(best) * 1e9 + 0.5).astype(np.int64)
        return pa.table({"id": batch[id_col],
                         "way_id": pa.array(bestw, pa.int64()),
                         "d9": pa.array(d9, pa.int64())})

    return points_ds.map_batches(fn, batch_format="pyarrow")
