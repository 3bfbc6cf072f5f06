"""kNN join via compact-cell ring expansion (J4 / T4) — per
BASELINE.json:north_star: *"kNN-joined to nearby records via compact-cell
ring expansion"*.

Algorithm (per round: one hash shuffle on cell id + one narrow re-reduce):
1. ``map_batches``: encode each point's home cell at ``res``; emit the point
   into its home cell (``is_home=1``) AND as a "ghost" copy into each ring-1
   neighbor cell (``is_home=0``). Ghosts let every home point see all
   neighbors within one cell of its own without a second shuffle.
2. ``groupby(cell, salt)``: per group, vectorized haversine from home points
   to ALL group points (H × A matrix), keep per-group top-k candidates.
3. ``groupby(id)`` re-reduce: merge candidates, keep global top-k, and mark
   each point SATISFIED iff it found k neighbors and its k-th distance is
   within the ring-1 guarantee radius (one grid step in the smaller axis).
4. Unsatisfied points (typically a few %: sparse areas, cluster edges —
   SURVEY.md §7.5 "ring-2 fallback") re-run at ``res - res_step`` — cells 4×
   larger per step — until satisfied or ``min_res``. Only the unsatisfied
   ids are "home" in retry rounds; all points still ghost, so each retry is
   one more shuffle of narrow columns, with compute only for the laggards.

Result: EXACT k nearest neighbors (ties broken by neighbor_id) — verified
against the O(n²) reference in tests.

Skew: dense urban cells are the hot keys. ``salt`` splits each cell's HOME
points into ``salt`` sub-groups (ghosts replicated to each) — the explicit
salted repartitioning of BASELINE.json:north_star.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import geo
from ..functions.hashing import hash64_str_array

_M_PER_DEG = np.pi * geo.EARTH_R_M / 180.0   # meters per degree of latitude


def _guard_m(lat: np.ndarray, res: int) -> np.ndarray:
    """Ring-1 guaranteed coverage radius at each latitude: one grid step in
    the tighter axis (lat step, or lon step shrunk by cos(lat)), with a
    safety margin for the point sitting at a cell edge."""
    lat_step = 180.0 / (1 << res) * _M_PER_DEG
    lon_step = 360.0 / (1 << res) * _M_PER_DEG * np.cos(np.radians(lat))
    return np.minimum(lat_step, lon_step) * 0.999


def _explode(lon_col, lat_col, id_col, res, salt, home_ids):
    """Emit (cell, salt, id, lon, lat, is_home) rows; ghosts into ring-1."""
    def fn(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy()
        lat = batch[lat_col].to_numpy()
        ids = np.asarray(batch[id_col].to_pylist())
        n = len(lon)
        ring = geo.cell_ring(geo.cell_encode(lon, lat, res), 1)   # (n, 9)
        home = ring[:, 4]            # (0,0) offset is index 4 in the 3×3 scan
        reps = ring.shape[1]
        cell_flat = ring.ravel()
        idx_flat = np.repeat(np.arange(n), reps)
        is_home = cell_flat == np.repeat(home, reps)
        # drop duplicate (point, cell) rows from lat clamping at grid edges
        order = np.lexsort((cell_flat, idx_flat))
        dup = np.zeros(len(order), dtype=bool)
        so_i, so_c = idx_flat[order], cell_flat[order]
        dup[1:] = (so_i[1:] == so_i[:-1]) & (so_c[1:] == so_c[:-1])
        keep = np.sort(order[~dup])
        cell_k, idx_k, home_k = cell_flat[keep], idx_flat[keep], is_home[keep]
        if home_ids is not None:    # retry round: only laggards are home
            is_target = np.fromiter((i in home_ids for i in ids), bool, n)
            home_k = home_k & is_target[idx_k]
        if salt > 1:
            # every (point, cell) row goes to ALL salt sub-groups as a
            # candidate; it is HOME only in its own sub-group — so each
            # sub-group sees the full neighborhood but computes 1/salt of it
            h = hash64_str_array([str(x) for x in ids]) % np.uint64(salt)
            n_rows = len(cell_k)
            cell_k = np.tile(cell_k, salt)
            idx_r = np.tile(idx_k, salt)
            salt_k = np.repeat(np.arange(salt, dtype=np.int32), n_rows)
            home_k = np.tile(home_k, salt) & (h[idx_r] == salt_k.astype(np.uint64))
            idx_k = idx_r
        else:
            salt_k = np.zeros(len(cell_k), dtype=np.int32)
        return pa.table({
            "cell": pa.array(cell_k, pa.int64()),
            "salt": pa.array(salt_k, pa.int32()),
            "id": pa.array(ids[idx_k]),
            "lon": pa.array(lon[idx_k], pa.float64()),
            "lat": pa.array(lat[idx_k], pa.float64()),
            "is_home": pa.array(home_k),
        })
    return fn


def _group_knn(k):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        home = g[g["is_home"]]
        if len(home) == 0 or len(g) < 2:
            return pd.DataFrame({"id": [], "neighbor_id": [], "dist_m": [],
                                 "home_lat": []})
        hlon, hlat = home["lon"].to_numpy(), home["lat"].to_numpy()
        alon, alat = g["lon"].to_numpy(), g["lat"].to_numpy()
        aids, hids = g["id"].to_numpy(), home["id"].to_numpy()
        d = geo.haversine_m(hlon[:, None], hlat[:, None], alon[None, :], alat[None, :])
        d = np.where(hids[:, None] == aids[None, :], np.inf, d)
        kk = min(k, d.shape[1] - 1)
        if kk <= 0:
            return pd.DataFrame({"id": [], "neighbor_id": [], "dist_m": [],
                                 "home_lat": []})
        part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(hids)), kk)
        cols = part.ravel()
        dist = d[rows, cols]
        ok = np.isfinite(dist)
        return pd.DataFrame({"id": np.repeat(hids, kk)[ok],
                             "neighbor_id": aids[cols][ok],
                             "dist_m": dist[ok],
                             "home_lat": np.repeat(hlat, kk)[ok]})
    return fn


def _final_k(k, res):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("neighbor_id")
        g = g.sort_values(["dist_m", "neighbor_id"], kind="mergesort").head(k)
        guard = _guard_m(g["home_lat"].to_numpy(), res)
        satisfied = (len(g) >= k) and bool((g["dist_m"].to_numpy() <= guard).all())
        out = g[["id", "neighbor_id", "dist_m"]].copy()
        out["satisfied"] = satisfied
        return out
    return fn


def _one_pass(ds, k, res, id_col, lon_col, lat_col, salt, home_ids_ref):
    import ray
    home_ids = ray.get(home_ids_ref) if home_ids_ref is not None else None
    exploded = ds.map_batches(
        _explode(lon_col, lat_col, id_col, res, salt, home_ids),
        batch_format="pyarrow", batch_size=16384)
    candidates = exploded.groupby(["cell", "salt"]).map_groups(
        _group_knn(k), batch_format="pandas")
    return candidates.groupby("id").map_groups(_final_k(k, res),
                                               batch_format="pandas")


def knn_join(ds, k: int = 5, res: int = 16, id_col: str = "image_id",
             lon_col: str = "lon", lat_col: str = "lat", salt: int = 1,
             exact: bool = True, res_step: int = 3, min_res: int = 4,
             max_rounds: int = 8):
    """Self-kNN join → Dataset (id, neighbor_id, dist_m), exactly k rows per
    point (unless the whole dataset has < k+1 points). ``exact=True`` runs
    the coarsening fallback until every point is satisfied."""
    import ray
    results = []
    cur_res = res
    ds = ds.select_columns([id_col, lon_col, lat_col])  # narrow the shuffle
    # target id set per round. Driver-side sets are fine up to ~10^7 laggards;
    # at larger scale replace the no-show bookkeeping with an anti-join of
    # (all ids) against (emitted ids) — same semantics, fully distributed.
    target: set | None = None  # None = every point (round 0)
    for _ in range(max_rounds):
        out = _one_pass(ds, k, cur_res, id_col, lon_col, lat_col, salt,
                        ray.put(target) if target is not None else None)
        if exact and cur_res > min_res:
            # the round result feeds BOTH the satisfied-id scan and the
            # final union; materialize once (small, narrow) so the lazy
            # pipeline isn't executed twice per round
            out = out.materialize()
        if not exact or cur_res <= min_res:
            results.append(out.drop_columns(["satisfied"]))
            break

        def _split(keep_good):
            def fn(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                mask = b["satisfied"]
                return b.filter(mask if keep_good else pc.invert(mask))
            return fn

        good = out.map_batches(_split(True), batch_format="pyarrow")
        sat_ids = {r["id"] for r in good.select_columns(["id"]).take_all()}
        if target is None:
            target = {r[id_col] for r in ds.select_columns([id_col]).take_all()}
        # retry both kinds of laggard: unsatisfied AND no-show (points whose
        # ring-1 group emitted no candidate rows at all — isolated points)
        bad_ids = target - sat_ids
        results.append(good.drop_columns(["satisfied"]))
        if not bad_ids:
            break
        target = bad_ids
        cur_res = max(min_res, cur_res - res_step)
    final = results[0]
    for r in results[1:]:
        final = final.union(r)
    return final


def knn_join_exact_small(points: pa.Table, k: int, id_col="image_id",
                         lon_col="lon", lat_col="lat") -> pd.DataFrame:
    """O(n²) exact reference implementation (tests / oracle twin only)."""
    ids = np.asarray(points[id_col].to_pylist())
    lon = points[lon_col].to_numpy()
    lat = points[lat_col].to_numpy()
    d = geo.haversine_m(lon[:, None], lat[:, None], lon[None, :], lat[None, :])
    np.fill_diagonal(d, np.inf)
    out = []
    for i in range(len(ids)):
        order = np.lexsort((ids, d[i]))[:k]
        for j in order:
            if np.isfinite(d[i, j]):
                out.append((ids[i], ids[j], d[i, j]))
    return pd.DataFrame(out, columns=["id", "neighbor_id", "dist_m"])
