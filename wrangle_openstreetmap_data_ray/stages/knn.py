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
from ..functions.hashing import hash64_ints, hash64_str_array

_M_PER_DEG = np.pi * geo.EARTH_R_M / 180.0   # meters per degree of latitude
_N_BUCKETS = 1024


def _guard_m(lat: np.ndarray, res: int) -> np.ndarray:
    """Ring-1 guaranteed coverage radius at each latitude: one grid step in
    the tighter axis (lat step, or lon step shrunk by cos(lat)), with a
    safety margin for the point sitting at a cell edge.

    The meridian spacing is evaluated at the maximum |lat| reachable
    within ring-1 (home lat + 2 lat-steps poleward: cell edge + one
    neighbor cell), not at the home point itself — a candidate sitting
    poleward of home sees tighter meridians, and evaluating at home lat
    would overstate coverage at high latitudes (exactness hole flagged in
    round-1 review)."""
    lat_step_deg = 180.0 / (1 << res)
    lat_step = lat_step_deg * _M_PER_DEG
    wlat = np.minimum(np.abs(lat) + 2.0 * lat_step_deg, 90.0)
    lon_step = 360.0 / (1 << res) * _M_PER_DEG * np.cos(np.radians(wlat))
    return np.minimum(lat_step, lon_step) * 0.999


def _explode(lon_col, lat_col, id_col, res, salt, home_ids):
    """Emit (cell, salt, id, lon, lat, is_home) rows; ghosts into ring-1."""
    home_arr = (np.sort(np.asarray(list(home_ids)))
                if home_ids is not None else None)

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
        if home_arr is not None:    # retry round: only laggards are home
            is_target = np.isin(ids, home_arr)
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
        # shuffle bucket straight from (cell, salt): bounded group count AND
        # each salt of a hot cell lands in its own bucket (the whole point
        # of salting — spread the hot key over workers)
        with np.errstate(over="ignore"):
            bucket = (hash64_ints(cell_k.astype(np.uint64) * np.uint64(1_000_003)
                                  + salt_k.astype(np.uint64))
                      % np.uint64(_N_BUCKETS)).astype(np.int32)
        return pa.table({
            "cell": pa.array(cell_k, pa.int64()),
            "salt": pa.array(salt_k, pa.int32()),
            "_bucket": pa.array(bucket),
            "id": pa.array(ids[idx_k]),
            "lon": pa.array(lon[idx_k], pa.float64()),
            "lat": pa.array(lat[idx_k], pa.float64()),
            "is_home": pa.array(home_k),
        })
    return fn


def _one_cell_knn(k, hmask, lon, lat, ids, out, chunk: int = 192):
    """Per-cell vectorized kNN partial: home rows × all rows of the cell.

    Home rows are processed in chunks so the (chunk × cell_size) distance
    matrix and its temporaries stay cache-resident — an unchunked hot cell
    (600 home × 20k candidates) allocates >100 MB per temporary and turns
    the kernel memory-bound."""
    if not hmask.any() or len(ids) < 2:
        return
    hlon, hlat, hids = lon[hmask], lat[hmask], ids[hmask]
    kk = min(k, len(ids) - 1)
    if kk <= 0:
        return
    for s in range(0, len(hids), chunk):
        cl, cla, cid = hlon[s:s + chunk], hlat[s:s + chunk], hids[s:s + chunk]
        d = geo.haversine_m(cl[:, None], cla[:, None], lon[None, :], lat[None, :])
        d = np.where(cid[:, None] == ids[None, :], np.inf, d)
        part = np.argpartition(d, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(cid)), kk)
        cols = part.ravel()
        dist = d[rows, cols]
        ok = np.isfinite(dist)
        out[0].append(np.repeat(cid, kk)[ok])
        out[1].append(ids[cols][ok])
        out[2].append(dist[ok])
        out[3].append(np.repeat(cla, kk)[ok])


def _empty_final(ids) -> pd.DataFrame:
    return pd.DataFrame({"id": ids[:0], "neighbor_id": ids[:0],
                         "dist_m": np.empty(0, np.float64),
                         "satisfied": np.empty(0, bool)})


def _bucket_knn(k, res):
    """All (cell, salt) groups of one shuffle bucket, vectorized run-by-run
    (bounded group-call overhead — see util.bucketed_group_apply).

    FINALIZES per point in the same pass: every home point appears in
    exactly one (cell, salt) group, and its ghosts bring the whole ring-1
    neighborhood into that group — so the per-cell partial top-k IS the
    global ring-1 top-k, and the satisfaction flag can be computed here.
    This removes the per-id re-reduce shuffle the round-1 design paid
    (half the fixed latency of every kNN pass)."""
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cell", "salt"], kind="mergesort")
        cell = g["cell"].to_numpy()
        salt = g["salt"].to_numpy()
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        ids, home = g["id"].to_numpy(), g["is_home"].to_numpy()
        if len(g) < 2:
            return _empty_final(ids)
        new = np.empty(len(g), bool)
        new[0] = True
        new[1:] = (cell[1:] != cell[:-1]) | (salt[1:] != salt[:-1])
        starts = np.append(np.nonzero(new)[0], len(g))
        out = ([], [], [], [])
        for i in range(len(starts) - 1):
            s, e = starts[i], starts[i + 1]
            _one_cell_knn(k, home[s:e], lon[s:e], lat[s:e], ids[s:e], out)
        if not out[0]:
            return _empty_final(ids)
        df = pd.DataFrame({"id": np.concatenate(out[0]),
                           "neighbor_id": np.concatenate(out[1]),
                           "dist_m": np.concatenate(out[2]),
                           "home_lat": np.concatenate(out[3])})
        df = df.sort_values(["id", "dist_m", "neighbor_id"], kind="mergesort")
        top = df.groupby("id", sort=False).head(k)
        nn = top.groupby("id", sort=False)["neighbor_id"].transform("size")
        guard = _guard_m(top["home_lat"].to_numpy(), res)
        within = pd.Series(top["dist_m"].to_numpy() <= guard, index=top.index)
        all_within = within.groupby(top["id"], sort=False).transform("all")
        fin = top[["id", "neighbor_id", "dist_m"]].copy()
        fin["satisfied"] = (nn >= k).to_numpy() & all_within.to_numpy()
        return fin
    return fn


def _one_pass(ds, k, res, id_col, lon_col, lat_col, salt, home_ids_ref):
    """ONE hash shuffle: explode (with precomputed bucket ids) →
    groupby(bucket) → per-group kNN + finalize."""
    import ray

    home_ids = ray.get(home_ids_ref) if home_ids_ref is not None else None
    exploded = ds.map_batches(
        _explode(lon_col, lat_col, id_col, res, salt, home_ids),
        batch_format="pyarrow", batch_size=16384)
    return exploded.groupby("_bucket").map_groups(
        _bucket_knn(k, res), batch_format="pandas")


def _laggard_topk(ds, laggards: pd.DataFrame, k, id_col, lon_col, lat_col):
    """EXACT top-k for the (few) laggard points: broadcast their coordinate
    matrix once (``ray.put``), every batch of the full dataset computes a
    vectorized (batch × laggards) haversine and emits per-batch partial
    top-k; a bucketed re-reduce keeps the global top-k. One pass over the
    data, no candidate blowup — replaces the old resolution-coarsening
    retries, whose coarse cells pulled in arbitrarily many candidates."""
    import ray

    from ..util import bucketed_group_apply
    lids = laggards["id"].to_numpy()
    ref = ray.put((lids, laggards["lon"].to_numpy(), laggards["lat"].to_numpy()))

    def partial(batch: pa.Table) -> pa.Table:
        lid, llon, llat = ray.get(ref)
        blon = batch[lon_col].to_numpy()
        blat = batch[lat_col].to_numpy()
        bids = np.asarray(batch[id_col].to_pylist())
        d = geo.haversine_m(blon[:, None], blat[:, None], llon[None, :], llat[None, :])
        d = np.where(bids[:, None] == lid[None, :], np.inf, d)   # exclude self
        kk = min(k, d.shape[0])
        part = np.argpartition(d, kk - 1, axis=0)[:kk]           # (kk, L)
        cols = np.tile(np.arange(len(lid)), kk)
        rows = part.ravel()
        dist = d[rows, cols]
        ok = np.isfinite(dist)
        return pa.table({
            "id": pa.array(lid[cols][ok]),
            "neighbor_id": pa.array(bids[rows][ok]),
            "dist_m": pa.array(dist[ok], pa.float64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["id", "neighbor_id"])
        g = g.sort_values(["id", "dist_m", "neighbor_id"], kind="mergesort")
        return g.groupby("id", sort=False).head(k)[["id", "neighbor_id", "dist_m"]]

    return bucketed_group_apply(partials, ["id"], reduce_topk, n_buckets=256)


def auto_salt(ds, res: int, lon_col: str = "lon", lat_col: str = "lat",
              target_cell_rows: int = 1500, max_salt: int = 16) -> int:
    """Pick the salt factor FROM MEASURED SKEW: one narrow pass computes
    per-batch partial per-cell counts (combiner — the shuffle carries
    ≤ distinct-cells × blocks rows), a tiny groupby sums them, and the
    hottest cell's occupancy sets salt = ceil(max_cell / target).

    This is the "explicit salted repartitioning" of the north star made
    data-driven: dense urban cells (the known hot keys) get split over
    exactly as many sub-groups as their measured occupancy requires, and
    uniform data pays salt=1 (no ghost replication). The salted pass is
    proven byte-identical to unsalted (knn_pairs_salted oracle)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        cells = geo.cell_encode(b[lon_col].to_numpy(), b[lat_col].to_numpy(),
                                res)
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(uniq, pa.int64()),
                         "cnt": pa.array(counts, pa.int64())})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
               .groupby("cell").aggregate(Sum("cnt", alias_name="cnt"))
    hottest = counts.max("cnt")
    if hottest is None:
        return 1
    return int(min(max_salt, max(1, -(-int(hottest) // target_cell_rows))))


def knn_join(ds, k: int = 5, res: int = 16, id_col: str = "image_id",
             lon_col: str = "lon", lat_col: str = "lat",
             salt: int | str = 1, exact: bool = True,
             laggard_cap: int = 200_000,
             round1_laggard_cap: int = 2_000_000):
    """Self-kNN join → Dataset (id, neighbor_id, dist_m), exactly k rows per
    point (unless the whole dataset has < k+1 points).

    Three rounds: (1) compact-cell ring-1 pass at ``res`` — resolves every
    point whose k-th neighbor is within one grid step (the dense bulk);
    (2) one coarser ring-1 pass at ``res - 3`` for the laggards only
    (sparse areas — 8× wider guard radius); (3) exact broadcast top-k over
    the full dataset for any residue (``_laggard_topk``; truly isolated
    points — should be a trace). Choose ``res`` so cells hold O(100-1000)
    points in dense areas. ``laggard_cap`` guards the broadcast matrix
    (cost = n_rows × n_residue); ``round1_laggard_cap`` guards the driver
    pull of the round-1 unsatisfied set (counted ON-cluster before any
    row reaches the driver) — exceeding it means ``res`` is badly mismatched
    to the point density and the retry round would be most of the corpus."""
    import ray
    ds = ds.select_columns([id_col, lon_col, lat_col])  # narrow the shuffle
    if salt == "auto":
        ds = ds.materialize()       # feeds the skew probe AND the passes
        salt = auto_salt(ds, res, lon_col, lat_col)
    out = _one_pass(ds, k, res, id_col, lon_col, lat_col, salt, None)
    if not exact:
        return out.drop_columns(["satisfied"])
    out = out.materialize()   # feeds both the laggard scan and the union

    def keep_good(b: pa.Table) -> pa.Table:
        return b.filter(b["satisfied"])
    good = out.map_batches(keep_good, batch_format="pyarrow")

    # fast path: a satisfied point emits exactly k rows, so if
    # satisfied_rows == k * n_points, nobody lagged — skip the anti-join
    # and retry rounds entirely (one cheap metadata count + one map pass)
    n_pts = ds.count()
    from ray.data.aggregate import Sum
    sat_agg = out.map_batches(
        lambda b: pa.table({"s": pa.array(
            [int(np.count_nonzero(b["satisfied"].to_numpy(zero_copy_only=False)))],
            pa.int64())}),
        batch_format="pyarrow").aggregate(Sum("s")) or {}
    # aggregate, not to_pandas: an ultra-sparse corpus can make round 1
    # ALL no-shows (zero rows), and Ray's 0-row to_pandas drops columns
    sat_rows = int(sat_agg.get("sum(s)") or 0)
    if sat_rows == k * n_pts:
        return good.drop_columns(["satisfied"])

    # laggards = points NOT satisfied (incl. no-shows whose ring-1 group had
    # no candidates at all) — found with a distributed anti-join (bucketed
    # groupby on id), never by materializing the full point set driver-side
    from ..util import bucketed_group_apply

    def pts_side(b: pa.Table) -> pa.Table:
        return pa.table({"id": b[id_col], "lon": b[lon_col], "lat": b[lat_col],
                         "sat": pa.array(np.zeros(len(b), np.int8))})

    def sat_side(b: pa.Table) -> pa.Table:
        f = b.filter(b["satisfied"])
        n = f.num_rows
        return pa.table({"id": f["id"],
                         "lon": pa.array(np.zeros(n, np.float64)),
                         "lat": pa.array(np.zeros(n, np.float64)),
                         "sat": pa.array(np.ones(n, np.int8))})

    unioned = ds.map_batches(pts_side, batch_format="pyarrow").union(
        out.map_batches(sat_side, batch_format="pyarrow"))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        has_sat = g.groupby("id", sort=False)["sat"].transform("max")
        keep = g[(has_sat == 0) & (g["sat"] == 0)]
        return keep[["id", "lon", "lat"]]

    # count the laggards ON-cluster before pulling a single row: a badly
    # mis-chosen res on sparse data can make the round-1 unsatisfied set a
    # large fraction of the corpus, and an unguarded to_pandas() would ship
    # all of it to the driver (round-2 review finding)
    lag_ds = bucketed_group_apply(unioned, ["id"], anti,
                                  n_buckets=256).materialize()
    good = good.drop_columns(["satisfied"])
    n_lag = lag_ds.count()
    if n_lag == 0:
        return good
    if n_lag > round1_laggard_cap:
        raise ValueError(
            f"{n_lag} round-1 laggards exceed round1_laggard_cap="
            f"{round1_laggard_cap}; pick a coarser res (fewer, denser cells) "
            f"for this point density")
    # round 2: coarser ring-1 pass, home = laggards only (all points still
    # ghost, so each laggard sees its full 8×-wider neighborhood); only the
    # id column reaches the driver (bounded by round1_laggard_cap above)
    lag_ids = set(lag_ds.select_columns(["id"]).to_pandas()["id"])
    out2 = _one_pass(ds, k, max(1, res - 3), id_col, lon_col, lat_col, salt,
                     ray.put(lag_ids)).materialize()

    def keep_good2(b: pa.Table) -> pa.Table:
        return b.filter(b["satisfied"])
    good2 = out2.map_batches(keep_good2, batch_format="pyarrow") \
                .drop_columns(["satisfied"])
    # round-2 residue via the SAME distributed anti-join pattern as round 1
    # (round-3 review: the old path take_all()'d the satisfied ids into a
    # driver Python set — a 2M-entry pull where an anti-join already works)
    from ..util import anti_semi_join
    sat2_ids = out2.map_batches(
        lambda b: b.filter(b["satisfied"]).select(["id"]),
        batch_format="pyarrow")
    residue_ds = anti_semi_join(lag_ds, sat2_ids, on="id",
                                n_buckets=256).materialize()
    result = good.union(good2)
    n_res = residue_ds.count()
    if n_res == 0:
        return result
    if n_res > laggard_cap:
        raise ValueError(
            f"{n_res} residual laggards exceed laggard_cap="
            f"{laggard_cap}; pick a res that matches the point density")
    residue = residue_ds.to_pandas()
    return result.union(_laggard_topk(ds, residue, k, id_col, lon_col, lat_col))


def _max_radius_res(max_abs_lat: float, radius_m: float, max_res: int = 18) -> int:
    """Finest cell resolution whose ring-1 guarantee radius (``_guard_m``,
    the single source of the coverage formula) covers ``radius_m`` at
    every latitude the data reaches (finer cells = smaller groups = less
    per-pair compute, so pick the largest res that is still correct)."""
    lat = np.array([max_abs_lat])
    for res in range(max_res, 0, -1):
        if float(_guard_m(lat, res)[0]) >= radius_m:
            return res
    raise ValueError(
        f"radius_m={radius_m} exceeds ring-1 coverage even at res=1 — a "
        f"radius that wide is a near-cross-join; pre-partition differently")


def _bucket_radius(radius_m: float, chunk: int = 192):
    """All (cell, salt) groups of one shuffle bucket: per group, home rows ×
    all rows haversine, emit every DIRECTED pair (home, other) with
    dist ≤ radius. Each point is home in exactly one group and its ring-1
    ghosts bring every candidate within the guarantee radius into that
    group, so pairs are emitted exactly once per direction — no dedup
    shuffle needed. Chunked like ``_one_cell_knn`` so hot-cell distance
    matrices stay cache-resident."""
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cell", "salt"], kind="mergesort")
        cell = g["cell"].to_numpy()
        salt = g["salt"].to_numpy()
        lon, lat = g["lon"].to_numpy(), g["lat"].to_numpy()
        ids, home = g["id"].to_numpy(), g["is_home"].to_numpy()
        out_i, out_j, out_d = [], [], []
        new = np.empty(len(g), bool)
        if len(g):
            new[0] = True
            new[1:] = (cell[1:] != cell[:-1]) | (salt[1:] != salt[:-1])
        starts = np.append(np.nonzero(new)[0], len(g))
        for i in range(len(starts) - 1):
            s, e = starts[i], starts[i + 1]
            hm = home[s:e]
            if not hm.any() or (e - s) < 2:
                continue
            glon, glat, gids = lon[s:e], lat[s:e], ids[s:e]
            hlon, hlat, hids = glon[hm], glat[hm], gids[hm]
            for c in range(0, len(hids), chunk):
                cl, cla, cid = (hlon[c:c + chunk], hlat[c:c + chunk],
                                hids[c:c + chunk])
                d = geo.haversine_m(cl[:, None], cla[:, None],
                                    glon[None, :], glat[None, :])
                m = (d <= radius_m) & (cid[:, None] != gids[None, :])
                rows, cols = np.nonzero(m)
                if len(rows):
                    out_i.append(cid[rows])
                    out_j.append(gids[cols])
                    out_d.append(d[rows, cols])
        if not out_i:
            from ..util import typed_empty_series
            e = typed_empty_series(ids)   # object [:0] would drift to null
            return pd.DataFrame({"id": e, "neighbor_id": e,
                                 "dist_m": np.empty(0, np.float64)})
        return pd.DataFrame({"id": np.concatenate(out_i),
                             "neighbor_id": np.concatenate(out_j),
                             "dist_m": np.concatenate(out_d)})
    return fn


def radius_join(ds, radius_m: float, id_col: str = "image_id",
                lon_col: str = "lon", lat_col: str = "lat",
                res: int | None = None, salt: int = 1):
    """Self spatial RANGE join: every directed pair within ``radius_m``
    great-circle meters → Dataset (id, neighbor_id, dist_m). EXACT by
    construction — the cell resolution is chosen (or validated) so the
    ring-1 ghost neighborhood covers the query radius at every latitude
    in the data, so one explode + one hash shuffle resolves every point
    with no retry rounds.

    Scale shape: identical to ``knn_join``'s single pass — narrow columns
    through the shuffle, 1024 bounded buckets, ``salt`` splits hot cells'
    home points with ghost replication. Output size is data-dependent
    (Θ(pairs within radius)); pick ``radius_m`` accordingly."""
    ds = ds.select_columns([id_col, lon_col, lat_col])

    def maxabs(b: pa.Table) -> pa.Table:
        la = b[lat_col].to_numpy()
        v = float(np.max(np.abs(la))) if len(la) else 0.0
        return pa.table({"al": pa.array([v], pa.float64())})
    ds = ds.materialize()        # feeds both the lat probe and the pass
    mal = float(ds.map_batches(maxabs, batch_format="pyarrow").max("al")
                or 0.0)
    max_ok = _max_radius_res(mal, radius_m)
    if res is None:
        res = max_ok
    elif res > max_ok:
        # an explicitly-passed res that is too fine silently DROPS pairs
        # beyond ring-1 coverage — refuse instead (review finding)
        raise ValueError(
            f"res={res} does not guarantee ring-1 coverage of "
            f"radius_m={radius_m} at |lat|≤{mal:.2f}; use res≤{max_ok} "
            f"or omit res")
    exploded = ds.map_batches(
        _explode(lon_col, lat_col, id_col, res, salt, None),
        batch_format="pyarrow", batch_size=16384)
    return exploded.groupby("_bucket").map_groups(
        _bucket_radius(radius_m), batch_format="pandas")


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
