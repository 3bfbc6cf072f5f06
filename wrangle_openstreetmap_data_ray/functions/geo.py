"""Pure-numpy geospatial kernels: hierarchical cell index (H3/S2-style
capability, own scheme — no geo libraries exist in this environment, see
SURVEY.md §0/§7.5), point-in-polygon ray casting, haversine distance.

Cell scheme ("gq" = graft quadkey), documented per BASELINE.json:north_rule:

- Equirectangular quadtree over the full lon/lat plane
  (lon ∈ [-180, 180), lat ∈ [-90, 90)).
- At resolution ``r`` (0..26) each axis is quantized to ``2**r`` steps;
  the int64 cell id packs resolution and a Morton (bit-interleaved) index::

      cell = (r << 58) | interleave2(qy, qx)      # qx = even bits

- Parent/child = shift the Morton index by 2 bits per level; ring-k
  neighbors = de-interleave, offset qx/qy by ±k with lon wraparound and
  lat clamping, re-interleave.

This is the generalization of the reference's bounding-box membership check
([R:notebook::bbox check], SURVEY.md §2 M7) into a full spatial index:
a bbox test is exactly "cell prefix ∈ covering set" at r=0..n.

All kernels are vectorized numpy over column arrays; nothing here loops
over rows in the hot path (polygon edge loops are over polygon vertices,
which are small, not over points).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 26
_RES_SHIFT = np.uint64(58)
_IDX_MASK = np.uint64((1 << 58) - 1)

LON_MIN, LON_MAX = -180.0, 180.0
LAT_MIN, LAT_MAX = -90.0, 90.0

# Singapore-extract bbox from the reference's audit pass (reconstructed,
# SURVEY.md §2 M7): the metro extract spills into Johor (MY) / Riau (ID).
SG_BBOX = (103.6, 1.13, 104.1, 1.47)  # (w, s, e, n)


# ------------------------------------------------------------ bit interleave

def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 so bit i lands at bit 2i."""
    x = x.astype(np.uint64, copy=True) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    """Inverse of _part1by1: gather even bits back into the low 32 bits."""
    x = x.astype(np.uint64, copy=True) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def interleave2(qy: np.ndarray, qx: np.ndarray) -> np.ndarray:
    return (_part1by1(qy) << np.uint64(1)) | _part1by1(qx)


def deinterleave2(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return _compact1by1(m >> np.uint64(1)), _compact1by1(m)


# ------------------------------------------------------------------ cell ids

def cell_xy(lon: np.ndarray, lat: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Quantized (qx, qy) grid coordinates at resolution ``res``.

    Mirrorable in plain SQL (``floor((lon - lon_min) / 360 * 2^res)``) —
    this is the oracle surface for the cell index (see __ray_entry__).
    """
    n = np.int64(1) << np.int64(res)
    fx = (np.asarray(lon, dtype=np.float64) - LON_MIN) / (LON_MAX - LON_MIN)
    fy = (np.asarray(lat, dtype=np.float64) - LAT_MIN) / (LAT_MAX - LAT_MIN)
    qx = np.clip(np.floor(fx * n).astype(np.int64), 0, n - 1)
    qy = np.clip(np.floor(fy * n).astype(np.int64), 0, n - 1)
    return qx, qy


def cell_encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """(lon, lat) arrays → int64 cell ids at resolution ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in 0..{MAX_RES}")
    qx, qy = cell_xy(lon, lat, res)
    m = interleave2(qy.astype(np.uint64), qx.astype(np.uint64))
    return ((np.uint64(res) << _RES_SHIFT) | m).astype(np.int64)


def cell_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell).astype(np.uint64) >> _RES_SHIFT).astype(np.int64)


def cell_decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell ids → (qx, qy, res)."""
    c = np.asarray(cell).astype(np.uint64)
    res = (c >> _RES_SHIFT).astype(np.int64)
    qy, qx = deinterleave2(c & _IDX_MASK)
    return qx.astype(np.int64), qy.astype(np.int64), res


def cell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    qx, qy, res = cell_decode(cell)
    n = (np.int64(1) << res).astype(np.float64)
    lon = LON_MIN + (qx + 0.5) / n * (LON_MAX - LON_MIN)
    lat = LAT_MIN + (qy + 0.5) / n * (LAT_MAX - LAT_MIN)
    return lon, lat


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(w, s, e, n) degree bounds per cell."""
    qx, qy, res = cell_decode(cell)
    n = (np.int64(1) << res).astype(np.float64)
    w = LON_MIN + qx / n * (LON_MAX - LON_MIN)
    s = LAT_MIN + qy / n * (LAT_MAX - LAT_MIN)
    return w, s, w + (LON_MAX - LON_MIN) / n, s + (LAT_MAX - LAT_MIN) / n


def cell_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    c = np.asarray(cell).astype(np.uint64)
    res = (c >> _RES_SHIFT).astype(np.int64)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell res")
    shift = (np.uint64(2) * (res - parent_res).astype(np.uint64))
    m = (c & _IDX_MASK) >> shift
    return ((np.uint64(parent_res) << _RES_SHIFT) | m).astype(np.int64)


def cell_children(cell: int) -> np.ndarray:
    """The 4 direct children of one cell."""
    c = np.uint64(cell)
    res = int(c >> _RES_SHIFT)
    base = (c & _IDX_MASK) << np.uint64(2)
    kids = base + np.arange(4, dtype=np.uint64)
    return ((np.uint64(res + 1) << _RES_SHIFT) | kids).astype(np.int64)


def compact_cells(cells: np.ndarray) -> np.ndarray:
    """H3-``compact`` analogue: merge every COMPLETE sibling quartet into
    its parent, recursively, yielding a minimal multi-resolution cover of
    the same area. Vectorized level-by-level (np.unique run counts)."""
    pool = np.unique(np.asarray(cells, dtype=np.int64))
    out = []
    while len(pool):
        res = cell_res(pool)
        r = int(res.max())
        if r == 0:
            out.append(pool)
            break
        cur = pool[res == r]
        rest = pool[res != r]
        parents = cell_parent(cur, r - 1)
        uniq, counts = np.unique(parents, return_counts=True)
        full = uniq[counts == 4]
        out.append(cur[~np.isin(parents, full)])
        pool = (np.unique(np.concatenate([rest, full]))
                if len(full) or len(rest) else np.empty(0, np.int64))
    return np.sort(np.concatenate(out)) if out else pool


def uncompact_cells(cells: np.ndarray, res: int) -> np.ndarray:
    """Expand a multi-resolution cover to all descendants at ``res``."""
    c = np.asarray(cells, dtype=np.int64)
    rs = cell_res(c)
    if np.any(rs > res):
        raise ValueError("uncompact target res must be >= every cell res")
    out = []
    for cell, r in zip(c.tolist(), rs.tolist()):
        d = np.int64(res - r)
        cc = np.uint64(cell)
        base = (cc & _IDX_MASK) << np.uint64(2 * d)
        kids = base + np.arange(np.int64(1) << (2 * d), dtype=np.uint64)
        out.append(((np.uint64(res) << _RES_SHIFT) | kids).astype(np.int64))
    return np.sort(np.concatenate(out)) if out else c


def cell_ring(cell: np.ndarray, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` (including the center),
    per input cell → shape (len(cell), (2k+1)**2). Longitude wraps; latitude
    rows outside the grid are dropped by duplicating the center (callers
    dedupe). Used by the kNN ghost-cell expansion (SURVEY.md §2 J4)."""
    qx, qy, res = cell_decode(np.atleast_1d(np.asarray(cell)))
    n = np.int64(1) << res  # per-cell grid size
    offs = np.arange(-k, k + 1, dtype=np.int64)
    ox, oy = np.meshgrid(offs, offs, indexing="xy")
    ox, oy = ox.ravel(), oy.ravel()
    gx = (qx[:, None] + ox[None, :]) % n[:, None]          # lon wrap
    gy = qy[:, None] + oy[None, :]
    bad = (gy < 0) | (gy >= n[:, None])                     # lat clamp
    gy = np.where(bad, qy[:, None], gy)
    gx = np.where(bad, qx[:, None], gx)
    m = interleave2(gy.astype(np.uint64), gx.astype(np.uint64))
    return ((res[:, None].astype(np.uint64) << _RES_SHIFT) | m).astype(np.int64)


# --------------------------------------------------------------------- bbox

def bbox_contains(lon: np.ndarray, lat: np.ndarray, bbox=SG_BBOX) -> np.ndarray:
    """Vectorized bounding-box membership ([R:notebook::bbox check], M7)."""
    w, s, e, n = bbox
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    return (lon >= w) & (lon <= e) & (lat >= s) & (lat <= n)


def bbox_cover_cells(w: float, s: float, e: float, n: float, res: int) -> np.ndarray:
    """All cells at ``res`` whose bounds intersect the bbox (inclusive)."""
    qx0, qy0 = cell_xy(np.array([w]), np.array([s]), res)
    qx1, qy1 = cell_xy(np.array([e]), np.array([n]), res)
    xs = np.arange(qx0[0], qx1[0] + 1, dtype=np.int64)
    ys = np.arange(qy0[0], qy1[0] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    m = interleave2(gy.ravel().astype(np.uint64), gx.ravel().astype(np.uint64))
    return ((np.uint64(res) << _RES_SHIFT) | m).astype(np.int64)


# ------------------------------------------------------------ point-in-poly

def point_in_polygon(px: np.ndarray, py: np.ndarray,
                     ring_x: np.ndarray, ring_y: np.ndarray) -> np.ndarray:
    """Even-odd ray casting: M points vs one polygon ring (N vertices).

    Vectorized over points; the loop is over polygon edges (N is small).
    Points exactly on a horizontal edge follow the half-open convention
    (y1 <= py < y2), giving consistent assignments for shared borders.
    Generalizes the reference's bbox membership check into the exact
    refine step of the cell-prefiltered spatial join (SURVEY.md §2 J3).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x1, y1 = np.asarray(ring_x, dtype=np.float64), np.asarray(ring_y, dtype=np.float64)
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    inside = np.zeros(px.shape, dtype=bool)
    for i in range(len(x1)):
        crosses = (y1[i] <= py) != (y2[i] <= py)
        if not crosses.any():
            continue
        # x coordinate where the edge crosses the horizontal line through py
        t = (py - y1[i]) / (y2[i] - y1[i])
        xint = x1[i] + t * (x2[i] - x1[i])
        inside ^= crosses & (px < xint)
    return inside


def polygon_cover_cells(ring_x: np.ndarray, ring_y: np.ndarray, res: int) -> np.ndarray:
    """Covering-cell set of one polygon at ``res``: bbox cover, refined by
    dropping cells whose entire cell-box is outside the polygon *and* does
    not intersect any edge. Conservative (may keep extra boundary cells;
    never drops a covered one)."""
    w, s = float(np.min(ring_x)), float(np.min(ring_y))
    e, n = float(np.max(ring_x)), float(np.max(ring_y))
    cand = bbox_cover_cells(w, s, e, n, res)
    cw, cs, ce, cn = cell_bounds(cand)
    # keep a candidate if any corner or center is inside, or an edge endpoint
    # falls inside the cell box (cheap conservative test)
    cx, cy = (cw + ce) / 2, (cs + cn) / 2
    keep = point_in_polygon(cx, cy, ring_x, ring_y)
    for px, py in ((cw, cs), (cw, cn), (ce, cs), (ce, cn)):
        keep |= point_in_polygon(px, py, ring_x, ring_y)
    # any polygon vertex inside the cell box ⇒ the cell touches the boundary
    vx = np.asarray(ring_x, dtype=np.float64)
    vy = np.asarray(ring_y, dtype=np.float64)
    vin = (
        (vx[None, :] >= cw[:, None]) & (vx[None, :] <= ce[:, None])
        & (vy[None, :] >= cs[:, None]) & (vy[None, :] <= cn[:, None])
    ).any(axis=1)
    keep |= vin
    # edges can cross a cell box without endpoints inside — dilate by ring-1
    kept = cand[keep]
    if len(kept) == 0:
        return kept
    ring = np.unique(cell_ring(kept, 1).ravel())
    # keep only ring cells that were bbox candidates
    return np.intersect1d(ring, cand)


# ---------------------------------------------------------------- distances

EARTH_R_M = 6_371_008.8


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters; fully broadcastable."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lon1, lat1, lon2, lat2))
    dlon, dlat = lon2 - lon1, lat2 - lat1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_R_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def dp_simplify_indices(lon, lat, eps: float):
    """Douglas-Peucker polyline simplification: indices of KEPT points.

    Iterative (explicit stack); the split test compares squared cross
    product against ``eps² · |AB|²`` (no division, no sqrt — exactly the
    expression the SQL twin runs, so both engines branch on identical
    doubles); degenerate A==B segments fall back to squared euclidean
    distance vs ``eps²``. Ties in the farthest-point argmax break to
    the LOWEST index (np.argmax first-max == ORDER BY score DESC, idx).
    """
    import numpy as np

    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    n = len(lon)
    keep = np.zeros(n, bool)
    keep[0] = keep[n - 1] = True
    eps2 = eps * eps
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        ax, ay, bx, by = lon[i], lat[i], lon[j], lat[j]
        px, py = lon[i + 1:j], lat[i + 1:j]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            score = (px - ax) * (px - ax) + (py - ay) * (py - ay)
            thr = eps2
        else:
            cr = dx * (py - ay) - dy * (px - ax)
            score = cr * cr
            thr = eps2 * seg2
        k = int(np.argmax(score))
        if score[k] > thr:
            kk = i + 1 + k
            keep[kk] = True
            stack.append((i, kk))
            stack.append((kk, j))
    return np.nonzero(keep)[0]


def ring_edges(polygons) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                  np.ndarray, list]:
    """Polygon rings exploded to directed edges (x1, y1, x2, y2,
    polygon_ids-per-edge) — THE edge definition, shared by the engine's
    nearest-boundary kernel and the oracle's edges fixture so both sides
    can never diverge on what an edge is (closing edge included via
    np.roll)."""
    pid, x1, y1, x2, y2 = [], [], [], [], []
    for r in polygons.to_pylist():
        rx = np.array([p["lon"] for p in r["ring"]])
        ry = np.array([p["lat"] for p in r["ring"]])
        pid += [r["polygon_id"]] * len(rx)
        x1.append(rx); y1.append(ry)
        x2.append(np.roll(rx, -1)); y2.append(np.roll(ry, -1))
    return (np.concatenate(x1), np.concatenate(y1),
            np.concatenate(x2), np.concatenate(y2), pid)


def convex_hull_int(pts: np.ndarray) -> np.ndarray:
    """Convex hull of 2-D INTEGER points (Andrew's monotone chain,
    exact int64 cross products — no float orientation ties). Input
    (n, 2) int array (duplicates fine); returns the hull vertices in
    counter-clockwise order starting from the lexicographic minimum.
    Collinear interior points are dropped; degenerate inputs (n ≤ 2, or
    all points collinear) return the distinct extreme points."""
    pts = np.unique(np.asarray(pts, dtype=np.int64), axis=0)  # lex sort
    n = len(pts)
    if n <= 2:
        return pts

    def half(order):
        h = []
        for p in order:
            while len(h) >= 2:
                ox, oy = h[-2]
                ax, ay = h[-1]
                # cross((a-o), (p-o)) <= 0 → clockwise or collinear: pop
                if (int(ax - ox) * int(p[1] - oy)
                        - int(ay - oy) * int(p[0] - ox)) <= 0:
                    h.pop()
                else:
                    break
            h.append((int(p[0]), int(p[1])))
        return h[:-1]   # last point = first of the other half

    lower = half(pts)
    upper = half(pts[::-1])
    hull = lower + upper
    if not hull:        # all collinear: keep the two extremes
        return pts[[0, -1]]
    return np.array(hull, dtype=np.int64)


def hull_diameter2(pts: np.ndarray) -> int:
    """Exact squared Euclidean diameter of an integer point set: hull
    prune (the diameter's endpoints are hull vertices) then the exact
    max over hull-vertex pairs — O(n log n + h²) instead of O(n²)."""
    h = convex_hull_int(pts)
    dx = h[:, 0][:, None] - h[:, 0][None, :]
    dy = h[:, 1][:, None] - h[:, 1][None, :]
    return int((dx * dx + dy * dy).max())


def hex_axial(lon: np.ndarray, lat: np.ndarray,
              size: float) -> tuple[np.ndarray, np.ndarray]:
    """Flat-top hexagonal bin assignment (the H3-style hex grid on a
    plate-carrée plane): axial coordinates (q, r) of the hex of width
    ``size`` degrees containing each point, via fractional axial coords
    + cube rounding (Red Blob Games' canonical algorithm).

    Every float expression below is mirrored token-for-token in the SQL
    twin (rnd(v) = floor(v + 0.5), never round() — numpy rounds half to
    even, DuckDB half away from zero); identical IEEE trees → identical
    bins, so hexbin counts are value-pinned."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = ((2.0 / 3.0) * lon) / size
    z = ((np.sqrt(3.0) / 3.0) * lat - (1.0 / 3.0) * lon) / size
    y = -x - z
    rx = np.floor(x + 0.5)
    ry = np.floor(y + 0.5)
    rz = np.floor(z + 0.5)
    dx = np.abs(rx - x)
    dy = np.abs(ry - y)
    dz = np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    q = np.where(fix_x, -ry - rz, rx).astype(np.int64)
    r = np.where(fix_z, -rx - ry, rz).astype(np.int64)
    return q, r


def ring_edges_float(rx, ry):
    """(x1, y1, x2, y2) edge arrays of one closed ring — the SAME
    explode (vertex i → roll(-1)) that builds the edges fixture, so
    float predicates over these mirror the SQL twins exactly."""
    rx = np.asarray(rx, np.float64)
    ry = np.asarray(ry, np.float64)
    return rx, ry, np.roll(rx, -1), np.roll(ry, -1)


def edges_cross_float(a, b) -> bool:
    """True iff any edge of ring a STRICTLY crosses any edge of ring b
    — the d1·d2<0 ∧ d3·d4<0 float convention shared with the
    ways_crossing_polygons SQL twin (touches/collinear excluded)."""
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    d1 = ((ax2 - ax1)[:, None] * (by1[None, :] - ay1[:, None])
          - (ay2 - ay1)[:, None] * (bx1[None, :] - ax1[:, None]))
    d2 = ((ax2 - ax1)[:, None] * (by2[None, :] - ay1[:, None])
          - (ay2 - ay1)[:, None] * (bx2[None, :] - ax1[:, None]))
    d3 = ((bx2 - bx1)[None, :] * (ay1[:, None] - by1[None, :])
          - (by2 - by1)[None, :] * (ax1[:, None] - bx1[None, :]))
    d4 = ((bx2 - bx1)[None, :] * (ay2[:, None] - by1[None, :])
          - (by2 - by1)[None, :] * (ax2[:, None] - bx1[None, :]))
    return bool(((d1 * d2 < 0) & (d3 * d4 < 0)).any())


def point_in_edges_float(edges, px: float, py: float) -> bool:
    """Ray-cast parity over exploded ring edges with the EXACT float
    expression of the way_polygon_relation SQL twin
    (``(y1 <= py) != (y2 <= py) AND px < x1 + (py-y1)/(y2-y1)*(x2-x1)``)."""
    x1, y1, x2, y2 = edges
    m = (y1 <= py) != (y2 <= py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xc = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
    return int((m & (px < xc)).sum()) % 2 == 1


def hilbert_d(qx: np.ndarray, qy: np.ndarray, order: int) -> np.ndarray:
    """Hilbert-curve distance of grid cells (the locality-preserving
    alternative to the Morton interleave — adjacent curve positions are
    always adjacent cells, so range reads over the key cut fewer seams).
    Standard xy→d transform (Hilbert 1891; the bit-twiddling form per
    Warren, Hacker's Delight §16) vectorized over ``order`` rounds;
    mirrorable in SQL as ``order`` unrolled CASE/XOR steps."""
    x = np.asarray(qx, dtype=np.int64).copy()
    y = np.asarray(qy, dtype=np.int64).copy()
    d = np.zeros(len(x), dtype=np.int64)
    s = np.int64(1) << np.int64(order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate/reflect the quadrant so the curve stays contiguous
        refl = ry == 0
        fl = refl & (rx == 1)
        nx = np.where(refl, np.where(fl, s - 1 - y, y), x)
        ny = np.where(refl, np.where(fl, s - 1 - x, x), y)
        x, y = nx, ny
        s >>= np.int64(1)
    return d
