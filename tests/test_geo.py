"""Cell index + PIP + haversine property tests (SURVEY.md §5.3)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from wrangle_openstreetmap_data_ray.functions import geo


def test_cell_roundtrip_and_parent():
    rng = np.random.default_rng(0)
    lon = rng.uniform(-180, 179.999, 5000)
    lat = rng.uniform(-90, 89.999, 5000)
    for res in (0, 1, 5, 12, 20, 26):
        c = geo.cell_encode(lon, lat, res)
        qx, qy, r = geo.cell_decode(c)
        ex, ey = geo.cell_xy(lon, lat, res)
        assert (r == res).all() and (qx == ex).all() and (qy == ey).all()
        if res > 3:
            p = geo.cell_parent(c, res - 3)
            assert (p == geo.cell_encode(lon, lat, res - 3)).all()


def test_cell_center_within_bounds():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 179.999, 500)
    lat = rng.uniform(-90, 89.999, 500)
    c = geo.cell_encode(lon, lat, 14)
    w, s, e, n = geo.cell_bounds(c)
    assert ((lon >= w) & (lon < e) & (lat >= s) & (lat < n)).all()
    clon, clat = geo.cell_center(c)
    assert ((clon > w) & (clon < e) & (clat > s) & (clat < n)).all()


def test_cell_children_inverse_of_parent():
    c = geo.cell_encode(np.array([103.8]), np.array([1.3]), 10)
    kids = geo.cell_children(int(c[0]))
    assert len(kids) == 4
    assert (geo.cell_parent(kids, 10) == c[0]).all()


def test_ring_contains_self_and_neighbors():
    c = geo.cell_encode(np.array([103.8]), np.array([1.3]), 12)
    ring = geo.cell_ring(c, 1)
    assert ring.shape == (1, 9)
    assert int(c[0]) in set(ring.ravel().tolist())
    assert len(set(ring.ravel().tolist())) == 9  # interior cell: all distinct


def test_ring_wraps_longitude():
    c = geo.cell_encode(np.array([-179.999]), np.array([0.0]), 8)
    ring = set(geo.cell_ring(c, 1).ravel().tolist())
    east = geo.cell_encode(np.array([179.999]), np.array([0.0]), 8)
    assert int(east[0]) in ring


def test_pip_square_and_concave():
    sq_x = np.array([0.0, 1, 1, 0])
    sq_y = np.array([0.0, 0, 1, 1])
    px = np.array([0.5, 1.5, -0.1, 0.99])
    py = np.array([0.5, 0.5, 0.5, 0.01])
    np.testing.assert_array_equal(
        geo.point_in_polygon(px, py, sq_x, sq_y), [True, False, False, True])
    # concave "C" shape: notch on the right
    cx = np.array([0.0, 2, 2, 1, 1, 2, 2, 0])
    cy = np.array([0.0, 0, 0.8, 0.8, 1.2, 1.2, 2, 2])
    inside = geo.point_in_polygon(np.array([1.5, 0.5, 1.5]),
                                  np.array([1.0, 1.0, 0.4]), cx, cy)
    np.testing.assert_array_equal(inside, [False, True, True])


@given(st.floats(-170, 170), st.floats(-80, 80), st.integers(3, 10))
@settings(max_examples=50, deadline=None)
def test_pip_cell_box_consistency(lon, lat, res):
    """A point is inside its own cell's box polygon, modulo 1-ulp boundary
    snapping (quantization at an exact cell edge may round either way; the
    assignment is still deterministic). Dilate the box by epsilon."""
    c = geo.cell_encode(np.array([lon]), np.array([lat]), res)
    w, s, e, n = (v[0] for v in geo.cell_bounds(c))
    eps = 1e-9 * max(1.0, abs(lon), abs(lat))
    rx = np.array([w - eps, e + eps, e + eps, w - eps])
    ry = np.array([s - eps, s - eps, n + eps, n + eps])
    assert geo.point_in_polygon(np.array([lon]), np.array([lat]), rx, ry)[0]


def test_polygon_cover_cells_conservative():
    """Every point inside the polygon maps to a covered cell."""
    ang = np.arange(7) / 7 * 2 * np.pi
    rx = 103.8 + 0.05 * np.cos(ang)
    ry = 1.3 + 0.04 * np.sin(ang)
    res = 14
    cover = set(geo.polygon_cover_cells(rx, ry, res).tolist())
    rng = np.random.default_rng(3)
    px = rng.uniform(103.74, 103.86, 2000)
    py = rng.uniform(1.25, 1.35, 2000)
    inside = geo.point_in_polygon(px, py, rx, ry)
    cells = geo.cell_encode(px[inside], py[inside], res)
    assert set(cells.tolist()) <= cover


def test_haversine_known_distance():
    # equator: 1 degree of longitude ≈ 111.19 km
    d = geo.haversine_m(0.0, 0.0, 1.0, 0.0)
    assert abs(d - 111_195) < 200
    assert geo.haversine_m(103.8, 1.3, 103.8, 1.3) == 0.0


def test_bbox_contains():
    m = geo.bbox_contains(np.array([103.8, 102.0]), np.array([1.3, 1.3]))
    np.testing.assert_array_equal(m, [True, False])


def test_compact_uncompact_roundtrip():
    """compact is minimal & lossless: uncompact(compact(S), r) == S for a
    full-children set; partial quartets stay at their resolution."""
    import numpy as np

    from wrangle_openstreetmap_data_ray.functions import geo
    rng = np.random.default_rng(11)
    lon = rng.uniform(103.6, 104.0, 400)
    lat = rng.uniform(1.2, 1.5, 400)
    r = 10
    cells = np.unique(geo.cell_encode(lon, lat, r))
    comp = geo.compact_cells(cells)
    assert len(comp) <= len(cells)
    back = geo.uncompact_cells(comp, r)
    assert np.array_equal(np.sort(back), np.sort(cells))
    # a complete parent quartet compacts to exactly the parent
    parent = geo.cell_encode(np.array([103.8]), np.array([1.3]), 9)[0]
    kids = geo.cell_children(int(parent))
    assert np.array_equal(geo.compact_cells(kids), np.array([parent]))
    # recursive: 16 grandchildren -> 1 grandparent
    gkids = np.concatenate([geo.cell_children(int(k)) for k in kids])
    assert np.array_equal(geo.compact_cells(gkids), np.array([parent]))
    # partial quartet unchanged
    partial = kids[:3]
    assert np.array_equal(geo.compact_cells(partial), np.sort(partial))


def test_convex_hull_diameter_matches_bruteforce():
    from wrangle_openstreetmap_data_ray.functions import geo
    rng = np.random.default_rng(17)
    for _ in range(300):
        pts = rng.integers(-100, 100, (int(rng.integers(1, 60)), 2))
        dx = pts[:, 0][:, None] - pts[:, 0][None, :]
        dy = pts[:, 1][:, None] - pts[:, 1][None, :]
        want = int((dx * dx + dy * dy).max())
        assert geo.hull_diameter2(pts) == want
    # degenerate shapes
    assert geo.hull_diameter2(np.array([[7, -3]])) == 0
    assert geo.hull_diameter2(np.array([[0, 0], [0, 0], [0, 0]])) == 0
    assert geo.hull_diameter2(np.array([[0, 0], [1, 1], [2, 2], [5, 5]])) == 50
    # hull is a subset of the input and contains the extremes
    pts = rng.integers(-9, 9, (30, 2))
    h = geo.convex_hull_int(pts)
    as_set = {tuple(p) for p in np.unique(pts, axis=0)}
    assert all(tuple(p) in as_set for p in h)


def test_hex_axial_roundtrip_and_adjacency():
    from wrangle_openstreetmap_data_ray.functions import geo
    rng = np.random.default_rng(23)
    lon = rng.uniform(103.3, 104.4, 5000)
    lat = rng.uniform(0.95, 1.67, 5000)
    s = 0.03
    q, r = geo.hex_axial(lon, lat, s)
    # every point lies within one hex circumradius of its bin center
    cx = s * (3.0 / 2.0) * q
    cy = s * (np.sqrt(3.0) / 2.0 * q + np.sqrt(3.0) * r)
    d = np.hypot(lon - cx, lat - cy)
    assert (d <= s * 1.0000001).all()
    # binning is deterministic and dense points share bins
    q2, r2 = geo.hex_axial(lon, lat, s)
    assert np.array_equal(q, q2) and np.array_equal(r, r2)


def test_polygon_overlay_predicates():
    from wrangle_openstreetmap_data_ray.functions import geo
    sq = lambda x0, y0, s: geo.ring_edges_float(
        [x0, x0 + s, x0 + s, x0], [y0, y0, y0 + s, y0 + s])
    outer = sq(0.0, 0.0, 10.0)
    inner = sq(3.0, 3.0, 2.0)       # strictly nested
    shifted = sq(8.0, 8.0, 4.0)     # crosses outer's corner
    far = sq(20.0, 20.0, 1.0)       # disjoint
    assert not geo.edges_cross_float(outer, inner)
    assert geo.point_in_edges_float(outer, inner[0][0], inner[1][0])
    assert not geo.point_in_edges_float(inner, outer[0][0], outer[1][0])
    assert geo.edges_cross_float(outer, shifted)
    assert not geo.edges_cross_float(outer, far)
    assert not geo.point_in_edges_float(outer, far[0][0], far[1][0])


def test_hilbert_d_bijective_unit_steps():
    """Order-8 Hilbert transform is a bijection onto [0, 4^8) and every
    consecutive pair of curve positions is an ADJACENT cell (the
    locality property Morton lacks)."""
    import numpy as np

    from wrangle_openstreetmap_data_ray.functions.geo import hilbert_d

    n = 256
    X, Y = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_d(X.ravel(), Y.ravel(), 8)
    assert len(np.unique(d)) == n * n
    assert d.min() == 0 and d.max() == n * n - 1
    order = np.argsort(d)
    xs, ys = X.ravel()[order], Y.ravel()[order]
    step = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert step.max() == 1
    # order-2 reference shape
    qx = np.array([0, 0, 1, 1]); qy = np.array([0, 1, 1, 0])
    assert hilbert_d(qx, qy, 2).tolist() == [0, 3, 2, 1]
