"""Deterministic (seed=42) fixture synthesis per FIXTURES.md.

Every row's content is a pure function of its index and the seed — NOT of
batch boundaries or worker count — so the same table materializes bit-identically
at any parallelism. Pixel noise uses a counter-based splitmix64 stream
(no stateful RNG), which keeps per-image generation fully vectorized.

Two surfaces:
- ``gen_*_table(start, count, seed)`` — pure pyarrow, for unit tests.
- ``synth_images_dataset(n)`` / ``materialize_images(n)`` — Ray-parallel
  generation via ``ray.data.range(n).map_batches`` with a /tmp parquet cache,
  for correctness (1e4) and bench (>=1e5) scales.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .functions import codecs
from .functions.geo import SG_BBOX
from .functions.hashing import hash64_bytes, splitmix64

SEED = 42
DUP_RATE = 100          # every 100th image duplicates its predecessor's pixels
_SIZES = np.array([16, 32, 64], dtype=np.int32)
_FMTS = np.array(["raw8", "ppm", "png", "lossy8"])

# caption grammar (FIXTURES.md F1): mixes canonical and abbreviated
# Singapore street phrases to drive the normalizer conformance tests.
_STREET_CORES = ["Besar", "Serangoon", "Timah", "Toa Payoh", "Changi", "Tampines",
                 "Clementi", "Yishun", "Merah", "Orchard", "Holland", "Pioneer"]
_TYPE_CANON = ["Avenue", "Road", "Street", "Drive", "Lane", "Crescent",
               "Boulevard", "Terrace", "Walk", "Link", "Close", "Way"]
_TYPE_ABBR = ["Ave", "Rd", "St", "Dr", "Ln", "Cres", "Blvd", "Ter",
              "Ave.", "Rd.", "St.", "Dr."]
_MALAY_CANON = ["Jalan", "Lorong", "Bukit", "Kampong", "Tanjong"]
_MALAY_ABBR = ["Jln", "Lor", "Bt", "Kg", "Tg"]
_CAPTION_PREFIX = ["street view of", "photo near", "shopfront on", "crowd at",
                   "rainy evening on", "hdb block along", "food stall at"]

_HOTSPOTS = [(103.85, 1.29), (103.70, 1.34), (103.95, 1.37)]  # skew centers


def _u(idx: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic uniform [0,1) per index for a named stream."""
    h = splitmix64(idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                   ^ np.uint64(SEED * 1_000_003 + stream))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _choice(idx: np.ndarray, options, stream: int) -> np.ndarray:
    k = (_u(idx, stream) * len(options)).astype(np.int64)
    return np.asarray(options)[k]


def _pixels(idx: int, h: int, w: int) -> np.ndarray:
    """Deterministic pseudo-random pixels for image ``idx`` (vectorized)."""
    n = h * w * 3
    with np.errstate(over="ignore"):
        base = np.uint64(idx) * np.uint64(0xD1B54A32D192ED03) ^ np.uint64(SEED)
        vals = splitmix64(base + np.arange(n, dtype=np.uint64))
    return (vals & np.uint64(0xFF)).astype(np.uint8).reshape(h, w, 3)


def street_name(idx: int) -> str:
    """Dirty street name (F2.addr_street / caption tail), deterministic."""
    i = np.array([idx], dtype=np.int64)
    core = _choice(i, _STREET_CORES, 11)[0]
    if _u(i, 12)[0] < 0.4:  # Malay word order: type first
        t = _MALAY_ABBR if _u(i, 13)[0] < 0.5 else _MALAY_CANON
        street = f"{_choice(i, t, 14)[0]} {core}"
    else:
        t = _TYPE_ABBR if _u(i, 13)[0] < 0.5 else _TYPE_CANON
        street = f"{core} {_choice(i, t, 14)[0]}"
    if _u(i, 15)[0] < 0.3:
        street += f" {int(_u(i, 16)[0] * 9) + 1}"
    return street


def _caption(idx: int) -> str:
    i = np.array([idx], dtype=np.int64)
    return f"{_choice(i, _CAPTION_PREFIX, 17)[0]} {street_name(idx)}"


# ------------------------------------------------------------------- images

def gen_images_table(start: int, count: int, seed: int = SEED) -> pa.Table:
    """F1 ``images`` rows [start, start+count) — pure function of indices."""
    ids, blobs, ws, hs, fmts, caps, phashes = [], [], [], [], [], [], []
    pending: dict[int, tuple] = {}
    for idx in range(start, start + count):
        src = idx - 1 if (idx % DUP_RATE == DUP_RATE - 1 and idx > 0) else idx
        i = np.array([src], dtype=np.int64)
        w = int(_choice(i, _SIZES, 1)[0])
        h = int(_choice(i, _SIZES, 2)[0])
        fmt = str(_choice(i, _FMTS, 3)[0])
        img = _pixels(src, h, w)
        data = codecs.encode(img, fmt)
        decoded = codecs.decode(data, fmt, w, h)
        ids.append(f"img{idx:012d}")
        blobs.append(data)
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        caps.append(_caption(idx))
        phashes.append(np.int64(np.uint64(hash64_bytes(decoded.tobytes(), seed))))
    from .schemas import IMAGES
    return pa.table({
        "image_id": ids, "bytes": blobs, "w": ws, "h": hs,
        "fmt": fmts, "caption": caps,
        "phash": np.array(phashes, dtype=np.int64),
    }, schema=IMAGES)


# ------------------------------------------------------------- audio/video

def _audio_samples(idx: int) -> tuple[np.ndarray, int]:
    """Deterministic PCM16 mono clip for audio ``idx``: a two-tone sine
    mix + hash noise; sr=8000, 0.2–1.0 s."""
    sr = 8000
    n = 1600 + int(_u(np.array([idx]), 20)[0] * 6400)
    t = np.arange(n, dtype=np.float64) / sr
    f1 = 100.0 + (idx % 37) * 13.0
    f2 = 350.0 + (idx % 23) * 29.0
    wave = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    with np.errstate(over="ignore"):
        noise = splitmix64(np.uint64(idx) * np.uint64(0xA24BAED4963EE407)
                           ^ np.uint64(SEED) + np.arange(n, dtype=np.uint64))
    wave += ((noise & np.uint64(0xFFFF)).astype(np.float64) / 65535.0 - 0.5) * 0.1
    return (wave * 12000).astype(np.int16), sr


def gen_audio_table(start: int, count: int) -> pa.Table:
    """``audio`` rows: (audio_id, bytes=REAL WAV PCM16, sr, n_samples,
    caption) — pure function of row index; the metadata columns are
    redundant with the WAV header, which is exactly what the decode
    oracle cross-checks."""
    ids, blobs, srs, ns, caps = [], [], [], [], []
    for idx in range(start, start + count):
        samples, sr = _audio_samples(idx)
        ids.append(f"aud{idx:09d}")
        blobs.append(codecs.encode_wav(samples, sr))
        srs.append(sr)
        ns.append(len(samples))
        caps.append(_caption(idx))
    return pa.table({
        "audio_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "sr": pa.array(srs, pa.int32()),
        "n_samples": pa.array(ns, pa.int32()),
        "caption": pa.array(caps, pa.string()),
    })


def _video_frames(idx: int, n_frames: int, px: int = 16) -> np.ndarray:
    """Deterministic frames: frame f of video idx = _pixels(idx*1009+f)."""
    return np.stack([_pixels(idx * 1009 + f, px, px)
                     for f in range(n_frames)])


def gen_video_table(start: int, count: int) -> pa.Table:
    """``videos`` rows: (video_id, bytes=REAL rawvid, w, h, n_frames, fps,
    caption) — n_frames 4–12, 16×16 raw24 frames."""
    ids, blobs, ws, hs, nf, fps, caps = [], [], [], [], [], [], []
    for idx in range(start, start + count):
        n_frames = 4 + int(_u(np.array([idx]), 21)[0] * 9)
        frames = _video_frames(idx, n_frames)
        ids.append(f"vid{idx:09d}")
        blobs.append(codecs.encode_rawvid(frames, 8.0))
        ws.append(16)
        hs.append(16)
        nf.append(n_frames)
        fps.append(8.0)
        caps.append(_caption(idx))
    return pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "n_frames": pa.array(nf, pa.int32()),
        "fps": pa.array(fps, pa.float64()),
        "caption": pa.array(caps, pa.string()),
    })


# ---------------------------------------------------------------------- geo

def _lonlat(idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic per-index (lon, lat): 80% clustered at 3 hotspots
    (intentional skew), 10% uniform in the Singapore bbox, 10% outside
    (Johor/Riau) — fully vectorized."""
    w, s, e, n = SG_BBOX
    u_kind = _u(idx, 21)
    u_lon, u_lat = _u(idx, 22), _u(idx, 23)
    hot = (_u(idx, 24) * len(_HOTSPOTS)).astype(np.int64)
    hx = np.array([p[0] for p in _HOTSPOTS])[hot]
    hy = np.array([p[1] for p in _HOTSPOTS])[hot]
    gx = (u_lon + _u(idx, 25) + _u(idx, 26) - 1.5) * 0.02
    gy = (u_lat + _u(idx, 27) + _u(idx, 28) - 1.5) * 0.02
    lon = np.where(u_kind < 0.8, np.clip(hx + gx, w, e),
                   np.where(u_kind < 0.9, w + u_lon * (e - w),
                            np.where(u_lon < 0.5, w - 0.3 + u_lon * 0.25,
                                     e + 0.05 + u_lon * 0.3)))
    lat = np.where(u_kind < 0.8, np.clip(hy + gy, s, n),
                   np.where(u_kind < 0.9, s + u_lat * (n - s),
                            np.where(u_lat < 0.5, n + 0.05 + u_lat * 0.3,
                                     s - 0.3 + u_lat * 0.25)))
    return lon, lat


def gen_points_table(start: int, count: int, seed: int = SEED) -> pa.Table:
    """Slim position-only rows (image_id, lon, lat) — NO per-row Python
    (street/postcode strings), so XL scaling fixtures (10^7+ rows locally,
    the 10^12 design point on a cluster) generate at memory bandwidth."""
    idx = np.arange(start, start + count, dtype=np.int64)
    lon, lat = _lonlat(idx)
    ids = np.char.add("img", np.char.zfill((idx).astype(str), 12))
    return pa.table({"image_id": pa.array(ids.tolist(), pa.string()),
                     "lon": pa.array(lon, pa.float64()),
                     "lat": pa.array(lat, pa.float64())})


def gen_geo_table(start: int, count: int, seed: int = SEED) -> pa.Table:
    """F2 ``geo`` rows — 80% clustered at 3 hotspots (intentional skew),
    10% uniform in the Singapore bbox, 10% outside (Johor/Riau)."""
    idx = np.arange(start, start + count, dtype=np.int64)
    lon, lat = _lonlat(idx)
    streets = [street_name(int(i)) for i in idx]
    # postcodes: 85% valid 6-digit (prefix 01..82), 10% 5-digit MY, 5% typos
    u_pc = _u(idx, 29)
    pref = (1 + _u(idx, 30) * 82).astype(np.int64)
    suffix = (_u(idx, 31) * 10000).astype(np.int64)
    valid = np.char.add(np.char.zfill(pref.astype(str), 2),
                        np.char.zfill(suffix.astype(str), 4))
    my = (79000 + _u(idx, 32) * 3000).astype(np.int64).astype(str)
    typo_pool = np.array(["S 408564", "4085", "SG4085AB", "0", "postcode?"])
    typo = _choice(idx, typo_pool, 33)
    postcode = np.where(u_pc < 0.85, valid, np.where(u_pc < 0.95, my, typo))
    from .schemas import GEO
    return pa.table({
        "image_id": [f"img{int(i):012d}" for i in idx],
        "lon": lon, "lat": lat,
        "addr_street": streets, "addr_postcode": postcode.tolist(),
    }, schema=GEO)


# ----------------------------------------------------------------- polygons

def gen_polygons_table(n_polys: int = 50, seed: int = SEED,
                       detail: int = 1) -> pa.Table:
    """F3 polygons tiling the Singapore bbox: mostly convex (perturbed
    regular k-gons on a grid, overlapping), every 7th a concave star —
    ray-cast edge cases. ``detail`` multiplies the vertex count (real
    admin boundaries run to hundreds of vertices; higher detail also
    raises the ray-cast's flops-per-point for bench realism)."""
    w, s, e, n = SG_BBOX
    grid = int(np.ceil(np.sqrt(n_polys)))
    rows = []
    for p in range(n_polys):
        i = np.array([p], dtype=np.int64)
        gx, gy = p % grid, p // grid
        cx = w + (gx + 0.5) / grid * (e - w) + (_u(i, 41)[0] - 0.5) * 0.02
        cy = s + (gy + 0.5) / grid * (n - s) + (_u(i, 42)[0] - 0.5) * 0.02
        k = (6 + int(_u(i, 43)[0] * 10)) * detail   # base 6..15 vertices (×2 for stars)
        base_r = (0.6 + _u(i, 44)[0]) * 0.6 * max((e - w) / grid, (n - s) / grid)
        ang = np.arange(k) / k * 2 * np.pi + _u(i, 45)[0]
        if p % 7 == 3:  # concave star
            ang = np.arange(2 * k) / (2 * k) * 2 * np.pi + _u(i, 45)[0]
            r = np.where(np.arange(2 * k) % 2 == 0, base_r, base_r * 0.45)
        else:
            r = base_r * (0.8 + 0.4 * _u(np.arange(k, dtype=np.int64) + p * 1000, 46))
        ring_x = cx + r * np.cos(ang)
        ring_y = cy + r * np.sin(ang) * 0.7     # flatten to fit the bbox aspect
        rows.append({
            "polygon_id": f"poly{p:04d}",
            "name": f"district_{p:04d}",
            "kind": "admin" if p % 5 == 0 else "neighborhood",
            "ring": [{"lon": float(x), "lat": float(y)} for x, y in zip(ring_x, ring_y)],
            "bbox_w": float(ring_x.min()), "bbox_s": float(ring_y.min()),
            "bbox_e": float(ring_x.max()), "bbox_n": float(ring_y.max()),
        })
    from .schemas import POLYGONS
    return pa.Table.from_pylist(rows, schema=POLYGONS)


# -------------------------------------------------------------- osm tables

_USERS = [f"user_{i:03d}" for i in range(200)]


def _zipf_user(idx: np.ndarray) -> np.ndarray:
    """Zipfian pick over 200 users: rank ~ u^3 (heavy head)."""
    r = (_u(idx, 51) ** 3 * len(_USERS)).astype(np.int64).clip(0, len(_USERS) - 1)
    return r


def gen_osm_tables(n_nodes: int = 2000, n_ways: int = 300, seed: int = SEED):
    """F4 flattened OSM element tables (nodes, ways, way_nodes, tags)."""
    from .schemas import NODES, TAGS, WAY_NODES, WAYS
    w, s, e, n = SG_BBOX
    nidx = np.arange(n_nodes, dtype=np.int64)
    u = _u(nidx, 52)
    lon = np.where(u < 0.9, w + _u(nidx, 53) * (e - w), e + 0.1 + _u(nidx, 53) * 0.2)
    lat = np.where(u < 0.9, s + _u(nidx, 54) * (n - s), n + 0.05 + _u(nidx, 54) * 0.2)
    uid = _zipf_user(nidx)
    ts = (np.datetime64("2013-01-01T00:00:00") +
          (_u(nidx, 55) * 365 * 24 * 3600).astype("timedelta64[s]"))
    nodes = pa.table({
        "id": nidx + 1_000_000, "lat": lat, "lon": lon,
        "version": (1 + (_u(nidx, 56) * 5).astype(np.int64)).astype(str).tolist(),
        "changeset": (17_000_000 + nidx).astype(str).tolist(),
        "timestamp": ts.astype("datetime64[us]"),
        "user": [(_USERS[i]) for i in uid], "uid": uid + 1_000_000,
    }, schema=NODES)

    widx = np.arange(n_ways, dtype=np.int64)
    wuid = _zipf_user(widx + 777)
    wts = (np.datetime64("2013-01-01T00:00:00") +
           (_u(widx, 57) * 365 * 24 * 3600).astype("timedelta64[s]"))
    ways = pa.table({
        "id": widx + 5_000_000,
        "version": (1 + (_u(widx, 58) * 5).astype(np.int64)).astype(str).tolist(),
        "changeset": (18_000_000 + widx).astype(str).tolist(),
        "timestamp": wts.astype("datetime64[us]"),
        "user": [(_USERS[i]) for i in wuid], "uid": wuid + 1_000_000,
    }, schema=WAYS)

    wn_way, wn_node, wn_pos = [], [], []
    for wi in range(n_ways):
        i = np.array([wi], dtype=np.int64)
        cnt = 2 + int(_u(i, 59)[0] * 8)
        refs = ((_u(np.arange(cnt, dtype=np.int64) + wi * 100, 60)) * n_nodes).astype(np.int64)
        wn_way += [wi + 5_000_000] * cnt
        wn_node += (refs + 1_000_000).tolist()
        wn_pos += list(range(cnt))
    way_nodes = pa.table({
        "way_id": np.array(wn_way, dtype=np.int64),
        "node_id": np.array(wn_node, dtype=np.int64),
        "position": np.array(wn_pos, dtype=np.int32),
    }, schema=WAY_NODES)

    amenities = ["restaurant", "cafe", "atm", "bank", "school", "parking",
                 "place_of_worship", "hawker_centre"]
    cuisines = ["chinese", "malay", "indian", "japanese", "korean", "seafood"]
    tag_rows = []
    for ni in range(n_nodes):
        i = np.array([ni], dtype=np.int64)
        eid = int(ni + 1_000_000)
        u0 = _u(i, 61)[0]
        if u0 < 0.35:
            tag_rows.append(("node", eid, "addr:street", street_name(ni)))
            pc_u = _u(i, 62)[0]
            if pc_u < 0.85:
                pref = 1 + int(_u(i, 63)[0] * 82)
                tag_rows.append(("node", eid, "addr:postcode",
                                 f"{pref:02d}{int(_u(i, 64)[0] * 10000):04d}"))
            elif pc_u < 0.95:
                tag_rows.append(("node", eid, "addr:postcode",
                                 str(79000 + int(_u(i, 65)[0] * 3000))))
            else:
                tag_rows.append(("node", eid, "addr:postcode", "S 4085"))
        if u0 < 0.25:
            tag_rows.append(("node", eid, "amenity", amenities[int(_u(i, 66)[0] * len(amenities))]))
            if _u(i, 67)[0] < 0.5:
                tag_rows.append(("node", eid, "cuisine", cuisines[int(_u(i, 68)[0] * len(cuisines))]))
        if u0 > 0.97:
            tag_rows.append(("node", eid, "odd key!", "problem"))
        if u0 > 0.95:
            tag_rows.append(("node", eid, "addr:street:block", "skipme"))
    for wi in range(n_ways):
        i = np.array([wi], dtype=np.int64)
        eid = int(wi + 5_000_000)
        if _u(i, 69)[0] < 0.5:
            tag_rows.append(("way", eid, "highway", "residential"))
        if _u(i, 70)[0] < 0.3:
            tag_rows.append(("way", eid, "name", street_name(wi + 31)))
    tags = pa.table({
        "elem_kind": [r[0] for r in tag_rows],
        "elem_id": np.array([r[1] for r in tag_rows], dtype=np.int64),
        "key": [r[2] for r in tag_rows],
        "value": [r[3] for r in tag_rows],
    }, schema=TAGS)
    return nodes, ways, way_nodes, tags


# -------------------------------------------------- Ray-parallel generation

def synth_images_dataset(n: int, block_rows: int = 2000):
    """Ray-parallel F1 generation: range(n) → map_batches(gen) — content is a
    pure function of the row index, so any block split yields the same table."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return gen_images_table(int(ids[0]), len(ids))

    return (rd.range(n, override_num_blocks=max(1, n // block_rows))
            .map_batches(gen, batch_format="pyarrow", batch_size=block_rows))


def synth_geo_dataset(n: int, block_rows: int = 50_000):
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return gen_geo_table(int(ids[0]), len(ids))

    return (rd.range(n, override_num_blocks=max(1, n // block_rows))
            .map_batches(gen, batch_format="pyarrow", batch_size=block_rows))


def synth_points_dataset(n: int, block_rows: int = 500_000):
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return gen_points_table(int(ids[0]), len(ids))

    return (rd.range(n, override_num_blocks=max(1, n // block_rows))
            .map_batches(gen, batch_format="pyarrow", batch_size=block_rows))


def gen_segments_table(start: int, count: int) -> pa.Table:
    """Country-scale road-segment rows (way_id, x1, y1, x2, y2):
    SHORT segments (30–250 m-ish in degrees) anchored by the same
    skewed _lonlat distribution as the points — the beyond-broadcast
    snap fixture (a real network is many short segments, unlike the
    OSM fixture's long synthetic chords). Pure function of index."""
    idx = np.arange(start, start + count, dtype=np.int64)
    # decorrelate from the points fixture (same _lonlat streams keyed by
    # index would pin every point exactly onto a segment endpoint)
    x1, y1 = _lonlat(idx + np.int64(777_000_003))
    ang = _u(idx, 61) * 2.0 * np.pi
    ln = 0.0003 + _u(idx, 62) * 0.0022
    x2 = x1 + np.cos(ang) * ln
    y2 = y1 + np.sin(ang) * ln
    return pa.table({"way_id": pa.array(idx, pa.int64()),
                     "x1": pa.array(x1, pa.float64()),
                     "y1": pa.array(y1, pa.float64()),
                     "x2": pa.array(x2, pa.float64()),
                     "y2": pa.array(y2, pa.float64())})


def synth_segments_dataset(n: int, block_rows: int = 500_000):
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return gen_segments_table(int(ids[0]), len(ids))

    return (rd.range(n, override_num_blocks=max(1, n // block_rows))
            .map_batches(gen, batch_format="pyarrow", batch_size=block_rows))


def materialize_fixture(kind: str, n: int, root: str = "/tmp/graft_synth") -> str:
    """Generate-and-cache a fixture as partitioned parquet under /tmp;
    returns the directory. Skips generation when the cache exists
    (resumable-output pattern: the write goes to a temp dir, then rename)."""
    out = os.path.join(root, f"{kind}_n{n}_seed{SEED}")
    if os.path.isdir(out) and os.listdir(out):
        return out
    tmp = out + ".tmp"
    if os.path.isdir(tmp):
        import shutil
        shutil.rmtree(tmp)
    ds = {"images": synth_images_dataset,
          "geo": synth_geo_dataset,
          "points": synth_points_dataset,
          "segments": synth_segments_dataset}[kind](n)
    ds.write_parquet(tmp)
    os.rename(tmp, out)
    return out


def attach_lonlat(batch: pa.Table, id_col: str = "image_id") -> pa.Table:
    """M12 geotag attach, derivation form: lon/lat recomputed from the row
    index encoded in the id (synthetic data is a pure function of index, so
    the sidecar join is optional — SURVEY.md §2 M12)."""
    import pyarrow.compute as pc
    idx = pc.cast(pc.utf8_slice_codeunits(batch[id_col], 3, 15), pa.int64()).to_numpy()
    lon, lat = _lonlat(idx)
    return (batch.append_column("lon", pa.array(lon, pa.float64()))
                 .append_column("lat", pa.array(lat, pa.float64())))
