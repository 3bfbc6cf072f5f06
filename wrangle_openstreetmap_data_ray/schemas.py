"""Explicit Arrow schemas for every engine table (SURVEY.md §1.2).

The reference has no declared schema (MongoDB dynamic docs,
[R:data.py::shape_element]); the engine declares everything here once.
"""

from __future__ import annotations

import pyarrow as pa

# F1 — primary payload table, exactly BASELINE.json:input_hint.
IMAGES = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])

# F2 — geotag sidecar, joined to IMAGES on image_id (J2).
GEO = pa.schema([
    ("image_id", pa.string()),
    ("lon", pa.float64()),
    ("lat", pa.float64()),
    ("addr_street", pa.string()),
    ("addr_postcode", pa.string()),
])

# F3 — OSM-like admin/neighborhood polygons.
POLYGONS = pa.schema([
    ("polygon_id", pa.string()),
    ("name", pa.string()),
    ("kind", pa.string()),
    ("ring", pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))),
    ("bbox_w", pa.float64()),
    ("bbox_s", pa.float64()),
    ("bbox_e", pa.float64()),
    ("bbox_n", pa.float64()),
])

# F4 — flattened OSM element tables (reference data model, SURVEY.md §1.1).
NODES = pa.schema([
    ("id", pa.int64()),
    ("lat", pa.float64()),
    ("lon", pa.float64()),
    ("version", pa.string()),
    ("changeset", pa.string()),
    ("timestamp", pa.timestamp("us")),
    ("user", pa.string()),
    ("uid", pa.int64()),
])

WAYS = pa.schema([
    ("id", pa.int64()),
    ("version", pa.string()),
    ("changeset", pa.string()),
    ("timestamp", pa.timestamp("us")),
    ("user", pa.string()),
    ("uid", pa.int64()),
])

WAY_NODES = pa.schema([
    ("way_id", pa.int64()),
    ("node_id", pa.int64()),
    ("position", pa.int32()),   # order-significant ([R:data.py] node_refs)
])

TAGS = pa.schema([
    ("elem_kind", pa.string()),  # "node" | "way"
    ("elem_id", pa.int64()),
    ("key", pa.string()),
    ("value", pa.string()),
])

# Output of the shape stage (M8) — the reference's nested JSON document,
# as explicit Arrow struct columns.
SHAPED = pa.schema([
    ("id", pa.string()),
    ("type", pa.string()),
    ("pos", pa.list_(pa.float64(), 2)),
    ("created", pa.struct([
        ("version", pa.string()), ("changeset", pa.string()),
        ("timestamp", pa.string()), ("user", pa.string()), ("uid", pa.string()),
    ])),
    ("address", pa.struct([
        ("housenumber", pa.string()), ("postcode", pa.string()), ("street", pa.string()),
    ])),
    ("node_refs", pa.list_(pa.string())),
])

# Tile sink output (T3).
TILES = pa.schema([
    ("tile_id", pa.int64()),
    ("tile_x", pa.int64()),
    ("tile_y", pa.int64()),
    ("res", pa.int32()),
    ("n_images", pa.int64()),
    ("png", pa.binary()),
])
