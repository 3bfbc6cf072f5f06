"""The flagship pipeline (E2 generalized per BASELINE.json:north_star):

images ⋈ geo → caption normalize (M5/M11) → postcode clean (M6) + bbox
flag (M7) → cell encode (M13) → point-in-polygon attach (J3, broadcast
polygon index actor pool) → Lance-like checkpoint with per-fragment row
counts → per-polygon summary.

Everything streams: the only materialized results are the (small)
summary and the write-stage fragment metadata rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import geo, normalize
from ..sources import lancelike
from ..stages import pip_join
from ..util import broadcast_inner_join
from . import fixtures as fx

CELL_RES = 12
TILE_RES = 10     # same grid the registry's tile queries pin


def clean_and_encode(batch: pa.Table) -> pa.Table:
    """Stateless per-batch kernel: normalize caption + street, clean
    postcode, bbox flag, cell id — all vectorized Arrow/numpy."""
    lon = batch["lon"].to_numpy()
    lat = batch["lat"].to_numpy()
    out = batch.drop_columns(["addr_street", "addr_postcode", "caption"])
    out = out.append_column("caption_norm",
                            normalize.normalize_street(batch["caption"]))
    out = out.append_column("street_norm",
                            normalize.normalize_street(batch["addr_street"]))
    out = out.append_column("postcode_clean",
                            normalize.clean_postcode(batch["addr_postcode"]))
    out = out.append_column("in_bbox", pa.array(geo.bbox_contains(lon, lat)))
    out = out.append_column(
        "cell", pa.array(geo.cell_encode(lon, lat, CELL_RES), pa.int64()))
    return out


def flagship(sf_dir: str, out_root: str | None = None):
    """Returns the per-polygon summary Dataset (small)."""
    imgs = fx.read_fixture(sf_dir, "images",
                           columns=["image_id", "caption", "phash"])
    g = fx.read_fixture(sf_dir, "geo")
    # geo is a unique-keyed dimension side: broadcast-attach map-side
    # (capped, hash-join fallback past 2M rows) — no join shuffle at all
    joined = broadcast_inner_join(imgs, g, "image_id")
    cleaned = joined.map_batches(clean_and_encode, batch_format="pyarrow")

    import pyarrow.parquet as pq
    polys = pq.read_table(fx.fixture_path(sf_dir, "polygons"))
    located = pip_join.pip_join(
        cleaned, polys,
        keep_cols=["image_id", "caption_norm", "street_norm",
                   "postcode_clean", "in_bbox", "cell"])

    if out_root:
        # fingerprint the SOURCE tables so a changed fixture invalidates
        # the checkpoint (resume must not serve stale data)
        fp = lancelike.input_fingerprint(g)
        lancelike.write_dataset(located, out_root, stage="flagship",
                                parent=fx.sf_tag(sf_dir), fingerprint=fp)
        located = lancelike.read_dataset(out_root)

    from ..util import grouped_agg_vec

    def to_flags(b: pa.Table) -> pa.Table:
        return pa.table({
            "polygon_id": b["polygon_id"],
            "valid_pc": pc.cast(pc.is_valid(b["postcode_clean"]), pa.int64()),
            "in_bb": pc.cast(b["in_bbox"], pa.int64()),
        })

    # vectorized map-side combiner: the plain ray aggregate row-walks
    # the per-image rows in Python (NOTES_r4); partials are
    # polygon-bounded
    return grouped_agg_vec(
        located.map_batches(to_flags, batch_format="pyarrow"),
        ["polygon_id"],
        [(None, "count", "n_images"),
         ("valid_pc", "sum", "n_valid_postcode"),
         ("in_bb", "sum", "n_in_bbox")])


def flagship_full(sf_dir: str, out_root: str | None = None,
                  knn_res: int = 11, k: int = 3):
    """The COMPLETE north-star lifecycle in one pipeline (SURVEY §3 graft
    flagship): images ⋈ geo → clean/normalize/cell-encode → exact dedup
    by phash → Lance-like checkpoint (optional) → fan-out: PIP polygon
    attach, exact kNN, per-tile render. Returns ONE summary row whose
    every count has an independent SQL twin — the whole composition is
    value-hash-pinned end-to-end, not just its stages.
    """
    import pandas as pd

    from ..stages import dedup, knn, tiles
    imgs = fx.read_fixture(sf_dir, "images")
    g = fx.read_fixture(sf_dir, "geo")
    # full image rows carry `bytes` — broadcast the narrow geo side so
    # the payload column never crosses a join shuffle
    joined = broadcast_inner_join(imgs, g, "image_id")

    def clean_plus(batch: pa.Table) -> pa.Table:
        out = clean_and_encode(batch)
        changed = pc.cast(
            pc.not_equal(normalize.normalize_street(batch["caption"]),
                         batch["caption"]), pa.int64())
        return out.append_column("caption_changed", changed)

    cleaned = joined.map_batches(clean_plus, batch_format="pyarrow")
    deduped = dedup.exact_dedup(cleaned, "phash", "image_id")
    if out_root:
        fp = lancelike.input_fingerprint(g)
        lancelike.write_dataset(deduped, out_root, stage="flagship_full",
                                parent=fx.sf_tag(sf_dir), fingerprint=fp)
        deduped = lancelike.read_dataset(out_root)
    else:
        deduped = deduped.materialize()   # fans out to 4 consumers

    n_images = imgs.count()
    n_kept = deduped.count()

    import pyarrow.parquet as pq
    polys = pq.read_table(fx.fixture_path(sf_dir, "polygons"))
    n_pip_pairs = pip_join.pip_join(
        deduped, polys, keep_cols=["image_id"]).count()
    n_knn_pairs = knn.knn_join(
        deduped.select_columns(["image_id", "lon", "lat"]),
        k=k, res=knn_res, id_col="image_id", exact=True).count()
    n_tiles = tiles.render_tiles(deduped, tile_res=TILE_RES).count()
    n_caption_changed = int(deduped.map_batches(
        lambda b: pa.table({"s": pa.array(
            [int(pc.sum(b["caption_changed"]).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow").to_pandas()["s"].sum())

    return pd.DataFrame({
        "n_images": [int(n_images)], "n_kept": [int(n_kept)],
        "n_pip_pairs": [int(n_pip_pairs)],
        "n_knn_pairs": [int(n_knn_pairs)], "n_tiles": [int(n_tiles)],
        "n_caption_changed": [n_caption_changed],
    })
