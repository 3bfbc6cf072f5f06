"""Document shaping (M8/M9) — the reference's ``shape_element`` as a
vectorized Arrow transform.

[R:data.py::shape_element] (SURVEY.md §1.1/§2 M8): only node/way elements;
``CREATED`` attrs nest under a ``created`` struct; lat/lon become a 2-float
``pos`` array; single-colon ``addr:X`` tags nest under ``address``
(two-colon keys skipped); problem-char keys dropped; way ``<nd>`` refs →
ordered ``node_refs`` string list.

Engine form: elements arrive as the flattened tables (nodes/ways +
way_nodes + tags); shaping = a tag pivot (groupby elem_id inside the batch
— tags tables are pre-bucketed by elem_id hash so each element's tags are
co-located) + struct assembly. Output schema = schemas.SHAPED.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .normalize import clean_postcode, normalize_street, problem_key_mask

CREATED = ["version", "changeset", "timestamp", "user", "uid"]  # [R:data.py::CREATED]


def pivot_address_tags(tags: pa.Table) -> pa.Table:
    """tags long table → one row per elem with housenumber/postcode/street.

    Drops problem-char keys (M3) and two-colon keys ([R:data.py] skip rule),
    normalizes street (M5) and postcode (M6) in the same pass.
    """
    keys = tags["key"]
    single_addr = pc.match_substring_regex(keys, r"^addr:[a-z_]+$")
    keep = pc.and_(single_addr, pc.invert(problem_key_mask(keys)))
    t = tags.filter(keep)
    sub = pc.utf8_slice_codeunits(t["key"], 5, 32)  # strip "addr:"
    vals = t["value"]
    street_mask = pc.equal(sub, "street")
    post_mask = pc.equal(sub, "postcode")
    house_mask = pc.equal(sub, "housenumber")
    out = pa.table({
        "elem_kind": t["elem_kind"],
        "elem_id": t["elem_id"],
        "housenumber": pc.if_else(house_mask, vals, None),
        "postcode": pc.if_else(post_mask, clean_postcode(vals), None),
        "street": pc.if_else(street_mask, normalize_street(vals), None),
    })
    # collapse to one row per element: groupby within the batch
    df = out.to_pandas()
    agg = df.groupby(["elem_kind", "elem_id"], sort=False).agg(
        {"housenumber": "first", "postcode": "first", "street": "first"}).reset_index()
    return pa.Table.from_pandas(agg, preserve_index=False)


def shape_nodes_batch(batch: pa.Table) -> pa.Table:
    """nodes table batch → SHAPED rows (address attached separately)."""
    n = batch.num_rows
    created = pa.StructArray.from_arrays(
        [pc.cast(batch[c], pa.string()) for c in CREATED], CREATED)
    pos = pa.FixedSizeListArray.from_arrays(
        pa.array(np.column_stack([batch["lat"].to_numpy(),
                                  batch["lon"].to_numpy()]).ravel()), 2)
    return pa.table({
        "id": pc.cast(batch["id"], pa.string()),
        "type": pa.array(["node"] * n),
        "pos": pos,
        "created": created,
    })


def shape_ways_batch(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    created = pa.StructArray.from_arrays(
        [pc.cast(batch[c], pa.string()) for c in CREATED], CREATED)
    return pa.table({
        "id": pc.cast(batch["id"], pa.string()),
        "type": pa.array(["way"] * n),
        "created": created,
    })
