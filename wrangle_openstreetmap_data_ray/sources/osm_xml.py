"""OSM XML conformance reader — the reference's input format.

The reference streams one OSM XML file with
``xml.etree.cElementTree.iterparse`` ([R:mapparser.py::count_tags],
[R:data.py::process_map] — SURVEY.md §2 S1). At engine scale the XML is
pre-flattened once into relational Arrow tables (nodes / ways / way_nodes /
tags) and all downstream stages read parquet; this module is that one-time
flattening pass plus a small systematic sampler ([R:sample.py] S4).

For inputs that are a directory of many ``.osm`` shards the flattening runs
as a Ray pipeline (``read_osm_dir``): one task per file via
``read_binary_files`` → ``flat_map`` to element tables. A single huge XML
file cannot be byte-range sharded safely (elements span ranges), so the
scale path is "shard at export time", which is how planet dumps are
distributed anyway.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from ..schemas import NODES, TAGS, WAY_NODES, WAYS

CREATED = ["version", "changeset", "timestamp", "user", "uid"]  # [R:data.py::CREATED]


def parse_osm_bytes(data: bytes):
    """One OSM XML payload → (nodes, ways, way_nodes, tags) Arrow tables.

    Mirrors iterparse semantics: only <node>/<way> top-level elements are
    consumed ([R:data.py::shape_element] processes exactly these two).
    """
    nodes = {k: [] for k in ("id", "lat", "lon", "version", "changeset", "timestamp", "user", "uid")}
    ways = {k: [] for k in ("id", "version", "changeset", "timestamp", "user", "uid")}
    way_nodes = {"way_id": [], "node_id": [], "position": []}
    tags = {"elem_kind": [], "elem_id": [], "key": [], "value": []}

    def _meta(dst, a):
        dst["version"].append(a.get("version"))
        dst["changeset"].append(a.get("changeset"))
        ts = a.get("timestamp")
        dst["timestamp"].append(np.datetime64(ts.rstrip("Z"), "us") if ts else None)
        dst["user"].append(a.get("user"))
        dst["uid"].append(int(a["uid"]) if a.get("uid") else None)

    def _tags(kind, eid, elem):
        for t in elem.findall("tag"):
            tags["elem_kind"].append(kind)
            tags["elem_id"].append(eid)
            tags["key"].append(t.get("k"))
            tags["value"].append(t.get("v"))

    root = ET.fromstring(data)
    for elem in root:
        a = elem.attrib
        if elem.tag == "node":
            eid = int(a["id"])
            nodes["id"].append(eid)
            nodes["lat"].append(float(a["lat"]))
            nodes["lon"].append(float(a["lon"]))
            _meta(nodes, a)
            _tags("node", eid, elem)
        elif elem.tag == "way":
            eid = int(a["id"])
            ways["id"].append(eid)
            _meta(ways, a)
            for pos, nd in enumerate(elem.findall("nd")):
                way_nodes["way_id"].append(eid)
                way_nodes["node_id"].append(int(nd.get("ref")))
                way_nodes["position"].append(pos)
            _tags("way", eid, elem)
    nt = pa.table({**nodes, "timestamp": pa.array(nodes["timestamp"], pa.timestamp("us"))},
                  schema=NODES)
    wt = pa.table({**ways, "timestamp": pa.array(ways["timestamp"], pa.timestamp("us"))},
                  schema=WAYS)
    wnt = pa.table({k: pa.array(v, WAY_NODES.field(k).type) for k, v in way_nodes.items()},
                   schema=WAY_NODES)
    tt = pa.table(tags, schema=TAGS)
    return nt, wt, wnt, tt


def count_tags_bytes(data: bytes) -> dict[str, int]:
    """[R:mapparser.py::count_tags] — tag-name histogram of one XML payload."""
    counts: dict[str, int] = {}
    for _, elem in ET.iterparse(__import__("io").BytesIO(data)):
        counts[elem.tag] = counts.get(elem.tag, 0) + 1
    return counts


def write_osm_xml(nodes: pa.Table, ways: pa.Table, way_nodes: pa.Table,
                  tags: pa.Table) -> bytes:
    """Inverse of parse_osm_bytes — used to build conformance fixtures."""
    out = ["<?xml version='1.0' encoding='UTF-8'?>", "<osm version=\"0.6\">"]

    def esc(s):
        return (str(s).replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;").replace('"', "&quot;"))

    tag_by_elem: dict[tuple[str, int], list[tuple[str, str]]] = {}
    for r in tags.to_pylist():
        tag_by_elem.setdefault((r["elem_kind"], r["elem_id"]), []).append((r["key"], r["value"]))
    refs_by_way: dict[int, list[int]] = {}
    for r in way_nodes.to_pylist():
        refs_by_way.setdefault(r["way_id"], []).append((r["position"], r["node_id"]))

    for r in nodes.to_pylist():
        ts = r["timestamp"].isoformat() + "Z" if r["timestamp"] else ""
        out.append(
            f'<node id="{r["id"]}" lat="{r["lat"]}" lon="{r["lon"]}" version="{esc(r["version"])}" '
            f'changeset="{esc(r["changeset"])}" timestamp="{ts}" user="{esc(r["user"])}" uid="{r["uid"]}">')
        for k, v in tag_by_elem.get(("node", r["id"]), []):
            out.append(f'  <tag k="{esc(k)}" v="{esc(v)}"/>')
        out.append("</node>")
    for r in ways.to_pylist():
        ts = r["timestamp"].isoformat() + "Z" if r["timestamp"] else ""
        out.append(
            f'<way id="{r["id"]}" version="{esc(r["version"])}" changeset="{esc(r["changeset"])}" '
            f'timestamp="{ts}" user="{esc(r["user"])}" uid="{r["uid"]}">')
        for _, ref in sorted(refs_by_way.get(r["id"], [])):
            out.append(f'  <nd ref="{ref}"/>')
        for k, v in tag_by_elem.get(("way", r["id"]), []):
            out.append(f'  <tag k="{esc(k)}" v="{esc(v)}"/>')
        out.append("</way>")
    out.append("</osm>")
    return "\n".join(out).encode("utf-8")


def read_osm_dir(path: str):
    """Directory of .osm shards → dict of four Datasets, flattened in
    parallel (one task per shard). Returns {"nodes": ds, "ways": ds,
    "way_nodes": ds, "tags": ds}."""
    import ray.data as rd

    raw = rd.read_binary_files(path, file_extensions=["osm", "xml"])

    def _part(which: int):
        def fn(batch: pa.Table) -> pa.Table:
            tabs = [parse_osm_bytes(b.as_py()) for b in batch["bytes"]]
            return pa.concat_tables([t[which] for t in tabs])
        return fn

    return {
        "nodes": raw.map_batches(_part(0), batch_format="pyarrow"),
        "ways": raw.map_batches(_part(1), batch_format="pyarrow"),
        "way_nodes": raw.map_batches(_part(2), batch_format="pyarrow"),
        "tags": raw.map_batches(_part(3), batch_format="pyarrow"),
    }


def _strip_nulls(obj):
    """Drop None-valued keys recursively — the reference's shaped dicts
    simply lack absent fields (no ``address`` key when an element has no
    addr tags), so the JSONL must too."""
    if isinstance(obj, dict):
        return {k: _strip_nulls(v) for k, v in obj.items() if v is not None}
    if isinstance(obj, list):
        return [_strip_nulls(v) for v in obj]
    return obj


def write_jsonl_docs(ds, out_dir: str) -> int:
    """[R:data.py::process_map] S2 — the JSONL sink: one JSON document per
    line, absent (null) fields omitted, one file per block written
    tmp+rename. Returns total rows written. Streams through map_batches —
    only per-fragment row counts reach the driver.

    Fragment names derive from the serialized block CONTENT, so re-running
    the same deterministic pipeline into the same ``out_dir`` overwrites
    each fragment in place instead of appending a duplicate copy
    (idempotent re-runs). Caveats: a re-run at a different parallelism may
    produce a different fragment set (stale fragments from the old
    partitioning survive — use a fresh dir when changing parallelism), and
    two blocks with byte-identical content coalesce into one fragment."""
    import hashlib
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        payload = "".join(json.dumps(_strip_nulls(r), default=str) + "\n"
                          for r in batch.to_pylist()).encode()
        name = f"docs-{hashlib.sha256(payload).hexdigest()[:20]}.jsonl"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    meta = ds.map_batches(write_block, batch_format="pyarrow",
                          batch_size=None)
    return int(sum(r["rows"] for r in meta.take_all()))


def systematic_sample(ds, k: int, id_col: str = "id"):
    """[R:sample.py] S4 — deterministic every-k-th-element sample, expressed
    as a vectorized modulo filter on the stable id (order-independent, unlike
    the reference's positional k-th which doesn't survive parallel reads)."""
    def filt(batch: pa.Table) -> pa.Table:
        col = batch[id_col]
        if pa.types.is_integer(col.type):
            mask = pa.array(col.to_numpy(zero_copy_only=False) % k == 0)
        else:
            from ..functions.hashing import hash64_str_array
            h = hash64_str_array(col.to_pylist())
            mask = pa.array((h % np.uint64(k)) == 0)
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")
