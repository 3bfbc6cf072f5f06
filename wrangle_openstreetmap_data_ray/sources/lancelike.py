"""Minimal Lance-like table format: parquet fragments + versioned JSON
manifest with per-fragment row counts and stage lineage.

Replaces the reference's MongoDB sink ([R:notebook::get_db] /
``mongoimport`` of the JSONL written by [R:data.py::process_map] — SURVEY.md
§2 S2/S3/S5) with the checkpointed layout BASELINE.json:north_rule demands:
*"every stage checkpoints per-partition lineage + row-count metrics ... so
jobs resume mid-shuffle"*.

Layout::

    <root>/
      fragments/frag-<task>-<uuid>.parquet     # one per output block
      _manifest/manifest-v<N>.json             # committed versions, ascending

Manifest schema::

    {"version": N, "stage": str, "parent": str|None, "committed_at": iso,
     "fragments": [{"path": rel, "rows": int, "bytes": int}],
     "total_rows": int, "metrics": {...}}

Write protocol (idempotent / resumable):
1. Each Ray write task writes its block to ``fragments/`` under a temp name
   and atomically renames — a crashed task leaves only ``*.tmp`` garbage.
2. The driver collects per-fragment metadata **as the output rows of the
   write stage** (so the write itself streams through Ray Data with
   backpressure — no driver-side data movement) and commits a new manifest
   version LAST. A run that dies before commit is invisible to readers.
3. ``resume``: if the target already has a committed manifest for the same
   ``stage`` + ``parent`` lineage, the write is skipped entirely.

At 100 TB scale each fragment is one ~64-128 MB block, the manifest holds
O(#fragments) small dicts, and readers prune by fragment row counts.
"""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

_MANIFEST_DIR = "_manifest"
_FRAGMENT_DIR = "fragments"
_TOMBSTONE_DIR = "_tombstones"


def _manifest_paths(root: str) -> list[str]:
    mdir = os.path.join(root, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    files = [f for f in os.listdir(mdir) if f.startswith("manifest-v") and f.endswith(".json")]
    return [os.path.join(mdir, f) for f in
            sorted(files, key=lambda f: int(f[len("manifest-v"):-len(".json")]))]


def latest_manifest(root: str) -> dict | None:
    paths = _manifest_paths(root)
    if not paths:
        return None
    with open(paths[-1]) as f:
        return json.load(f)


def input_fingerprint(ds) -> str:
    """Cheap lineage fingerprint of a Dataset INPUT: schema names/types +
    input-file identity (paths, sizes) where the plan exposes them. Used
    by the resume check so a checkpoint is only reused when it was built
    from the same-looking input — not merely the same (stage, parent)
    label (round-1 review: a manifest from an older fixture silently
    served stale data)."""
    import hashlib
    sch = ds.schema()
    parts = [",".join(sch.names), ",".join(str(t) for t in sch.types)]
    try:
        files = ds.input_files() or []
        for p in sorted(files):
            try:
                parts.append(f"{p}:{os.path.getsize(p)}")
            except OSError:
                parts.append(p)
    except Exception:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def _resume_ok(root: str, prev: dict | None, stage: str, parent: str | None,
               fingerprint: str | None) -> bool:
    """A committed manifest is reusable only if stage+parent+fingerprint
    all match AND every fragment file it references still exists."""
    if not prev or prev["stage"] != stage or prev.get("parent") != parent:
        return False
    if prev.get("fingerprint") != fingerprint:
        return False
    return all(os.path.exists(os.path.join(root, f["path"]))
               for f in prev["fragments"])


def _commit(root: str, stage: str, parent: str | None,
            fragments: list[dict], metrics: dict | None,
            fingerprint: str | None = None,
            tombstones: list[dict] | None = None,
            schema_edits="inherit") -> dict:
    prev = latest_manifest(root)
    if schema_edits == "inherit":
        # metadata-only verbs (analyze, tags) must not silently CLEAR a
        # pending rename/drop — edits carry forward until materialized
        schema_edits = (prev or {}).get("schema_edits")
    version = (prev["version"] + 1) if prev else 1
    man = {
        "version": version,
        "stage": stage,
        "parent": parent,
        "fingerprint": fingerprint,
        "committed_at": datetime.now(timezone.utc).isoformat(),
        "fragments": fragments,
        "total_rows": int(sum(f["rows"] for f in fragments)),
        "metrics": metrics or {},
    }
    if tombstones:
        man["tombstones"] = tombstones
    if schema_edits:
        man["schema_edits"] = schema_edits
    mdir = os.path.join(root, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".manifest-v{version}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, os.path.join(mdir, f"manifest-v{version}.json"))
    return man


def _require_no_tombstones(man: dict, verb: str) -> None:
    """CoW mutators must not silently DROP merge-on-read tombstones (a
    fresh manifest without the tombstone list would resurrect deleted
    rows). Materialize them first via ``apply_tombstones``."""
    if man.get("tombstones"):
        raise ValueError(
            f"{verb} refused: the latest version carries merge-on-read "
            f"tombstones; run apply_tombstones() first")


def _schema_state(man: dict) -> tuple[dict, set]:
    """Pending metadata-only schema edits: ({disk_name: visible_name},
    {dropped disk names}). Empty when the schema is materialized."""
    e = (man or {}).get("schema_edits") or {}
    return dict(e.get("renames") or {}), set(e.get("dropped") or [])


def _to_disk(man: dict, col: str) -> str:
    """Translate a VISIBLE column name to its on-disk name (fragment
    footers, zone maps and blooms are keyed by disk names)."""
    renames, dropped = _schema_state(man)
    inverse = {v: d for d, v in renames.items()}
    if col in inverse:
        return inverse[col]
    if col in dropped or col in renames:
        raise KeyError(f"column {col!r} does not exist in the current "
                       f"schema (dropped or renamed)")
    return col


def _require_schema_clean(man: dict, verb: str) -> None:
    """Data-rewriting verbs refuse while metadata-only renames/drops are
    pending (their kernels, zone maps and postings address DISK column
    names); run ``materialize_schema()`` first — the exact mirror of the
    merge-on-read tombstone rule."""
    if man.get("schema_edits"):
        raise ValueError(
            f"{verb} refused: the latest version carries pending "
            f"schema edits; run materialize_schema() first")


_VCOUNT_CARD_CAP = 256      # per-fragment distinct cap for count_cols
_BLOOM_BITS = 8192          # 1 KiB bitmap per fragment per bloom column
_BLOOM_K = 4                # probe positions per key (13 bits each from h)
_BLOOM_SEED = 0xB100F17


def _bloom_positions(vals) -> "list":
    """k probe positions per value, all derived from ONE splitmix64 hash
    (13 low bits per probe — 52 of the 64 bits consumed)."""
    import numpy as np
    from ..functions.hashing import hash64_ints
    h = hash64_ints(vals, seed=_BLOOM_SEED)
    return [((h >> np.uint64(13 * j)) & np.uint64(_BLOOM_BITS - 1))
            .astype(np.int64) for j in range(_BLOOM_K)]


def _bloom_build(vals) -> str:
    """Hex-encoded _BLOOM_BITS-bit bloom over an integer array (nulls must
    be dropped by the caller — a NULL key cannot be point-got)."""
    import numpy as np
    bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for pos in _bloom_positions(vals):
        np.bitwise_or.at(bits, pos >> 3,
                         np.left_shift(np.uint8(1),
                                       (pos & 7).astype(np.uint8)))
    return bits.tobytes().hex()


def _bloom_any_hit(hexmap: str, keys) -> bool:
    """True iff ANY key is possibly present (all k probe bits set)."""
    import numpy as np
    bits = np.frombuffer(bytes.fromhex(hexmap), dtype=np.uint8)
    hit = np.ones(len(keys), dtype=bool)
    for pos in _bloom_positions(keys):
        hit &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
    return bool(hit.any())


def _fragment_meta(batch: pa.Table, zonemap_cols, bloom_cols,
                   count_cols=None):
    """(zonemap dict, bloom dict) for one fragment's rows — THE one
    definition of fragment pruning metadata, shared by _FragmentWriter
    and every mutator that rewrites fragments (compact, merge probe,
    add_column), so maintenance never silently drops pruning power."""
    import pyarrow.compute as pc
    import pyarrow.types as pat
    zm, bl = {}, {}
    for c in zonemap_cols or []:
        if c not in batch.column_names:
            continue
        typ = batch.schema.field(c).type
        if not (pat.is_integer(typ) or pat.is_floating(typ)):
            raise ValueError(
                f"zonemap_cols supports numeric columns only; {c!r} "
                f"is {typ} (cast timestamps to epoch integers first)")
        if batch.num_rows:
            mm = pc.min_max(batch[c]).as_py()
            if mm["min"] is not None:
                zm[c] = [mm["min"], mm["max"]]
    for c in bloom_cols or []:
        if c not in batch.column_names:
            continue
        typ = batch.schema.field(c).type
        if not pat.is_integer(typ):
            raise ValueError(
                f"bloom_cols supports integer key columns only; {c!r} "
                f"is {typ}")
        if batch.num_rows:
            vals = batch[c].drop_null().to_numpy()
            if len(vals):
                bl[c] = _bloom_build(vals)
    vc = {}
    for c in count_cols or []:
        if c not in batch.column_names:
            continue
        if batch.num_rows:
            vcs = pc.value_counts(batch[c].combine_chunks()
                                  if isinstance(batch[c], pa.ChunkedArray)
                                  else batch[c])
            vals = vcs.field("values").to_pylist()
            cnts = vcs.field("counts").to_pylist()
            pairs = [(v, n) for v, n in zip(vals, cnts) if v is not None]
            if len(pairs) > _VCOUNT_CARD_CAP:
                raise ValueError(
                    f"count_cols supports low-cardinality columns only; "
                    f"{c!r} has {len(pairs)} distinct values in one "
                    f"fragment (cap {_VCOUNT_CARD_CAP})")
            if pairs:
                vc[c] = [[v for v, _ in pairs], [int(n) for _, n in pairs]]
    return zm, bl, vc


def _manifest_pruning_cols(man: dict) -> tuple:
    """(zonemap cols, bloom cols) already present in a manifest — the
    defaults every full/partial rewrite preserves."""
    zs, bs, cs = [], [], []
    for f in man["fragments"]:
        for c in f.get("zonemap", {}):
            if c not in zs:
                zs.append(c)
        for c in f.get("bloom", {}):
            if c not in bs:
                bs.append(c)
        for c in f.get("vcounts", {}):
            if c not in cs:
                cs.append(c)
    return (zs or None), (bs or None), (cs or None)


class _FragmentWriter:
    """map_batches callable: writes each batch as one fragment, returns a
    one-row metadata table (streams through the pipeline; no driver I/O).

    ``zonemap_cols``: NUMERIC columns whose per-fragment min/max are
    recorded in the manifest (the Lance/parquet zone-map pattern) so range
    reads can prune fragments from metadata alone. Non-numeric columns are
    rejected at write time (JSON round-trips strings/timestamps into
    values the pruner cannot order against query bounds — review finding);
    zone-map a timestamp by materializing an epoch-integer column.
    All-null fragments record no entry (conservatively kept by reads).

    ``bloom_cols``: INTEGER key columns that additionally record a
    per-fragment bloom filter (fixed 1 KiB bitmap, k=4 splitmix64 probes)
    in the manifest, so POINT lookups prune fragments even when the data
    is not sorted by the key (where zone maps cannot help). No false
    negatives: a key present in the fragment always tests positive."""

    def __init__(self, frag_dir: str, zonemap_cols: list[str] | None = None,
                 bloom_cols: list[str] | None = None,
                 count_cols: list[str] | None = None):
        self.frag_dir = frag_dir
        self.zonemap_cols = zonemap_cols or []
        self.bloom_cols = bloom_cols or []
        self.count_cols = count_cols or []

    def __call__(self, batch: pa.Table) -> pa.Table:
        name = f"frag-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(self.frag_dir, f".{name}.tmp")
        pq.write_table(batch, tmp, compression="zstd")
        final = os.path.join(self.frag_dir, name)
        os.replace(tmp, final)
        # strict-column check: a write-path col missing from the batch is
        # a caller error (rewrite paths pass cols filtered to the schema)
        for c in (list(self.zonemap_cols) + list(self.bloom_cols)
                  + list(self.count_cols)):
            if c not in batch.column_names:
                raise KeyError(f"metadata column {c!r} not in batch")
        zm, bl, vc = _fragment_meta(batch, self.zonemap_cols,
                                    self.bloom_cols, self.count_cols)
        return pa.table({
            "path": [os.path.join(_FRAGMENT_DIR, name)],
            "rows": pa.array([batch.num_rows], pa.int64()),
            "bytes": pa.array([os.path.getsize(final)], pa.int64()),
            "zonemap": pa.array([json.dumps(zm, default=str)], pa.string()),
            "bloom": pa.array([json.dumps(bl)], pa.string()),
            "vcounts": pa.array([json.dumps(vc)], pa.string()),
        })


def write_dataset(ds, root: str, stage: str, parent: str | None = None,
                  metrics: dict | None = None, resume: bool = True,
                  fingerprint: str | None = None,
                  zonemap_cols: list[str] | None = None,
                  bloom_cols: list[str] | None = None,
                  count_cols: list[str] | None = None) -> dict:
    """Write a ``ray.data.Dataset`` as a new committed version of ``root``.

    Returns the committed manifest. If ``resume`` and the latest committed
    manifest records this (stage, parent, fingerprint) AND its fragment
    files all still exist, the write is skipped and the existing manifest
    returned — the checkpoint/restart contract. Pass
    ``fingerprint=input_fingerprint(source_ds)`` so a changed input
    invalidates the checkpoint instead of silently serving stale data.
    """
    if resume and _resume_ok(root, latest_manifest(root), stage, parent,
                             fingerprint):
        return latest_manifest(root)
    frag_dir = os.path.join(root, _FRAGMENT_DIR)
    os.makedirs(frag_dir, exist_ok=True)
    meta = ds.map_batches(_FragmentWriter(frag_dir, zonemap_cols,
                                          bloom_cols, count_cols),
                          batch_format="pyarrow",
                          batch_size=None)  # one fragment per input block
    frags = []
    for r in meta.take_all():
        f = {"path": r["path"], "rows": int(r["rows"]),
             "bytes": int(r["bytes"])}
        zm = json.loads(r.get("zonemap") or "{}")
        if zm:
            f["zonemap"] = zm
        bl = json.loads(r.get("bloom") or "{}")
        if bl:
            f["bloom"] = bl
        vc = json.loads(r.get("vcounts") or "{}")
        if vc:
            f["vcounts"] = vc
        frags.append(f)
    # a full overwrite defines its own schema: never inherit pending
    # renames/drops from the version being replaced
    return _commit(root, stage, parent, frags, metrics, fingerprint,
                   schema_edits=None)


def fragments_for_range(root: str, col: str, lo, hi,
                        version: int | None = None):
    """Fragment subset whose zone map OVERLAPS [lo, hi] (fragments with no
    zone map for ``col`` are conservatively kept). Metadata-only — nothing
    is read from data files. Returns (selected_fragments, total_count)."""
    if version is None:
        man = latest_manifest(root)
    else:
        with open(os.path.join(root, _MANIFEST_DIR,
                               f"manifest-v{version}.json")) as f:
            man = json.load(f)
    if man is None:
        raise FileNotFoundError(f"no committed manifest under {root}")
    col = _to_disk(man, col)     # zone maps are keyed by DISK names
    frags = man["fragments"]
    keep = []
    for f in frags:
        zm = f.get("zonemap", {}).get(col)
        # no map, or a null bound (all-null fragment written by an older
        # layout): conservatively keep — pruning must never drop rows
        if (zm is None or zm[0] is None or zm[1] is None
                or (zm[0] <= hi and lo <= zm[1])):
            keep.append(f)
    return keep, len(frags)


def read_dataset_range(root: str, col: str, lo, hi,
                       columns: list[str] | None = None,
                       version: int | None = None):
    """Range read with zone-map fragment pruning: only fragments whose
    [min, max] for ``col`` overlaps [lo, hi] are opened, then the exact
    inclusive-range filter is applied to the survivors (zones overlap —
    pruning is a superset guarantee, never a filter). Returns
    (Dataset, n_fragments_scanned, n_fragments_total)."""
    import pyarrow.compute as pc
    import ray.data as rd

    man = _manifest_at(root, version)
    keep, total = fragments_for_range(root, col, lo, hi, version)
    want = columns if columns is None else list(dict.fromkeys(columns + [col]))
    paths = [os.path.join(root, f["path"]) for f in keep]
    if not paths:
        return _empty_dataset_like(root, man, columns), 0, total
    ds = _read_fragments(root, man, paths, want)

    def exact(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b[col], lo), pc.less_equal(b[col], hi))
        out = b.filter(m)
        return out.select(columns) if columns is not None else out

    return ds.map_batches(exact, batch_format="pyarrow"), len(keep), total


def _empty_dataset_like(root: str, man: dict,
                        columns: list[str] | None):
    """Schema-preserving EMPTY Dataset for a pruned-to-nothing read (a
    zero-COLUMN dataset breaks downstream select/schema consumers —
    NOTES_r1): schema comes from any committed fragment's footer."""
    import ray.data as rd
    all_frags = (man or {}).get("fragments") or []
    if all_frags:
        schema = pq.read_schema(os.path.join(root, all_frags[0]["path"]))
        renames, dropped = _schema_state(man)
        if columns is not None:
            empty = pa.table({n: pa.array([], schema.field(
                _to_disk(man, n)).type) for n in columns})
        else:
            keep = [n for n in schema.names if n not in dropped]
            empty = pa.table({renames.get(n, n): pa.array(
                [], schema.field(n).type) for n in keep})
    else:
        empty = pa.table({})
    return rd.from_arrow(empty)


def _manifest_at(root: str, version: int | None) -> dict:
    if version is None:
        man = latest_manifest(root)
        if man is None:
            raise FileNotFoundError(f"no committed manifest under {root}")
        return man
    with open(os.path.join(root, _MANIFEST_DIR,
                           f"manifest-v{version}.json")) as f:
        return json.load(f)


def fragments_for_keys(root: str, col: str, keys,
                       version: int | None = None):
    """Fragment subset whose BLOOM filter possibly contains any of ``keys``
    (fragments with no bloom for ``col`` are conservatively kept; a
    fragment zone map for the same column additionally prunes keys fully
    outside its [min,max]). Metadata-only. Returns (selected, total)."""
    import numpy as np
    man = _manifest_at(root, version)
    col = _to_disk(man, col)     # blooms/zone maps are keyed by DISK names
    karr = np.asarray(list(keys), dtype=np.int64)
    frags = man["fragments"]
    keep = []
    for f in frags:
        if not len(karr):
            break
        if not f["rows"]:        # empty fragment cannot contain a key
            continue
        zm = f.get("zonemap", {}).get(col)
        kz = karr
        if zm is not None and zm[0] is not None and zm[1] is not None:
            kz = karr[(karr >= zm[0]) & (karr <= zm[1])]
            if not len(kz):
                continue
        bl = f.get("bloom", {}).get(col)
        if bl is None or _bloom_any_hit(bl, kz):
            keep.append(f)
    return keep, len(frags)


def read_dataset_keys(root: str, col: str, keys,
                      columns: list[str] | None = None,
                      version: int | None = None):
    """Point-lookup read with bloom-filter fragment pruning: only fragments
    whose bloom possibly contains one of ``keys`` are opened, then the
    exact ``col IN keys`` filter runs on the survivors (blooms admit false
    positives, never false negatives — pruning is a superset guarantee).
    Returns (Dataset, n_fragments_scanned, n_fragments_total)."""
    import pyarrow.compute as pc
    import ray.data as rd

    man = _manifest_at(root, version)
    keep, total = fragments_for_keys(root, col, keys, version)
    want = columns if columns is None else list(dict.fromkeys(columns + [col]))
    paths = [os.path.join(root, f["path"]) for f in keep]
    if not paths:
        return _empty_dataset_like(root, man, columns), 0, total
    ds = _read_fragments(root, man, paths, want)
    kset = pa.array(sorted(set(int(k) for k in keys)), pa.int64())

    def exact(b: pa.Table) -> pa.Table:
        out = b.filter(pc.is_in(pc.cast(b[col], pa.int64()), kset))
        return out.select(columns) if columns is not None else out

    return ds.map_batches(exact, batch_format="pyarrow"), len(keep), total


class _PartitionedFragmentWriter:
    """Like ``_FragmentWriter`` but splits each batch by a partition column
    (key-range/shard layout: ``fragments/<col>=<value>/frag-*.parquet``) so
    a failed run can resume per partition and readers can prune by it."""

    def __init__(self, frag_dir: str, partition_col: str):
        self.frag_dir = frag_dir
        self.col = partition_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        paths, rows, sizes, parts = [], [], [], []
        for v in pc.unique(batch[self.col]).to_pylist():
            sub = batch.filter(pc.equal(batch[self.col], v))
            pdir = os.path.join(self.frag_dir, f"{self.col}={v}")
            os.makedirs(pdir, exist_ok=True)
            name = f"frag-{uuid.uuid4().hex}.parquet"
            tmp = os.path.join(pdir, f".{name}.tmp")
            pq.write_table(sub, tmp, compression="zstd")
            final = os.path.join(pdir, name)
            os.replace(tmp, final)
            paths.append(os.path.join(_FRAGMENT_DIR, f"{self.col}={v}", name))
            rows.append(sub.num_rows)
            sizes.append(os.path.getsize(final))
            parts.append(str(v))
        return pa.table({
            "path": pa.array(paths, pa.string()),
            "rows": pa.array(rows, pa.int64()),
            "bytes": pa.array(sizes, pa.int64()),
            "partition": pa.array(parts, pa.string()),
        })


def write_dataset_partitioned(ds, root: str, stage: str, partition_col: str,
                              parent: str | None = None,
                              metrics: dict | None = None,
                              resume: bool = True,
                              fingerprint: str | None = None) -> dict:
    """Partitioned variant of ``write_dataset``: one fragment subdir per
    partition value, per-partition row counts in the manifest."""
    if resume and _resume_ok(root, latest_manifest(root), stage, parent,
                             fingerprint):
        return latest_manifest(root)
    frag_dir = os.path.join(root, _FRAGMENT_DIR)
    os.makedirs(frag_dir, exist_ok=True)
    meta = ds.map_batches(_PartitionedFragmentWriter(frag_dir, partition_col),
                          batch_format="pyarrow", batch_size=None)
    frags = [{"path": r["path"], "rows": int(r["rows"]),
              "bytes": int(r["bytes"]), "partition": r["partition"]}
             for r in meta.take_all()]
    per_part: dict[str, int] = {}
    for f in frags:
        per_part[f["partition"]] = per_part.get(f["partition"], 0) + f["rows"]
    m = dict(metrics or {})
    m["partition_col"] = partition_col
    m["partition_rows"] = per_part
    return _commit(root, stage, parent, frags, m, fingerprint,
                   schema_edits=None)   # full overwrite — see write_dataset


def _ts_applies(frag: dict, ts: dict) -> bool:
    """Iceberg sequence-number scoping: a merge-on-read tombstone masks
    only fragments COMMITTED BEFORE it. ``born`` records the manifest
    version a fragment/tombstone first appeared in; a fragment with no
    stamp is legacy data (born 0, maskable by everything), a tombstone
    with no stamp is a legacy delete (applies to everything). This is
    what lets ``merge_upsert_mor`` tombstone a key AND insert its
    replacement row in the same commit without the scan-time anti-join
    eating the new row."""
    return frag.get("born", 0) < ts.get("born", float("inf"))


def _read_fragments(root: str, man: dict, paths: list[str],
                    columns: list[str] | None):
    """Parquet read of selected fragments WITH merge-on-read tombstone
    anti-joins applied — the one scan path every reader (full, range,
    point-get) goes through, so no read verb can resurrect MoR-deleted
    rows. Pruned reads that dropped a tombstoned key column read it
    back in and drop it after the join. Tombstones are sequence-scoped
    (``_ts_applies``): fragments are grouped by WHICH tombstones mask
    them (at most a handful of distinct groups — one per MoR commit
    generation) and each group pays only its own anti-joins; fragments
    newer than every tombstone stream through join-free."""
    import ray.data as rd

    renames, dropped = _schema_state(man)
    # callers ask for VISIBLE names; parquet footers hold DISK names
    disk_cols = columns if columns is None \
        else [_to_disk(man, c) for c in columns]

    ts = man.get("tombstones") or []
    if not ts:
        ds = rd.read_parquet(paths, columns=disk_cols)
    else:
        from ..util import anti_semi_join
        born_by_path = {f["path"]: f for f in man["fragments"]}
        groups: dict[tuple, list[str]] = {}
        for p in paths:
            frag = born_by_path.get(os.path.relpath(p, root), {})
            sig = tuple(i for i, t in enumerate(ts)
                        if _ts_applies(frag, t))
            groups.setdefault(sig, []).append(p)
        parts = []
        for sig, gpaths in groups.items():
            app = [ts[i] for i in sig]
            key_cols = sorted({t["key_col"] for t in app})  # disk names
            read_cols = disk_cols
            added = []
            if disk_cols is not None:
                read_cols = list(disk_cols)
                for kc in key_cols:
                    if kc not in read_cols:
                        read_cols.append(kc)
                        added.append(kc)
            d = rd.read_parquet(gpaths, columns=read_cols)
            for kc in key_cols:
                tpaths = [os.path.join(root, t["path"]) for t in app
                          if t["key_col"] == kc]
                d = anti_semi_join(d, rd.read_parquet(tpaths), on=kc,
                                   n_buckets=64)
            if added:
                d = d.drop_columns(added)
            parts.append(d)
        ds = parts[0]
        for d in parts[1:]:
            ds = ds.union(d)
    if renames or dropped:
        def project(b: pa.Table) -> pa.Table:
            keep = [c for c in b.column_names if c not in dropped]
            return b.select(keep).rename_columns(
                [renames.get(c, c) for c in keep])
        ds = ds.map_batches(project, batch_format="pyarrow")
    return ds


def read_dataset(root: str, columns: list[str] | None = None, version: int | None = None,
                 partitions: list[str] | None = None):
    """Read the latest (or a pinned) committed version as a Dataset, with
    column pruning pushed into the parquet read and merge-on-read
    tombstones applied at scan time."""
    import ray.data as rd

    man = _manifest_at(root, version)
    frags = man["fragments"]
    if partitions is not None:   # partition pruning from manifest metadata
        want = set(partitions)
        frags = [f for f in frags if f.get("partition") in want]
    paths = [os.path.join(root, f["path"]) for f in frags]
    if not paths:
        return rd.from_arrow(pa.table({}))
    return _read_fragments(root, man, paths, columns)


def dataset_row_count(root: str) -> int:
    """Row count from manifest metadata alone — no data read."""
    man = latest_manifest(root)
    return 0 if man is None else man["total_rows"]


def metadata_value_counts(root: str, col: str,
                          version: int | None = None) -> dict:
    """GROUP-BY-count answered from MANIFEST METADATA ALONE (the
    Iceberg/Lance aggregate-pushdown pattern): per-fragment value
    counts for low-cardinality ``count_cols`` are recorded at write
    time and preserved by every mutator (merge/delete/compact/
    add_column/materialize recompute them on rewritten fragments,
    carry them by reference otherwise), so a ``SELECT col, COUNT(*)
    GROUP BY col`` over a 100 TB table costs O(#fragments) dict sums
    and ZERO data I/O. Raises if any fragment lacks counts for ``col``
    (the answer would silently undercount) — no fallback scan here;
    callers choose to scan explicitly. Merge-on-read tombstones also
    raise: metadata counts cannot see scan-time anti-joins."""
    man = _manifest_at(root, version)
    if man.get("tombstones"):
        raise ValueError("metadata_value_counts refused: pending "
                         "merge-on-read tombstones would make metadata "
                         "counts overcount; apply_tombstones() first")
    dcol = _to_disk(man, col)
    out: dict = {}
    for f in man["fragments"]:
        if not f["rows"]:
            continue
        vc = f.get("vcounts", {}).get(dcol)
        if vc is None:
            raise KeyError(
                f"fragment {f['path']} has no value counts for "
                f"{col!r} — write with count_cols=[{col!r}]")
        for v, n in zip(vc[0], vc[1]):
            out[v] = out.get(v, 0) + int(n)
    return out


def _drop_hits_probe(root: str, key_col: str, kref,
                     zonemap_cols=None, bloom_cols=None,
                     count_cols=None):
    """Per-fragment probe shared by merge_upsert / delete_by_keys: a
    fragment with NO key hit is carried over by manifest reference
    (zero I/O — the common case for localized updates); a hit fragment
    is rewritten without its matched rows; a fully-matched fragment
    disappears. Returns the map_batches kernel over fragment metadata."""
    import pyarrow.compute as pc

    frag_dir = os.path.join(root, _FRAGMENT_DIR)

    def probe(b: pa.Table) -> pa.Table:
        from ..util import _bcast_get
        ks = _bcast_get(kref)
        paths, rows, sizes, zms, bls, vcs = [], [], [], [], [], []
        for path, nrows, nbytes in zip(b["path"].to_pylist(),
                                       b["rows"].to_pylist(),
                                       b["bytes"].to_pylist()):
            t = pq.read_table(os.path.join(root, path))
            hit = pc.is_in(t[key_col], ks)
            n_hit = pc.sum(hit).as_py() or 0
            if not n_hit:                     # carried over by reference
                paths.append(path)
                rows.append(nrows)
                sizes.append(nbytes)
                zms.append("")                # caller keeps old metadata
                bls.append("")
                vcs.append("")
                continue
            kept = t.filter(pc.invert(hit))
            if not kept.num_rows:             # fully replaced/deleted
                continue
            name = f"frag-{uuid.uuid4().hex}.parquet"
            tmp = os.path.join(frag_dir, f".{name}.tmp")
            pq.write_table(kept, tmp, compression="zstd")
            final = os.path.join(frag_dir, name)
            os.replace(tmp, final)
            # rewritten rows: fresh pruning metadata (same definition as
            # the writer) so maintenance never drops pruning power
            zm, bl, vc = _fragment_meta(kept, zonemap_cols, bloom_cols,
                                        count_cols)
            paths.append(os.path.join(_FRAGMENT_DIR, name))
            rows.append(kept.num_rows)
            sizes.append(os.path.getsize(final))
            zms.append(json.dumps(zm, default=str))
            bls.append(json.dumps(bl))
            vcs.append(json.dumps(vc))
        return pa.table({"path": pa.array(paths, pa.string()),
                         "rows": pa.array(rows, pa.int64()),
                         "bytes": pa.array(sizes, pa.int64()),
                         "zonemap": pa.array(zms, pa.string()),
                         "bloom": pa.array(bls, pa.string()),
                         "vcounts": pa.array(vcs, pa.string())})

    return probe


def merge_upsert(updates, root: str, key_col: str, stage: str,
                 key_broadcast_cap: int = 2_000_000) -> dict:
    """Copy-on-write MERGE (upsert by key) committing a new version:
    matched keys are replaced, unmatched keys inserted.

    Fragment-granular, the Lance/Iceberg play: the update key set is
    broadcast once; every EXISTING fragment is probed in parallel and
    either CARRIED OVER by manifest reference (no key hit — zero I/O,
    the overwhelmingly common case when updates are localized) or
    rewritten without its matched rows; the updates dataset itself
    streams in as new fragments. Total I/O is O(touched fragments +
    updates), never O(table). Readers only ever see the old or the new
    committed version (manifest-last protocol).

    ``updates`` must have unique keys (checked — duplicate keys make
    "replace" ambiguous) and at most ``key_broadcast_cap`` of them
    (split bigger batches; the broadcast key probe is the design).
    Re-running the same merge is result-idempotent (replacing twice ==
    replacing once) but commits a new version each time.
    """
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    man = latest_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed manifest under {root}")
    _require_no_tombstones(man, 'merge_upsert')
    _require_schema_clean(man, 'merge_upsert')
    frag_dir = os.path.join(root, _FRAGMENT_DIR)

    ktabs = [t for t in
             ray.get(updates.select_columns([key_col]).to_arrow_refs())
             if t.num_rows and t.num_columns]
    keys = (pa.concat_tables(ktabs)[key_col].combine_chunks()
            if ktabs else pa.array([]))
    if len(keys) > key_broadcast_cap:
        raise ValueError("update batch exceeds key_broadcast_cap — "
                         "split it into smaller merges")
    if len(keys) != pc.count_distinct(keys).as_py():
        raise ValueError(f"duplicate {key_col!r} in updates — replace "
                         "semantics are ambiguous")
    kref = ray.put(keys)

    frag_meta = pa.table({
        "path": pa.array([f["path"] for f in man["fragments"]]),
        "rows": pa.array([int(f["rows"]) for f in man["fragments"]],
                         pa.int64()),
        "bytes": pa.array([int(f["bytes"]) for f in man["fragments"]],
                          pa.int64())})

    zm_cols, bl_cols, cs_cols = _manifest_pruning_cols(man)
    # the updates batch may carry extra/fewer columns; only compute
    # metadata for columns actually present (rewrites filter likewise)
    upd_cols = set(updates.schema().names)
    probe = _drop_hits_probe(root, key_col, kref, zm_cols, bl_cols,
                             cs_cols)

    surv = rd.from_arrow(frag_meta).map_batches(
        probe, batch_format="pyarrow", batch_size=4)
    new = updates.map_batches(
        _FragmentWriter(frag_dir,
                        [c for c in zm_cols or [] if c in upd_cols],
                        [c for c in bl_cols or [] if c in upd_cols],
                        [c for c in cs_cols or [] if c in upd_cols]),
        batch_format="pyarrow", batch_size=None)
    # carried fragments keep their metadata (bytes untouched);
    # rewritten/new fragments carry the freshly computed maps
    old_zm = {f["path"]: f.get("zonemap") for f in man["fragments"]}
    old_bl = {f["path"]: f.get("bloom") for f in man["fragments"]}
    old_vc = {f["path"]: f.get("vcounts") for f in man["fragments"]}
    frags = []
    for r in surv.union(new).take_all():
        f = {"path": r["path"], "rows": int(r["rows"]),
             "bytes": int(r["bytes"])}
        zm = (json.loads(r["zonemap"]) if r.get("zonemap")
              else old_zm.get(r["path"]))
        if zm:
            f["zonemap"] = zm
        bl = (json.loads(r["bloom"]) if r.get("bloom")
              else old_bl.get(r["path"]))
        if bl:
            f["bloom"] = bl
        vc = (json.loads(r["vcounts"]) if r.get("vcounts")
              else old_vc.get(r["path"]))
        if vc:
            f["vcounts"] = vc
        frags.append(f)
    old_paths = {f["path"] for f in man["fragments"]}
    carried = sum(1 for f in frags if f["path"] in old_paths)
    metrics = {"merge_key": key_col, "updates": len(keys),
               "carried_fragments": carried,
               "rewritten_or_new_fragments": len(frags) - carried}
    return _commit(root, stage, parent=man["stage"], fragments=frags,
                   metrics=metrics, fingerprint=None)


def merge_upsert_mor(updates, root: str, key_col: str, stage: str,
                     key_broadcast_cap: int = 2_000_000) -> dict:
    """Merge-on-read MERGE (upsert by key) — the Hudi/Iceberg MoR
    strategy next to ``merge_upsert``'s copy-on-write: the updates
    stream in as NEW fragments and their key set is committed as a
    sequence-scoped TOMBSTONE that masks only OLDER fragments at scan
    time (``_ts_applies``). ZERO existing data is read or rewritten —
    upsert cost is O(updates) regardless of how many fragments the
    touched keys span, vs CoW's O(touched fragments). The worst case
    for CoW (keys uniformly spread so EVERY fragment takes a rewrite —
    a 1/64 recaption of a phash-sorted image table rewrote the whole
    2M-image store, 126–143 s) is exactly the case MoR turns into
    seconds. Reads pay a scan-time anti-join until
    ``apply_tombstones`` (or routine compaction windows) materializes
    the masks; successive MoR upserts/deletes stack.

    Same contract as ``merge_upsert``: unique keys (checked), at most
    ``key_broadcast_cap`` of them, schema edits materialized first.
    Result-equivalent to ``merge_upsert`` — matched keys replaced,
    unmatched inserted — pinned by the oracle-paired
    ``lancelike_merge_upsert_mor_check``."""
    import pyarrow.compute as pc
    import ray

    man = latest_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed manifest under {root}")
    _require_schema_clean(man, 'merge_upsert_mor')
    frag_dir = os.path.join(root, _FRAGMENT_DIR)

    ktabs = [t for t in
             ray.get(updates.select_columns([key_col]).to_arrow_refs())
             if t.num_rows and t.num_columns]
    keys = (pa.concat_tables(ktabs)[key_col].combine_chunks()
            if ktabs else pa.array([]))
    if len(keys) > key_broadcast_cap:
        raise ValueError("update batch exceeds key_broadcast_cap — "
                         "split it into smaller merges")
    if len(keys) != pc.count_distinct(keys).as_py():
        raise ValueError(f"duplicate {key_col!r} in updates — replace "
                         "semantics are ambiguous")

    # single-writer model (manifest-last everywhere): the version this
    # commit WILL get stamps the new fragments and the tombstone so the
    # tombstone masks strictly-older data only
    next_version = man["version"] + 1

    zm_cols, bl_cols, cs_cols = _manifest_pruning_cols(man)
    upd_cols = set(updates.schema().names)
    new = updates.map_batches(
        _FragmentWriter(frag_dir,
                        [c for c in zm_cols or [] if c in upd_cols],
                        [c for c in bl_cols or [] if c in upd_cols],
                        [c for c in cs_cols or [] if c in upd_cols]),
        batch_format="pyarrow", batch_size=None)
    frags = [dict(f) for f in man["fragments"]]   # ALL carried, zero I/O
    n_new = 0
    for r in new.take_all():
        f = {"path": r["path"], "rows": int(r["rows"]),
             "bytes": int(r["bytes"]), "born": next_version}
        for field, col in (("zonemap", "zonemap"), ("bloom", "bloom"),
                           ("vcounts", "vcounts")):
            v = json.loads(r.get(col) or "{}")
            if v:
                f[field] = v
        frags.append(f)
        n_new += 1

    ts = list(man.get("tombstones") or [])
    if len(keys):
        tdir = os.path.join(root, _TOMBSTONE_DIR)
        os.makedirs(tdir, exist_ok=True)
        name = f"ts-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(tdir, f".{name}.tmp")
        pq.write_table(pa.table({key_col: keys}), tmp, compression="zstd")
        os.replace(tmp, os.path.join(tdir, name))
        ts.append({"path": os.path.join(_TOMBSTONE_DIR, name),
                   "key_col": key_col, "keys": len(keys),
                   "born": next_version})
    metrics = {"mor_merge_key": key_col, "updates": len(keys),
               "carried_fragments": len(man["fragments"]),
               "new_fragments": n_new, "tombstone_files": len(ts)}
    out = _commit(root, stage, parent=man["stage"], fragments=frags,
                  metrics=metrics, fingerprint=None,
                  tombstones=ts or None)
    assert out["version"] == next_version, \
        "concurrent commit raced merge_upsert_mor (single-writer model)"
    return out


def delete_by_keys(keys, root: str, key_col: str, stage: str,
                   key_broadcast_cap: int = 2_000_000,
                   _materializing: bool = False) -> dict:
    """DELETE by key committing a new version — the missing CRUD verb
    next to merge_upsert, same fragment-granular copy-on-write play:
    the (deduplicated) key set broadcasts once, unhit fragments are
    carried by manifest reference with their zone maps intact, hit
    fragments are rewritten without the matched rows, fully-matched
    fragments vanish. Total I/O is O(touched fragments), never
    O(table); deleting an absent key is a no-op (idempotent).

    ``keys`` is a Dataset with ``key_col`` or a pyarrow array."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    man = latest_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed manifest under {root}")
    if not _materializing:
        _require_no_tombstones(man, "delete_by_keys")
        _require_schema_clean(man, "delete_by_keys")

    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        karr = pa.chunked_array([keys]).combine_chunks() \
            if isinstance(keys, pa.Array) else keys.combine_chunks()
    else:
        ktabs = [t for t in
                 ray.get(keys.select_columns([key_col]).to_arrow_refs())
                 if t.num_rows and t.num_columns]
        karr = (pa.concat_tables(ktabs)[key_col].combine_chunks()
                if ktabs else pa.array([]))
    karr = pc.unique(karr)
    if len(karr) > key_broadcast_cap:
        raise ValueError("delete key set exceeds key_broadcast_cap — "
                         "split it into smaller deletes")
    kref = ray.put(karr)

    frag_meta = pa.table({
        "path": pa.array([f["path"] for f in man["fragments"]]),
        "rows": pa.array([int(f["rows"]) for f in man["fragments"]],
                         pa.int64()),
        "bytes": pa.array([int(f["bytes"]) for f in man["fragments"]],
                          pa.int64())})
    zm_cols, bl_cols, cs_cols = _manifest_pruning_cols(man)
    surv = rd.from_arrow(frag_meta).map_batches(
        _drop_hits_probe(root, key_col, kref, zm_cols, bl_cols, cs_cols),
        batch_format="pyarrow", batch_size=4)

    old_zm = {f["path"]: f.get("zonemap") for f in man["fragments"]}
    old_bl = {f["path"]: f.get("bloom") for f in man["fragments"]}
    old_vc = {f["path"]: f.get("vcounts") for f in man["fragments"]}
    frags = []
    for r in surv.take_all():
        f = {"path": r["path"], "rows": int(r["rows"]),
             "bytes": int(r["bytes"])}
        zm = json.loads(r.get("zonemap") or "{}") \
            if r.get("zonemap") else old_zm.get(r["path"])
        if zm:
            f["zonemap"] = zm
        bl = json.loads(r.get("bloom") or "{}") \
            if r.get("bloom") else old_bl.get(r["path"])
        if bl:
            f["bloom"] = bl
        vc = json.loads(r.get("vcounts") or "{}") \
            if r.get("vcounts") else old_vc.get(r["path"])
        if vc:
            f["vcounts"] = vc
        frags.append(f)
    old_paths = {f["path"] for f in man["fragments"]}
    carried = sum(1 for f in frags if f["path"] in old_paths)
    deleted = (sum(int(f["rows"]) for f in man["fragments"])
               - sum(f["rows"] for f in frags))
    metrics = {"delete_key": key_col, "keys": len(karr),
               "deleted_rows": deleted, "carried_fragments": carried,
               "rewritten_fragments": len(frags) - carried}
    return _commit(root, stage, parent=man["stage"], fragments=frags,
                   metrics=metrics, fingerprint=None)


def compact(root: str, stage: str, target_bytes: int = 64 * 1024 * 1024,
            zonemap_cols: list[str] | None = None,
            bloom_cols: list[str] | None = None) -> dict:
    """Fragment COMPACTION (the Lance/Iceberg maintenance op): fragments
    smaller than ``target_bytes`` are greedily binned to the target size
    and each bin is rewritten as ONE fragment in parallel; fragments
    already at/above target are CARRIED by manifest reference (zero I/O,
    zone maps preserved). Commits a new manifest version last — readers
    only ever see the old or the new version. Total I/O is
    O(small-fragment bytes), never O(table).

    Each multi-fragment bin is rewritten by its own Ray task
    (``from_items`` with one bin per block), so a 100k-small-fragment
    table compacts with full-cluster parallelism; singleton bins (a
    fragment that fits no bin) are carried by reference, never rewritten
    1:1. Rewritten fragments get fresh zone maps — ``zonemap_cols``
    defaults to the columns already zone-mapped in the manifest, so
    routine maintenance preserves pruning without re-stating them.
    Partitioned layouts are refused (rewriting across partition subdirs
    would silently break partition-pruned reads)."""
    import ray.data as rd

    man = latest_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed manifest under {root}")
    _require_no_tombstones(man, 'compact')
    _require_schema_clean(man, 'compact')
    if any("partition" in f for f in man["fragments"]):
        raise ValueError(
            "compact() does not support partitioned layouts — binning "
            "across partition subdirs would break partition-pruned reads")
    frag_dir = os.path.join(root, _FRAGMENT_DIR)
    zm_def, bl_def, cs_def = _manifest_pruning_cols(man)
    if zonemap_cols is None:
        zonemap_cols = zm_def
    if bloom_cols is None:
        bloom_cols = bl_def
    count_cols = cs_def

    small = [f for f in man["fragments"] if f["bytes"] < target_bytes]
    big = [f for f in man["fragments"] if f["bytes"] >= target_bytes]
    # greedy size-binning (first-fit over the byte budget); a bin of one
    # fragment gains nothing — carry it by reference instead
    bins, cur, cur_bytes = [], [], 0
    for f in small:
        if cur and cur_bytes + f["bytes"] > target_bytes:
            bins.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += f["bytes"]
    if cur:
        bins.append(cur)
    carried = list(big) + [b[0] for b in bins if len(b) == 1]
    bins = [b for b in bins if len(b) > 1]
    if not bins:
        return man                      # nothing to gain
    writer = _FragmentWriter(frag_dir, zonemap_cols, bloom_cols,
                             count_cols)

    def rewrite(b: pa.Table) -> pa.Table:
        out = []
        for paths_json in b["bin"].to_pylist():
            parts = [pq.read_table(os.path.join(root, p))
                     for p in json.loads(paths_json)]
            out.append(writer(pa.concat_tables(parts)))
        return pa.concat_tables(out)

    bins_ds = rd.from_items(
        [{"bin": json.dumps([f["path"] for f in b])} for b in bins],
        override_num_blocks=len(bins))   # one Ray task per bin
    meta = bins_ds.map_batches(rewrite, batch_format="pyarrow",
                               batch_size=None)
    frags = [dict(f) for f in carried]  # carried: keep zonemap/bloom
    for r in meta.take_all():
        f = {"path": r["path"], "rows": int(r["rows"]),
             "bytes": int(r["bytes"])}
        zm = json.loads(r.get("zonemap") or "{}")
        if zm:
            f["zonemap"] = zm
        bl = json.loads(r.get("bloom") or "{}")
        if bl:
            f["bloom"] = bl
        vc = json.loads(r.get("vcounts") or "{}")
        if vc:
            f["vcounts"] = vc
        frags.append(f)
    metrics = {"compacted_bins": len(bins),
               "small_fragments_in": len(small),
               "carried_fragments": len(carried)}
    return _commit(root, stage, parent=man["stage"], fragments=frags,
                   metrics=metrics, fingerprint=None)


def vacuum(root: str, keep_versions: int = 1, grace_s: float = 0.0) -> dict:
    """Garbage-collect superseded store versions (the Lance
    ``cleanup_old_versions`` / Iceberg ``expire_snapshots`` maintenance
    verb): manifests older than the newest ``keep_versions`` are
    deleted, then every file under ``fragments/`` that no RETAINED
    manifest references is unlinked — including ``*.tmp`` strands from
    crashed write tasks. Metadata-only work (O(#fragments) dict lookups
    + unlinks, zero data I/O). Deletion order is crash-safe: manifests
    go first, so an interrupted vacuum can leave unreferenced files
    behind but never a readable version with missing fragments.

    CONCURRENCY: an IN-FLIGHT writer's fragments are unreferenced until
    its final manifest commit, so a concurrent vacuum would delete them
    and let the subsequent commit publish a readable-but-broken version.
    Run vacuum in a solo maintenance window, or pass ``grace_s`` >
    the longest possible write: files younger than that are kept (the
    ``older_than`` guard of Lance's cleanup_old_versions)."""
    import time
    paths = _manifest_paths(root)
    if not paths:
        raise FileNotFoundError(f"no committed manifest under {root}")
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    tagged = set(list_tags(root).values())
    drop, keep = [], []
    for i, p in enumerate(paths):
        v = int(os.path.basename(p)[len("manifest-v"):-len(".json")])
        if i >= len(paths) - keep_versions or v in tagged:
            keep.append(p)          # newest N + every TAGGED version
        else:
            drop.append(p)
    kept_refs: set[str] = set()
    kept_versions: list[int] = []
    for p in keep:
        with open(p) as f:
            man = json.load(f)
        kept_refs.update(fr["path"] for fr in man["fragments"])
        kept_refs.update(t["path"] for t in man.get("tombstones") or [])
        kept_versions.append(int(man["version"]))
    for p in drop:
        os.remove(p)
    fdir = os.path.join(root, _FRAGMENT_DIR)
    removed_fragments, reclaimed = 0, 0
    cutoff = time.time() - grace_s
    for dirpath, _dirs, files in os.walk(fdir, topdown=False):
        for name in files:
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, root)
            if rel not in kept_refs and os.path.getmtime(full) <= cutoff:
                reclaimed += os.path.getsize(full)
                os.remove(full)
                removed_fragments += 1
        if dirpath != fdir and not os.listdir(dirpath):
            os.rmdir(dirpath)           # empty partition subdir
    tdir = os.path.join(root, _TOMBSTONE_DIR)
    if os.path.isdir(tdir):             # GC expired tombstone files too
        for name in os.listdir(tdir):
            full = os.path.join(tdir, name)
            rel = os.path.relpath(full, root)
            if rel not in kept_refs and os.path.getmtime(full) <= cutoff:
                reclaimed += os.path.getsize(full)
                os.remove(full)
                removed_fragments += 1
    return {"removed_manifests": len(drop),
            "removed_fragments": removed_fragments,
            "reclaimed_bytes": reclaimed,
            "kept_versions": kept_versions}


def _rewrite_fragments(root: str, man: dict, compute,
                       zonemap_cols, bloom_cols,
                       count_cols=None) -> list[dict]:
    """Copy-on-write rewrite of every fragment through ``compute`` —
    one Ray task per fragment (full-cluster parallelism), row counts
    verified, pruning metadata recomputed, partition subdirs preserved.
    Shared by ``add_column`` and ``materialize_schema``. Returns the
    new fragment list; the caller commits."""
    import ray.data as rd

    frag_dir = os.path.join(root, _FRAGMENT_DIR)

    def rewrite(b: pa.Table) -> pa.Table:
        out = []
        for rel, part in zip(b["path"].to_pylist(),
                             b["partition"].to_pylist()):
            t = pq.read_table(os.path.join(root, rel))
            t2 = compute(t)
            if t2.num_rows != t.num_rows:
                raise ValueError(
                    f"fragment rewrite changed the row count of {rel} "
                    f"({t.num_rows} -> {t2.num_rows})")
            sub = os.path.dirname(rel)
            odir = os.path.join(root, sub) if sub != _FRAGMENT_DIR \
                else frag_dir
            os.makedirs(odir, exist_ok=True)
            name = f"frag-{uuid.uuid4().hex}.parquet"
            tmp = os.path.join(odir, f".{name}.tmp")
            pq.write_table(t2, tmp, compression="zstd")
            final = os.path.join(odir, name)
            os.replace(tmp, final)
            row = {"path": os.path.join(sub, name) if sub != _FRAGMENT_DIR
                   else os.path.join(_FRAGMENT_DIR, name),
                   "rows": t2.num_rows,
                   "bytes": os.path.getsize(final)}
            if part:
                row["partition"] = part
            zm, bl, vc = _fragment_meta(t2, zonemap_cols, bloom_cols,
                                        count_cols)
            if zm:
                row["zonemap"] = zm
            if bl:
                row["bloom"] = bl
            if vc:
                row["vcounts"] = vc
            out.append(row)
        cols = {k: [r.get(k) for r in out]
                for k in ("path", "rows", "bytes", "partition")}
        return pa.table({"path": pa.array(cols["path"], pa.string()),
                         "rows": pa.array(cols["rows"], pa.int64()),
                         "bytes": pa.array(cols["bytes"], pa.int64()),
                         "partition": pa.array(
                             [p or "" for p in cols["partition"]],
                             pa.string()),
                         "zonemap": pa.array(
                             [json.dumps(r.get("zonemap") or {})
                              for r in out], pa.string()),
                         "bloom": pa.array(
                             [json.dumps(r.get("bloom") or {})
                              for r in out], pa.string()),
                         "vcounts": pa.array(
                             [json.dumps(r.get("vcounts") or {})
                              for r in out], pa.string())})

    items = [{"path": f["path"], "partition": f.get("partition", "")}
             for f in man["fragments"]]
    src = rd.from_items(items, override_num_blocks=max(1, len(items)))
    frags = []
    for r in src.map_batches(rewrite, batch_format="pyarrow",
                             batch_size=None).take_all():
        f = {"path": r["path"], "rows": int(r["rows"]),
             "bytes": int(r["bytes"])}
        if r["partition"]:
            f["partition"] = r["partition"]
        zm = json.loads(r["zonemap"] or "{}")
        if zm:
            f["zonemap"] = zm
        bl = json.loads(r["bloom"] or "{}")
        if bl:
            f["bloom"] = bl
        vc = json.loads(r.get("vcounts") or "{}")
        if vc:
            f["vcounts"] = vc
        frags.append(f)
    return frags


def _disk_schema_names(root: str, man: dict) -> list[str]:
    frags = man["fragments"]
    if not frags:
        return []
    return pq.read_schema(os.path.join(root, frags[0]["path"])).names


def _visible_names(root: str, man: dict) -> list[str]:
    renames, dropped = _schema_state(man)
    return [renames.get(n, n) for n in _disk_schema_names(root, man)
            if n not in dropped]


def rename_column(root: str, stage: str, old: str, new: str) -> dict:
    """Metadata-only ALTER TABLE RENAME COLUMN (the Lance/Iceberg
    design): commits a new manifest whose ``schema_edits`` map the
    ON-DISK name to the new visible name — ZERO data I/O, instant at
    any table size; every read path applies the projection at scan
    time. Data-rewriting verbs refuse until ``materialize_schema()``
    bakes the edits into the fragments (the tombstone rule's mirror).
    The previous version stays readable under the old schema."""
    man = latest_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed manifest under {root}")
    visible = _visible_names(root, man)
    if old not in visible:
        raise KeyError(f"no column {old!r} (have {visible})")
    if new != old and new in visible:
        raise ValueError(f"column {new!r} already exists")
    renames, dropped = _schema_state(man)
    disk = _to_disk(man, old)
    renames[disk] = new
    if renames[disk] == disk:
        del renames[disk]
    edits = {}
    if renames:
        edits["renames"] = renames
    if dropped:
        edits["dropped"] = sorted(dropped)
    return _commit(root, stage, parent=man["stage"],
                   fragments=man["fragments"],
                   metrics={"rename_column": [old, new]},
                   tombstones=man.get("tombstones"),
                   schema_edits=edits or None)


def drop_column(root: str, stage: str, name: str) -> dict:
    """Metadata-only ALTER TABLE DROP COLUMN: the on-disk column is
    hidden by a ``schema_edits`` entry in the new manifest — zero data
    I/O; the bytes are reclaimed later by ``materialize_schema`` (or
    any subsequent compaction after it). Same deferred-rewrite contract
    as ``rename_column``."""
    man = latest_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed manifest under {root}")
    visible = _visible_names(root, man)
    if name not in visible:
        raise KeyError(f"no column {name!r} (have {visible})")
    if len(visible) == 1:
        raise ValueError("cannot drop the last column")
    renames, dropped = _schema_state(man)
    disk = _to_disk(man, name)
    dropped.add(disk)
    renames.pop(disk, None)
    edits = {"dropped": sorted(dropped)}
    if renames:
        edits["renames"] = renames
    return _commit(root, stage, parent=man["stage"],
                   fragments=man["fragments"],
                   metrics={"drop_column": name},
                   tombstones=man.get("tombstones"),
                   schema_edits=edits)


def materialize_schema(root: str, stage: str = "materialize_schema") -> dict:
    """Physically apply pending renames/drops: per-fragment parallel
    copy-on-write rewrite (``_rewrite_fragments``), zone-map and bloom
    metadata re-keyed to the new names, ``schema_edits`` cleared — after
    this the data-rewriting verbs work again. No-op if the schema is
    already materialized."""
    man = latest_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed manifest under {root}")
    _require_no_tombstones(man, 'materialize_schema')
    renames, dropped = _schema_state(man)
    if not renames and not dropped:
        return man
    zm_def, bl_def, cs_def = _manifest_pruning_cols(man)
    zm_new = [renames.get(c, c) for c in zm_def or [] if c not in dropped]
    bl_new = [renames.get(c, c) for c in bl_def or [] if c not in dropped]
    cs_new = [renames.get(c, c) for c in cs_def or [] if c not in dropped]

    def proj(t: pa.Table) -> pa.Table:
        keep = [c for c in t.column_names if c not in dropped]
        return t.select(keep).rename_columns(
            [renames.get(c, c) for c in keep])

    frags = _rewrite_fragments(root, man, proj, zm_new, bl_new, cs_new)
    return _commit(root, stage, parent=man["stage"], fragments=frags,
                   metrics={"rewritten_fragments": len(frags),
                            "applied_renames": renames,
                            "applied_drops": sorted(dropped)},
                   schema_edits=None)


def add_column(root: str, stage: str, compute, *,
               zonemap_cols: list[str] | None = None) -> dict:
    """Schema evolution: ALTER TABLE ADD COLUMN(s) with backfill.
    ``compute(batch) -> batch'`` appends the new column(s) to each
    fragment (it must be deterministic per row and must not drop or
    reorder rows — row counts are verified per fragment). Every fragment
    is rewritten by its own Ray task (full-cluster parallelism), the new
    manifest commits LAST, and the previous version stays readable —
    copy-on-write exactly like merge/compact. Unlike Lance's adjacent
    column-group files this rewrites row data (one pass of O(table)
    I/O); the simplicity buys zone maps over the new column for free
    (pass ``zonemap_cols``). Partitioned layouts keep their partition
    assignment (each fragment is rewritten in place of its subdir)."""
    man = latest_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed manifest under {root}")
    _require_no_tombstones(man, 'add_column')
    _require_schema_clean(man, 'add_column')
    zm_def, bl_def, cs_def = _manifest_pruning_cols(man)
    if zonemap_cols is None:
        # compact()'s precedent: a full rewrite must not silently drop
        # existing pruning metadata — recompute every column already
        # zone-mapped (and bloomed / value-counted) in the manifest
        zonemap_cols = zm_def
    frags = _rewrite_fragments(root, man, compute, zonemap_cols, bl_def,
                               cs_def)
    metrics = {"rewritten_fragments": len(frags)}
    return _commit(root, stage, parent=man["stage"], fragments=frags,
                   metrics=metrics, fingerprint=None)


def delete_by_keys_mor(keys, root: str, key_col: str, stage: str,
                       key_cap: int = 2_000_000) -> dict:
    """Merge-on-read DELETE (the Iceberg/Delta MoR strategy, vs
    ``delete_by_keys``'s copy-on-write): the deduplicated key set is
    written as a TOMBSTONE file and the new manifest references it —
    ZERO data I/O at delete time; ``read_dataset`` applies the anti-join
    at scan time. Tombstones from successive MoR deletes stack; CoW
    mutators refuse until ``apply_tombstones`` materializes them.

    ``keys`` is a Dataset with ``key_col`` or a pyarrow array."""
    import pyarrow.compute as pc
    import ray

    man = latest_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed manifest under {root}")
    # tombstones are applied to the raw parquet scan (BEFORE the
    # schema-edit projection), so they must record the DISK column name
    key_col_in = key_col
    key_col = _to_disk(man, key_col)
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        karr = pa.chunked_array([keys]).combine_chunks() \
            if isinstance(keys, pa.Array) else keys.combine_chunks()
    else:
        ktabs = [t for t in
                 ray.get(keys.select_columns([key_col_in]).to_arrow_refs())
                 if t.num_rows and t.num_columns]
        karr = (pa.concat_tables(ktabs)[key_col_in].combine_chunks()
                if ktabs else pa.array([]))
    karr = pc.unique(karr)
    if len(karr) > key_cap:
        raise ValueError("tombstone key set exceeds key_cap — use the "
                         "copy-on-write delete for bulk drops")
    tdir = os.path.join(root, _TOMBSTONE_DIR)
    os.makedirs(tdir, exist_ok=True)
    name = f"ts-{uuid.uuid4().hex}.parquet"
    tmp = os.path.join(tdir, f".{name}.tmp")
    pq.write_table(pa.table({key_col: karr}), tmp, compression="zstd")
    final = os.path.join(tdir, name)
    os.replace(tmp, final)
    ts = list(man.get("tombstones") or [])
    ts.append({"path": os.path.join(_TOMBSTONE_DIR, name),
               "key_col": key_col, "keys": len(karr),
               # sequence scope: masks fragments born strictly before
               # this commit — i.e. everything currently in the store,
               # but NOT rows a later merge_upsert_mor re-inserts
               "born": man["version"] + 1})
    metrics = {"mor_delete_key": key_col, "keys": len(karr),
               "tombstone_files": len(ts)}
    return _commit(root, stage, parent=man["stage"],
                   fragments=man["fragments"], metrics=metrics,
                   fingerprint=None, tombstones=ts)


def apply_tombstones(root: str, stage: str) -> dict:
    """Materialize pending merge-on-read tombstones, committing ONE
    version with NO tombstones — after this, CoW mutators are unblocked
    and scans stop paying the read-time anti-join.

    Sequence-scoped and single-pass: each fragment is probed in
    parallel against ONLY the tombstones that mask it (``_ts_applies``
    — a row a ``merge_upsert_mor`` re-inserted is never eaten by the
    tombstone committed alongside it), unmasked/unhit fragments are
    carried by manifest reference, hit fragments are rewritten once
    against the UNION of their applicable key sets. Total I/O is
    O(masked fragments), never O(table)."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    man = latest_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed manifest under {root}")
    ts = man.get("tombstones") or []
    if not ts:
        return man
    next_version = man["version"] + 1
    frag_dir = os.path.join(root, _FRAGMENT_DIR)
    tslist = [{"born": t.get("born", float("inf")),
               "key_col": t["key_col"],
               "keys": pq.read_table(os.path.join(root, t["path"]))
               [t["key_col"]].combine_chunks()} for t in ts]
    kref = ray.put(tslist)
    zm_cols, bl_cols, cs_cols = _manifest_pruning_cols(man)

    frag_meta = pa.table({
        "path": pa.array([f["path"] for f in man["fragments"]]),
        "rows": pa.array([int(f["rows"]) for f in man["fragments"]],
                         pa.int64()),
        "bytes": pa.array([int(f["bytes"]) for f in man["fragments"]],
                          pa.int64()),
        "born": pa.array([int(f.get("born", 0))
                          for f in man["fragments"]], pa.int64())})

    def probe(b: pa.Table) -> pa.Table:
        from ..util import _bcast_get
        tl = _bcast_get(kref)
        paths, rows, sizes, zms, bls, vcs = [], [], [], [], [], []
        for path, nrows, nbytes, born in zip(
                b["path"].to_pylist(), b["rows"].to_pylist(),
                b["bytes"].to_pylist(), b["born"].to_pylist()):
            app = [t for t in tl if born < t["born"]]
            mask = None
            if app:
                t = pq.read_table(os.path.join(root, path))
                for a in app:
                    if a["key_col"] not in t.column_names:
                        continue
                    m = pc.is_in(t[a["key_col"]], a["keys"])
                    mask = m if mask is None else pc.or_(mask, m)
            n_hit = (pc.sum(mask).as_py() or 0) if mask is not None else 0
            if not n_hit:                     # unmasked or no key hit
                paths.append(path)
                rows.append(nrows)
                sizes.append(nbytes)
                zms.append("")                # caller keeps old metadata
                bls.append("")
                vcs.append("")
                continue
            kept = t.filter(pc.invert(mask))
            if not kept.num_rows:             # fully masked
                continue
            name = f"frag-{uuid.uuid4().hex}.parquet"
            tmp = os.path.join(frag_dir, f".{name}.tmp")
            pq.write_table(kept, tmp, compression="zstd")
            final = os.path.join(frag_dir, name)
            os.replace(tmp, final)
            zm, bl, vc = _fragment_meta(kept, zm_cols, bl_cols, cs_cols)
            paths.append(os.path.join(_FRAGMENT_DIR, name))
            rows.append(kept.num_rows)
            sizes.append(os.path.getsize(final))
            zms.append(json.dumps(zm, default=str))
            bls.append(json.dumps(bl))
            vcs.append(json.dumps(vc))
        return pa.table({"path": pa.array(paths, pa.string()),
                         "rows": pa.array(rows, pa.int64()),
                         "bytes": pa.array(sizes, pa.int64()),
                         "zonemap": pa.array(zms, pa.string()),
                         "bloom": pa.array(bls, pa.string()),
                         "vcounts": pa.array(vcs, pa.string())})

    surv = rd.from_arrow(frag_meta).map_batches(
        probe, batch_format="pyarrow", batch_size=4)
    old_by_path = {f["path"]: f for f in man["fragments"]}
    frags = []
    for r in surv.take_all():
        old = old_by_path.get(r["path"])
        if old is not None and not r.get("zonemap"):
            frags.append(dict(old))           # carried: keep metadata
            continue
        f = {"path": r["path"], "rows": int(r["rows"]),
             "bytes": int(r["bytes"]), "born": next_version}
        for field in ("zonemap", "bloom", "vcounts"):
            v = json.loads(r.get(field) or "{}")
            if v:
                f[field] = v
        frags.append(f)
    carried = sum(1 for f in frags if f["path"] in old_by_path)
    removed = (sum(int(f["rows"]) for f in man["fragments"])
               - sum(f["rows"] for f in frags))
    metrics = {"applied_tombstones": len(ts), "rows_removed": removed,
               "carried_fragments": carried,
               "rewritten_fragments": len(frags) - carried}
    out = _commit(root, stage, parent=man["stage"], fragments=frags,
                  metrics=metrics, fingerprint=None, tombstones=None)
    assert out["version"] == next_version
    return out


def version_diff(root: str, v_old: int, v_new: int, key_col: str,
                 cmp_cols: list[str] | None = None,
                 n_buckets: int = 256):
    """CDC-style snapshot DIFF between two committed versions: a Dataset
    of (key, change) rows with change ∈ {added, removed, changed} —
    'changed' compares the ``cmp_cols`` values (all non-key columns by
    default). One bucketed hash shuffle on the key; both snapshots ship
    only key + compared columns. The table-format analogue of Delta's
    CDF / Iceberg's changelog scan, derived purely from the two
    manifests' fragment sets."""
    import numpy as np
    import pandas as pd

    from ..util import bucketed_group_apply

    old = read_dataset(root, version=v_old)
    new = read_dataset(root, version=v_new)
    if cmp_cols is None:
        cmp_cols = [c for c in old.schema().names if c != key_col]
    cols = [key_col] + list(cmp_cols)

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.select(cols).append_column(
                "_side", pa.array(np.full(b.num_rows, side, np.int8)))
        return fn

    u = old.map_batches(tag(0), batch_format="pyarrow").union(
        new.map_batches(tag(1), batch_format="pyarrow"))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        from ..util import typed_empty_series
        if not len(g):
            return pd.DataFrame({
                key_col: typed_empty_series(g[key_col].to_numpy()),
                "change": pd.Series([], dtype="string")})
        # vectorized: per-key counts of each side
        cnt = g.groupby([key_col, "_side"]).size().unstack(fill_value=0) \
            .reindex(columns=[0, 1], fill_value=0)
        added = cnt.index[(cnt[0] == 0) & (cnt[1] > 0)]
        removed = cnt.index[(cnt[0] > 0) & (cnt[1] == 0)]
        both = cnt.index[(cnt[0] > 0) & (cnt[1] > 0)]
        changed = []
        if len(both):
            sub = g[g[key_col].isin(both)]
            h = pd.util.hash_pandas_object(
                sub[list(cmp_cols)], index=False)
            hs = pd.DataFrame({key_col: sub[key_col].to_numpy(),
                               "_side": sub["_side"].to_numpy(),
                               "h": h.to_numpy()})
            per = hs.groupby([key_col, "_side"])["h"].sum().unstack()
            changed = per.index[per[0] != per[1]]
        out_k = list(added) + list(removed) + list(changed)
        out_c = (["added"] * len(added) + ["removed"] * len(removed)
                 + ["changed"] * len(changed))
        return pd.DataFrame({
            key_col: np.asarray(out_k) if out_k
            else typed_empty_series(g[key_col].to_numpy()),
            "change": pd.Series(out_c, dtype="string")})

    return bucketed_group_apply(u, [key_col], classify, n_buckets)


_REFS_DIR = "_refs"


def create_tag(root: str, name: str, version: int | None = None,
               force: bool = False) -> dict:
    """Named immutable ref to a committed version (the Iceberg tag /
    Lance tag verb): ``_refs/<name>.json`` pins a version number so it
    survives ``vacuum`` (tagged versions are never expired) and can be
    read back by name forever. Atomic create; refuses to move an
    existing tag unless ``force``."""
    import re
    if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]{0,63}", name):
        # leading dots are reserved for tmp files, which list_tags and
        # vacuum skip — a dot-named tag would silently fail to pin
        raise ValueError(f"invalid tag name {name!r}")
    if version is None:
        man = latest_manifest(root)
        if man is None:
            raise FileNotFoundError(f"no committed manifest under {root}")
        version = int(man["version"])
    else:
        # must reference a committed version
        _manifest_at(root, version)
    rdir = os.path.join(root, _REFS_DIR)
    os.makedirs(rdir, exist_ok=True)
    path = os.path.join(rdir, f"{name}.json")
    if os.path.exists(path) and not force:
        raise FileExistsError(f"tag {name!r} exists (use force to move)")
    tmp = os.path.join(rdir, f".{name}.json.tmp")
    ref = {"name": name, "version": version,
           "created_at": datetime.now(timezone.utc).isoformat()}
    with open(tmp, "w") as f:
        json.dump(ref, f)
    os.replace(tmp, path)
    return ref


def list_tags(root: str) -> dict:
    """{tag name: pinned version} for every ref under ``_refs/``."""
    rdir = os.path.join(root, _REFS_DIR)
    if not os.path.isdir(rdir):
        return {}
    out = {}
    for f in os.listdir(rdir):
        if f.endswith(".json") and not f.startswith("."):
            with open(os.path.join(rdir, f)) as fh:
                ref = json.load(fh)
            out[ref["name"]] = int(ref["version"])
    return out


def resolve_tag(root: str, name: str) -> int:
    tags = list_tags(root)
    if name not in tags:
        raise FileNotFoundError(f"no tag {name!r} under {root}")
    return tags[name]


def delete_tag(root: str, name: str) -> None:
    os.remove(os.path.join(root, _REFS_DIR, f"{name}.json"))


def analyze(root: str, columns: list[str], stage: str = "analyze") -> dict:
    """ANALYZE: compute exact per-column table statistics (row count,
    null count, distinct count, min/max) over the latest committed
    version and COMMIT them as a new manifest version's metrics — the
    cost-based-optimizer stats verb. Null/min/max fold through 1-row
    block partials; ndv is exact via a per-block distinct pre-reduce
    into one bounded shuffle (≤ ndv × blocks rows move). Fragments are
    carried by reference — ANALYZE does zero data writes. Returns the
    committed manifest (stats under metrics['column_stats'])."""
    import numpy as np
    from ray.data.aggregate import Max, Min, Sum

    from ..util import grouped_agg_vec

    import pyarrow.types as pat

    man = latest_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed manifest under {root}")
    frags = man.get("fragments") or []
    if frags:   # validate up front with a clear error (integer-only —
        # min/max/ndv are folded through int64 partials)
        schema = pq.read_schema(os.path.join(root, frags[0]["path"]))
        for c in columns:
            if c not in schema.names:
                raise KeyError(f"analyze: column {c!r} not in store "
                               f"schema {schema.names}")
            if not pat.is_integer(schema.field(c).type):
                raise ValueError(
                    f"analyze supports integer columns only; {c!r} is "
                    f"{schema.field(c).type} (scale floats to fixed-"
                    f"point or epoch integers first)")
    stats = {}
    for c in columns:
        ds = read_dataset(root, columns=[c])

        def part(b: pa.Table, c=c) -> pa.Table:
            col = b[c]
            nn = col.null_count
            v = col.drop_null().to_numpy(zero_copy_only=False)
            has = len(v) > 0
            return pa.table({
                "n_p": pa.array([b.num_rows], pa.int64()),
                "nn_p": pa.array([nn], pa.int64()),
                "mn_p": pa.array([v.min() if has else None], pa.int64()),
                "mx_p": pa.array([v.max() if has else None], pa.int64())})

        agg = ds.map_batches(part, batch_format="pyarrow").aggregate(
            Sum("n_p", alias_name="n"), Sum("nn_p", alias_name="nn"),
            Min("mn_p", alias_name="mn"), Max("mx_p", alias_name="mx"))

        def uniq(b: pa.Table, c=c) -> pa.Table:
            v = np.unique(b[c].drop_null().to_numpy(zero_copy_only=False))
            return pa.table({"v": pa.array(v, pa.int64())})

        ndv = int(grouped_agg_vec(
            ds.map_batches(uniq, batch_format="pyarrow"),
            ["v"], [(None, "count", "x")]).count())
        stats[c] = {"n_rows": int(agg["n"]), "n_null": int(agg["nn"]),
                    "n_distinct": ndv,
                    "min": None if agg["mn"] is None else int(agg["mn"]),
                    "max": None if agg["mx"] is None else int(agg["mx"])}
    metrics = dict(man.get("metrics") or {})
    metrics["column_stats"] = stats
    return _commit(root, stage, man["stage"], man["fragments"], metrics,
                   man.get("fingerprint"),
                   tombstones=man.get("tombstones"))


# ------------------------------------------------------------ FTS index

_INDEX_DIR = "_indexes"


def create_inverted_index(root: str, text_col: str, key_col: str,
                          stage: str = "fts", n_buckets: int = 16,
                          resume: bool = True) -> dict:
    """Full-text INVERTED INDEX over a string column (the Lance-style
    scalar/FTS index verb): posting rows ``(token, key)`` — one row per
    DISTINCT token per document — hash-partitioned by token into
    ``n_buckets`` posting partitions and committed as a lancelike
    dataset under ``root/_indexes/fts_<col>/``, so a term lookup opens
    exactly the one partition its hash names (metadata decision).

    The index manifest records the data version it was built from;
    ``search_inverted_index`` refuses a stale index rather than serving
    results that disagree with the current data. Build is one
    distributed pass over the data scan (merge-on-read tombstones
    applied — deleted rows never enter the index); tokenization is
    whitespace ``\\S+``, the same surface as the text operators.
    """
    import re

    import numpy as np

    from ..util import stable_bucket

    man = latest_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed manifest under {root}")
    idx_root = os.path.join(root, _INDEX_DIR, f"fts_{text_col}")
    fpr = f"v{man['version']}:{text_col}:{key_col}:{n_buckets}"
    ds = read_dataset(root, columns=[key_col, text_col])
    ws = re.compile(r"\S+")

    def explode(b: pa.Table) -> pa.Table:
        keys, toks = [], []
        kv = b[key_col].to_pylist()
        tv = b[text_col].to_pylist()
        for k, t in zip(kv, tv):
            u = sorted(set(ws.findall(t or "")))
            keys.extend([k] * len(u))
            toks.extend(u)
        tb = pa.table({"token": pa.array(toks, pa.string()),
                       "key": pa.array(keys)})
        if tb.num_rows == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "key": pa.array([], b[key_col].type),
                             "tb": pa.array([], pa.string())})
        bk = stable_bucket(toks, n_buckets).astype(np.int32)
        return tb.append_column("tb", pa.array(
            [str(x) for x in bk], pa.string()))

    rows = ds.map_batches(explode, batch_format="pyarrow")
    return write_dataset_partitioned(
        rows, idx_root, stage=stage, partition_col="tb",
        parent=f"{man['stage']}@v{man['version']}",
        metrics={"index_of_version": man["version"], "column": text_col,
                 "key_col": key_col, "n_buckets": n_buckets},
        resume=resume, fingerprint=fpr)


def search_inverted_index(root: str, text_col: str, tokens: list[str],
                          mode: str = "and"):
    """Term lookup through the FTS index: opens ONLY the posting
    partitions the query tokens hash to (never the data files, never
    the other partitions), then resolves the boolean query distributed
    — AND = keys whose per-key match count equals the distinct query
    token count, OR = distinct keys. Raises if the index is missing or
    STALE (data version moved past the one it indexes). Returns
    ``(keys_dataset, scanned_partitions, total_partitions)``.
    """
    from ..util import grouped_agg_vec, stable_bucket

    idx_root = os.path.join(root, _INDEX_DIR, f"fts_{text_col}")
    iman = latest_manifest(idx_root)
    if iman is None:
        raise FileNotFoundError(f"no FTS index for {text_col!r} under "
                                f"{root} — create_inverted_index first")
    dman = latest_manifest(root)
    built_of = iman["metrics"]["index_of_version"]
    if dman["version"] != built_of:
        raise ValueError(
            f"stale FTS index: built at data version {built_of}, store "
            f"is at {dman['version']} — rebuild the index")
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    qtokens = sorted(set(tokens))
    if not qtokens:
        raise ValueError("empty token list")
    P = int(iman["metrics"]["n_buckets"])
    need = sorted({str(int(b)) for b in stable_bucket(qtokens, P)})
    total = len({f.get("partition") for f in iman["fragments"]})
    ds = read_dataset(idx_root, columns=["token", "key"],
                      partitions=need)

    def hits(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.is_in(b["token"], value_set=pa.array(qtokens))
        return b.filter(keep).select(["key"])

    matched = ds.map_batches(hits, batch_format="pyarrow")
    if mode == "or":
        out = grouped_agg_vec(matched, ["key"],
                              [(None, "count", "_n")]) \
            .drop_columns(["_n"])
    else:
        cnt = grouped_agg_vec(matched, ["key"], [(None, "count", "_n")])
        nq = len(qtokens)

        def full(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            keep = pc.equal(pc.cast(b["_n"], pa.int64()), nq)
            return b.filter(keep).select(["key"])

        out = cnt.map_batches(full, batch_format="pyarrow")
    return out, len(need), total
