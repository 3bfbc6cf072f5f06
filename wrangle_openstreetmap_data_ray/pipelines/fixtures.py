"""Deterministic synthetic-fixture materialization, keyed by the driver's
``sf_dir`` (e.g. ``/root/testdata/sf0.01``).

The driver's DuckDB oracle can only see parquet files, so every synthetic
table (images, geo, polygons, OSM element tables — FIXTURES.md) is written
once to ``/tmp/graft_fixtures/<sftag>/<name>.parquet`` with pure pyarrow
(no Ray needed: content is a pure function of row index + seed, identical
at any parallelism). Both the Ray queries and the oracle SQL read the SAME
files, so the comparison pins the operators, not the data.

Writes are atomic (tmp + rename) and cached: the second caller returns
instantly — important because the driver calls ``queries()`` callables and
``oracle_sql()`` in unknown order.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import synth

FIXTURE_ROOT = "/tmp/graft_fixtures"

# scale knobs (rows at sf): chosen so sf0.01 correctness runs in seconds
# and sf0.1 bench exercises real shuffles; the 10^12 design point scales by
# fragmenting gen_* over Ray (synth.synth_images_dataset) instead.
def sizes(sf: float) -> dict[str, int]:
    return {
        "n_geo": max(2000, int(1_000_000 * sf)),
        "n_img": max(400, int(100_000 * sf)),
        "n_polys": 50,
        "n_nodes": max(1000, int(500_000 * sf)),
        "n_ways": max(150, int(500_000 * sf) // 7),
        "n_knn": min(max(2000, int(1_000_000 * sf)), 2500),
        "n_audio": max(200, int(20_000 * sf)),
        "n_video": max(100, int(10_000 * sf)),
    }


def sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "sfx"


def sf_value(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_tag(sf_dir))
    return float(m.group(1)) if m else 0.01


def fixture_dir(sf_dir: str) -> str:
    return os.path.join(FIXTURE_ROOT, sf_tag(sf_dir))


def fixture_path(sf_dir: str, name: str) -> str:
    return os.path.join(fixture_dir(sf_dir), f"{name}.parquet")


def _edges_table(polygons: pa.Table) -> pa.Table:
    """Polygon rings exploded to directed edges — the oracle surface for the
    even-odd ray-cast (each edge row joins against candidate points in SQL
    with the *same* float expressions as geo.point_in_polygon). The explode
    itself is geo.ring_edges — the ONE edge definition the engine-side
    nearest-boundary kernel also consumes (review: two copies could
    silently diverge the contract pair)."""
    from ..functions.geo import ring_edges
    x1, y1, x2, y2, pid = ring_edges(polygons)
    return pa.table({
        "polygon_id": pa.array(pid, pa.string()),
        "x1": pa.array(x1, pa.float64()), "y1": pa.array(y1, pa.float64()),
        "x2": pa.array(x2, pa.float64()), "y2": pa.array(y2, pa.float64()),
    })


def _embeddings_dup_table(sf_dir: str, n_base: int = 500,
                          n_dups: int = 40) -> pa.Table:
    """Deterministic near-dup embeddings fixture: the first ``n_base``
    driver embedding vectors + ``n_dups`` tiny-perturbation copies
    (cosine ≈ 1−1e-8, far above any natural pair — max natural cosine in
    the driver table is ~0.51). Gives the embedding near-dup operator a
    NON-VACUOUS oracle-checkable pair set (round-1 check returned 0 rows).
    """
    src = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    n_base = min(n_base, src.num_rows)
    src = src.slice(0, n_base)
    ids = np.asarray(src["vec_id"].to_pylist(), dtype=np.int64)
    vecs = np.asarray(src["embedding"].to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(42)
    n_dups = min(n_dups, n_base)
    scale = np.linalg.norm(vecs[:n_dups], axis=1, keepdims=True) * 1e-4
    pert = vecs[:n_dups] + rng.standard_normal(vecs[:n_dups].shape) * scale
    dup_ids = ids.max() + 1 + np.arange(n_dups, dtype=np.int64)
    return pa.table({
        "vec_id": pa.array(np.concatenate([ids, dup_ids]), pa.int64()),
        "embedding": pa.array(np.concatenate([vecs, pert]).tolist(),
                              pa.list_(pa.float64())),
    })


def _docs_dup_table(sf_dir: str, n_base: int = 200,
                    n_dups: int = 20) -> pa.Table:
    """Near-dup documents fixture: the first ``n_base`` driver docs with
    ≥30 whitespace tokens + ``n_dups`` copies each extended by one unique
    marker token (word-shingle Jaccard ≈ (T-2)/(T+1) ≈ 0.95 ≫ τ=0.8) —
    gives the n-gram-Jaccard dedup operator an oracle-checkable pair set
    whose SQL twin computes the SAME shingle-set Jaccard over ALL pairs."""
    import re as _re
    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    ids = src["doc_id"].to_pylist()
    texts = src["text"].to_pylist()
    keep = [(i, t) for i, t in zip(ids, texts)
            if len(_re.findall(r"\S+", t)) >= 30][:n_base]
    base_ids = [i for i, _ in keep]
    base_txt = [t for _, t in keep]
    n_dups = min(n_dups, len(keep))
    nxt = max(ids) + 1
    dup_ids = [nxt + k for k in range(n_dups)]
    dup_txt = [base_txt[k] + f" dupmarker{k}" for k in range(n_dups)]
    return pa.table({
        "doc_id": pa.array(base_ids + dup_ids, pa.int64()),
        "text": pa.array(base_txt + dup_txt, pa.string()),
    })


def _write_atomic(table: pa.Table, path: str,
                  row_group_size: int = 100_000) -> None:
    """Row groups sized so read_parquet yields multiple parallel blocks —
    a single-row-group file reads as ONE block and serializes the whole
    downstream pipeline."""
    tmp = path + ".tmp"
    pq.write_table(table, tmp, compression="zstd", row_group_size=row_group_size)
    os.replace(tmp, path)


def materialize(sf_dir: str) -> str:
    """Ensure every fixture parquet for this sf exists; returns the dir."""
    d = fixture_dir(sf_dir)
    os.makedirs(d, exist_ok=True)
    sz = sizes(sf_value(sf_dir))

    def need(name: str) -> bool:
        return not os.path.exists(fixture_path(sf_dir, name))

    if need("geo"):
        _write_atomic(synth.gen_geo_table(0, sz["n_geo"]), fixture_path(sf_dir, "geo"))
    if need("knn_pts"):
        geo = pq.read_table(fixture_path(sf_dir, "geo"),
                            columns=["image_id", "lon", "lat"])
        _write_atomic(geo.slice(0, sz["n_knn"]), fixture_path(sf_dir, "knn_pts"))
    if need("images"):
        _write_atomic(synth.gen_images_table(0, sz["n_img"]),
                      fixture_path(sf_dir, "images"), row_group_size=2048)
    if need("polygons") or need("edges"):
        polys = synth.gen_polygons_table(sz["n_polys"])
        _write_atomic(polys, fixture_path(sf_dir, "polygons"))
        _write_atomic(_edges_table(polys), fixture_path(sf_dir, "edges"))
    if need("audio"):
        _write_atomic(synth.gen_audio_table(0, sz["n_audio"]),
                      fixture_path(sf_dir, "audio"), row_group_size=1024)
    if need("videos"):
        _write_atomic(synth.gen_video_table(0, sz["n_video"]),
                      fixture_path(sf_dir, "videos"), row_group_size=512)
    if need("embeddings_dup"):
        _write_atomic(_embeddings_dup_table(sf_dir),
                      fixture_path(sf_dir, "embeddings_dup"))
    if need("docs_dup"):
        _write_atomic(_docs_dup_table(sf_dir),
                      fixture_path(sf_dir, "docs_dup"), row_group_size=32)
    if need("nodes") or need("ways") or need("way_nodes") or need("tags"):
        nodes, ways, way_nodes, tags = synth.gen_osm_tables(sz["n_nodes"], sz["n_ways"])
        _write_atomic(nodes, fixture_path(sf_dir, "nodes"))
        _write_atomic(ways, fixture_path(sf_dir, "ways"))
        _write_atomic(way_nodes, fixture_path(sf_dir, "way_nodes"))
        _write_atomic(tags, fixture_path(sf_dir, "tags"))
    return d


def table_join_partitions(sf_dir: str, *names: str,
                          target_bytes: int = 64 << 20) -> int:
    """Size-aware hash-join partition count: one partition per ~64 MB of
    the named input files (parquet metadata only — nothing executes),
    floored at 2. ``util.join_kwargs`` still caps it at cluster CPUs/2,
    so it grows with data volume and never starves a small cluster."""
    total = 0
    for n in names:
        materialize(sf_dir)
        p = fixture_path(sf_dir, n)
        if not os.path.exists(p):
            p = os.path.join(sf_dir, f"{n}.parquet")
        try:
            total += os.path.getsize(p)
        except OSError:
            pass
    return max(2, total // target_bytes)


def read_fixture(sf_dir: str, name: str, columns: list[str] | None = None):
    """Fixture as a Ray Dataset (materializing first if needed), with column
    pruning pushed into the parquet read."""
    import ray.data as rd
    materialize(sf_dir)
    return rd.read_parquet(fixture_path(sf_dir, name), columns=columns)


def driver_table(sf_dir: str, name: str, columns: list[str] | None = None):
    """One of the driver's own tables (documents, lineitem, …) as a Dataset."""
    import ray.data as rd
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
