"""Fixture determinism, Lance-like sink/source + resume, OSM XML conformance."""

import os

import numpy as np
import pyarrow as pa
import pytest

from wrangle_openstreetmap_data_ray import synth
from wrangle_openstreetmap_data_ray.functions import codecs, geo
from wrangle_openstreetmap_data_ray.sources import lancelike, osm_xml


def test_images_deterministic_and_batch_invariant():
    a = synth.gen_images_table(0, 50)
    b = pa.concat_tables([synth.gen_images_table(0, 20), synth.gen_images_table(20, 30)])
    assert a.equals(b)


def test_images_dup_injection_and_phash():
    t = synth.gen_images_table(90, 20)  # covers idx 99 (dup of 98)
    d = {r["image_id"]: r for r in t.to_pylist()}
    assert d["img000000000099"]["phash"] == d["img000000000098"]["phash"]
    assert d["img000000000099"]["bytes"] == d["img000000000098"]["bytes"]


def test_images_decode_all_rows():
    t = synth.gen_images_table(0, 40)
    for r in t.to_pylist():
        img = codecs.decode(r["bytes"], r["fmt"], r["w"], r["h"])
        assert img.shape == (r["h"], r["w"], 3)


def test_geo_skew_and_quarantine_fractions():
    t = synth.gen_geo_table(0, 5000)
    m = geo.bbox_contains(t["lon"].to_numpy(), t["lat"].to_numpy())
    assert 0.85 < m.mean() < 0.95  # ~10% out-of-bbox by construction


def test_polygons_valid_rings():
    t = synth.gen_polygons_table(50)
    assert t.num_rows == 50
    for r in t.to_pylist():
        assert len(r["ring"]) >= 6
        assert r["bbox_w"] < r["bbox_e"] and r["bbox_s"] < r["bbox_n"]


def test_osm_xml_roundtrip():
    nodes, ways, way_nodes, tags = synth.gen_osm_tables(n_nodes=50, n_ways=10)
    xml = osm_xml.write_osm_xml(nodes, ways, way_nodes, tags)
    n2, w2, wn2, t2 = osm_xml.parse_osm_bytes(xml)
    assert n2.num_rows == nodes.num_rows
    assert w2.num_rows == ways.num_rows
    assert wn2.num_rows == way_nodes.num_rows
    assert t2.num_rows == tags.num_rows
    # order-significant node_refs preserved
    assert wn2.sort_by([("way_id", "ascending"), ("position", "ascending")]).equals(
        way_nodes.sort_by([("way_id", "ascending"), ("position", "ascending")]))
    counts = osm_xml.count_tags_bytes(xml)
    assert counts["node"] == 50 and counts["way"] == 10


def test_lancelike_write_read_resume(ray_session, tmp_path):
    import ray.data as rd
    root = str(tmp_path / "tbl")
    t = synth.gen_geo_table(0, 1000)
    ds = rd.from_arrow(t).repartition(4)
    man1 = lancelike.write_dataset(ds, root, stage="synth", parent=None)
    assert man1["total_rows"] == 1000
    assert len(man1["fragments"]) >= 1
    # resume: same stage+parent → skipped, same manifest version
    man2 = lancelike.write_dataset(ds, root, stage="synth", parent=None)
    assert man2["version"] == man1["version"]
    # new stage → new version
    man3 = lancelike.write_dataset(ds, root, stage="clean", parent="synth")
    assert man3["version"] == man1["version"] + 1
    back = lancelike.read_dataset(root, columns=["image_id", "lon"])
    assert back.count() == 1000
    assert set(back.schema().names) == {"image_id", "lon"}
    assert lancelike.dataset_row_count(root) == 1000


def test_lancelike_zonemap_prunes_and_matches_full_scan(ray_session, tmp_path):
    import ray.data as rd
    root = str(tmp_path / "zm")
    t = synth.gen_geo_table(0, 2000)
    ds = rd.from_arrow(t).repartition(8)
    man = lancelike.write_dataset(ds.sort("lon"), root, stage="zm",
                                  zonemap_cols=["lon"])
    assert all("zonemap" in f and "lon" in f["zonemap"]
               for f in man["fragments"] if f["rows"])
    lons = np.sort(t["lon"].to_numpy())
    lo, hi = float(lons[len(lons) // 3]), float(lons[len(lons) // 2])
    out, scanned, total = lancelike.read_dataset_range(
        root, "lon", lo, hi, columns=["image_id", "lon"])
    got = sorted(r["image_id"] for r in out.take_all())
    mask = (t["lon"].to_numpy() >= lo) & (t["lon"].to_numpy() <= hi)
    want = sorted(np.asarray(t["image_id"].to_pylist())[mask])
    assert got == list(want) and len(got) > 100
    assert 0 < scanned < total          # pruning actually skipped fragments
    # out-of-domain range: zero fragments opened, empty result
    _, s0, t0 = lancelike.read_dataset_range(root, "lon", 1.0, 2.0)
    assert s0 == 0 and t0 == total
    # merge_upsert keeps zone maps on fragments it carries by reference
    upd = rd.from_arrow(t.slice(0, 3))
    man2 = lancelike.merge_upsert(upd, root, key_col="image_id", stage="m")
    carried = [f for f in man2["fragments"] if f.get("zonemap")]
    assert carried                      # untouched fragments kept their maps


def test_lancelike_compact_preserves_rows_and_zonemaps(ray_session, tmp_path):
    import ray.data as rd
    root = str(tmp_path / "cp")
    t = synth.gen_geo_table(0, 3000)
    man = lancelike.write_dataset(rd.from_arrow(t).repartition(16).sort("lon"),
                                  root, stage="s", zonemap_cols=["lon"])
    assert len(man["fragments"]) >= 8
    big_target = 4 * 1024 * 1024
    man2 = lancelike.compact(root, stage="c", target_bytes=big_target,
                             zonemap_cols=["lon"])
    assert man2["version"] == man["version"] + 1
    assert len(man2["fragments"]) < len(man["fragments"])
    assert man2["total_rows"] == 3000
    # content identical (ids and lons), zone maps recomputed on rewrites
    back = lancelike.read_dataset(root, columns=["image_id", "lon"])
    assert sorted(r["image_id"] for r in back.take_all()) \
        == sorted(t["image_id"].to_pylist())
    assert all("zonemap" in f for f in man2["fragments"])
    # zone-map pruned range reads still work on the compacted version
    out, scanned, total = lancelike.read_dataset_range(
        root, "lon", 103.0, 104.5, columns=["image_id"])
    assert out.count() == int(((t["lon"].to_numpy() >= 103.0)
                               & (t["lon"].to_numpy() <= 104.5)).sum())
    # zonemap_cols defaulted from the manifest (none were passed above
    # on the recompact) — and recompacting when nothing can be merged is
    # a NO-OP (singleton bins carried, never rewritten 1:1)
    man3 = lancelike.compact(root, stage="c2", target_bytes=big_target)
    assert man3["version"] == man2["version"]
    # partitioned layouts are refused (cross-partition rewrite would
    # break partition-pruned reads)
    root2 = str(tmp_path / "zp")
    t2 = t.append_column("shard", pa.array(
        (np.arange(len(t)) % 3).astype(np.int64)))
    lancelike.write_dataset_partitioned(rd.from_arrow(t2).repartition(4),
                                        root2, stage="p",
                                        partition_col="shard")
    with pytest.raises(ValueError, match="partitioned"):
        lancelike.compact(root2, stage="c")


def test_systematic_sample(ray_session):
    import ray.data as rd
    nodes, *_ = synth.gen_osm_tables(n_nodes=200, n_ways=1)
    ds = rd.from_arrow(nodes)
    sampled = osm_xml.systematic_sample(ds, 10, id_col="id")
    got = sorted(r["id"] for r in sampled.take_all())
    expect = sorted(i for i in nodes["id"].to_pylist() if i % 10 == 0)
    assert got == expect


def test_lancelike_bloom_point_lookup(ray_session, tmp_path):
    """Bloom point gets: no false negatives ever, effective pruning for
    few keys, zero fragments for an absent key outside every bloom."""
    import pyarrow as pa
    import ray.data as rd
    root = str(tmp_path / "bl")
    n = 4000
    rng = np.random.default_rng(7)
    key = rng.permutation(n).astype(np.int64) * 10     # sparse key space
    t = pa.table({"k": key, "v": np.arange(n, dtype=np.int64)})
    man = lancelike.write_dataset(rd.from_arrow(t).repartition(16), root,
                                  stage="bl", bloom_cols=["k"])
    assert all("bloom" in f and "k" in f["bloom"]
               for f in man["fragments"] if f["rows"])
    # every inserted key is found exactly (superset pruning + exact filter)
    probe = [int(key[13]), int(key[999]), int(key[3777])]
    out, scanned, total = lancelike.read_dataset_keys(
        root, "k", probe, columns=["k", "v"])
    got = sorted((r["k"], r["v"]) for r in out.take_all())
    want = sorted((int(k), int(np.where(key == k)[0][0])) for k in probe)
    assert got == want
    assert 0 < scanned < total           # pruning skipped fragments
    # absent key (odd — all real keys are multiples of 10): with a 1 KiB
    # bloom per ~250-key fragment the false-positive rate is ~1e-5, so
    # requiring <= 1 spurious fragment is deterministic for this seed
    out0, s0, _ = lancelike.read_dataset_keys(root, "k", [3], ["k", "v"])
    assert s0 <= 1 and out0.count() == 0
    # brute-force: every key tests positive in its own fragment's bloom
    for f in man["fragments"]:
        if not f["rows"]:
            continue
        import pyarrow.parquet as pq
        frag = pq.read_table(root + "/" + f["path"])
        ks = frag["k"].to_numpy()
        assert lancelike._bloom_any_hit(f["bloom"]["k"], ks[:5])


def test_lancelike_vacuum_gc(ray_session, tmp_path):
    import os

    import pytest
    import ray.data as rd
    root = str(tmp_path / "vac")
    t = synth.gen_geo_table(0, 2000)
    man1 = lancelike.write_dataset(rd.from_arrow(t).repartition(8), root,
                                   stage="base")
    man2 = lancelike.compact(root, stage="c",
                             target_bytes=64 * 1024 * 1024)
    assert man2["version"] == man1["version"] + 1
    # a crashed-task strand should be GC'd too
    strand = os.path.join(root, "fragments", ".frag-dead.parquet.tmp")
    open(strand, "wb").close()
    stats = lancelike.vacuum(root, keep_versions=1)
    assert stats["kept_versions"] == [man2["version"]]
    assert stats["removed_manifests"] == 1
    assert stats["removed_fragments"] >= 1
    assert not os.path.exists(strand)
    # old version unreadable, latest intact and content-identical
    with pytest.raises(FileNotFoundError):
        lancelike.read_dataset(root, version=man1["version"])
    back = lancelike.read_dataset(root, columns=["image_id"])
    assert sorted(r["image_id"] for r in back.take_all()) \
        == sorted(t["image_id"].to_pylist())
    # every surviving file is referenced; keep_versions must be >= 1
    kept = {f["path"] for f in lancelike.latest_manifest(root)["fragments"]}
    on_disk = set()
    fdir = os.path.join(root, "fragments")
    for dirpath, _dirs, files in os.walk(fdir):
        for name in files:
            on_disk.add(os.path.relpath(os.path.join(dirpath, name), root))
    assert on_disk == kept
    with pytest.raises(ValueError):
        lancelike.vacuum(root, keep_versions=0)
    # vacuum with everything kept removes nothing further
    stats2 = lancelike.vacuum(root, keep_versions=5)
    assert stats2["removed_manifests"] == 0
    assert stats2["removed_fragments"] == 0
    # grace window protects an in-flight writer's uncommitted fragments
    strand2 = os.path.join(root, "fragments", ".frag-live.parquet.tmp")
    open(strand2, "wb").close()
    stats3 = lancelike.vacuum(root, keep_versions=1, grace_s=3600)
    assert stats3["removed_fragments"] == 0
    assert os.path.exists(strand2)
    stats4 = lancelike.vacuum(root, keep_versions=1)
    assert stats4["removed_fragments"] == 1
    assert not os.path.exists(strand2)


def test_lancelike_add_column_backfill(ray_session, tmp_path):
    import pyarrow as pa
    import pytest
    import ray.data as rd
    root = str(tmp_path / "evo")
    t = synth.gen_geo_table(0, 1500)
    man1 = lancelike.write_dataset(rd.from_arrow(t).repartition(6), root,
                                   stage="base")

    def add_lon_e4(b: pa.Table) -> pa.Table:
        import numpy as np
        v = np.floor(b["lon"].to_numpy() * 1e4 + 0.5).astype("int64")
        return b.append_column("lon_e4", pa.array(v, pa.int64()))

    man2 = lancelike.add_column(root, stage="evo", compute=add_lon_e4,
                                zonemap_cols=["lon_e4"])
    assert man2["version"] == man1["version"] + 1
    assert man2["total_rows"] == 1500
    assert all("zonemap" in f for f in man2["fragments"])
    back = lancelike.read_dataset(root)
    assert "lon_e4" in back.schema().names
    assert back.count() == 1500
    # old version keeps the old schema (copy-on-write)
    old = lancelike.read_dataset(root, version=man1["version"])
    assert "lon_e4" not in old.schema().names
    # a row-dropping compute must be rejected
    with pytest.raises(Exception):
        lancelike.add_column(root, stage="bad",
                             compute=lambda b: b.slice(0, 0))


def test_lancelike_mor_tombstones(ray_session, tmp_path):
    import pyarrow as pa
    import pytest
    import ray.data as rd
    root = str(tmp_path / "mor")
    t = synth.gen_geo_table(0, 1200)
    man1 = lancelike.write_dataset(rd.from_arrow(t).repartition(4), root,
                                   stage="base")
    ids = t["image_id"].to_pylist()
    # two stacked MoR deletes on the same key column
    man2 = lancelike.delete_by_keys_mor(pa.array(ids[:100]), root,
                                        "image_id", stage="m1")
    man3 = lancelike.delete_by_keys_mor(pa.array(ids[100:150]), root,
                                        "image_id", stage="m2")
    assert len(man3["tombstones"]) == 2
    assert {f["path"] for f in man3["fragments"]} \
        == {f["path"] for f in man1["fragments"]}
    # scan applies both; column-pruned read that drops the key still works
    back = lancelike.read_dataset(root, columns=["lon"])
    assert back.count() == 1200 - 150
    assert set(back.schema().names) == {"lon"}
    got = {r["image_id"] for r in
           lancelike.read_dataset(root, columns=["image_id"]).take_all()}
    assert got == set(ids[150:])
    # CoW verbs refuse; idempotent apply clears and preserves content
    with pytest.raises(ValueError):
        lancelike.merge_upsert(rd.from_arrow(t.slice(0, 2)), root,
                               "image_id", stage="x")
    man4 = lancelike.apply_tombstones(root, stage="mat")
    assert not man4.get("tombstones")
    assert man4["total_rows"] == 1050
    assert lancelike.apply_tombstones(root, stage="noop")["version"] \
        == man4["version"]
    # vacuum GCs the now-unreferenced tombstone files
    lancelike.vacuum(root, keep_versions=1)
    import os
    tdir = os.path.join(root, "_tombstones")
    assert not os.path.isdir(tdir) or not os.listdir(tdir)


def test_lancelike_mor_upsert_sequence_scoping(ray_session, tmp_path):
    """merge_upsert_mor: zero-rewrite commit; the tombstone masks only
    OLDER fragments (an MoR delete then an MoR re-insert of the same key
    must show the new row); stacked generations; scoped apply_tombstones
    never eats re-inserted rows and matches the pre-apply scan."""
    import pyarrow as pa
    import ray.data as rd
    root = str(tmp_path / "mor_up")
    base = pa.table({"k": pa.array(range(1000), pa.int64()),
                     "v": pa.array([f"old{i}" for i in range(1000)])})
    man1 = lancelike.write_dataset(rd.from_arrow(base).repartition(4),
                                   root, stage="base")
    # MoR delete keys 0..99, then MoR-upsert 50..149 with new values:
    # 0..49 stay deleted, 50..149 show NEW values, 150.. show old
    lancelike.delete_by_keys_mor(pa.array(range(100), pa.int64()), root,
                                 "k", stage="d1")
    upd = pa.table({"k": pa.array(range(50, 150), pa.int64()),
                    "v": pa.array([f"new{i}" for i in range(50, 150)])})
    man3 = lancelike.merge_upsert_mor(rd.from_arrow(upd), root, "k",
                                      stage="u1")
    assert man3["metrics"]["new_fragments"] >= 1
    assert len(man3["tombstones"]) == 2
    # every base fragment carried by reference — the MoR property
    assert {f["path"] for f in man1["fragments"]} \
        <= {f["path"] for f in man3["fragments"]}

    def snapshot():
        rows = lancelike.read_dataset(root).take_all()
        assert len({r["k"] for r in rows}) == len(rows), "dup keys"
        return {r["k"]: r["v"] for r in rows}

    want = {i: f"old{i}" for i in range(150, 1000)}
    want.update({i: f"new{i}" for i in range(50, 150)})
    got_mor = snapshot()
    assert got_mor == want
    # second stacked upsert generation overrides the first
    upd2 = pa.table({"k": pa.array([50, 60], pa.int64()),
                     "v": pa.array(["newer50", "newer60"])})
    lancelike.merge_upsert_mor(rd.from_arrow(upd2), root, "k", stage="u2")
    want[50], want[60] = "newer50", "newer60"
    assert snapshot() == want
    # one-pass scoped materialization: same content, tombstones cleared,
    # re-inserted rows intact
    man5 = lancelike.apply_tombstones(root, stage="mat")
    assert not man5.get("tombstones")
    assert snapshot() == want
    assert man5["total_rows"] == len(want)
    # and the metadata row count is exact again after materialization
    assert lancelike.dataset_row_count(root) == len(want)


def test_lancelike_tags_pin_versions_through_vacuum(ray_session, tmp_path):
    import pytest
    import ray.data as rd
    root = str(tmp_path / "tags")
    t = synth.gen_geo_table(0, 500)
    man1 = lancelike.write_dataset(rd.from_arrow(t).repartition(4), root,
                                   stage="v1")
    ref = lancelike.create_tag(root, "prod")
    assert ref["version"] == man1["version"]
    with pytest.raises(FileExistsError):
        lancelike.create_tag(root, "prod")
    man2 = lancelike.write_dataset(rd.from_arrow(t.slice(0, 100)), root,
                                   stage="v2", resume=False)
    man3 = lancelike.write_dataset(rd.from_arrow(t.slice(0, 50)), root,
                                   stage="v3", resume=False)
    stats = lancelike.vacuum(root, keep_versions=1)
    # tagged v1 + newest v3 retained; untagged v2 expired
    assert sorted(stats["kept_versions"]) == [man1["version"],
                                              man3["version"]]
    v = lancelike.resolve_tag(root, "prod")
    back = lancelike.read_dataset(root, columns=["image_id"], version=v)
    assert back.count() == 500
    # force-move the tag, then delete it; vacuum can then expire v1
    lancelike.create_tag(root, "prod", man3["version"], force=True)
    lancelike.delete_tag(root, "prod")
    stats2 = lancelike.vacuum(root, keep_versions=1)
    assert stats2["kept_versions"] == [man3["version"]]
    with pytest.raises(FileNotFoundError):
        lancelike.resolve_tag(root, "prod")


def test_point_get_respects_mor_tombstones_and_mutations_keep_blooms(
        ray_session, tmp_path):
    """Review regressions: (1) read_dataset_keys must NOT resurrect
    merge-on-read-deleted rows; (2) merge/compact/delete rewrites keep
    bloom metadata so point-get pruning survives maintenance."""
    import pyarrow as pa
    import ray.data as rd
    root = str(tmp_path / "morbl")
    key = np.arange(2000, dtype=np.int64) * 10
    t = pa.table({"k": key, "v": np.arange(2000, dtype=np.int64)})
    lancelike.write_dataset(rd.from_arrow(t).repartition(8), root,
                            stage="b", bloom_cols=["k"])
    # MoR delete key 130, then point-get it: must be gone
    lancelike.delete_by_keys_mor(pa.array([130], pa.int64()), root, "k",
                                 stage="d")
    out, _s, _t = lancelike.read_dataset_keys(root, "k", [130, 500],
                                              ["k", "v"])
    got = sorted(r["k"] for r in out.take_all())
    assert got == [500]                      # 130 stays deleted
    lancelike.apply_tombstones(root, stage="mat")
    # CoW delete + merge + compact: blooms survive on every fragment
    lancelike.delete_by_keys(pa.array([500], pa.int64()), root, "k",
                             stage="cd")
    upd = rd.from_arrow(pa.table({"k": pa.array([40], pa.int64()),
                                  "v": pa.array([999], pa.int64())}))
    lancelike.merge_upsert(upd, root, "k", stage="m")
    lancelike.compact(root, stage="c", target_bytes=1 << 20)
    man = lancelike.latest_manifest(root)
    assert all("bloom" in f and "k" in f["bloom"]
               for f in man["fragments"] if f["rows"])
    out2, s2, t2 = lancelike.read_dataset_keys(root, "k", [40], ["k", "v"])
    rows = out2.take_all()
    assert [(r["k"], r["v"]) for r in rows] == [(40, 999)]
    assert 0 < s2 <= t2
    # dot-named tags are rejected (vacuum would not see them)
    with pytest.raises(ValueError):
        lancelike.create_tag(root, ".prod")


def test_lancelike_fts_index_search_and_staleness(ray_session, tmp_path):
    import pyarrow as pa
    import pytest
    import ray.data as rd
    root = str(tmp_path / "fts")
    t = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "body": pa.array(["red fox jumps", "red dog", "blue fox",
                          "green tree", "red fox den", "dog park"])})
    ds = rd.from_arrow(t).repartition(3)
    lancelike.write_dataset(ds, root, stage="docs", parent=None)
    man = lancelike.create_inverted_index(root, "body", "doc_id",
                                          n_buckets=4)
    assert man["metrics"]["index_of_version"] == 1
    # AND: docs containing both 'red' and 'fox'
    out, scanned, total = lancelike.search_inverted_index(
        root, "body", ["red", "fox"], mode="and")
    assert sorted(r["key"] for r in out.take_all()) == [0, 4]
    assert scanned <= total
    # OR: union, each key once
    out_or, _, _ = lancelike.search_inverted_index(
        root, "body", ["red", "fox"], mode="or")
    assert sorted(r["key"] for r in out_or.take_all()) == [0, 1, 2, 4]
    # duplicate query tokens collapse (AND count uses DISTINCT tokens)
    out_dup, _, _ = lancelike.search_inverted_index(
        root, "body", ["red", "red"], mode="and")
    assert sorted(r["key"] for r in out_dup.take_all()) == [0, 1, 4]
    # data moved past the indexed version → stale index refuses
    upd = rd.from_arrow(pa.table({
        "doc_id": pa.array([99], pa.int64()),
        "body": pa.array(["red fox returns"])}))
    lancelike.merge_upsert(upd, root, "doc_id", stage="upd")
    with pytest.raises(ValueError, match="stale"):
        lancelike.search_inverted_index(root, "body", ["red"])
    # rebuild against the new version → fresh results include the upsert
    lancelike.create_inverted_index(root, "body", "doc_id", n_buckets=4)
    out2, _, _ = lancelike.search_inverted_index(
        root, "body", ["red", "fox"], mode="and")
    assert sorted(r["key"] for r in out2.take_all()) == [0, 4, 99]


def test_lancelike_schema_evolution_verbs(ray_session, tmp_path):
    import ray.data as rd
    root = str(tmp_path / "se")
    t = synth.gen_geo_table(0, 1200)
    ds = rd.from_arrow(t).repartition(6)
    lancelike.write_dataset(ds.sort("lon"), root, stage="base",
                            zonemap_cols=["lon"])

    # metadata-only rename: zero data I/O, range read prunes via the
    # NEW visible name against the on-disk zone maps
    man = lancelike.rename_column(root, "r1", "lon", "longitude")
    assert man["schema_edits"]["renames"] == {"lon": "longitude"}
    lons = np.sort(t["lon"].to_numpy())
    lo, hi = float(lons[300]), float(lons[700])
    out, scanned, total = lancelike.read_dataset_range(
        root, "longitude", lo, hi, columns=["image_id", "longitude"])
    got = sorted(r["image_id"] for r in out.take_all())
    mask = (t["lon"].to_numpy() >= lo) & (t["lon"].to_numpy() <= hi)
    assert got == sorted(np.asarray(t["image_id"].to_pylist())[mask])
    assert 0 < scanned < total

    # the old (pre-rename) name is gone from the visible schema
    with pytest.raises(KeyError):
        lancelike.read_dataset(root, columns=["lon"]).take_all()

    # MoR delete under a pending rename records the DISK key column
    victims = t["image_id"].to_pylist()[:5]
    man2 = lancelike.delete_by_keys_mor(
        pa.array(victims, pa.string()), root, key_col="image_id",
        stage="mor")
    assert man2["tombstones"][0]["key_col"] == "image_id"
    left = lancelike.read_dataset(root, columns=["image_id"]).take_all()
    assert set(victims).isdisjoint({r["image_id"] for r in left})
    lancelike.apply_tombstones(root, stage="apply")

    # rename BACK clears the edit entirely
    man3 = lancelike.rename_column(root, "r2", "longitude", "lon")
    assert not man3.get("schema_edits")

    # drop + guards
    lancelike.drop_column(root, "d1", "addr_postcode")
    with pytest.raises(ValueError):
        lancelike.merge_upsert(rd.from_arrow(t.slice(0, 2)), root,
                               key_col="image_id", stage="bad")
    man4 = lancelike.materialize_schema(root)
    assert not man4.get("schema_edits")
    names = set(lancelike.read_dataset(root).schema().names)
    assert "addr_postcode" not in names and "lon" in names
    # zone maps survived the physical rewrite under the (restored) name
    assert any("lon" in f.get("zonemap", {}) for f in man4["fragments"])
    # duplicate / missing-column guards
    with pytest.raises(KeyError):
        lancelike.rename_column(root, "x", "nope", "y")
    with pytest.raises(ValueError):
        lancelike.rename_column(root, "x", "lat", "lon")


def test_write_dataset_overwrite_clears_schema_edits(ray_session, tmp_path):
    import ray.data as rd
    root = str(tmp_path / "ow")
    t = synth.gen_geo_table(0, 300)
    lancelike.write_dataset(rd.from_arrow(t), root, stage="v1",
                            resume=False)
    lancelike.rename_column(root, "ren", "lon", "longitude")
    # a full overwrite defines its own schema — pending edits must NOT
    # leak onto the new fragments (they are already visible-named)
    lancelike.write_dataset(rd.from_arrow(t), root, stage="v3",
                            resume=False)
    man = lancelike.latest_manifest(root)
    assert not man.get("schema_edits")
    names = set(lancelike.read_dataset(root).schema().names)
    assert "lon" in names and "longitude" not in names


def test_metadata_value_counts_through_mutators(ray_session, tmp_path):
    import ray.data as rd
    root = str(tmp_path / "vc")
    t = synth.gen_images_table(0, 400).select(["image_id", "fmt", "w"])
    lancelike.write_dataset(rd.from_arrow(t).repartition(8), root,
                            stage="base", count_cols=["fmt"])
    import collections
    want = collections.Counter(t["fmt"].to_pylist())
    assert lancelike.metadata_value_counts(root, "fmt") == dict(want)

    # survives merge_upsert (rewritten + carried + new fragments)
    upd = t.slice(0, 5).set_column(
        1, "fmt", pa.array(["raw8"] * 5, pa.string()))
    lancelike.merge_upsert(rd.from_arrow(upd), root, key_col="image_id",
                           stage="m")
    for iid, old in zip(t["image_id"].to_pylist()[:5],
                        t["fmt"].to_pylist()[:5]):
        want[old] -= 1
        want["raw8"] += 1
    assert lancelike.metadata_value_counts(root, "fmt") == \
        {k: v for k, v in want.items() if v}

    # survives compact
    lancelike.compact(root, stage="c", target_bytes=1 << 20)
    assert lancelike.metadata_value_counts(root, "fmt") == \
        {k: v for k, v in want.items() if v}

    # missing counts raise rather than undercount
    with pytest.raises(KeyError):
        lancelike.metadata_value_counts(root, "w")

    # MoR tombstones refuse (metadata would overcount)
    lancelike.delete_by_keys_mor(
        pa.array(t["image_id"].to_pylist()[:2], pa.string()),
        root, key_col="image_id", stage="mor")
    with pytest.raises(ValueError):
        lancelike.metadata_value_counts(root, "fmt")
