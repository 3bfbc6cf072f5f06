"""Driver-contract + flagship pipeline tests at sf0.001 (fast)."""

import json
import os

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_ray_entry", os.path.join(os.path.dirname(__file__), "..",
                                   "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_entry_smoke(entry_mod, tmp_path):
    res = entry_mod.entry()
    df = _to_df(res)
    assert len(df) >= 0
    assert {"polygon_id", "n_images", "n_valid_postcode", "n_in_bbox"} \
        <= set(df.columns)


def test_every_query_has_callable_and_runs_registry_shape(entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 40
    assert set(oracles) <= set(qs)          # no orphan oracles
    assert len(oracles) >= 35


def test_driver_window_is_prefix_and_oracle_paired(entry_mod):
    """The driver correctness-checks a fixed-size prefix of queries();
    the curated window must be exactly that prefix and (except for the
    pixel-bytes tile check, which has no SQL twin) fully oracle-paired."""
    from wrangle_openstreetmap_data_ray.pipelines.registry import _DRIVER_WINDOW
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(_DRIVER_WINDOW) == 50
    assert list(qs)[:50] == _DRIVER_WINDOW
    rows_only_in_window = [k for k in _DRIVER_WINDOW if k not in oracles]
    assert rows_only_in_window == ["render_tile_stats"]


@pytest.mark.parametrize("name", [
    "normalize_streets", "clean_postcodes", "cell_encode_points",
    "pip_join_pairs", "tag_key_classification", "events_hourly",
])
def test_query_matches_oracle_sf0001(entry_mod, name):
    """Spot-check the oracle contract in CI at the smallest sf (the driver
    runs the full set at sf0.01)."""
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    mine = _canon(_to_df(qs[name](SF)))
    # oracle SQL is written against the sf0.01 fixture paths; rewrite for
    # sf0.001 (same operators, smaller data)
    from wrangle_openstreetmap_data_ray.pipelines import fixtures as fx
    fx.materialize(SF)
    sql = oracles[name].replace("/tmp/graft_fixtures/sf0.01",
                                "/tmp/graft_fixtures/sf0.001")
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings", "lineitem", "orders",
              "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    ref = _canon(con.execute(sql).df())
    assert list(mine.columns) == list(ref.columns)
    assert len(mine) == len(ref)
    pd.testing.assert_frame_equal(mine, ref, check_dtype=False,
                                  check_exact=False, rtol=1e-9)


def test_shape_documents_nested_address_golden(entry_mod):
    """The reference's canonical document (SURVEY §1.1): created{...incl.
    timestamp}, pos{lat,lon}, address{housenumber,postcode,street} —
    address pivoted from addr:* tags, normalized/cleaned in the pivot."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wrangle_openstreetmap_data_ray.functions import normalize
    from wrangle_openstreetmap_data_ray.pipelines import fixtures as fx

    qs = entry_mod.queries()
    out = qs["shape_documents_nested"](SF).take_all()
    by_key = {(r["type"], r["id"]): r for r in out}

    tags = pq.read_table(fx.fixture_path(SF, "tags")).to_pandas()
    nodes = pq.read_table(fx.fixture_path(SF, "nodes")).to_pandas()
    ways = pq.read_table(fx.fixture_path(SF, "ways")).to_pandas()
    assert len(out) == len(nodes) + len(ways)

    st = tags[(tags.key == "addr:street") & (tags.elem_kind == "node")].iloc[0]
    doc = by_key[("node", st.elem_id)]
    exp_street = normalize.normalize_street(pa.array([st.value]))[0].as_py()
    assert doc["address"]["street"] == exp_street
    nrow = nodes[nodes.id == st.elem_id].iloc[0]
    assert doc["pos"] == {"lat": nrow.lat, "lon": nrow.lon}
    assert doc["created"]["user"] == nrow.user
    assert doc["created"]["uid"] == str(nrow.uid)
    assert doc["created"]["timestamp"].endswith("Z")         # ISO-8601 UTC

    addr_ids = set(tags[tags.key.str.startswith("addr:")].elem_id)
    no_addr = nodes[~nodes.id.isin(addr_ids)].iloc[0]
    assert by_key[("node", no_addr.id)]["address"] is None   # absent → null
    wrow = ways.iloc[0]
    assert by_key[("way", wrow.id)]["pos"] is None           # ways: no pos


def test_jsonl_sink_roundtrip(entry_mod, tmp_path):
    """S2 [R:data.py::process_map]: nested docs → JSONL (null fields
    omitted, like the reference's dicts) → parse back and spot-check."""
    import json

    from wrangle_openstreetmap_data_ray.sources import osm_xml

    qs = entry_mod.queries()
    docs = qs["shape_documents_nested"](SF)
    out_dir = str(tmp_path / "jsonl")
    n = osm_xml.write_jsonl_docs(docs, out_dir)
    rows = []
    for f in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, f)) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == n == docs.count()
    with_addr = [r for r in rows if "address" in r]
    assert with_addr and all("street" in r["address"] or
                             "postcode" in r["address"] or
                             "housenumber" in r["address"]
                             for r in with_addr)
    ways = [r for r in rows if r["type"] == "way"]
    assert ways and all("pos" not in r for r in ways)   # absent, not null
    assert all(set(r["created"]) <= {"version", "changeset", "timestamp",
                                     "user", "uid"} for r in rows[:50])


def test_flagship_resume_skips_rewrite(ray_session, tmp_path):
    """SURVEY.md §5.4 — a second run with the same lineage reuses the
    committed manifest instead of rewriting."""
    from wrangle_openstreetmap_data_ray.pipelines import flagship
    from wrangle_openstreetmap_data_ray.sources import lancelike
    root = str(tmp_path / "flag")
    df1 = _canon(_to_df(flagship.flagship(SF, out_root=root)))
    v1 = lancelike.latest_manifest(root)["version"]
    df2 = _canon(_to_df(flagship.flagship(SF, out_root=root)))
    v2 = lancelike.latest_manifest(root)["version"]
    assert v1 == v2                      # resumed, not rewritten
    pd.testing.assert_frame_equal(df1, df2)


def test_lancelike_resume_invalidated_by_fingerprint_and_lost_frags(
        ray_session, tmp_path):
    """Resume must NOT reuse a checkpoint when the input fingerprint
    changed or a referenced fragment file vanished (round-1 advice)."""
    import pyarrow as pa
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.sources import lancelike
    root = str(tmp_path / "fp")
    ds = rd.from_arrow(pa.table({"x": list(range(50))}))
    m1 = lancelike.write_dataset(ds, root, stage="s", fingerprint="fpA")
    # same fingerprint → resumed
    m2 = lancelike.write_dataset(ds, root, stage="s", fingerprint="fpA")
    assert m2["version"] == m1["version"]
    # different fingerprint (input changed) → rewritten
    m3 = lancelike.write_dataset(ds, root, stage="s", fingerprint="fpB")
    assert m3["version"] > m2["version"]
    # fragment file lost (e.g. /tmp cleared) → rewritten, not stale-served
    lost = os.path.join(root, m3["fragments"][0]["path"])
    os.remove(lost)
    m4 = lancelike.write_dataset(ds, root, stage="s", fingerprint="fpB")
    assert m4["version"] > m3["version"]
    assert lancelike.read_dataset(root).count() == 50


def test_lancelike_partitioned_write_and_prune(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.sources import lancelike
    root = str(tmp_path / "ptbl")
    ds = rd.from_arrow(pa.table({
        "x": list(range(100)),
        "shard": [i % 4 for i in range(100)],
    }))
    man = lancelike.write_dataset_partitioned(ds, root, stage="s1",
                                              partition_col="shard")
    assert man["metrics"]["partition_rows"] == {str(i): 25 for i in range(4)}
    only2 = lancelike.read_dataset(root, partitions=["2"]).take_all()
    assert len(only2) == 25 and all(r["shard"] == 2 for r in only2)
    assert lancelike.read_dataset(root).count() == 100
    # resume: same lineage → same manifest, nothing rewritten
    man2 = lancelike.write_dataset_partitioned(ds, root, stage="s1",
                                               partition_col="shard")
    assert man2["version"] == man["version"]


def test_lancelike_crash_leaves_no_committed_garbage(ray_session, tmp_path):
    """A fragment written without a manifest commit is invisible to readers
    (the crash-mid-write story)."""
    import pyarrow as pa
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.sources import lancelike
    root = str(tmp_path / "tbl")
    ds = rd.from_arrow(pa.table({"x": list(range(100))}))
    lancelike.write_dataset(ds, root, stage="s1", parent=None)
    n1 = lancelike.dataset_row_count(root)
    # simulate a crashed later stage: orphan fragment, no manifest commit
    frag_dir = os.path.join(root, "fragments")
    with open(os.path.join(frag_dir, "frag-orphan.parquet"), "wb") as f:
        f.write(b"garbage")
    assert lancelike.dataset_row_count(root) == n1
    got = lancelike.read_dataset(root).count()
    assert got == 100
