"""Stage tests: PIP join, kNN join, tiles, dedup families, simsearch,
multimodal, text analysis — correctness vs exact small-scale references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from wrangle_openstreetmap_data_ray import synth
from wrangle_openstreetmap_data_ray.functions import codecs, geo
from wrangle_openstreetmap_data_ray.functions.text import WS_RE, jaccard_shingles
from wrangle_openstreetmap_data_ray.stages import (dedup, knn, multimodal,
                                                   pip_join, simsearch,
                                                   textstage, tiles)


@pytest.fixture(scope="module")
def geo_points(ray_session):
    import ray.data as rd
    t = synth.gen_geo_table(0, 1500)
    return t, rd.from_arrow(t)


def test_pip_join_matches_bruteforce(geo_points):
    t, ds = geo_points
    polys = synth.gen_polygons_table(25)
    got = pip_join.pip_join(ds, polys, keep_cols=["image_id"]).take_all()
    got_pairs = {(r["image_id"], r["polygon_id"]) for r in got}
    # brute force: every point against every polygon ring
    lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
    ids = t["image_id"].to_pylist()
    expect = set()
    for r in polys.to_pylist():
        rx = np.array([p["lon"] for p in r["ring"]])
        ry = np.array([p["lat"] for p in r["ring"]])
        inside = geo.point_in_polygon(lon, lat, rx, ry)
        for i in np.nonzero(inside)[0]:
            expect.add((ids[i], r["polygon_id"]))
    assert got_pairs == expect
    assert len(expect) > 50  # fixture actually exercises the join


def test_knn_join_matches_exact(ray_session):
    import ray.data as rd
    # dense cluster so ring-1 at res 16 holds the true neighbors
    t = synth.gen_geo_table(0, 400)
    mask = geo.bbox_contains(t["lon"].to_numpy(), t["lat"].to_numpy())
    t = t.filter(pa.array(mask))
    ds = rd.from_arrow(t)
    k = 3
    got = knn.knn_join(ds, k=k, res=14, id_col="image_id", exact=True).take_all()
    got_df = pd.DataFrame(got).sort_values(["id", "dist_m"]).reset_index(drop=True)
    exact = knn.knn_join_exact_small(t, k, id_col="image_id")
    got_map = got_df.groupby("id")["neighbor_id"].apply(set).to_dict()
    exact_map = exact.groupby("id")["neighbor_id"].apply(set).to_dict()
    assert got_map.keys() == exact_map.keys()
    mismatches = [i for i in exact_map if got_map[i] != exact_map[i]]
    assert not mismatches  # exact=True fallback ⇒ byte-exact neighbor sets


def test_knn_salted_same_result(ray_session):
    import ray.data as rd
    t = synth.gen_geo_table(0, 300)
    ds = rd.from_arrow(t)
    a = knn.knn_join(ds, k=2, res=14, id_col="image_id", salt=1).take_all()
    b = knn.knn_join(ds, k=2, res=14, id_col="image_id", salt=4).take_all()
    ka = {(r["id"], r["neighbor_id"]) for r in a}
    kb = {(r["id"], r["neighbor_id"]) for r in b}
    assert ka == kb


def test_radius_join_matches_brute_force(ray_session):
    import ray.data as rd
    t = synth.gen_geo_table(7, 400)
    ds = rd.from_arrow(t)
    radius = 900.0
    got = knn.radius_join(ds, radius_m=radius, id_col="image_id").take_all()
    got_pairs = {(r["id"], r["neighbor_id"]) for r in got}
    lon, lat = t["lon"].to_numpy(), t["lat"].to_numpy()
    ids = np.asarray(t["image_id"].to_pylist())
    d = geo.haversine_m(lon[:, None], lat[:, None], lon[None, :], lat[None, :])
    np.fill_diagonal(d, np.inf)
    rows, cols = np.nonzero(d <= radius)
    want = {(ids[i], ids[j]) for i, j in zip(rows, cols)}
    assert got_pairs == want and len(want) > 50
    # every directed pair emitted exactly once (no dup from ghost groups)
    assert len(got) == len(got_pairs)
    # salted path identical (hot-cell split preserves exactness)
    salted = knn.radius_join(ds, radius_m=radius, id_col="image_id",
                             salt=3).take_all()
    assert {(r["id"], r["neighbor_id"]) for r in salted} == want
    assert len(salted) == len(want)
    # an explicit res too fine for the radius must be REFUSED, not
    # silently drop pairs beyond ring-1 coverage
    with pytest.raises(ValueError, match="ring-1 coverage"):
        knn.radius_join(ds, radius_m=radius, id_col="image_id",
                        res=16).take_all()


def test_decontaminate_matches_string_brute_force(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import textstage
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    docs = [" ".join(rng.choice(vocab, rng.integers(1, 25)))
            for _ in range(120)]          # some docs shorter than n=3
    # leak bench phrases into some corpus docs (the thing to detect)
    for i in range(15, 120, 7):
        src = docs[i % 10].split()
        if len(src) >= 4:
            docs[i] = docs[i] + " " + " ".join(src[:4])
    bench = pd.DataFrame({"doc_id": np.arange(10), "text": docs[:10]})
    corpus = pd.DataFrame({"doc_id": np.arange(10, 120), "text": docs[10:]})

    def shingles(t, n=3):
        toks = t.split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    bset = set().union(*[shingles(t) for t in bench["text"]])
    want = {(int(r.doc_id), len(shingles(r.text) & bset))
            for r in corpus.itertuples() if shingles(r.text) & bset}
    got = textstage.decontaminate(
        rd.from_pandas(corpus).repartition(6), rd.from_pandas(bench),
        shingle_n=3).take_all()
    assert {(r["doc_id"], r["n_hits"]) for r in got} == want and len(want) > 5
    clean = textstage.decontaminate(
        rd.from_pandas(corpus), rd.from_pandas(bench), shingle_n=3,
        keep_clean=True).take_all()
    contaminated_ids = {r["doc_id"] for r in got}
    assert ({r["doc_id"] for r in clean}
            == set(corpus["doc_id"]) - contaminated_ids)


def test_hll_grouped_accuracy_and_determinism(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.sketch import \
        hll_distinct_by_group
    rng = np.random.default_rng(8)
    n = 20_000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", "d"], n, p=[.5, .3, .15, .05]),
        "v": [f"u{int(x)}" for x in rng.integers(0, 3000, n)]})
    got1 = {r["g"]: r["n_distinct_est"] for r in
            hll_distinct_by_group(rd.from_pandas(df).repartition(8),
                                  "g", "v", p=10).take_all()}
    exact = df.groupby("g")["v"].nunique()
    for g, e in exact.items():
        assert abs(got1[g] - e) / e < 0.12       # ~3.3% stderr at p=10
    # deterministic across parallelism (hash-based sketch)
    got2 = {r["g"]: r["n_distinct_est"] for r in
            hll_distinct_by_group(rd.from_pandas(df).repartition(3),
                                  "g", "v", p=10).take_all()}
    assert got1 == got2


def test_triangle_count_matches_matrix_power(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.graph import triangle_count
    rng = np.random.default_rng(2)
    n, m = 60, 400
    e = rng.integers(0, n, (m, 2))    # dups, self-loops, both orientations
    df = pd.DataFrame({"a": e[:, 0], "b": e[:, 1]})
    got = triangle_count(rd.from_pandas(df).repartition(6))
    adj = np.zeros((n, n), bool)
    for x, y in e:
        if x != y:
            adj[x, y] = adj[y, x] = True
    want = int(np.trace(np.linalg.matrix_power(adj.astype(np.int64), 3)) // 6)
    assert got == want and want > 50


def test_part_cooccurrence_kernel_matches_pandas(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.pipelines.registry import queries
    rng = np.random.default_rng(6)
    # baskets with repeats of the same part (must not self-pair) and
    # multiplicity (two distinct rows of p1 with one p2 → count 2)
    df = pd.DataFrame({
        "l_orderkey": rng.integers(0, 60, 400),
        "l_partkey": rng.integers(0, 12, 400)})
    import duckdb
    con = duckdb.connect()
    con.register("lineitem", df)
    want = {(r[0], r[1]): r[2] for r in con.execute(
        """SELECT a.l_partkey, b.l_partkey, COUNT(*) FROM lineitem a
           JOIN lineitem b ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey GROUP BY 1, 2""").fetchall()}
    # drive the same kernel the registry query uses, on this frame
    import wrangle_openstreetmap_data_ray.pipelines.fixtures as fx
    orig = fx.driver_table
    try:
        fx.driver_table = lambda sf, name, columns=None: (
            rd.from_pandas(df[columns] if columns else df).repartition(6))
        got = {(r["p1"], r["p2"]): r["n"]
               for r in queries()["part_cooccurrence"]("unused").take_all()}
    finally:
        fx.driver_table = orig
    assert got == want and len(want) > 30


def test_sq8_quantize_error_bound_and_roundtrip(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.simsearch import sq8_quantize
    rng = np.random.default_rng(4)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    vecs[:, 3] = 7.25                      # constant dim: sc == 0 path
    t = pa.table({"vec_id": pa.array(np.arange(300)),
                  "embedding": pa.array(list(vecs))})
    out = sq8_quantize(rd.from_arrow(t).repartition(5),
                       vec_col="embedding").take_all()
    assert len(out) == 300
    mn = vecs.astype(np.float64).min(axis=0)
    mx = vecs.astype(np.float64).max(axis=0)
    half_step = ((mx - mn) / 255.0).max() / 2.0
    for r in out:
        code = np.frombuffer(r["code"], np.uint8).astype(np.float64)
        assert len(code) == 16
        # max error ≤ half a quantization step (+1 ulp of the e6 fixedpt)
        assert r["max_err_e6"] <= int(half_step * 1e6 + 0.5) + 1
        recon = mn + code * (mx - mn) / 255.0
        v = vecs[r["vec_id"]].astype(np.float64)
        assert np.abs(v - recon).max() * 1e6 <= r["max_err_e6"] + 1
        assert code[3] == 0                # constant dim quantizes to 0


def test_video_scene_scores_golden(ray_session):
    import ray.data as rd
    vids = synth.gen_video_table(0, 12)
    got = {r["video_id"]: r for r in
           multimodal.video_scene_scores(rd.from_arrow(vids)).take_all()}
    assert len(got) == 12
    for idx in range(12):
        frames = synth._video_frames(idx, int(vids["n_frames"][idx].as_py()))
        d = np.abs(frames[:-1].astype(np.int16)
                   - frames[1:].astype(np.int16)).mean(axis=(1, 2, 3))
        j = int(np.argmax(d))
        r = got[f"vid{idx:09d}"]
        assert r["boundary_frame"] == j + 1
        assert r["diff_e4"] == int(np.floor(d[j] * 1e4 + 0.5))


def test_grouped_count_distinct_matches_pandas(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.util import grouped_count_distinct
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"g1": rng.choice(["a", "b", "c"], 5000),
                       "g2": rng.integers(0, 4, 5000),
                       "v": rng.integers(0, 50, 5000)})
    got = grouped_count_distinct(rd.from_pandas(df).repartition(8),
                                 ["g1", "g2"], "v",
                                 out_col="n_distinct").take_all()
    got_map = {(r["g1"], r["g2"]): r["n_distinct"] for r in got}
    want = df.groupby(["g1", "g2"])["v"].nunique()
    assert got_map == {k: int(v) for k, v in want.items()}
    assert len(got) == len(got_map)      # one row per group


def test_repetition_stats_hand_computed(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import textstage
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "text": ["a a a a",
                                "x y x y x",
                                "unique words only here",
                                "solo"]})
    got = {r["doc_id"]: r for r in
           textstage.repetition_stats(rd.from_pandas(df)).take_all()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["distinct_token_ratio"] == 0.25
    assert got[1]["top_bigram_frac"] == 1.0         # "a a" is every bigram
    assert got[2]["distinct_token_ratio"] == 0.4
    assert got[2]["top_bigram_frac"] == 0.5          # "x y" 2 of 4 bigrams
    assert got[3]["distinct_token_ratio"] == 1.0
    assert got[4]["n_tokens"] == 1                   # < 2 tokens: no bigrams
    assert got[4]["top_bigram_frac"] == 0.0


def test_interval_overlap_join_matches_brute_force(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import interval
    rng = np.random.default_rng(11)
    W = 1000

    def mk(prefix, n):
        s = rng.integers(0, 50_000, n)
        # adversarial lengths: zero-length, sub-bucket, multi-bucket spans
        ln = rng.choice([0, 1, 37, 999, 1000, 1001, 4999], n)
        return pd.DataFrame({"iid": [f"{prefix}{i}" for i in range(n)],
                             "s": s, "e": s + ln})
    A, B = mk("a", 300), mk("b", 260)
    got = interval.interval_overlap_join(
        rd.from_pandas(A).repartition(5), rd.from_pandas(B).repartition(4),
        bucket_us=W, a_id="iid", b_id="iid",
        out_a="a", out_b="b").take_all()
    pairs = [(r["a"], r["b"]) for r in got]
    want = {(ra.iid, rb.iid) for ra in A.itertuples() for rb in B.itertuples()
            if ra.s <= rb.e and rb.s <= ra.e}
    assert set(pairs) == want and len(want) > 100
    assert len(pairs) == len(set(pairs))   # canonical-bucket emission: no dups


def test_tiles_deterministic_and_decodable(ray_session):
    import ray.data as rd
    imgs = synth.gen_images_table(0, 120)
    g = synth.gen_geo_table(0, 120)
    joined = imgs.join(g, keys="image_id")
    ds = rd.from_arrow(joined)
    out1 = {r["tile_id"]: r for r in tiles.render_tiles(ds, tile_res=10).take_all()}
    out2 = {r["tile_id"]: r for r in
            tiles.render_tiles(rd.from_arrow(joined).repartition(7), tile_res=10).take_all()}
    assert out1.keys() == out2.keys() and len(out1) > 1
    for tid in out1:
        assert out1[tid]["png"] == out2[tid]["png"]  # parallelism-invariant bytes
        img = codecs.decode_png(out1[tid]["png"])
        assert img.shape == (tiles.TILE_PX, tiles.TILE_PX, 3)
    assert sum(r["n_images"] for r in out1.values()) == 120


def test_exact_dedup(ray_session):
    import ray.data as rd
    imgs = synth.gen_images_table(0, 300)
    ds = rd.from_arrow(imgs)
    out = dedup.exact_dedup(ds, "phash", "image_id").take_all()
    phs = imgs["phash"].to_pylist()
    assert len(out) == len(set(phs)) < 300
    # representative = min image_id per phash
    keep = {}
    for r in imgs.to_pylist():
        keep.setdefault(r["phash"], min)  # placeholder
    expect = {}
    for r in imgs.to_pylist():
        if r["phash"] not in expect or r["image_id"] < expect[r["phash"]]:
            expect[r["phash"]] = r["image_id"]
    assert sorted(r["image_id"] for r in out) == sorted(expect.values())


def test_exact_dedup_key_equals_tie(ray_session):
    """key_col == tie_col (pure global distinct, registry
    uids_in_both_nodes_and_ways shape) — the Arrow pre-reduce must not
    build a duplicate-named select() (ambiguous FieldRef regression)."""
    import ray.data as rd
    tbl = pa.table({"uid": pa.array([7, 3, 7, 1, 3, 3, 9], pa.int64())})
    out = dedup.exact_dedup(rd.from_arrow(tbl), "uid", "uid").take_all()
    assert sorted(r["uid"] for r in out) == [1, 3, 7, 9]


def _dup_docs():
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest near the river bank every morning")
    rows = []
    for i in range(30):
        rows.append({"doc_id": i, "text": f"unique document number {i} " +
                     " ".join(f"tok{i}_{j}" for j in range(30))})
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base})                       # exact dup
    rows.append({"doc_id": 102, "text": base.replace("morning", "evening")})  # near dup
    return pa.Table.from_pylist(rows)


def test_minhash_lsh_dedup(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(_dup_docs())
    pairs = dedup.minhash_verified_pairs(ds, "doc_id", "text", tau=0.7).take_all()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (100, 101) in got and (100, 102) in got and (101, 102) in got
    assert all(a >= 100 for a, b in got)  # no false positives among uniques
    deduped = dedup.near_dedup_minhash(ds, "doc_id", "text", tau=0.7).take_all()
    kept = sorted(r["doc_id"] for r in deduped)
    assert 100 in kept and 101 not in kept and 102 not in kept
    assert len(kept) == 31


def test_auto_salt_reflects_measured_skew(ray_session):
    """salt = ceil(hottest cell / target): a hot cluster demands splitting,
    uniform data pays salt=1 (no ghost replication)."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.knn import auto_salt
    hot = pa.table({"lon": pa.array(np.full(4000, 103.8)),
                    "lat": pa.array(np.full(4000, 1.3))})
    assert auto_salt(rd.from_arrow(hot), res=11, target_cell_rows=1500) == 3
    rng = np.random.default_rng(0)
    uni = pa.table({"lon": pa.array(rng.uniform(-170, 170, 500)),
                    "lat": pa.array(rng.uniform(-80, 80, 500))})
    assert auto_salt(rd.from_arrow(uni), res=11, target_cell_rows=1500) == 1


def test_verified_pairs_both_regimes_identical(ray_session):
    """The capped driver-side judge (small_cap fast path) and the
    distributed bucketed-gather judge must produce byte-identical verified
    pairs — for minhash texts AND embedding vectors."""
    import ray.data as rd
    ds = rd.from_arrow(_dup_docs())
    key = lambda rows: sorted((r["id_a"], r["id_b"]) for r in rows)
    small = dedup.minhash_verified_pairs(ds, "doc_id", "text", tau=0.7).take_all()
    dist = dedup.minhash_verified_pairs(ds, "doc_id", "text", tau=0.7,
                                        small_cap=0).take_all()
    assert key(small) == key(dist) and len(small) >= 3

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((60, 16))
    vecs[41] = vecs[40] + rng.standard_normal(16) * 0.01
    t = pa.table({"vec_id": pa.array(range(60), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    es = dedup.embedding_dup_pairs(rd.from_arrow(t), tau=0.95).take_all()
    ed = dedup.embedding_dup_pairs(rd.from_arrow(t), tau=0.95,
                                   small_cap=0).take_all()
    assert key(es) == key(ed) and (40, 41) in key(es)


def test_connected_components_both_regimes(ray_session):
    """Distributed CC (single-task and label-propagation regimes) must
    match BFS component minima exactly — incl. a diameter-9 chain."""
    import collections

    import pandas as pd
    import ray.data as rd
    edges = [(i, i + 1) for i in range(9)]                 # chain
    edges += [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(200, 203), (201, 203), (202, 250)]          # stars
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    def comp_min(x):
        seen, st = {x}, [x]
        while st:
            u = st.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    st.append(v)
        return min(seen)

    pairs = rd.from_pandas(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    for cap in (10**6, 0):   # single-task regime / distributed regime
        labels = dedup.connected_components_pairs(
            pairs, single_task_cap=cap).take_all()
        got = {r["id"]: r["label"] for r in labels}
        assert set(got) == set(adj)
        assert all(lab == comp_min(i) for i, lab in got.items())


def test_semi_join_and_cc_preserve_int_dtypes(ray_session):
    """Regression for the round-4 grid_dbscan_clusters driver-only hash
    mismatch: anti_semi_join's null-padded key rows upcast int64 columns
    to float64 inside the pandas bucket frames, the float ids leaked
    through the semi-join output into connected_components_pairs, and
    the final cluster_id column raced between int64 and float64 (value
    211247191 hashed as "211247191.0" at the driver only). The join
    must restore source dtypes; CC must type its output from its input."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.util import anti_semi_join

    ds = rd.from_arrow(pa.table({
        "src": pa.array([1, 2, 3, 4], pa.int64()),
        "dst": pa.array([10, 20, 30, 40], pa.int64())}))
    keys = rd.from_arrow(pa.table({"key": pa.array([10, 30], pa.int64())}))
    semi = anti_semi_join(ds, keys, on="dst", keys_on="key",
                          semi=True).materialize()
    df = semi.to_pandas()
    assert df["src"].dtype == "int64" and df["dst"].dtype == "int64", \
        df.dtypes
    assert sorted(df["dst"]) == [10, 30]

    # and through CC (single-task regime): int64 in → int64 out
    pairs = semi.map_batches(
        lambda b: pa.table({"id_a": b["src"], "id_b": b["dst"]}),
        batch_format="pyarrow")
    labels = dedup.connected_components_pairs(pairs).to_pandas()
    assert labels["id"].dtype == "int64" and labels["label"].dtype == "int64"

    # anti side too
    anti = anti_semi_join(ds, keys, on="dst", keys_on="key").to_pandas()
    assert anti["src"].dtype == "int64" and anti["dst"].dtype == "int64"
    assert sorted(anti["dst"]) == [20, 40]


def test_grid_dbscan_window_order_dtypes(ray_session, tmp_path):
    """The window-order repro distilled: the full grid-DBSCAN label stage
    (cell counts → core filter → neighbor explode → semi-join →
    CC → broadcast attach → extent aggregate) must emit an all-int64
    frame at ANY parallelism — this is the stage whose cluster_id raced
    to float64 in the round-4 driver artifact."""
    from wrangle_openstreetmap_data_ray.pipelines import registry

    q = registry.queries()["grid_dbscan_clusters"]
    df = q("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    for c in df.columns:
        assert df[c].dtype == "int64", (c, df[c].dtype)


def test_simhash_pairs(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(_dup_docs())
    pairs = dedup.simhash_pairs(ds, "doc_id", "text", max_hamming=3).take_all()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (100, 101) in got


def test_jaccard_kernel_sanity():
    a = WS_RE.findall("the quick brown fox jumps over the lazy dog")
    assert jaccard_shingles(a, a) == 1.0
    b = WS_RE.findall("completely different words entirely here now")
    assert jaccard_shingles(a, b) == 0.0


def test_minhash_batch_kernel_bit_identical_to_per_doc():
    """The vectorized whole-batch MinHash kernel (factorize + masked
    concatenated windows + minimum.reduceat) must equal the per-doc
    reference bit-for-bit — including empty docs, docs shorter than the
    shingle width (NUL padding), unicode whitespace, and lead/trail
    whitespace (Arrow split emits empty boundary tokens; \\S+ doesn't)."""
    from wrangle_openstreetmap_data_ray.functions.text import (
        minhash_bands, minhash_bands_batch, minhash_signature)
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "Gamma", "δέλτα", "x1", "...", "word", "the"]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(0, 40))))
             for _ in range(200)]
    texts += ["", "one", "one two", "one two three", "  lead trail  ",
              "\t\n", "单 词 表 达 一 二 三", "unicode   space"]
    for num_perm, num_bands, n in [(128, 32, 3), (64, 16, 2)]:
        batch = minhash_bands_batch(texts, num_perm, num_bands, n)
        for i, t in enumerate(texts):
            ref = minhash_bands(
                minhash_signature(WS_RE.findall(t.lower()), num_perm, n),
                num_bands)
            assert np.array_equal(batch[i], ref), (num_perm, i, t[:40])


def test_embedding_dup_pairs(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((60, 16))
    vecs[41] = vecs[40] + rng.standard_normal(16) * 0.01   # near-dup pair
    t = pa.table({"vec_id": pa.array(range(60), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float32()))})
    pairs = dedup.embedding_dup_pairs(rd.from_arrow(t), tau=0.95).take_all()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (40, 41) in got


def test_embedding_dup_recall_vs_bruteforce(ray_session):
    """Multi-band LSH must recover (essentially) every true pair that
    exact brute-force cosine finds at the same τ (ADVICE r1: the
    single-band design silently lost >half of them)."""
    import ray.data as rd
    rng = np.random.default_rng(3)
    n, dim, tau = 120, 32, 0.95
    vecs = rng.standard_normal((n, dim))
    for i in range(0, 30, 2):          # 15 planted near-dup pairs
        vecs[i + 1] = vecs[i] + rng.standard_normal(dim) * 0.02
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sim = vn @ vn.T
    ia, ib = np.triu_indices(n, k=1)
    truth = {(int(a), int(b)) for a, b in zip(ia[sim[ia, ib] >= tau],
                                              ib[sim[ia, ib] >= tau])}
    assert len(truth) >= 15
    t = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64()))})
    got = {(r["id_a"], r["id_b"]) for r in
           dedup.embedding_dup_pairs(rd.from_arrow(t), tau=tau).take_all()}
    assert got == truth                # exact: no false pos, full recall


def test_brute_force_topk_exact(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((200, 32))
    t = pa.table({"vec_id": pa.array(range(200), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    q = rng.standard_normal((3, 32))
    got = simsearch.brute_force_topk(rd.from_arrow(t).repartition(5), q, k=5).take_all()
    # exact reference
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    # cast to float32 storage first, as the dataset stores float32
    v32 = np.asarray(np.asarray(vecs, dtype=np.float32), dtype=np.float64)
    vn = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sim = vn @ qn.T
    for qi in range(3):
        expect = set(np.argsort(-sim[:, qi])[:5].tolist())
        mine = {r["vec_id"] for r in got if r["query_id"] == qi}
        assert mine == expect


def test_ivf_topk_recall(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((500, 16))
    t = pa.table({"vec_id": pa.array(range(500), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    q = rng.standard_normal((4, 16))
    ds = rd.from_arrow(t)
    exact = simsearch.brute_force_topk(ds, q, k=10).take_all()
    approx = simsearch.ivf_topk(ds, q, k=10, n_centroids=8, nprobe=4).take_all()
    for qi in range(4):
        e = {r["vec_id"] for r in exact if r["query_id"] == qi}
        a = {r["vec_id"] for r in approx if r["query_id"] == qi}
        assert len(e & a) / len(e) >= 0.6  # recall floor with half the lists probed


def test_brute_force_topk_query_chunking(ray_session):
    """Partitioned query table (query_chunk < Q) must equal one-shot."""
    import ray.data as rd
    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((150, 8))
    t = pa.table({"vec_id": pa.array(range(150), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    q = rng.standard_normal((40, 8))
    ds = rd.from_arrow(t)
    one = sorted((r["query_id"], r["vec_id"]) for r in
                 simsearch.brute_force_topk(ds, q, k=4).take_all())
    chunked = sorted((r["query_id"], r["vec_id"]) for r in
                     simsearch.brute_force_topk(ds, q, k=4,
                                                query_chunk=16).take_all())
    assert one == chunked and len(one) == 40 * 4


def test_ivf_fullprobe_exact_64_queries(ray_session):
    """The vectorized probe kernel (dense probe LUT, one matmul across all
    queries — round-2 review fix) must equal brute force at nprobe ==
    n_centroids even for a WIDE query table."""
    import ray.data as rd
    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((400, 12))
    t = pa.table({"vec_id": pa.array(range(400), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    q = rng.standard_normal((64, 12))
    ds = rd.from_arrow(t)
    exact = simsearch.brute_force_topk(ds, q, k=5).take_all()
    full = simsearch.ivf_topk(ds, q, k=5, n_centroids=8, nprobe=8).take_all()
    ek = sorted((r["query_id"], r["vec_id"]) for r in exact)
    fk = sorted((r["query_id"], r["vec_id"]) for r in full)
    assert ek == fk and len(ek) == 64 * 5


def test_decode_features_and_phash_verify(ray_session):
    import ray.data as rd
    imgs = synth.gen_images_table(0, 60)
    out = multimodal.decode_features(rd.from_arrow(imgs), verify_phash=True,
                                     concurrency=2).take_all()
    assert len(out) == 60
    assert all(r["phash_ok"] for r in out)   # stored phash == recomputed phash
    assert all(0 <= r["brightness"] <= 255 for r in out)


def test_resize_images_roundtrip(ray_session):
    import ray.data as rd
    imgs = synth.gen_images_table(0, 20)
    out = multimodal.resize_images(rd.from_arrow(imgs), 8, 8, "raw8",
                                   concurrency=2).take_all()
    for r in out:
        img = codecs.decode(r["bytes"], "raw8", r["w"], r["h"])
        assert img.shape == (8, 8, 3)


def test_audio_wav_roundtrip_and_features(ray_session):
    """REAL WAV codec: encode→decode bit-exact; Ray stage features match
    a direct numpy computation."""
    import ray.data as rd
    t = synth.gen_audio_table(0, 30)
    # codec roundtrip
    for i in (0, 7, 29):
        samples, sr = synth._audio_samples(i)
        dec, dsr = codecs.decode_wav(codecs.encode_wav(samples, sr))
        assert dsr == sr and np.array_equal(dec, samples)
    out = {r["audio_id"]: r for r in
           multimodal.audio_features(rd.from_arrow(t)).take_all()}
    assert len(out) == 30
    meta = t.to_pylist()
    for m in meta:
        r = out[m["audio_id"]]
        assert r["n_samples_dec"] == m["n_samples"]
        assert r["duration_us"] == m["n_samples"] * 1_000_000 // m["sr"]
        assert 0.0 < r["rms"] < 1.0 and 0.0 < r["zcr"] < 1.0
    # reference RMS for one clip
    s0, _ = synth._audio_samples(0)
    x = s0.astype(np.float64) / 32768.0
    assert abs(out["aud000000000"]["rms"] - np.sqrt((x * x).mean())) < 1e-12


def test_video_rawvid_roundtrip_and_frame_sample(ray_session):
    """REAL rawvid codec: frames round-trip bit-exact; the Ray sampler
    emits exactly every 2nd frame with pixels equal to the synth source."""
    import ray.data as rd
    t = synth.gen_video_table(0, 12)
    frames0 = synth._video_frames(3, int(t["n_frames"][3].as_py()))
    dec, fps = codecs.decode_rawvid(t["bytes"][3].as_py())
    assert fps == 8.0 and np.array_equal(dec, frames0)
    rows = multimodal.video_frame_sample(rd.from_arrow(t), stride=2).take_all()
    by_vid: dict = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append(r)
    meta = {m["video_id"]: m for m in t.to_pylist()}
    assert set(by_vid) == set(meta)
    for vid, rs in by_vid.items():
        n = meta[vid]["n_frames"]
        assert sorted(r["frame_idx"] for r in rs) == list(range(0, n, 2))
    # pixel equality for a sampled frame
    r0 = next(r for r in by_vid["vid000000003"] if r["frame_idx"] == 2)
    assert r0["frame_bytes"] == frames0[2].tobytes()


def test_asof_join_last(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.asof import asof_join_last
    left = pa.table({"key": [1, 1, 2, 3], "lid": [10, 11, 20, 30],
                     "lts": pa.array([100, 250, 50, 70], pa.int64())})
    right = pa.table({"key": [1, 1, 2],
                      "rts": pa.array([100, 200, 60], pa.int64())})
    out = asof_join_last(rd.from_arrow(left), rd.from_arrow(right),
                         "key", "lts", "rts", left_keep=["lid"]).take_all()
    got = {r["lid"]: r["asof_ts"] for r in out}
    # lid 10: rts 100 <= 100 (inclusive); lid 11: max(100,200)=200;
    # lid 20: rts 60 > 50 → null; lid 30: no right rows → null
    assert got == {10: 100, 11: 200, 20: None, 30: None}


def test_asof_join_next_forward_semantics(ray_session):
    import pandas as pd
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.asof import asof_join_next
    left = rd.from_pandas(pd.DataFrame({
        "key": [1, 1, 2], "lts": pd.to_datetime([10, 30, 5], unit="s"),
        "tag": ["a", "b", "c"]}))
    right = rd.from_pandas(pd.DataFrame({
        "key": [1, 1, 2], "rts": pd.to_datetime([15, 25, 3], unit="s")}))
    out = {r["tag"]: r["asof_ts"]
           for r in asof_join_next(left, right, "key", "lts", "rts",
                                   left_keep=["tag"]).take_all()}
    assert out["a"] == 15_000_000_000      # earliest >= 10s is 15s (ns)
    assert out["b"] is None                # nothing at/after 30s
    assert out["c"] is None                # nothing at/after 5s for key 2


def test_asof_left_keep_may_collide_and_carry_left_ts(ray_session):
    """left_keep entries named like the sweep's union columns must not
    clobber the right side's timestamps, and a kept left_ts comes back
    un-negated from the forward join (round-3 verify + ADVICE fixes)."""
    import pandas as pd
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.asof import asof_join_next
    left = rd.from_arrow(pa.table({
        "key": ["x", "x"], "ts": pa.array([10, 50], pa.int64()),
        "side": ["p", "q"]}))    # "ts"/"side" collide with old internals
    right = rd.from_arrow(pa.table({
        "key": ["x"], "rts": pa.array([30], pa.int64())}))
    out = asof_join_next(left, right, "key", "ts", "rts",
                         left_keep=["ts", "side"]).to_pandas()
    out = out.sort_values("side").reset_index(drop=True)
    assert list(out["ts"]) == [10, 50]          # un-negated passthrough
    assert int(out["asof_ts"][0]) == 30
    assert pd.isna(out["asof_ts"][1])


def test_hll_distinct_accuracy(ray_session):
    """HLL estimate within ~4 std errors of exact for 20k distinct keys
    across 64 blocks (merge correctness + estimator sanity)."""
    import pandas as pd
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import sketch
    n = 20_000
    df = pd.DataFrame({"uid": np.arange(n).repeat(3)})   # 60k rows, 20k uniq
    ds = rd.from_pandas(df).repartition(64)
    est = sketch.hll_distinct(ds, "uid", p=12)
    assert abs(est - n) / n < 0.065      # 4 × 1.6% std error
    # string column path
    ds2 = rd.from_pandas(pd.DataFrame({"s": [f"u{i}" for i in range(5000)]}))
    est2 = sketch.hll_distinct(ds2, "s", p=12)
    assert abs(est2 - 5000) / 5000 < 0.065


def test_text_analyze(ray_session):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["The quick brown fox and the dog.", "der die das und ist nicht"]})
    out = textstage.analyze_text(rd.from_arrow(t), keep_text=False,
                                 concurrency=1).take_all()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["lang_pred"] == "en"
    assert by_id[2]["lang_pred"] == "de"
    assert by_id[1]["n_tokens_ws"] == 7
    assert 0 <= by_id[1]["quality_score"] <= 1


def test_raster_vectorize_regions_golden(ray_session):
    """Known point layout → known regions: an L-shaped 3-px region, a
    2-px bar, and a singleton, all in one tile; a second tile holds one
    pixel. Pixel math: tile_res=2, grid_bits=2 → fine grid 16×16 over
    the world; tile (tqx,tqy) = fine//4, px = fine%4, py = 3 - fine%4."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import rastervec

    # world at res 4 (16×16 fine pixels): pixel width 22.5° lon, 11.25° lat
    def fine(qx, qy):  # center of fine cell (qx, qy)
        return (-180 + (qx + 0.5) * 22.5, -90 + (qy + 0.5) * 11.25)

    pts = [
        # tile (1,1): L-region pixels (fine 4..7 grid → px=fine%4)
        fine(4, 4), fine(4, 4), fine(5, 4), fine(4, 5),   # L (3 px, 4 pts)
        fine(6, 6), fine(7, 6),                           # bar (2 px)
        fine(7, 4),                                       # singleton
        # tile (2,2): one pixel
        fine(9, 9),
    ]
    t = pa.table({"lon": pa.array([p[0] for p in pts], pa.float64()),
                  "lat": pa.array([p[1] for p in pts], pa.float64())})
    out = rastervec.rasterize_vectorize(
        rd.from_arrow(t), tile_res=2, grid_bits=2, n_buckets=8).to_pandas()
    out = out.sort_values(["tile_qx", "tile_qy", "region_id"],
                          ignore_index=True)
    assert len(out) == 4
    # tile (1,1): fine qy=4 → py = 3-0 = 3; qy=5 → py=2; qy=6 → py=1
    l_row = out[(out.tile_qx == 1) & (out.region_id == 2 * 4 + 0)].iloc[0]
    assert l_row.n_px == 3 and l_row.n_points == 4
    assert (l_row.px_min, l_row.px_max, l_row.py_min, l_row.py_max) == (0, 1, 2, 3)
    bar = out[(out.tile_qx == 1) & (out.region_id == 1 * 4 + 2)].iloc[0]
    assert bar.n_px == 2 and bar.n_points == 2
    single = out[(out.tile_qx == 1) & (out.region_id == 3 * 4 + 3)].iloc[0]
    assert single.n_px == 1
    t2 = out[out.tile_qx == 2].iloc[0]
    assert t2.tile_qy == 2 and t2.n_px == 1
    # exact degree bbox: tile (1,1) px (0..1, py 2..3) → fine x 4..6, y 4..6
    assert l_row.west == -180 + 4 * 22.5 and l_row.east == -180 + 6 * 22.5
    assert l_row.south == -90 + 4 * 11.25 and l_row.north == -90 + 6 * 11.25


def test_raster_vectorize_parallelism_invariant(ray_session):
    """Same rows at any bucket count / block split (determinism at any
    parallelism — the north_rule tile-assignment invariant)."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import rastervec
    from wrangle_openstreetmap_data_ray import synth

    tbl = synth.gen_geo_table(0, 2000)
    a = rastervec.rasterize_vectorize(
        rd.from_arrow(tbl), tile_res=12, n_buckets=4).to_pandas()
    b = rastervec.rasterize_vectorize(
        rd.from_arrow(tbl).repartition(13), tile_res=12,
        n_buckets=64).to_pandas()
    key = ["tile_qx", "tile_qy", "region_id"]
    a = a.sort_values(key, ignore_index=True)
    b = b.sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby(["tile_qx", "tile_qy"])["n_points"].sum().sum()
            == len(tbl))


def test_raster_label_stack_diagonal_not_connected():
    """Diagonal pixels are separate regions (4-connectivity, not 8)."""
    from wrangle_openstreetmap_data_ray.stages.rastervec import _label_stack
    occ = np.zeros((1, 4, 4), dtype=bool)
    occ[0, 0, 0] = occ[0, 1, 1] = True          # diagonal pair
    occ[0, 2, 2] = occ[0, 2, 3] = occ[0, 3, 3] = True  # L: connected
    lab = _label_stack(occ)
    assert lab[0, 0, 0] != lab[0, 1, 1]
    assert lab[0, 2, 2] == lab[0, 2, 3] == lab[0, 3, 3] == 2 * 4 + 2


def test_broadcast_inner_join_matches_hash_join(ray_session):
    """broadcast_inner_join == Dataset.join (inner, unique small side),
    including unmatched-key drops on both sides; the >max_rows fallback
    routes through the hash join and must agree too."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.util import (broadcast_inner_join,
                                                     join_kwargs)
    rng = np.random.default_rng(7)
    big = pa.table({
        "k": pa.array(rng.integers(0, 400, 3000), pa.int64()),
        "payload": pa.array(rng.integers(0, 1 << 30, 3000), pa.int64())})
    # small side: keys 100..349 (so 1/4 of big's keys miss), unique
    small = pa.table({
        "k": pa.array(np.arange(100, 350), pa.int64()),
        "dim_a": pa.array(rng.integers(0, 9, 250), pa.int64()),
        "dim_b": pa.array([f"s{i}" for i in range(250)], pa.string())})

    def run(max_rows):
        out = broadcast_inner_join(
            rd.from_arrow(big).repartition(7), rd.from_arrow(small),
            "k", max_rows=max_rows).to_pandas()
        return out.sort_values(list(out.columns), ignore_index=True)

    ref = rd.from_arrow(big).join(
        rd.from_arrow(small), on=("k",), join_type="inner",
        **join_kwargs(4)).to_pandas()
    ref = ref[["k", "payload", "dim_a", "dim_b"]] \
        .sort_values(["k", "payload", "dim_a", "dim_b"], ignore_index=True)
    bc = run(max_rows=10_000)[["k", "payload", "dim_a", "dim_b"]]
    fb = run(max_rows=10)[["k", "payload", "dim_a", "dim_b"]]    # fallback
    pd.testing.assert_frame_equal(bc, ref)
    pd.testing.assert_frame_equal(fb, ref)


def test_broadcast_inner_join_rejects_dup_keys_and_collisions(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.util import broadcast_inner_join
    big = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                  "v": pa.array([1, 2], pa.int64())}))
    dup = rd.from_arrow(pa.table({"k": pa.array([1, 1], pa.int64()),
                                  "d": pa.array([9, 9], pa.int64())}))
    with pytest.raises(ValueError, match="not unique"):
        broadcast_inner_join(big, dup, "k")
    clash = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                    "v": pa.array([7], pa.int64())}))
    with pytest.raises(ValueError, match="collision"):
        broadcast_inner_join(big, clash, "k")


def test_heavy_hitters_exact_under_heavy_truncation(ray_session):
    """20k-item zipf vocab, capacity 64 (300x smaller than the vocab):
    the sketch-then-verify op must still return EXACTLY the items with
    count >= threshold, with exact counts (recall guaranteed by the
    undercount bounds, precision by the verify pass)."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import sketch
    rng = np.random.default_rng(11)
    ids = rng.zipf(1.3, 300_000) % 20_000          # skewed item ids
    items = pa.table({"item": pa.array([f"w{i}" for i in ids], pa.string())})
    exact = pd.Series([f"w{i}" for i in ids]).value_counts()
    threshold = 200
    want = exact[exact >= threshold].sort_index()
    got = sketch.heavy_hitters(rd.from_arrow(items).repartition(23),
                               "item", threshold, capacity=64)
    assert list(got["item"]) == list(want.index)
    assert list(got["cnt"]) == [int(v) for v in want.values]
    assert len(got) > 5            # the fixture actually has hitters


def test_heavy_hitters_int_keys_and_empty_result(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import sketch
    t = pa.table({"k": pa.array([1, 1, 1, 2, 2, 3], pa.int64())})
    got = sketch.heavy_hitters(rd.from_arrow(t).repartition(3), "k", 2,
                               capacity=2)
    assert list(got["k"]) == [1, 2] and list(got["cnt"]) == [3, 2]
    empty = sketch.heavy_hitters(rd.from_arrow(t).repartition(3), "k", 99,
                                 capacity=2)
    assert len(empty) == 0


def test_bloom_semi_filter_no_false_negatives_and_prunes(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.util import bloom_semi_filter
    rng = np.random.default_rng(3)
    big = pa.table({"k": pa.array(rng.integers(0, 100_000, 50_000), pa.int64()),
                    "v": pa.array(np.arange(50_000), pa.int64())})
    keys = pa.table({"kk": pa.array(np.arange(500, 900), pa.int64())})
    out = bloom_semi_filter(rd.from_arrow(big).repartition(9),
                            rd.from_arrow(keys), on="k", keys_on="kk",
                            n_bits=1 << 16).to_pandas()
    in_keys = pd.Series(big["k"].to_numpy()).isin(range(500, 900))
    want_true = set(big.filter(pa.array(in_keys.to_numpy()))["v"].to_pylist())
    got = set(out["v"])
    assert want_true <= got                       # no false negatives
    # real pruning: survivors are a small superset of the true matches
    assert len(got) < 0.05 * len(big["k"])
    # string keys path
    sbig = pa.table({"k": pa.array([f"id{i}" for i in
                                    rng.integers(0, 5000, 8000)], pa.string())})
    skeys = pa.table({"k": pa.array([f"id{i}" for i in range(50)], pa.string())})
    sout = bloom_semi_filter(rd.from_arrow(sbig).repartition(5),
                             rd.from_arrow(skeys), on="k",
                             n_bits=1 << 16).to_pandas()
    truth = {f"id{i}" for i in range(50)}
    assert truth & set(sbig["k"].to_pylist()) <= set(sout["k"])


def test_hash_stratified_sample_deterministic_and_join_consistent(ray_session):
    """Same key ⇒ same keep decision across tables, parallelism and
    re-runs; observed rates track the permille targets."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.util import hash_stratified_sample
    n = 20_000
    keys = pa.table({"k": pa.array(np.arange(n), pa.int64()),
                     "g": pa.array(["a" if i % 2 else "b" for i in range(n)],
                                   pa.string())})
    a = hash_stratified_sample(rd.from_arrow(keys).repartition(3), "k",
                               {"a": 100, "b": 700}, strata_col="g",
                               seed=9).to_pandas()
    b = hash_stratified_sample(rd.from_arrow(keys).repartition(17), "k",
                               {"a": 100, "b": 700}, strata_col="g",
                               seed=9).to_pandas()
    assert sorted(a["k"]) == sorted(b["k"])          # layout-independent
    ga = a[a["g"] == "a"]; gb = a[a["g"] == "b"]
    assert abs(len(ga) / (n / 2) - 0.1) < 0.02
    assert abs(len(gb) / (n / 2) - 0.7) < 0.02
    # join consistency: uniform-rate sample of a second table by the
    # same key keeps exactly the same key set
    other = pa.table({"k": pa.array(np.arange(n), pa.int64()),
                      "v": pa.array(np.arange(n) * 3, pa.int64())})
    c = hash_stratified_sample(rd.from_arrow(other).repartition(5), "k",
                               250, seed=9).to_pandas()
    d = hash_stratified_sample(rd.from_arrow(keys), "k", 250,
                               seed=9).to_pandas()
    assert sorted(c["k"]) == sorted(d["k"])


def test_tfidf_top_terms_exact_and_parallelism_invariant(ray_session):
    """Hand-checked tiny corpus + identical output across block layouts."""
    import math

    import ray.data as rd

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["apple banana apple", "banana cherry",
                          "apple cherry cherry date"], pa.string())})
    out = textstage.tfidf_top_terms(
        rd.from_arrow(docs), 3, k=2, n_buckets=8).to_pandas()
    out = out.sort_values(["doc_id", "score_e4", "token"],
                          ascending=[True, False, True]).reset_index(drop=True)

    def s(tf, df):
        return math.floor(tf * (math.log(3.0) - math.log(float(df)))
                          * 1e4 + 0.5)
    # doc1: apple tf2 df2, banana tf1 df2 -> both kept (k=2)
    # doc3: cherry tf2 df2, date tf1 df1 -> date score ln3 > cherry 2*ln1.5
    want = {(1, "apple", s(2, 2)), (1, "banana", s(1, 2)),
            (2, "banana", s(1, 2)), (2, "cherry", s(1, 2)),
            (3, "date", s(1, 1)), (3, "cherry", s(2, 2))}
    assert set(map(tuple, out[["doc_id", "token", "score_e4"]]
                   .itertuples(index=False))) == want

    big = pa.table({
        "doc_id": pa.array(np.arange(200), pa.int64()),
        "text": pa.array([f"w{i % 7} w{i % 13} common w{i % 29} w{i}"
                          for i in range(200)], pa.string())})
    a = textstage.tfidf_top_terms(rd.from_arrow(big).repartition(2), 200,
                                  k=3).to_pandas()
    b = textstage.tfidf_top_terms(rd.from_arrow(big).repartition(23), 200,
                                  k=3).to_pandas()
    key = ["doc_id", "score_e4", "token"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))


def test_pagerank_regimes_match_numpy_reference(ray_session):
    """Broadcast and distributed regimes both equal a dense numpy power
    iteration at e6 fixed point (multigraph semantics, d=0.85)."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import graph

    rng = np.random.default_rng(7)
    n = 60
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    # symmetrize so every node has in+out edges; ensure coverage
    s = np.concatenate([src, dst, np.arange(n), (np.arange(n) + 1) % n])
    t = np.concatenate([dst, src, (np.arange(n) + 1) % n, np.arange(n)])
    edges = pa.table({"src": pa.array(s, pa.int64()),
                      "dst": pa.array(t, pa.int64())})

    # dense reference
    deg = np.bincount(s, minlength=n).astype(np.float64)
    r = np.ones(n)
    for _ in range(3):
        contrib = np.zeros(n)
        np.add.at(contrib, t, r[s] / deg[s])
        r = 0.15 + 0.85 * contrib
    want = np.floor(r * 1e6 + 0.5).astype(np.int64)

    for cap in (2_000_000, 1):   # broadcast regime, then forced distributed
        out = graph.pagerank(rd.from_arrow(edges).repartition(7),
                             n_iters=3, broadcast_cap=cap).to_pandas()
        got = out.sort_values("node").reset_index(drop=True)
        assert len(got) == n
        e6 = np.floor(got["r"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        assert np.array_equal(e6, want), cap


def test_kmeans_fit_matches_local_reference(ray_session):
    """Distributed partials == dense local Lloyd on the same init, at
    two block layouts; empty-cluster guard raises loudly."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.simsearch import kmeans_fit

    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 8)) * 6
    x = np.concatenate([centers[i] + rng.normal(size=(40, 8))
                        for i in range(4)])
    ids = np.arange(len(x))
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(list(x.astype(np.float64)),
                                        pa.list_(pa.float64()))})

    C0 = x[:3]   # k=3: the 3 smallest ids
    C_ref = C0.copy()
    for _ in range(2):
        d2 = ((x[:, None, :] - C_ref[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        cnt_ref = np.bincount(a, minlength=3)
        C_ref = np.stack([x[a == c].sum(axis=0) for c in range(3)]) \
            / cnt_ref[:, None]

    for nparts in (2, 19):
        C, cnt = kmeans_fit(rd.from_arrow(t).repartition(nparts),
                            "embedding", "vec_id", k=3, n_iters=2)
        assert np.array_equal(cnt, cnt_ref)
        assert np.allclose(C, C_ref, rtol=0, atol=1e-12)


def test_broadcast_left_join_nulls_and_fallback(ray_session):
    """Missing keys yield nulls (not dropped); the past-cap hash
    fallback produces the same rows."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.util import broadcast_left_join

    big = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array(["a", "b", "c", "d"])}))
    small = rd.from_arrow(pa.table({
        "k": pa.array([2, 4], pa.int64()),
        "w": pa.array([20.0, 40.0], pa.float64())}))

    def got(cap):
        df = broadcast_left_join(big, small, on="k", max_rows=cap) \
            .to_pandas().sort_values("k").reset_index(drop=True)
        return list(zip(df["k"], df["w"].fillna(-1.0)))

    want = [(1, -1.0), (2, 20.0), (3, -1.0), (4, 40.0)]
    assert got(2_000_000) == want          # broadcast path
    assert got(1) == want                  # hash left_outer fallback


def test_prefix_filtered_pairs_matches_bruteforce(ray_session):
    """PPJoin-style exact ssjoin == brute-force all-pairs Jaccard at two
    block layouts (exhaustiveness of prefix filtering)."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(60)]
    base = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    texts = list(base)
    for i in range(0, 20, 2):        # near-dups: small perturbations
        toks = base[i].split()
        toks[rng.integers(len(toks))] = "zzz"
        texts.append(" ".join(toks))
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts)})

    tau = 0.6
    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            jac = jaccard_shingles(WS_RE.findall(texts[i].lower()),
                                   WS_RE.findall(texts[j].lower()), 3)
            if jac >= tau:
                want.add((i, j))
    assert want, "fixture must contain true pairs"

    for nparts in (3, 17):
        got = dedup.prefix_filtered_pairs(
            rd.from_arrow(t).repartition(nparts), "doc_id", "text",
            tau=tau, n_buckets=32).to_pandas()
        assert set(zip(got["id_a"], got["id_b"])) == want
        assert not got.duplicated(["id_a", "id_b"]).any()


def test_merge_upsert_carryover_and_semantics(ray_session, tmp_path):
    """Untouched fragments carry over by reference (zero rewrite I/O);
    matched keys replaced, new keys inserted; duplicate keys refused."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.sources import lancelike

    root = str(tmp_path / "store")
    base = pa.table({"k": pa.array(np.arange(100), pa.int64()),
                     "v": pa.array(np.arange(100) * 10, pa.int64())})
    # 4 fragments of 25 keys each — updates touch only keys 0..24
    lancelike.write_dataset(rd.from_arrow(base).repartition(4), root,
                            stage="base", resume=False)
    man0 = lancelike.latest_manifest(root)

    upd = pa.table({"k": pa.array([3, 7, 200], pa.int64()),
                    "v": pa.array([-3, -7, -200], pa.int64())})
    man1 = lancelike.merge_upsert(rd.from_arrow(upd), root, "k",
                                  stage="merge1")
    got = lancelike.read_dataset(root).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert len(got) == 101
    v = dict(zip(got["k"], got["v"]))
    assert v[3] == -3 and v[7] == -7 and v[200] == -200
    assert v[5] == 50 and v[99] == 990

    # fragments whose key range was untouched must be the SAME files
    old = {f["path"] for f in man0["fragments"]}
    carried = [f["path"] for f in man1["fragments"] if f["path"] in old]
    assert len(carried) >= 1, "expected carried-over fragments"
    assert man1["metrics"]["carried_fragments"] == len(carried)

    # time travel: the pre-merge version stays readable and unmodified
    v1 = lancelike.read_dataset(root, version=man0["version"]).to_pandas()
    assert len(v1) == 100 and dict(zip(v1["k"], v1["v"]))[3] == 30

    with pytest.raises(ValueError, match="duplicate"):
        dup = pa.table({"k": pa.array([1, 1], pa.int64()),
                        "v": pa.array([0, 0], pa.int64())})
        lancelike.merge_upsert(rd.from_arrow(dup), root, "k", stage="m2")


def test_grouped_vector_mean_and_ncm(ray_session):
    """Per-label means == dense numpy at two layouts; NCM assigns the
    blob points back to their own label prototype."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.simsearch import (
        grouped_vector_mean, nearest_class_mean_confusion)

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(3, 6)) * 8
    labels = np.repeat(np.arange(3), 50)
    x = centers[labels] + rng.normal(size=(150, 6)) * 0.1
    t = pa.table({"label": pa.array(labels.astype(np.int64)),
                  "embedding": pa.array(list(x.astype(np.float64)),
                                        pa.list_(pa.float64()))})

    want = np.stack([x[labels == c].sum(axis=0) / 50 for c in range(3)])
    for nparts in (2, 13):
        keys, means, cnt = grouped_vector_mean(
            rd.from_arrow(t).repartition(nparts), "embedding", "label")
        assert np.array_equal(keys, np.arange(3))
        assert np.array_equal(cnt, np.full(3, 50))
        assert np.allclose(means, want, atol=1e-12)

    conf = nearest_class_mean_confusion(
        rd.from_arrow(t).repartition(7), "embedding", "label").to_pandas()
    diag = conf[conf["label"] == conf["pred"]]["n"].sum()
    assert diag == 150, conf   # tight blobs: perfect diagonal


def test_dp_simplify_matches_recursive_reference():
    """Iterative DP kernel == textbook recursive DP on random walks,
    plus the degenerate closed-ring (A==B) branch."""
    from wrangle_openstreetmap_data_ray.functions.geo import dp_simplify_indices

    def ref(lon, lat, eps, i, j, keep):
        if j <= i + 1:
            return
        ax, ay, bx, by = lon[i], lat[i], lon[j], lat[j]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        best_k, best_s = -1, -1.0
        for k in range(i + 1, j):
            if seg2 == 0.0:
                s = (lon[k] - ax) ** 2 + (lat[k] - ay) ** 2
                thr = eps * eps
            else:
                cr = dx * (lat[k] - ay) - dy * (lon[k] - ax)
                s, thr = cr * cr, eps * eps * seg2
            if s > best_s:
                best_k, best_s, best_thr = k, s, thr
        if best_s > best_thr:
            keep.add(best_k)
            ref(lon, lat, eps, i, best_k, keep)
            ref(lon, lat, eps, best_k, j, keep)

    rng = np.random.default_rng(2)
    for trial in range(30):
        n = int(rng.integers(2, 40))
        lon = np.cumsum(rng.normal(size=n) * 0.01) + 103.8
        lat = np.cumsum(rng.normal(size=n) * 0.01) + 1.3
        if trial % 5 == 0:
            lon[-1], lat[-1] = lon[0], lat[0]   # closed ring: A==B root
        for eps in (0.001, 0.01, 0.05):
            keep = {0, n - 1}
            ref(lon, lat, eps, 0, n - 1, keep)
            got = dp_simplify_indices(lon, lat, eps)
            assert set(got.tolist()) == keep, (trial, eps)


def test_ed1_pairs_matches_bruteforce(ray_session):
    """Deletion-signature fuzzy join == brute-force Levenshtein<=1 over
    typo-injected names, at two layouts; _ed_le1 == DP reference."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.dedup import _ed_le1, ed1_pairs

    def lev(a, b):
        m = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, m[0] = m[0], i
            for j, cb in enumerate(b, 1):
                prev, m[j] = m[j], min(m[j] + 1, m[j - 1] + 1,
                                       prev + (ca != cb))
        return m[-1]

    rng = np.random.default_rng(21)
    base = ["".join(rng.choice(list("abcdef"), 8)) for _ in range(60)]
    names = set(base)
    for s in base[:30]:        # typos: substitution, deletion, insertion
        i = int(rng.integers(len(s)))
        names.add(s[:i] + "z" + s[i + 1:])
        names.add(s[:i] + s[i + 1:])
        names.add(s[:i] + "q" + s[i:])
    names = sorted(names)

    for a, b in [("abc", "abd"), ("abc", "ab"), ("abc", "zabc"),
                 ("abc", "abc"), ("abc", "cba"), ("ab", "ba")]:
        assert _ed_le1(a, b) == (lev(a, b) <= 1), (a, b)

    want = {(a, b) for i, a in enumerate(names) for b in names[i + 1:]
            if lev(a, b) <= 1}
    t = pa.table({"value": pa.array(names, pa.string())})
    for nparts in (2, 11):
        got = ed1_pairs(rd.from_arrow(t).repartition(nparts),
                        "value", n_buckets=32).to_pandas()
        assert set(zip(got["name_a"], got["name_b"])) == want
        assert not got.duplicated().any()


def test_skyline_matches_bruteforce(ray_session):
    """Two-phase distributed skyline == O(n^2) dominance brute force,
    with duplicate points (mutually non-dominating) kept."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.util import skyline

    rng = np.random.default_rng(6)
    n = 500
    price = rng.integers(1, 60, n).astype(np.float64)
    size = rng.integers(1, 60, n)
    price[10], size[10] = price[11], size[11]   # exact duplicate pair
    t = pa.table({"pk": pa.array(np.arange(n), pa.int64()),
                  "price": pa.array(price),
                  "size": pa.array(size.astype(np.int64))})

    dominated = np.zeros(n, bool)
    for i in range(n):
        dominated[i] = bool(np.any(
            (price <= price[i]) & (size >= size[i])
            & ((price < price[i]) | (size > size[i]))))
    want = set(np.nonzero(~dominated)[0].tolist())

    for nparts in (1, 9):
        got = skyline(rd.from_arrow(t).repartition(nparts),
                      min_cols=["price"], max_cols=["size"],
                      batch_size=64)
        assert set(got["pk"].tolist()) == want


def test_grouped_topk_matches_pandas(ray_session):
    """util.grouped_topk == QUALIFY row_number() <= k reference, across
    parallelism (the per-block pre-reduce must not change the answer)."""
    import pandas as pd
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.util import grouped_topk

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", "d"], n),
        "uid": rng.integers(0, 50, n).astype(np.int64),
        "score": rng.integers(0, 20, n).astype(np.int64),
    })
    # ties on (score, uid) make row choice ambiguous — dedup rows first
    dfu = df.drop_duplicates(["g", "uid"])
    refu = (dfu.sort_values(["score", "uid"], ascending=[False, True],
                            kind="mergesort")
              .groupby("g", sort=False).head(3))
    wantu = set(map(tuple,
                    refu[["g", "uid", "score"]].itertuples(index=False)))
    for nparts in (1, 8):
        got = grouped_topk(
            rd.from_pandas(dfu).repartition(nparts), ["g"], 3,
            [("score", "desc"), ("uid", "asc")]).to_pandas()
        assert set(map(tuple,
                       got[["g", "uid", "score"]]
                       .itertuples(index=False))) == wantu


def test_rolling_window_sum_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.asof import rolling_window_sum

    rng = np.random.default_rng(4)
    n = 1500
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "key": rng.integers(0, 40, n).astype(np.int64),
        "t": rng.integers(0, 10_000, n).astype(np.int64),
        "v": rng.integers(-100, 100, n).astype(np.int64),
    })
    ref = df.sort_values(["key", "t", "rid"], kind="mergesort")
    ref["want"] = (ref.groupby("key")["v"]
                   .rolling(3, min_periods=1).sum()
                   .reset_index(drop=True).to_numpy().astype(np.int64))
    want = dict(zip(ref["rid"], ref["want"]))
    for nparts in (1, 8):
        got = rolling_window_sum(
            rd.from_pandas(df).repartition(nparts),
            "key", ["t", "rid"], "v", 3, out_col="rs").to_pandas()
        assert dict(zip(got["rid"], got["rs"])) == want


def test_histogram_quantiles_within_bin_and_deterministic(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.sketch import (
        histogram_quantiles_by_group)

    rng = np.random.default_rng(5)
    n = 4000
    g = rng.choice(["x", "y"], n)
    v = rng.uniform(0, 100, n)
    t = pa.table({"g": pa.array(g.tolist(), pa.string()),
                  "v": pa.array(v, pa.float64())})
    lo, hi, bins = 0.0, 128.0, 64
    width = (hi - lo) / bins
    outs = []
    for nparts in (1, 8):
        got = histogram_quantiles_by_group(
            rd.from_arrow(t).repartition(nparts), "g", "v", lo, hi, bins)
        outs.append(got.sort_values(["g", "q"]).reset_index(drop=True))
    # deterministic across parallelism
    assert outs[0].equals(outs[1])
    # each edge is within one bin width of the exact quantile
    for _, row in outs[0].iterrows():
        vals = np.sort(v[g == row["g"]])
        exact = vals[min(len(vals) - 1,
                         int(np.ceil(row["q"] * len(vals))) - 1)]
        edge = row["edge6"] / 1e6
        assert edge - 1e-9 <= exact <= edge + width + 1e-9, \
            (row["g"], row["q"], edge, exact)


def test_nearest_boundary_join_matches_bruteforce(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray import synth
    from wrangle_openstreetmap_data_ray.stages.pip_join import (
        nearest_boundary_join)

    polys = synth.gen_polygons_table(6, detail=8)
    rng = np.random.default_rng(7)
    n = 300
    lon = rng.uniform(103.5, 104.1, n)
    lat = rng.uniform(1.1, 1.5, n)
    pts = pa.table({"image_id": pa.array([f"p{i}" for i in range(n)]),
                    "lon": pa.array(lon), "lat": pa.array(lat)})

    # brute force over every edge
    ex1, ey1, ex2, ey2 = [], [], [], []
    for r in polys.to_pylist():
        rx = np.array([p["lon"] for p in r["ring"]])
        ry = np.array([p["lat"] for p in r["ring"]])
        ex1.append(rx); ey1.append(ry)
        ex2.append(np.roll(rx, -1)); ey2.append(np.roll(ry, -1))
    x1, y1 = np.concatenate(ex1), np.concatenate(ey1)
    x2, y2 = np.concatenate(ex2), np.concatenate(ey2)
    dx, dy = x2 - x1, y2 - y1
    l2 = dx * dx + dy * dy
    t = ((lon[:, None] - x1) * dx + (lat[:, None] - y1) * dy) / l2
    t = np.clip(t, 0.0, 1.0)
    d2 = ((lon[:, None] - (x1 + t * dx)) ** 2
          + (lat[:, None] - (y1 + t * dy)) ** 2)
    want = np.floor(np.sqrt(d2.min(axis=1)) * 1e9 + 0.5).astype(np.int64)

    for nparts in (1, 8):
        got = nearest_boundary_join(
            rd.from_arrow(pts).repartition(nparts), polys,
            point_chunk=64).to_pandas()
        got = got.set_index("id").loc[[f"p{i}" for i in range(n)]]
        assert np.array_equal(got["d9"].to_numpy(), want)


def test_pq_train_encode_deterministic_and_adc_recall(ray_session):
    """PQ codebooks/codes are parallelism-invariant; ADC top-k recall vs
    exact L2 brute force is high on clustered data (approximate op —
    recall is the contract, not equality)."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.simsearch import (
        pq_adc_topk, pq_encode, pq_train)

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 32)) * 5
    vecs = np.concatenate([c + rng.standard_normal((30, 32))
                           for c in centers])
    ids = np.arange(len(vecs), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(vecs.astype(np.float64)),
                                        pa.list_(pa.float64()))})

    outs = []
    for nparts in (1, 8):
        ds = rd.from_arrow(t).repartition(nparts)
        C = pq_train(ds, "embedding", "vec_id", m=4, k=8, n_iters=2)
        codes = pq_encode(ds, C).to_pandas()
        codes = codes.sort_values("vec_id").reset_index(drop=True)
        outs.append((C, codes))
    assert np.allclose(outs[0][0], outs[1][0])
    assert outs[0][1].equals(outs[1][1])

    queries = vecs[:4]
    ds = rd.from_arrow(t).repartition(8)
    # finer subspaces for the recall check (m=8 × 4 dims): m=4 over these
    # 32-dim clusters is right at the 0.6 recall boundary
    C = pq_train(ds, "embedding", "vec_id", m=8, k=8, n_iters=2)
    got = pq_adc_topk(ds, C, queries, k_top=10).to_pandas()
    d2 = ((queries[:, None, :] - vecs[None, :, :]) ** 2).sum(axis=2)
    recalls = []
    for qi in range(len(queries)):
        exact = set(ids[np.argsort(d2[qi], kind="stable")[:10]].tolist())
        approx = set(got[got["query_id"] == qi]["vec_id"].tolist())
        assert len(approx) == 10
        recalls.append(len(exact & approx) / 10)
    assert np.mean(recalls) >= 0.6, recalls


def test_bfs_hops_regimes_match_networkx_style_reference(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.graph import bfs_hops

    # random sparse digraph + a reachability-limited reference BFS
    rng = np.random.default_rng(7)
    n, m = 80, 260
    e = rng.integers(0, n, (m, 2))
    edges_df = pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})
    seeds_df = pd.DataFrame({"node": [3, 41]})

    adj = {}
    for s, d in e:
        adj.setdefault(int(s), set()).add(int(d))
    want, frontier = {3: 0, 41: 0}, {3, 41}
    r = 0
    while frontier:
        r += 1
        frontier = {d for f in frontier for d in adj.get(f, ())
                    if d not in want}
        for d in frontier:
            want[d] = r

    def run(**kw):
        out = bfs_hops(rd.from_pandas(edges_df).repartition(5),
                       rd.from_pandas(seeds_df), **kw).take_all()
        return {int(row["node"]): int(row["hops"]) for row in out}

    got_local = run()                       # single-task regime
    # distributed frontier regime (few buckets: 4-CPU test fixture)
    got_dist = run(single_task_cap=0, n_buckets=8)
    assert got_local == want
    assert got_dist == want


def test_bfs_hops_string_ids_and_unreachable(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.graph import bfs_hops

    edges_df = pd.DataFrame({"src": ["a", "b", "x"],
                             "dst": ["b", "c", "y"]})
    seeds_df = pd.DataFrame({"node": ["a"]})
    out = bfs_hops(rd.from_pandas(edges_df).repartition(2),
                   rd.from_pandas(seeds_df)).take_all()
    got = {row["node"]: int(row["hops"]) for row in out}
    # x/y unreachable -> no row; hops exact along the chain
    assert got == {"a": 0, "b": 1, "c": 2}


def test_sssp_costs_regimes_match_dijkstra(ray_session):
    import heapq

    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.graph import sssp_costs

    rng = np.random.default_rng(11)
    n, m = 60, 220
    e = rng.integers(0, n, (m, 2))
    wgt = rng.integers(1, 4, m)
    edges_df = pd.DataFrame({"src": e[:, 0], "dst": e[:, 1], "w": wgt})
    seeds_df = pd.DataFrame({"node": [5]})
    budget = 9

    # reference Dijkstra, budget-pruned
    adj = {}
    for (s, d), ww in zip(e, wgt):
        adj.setdefault(int(s), []).append((int(d), int(ww)))
    want, pq_ = {}, [(0, 5)]
    while pq_:
        dd, u = heapq.heappop(pq_)
        if u in want or dd > budget:
            continue
        want[u] = dd
        for v, ww in adj.get(u, ()):
            if v not in want and dd + ww <= budget:
                heapq.heappush(pq_, (dd + ww, v))

    def run(**kw):
        out = sssp_costs(rd.from_pandas(edges_df).repartition(5),
                         rd.from_pandas(seeds_df), budget=budget,
                         **kw).take_all()
        return {int(r["node"]): int(r["cost"]) for r in out}

    assert run() == want                                    # single-task
    assert run(single_task_cap=0, n_buckets=8) == want      # distributed


def test_sssp_init_cost_labels_match_both_regimes(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.graph import sssp_costs

    # lexicographic (hops, seed) allocation on a small grid-ish graph
    rng = np.random.default_rng(3)
    n, m = 50, 160
    e = rng.integers(0, n, (m, 2))
    SHIFT = 1 << 10
    edges_df = pd.DataFrame({"src": e[:, 0], "dst": e[:, 1],
                             "w": np.full(m, SHIFT)})
    seeds_df = pd.DataFrame({"node": [7, 23, 41],
                             "c0": [7, 23, 41]})

    # reference: BFS from all seeds, label = (hops, seed) lexicographic
    adj = {}
    for s, d in e:
        adj.setdefault(int(s), set()).add(int(d))
    want = {7: 7, 23: 23, 41: 41}     # combined keys
    frontier = {7: 7, 23: 23, 41: 41}
    hops = 0
    while frontier:
        hops += 1
        nxt = {}
        for u, comb in frontier.items():
            for v in adj.get(u, ()):
                cand = (comb % SHIFT) + hops * SHIFT
                if v not in want or cand < want[v]:
                    if v not in nxt or cand < nxt[v]:
                        nxt[v] = cand
        # keep only real improvements
        nxt = {v: c for v, c in nxt.items()
               if v not in want or c < want[v]}
        want.update(nxt)
        frontier = nxt

    def run(**kw):
        out = sssp_costs(rd.from_pandas(edges_df).repartition(4),
                         rd.from_pandas(seeds_df), init_cost="c0",
                         budget=20 * SHIFT + SHIFT - 1, **kw).take_all()
        return {int(r["node"]): int(r["cost"]) for r in out}

    assert run() == want
    assert run(single_task_cap=0, n_buckets=8) == want


def test_grouped_agg_vec_matches_ray_aggregate(ray_session):
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    from wrangle_openstreetmap_data_ray.util import (bucketed_sum,
                                                     grouped_agg_vec,
                                                     grouped_count)

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], 5000),
        "v": rng.integers(-100, 100, 5000),
        "f": rng.normal(size=5000).round(3)})
    ds = rd.from_pandas(df).repartition(7)

    got = grouped_agg_vec(ds, ["k"],
                          [("v", "sum", "sv"), (None, "count", "n"),
                           ("v", "min", "mn"), ("v", "max", "mx")]) \
        .to_pandas().sort_values("k", ignore_index=True)
    want = ds.groupby("k").aggregate(
        Sum("v", alias_name="sv"), Count(alias_name="n"),
        Min("v", alias_name="mn"), Max("v", alias_name="mx")) \
        .to_pandas().sort_values("k", ignore_index=True)
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_dtype=False)

    gc = grouped_count(ds, "k").to_pandas() \
        .sort_values("k", ignore_index=True)
    assert dict(zip(gc.k, gc.cnt)) == df.groupby("k").size().to_dict()

    # bucketed_sum over pre-reduced partials == global integer sums
    parts = rd.from_pandas(
        df.groupby("k", as_index=False)["v"].sum()
          .sample(frac=1.0, random_state=0)).repartition(3) \
        .union(rd.from_pandas(pd.DataFrame({"k": ["a"], "v": [7]})))
    bs = bucketed_sum(parts, ["k"], {"v": "total"}, n_buckets=8) \
        .to_pandas().sort_values("k", ignore_index=True)
    want2 = df.groupby("k")["v"].sum().to_dict()
    want2["a"] += 7
    assert dict(zip(bs.k, bs.total)) == want2


def test_augment_images_pixel_semantics(ray_session):
    """Augmentation pixels are pinned here (SQL pins only the manifest):
    hflip is an involution, rot90 transposes geometry with exact pixel
    mapping, crop75 is the centered integer-floor window, and every
    variant's phash matches a direct recompute over those pixels."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.functions.hashing import hash64_bytes
    imgs = synth.gen_images_table(0, 24)
    out = multimodal.augment_images(rd.from_arrow(imgs), out_fmt="raw8",
                                    concurrency=2).take_all()
    assert len(out) == 24 * 3
    src = {imgs["image_id"][i].as_py():
           codecs.decode(imgs["bytes"][i].as_py(), imgs["fmt"][i].as_py(),
                         imgs["w"][i].as_py(), imgs["h"][i].as_py())
           for i in range(imgs.num_rows)}
    caps = {imgs["image_id"][i].as_py(): imgs["caption"][i].as_py()
            for i in range(imgs.num_rows)}
    for r in out:
        img = src[r["image_id"]]
        got = codecs.decode(r["bytes"], "raw8", r["w"], r["h"])
        h, w, _ = img.shape
        if r["aug"] == "hflip":
            assert np.array_equal(got, img[:, ::-1])
            assert np.array_equal(got[:, ::-1], img)      # involution
        elif r["aug"] == "rot90":
            assert (r["h"], r["w"]) == (w, h)
            assert np.array_equal(got, np.rot90(img))
        else:
            nw, nh = (w * 3) // 4, (h * 3) // 4
            x0, y0 = (w - nw) // 2, (h - nh) // 2
            assert np.array_equal(got, img[y0:y0 + nh, x0:x0 + nw])
        assert r["caption"] == caps[r["image_id"]]
        assert r["phash"] == np.int64(np.uint64(
            hash64_bytes(np.ascontiguousarray(got).tobytes(), 42)))


def test_k_core_both_regimes_match_networkless_reference(ray_session):
    """k_core: broadcast peel and anti-join fallback (cap=0) produce the
    same core, and both match a direct numpy peel on a random graph."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import graph

    rng = np.random.default_rng(7)
    n, m, k = 80, 400, 3
    a = rng.integers(0, n, m)
    b = (a + 1 + rng.integers(0, n - 1, m)) % n      # no self-loops
    und = {(int(min(x, y)), int(max(x, y))) for x, y in zip(a, b)}
    src = [u for u, v in und] + [v for u, v in und]
    dst = [v for u, v in und] + [u for u, v in und]

    alive = set(range(n))
    while True:
        deg = {i: 0 for i in alive}
        for u, v in und:
            if u in alive and v in alive:
                deg[u] += 1
                deg[v] += 1
        low = {i for i in alive if deg[i] < k}
        if not low:
            break
        alive -= low
    want = {i: d for i, d in deg.items() if i in alive}

    edges = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                    "dst": pa.array(dst, pa.int64())}))
    for cap in (2_000_000, 0):     # broadcast regime / anti-join fallback
        out = graph.k_core(edges, k, max_rounds=40,
                           low_broadcast_cap=cap).to_pandas()
        got = dict(zip(out["src"].astype(int), out["deg"].astype(int)))
        assert got == want, f"cap={cap}"


def test_k_core_raises_past_round_cap(ray_session):
    """A path graph peels one layer per round at k=2... actually a path
    peels endpoints inward: n//2 rounds — max_rounds=1 must raise on a
    6-path rather than return a half-peeled state."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import graph

    a = list(range(5))
    src = a + [x + 1 for x in a]
    dst = [x + 1 for x in a] + a
    edges = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                    "dst": pa.array(dst, pa.int64())}))
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.k_core(edges, 2, max_rounds=1)


def test_chunk_documents_edges(ray_session):
    """Chunking contract: empty/whitespace docs emit nothing; exact
    multiples and short docs produce the documented window set; chunk
    text is the single-space rejoin of the \\S+ tokens."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import textstage

    docs = pa.table({
        "doc_id": pa.array(["a", "b", "c", "d"], pa.string()),
        "text": pa.array(["one  two\tthree\nfour", "", "   ",
                          " ".join(f"t{i}" for i in range(10))],
                         pa.string())})
    out = textstage.chunk_documents(rd.from_arrow(docs), size=4, stride=3) \
        .to_pandas().sort_values(["doc_id", "chunk_no"]).reset_index(drop=True)
    got = {(r.doc_id, r.chunk_no): (r.n_tokens, r.chunk_text)
           for r in out.itertuples()}
    assert ("b", 0) not in got and ("c", 0) not in got
    assert got[("a", 0)] == (4, "one two three four")
    assert got[("a", 1)] == (1, "four")          # start 3 < n=4
    assert got[("d", 0)] == (4, "t0 t1 t2 t3")
    assert got[("d", 3)] == (1, "t9")
    assert max(k[1] for k in got if k[0] == "d") == 3   # ceil(10/3)-1


def test_delete_by_keys_lifecycle(tmp_path, ray_session):
    """delete: victims disappear, survivors keep values, absent-key
    delete is a zero-rewrite no-op, and the pre-delete version is still
    readable (time travel)."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.sources import lancelike

    root = str(tmp_path / "store")
    t = pa.table({"k": pa.array(np.arange(100), pa.int64()),
                  "v": pa.array(np.arange(100) * 10, pa.int64())})
    man1 = lancelike.write_dataset(rd.from_arrow(t), root, stage="base",
                                   resume=False)
    man2 = lancelike.delete_by_keys(pa.array([5, 50, 95, 999], pa.int64()),
                                    root, "k", stage="d1")
    assert man2["metrics"]["deleted_rows"] == 3
    got = lancelike.read_dataset(root).to_pandas().sort_values("k")
    assert len(got) == 97 and not {5, 50, 95} & set(got["k"])
    assert (got["v"].to_numpy() == got["k"].to_numpy() * 10).all()
    man3 = lancelike.delete_by_keys(pa.array([5], pa.int64()),
                                    root, "k", stage="d2")
    assert man3["metrics"]["deleted_rows"] == 0
    assert man3["metrics"]["rewritten_fragments"] == 0
    old = lancelike.read_dataset(root, version=man1["version"]).to_pandas()
    assert len(old) == 100


def test_snap_to_segments_ties_and_exactness(ray_session):
    """snap: matches an n² reference with the same float tree, and an
    equidistant point resolves to the SMALLEST way_id."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import pip_join

    segs = pa.table({"way_id": pa.array([7, 3], pa.int64()),
                     "x1": [0.0, 0.0], "y1": [1.0, -1.0],
                     "x2": [10.0, 10.0], "y2": [1.0, -1.0]})
    pts = pa.table({"image_id": pa.array(["p0", "p1", "p2"], pa.string()),
                    "lon": [5.0, 5.0, 5.0], "lat": [0.0, 0.9, -0.5]})
    out = pip_join.snap_to_segments(rd.from_arrow(pts), segs) \
        .to_pandas().set_index("id")
    assert out.loc["p0", "way_id"] == 3          # tie -> smaller way_id
    assert out.loc["p1", "way_id"] == 7
    assert out.loc["p2", "way_id"] == 3
    assert out.loc["p0", "d9"] == 10**9          # exactly 1 degree
    with pytest.raises(ValueError, match="zero-length"):
        bad = pa.table({"way_id": pa.array([1], pa.int64()),
                        "x1": [0.0], "y1": [0.0], "x2": [0.0], "y2": [0.0]})
        pip_join.snap_to_segments(rd.from_arrow(pts), bad)


def test_snap_bucketed_matches_broadcast(ray_session):
    """The cell-bucketed snap (beyond-broadcast-cap path) must equal the
    broadcast snap EXACTLY — values AND smallest-way_id ties — on a
    fixture that exercises every phase: dense cluster (pass A resolves),
    duplicate-geometry tie pairs, and far stragglers that need the
    coarse-occupancy bound + definitive rectangle pass."""
    import numpy as np
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import pip_join

    rng = np.random.default_rng(11)
    S = 400
    x1 = 103.8 + rng.standard_normal(S) * 0.04
    y1 = 1.35 + rng.standard_normal(S) * 0.04
    x2 = x1 + rng.standard_normal(S) * 0.002
    y2 = y1 + rng.standard_normal(S) * 0.002
    ok = (x2 - x1) ** 2 + (y2 - y1) ** 2 > 0
    w = rng.integers(1, 300, S)[ok]
    # exact ties: first 30 segments duplicated under larger way ids
    segs = pa.table({
        "way_id": pa.array(np.concatenate([w, w[:30] + 5000]), pa.int64()),
        "x1": pa.array(np.concatenate([x1[ok], x1[ok][:30]]), pa.float64()),
        "y1": pa.array(np.concatenate([y1[ok], y1[ok][:30]]), pa.float64()),
        "x2": pa.array(np.concatenate([x2[ok], x2[ok][:30]]), pa.float64()),
        "y2": pa.array(np.concatenate([y2[ok], y2[ok][:30]]), pa.float64())})
    P = 700
    plon = 103.8 + rng.standard_normal(P) * 0.05
    plat = 1.35 + rng.standard_normal(P) * 0.05
    plon[:3], plat[:3] = 104.9, 2.7          # no-candidate stragglers
    pts = pa.table({
        "image_id": pa.array([f"p{i}" for i in range(P)], pa.string()),
        "lon": pa.array(plon, pa.float64()),
        "lat": pa.array(plat, pa.float64())})
    bc = pip_join.snap_to_segments(rd.from_arrow(pts), segs) \
        .to_pandas().sort_values("id", ignore_index=True)
    bu = pip_join.snap_to_segments_bucketed(
        rd.from_arrow(pts), rd.from_arrow(segs), res=13) \
        .to_pandas().sort_values("id", ignore_index=True)
    assert len(bu) == len(bc) == P
    assert (bu["way_id"].to_numpy() == bc["way_id"].to_numpy()).all()
    assert (bu["d9"].to_numpy() == bc["d9"].to_numpy()).all()
    assert bu["way_id"].dtype == "int64" and bu["d9"].dtype == "int64"


def test_cms_and_kmv_sketch_properties(ray_session):
    """CMS never under-estimates (min over rows >= exact count); KMV's
    distinct estimate lands within the ~1/sqrt(k) band; both sketches
    are parallelism-invariant by construction (pure merges)."""
    import numpy as np
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import sketch

    rng = np.random.default_rng(11)
    # zipf-ish key distribution: 2000 distinct keys, skewed counts
    keys = rng.zipf(1.5, 40_000) % 2000
    t = pa.table({"k": pa.array(keys.astype(np.int64), pa.int64())})
    ds = rd.from_arrow(t).repartition(8)

    cms = sketch.cms_counts(ds, "k", depth=4, width=1024).to_pandas()
    from wrangle_openstreetmap_data_ray.functions.hashing import hash64_ints
    grid = cms.set_index(["row_j", "bucket"])["cnt"]
    vals, exact = np.unique(keys, return_counts=True)
    for key, cnt in list(zip(vals, exact))[:50]:
        ests = []
        for j in range(4):
            h = hash64_ints(np.array([key], np.uint64), seed=j)[0]
            ests.append(int(grid.loc[(j, int(h & np.uint64(1023)))]))
        est = min(ests)
        assert est >= cnt                       # CMS never under-counts
        assert est <= cnt + len(keys) // 1024 * 4   # sanity upper bound

    kmv = sketch.kmv_sketch(ds, "k", k=256)
    assert len(kmv) == 256
    assert kmv["h63"].is_monotonic_increasing
    est = sketch.kmv_estimate(kmv, k=256)
    n_true = len(vals)
    assert abs(est - n_true) / n_true < 0.2     # ~3 sigma at k=256

    # under-full sketch: fewer distincts than k -> estimate is exact
    small = rd.from_arrow(pa.table({"k": pa.array(
        np.arange(100, dtype=np.int64), pa.int64())}))
    kmv_s = sketch.kmv_sketch(small, "k", k=256)
    assert sketch.kmv_estimate(kmv_s, k=256) == 100


def test_ivfpq_topk_recall(ray_session):
    """IVF-PQ (residual-encoded, probed-list scan) recall vs exact L2
    brute force on clustered data; parallelism-invariant results."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages.simsearch import ivfpq_topk

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((8, 32)) * 5
    vecs = np.concatenate([c + rng.standard_normal((30, 32))
                           for c in centers])
    # interleave clusters so the k-smallest-id k-means seeds span them
    # (id-ordered seeds from ONE cluster leave empty clusters -> raise)
    vecs = vecs[rng.permutation(len(vecs))]
    ids = np.arange(len(vecs), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(vecs.astype(np.float64)),
                                        pa.list_(pa.float64()))})
    queries = vecs[:4]
    outs = []
    for nparts in (1, 8):
        ds = rd.from_arrow(t).repartition(nparts)
        got = ivfpq_topk(ds, queries, k_top=10, n_centroids=8, nprobe=4,
                         m=8, kc=8).to_pandas()
        outs.append(got.sort_values(["query_id", "d2e6", "vec_id"])
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])           # parallelism-invariant
    d2 = ((queries[:, None, :] - vecs[None, :, :]) ** 2).sum(axis=2)
    recalls = []
    for qi in range(len(queries)):
        exact = set(ids[np.argsort(d2[qi], kind="stable")[:10]].tolist())
        approx = set(outs[0][outs[0]["query_id"] == qi]["vec_id"]
                     .tolist())
        assert len(approx) == 10
        recalls.append(len(exact & approx) / 10)
    assert np.mean(recalls) >= 0.6, recalls


def test_exact_grouped_kth_edges(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import sketch

    rng = np.random.default_rng(7)
    g = np.repeat(["a", "purchase", "z"], [1, 5000, 2])
    v = np.concatenate([[42],
                        rng.integers(-10**9, 10**9, 5000),
                        [-5, -5]]).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "v": v})).repartition(16)
    out = sketch.exact_grouped_kth(ds, "g", "v").set_index("g")
    # lower median == sorted()[ceil(n/2)-1]
    for key, vals in (("a", v[:1]), ("purchase", v[1:5001]),
                      ("z", v[5001:])):
        s = np.sort(vals)
        assert out.loc[key, "v"] == s[(len(s) + 1) // 2 - 1]
        assert out.loc[key, "n"] == len(s)
    # arbitrary rank k_of_n (min and max)
    mn = sketch.exact_grouped_kth(ds, "g", "v", k_of_n=lambda n: 1) \
        .set_index("g")
    mx = sketch.exact_grouped_kth(ds, "g", "v", k_of_n=lambda n: n) \
        .set_index("g")
    assert mn.loc["purchase", "v"] == v[1:5001].min()
    assert mx.loc["purchase", "v"] == v[1:5001].max()


def test_kcenter_select_matches_serial_greedy(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import simsearch

    rng = np.random.default_rng(3)
    X = rng.integers(-10**6, 10**6, size=(500, 3)).astype(np.int64)
    ids = [f"p{i:04d}" for i in range(500)]
    offs = np.arange(0, 3 * 501, 3, dtype=np.int32)
    fv = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                  pa.array(X.ravel(), pa.int64()))
    ds = rd.from_arrow(pa.table({"id": ids, "fv": fv})).repartition(8)
    out = simsearch.kcenter_select(ds, "id", "fv", k=5)

    # serial reference
    centers = [0]                      # p0000 = smallest id
    sel = [("p0000", 0)]
    for _ in range(4):
        d2 = np.min([((X - X[c]) ** 2).sum(axis=1) for c in centers],
                    axis=0)
        best = int(np.argmax(d2))      # np.argmax = first max = smallest id
        centers.append(best)
        sel.append((ids[best], int(d2[best])))
    assert list(zip(out["id"], out["d2_sel"])) == sel
    # coverage radius is non-increasing after the seed
    assert all(a >= b for a, b in zip(out["d2_sel"][1:-1],
                                      out["d2_sel"][2:]))


def test_kmv_grouped_jaccard_bounds(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import sketch

    # identical groups -> jaccard 1; disjoint -> 0 (k covers both sets)
    a = np.arange(1000, dtype=np.int64)
    tbl = pa.table({"g": ["x"] * 1000 + ["y"] * 1000 + ["z"] * 1000,
                    "u": np.concatenate([a, a, a + 10_000])})
    ds = rd.from_arrow(tbl).repartition(8)
    out = sketch.kmv_grouped_jaccard(ds, "g", "u", k=256) \
        .set_index(["type_a", "type_b"])
    assert out.loc[("x", "y"), "jaccard_e6"] == 1_000_000
    assert out.loc[("x", "z"), "jaccard_e6"] == 0
    assert out.loc[("y", "z"), "jaccard_e6"] == 0


def test_union_schema_divergence_nullfills(ray_session):
    """Pin the Ray 2.49 behavior behind NOTES_r4's null-group-key
    anomaly (root-caused round 5): union of branches whose column-name
    sets differ does NOT raise — it silently null-fills the missing
    column at execution while schema() reports only one branch. If this
    test starts failing on a Ray upgrade, union grew validation and
    util.checked_union's rationale should be revisited."""
    import ray.data as rd

    from wrangle_openstreetmap_data_ray import util

    base = rd.range(200).map_batches(
        lambda b: pa.table({"id": b["id"], "n": b["id"]}),
        batch_format="pyarrow")
    narrow = rd.range(50).map_batches(
        lambda b: pa.table({"id": b["id"]}), batch_format="pyarrow")

    # the raw union silently null-fills 'n' for the narrow branch
    df = base.union(narrow).to_pandas()
    assert len(df) == 250
    assert int(df["n"].isna().sum()) == 50

    # checked_union refuses the divergent union up front
    with pytest.raises(ValueError, match="schemas diverge"):
        util.checked_union(base, narrow)

    # and passes through a consistent one untouched
    ok = util.checked_union(
        base, rd.range(50).map_batches(
            lambda b: pa.table({"id": b["id"], "n": b["id"]}),
            batch_format="pyarrow"))
    assert ok.count() == 250


def test_scrub_pii_redaction(ray_session):
    import ray.data as rd

    from wrangle_openstreetmap_data_ray.stages import textstage

    rows = [
        {"doc_id": 1, "text": "mail a.b+c@ex-1.org then 10.0.0.1 x 555-0199"},
        {"doc_id": 2, "text": "no pii at all"},
        {"doc_id": 3, "text": "two mails p@q.io r@s.co and 999-1234"},
    ]
    out = textstage.scrub_pii(rd.from_items(rows)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "clean_text"] == "mail <EMAIL> then <IP> x <PHONE>"
    assert (out.loc[1, ["n_email", "n_ip", "n_phone"]] == [1, 1, 1]).all()
    assert out.loc[2, "clean_text"] == "no pii at all"
    assert (out.loc[2, ["n_email", "n_ip", "n_phone"]] == [0, 0, 0]).all()
    assert out.loc[3, "clean_text"] == "two mails <EMAIL> <EMAIL> and <PHONE>"
    assert out.loc[3, "n_email"] == 2
    # idempotent: scrubbing already-scrubbed text changes nothing
    again = textstage.scrub_pii(
        rd.from_items([{"doc_id": int(i), "text": t}
                       for i, t in out["clean_text"].items()])).to_pandas()
    assert (again["n_email"] + again["n_ip"] + again["n_phone"]).sum() == 0
    assert sorted(again["clean_text"]) == sorted(out["clean_text"])
