"""The public operator registry: one ``queries()`` entry per implemented
operator from SURVEY.md §2 (+ the training-data graft ops), each with a
DuckDB ``oracle_sql()`` twin where SQL-expressible.

Contract (driver): each callable takes ``sf_dir`` and returns a Dataset /
pandas DataFrame / pyarrow Table; the oracle SQL runs on DuckDB views of
the driver parquet tables plus ``read_parquet()`` of our deterministic
fixture files (same inputs on both sides — the comparison pins the
OPERATORS). Column names and float rounding match on both sides.

Float discipline: any column produced by ARITHMETIC (sums, ratios,
distances) is rounded to fixed decimals on BOTH sides, or dropped from the
output, because distributed summation order and libm differences make raw
doubles hash-unstable. Columns passed through untouched keep raw values.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import geo, normalize
from ..functions.normalize import (EXPECTED_STREET_TYPES, FIRST_TOKEN_RE,
                                   MALAY_FIRST_TOKEN_TYPES, STREET_TYPE_RE)
from ..stages import (dedup, interval, knn, multimodal, pip_join, simsearch,
                      textstage, tiles)
from ..util import (cluster_cpus, distributed_topk, grouped_count,
                    join_kwargs)
from . import fixtures as fx

# ---------------------------------------------------------------- helpers

CELL_RES = 12        # cell_encode_points resolution
TILE_RES = 10        # tile_assignments resolution
RASTER_RES = 12      # raster_vectorize_regions tile resolution (16px grid)
KNN_K = 3
RADIUS_M = 250.0     # radius_join_pairs query radius (meters)
DBSCAN_RES = 14      # grid_dbscan_clusters / cell_hop_distance grid res
DBSCAN_MINPTS = 5    # core-cell threshold
ISO_BUDGET = 24      # cell_cost_isochrone max path cost (1 dense/2 sparse)
HEX_SIZE = 0.03      # hexbin_counts flat-top hex width (degrees)
SEG_XRES = 12        # way_segment_intersections PBSM grid resolution
PHASH_NQ = 16        # phash_topk_retrieval query-set size
PHASH_K = 5          # phash_topk_retrieval neighbors per query
POLY_XRES = 9        # polygon_overlap_pairs PBSM grid resolution
POLYFILL_RES = 16    # polygon_polyfill_cells grid (~0.0055 deg cells)
HAUS_XRES = 12       # way_hausdorff_pairs PBSM grid resolution
HAUS_T_E7 = 700_000  # Hausdorff threshold in e7 deg units (~7.7 km —
                     # sized to the fixture's way spacing: the closest
                     # way pair sits at ~104k e7 units)
HAUS_D2_MAX = HAUS_T_E7 * HAUS_T_E7
EWMA_W = 8           # user_value_ewma window (dyadic alpha=1/2 weights)
HILBERT_ORDER = 16   # hilbert_cells curve order (32-bit keys)
HILBERT_SCAN_RANGE = (3133316087, 3133319646)   # cluster-scan query
                     # range: the middle half of the extract's keys
SEGMENTIZE_D = 0.005 # way_segmentize_points spacing (deg, ~550 m)
KRING_K = 3          # cell_kring_counts max Chebyshev ring
SPATIAL_SCAN_LON = 103.85   # lancelike_spatial_scan query-cell anchor
SPATIAL_SCAN_LAT = 1.30
OD_RES = 13          # od_cell_flows grid (~4.9 km cells over the extract)
WAY_RASTER_RES = 17  # way_rasterize_cells grid (~300 m cells)
RIPLEY_MAX_M = 500.0             # ripley_k_counts largest radius
RIPLEY_RADII_MM = (125000, 250000, 500000)
KCORE_K = 4          # kcore_radius_graph core threshold
KCORE_ROUNDS = 12    # engine peel cap == oracle unroll depth
STAY_MM = 10_000_000             # user_stay_segments near-hop bound (10 km)
CHUNK_SIZE = 64      # doc_chunk_windows tokens per chunk
CHUNK_STRIDE = 48    # doc_chunk_windows stride (16-token overlap)
VOR_NSEEDS = 5       # cell_voronoi_allocation facility count
VOR_HOPLIM = 96      # allocation reach limit (hops)
VOR_SHIFT = np.int64(1) << np.int64(30)   # (hops, seed) lexicographic key
PAIR_PACK = np.int64(1) << np.int64(32)   # (way_a, way_b) -> one int64 key
# stratified hash-sampling contract: permille keep-rates per event type
# (downsample the frequent, keep the rare) + the shared hash seed; the
# SQL twin embeds the SAME integers, so both sides are exact
SAMPLE_RATES_PERMILLE = {"view": 50, "click": 100, "purchase": 500,
                         "signup": 250, "error": 900}
SAMPLE_SEED = 1234
SPLIT_SEED = 77      # dataset_split_counts train/val/test hash seed
BUFFER_RES = 14      # cell_buffer_dilate grid resolution (~2.4 km cells)
BUFFER_R = 2         # cell_buffer_dilate Chebyshev dilation radius (cells)
SEARCH_TOKENS = ("table", "scan", "merge")   # doc_keyword_and_search query
ANCHORS = ((103.70, 1.25), (103.85, 1.30),   # anchor_nearest_points query
           (103.95, 1.35), (103.80, 1.40))   # points (lon, lat)
KCENTER_K = 8        # kcenter_diverse_points subset size (== SQL unroll)
BOT_HOURLY = 3       # bot_like_users peak-hour threshold (fixture-scaled)
SIMPLIFY_MIN_CROSS = 2_000_000_000_000   # way_simplify_onepass: min |cross|
                     # of an interior vertex's neighbor triangle, in e7-int
                     # coordinate units (2e12 ≈ a 0.02°-base × 0.02°-height
                     # deviation triangle on this extract)

_SQL_ORACLE_TAG = "sf0.01"   # driver runs correctness at sf0.01

# splitmix64 in DuckDB: UBIGINT xor/shift; the 64-bit modular multiply is
# split into 32-bit halves so the HUGEINT (int128) intermediate never
# overflows. Shared by every hash-keyed oracle (sampling, splits).
_SM64_MACROS = """
    CREATE OR REPLACE MACRO mulmod64(a, b) AS CAST((
        (CAST(a & 4294967295::UBIGINT AS HUGEINT) * b)
            % 18446744073709551616::HUGEINT
        + ((CAST(a >> 32 AS HUGEINT) * b) % 4294967296::HUGEINT)
            * 4294967296::HUGEINT
    ) % 18446744073709551616::HUGEINT AS UBIGINT);
    CREATE OR REPLACE MACRO sm64(x) AS (
        WITH s0 AS (SELECT CAST((CAST(x AS HUGEINT)
                + 11400714819323198485::HUGEINT)
                % 18446744073709551616::HUGEINT AS UBIGINT) AS z),
        s1 AS (SELECT mulmod64(xor(z, z >> 30),
                13787848793156543929::HUGEINT) AS z FROM s0),
        s2 AS (SELECT mulmod64(xor(z, z >> 27),
                10723151780598845931::HUGEINT) AS z FROM s1)
        SELECT xor(z, z >> 31) FROM s2);
"""


def _round_half_away(col, ndigits: int = 6):
    """DuckDB-compatible ROUND for non-negative doubles: half AWAY from
    zero (std::round), not numpy/pandas banker's rounding — ratio columns
    are small rationals that land exactly on .5 boundaries, where the two
    modes differ (seen: 12/500 rows off by 1e-6)."""
    x = col.to_numpy(zero_copy_only=False)
    p = 10.0 ** ndigits
    return pa.array(np.floor(x * p + 0.5) / p, pa.float64())


def _fxp(name: str) -> str:
    """Fixture parquet path as referenced from oracle SQL (sf0.01)."""
    import os
    return os.path.join(fx.FIXTURE_ROOT, _SQL_ORACLE_TAG, f"{name}.parquet")


def _grid_sql(col: str, res: int, lo: float, span: float) -> str:
    """SQL twin of geo.cell_xy quantization for one axis — identical float
    expression ((v - lo) / span * 2^res, floor, clip), IEEE-exact."""
    n = 1 << res
    return (f"LEAST(GREATEST(CAST(floor((({col} - {lo}) / {span}) * {n}.0) "
            f"AS BIGINT), 0), {n - 1})")


def _street_type_sql(col: str) -> str:
    first = f"regexp_extract({col}, '{FIRST_TOKEN_RE}', 1)"
    last = f"regexp_extract({col}, '{STREET_TYPE_RE}', 1)"
    malay = ", ".join(f"'{t}'" for t in sorted(MALAY_FIRST_TOKEN_TYPES))
    return f"CASE WHEN {first} IN ({malay}) THEN {first} ELSE {last} END"


def _nation_sorted(sf_dir):
    """(nation df, sorted nationkeys, names in that order) — nation is
    spec-fixed at 25 rows (TPC-H), so the driver pull is cap-safe by
    construction. Shared by the Q7/Q8 shapes (review: was duplicated)."""
    nat = fx.driver_table(sf_dir, "nation").to_pandas()
    nk = nat["n_nationkey"].to_numpy()
    order = np.argsort(nk, kind="stable")
    return nat, nk[order], nat["n_name"].to_numpy()[order]


def _supplier_nation_lut(sf_dir, nk_sorted, nname_sorted):
    """(l_suppkey, supp_nation) Dataset — supplier keys with nation names
    attached map-side via searchsorted over the sorted nation keys;
    consumed through broadcast_inner_join (capped, hash-join fallback)."""
    def sup_narrow(b: pa.Table) -> pa.Table:
        pos = np.searchsorted(nk_sorted, b["s_nationkey"].to_numpy())
        return pa.table({"l_suppkey": b["s_suppkey"],
                         "supp_nation": pa.array(nname_sorted[pos],
                                                 pa.string())})
    return fx.driver_table(sf_dir, "supplier",
                           columns=["s_suppkey", "s_nationkey"]) \
        .map_batches(sup_narrow, batch_format="pyarrow")


# ================================================================ queries

def _orders_merge_update(b):
    """Shared MERGE-update recipe for the store CRUD checks (merge_upsert
    / time-travel / vacuum use the SAME update batch so their oracles can
    share one relational twin): keys %7==0 double o_totalprice and stamp
    MERGED; keys %13==0 re-key +1e8 as NEWROW inserts."""
    kk = b["o_orderkey"].to_numpy(zero_copy_only=False)
    i_key = b.schema.get_field_index("o_orderkey")
    i_tp = b.schema.get_field_index("o_totalprice")
    i_pr = b.schema.get_field_index("o_orderpriority")
    t7 = b.filter(pa.array(kk % 7 == 0))
    t7 = t7.set_column(i_tp, "o_totalprice",
                       pc.multiply(t7["o_totalprice"], 2.0))
    t7 = t7.set_column(i_pr, "o_orderpriority",
                       pa.array(["MERGED"] * t7.num_rows, pa.string()))
    t13 = b.filter(pa.array(kk % 13 == 0))
    t13 = t13.set_column(
        i_key, "o_orderkey",
        pc.add(t13["o_orderkey"], pa.scalar(100_000_000, pa.int64())))
    t13 = t13.set_column(i_pr, "o_orderpriority",
                         pa.array(["NEWROW"] * t13.num_rows, pa.string()))
    return pa.concat_tables([t7, t13])


def queries():
    q = {}

    # ---------------- aggregations over driver tables (A1-A7 analogues)

    def agg_lineitem_pricing(sf_dir):
        """[R:notebook] A-family flagship groupby-aggregate (TPC-H Q1
        shape). Map side pre-reduced with the VECTORIZED pyarrow
        group_by combiner (``grouped_agg_vec``) — the plain ray
        aggregate walks rows in Python (NOTES_r4); only ≤ groups×blocks
        partial rows reach the merge."""
        from ..util import grouped_agg_vec
        ds = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_returnflag", "l_linestatus",
                                      "l_quantity", "l_extendedprice",
                                      "l_discount"])
        out = grouped_agg_vec(
            ds, ["l_returnflag", "l_linestatus"],
            [("l_quantity", "sum", "sum_qty"),
             ("l_extendedprice", "sum", "sum_price"),
             ("l_discount", "sum", "_disc_sum"),
             (None, "count", "cnt")]).to_pandas()
        out["avg_disc"] = (out["_disc_sum"] / out["cnt"]).round(4)
        out = out.drop(columns=["_disc_sum"])
        out["sum_qty"] = out["sum_qty"].round(2)
        out["sum_price"] = out["sum_price"].round(0)
        return out
    q["agg_lineitem_pricing"] = agg_lineitem_pricing

    def count_by_event_type(sf_dir):
        ds = fx.driver_table(sf_dir, "events", columns=["event_type"])
        return grouped_count(ds, "event_type")
    q["count_by_event_type"] = count_by_event_type

    def top_users_by_events(sf_dir):
        """A4 top-contributors: groupby+count then DISTRIBUTED top-k (per-
        block select_k partials + tiny merge; the counts table never
        materializes on the driver)."""
        ds = fx.driver_table(sf_dir, "events", columns=["user_id"])
        counts = grouped_count(ds, "user_id")
        return distributed_topk(counts, 10, [("cnt", "descending"),
                                             ("user_id", "ascending")])
    q["top_users_by_events"] = top_users_by_events

    def distinct_event_users(sf_dir):
        """A3 distinct count: partial unique per batch → tiny final distinct."""
        ds = fx.driver_table(sf_dir, "events", columns=["user_id"])
        partial = ds.map_batches(
            lambda b: pa.table({"user_id": pc.unique(b["user_id"])}),
            batch_format="pyarrow")
        n = partial.groupby("user_id").count().count()
        return pd.DataFrame({"n_users": [int(n)]})
    q["distinct_event_users"] = distinct_event_users

    def one_shot_users(sf_dir):
        """A5 double-group: users with exactly one event."""
        ds = fx.driver_table(sf_dir, "events", columns=["user_id"])
        counts = grouped_count(ds, "user_id")
        n = counts.filter(expr="cnt == 1").count()
        return pd.DataFrame({"n_one_shot": [int(n)]})
    q["one_shot_users"] = one_shot_users

    def top_parts_by_brand(sf_dir):
        ds = fx.driver_table(sf_dir, "part", columns=["p_brand"])
        counts = grouped_count(ds, "p_brand")
        return distributed_topk(counts, 10, [("cnt", "descending"),
                                             ("p_brand", "ascending")])
    q["top_parts_by_brand"] = top_parts_by_brand

    def orders_topk_price(sf_dir):
        """O1 sort-desc + limit via per-block partial top-k, then one small
        driver-side merge — no global range-partition sort for small k."""
        ds = fx.driver_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
        return distributed_topk(ds, 20, [("o_totalprice", "descending"),
                                         ("o_orderkey", "ascending")])
    q["orders_topk_price"] = orders_topk_price

    def nations_per_region(sf_dir):
        """Dimension join: nation ⋈ region → nations per region name."""
        nation = fx.driver_table(sf_dir, "nation",
                                 columns=["n_nationkey", "n_regionkey"])
        region = fx.driver_table(sf_dir, "region")
        out = nation.join(region.rename_columns({"r_regionkey": "n_regionkey"}),
                          on=("n_regionkey",), join_type="inner",
                          **join_kwargs(fx.table_join_partitions(
                              sf_dir, "nation", "region")))
        return grouped_count(out, "r_name", out="n_nations")
    q["nations_per_region"] = nations_per_region

    def orders_by_segment(sf_dir):
        """Fact⋈dim join + aggregate: order counts and revenue per market
        segment (partial aggregation inside the hash shuffle)."""
        from ray.data.aggregate import Count, Sum
        cust = fx.driver_table(sf_dir, "customer",
                               columns=["c_custkey", "c_mktsegment"])
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_custkey", "o_totalprice"]) \
                   .rename_columns({"o_custkey": "c_custkey"})
        joined = orders.join(cust, on=("c_custkey",), join_type="inner",
                             **join_kwargs(fx.table_join_partitions(
                                 sf_dir, "orders", "customer")))
        out = joined.groupby("c_mktsegment").aggregate(
            Count(alias_name="n_orders"),
            Sum("o_totalprice", alias_name="revenue")).to_pandas()
        out["revenue"] = out["revenue"].round(0)
        return out
    q["orders_by_segment"] = orders_by_segment

    def top_cuisines(sf_dir):
        """[R:notebook] A6 family — top-10 cuisine values."""
        ds = fx.read_fixture(sf_dir, "tags", columns=["key", "value"])
        am = ds.filter(expr="key == 'cuisine'")
        counts = grouped_count(am, "value")
        return distributed_topk(counts, 10, [("cnt", "descending"),
                                             ("value", "ascending")])
    q["top_cuisines"] = top_cuisines

    # ------------------------------------- documents: dedup + text analysis

    def exact_dedup_docs(sf_dir):
        """D1 exact dedup on content: one row per distinct text, keep min id."""
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])
        kept = dedup.exact_dedup(ds, "text", "doc_id")
        return kept.select_columns(["doc_id"])
    q["exact_dedup_docs"] = exact_dedup_docs

    def doc_token_counts(sf_dir):
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])
        out = textstage.analyze_text(ds, text_col="text")
        return out.select_columns(["doc_id", "n_tokens_ws"])
    q["doc_token_counts"] = doc_token_counts

    def doc_lang_breakdown(sf_dir):
        ds = fx.driver_table(sf_dir, "documents", columns=["lang", "source"])
        return ds.groupby(["lang", "source"]).count().rename_columns(
            {"count()": "cnt"})
    q["doc_lang_breakdown"] = doc_lang_breakdown

    def doc_dup_content_count(sf_dir):
        """Fingerprint dedup accounting: #docs whose normalized content
        occurs ≥ 2 times (oracle groups by the normalized text itself)."""
        from ray.data.aggregate import Sum
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])
        feats = textstage.analyze_text(ds, text_col="text")
        counts = feats.groupby("fingerprint").count() \
                      .rename_columns({"count()": "cnt"})
        dups = counts.filter(expr="cnt >= 2")
        # on-cluster Sum aggregate — only the scalar reaches the driver
        agg = dups.aggregate(Sum("cnt"))
        n = 0 if agg is None else (agg.get("sum(cnt)") or 0)
        return pd.DataFrame({"n_dup_docs": [int(n)]})
    q["doc_dup_content_count"] = doc_dup_content_count

    def doc_char_stats(sf_dir):
        """Character-level text features, fully vectorized in Arrow
        (utf8 length + regex match counts) — the SQL-expressible slice of
        quality scoring, oracle-paired."""
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])

        def f(b: pa.Table) -> pa.Table:
            t = b["text"]
            return pa.table({
                "doc_id": b["doc_id"],
                "n_chars": pc.cast(pc.utf8_length(t), pa.int64()),
                "n_digits": pc.cast(pc.count_substring_regex(t, r"[0-9]"),
                                    pa.int64()),
                "n_spaces": pc.cast(pc.count_substring_regex(t, r" "),
                                    pa.int64()),
            })
        return ds.map_batches(f, batch_format="pyarrow")
    q["doc_char_stats"] = doc_char_stats

    def decontaminate_docs(sf_dir):
        """Benchmark decontamination: docs whose doc_id % 97 == 0 stand in
        for a held-out eval set; every OTHER doc sharing a word trigram
        with it is flagged with its distinct-shared-shingle count. The
        bench shingle-hash set broadcasts once; the corpus streams through
        one map pass, zero shuffles. (Real corpora use longer n-grams —
        the fixture docs are 50-550 chars, so trigrams are the analogue.)"""
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])

        def bench_side(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy()
            return b.filter(pa.array(ids % 97 == 0))

        def corpus_side(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy()
            return b.filter(pa.array(ids % 97 != 0))

        bench = ds.map_batches(bench_side, batch_format="pyarrow")
        corpus = ds.map_batches(corpus_side, batch_format="pyarrow")
        return textstage.decontaminate(corpus, bench, shingle_n=3)
    q["decontaminate_docs"] = decontaminate_docs

    def doc_repetition_stats(sf_dir):
        """Gopher-style repetition quality signals: distinct-token ratio
        and modal-bigram fraction per doc, one map pass, e6 fixed-point."""
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])
        return textstage.repetition_stats(ds)
    q["doc_repetition_stats"] = doc_repetition_stats

    def doc_fingerprint_cluster_sizes(sf_dir):
        """Dedup accounting histogram: how many content-fingerprint
        clusters exist of each size (double groupby — the shape of the
        dedup problem, used to size near-dup passes)."""
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])
        feats = textstage.analyze_text(ds, text_col="text")
        per_fp = feats.groupby("fingerprint").count() \
                      .rename_columns({"count()": "cluster_size"})
        return per_fp.groupby("cluster_size").count() \
                     .rename_columns({"count()": "n_clusters"})
    q["doc_fingerprint_cluster_sizes"] = doc_fingerprint_cluster_sizes

    def doc_quality(sf_dir):
        """Quality scoring + language ID (rows-only: heuristic floats)."""
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])
        out = textstage.analyze_text(ds, text_col="text")
        return out.select_columns(["doc_id", "n_tokens_bpe", "lang_pred",
                                   "quality_score"])
    q["doc_quality"] = doc_quality

    def near_dedup_docs_minhash(sf_dir):
        """MinHash+LSH near-dedup over documents (rows-only check)."""
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])
        return dedup.near_dedup_minhash(ds, "doc_id", "text", tau=0.8) \
                    .select_columns(["doc_id"])
    q["near_dedup_docs_minhash"] = near_dedup_docs_minhash

    def simhash_doc_pairs(sf_dir):
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])
        return dedup.simhash_pairs(ds, "doc_id", "text", max_hamming=3) \
                    .select_columns(["id_a", "id_b"])
    q["simhash_doc_pairs"] = simhash_doc_pairs

    def embedding_dup_pairs(sf_dir):
        """Embedding-cosine near-dup over the dup-injected fixture —
        oracle-paired: multi-band LSH recall at τ=0.98 is ~1−7e-5 and the
        fixture's dup pairs sit at cosine ≈ 1−1e-8 (no thresholds in
        play), so the pair set matches the exact SQL cross-join oracle."""
        ds = fx.read_fixture(sf_dir, "embeddings_dup",
                             columns=["vec_id", "embedding"])
        out = dedup.embedding_dup_pairs(ds, tau=0.98).to_pandas()
        if out.empty:   # an all-empty map_groups result loses its schema
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64")})
        return out[["id_a", "id_b"]].astype("int64").reset_index(drop=True)
    q["embedding_dup_pairs"] = embedding_dup_pairs

    # --------------------------------------------------- similarity search

    def embedding_topk(sf_dir):
        """Brute-force cosine top-10: first 3 vectors are the queries, the
        rest the corpus; query matrix broadcast once via ray.put."""
        import pyarrow.parquet as pq
        qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        order = pc.sort_indices(qtbl, sort_keys=[("vec_id", "ascending")])
        qtbl = qtbl.take(order[:3])
        qids = qtbl["vec_id"].to_pylist()
        qmat = np.asarray(qtbl["embedding"].to_pylist(), dtype=np.float64)
        # exclude exactly the rows used as queries (shared definition with
        # the oracle's vec_id < 3 / >= 3 because qids are the 3 smallest)
        corpus = fx.driver_table(sf_dir, "embeddings",
                                 columns=["vec_id", "embedding"]) \
                   .filter(expr=f"vec_id not in {[int(i) for i in qids]}")
        out = simsearch.brute_force_topk(corpus, qmat, k=10).to_pandas()
        out["query_id"] = np.asarray(qids, dtype=np.int64)[out["query_id"]]
        return out[["query_id", "vec_id"]].reset_index(drop=True)
    q["embedding_topk"] = embedding_topk

    def embedding_topk_ivf(sf_dir):
        """IVF approximate top-k (rows-only: approximate by design)."""
        import pyarrow.parquet as pq
        qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["embedding"]).slice(0, 3)
        qmat = np.asarray(qtbl["embedding"].to_pylist(), dtype=np.float64)
        corpus = fx.driver_table(sf_dir, "embeddings",
                                 columns=["vec_id", "embedding"])
        return simsearch.ivf_topk(corpus, qmat, k=10, n_centroids=8, nprobe=4) \
                        .select_columns(["query_id", "vec_id"])
    q["embedding_topk_ivf"] = embedding_topk_ivf

    def embedding_topk_ivf_fullprobe(sf_dir):
        """IVF machinery pinned EXACTLY: with nprobe == n_centroids every
        list is probed, so IVF must equal brute force — same oracle as
        embedding_topk. Verifies the partition/assign/probe path
        end-to-end, not just recall bounds."""
        import pyarrow.parquet as pq
        qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        order = pc.sort_indices(qtbl, sort_keys=[("vec_id", "ascending")])
        qtbl = qtbl.take(order[:3])
        qids = qtbl["vec_id"].to_pylist()
        qmat = np.asarray(qtbl["embedding"].to_pylist(), dtype=np.float64)
        corpus = fx.driver_table(sf_dir, "embeddings",
                                 columns=["vec_id", "embedding"]) \
                   .filter(expr=f"vec_id not in {[int(i) for i in qids]}")
        out = simsearch.ivf_topk(corpus, qmat, k=10, n_centroids=8,
                                 nprobe=8).to_pandas()
        out["query_id"] = np.asarray(qids, dtype=np.int64)[out["query_id"]]
        return out[["query_id", "vec_id"]].reset_index(drop=True)
    q["embedding_topk_ivf_fullprobe"] = embedding_topk_ivf_fullprobe

    def image_phash_verify(sf_dir):
        """Every stored image decodes and reproduces its stored phash —
        per-row invariant surfaced as an oracle-checkable column (the
        oracle asserts TRUE for every image_id)."""
        ds = fx.read_fixture(sf_dir, "images")
        out = multimodal.decode_features(ds, verify_phash=True)
        return out.select_columns(["image_id", "phash_ok"])
    q["image_phash_verify"] = image_phash_verify

    # ------------------------------ reference kernels over synthetic tables

    def normalize_streets(sf_dir):
        """[R:audit.py::update_name] M5 — the flagship scalar kernel."""
        ds = fx.read_fixture(sf_dir, "geo", columns=["image_id", "addr_street"])

        def f(b: pa.Table) -> pa.Table:
            return pa.table({"image_id": b["image_id"],
                             "street_norm": normalize.normalize_street(b["addr_street"])})
        return ds.map_batches(f, batch_format="pyarrow")
    q["normalize_streets"] = normalize_streets

    def caption_normalize(sf_dir):
        """M11 — same kernel applied to the image caption column."""
        ds = fx.read_fixture(sf_dir, "images", columns=["image_id", "caption"])

        def f(b: pa.Table) -> pa.Table:
            return pa.table({"image_id": b["image_id"],
                             "caption_norm": normalize.normalize_street(b["caption"])})
        return ds.map_batches(f, batch_format="pyarrow")
    q["caption_normalize"] = caption_normalize

    def audit_street_types(sf_dir):
        """[R:audit.py::audit] M4 — histogram of street types NOT in the
        expected list."""
        ds = fx.read_fixture(sf_dir, "geo", columns=["addr_street"])

        def f(b: pa.Table) -> pa.Table:
            st = normalize.street_type(b["addr_street"])
            mask = normalize.audit_street_mask(b["addr_street"])
            return pa.table({"street_type": pc.filter(st, mask)})
        flagged = ds.map_batches(f, batch_format="pyarrow")
        return grouped_count(flagged, "street_type")
    q["audit_street_types"] = audit_street_types

    def clean_postcodes(sf_dir):
        """[R:audit.py::update_postcode] M6 — cleaned-or-null per row."""
        ds = fx.read_fixture(sf_dir, "geo", columns=["image_id", "addr_postcode"])

        def f(b: pa.Table) -> pa.Table:
            return pa.table({"image_id": b["image_id"],
                             "postcode_clean": normalize.clean_postcode(b["addr_postcode"])})
        return ds.map_batches(f, batch_format="pyarrow")
    q["clean_postcodes"] = clean_postcodes

    def postcode_district_histogram(sf_dir):
        """A7 — valid postcodes grouped by 2-digit district prefix."""
        ds = fx.read_fixture(sf_dir, "geo", columns=["addr_postcode"])

        def f(b: pa.Table) -> pa.Table:
            clean = normalize.clean_postcode(b["addr_postcode"])
            clean = pc.drop_null(clean)
            return pa.table({"district": pc.utf8_slice_codeunits(clean, 0, 2)})
        return grouped_count(
            ds.map_batches(f, batch_format="pyarrow"), "district")
    q["postcode_district_histogram"] = postcode_district_histogram

    def bbox_quarantine(sf_dir):
        """[R:notebook::bbox check] M7/J5 — membership counts in/out."""
        ds = fx.read_fixture(sf_dir, "geo", columns=["lon", "lat"])

        def f(b: pa.Table) -> pa.Table:
            m = geo.bbox_contains(b["lon"].to_numpy(), b["lat"].to_numpy())
            return pa.table({"in_bbox": pa.array(m)})
        return grouped_count(
            ds.map_batches(f, batch_format="pyarrow"), "in_bbox")
    q["bbox_quarantine"] = bbox_quarantine

    def cell_encode_points(sf_dir):
        """M13 — grid coordinates at res 12 (bijective with the cell id)."""
        ds = fx.read_fixture(sf_dir, "geo", columns=["image_id", "lon", "lat"])

        def f(b: pa.Table) -> pa.Table:
            qx, qy = geo.cell_xy(b["lon"].to_numpy(), b["lat"].to_numpy(), CELL_RES)
            return pa.table({"image_id": b["image_id"],
                             "qx": pa.array(qx, pa.int64()),
                             "qy": pa.array(qy, pa.int64())})
        return ds.map_batches(f, batch_format="pyarrow")
    q["cell_encode_points"] = cell_encode_points

    def tile_pyramid_counts(sf_dir):
        """Tile PYRAMID rollup (res 12 → 11 → 10): per-cell point counts
        at three zoom levels from ONE pass over the points — each block
        pre-aggregates its finest-level cells and emits all three levels
        (parents by bit-shift, which is EXACTLY the direct grid quantize
        at the coarser res: scaling a float by a power of two is exact),
        so the single shuffle carries ≤ 3 × distinct-cells × blocks rows
        regardless of input size."""
        from ray.data.aggregate import Sum
        ds = fx.read_fixture(sf_dir, "geo", columns=["lon", "lat"])
        LEVELS = (CELL_RES, CELL_RES - 1, CELL_RES - 2)

        def part(b: pa.Table) -> pa.Table:
            qx, qy = geo.cell_xy(b["lon"].to_numpy(), b["lat"].to_numpy(),
                                 CELL_RES)
            key = (qx.astype(np.int64) << 32) | qy.astype(np.int64)
            uniq, counts = np.unique(key, return_counts=True)
            ux, uy = uniq >> 32, uniq & 0xFFFFFFFF
            res_col, qx_col, qy_col, n_col = [], [], [], []
            for lvl in LEVELS:
                shift = CELL_RES - lvl
                pk = ((ux >> shift) << 32) | (uy >> shift)
                pu, inv = np.unique(pk, return_inverse=True)
                pn = np.zeros(len(pu), np.int64)
                np.add.at(pn, inv, counts)
                res_col.append(np.full(len(pu), lvl, np.int64))
                qx_col.append(pu >> 32)
                qy_col.append(pu & 0xFFFFFFFF)
                n_col.append(pn)
            return pa.table({
                "res": pa.array(np.concatenate(res_col), pa.int64()),
                "qx": pa.array(np.concatenate(qx_col), pa.int64()),
                "qy": pa.array(np.concatenate(qy_col), pa.int64()),
                "n": pa.array(np.concatenate(n_col), pa.int64())})

        return ds.map_batches(part, batch_format="pyarrow") \
                 .groupby(["res", "qx", "qy"]) \
                 .aggregate(Sum("n", alias_name="n"))
    q["tile_pyramid_counts"] = tile_pyramid_counts

    def tile_assignments(sf_dir):
        """north_rule "identical tile assignments": tile grid coords / row."""
        ds = fx.read_fixture(sf_dir, "geo", columns=["image_id", "lon", "lat"])

        def f(b: pa.Table) -> pa.Table:
            qx, qy = geo.cell_xy(b["lon"].to_numpy(), b["lat"].to_numpy(), TILE_RES)
            return pa.table({"image_id": b["image_id"],
                             "tile_x": pa.array(qx, pa.int64()),
                             "tile_y": pa.array(qy, pa.int64())})
        return ds.map_batches(f, batch_format="pyarrow")
    q["tile_assignments"] = tile_assignments

    def cell_cover_compact_roundtrip(sf_dir):
        """compact/uncompact cell covers in the CONTRACT (previously
        pytest-only): the distinct occupied cells at CELL_RES survive a
        compact→uncompact roundtrip exactly, so the returned (qx, qy) set
        must equal plain per-point quantization — which is what the SQL
        twin computes. Distinct-cell set is bounded (occupied cells), so
        the roundtrip runs in one task after a pre-aggregated distinct."""
        ds = fx.read_fixture(sf_dir, "geo", columns=["lon", "lat"])

        def part(b: pa.Table) -> pa.Table:
            cells = geo.cell_encode(b["lon"].to_numpy(),
                                    b["lat"].to_numpy(), CELL_RES)
            return pa.table({"cell": pa.array(np.unique(cells), pa.int64())})

        distinct = ds.map_batches(part, batch_format="pyarrow") \
                     .groupby("cell").count().drop_columns(["count()"])

        def roundtrip(b: pa.Table) -> pa.Table:
            cells = b["cell"].to_numpy()
            cover = geo.compact_cells(cells)
            back = geo.uncompact_cells(cover, CELL_RES)
            qx, qy = geo.cell_decode(back)[:2]
            return pa.table({"qx": pa.array(qx, pa.int64()),
                             "qy": pa.array(qy, pa.int64())})
        return distinct.repartition(1).map_batches(
            roundtrip, batch_format="pyarrow", batch_size=None)
    q["cell_cover_compact_roundtrip"] = cell_cover_compact_roundtrip

    def pip_join_pairs(sf_dir):
        """J3 — cell-prefiltered point-in-polygon spatial join."""
        import pyarrow.parquet as pq
        polys = pq.read_table(fx.fixture_path(sf_dir, "polygons"))
        pts = fx.read_fixture(sf_dir, "geo", columns=["image_id", "lon", "lat"])
        out = pip_join.pip_join(pts, polys, keep_cols=["image_id"])
        return out.select_columns(["image_id", "polygon_id"])
    q["pip_join_pairs"] = pip_join_pairs

    def knn_pairs(sf_dir):
        """J4 — exact kNN via compact-cell ring expansion + coarsening."""
        pts = fx.read_fixture(sf_dir, "knn_pts")
        out = knn.knn_join(pts, k=KNN_K, res=11, id_col="image_id", exact=True)
        return out.select_columns(["id", "neighbor_id"])
    q["knn_pairs"] = knn_pairs

    def knn_pairs_salted(sf_dir):
        """J4 under EXPLICIT salting (salt=4): every hot cell's home
        points split over 4 sub-groups with ghost replication — must
        produce byte-identical results to the unsalted pass (same oracle
        as knn_pairs), proving the skew path preserves exactness."""
        pts = fx.read_fixture(sf_dir, "knn_pts")
        out = knn.knn_join(pts, k=KNN_K, res=11, id_col="image_id",
                           exact=True, salt=4)
        return out.select_columns(["id", "neighbor_id"])
    q["knn_pairs_salted"] = knn_pairs_salted

    def knn_pairs_autosalt(sf_dir):
        """J4 with DATA-DRIVEN salting: the salt factor comes from a
        measured per-cell occupancy probe (knn.auto_salt — combiner
        pre-aggregation, hottest cell / target) instead of a hand-picked
        constant. Same oracle as knn_pairs: exactness must hold at
        whatever salt the skew probe chooses."""
        pts = fx.read_fixture(sf_dir, "knn_pts")
        out = knn.knn_join(pts, k=KNN_K, res=11, id_col="image_id",
                           exact=True, salt="auto")
        return out.select_columns(["id", "neighbor_id"])
    q["knn_pairs_autosalt"] = knn_pairs_autosalt

    def radius_join_pairs(sf_dir):
        """J4b — within-distance spatial RANGE join (the radius variant of
        the north rule's compact-cell kNN): all directed pairs within
        RADIUS_M great-circle meters, exact by construction — the cell
        resolution is auto-picked so ring-1 ghosts cover the radius at
        every latitude, so ONE explode + ONE bounded-bucket shuffle
        resolves everything (no retry rounds, unlike top-k kNN)."""
        pts = fx.read_fixture(sf_dir, "knn_pts")
        out = knn.radius_join(pts, radius_m=RADIUS_M, id_col="image_id")

        def rnd(b: pa.Table) -> pa.Table:
            return pa.table({"id": b["id"], "neighbor_id": b["neighbor_id"],
                             "dist_m": _round_half_away(b["dist_m"], 1)})
        return out.map_batches(rnd, batch_format="pyarrow")
    q["radius_join_pairs"] = radius_join_pairs

    def knn_graph_triangles(sf_dir):
        """Exact triangle count of the kNN graph — the degree-ordered
        node-iterator (wedges emitted from each triangle's lowest-order
        vertex only, closure checked where wedge and edge hash together;
        no degree² blowup at hubs). Composes the engine's own kNN join."""
        from ..stages import graph
        pts = fx.read_fixture(sf_dir, "knn_pts")
        pairs = knn.knn_join(pts, k=KNN_K, res=11, id_col="image_id",
                             exact=True)

        def to_edges(b: pa.Table) -> pa.Table:
            return pa.table({"a": b["id"], "b": b["neighbor_id"]})
        edges = pairs.map_batches(to_edges, batch_format="pyarrow")
        return pd.DataFrame(
            {"n_triangles": [graph.triangle_count(edges)]})
    q["knn_graph_triangles"] = knn_graph_triangles

    def interval_overlap_pairs(sf_dir):
        """Interval OVERLAP join via temporal bucketing: each view's
        30-min attention window × each purchase's 2-h window, all
        overlapping (view, purchase) pairs. One bounded-bucket shuffle;
        pairs spanning several time buckets are emitted only from the
        canonical bucket of max(starts) — exact, no dedup pass."""
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_id", "event_type", "ts"])
        VIEW_US, PURCH_US = 1_800_000_000, 7_200_000_000

        def mk(kind: str, dur: int):
            def fn(b: pa.Table) -> pa.Table:
                f = b.filter(pc.equal(b["event_type"], kind))
                ts = f["ts"].cast(pa.int64())
                return pa.table({"event_id": f["event_id"], "s": ts,
                                 "e": pc.add(ts, dur)})
            return fn
        a = ds.map_batches(mk("view", VIEW_US), batch_format="pyarrow")
        b = ds.map_batches(mk("purchase", PURCH_US), batch_format="pyarrow")
        return interval.interval_overlap_join(
            a, b, bucket_us=PURCH_US, a_id="event_id", b_id="event_id",
            out_a="view_id", out_b="purchase_id")
    q["interval_overlap_pairs"] = interval_overlap_pairs

    def oldest_events_sorted(sf_dir):
        """API coverage for the native range-partition ``Dataset.sort``
        (everywhere else small-k uses distributed_topk): global multi-key
        sort + limit."""
        ds = fx.driver_table(sf_dir, "events", columns=["event_id", "ts"])
        out = ds.sort(["ts", "event_id"]).limit(50)

        def t_us(b: pa.Table) -> pa.Table:
            return pa.table({"event_id": b["event_id"],
                             "ts_us": pc.cast(b["ts"], pa.int64())})
        return out.map_batches(t_us, batch_format="pyarrow")
    q["oldest_events_sorted"] = oldest_events_sorted

    def orders_by_month(sf_dir):
        """Date-part rollup: orders per calendar month (vectorized epoch
        arithmetic → groupby)."""
        from ray.data.aggregate import Count, Sum
        ds = fx.driver_table(sf_dir, "orders",
                             columns=["o_orderdate", "o_totalprice"])

        def month(b: pa.Table) -> pa.Table:
            y = pc.year(b["o_orderdate"])
            m = pc.month(b["o_orderdate"])
            ym = pc.add(pc.multiply(pc.cast(y, pa.int64()), 100),
                        pc.cast(m, pa.int64()))
            return pa.table({"yyyymm": ym, "o_totalprice": b["o_totalprice"]})
        out = (ds.map_batches(month, batch_format="pyarrow")
               .groupby("yyyymm")
               .aggregate(Count(alias_name="n_orders"),
                          Sum("o_totalprice", alias_name="revenue"))).to_pandas()
        out["revenue"] = out["revenue"].round(0)
        return out
    q["orders_by_month"] = orders_by_month

    def events_value_stats_by_type(sf_dir):
        """Mean/stddev aggregate per event type (Ray's streaming Std
        aggregate — Welford-style mergeable partials in the shuffle)."""
        from ray.data.aggregate import Count, Mean, Std
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "value"])
        out = (ds.groupby("event_type")
               .aggregate(Count(alias_name="cnt"),
                          Mean("value", alias_name="avg_value"),
                          Std("value", alias_name="sd_value"))).to_pandas()
        out["avg_value"] = out["avg_value"].round(4)
        out["sd_value"] = out["sd_value"].round(4)
        return out
    q["events_value_stats_by_type"] = events_value_stats_by_type

    def exact_dedup_images(sf_dir):
        """D1 — exact dedup by phash, keep min image_id."""
        ds = fx.read_fixture(sf_dir, "images", columns=["image_id", "phash"])
        return dedup.exact_dedup(ds, "phash", "image_id") \
                    .select_columns(["image_id"])
    q["exact_dedup_images"] = exact_dedup_images

    def way_node_resolution(sf_dir):
        """J1 — resolve way node_refs to positions (hash join on node id)."""
        wn = fx.read_fixture(sf_dir, "way_nodes")
        nodes = fx.read_fixture(sf_dir, "nodes", columns=["id", "lon", "lat"]) \
                  .rename_columns({"id": "node_id"})
        out = wn.join(nodes, on=("node_id",), join_type="inner",
                      **join_kwargs(fx.table_join_partitions(
                          sf_dir, "way_nodes", "nodes")))
        return out.select_columns(["way_id", "position", "lon", "lat"])
    q["way_node_resolution"] = way_node_resolution

    def tag_key_classification(sf_dir):
        """[R:tags.py::process_map] M2 — key-bucket histogram."""
        ds = fx.read_fixture(sf_dir, "tags", columns=["key"])

        def f(b: pa.Table) -> pa.Table:
            return pa.table({"bucket": normalize.classify_keys(b["key"])})
        return grouped_count(
            ds.map_batches(f, batch_format="pyarrow"), "bucket")
    q["tag_key_classification"] = tag_key_classification

    def tags_clean(sf_dir):
        """[R:data.py::shape_element] M3 — tag rows surviving the shaping
        rules: problem-char keys dropped, two-colon keys skipped."""
        ds = fx.read_fixture(sf_dir, "tags")

        def f(b: pa.Table) -> pa.Table:
            bad = normalize.problem_key_mask(b["key"])
            two_colon = pc.greater_equal(
                pc.count_substring(b["key"], ":"), 2)
            keep = pc.invert(pc.or_kleene(bad, two_colon))
            return b.filter(keep).select(["elem_id", "key", "value"])
        return ds.map_batches(f, batch_format="pyarrow")
    q["tags_clean"] = tags_clean

    def tag_counts(sf_dir):
        """[R:mapparser.py::count_tags] M1 — per-key tag counts."""
        ds = fx.read_fixture(sf_dir, "tags", columns=["key"])
        return grouped_count(ds, "key")
    q["tag_counts"] = tag_counts

    def top_amenities(sf_dir):
        """[R:notebook] A6 — top-10 amenity values."""
        ds = fx.read_fixture(sf_dir, "tags", columns=["key", "value"])
        am = ds.filter(expr="key == 'amenity'")
        counts = grouped_count(am, "value")
        return distributed_topk(counts, 10, [("cnt", "descending"),
                                             ("value", "ascending")])
    q["top_amenities"] = top_amenities

    def shape_elements(sf_dir):
        """[R:data.py::shape_element] M8 — unified node/way document table
        (flat columns; 'created' fields coerced, timestamps to epoch µs)."""
        def shape(kind):
            def f(b: pa.Table) -> pa.Table:
                n = len(b)
                out = {
                    "id": b["id"],
                    "elem_type": pa.array([kind] * n, pa.string()),
                    "lon": b["lon"] if kind == "node" else pa.nulls(n, pa.float64()),
                    "lat": b["lat"] if kind == "node" else pa.nulls(n, pa.float64()),
                    "user": b["user"],
                    "uid": b["uid"],
                    "version": b["version"],
                    "changeset": b["changeset"],
                    "ts_us": pc.cast(b["timestamp"], pa.int64()),
                }
                return pa.table(out)
            return f
        nodes = fx.read_fixture(sf_dir, "nodes").map_batches(
            shape("node"), batch_format="pyarrow")
        ways = fx.read_fixture(sf_dir, "ways").map_batches(
            shape("way"), batch_format="pyarrow")
        return nodes.union(ways)
    q["shape_elements"] = shape_elements

    def osm_distinct_users(sf_dir):
        """[R:users.py] M10/A3 — distinct contributors over nodes+ways."""
        nodes = fx.read_fixture(sf_dir, "nodes", columns=["uid"])
        ways = fx.read_fixture(sf_dir, "ways", columns=["uid"])
        n = nodes.union(ways).groupby("uid").count().count()
        return pd.DataFrame({"n_users": [int(n)]})
    q["osm_distinct_users"] = osm_distinct_users

    def osm_top_contributors(sf_dir):
        """A4 — top-10 contributors by element count."""
        nodes = fx.read_fixture(sf_dir, "nodes", columns=["user"])
        ways = fx.read_fixture(sf_dir, "ways", columns=["user"])
        counts = grouped_count(nodes.union(ways), "user")
        return distributed_topk(counts, 10, [("cnt", "descending"),
                                             ("user", "ascending")])
    q["osm_top_contributors"] = osm_top_contributors

    def osm_one_shot_users(sf_dir):
        """A5 — contributors with exactly one element."""
        nodes = fx.read_fixture(sf_dir, "nodes", columns=["uid"])
        ways = fx.read_fixture(sf_dir, "ways", columns=["uid"])
        counts = nodes.union(ways).groupby("uid").count() \
                      .rename_columns({"count()": "cnt"})
        n = counts.filter(expr="cnt == 1").count()
        return pd.DataFrame({"n_one_shot": [int(n)]})
    q["osm_one_shot_users"] = osm_one_shot_users

    def sample_docs_seeded(sf_dir):
        """O3 — seeded random sample (rows-only: sampling is inherently
        non-SQL-reproducible; the driver records row-count only)."""
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id"])
        return ds.random_sample(0.2, seed=42)
    q["sample_docs_seeded"] = sample_docs_seeded

    def count_by_elem_type(sf_dir):
        """[R:mapparser.py::count_tags] M1/A2 — node vs way counts."""
        nodes = fx.read_fixture(sf_dir, "nodes", columns=["id"])
        ways = fx.read_fixture(sf_dir, "ways", columns=["id"])

        def tag(kind):
            def f(b: pa.Table) -> pa.Table:
                return pa.table({"elem_type": pa.array([kind] * len(b))})
            return f
        u = nodes.map_batches(tag("node"), batch_format="pyarrow").union(
            ways.map_batches(tag("way"), batch_format="pyarrow"))
        return grouped_count(u, "elem_type")
    q["count_by_elem_type"] = count_by_elem_type

    def systematic_sample_nodes(sf_dir):
        """[R:sample.py] S4/O2 — every k-th element (k=10), deterministic."""
        from ..sources import osm_xml
        nodes = fx.read_fixture(sf_dir, "nodes", columns=["id"])
        return osm_xml.systematic_sample(nodes, 10, id_col="id")
    q["systematic_sample_nodes"] = systematic_sample_nodes

    def quarantine_rows(sf_dir):
        """J5/D3 — union of quarantines: one row per (row, violation)."""
        ds = fx.read_fixture(sf_dir, "geo",
                             columns=["image_id", "lon", "lat", "addr_postcode"])

        def f(b: pa.Table) -> pa.Table:
            bad_pc = pc.invert(pc.is_valid(normalize.clean_postcode(b["addr_postcode"])))
            out_bb = ~geo.bbox_contains(b["lon"].to_numpy(), b["lat"].to_numpy())
            ids_pc = b["image_id"].filter(bad_pc)
            ids_bb = b["image_id"].filter(pa.array(out_bb))
            return pa.table({
                "image_id": pa.concat_arrays(
                    [ids_pc.combine_chunks(), ids_bb.combine_chunks()]),
                "reason": pa.array(["postcode"] * len(ids_pc)
                                   + ["bbox"] * len(ids_bb)),
            })
        return ds.map_batches(f, batch_format="pyarrow")
    q["quarantine_rows"] = quarantine_rows

    def per_cell_counts(sf_dir):
        """A8 — per-cell row counts (the per-partition metrics the
        Lance-like manifest checkpoints). Map-side PRE-AGGREGATED: each
        batch emits ≤1 row per distinct cell (np.unique partial counts),
        so the shuffle carries cells×blocks rows instead of every point —
        the combiner pattern every hot-key groupby needs at 100 TB."""
        from ray.data.aggregate import Sum
        ds = fx.read_fixture(sf_dir, "geo", columns=["lon", "lat"])

        def partial(b: pa.Table) -> pa.Table:
            qx, qy = geo.cell_xy(b["lon"].to_numpy(), b["lat"].to_numpy(),
                                 CELL_RES)
            key = (qx.astype(np.uint64) << np.uint64(32)) | qy.astype(np.uint64)
            uniq, counts = np.unique(key, return_counts=True)
            return pa.table({
                "qx": pa.array((uniq >> np.uint64(32)).astype(np.int64)),
                "qy": pa.array((uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                "cnt": pa.array(counts.astype(np.int64))})
        return ds.map_batches(partial, batch_format="pyarrow") \
                 .groupby(["qx", "qy"]).aggregate(Sum("cnt", alias_name="cnt"))
    q["per_cell_counts"] = per_cell_counts

    def hot_cells(sf_dir):
        """A9 — top-20 hottest cells (drives the salt-factor choice);
        distributed top-k so the full cell histogram stays on-cluster."""
        return distributed_topk(per_cell_counts(sf_dir), 20,
                                [("cnt", "descending"), ("qx", "ascending"),
                                 ("qy", "ascending")])
    q["hot_cells"] = hot_cells

    def events_hourly(sf_dir):
        """Tumbling-window aggregate (1h) — counts + value sum per window
        and event type (graft streaming-style op over the events table)."""
        ds = fx.driver_table(sf_dir, "events",
                            columns=["ts", "event_type", "value"])

        def f(b: pa.Table) -> pa.Table:
            us = pc.cast(b["ts"], pa.int64()).to_numpy()
            return pa.table({"hour_idx": pa.array(us // 3_600_000_000, pa.int64()),
                             "event_type": b["event_type"],
                             "value": b["value"]})
        from ray.data.aggregate import Count, Sum
        out = (ds.map_batches(f, batch_format="pyarrow")
                 .groupby(["hour_idx", "event_type"])
                 .aggregate(Count(alias_name="cnt"),
                            Sum("value", alias_name="sum_value"))).to_pandas()
        out["sum_value"] = out["sum_value"].round(2)
        return out
    q["events_hourly"] = events_hourly

    def sessionize_events(sf_dir):
        """Sessionization: per-user event runs split at >30 min gaps —
        total session count (order pinned by (ts, event_id))."""
        from ..util import bucketed_group_apply
        ds = fx.driver_table(sf_dir, "events",
                            columns=["user_id", "ts", "event_id"])

        def count_sessions(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
            us = g["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
            uid = g["user_id"].to_numpy()
            new_user = np.empty(len(g), bool)
            new_user[0] = True
            new_user[1:] = uid[1:] != uid[:-1]
            gap = np.empty(len(g), bool)
            gap[0] = True
            gap[1:] = (us[1:] - us[:-1]) > 30 * 60 * 1_000_000_000
            n = int((new_user | gap).sum())
            return pd.DataFrame({"n_sessions": [n]})

        parts = bucketed_group_apply(ds, ["user_id"], count_sessions,
                                     n_buckets=64).to_pandas()
        return pd.DataFrame({"n_sessions": [int(parts["n_sessions"].sum())]})
    q["sessionize_events"] = sessionize_events

    def way_geometry(sf_dir):
        """J1 extension — per-way polyline summary from the resolved
        node positions (order carried by ``position``)."""
        from ..util import bucketed_group_apply, join_kwargs
        wn = fx.read_fixture(sf_dir, "way_nodes")
        nodes = fx.read_fixture(sf_dir, "nodes", columns=["id", "lon", "lat"]) \
                  .rename_columns({"id": "node_id"})
        joined = wn.join(nodes, on=("node_id",), join_type="inner",
                         **join_kwargs(fx.table_join_partitions(
                             sf_dir, "way_nodes", "nodes")))

        def summarize(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["way_id", "position"], kind="mergesort")
            grp = g.groupby("way_id", sort=False)
            out = grp.agg(n_points=("position", "size"),
                          first_lon=("lon", "first"), first_lat=("lat", "first"),
                          last_lon=("lon", "last"), last_lat=("lat", "last"))
            return out.reset_index()

        return bucketed_group_apply(joined, ["way_id"], summarize,
                                    n_buckets=64)
    q["way_geometry"] = way_geometry

    def way_polyline_length(sf_dir):
        """Polyline length per way: great-circle sum over consecutive
        resolved nodes. Segment lengths go to integer millimeters BEFORE
        the sum (floor(d*1000+0.5)) so the per-way total is exact at any
        parallelism; ways with < 2 nodes have no segments on either side."""
        from ..util import bucketed_group_apply
        joined = _way_points(sf_dir)

        def lengths(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["way_id", "position"], kind="mergesort")
            wid = g["way_id"].to_numpy()
            pos = g["position"].to_numpy()
            lon = g["lon"].to_numpy()
            lat = g["lat"].to_numpy()
            # STRICT position adjacency (matches the SQL twin's
            # b.position = a.position + 1): an unresolved node must break
            # the polyline, not bridge it with a synthetic chord
            same = (wid[1:] == wid[:-1]) & (pos[1:] == pos[:-1] + 1)
            d = geo.haversine_m(lon[:-1][same], lat[:-1][same],
                                lon[1:][same], lat[1:][same])
            mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
            df = pd.DataFrame({"way_id": wid[1:][same], "mm": mm})
            out = df.groupby("way_id", sort=False)["mm"] \
                    .agg(["size", "sum"]).reset_index()
            return pd.DataFrame({"way_id": out["way_id"],
                                 "n_segments": out["size"].astype(np.int64),
                                 "len_mm": out["sum"].astype(np.int64)})

        return bucketed_group_apply(joined, ["way_id"], lengths,
                                    n_buckets=64)
    q["way_polyline_length"] = way_polyline_length

    def _way_points(sf_dir):
        """way_nodes ⋈ nodes — the resolved way-point table shared by the
        polyline/crossing/relation family."""
        from ..util import join_kwargs
        wn = fx.read_fixture(sf_dir, "way_nodes")
        nodes = fx.read_fixture(sf_dir, "nodes", columns=["id", "lon", "lat"]) \
                  .rename_columns({"id": "node_id"})
        return wn.join(nodes, on=("node_id",), join_type="inner",
                       **join_kwargs(fx.table_join_partitions(
                           sf_dir, "way_nodes", "nodes")))

    def _crossing_pairs(sf_dir, joined):
        """Distinct (way, polygon) proper-crossing pairs from an
        already-joined way-point dataset (edges broadcast once)."""
        import pyarrow.parquet as pq
        import ray

        from ..util import _bcast_get, bucketed_group_apply
        ed = pq.read_table(fx.fixture_path(sf_dir, "edges"))
        ref = ray.put((np.asarray(ed["polygon_id"].to_pylist()),
                       ed["x1"].to_numpy(), ed["y1"].to_numpy(),
                       ed["x2"].to_numpy(), ed["y2"].to_numpy()))

        def cross(g: pd.DataFrame) -> pd.DataFrame:
            pid, ex1, ey1, ex2, ey2 = _bcast_get(ref)
            g = g.sort_values(["way_id", "position"], kind="mergesort")
            wid = g["way_id"].to_numpy()
            pos = g["position"].to_numpy()
            x, y = g["lon"].to_numpy(), g["lat"].to_numpy()
            # strict adjacency — see way_polyline_length
            same = (wid[1:] == wid[:-1]) & (pos[1:] == pos[:-1] + 1)
            sx1, sy1 = x[:-1][same], y[:-1][same]
            sx2, sy2 = x[1:][same], y[1:][same]
            swid = wid[1:][same]
            out_w, out_p = [], []
            for c in range(0, len(swid), 512):
                ax, ay = sx1[c:c+512, None], sy1[c:c+512, None]
                bx, by = sx2[c:c+512, None], sy2[c:c+512, None]
                o1 = (bx-ax)*(ey1[None, :]-ay) - (by-ay)*(ex1[None, :]-ax)
                o2 = (bx-ax)*(ey2[None, :]-ay) - (by-ay)*(ex2[None, :]-ax)
                o3 = ((ex2-ex1)[None, :]*(ay-ey1[None, :])
                      - (ey2-ey1)[None, :]*(ax-ex1[None, :]))
                o4 = ((ex2-ex1)[None, :]*(by-ey1[None, :])
                      - (ey2-ey1)[None, :]*(bx-ex1[None, :]))
                m = (o1 * o2 < 0) & (o3 * o4 < 0)
                rows, cols = np.nonzero(m)
                if len(rows):
                    out_w.append(swid[c:c+512][rows])
                    out_p.append(pid[cols])
            if not out_w:
                from ..util import typed_empty_series
                return pd.DataFrame({
                    "way_id": typed_empty_series(wid),
                    "polygon_id": typed_empty_series(pid)})
            df = pd.DataFrame({"way_id": np.concatenate(out_w),
                               "polygon_id": np.concatenate(out_p)})
            return df.drop_duplicates()

        return bucketed_group_apply(joined, ["way_id"], cross, n_buckets=64)

    def ways_crossing_polygons(sf_dir):
        """Segment-intersection spatial join: (way, polygon) pairs where
        any way segment PROPERLY crosses any polygon edge (strict
        orientation tests — o1·o2 < 0 ∧ o3·o4 < 0, identical float
        expressions on both engines). Polygon edges broadcast once
        (small dimension side); segments are built and tested inside the
        same bucketed pass that resolves way order — no extra shuffle,
        distinct pairs settled in-bucket (a way lives in one bucket)."""
        return _crossing_pairs(sf_dir, _way_points(sf_dir))
    q["ways_crossing_polygons"] = ways_crossing_polygons

    def way_polygon_relation(sf_dir):
        """DE-9IM-lite spatial relate: for every (way, polygon) pair that
        interacts at all, classify 'crosses' (a segment properly crosses
        the boundary), 'within' (every vertex inside, no crossing) or
        'partial' (some vertices inside, no crossing). COMPOSITION of the
        engine's own operators: PIP join (vertex containment counts) ∪
        segment-crossing join, cogrouped in one bounded bucketed shuffle,
        per-way node counts attached by broadcast join."""
        import pyarrow.parquet as pq

        from ..util import broadcast_inner_join, bucketed_group_apply
        polys = pq.read_table(fx.fixture_path(sf_dir, "polygons"))
        # ONE way-point join feeds PIP, crossing AND the node counts
        # (review finding: the crossing side used to redo the join)
        joined = _way_points(sf_dir).materialize()

        hits = pip_join.pip_join(joined, polys, keep_cols=["way_id"])

        def ic_side(b: pa.Table) -> pa.Table:
            return pa.table({"way_id": b["way_id"],
                             "polygon_id": b["polygon_id"],
                             "n_in": pa.array(np.ones(len(b), np.int64)),
                             "crossed": pa.array(np.zeros(len(b), np.int8))})

        xing = _crossing_pairs(sf_dir, joined)

        def x_side(b: pa.Table) -> pa.Table:
            return pa.table({"way_id": b["way_id"],
                             "polygon_id": b["polygon_id"],
                             "n_in": pa.array(np.zeros(len(b), np.int64)),
                             "crossed": pa.array(np.ones(len(b), np.int8))})

        both = hits.map_batches(ic_side, batch_format="pyarrow").union(
            xing.map_batches(x_side, batch_format="pyarrow"))

        def cogroup(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby(["way_id", "polygon_id"], sort=False).agg(
                n_in=("n_in", "sum"), crossed=("crossed", "max"))
            return out.reset_index()

        pairs = bucketed_group_apply(both, ["way_id", "polygon_id"],
                                     cogroup, n_buckets=256)
        nn = joined.groupby("way_id").count() \
                   .rename_columns({"count()": "n_nodes"})
        merged = broadcast_inner_join(pairs, nn, on="way_id")

        def classify(b: pa.Table) -> pa.Table:
            n_in = b["n_in"].to_numpy()
            crossed = b["crossed"].to_numpy()
            n_nodes = b["n_nodes"].to_numpy()
            rel = np.where(crossed == 1, "crosses",
                           np.where(n_in == n_nodes, "within", "partial"))
            return pa.table({"way_id": b["way_id"],
                             "polygon_id": b["polygon_id"],
                             "n_in": pa.array(n_in, pa.int64()),
                             "n_nodes": pa.array(n_nodes, pa.int64()),
                             "relation": pa.array(rel)})
        return merged.map_batches(classify, batch_format="pyarrow")
    q["way_polygon_relation"] = way_polygon_relation

    def embedding_sq8_check(sf_dir):
        """SQ8 scalar quantization of the embedding column: per-dim
        global [min,max] → uint8 codes; the contract pins each vector's
        max reconstruction error (e6). Codes themselves are binary
        payloads (not SQL-comparable) — the error bound IS the semantic
        the index consumer cares about."""
        ds = fx.driver_table(sf_dir, "embeddings",
                             columns=["vec_id", "embedding"])
        out = simsearch.sq8_quantize(ds)
        return out.select_columns(["vec_id", "max_err_e6"])
    q["embedding_sq8_check"] = embedding_sq8_check

    def part_cooccurrence(sf_dir):
        """Market-basket co-occurrence mining: for every order, every
        unordered pair of DISTINCT parts bought together, counted with
        row multiplicity (the item-item matrix of recommender
        pipelines). One bounded bucketed shuffle on the basket key; the
        pair expansion is fully vectorized (offset arithmetic, no Python
        loop over baskets); per-bucket partial counts shrink the final
        (p1, p2) groupby to unique pairs."""
        from ray.data.aggregate import Sum

        from ..util import bucketed_group_apply
        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_orderkey", "l_partkey"])

        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["l_orderkey", "l_partkey"], kind="mergesort")
            ok = g["l_orderkey"].to_numpy()
            pk = g["l_partkey"].to_numpy()
            n = len(ok)
            if n < 2:
                return pd.DataFrame({"p1": pk[:0], "p2": pk[:0],
                                     "n": np.empty(0, np.int64)})
            # run ends per row: index of the last row of this order
            new = np.empty(n, bool)
            new[0] = True
            new[1:] = ok[1:] != ok[:-1]
            run_id = np.cumsum(new) - 1
            run_end = np.zeros(run_id.max() + 1, np.int64)
            np.maximum.at(run_end, run_id, np.arange(n))
            k = run_end[run_id] - np.arange(n)       # pairs per left row
            idx_a = np.repeat(np.arange(n), k)
            # right index: consecutive offsets restarting per left row
            off = np.arange(len(idx_a)) - np.repeat(
                np.concatenate(([0], np.cumsum(k)[:-1])), k)
            idx_b = idx_a + 1 + off
            p1, p2 = pk[idx_a], pk[idx_b]
            m = p1 != p2                             # distinct parts only
            df = pd.DataFrame({"p1": p1[m], "p2": p2[m]})
            return df.groupby(["p1", "p2"], sort=False) \
                     .size().reset_index(name="n")

        partial = bucketed_group_apply(li, ["l_orderkey"], pairs,
                                       n_buckets=256)
        return partial.groupby(["p1", "p2"]) \
                      .aggregate(Sum("n", alias_name="n"))
    q["part_cooccurrence"] = part_cooccurrence

    def event_transition_counts(sf_dir):
        """First-order Markov transition counts over each user's event
        sequence (ordered by ts, event_id): the sequence-mining shape.
        One bounded bucketed shuffle on user_id; per bucket a vectorized
        sort + shift; (src, dst) partials summed in a tiny groupby."""
        from ray.data.aggregate import Sum

        from ..util import bucketed_group_apply
        ds = fx.driver_table(sf_dir, "events",
                             columns=["user_id", "event_type", "ts",
                                      "event_id"])

        def narrow(b: pa.Table) -> pa.Table:
            return pa.table({"user_id": b["user_id"],
                             "event_type": b["event_type"],
                             "ts_us": b["ts"].cast(pa.int64()),
                             "event_id": b["event_id"]})

        def trans(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["user_id", "ts_us", "event_id"],
                              kind="mergesort")
            uid = g["user_id"].to_numpy()
            et = g["event_type"].to_numpy()
            same = uid[1:] == uid[:-1]
            df = pd.DataFrame({"src": et[:-1][same], "dst": et[1:][same]})
            if not len(df):
                from ..util import typed_empty_series
                return pd.DataFrame({"src": typed_empty_series(et),
                                     "dst": typed_empty_series(et),
                                     "n": np.empty(0, np.int64)})
            return df.groupby(["src", "dst"], sort=False) \
                     .size().reset_index(name="n")

        ev = ds.map_batches(narrow, batch_format="pyarrow")
        partial = bucketed_group_apply(ev, ["user_id"], trans,
                                       n_buckets=256)
        return partial.groupby(["src", "dst"]) \
                      .aggregate(Sum("n", alias_name="n"))
    q["event_transition_counts"] = event_transition_counts

    def zonal_stats(sf_dir):
        """Zonal statistics: per polygon, count + exact e6 fixed-point
        coordinate sums of the points inside it (PIP join reused; the
        per-block partial pre-aggregates before one tiny groupby)."""
        import pyarrow.parquet as pq
        from ray.data.aggregate import Sum
        polys = pq.read_table(fx.fixture_path(sf_dir, "polygons"))
        pts = fx.read_fixture(sf_dir, "geo", columns=["image_id", "lon", "lat"])
        out = pip_join.pip_join(pts, polys,
                                keep_cols=["image_id", "lon", "lat"])

        def part(b: pa.Table) -> pa.Table:
            lon6 = np.floor(b["lon"].to_numpy() * 1e6 + 0.5).astype(np.int64)
            lat6 = np.floor(b["lat"].to_numpy() * 1e6 + 0.5).astype(np.int64)
            df = pd.DataFrame({"polygon_id": b["polygon_id"].to_numpy(),
                               "lon6": lon6, "lat6": lat6})
            g = df.groupby("polygon_id", sort=False).agg(
                n_points=("lon6", "size"), sum_lon_e6=("lon6", "sum"),
                sum_lat_e6=("lat6", "sum")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        return out.map_batches(part, batch_format="pyarrow") \
                  .groupby("polygon_id") \
                  .aggregate(Sum("n_points", alias_name="n_points"),
                             Sum("sum_lon_e6", alias_name="sum_lon_e6"),
                             Sum("sum_lat_e6", alias_name="sum_lat_e6"))
    q["zonal_stats"] = zonal_stats

    def funnel_conversion(sf_dir):
        """Funnel analysis: of users with a 'view', how many 'purchase'
        within 24 h after their FIRST view. Narrow columns, one bounded
        bucketed shuffle on user_id, per-bucket vectorized pandas, two
        integer partial counters summed on-cluster."""
        from ray.data.aggregate import Sum

        from ..util import bucketed_group_apply
        DAY = 86_400_000_000
        ds = fx.driver_table(sf_dir, "events",
                             columns=["user_id", "event_type", "ts"])

        def narrow(b: pa.Table) -> pa.Table:
            m = pc.is_in(b["event_type"],
                         value_set=pa.array(["view", "purchase"]))
            f = b.filter(m)
            return pa.table({"user_id": f["user_id"],
                             "is_view": pc.equal(f["event_type"], "view"),
                             "ts_us": f["ts"].cast(pa.int64())})

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            gv = g[g["is_view"]]
            if not len(gv):
                return pd.DataFrame({"n_viewers": [0], "n_converted": [0]})
            fv = gv.groupby("user_id")["ts_us"].min()
            gp = g[~g["is_view"]].merge(fv.rename("fv"), left_on="user_id",
                                        right_index=True)
            hit = gp[(gp["ts_us"] > gp["fv"])
                     & (gp["ts_us"] <= gp["fv"] + DAY)]
            return pd.DataFrame({"n_viewers": [len(fv)],
                                 "n_converted": [hit["user_id"].nunique()]})

        ev = ds.map_batches(narrow, batch_format="pyarrow")
        parts = bucketed_group_apply(ev, ["user_id"], per_bucket,
                                     n_buckets=256)
        agg = parts.aggregate(Sum("n_viewers"), Sum("n_converted")) or {}
        return pd.DataFrame({
            "n_viewers": [int(agg.get("sum(n_viewers)") or 0)],
            "n_converted": [int(agg.get("sum(n_converted)") or 0)]})
    q["funnel_conversion"] = funnel_conversion

    # ------------------------------------------- multimodal / tile stages

    def render_tile_stats(sf_dir):
        """T3 — per-tile render over images⋈geo (png hashed to a stable
        crc so the check pins pixel bytes without shipping them)."""
        import zlib
        from ..util import broadcast_inner_join
        imgs = fx.read_fixture(sf_dir, "images",
                               columns=["image_id", "bytes", "w", "h", "fmt"])
        g = fx.read_fixture(sf_dir, "geo", columns=["image_id", "lon", "lat"])
        # geo is the narrow dimension side (~1% of the byte volume):
        # broadcast it so the image BYTES never cross a join shuffle —
        # they move once, in the tile-bucket exchange inside render_tiles
        joined = broadcast_inner_join(imgs, g, "image_id")
        out = tiles.render_tiles(joined, tile_res=TILE_RES)

        def crc(b: pa.Table) -> pa.Table:
            return pa.table({
                "tile_id": b["tile_id"],
                "n_images": b["n_images"],
                "png_crc": pa.array([zlib.crc32(x) for x in b["png"].to_pylist()],
                                    pa.int64()),
            })
        return out.map_batches(crc, batch_format="pyarrow")
    q["render_tile_stats"] = render_tile_stats

    def image_format_histogram(sf_dir):
        """S6 metadata analytics — row counts per stored image format."""
        ds = fx.read_fixture(sf_dir, "images", columns=["fmt"])
        return grouped_count(ds, "fmt")
    q["image_format_histogram"] = image_format_histogram

    def image_size_stats(sf_dir):
        """S6 metadata analytics — pixel-count stats per format."""
        from ray.data.aggregate import Count, Max, Mean
        ds = fx.read_fixture(sf_dir, "images", columns=["fmt", "w", "h"])

        def f(b: pa.Table) -> pa.Table:
            return pa.table({"fmt": b["fmt"],
                             "px": pc.multiply(pc.cast(b["w"], pa.int64()),
                                               pc.cast(b["h"], pa.int64()))})
        out = (ds.map_batches(f, batch_format="pyarrow")
                 .groupby("fmt")
                 .aggregate(Count(alias_name="cnt"),
                            Mean("px", alias_name="avg_px"),
                            Max("px", alias_name="max_px"))).to_pandas()
        out["avg_px"] = out["avg_px"].round(2)
        return out
    q["image_size_stats"] = image_size_stats

    def resize_images_thumb(sf_dir):
        """S6 — decode → nearest-neighbor 16×16 → re-encode raw8; emits
        (image_id, n_bytes). Oracle-paired: every image must survive
        decode→resize→encode with exactly 16·16·3 output bytes."""
        ds = fx.read_fixture(sf_dir, "images",
                             columns=["image_id", "bytes", "w", "h", "fmt"])
        out = multimodal.resize_images(ds, 16, 16, "raw8")

        def f(b: pa.Table) -> pa.Table:
            sizes = pa.array([len(x) for x in b["bytes"].to_pylist()], pa.int64())
            return pa.table({"image_id": b["image_id"], "n_bytes": sizes})
        return out.map_batches(f, batch_format="pyarrow")
    q["resize_images_thumb"] = resize_images_thumb

    def flagship_full_summary(sf_dir):
        """The full north-star lifecycle (join → clean → dedup → PIP →
        kNN → tiles) pinned END-TO-END: one summary row whose every
        count the oracle recomputes independently in SQL over the same
        fixtures (dedup set, even-odd PIP pairs, kNN row count, distinct
        populated tiles, caption-normalization effect)."""
        from . import flagship as fl
        return fl.flagship_full(sf_dir)
    q["flagship_full_summary"] = flagship_full_summary

    def uids_in_both_nodes_and_ways(sf_dir):
        """Distributed SEMI join (INTERSECT): contributors present in
        BOTH element tables — distinct node uids semi-joined against way
        uids (anti_semi_join(semi=True), one bucketed shuffle)."""
        from ..util import anti_semi_join
        nodes = fx.read_fixture(sf_dir, "nodes", columns=["uid"])
        ways = fx.read_fixture(sf_dir, "ways", columns=["uid"])
        nd = nodes.map_batches(
            lambda b: pa.table({"uid": pc.unique(b["uid"])}),
            batch_format="pyarrow")
        nd = dedup.exact_dedup(nd, "uid", "uid")     # global distinct
        return anti_semi_join(nd, ways, on="uid", semi=True)
    q["uids_in_both_nodes_and_ways"] = uids_in_both_nodes_and_ways

    def user_customer_coverage(sf_dir):
        """FULL OUTER join semantics via one bucketed cogroup: distinct
        event users vs customer keys → per-key category (both /
        event_only / customer_only) → counts. No Dataset.join; the union
        + per-key reduce is the outer-join plan that scales."""
        from ..util import bucketed_group_apply
        ev = fx.driver_table(sf_dir, "events", columns=["user_id"])
        cust = fx.driver_table(sf_dir, "customer", columns=["c_custkey"])

        def ev_rows(b: pa.Table) -> pa.Table:
            u = pc.unique(b["user_id"])
            return pa.table({"key": u,
                             "src": pa.array(np.zeros(len(u), np.int8))})

        def cust_rows(b: pa.Table) -> pa.Table:
            return pa.table({"key": pc.cast(b["c_custkey"], pa.int64()),
                             "src": pa.array(np.ones(len(b), np.int8))})

        u = ev.map_batches(ev_rows, batch_format="pyarrow").union(
            cust.map_batches(cust_rows, batch_format="pyarrow"))

        def classify(g: pd.DataFrame) -> pd.DataFrame:
            has = g.groupby("key", sort=False)["src"].agg(["min", "max"])
            cat = np.where(has["min"] == has["max"],
                           np.where(has["min"] == 0, "event_only",
                                    "customer_only"), "both")
            return pd.DataFrame({"category": cat})

        cats = bucketed_group_apply(u, ["key"], classify, n_buckets=64) \
            .map_batches(lambda b: b, batch_format="pyarrow")
        # (blocks must be arrow: rename_columns breaks on pandas blocks)
        return grouped_count(cats, "category")
    q["user_customer_coverage"] = user_customer_coverage

    def lancelike_zonemap_scan(sf_dir):
        """Zone-map pruned range scan on the lancelike store: geo points
        are written sorted by lon (range-partitioned blocks ⇒ disjoint
        per-fragment [min,max] zones, recorded in the manifest), then a
        lon-range read opens ONLY the overlapping fragments (metadata
        decision — asserted to be a strict subset) before the exact
        inclusive filter. Oracle: the same range filter over the fixture."""
        from ..sources import lancelike
        ds = fx.read_fixture(sf_dir, "geo", columns=["image_id", "lon"])
        root = f"/tmp/graft_out/zm_demo_{fx.sf_tag(sf_dir)}"
        lancelike.write_dataset(
            ds.sort("lon"), root, stage="zm_demo", parent=fx.sf_tag(sf_dir),
            fingerprint=lancelike.input_fingerprint(ds),
            zonemap_cols=["lon"])
        lo, hi = 103.8, 103.9
        out, scanned, total = lancelike.read_dataset_range(
            root, "lon", lo, hi, columns=["image_id", "lon"])
        if not (0 < scanned < total):
            raise AssertionError(
                f"zone-map pruning ineffective: {scanned}/{total}")
        return out
    q["lancelike_zonemap_scan"] = lancelike_zonemap_scan

    def lancelike_spatial_scan(sf_dir):
        """SPATIAL index scan through the store (the north-star
        "cell-prefiltered" read path): geo points are written sorted by
        their res-12 Morton cell id (2-D locality ⇒ near-disjoint
        per-fragment cell zones), then one coarse res-8 parent cell is
        read as a CONTIGUOUS child-cell range — Morton prefix at res 8
        IS the res-8 quantization, so fragment pruning is a pure
        metadata decision and the twin expresses the identical
        predicate as coarse-cell equality. Asserts the scan opened a
        strict subset of fragments."""
        from ..sources import lancelike
        rf, rc = 12, 8
        ds = fx.read_fixture(sf_dir, "geo",
                             columns=["image_id", "lon", "lat"])

        def add_cell(b: pa.Table) -> pa.Table:
            cell = geo.cell_encode(b["lon"].to_numpy(),
                                   b["lat"].to_numpy(), rf)
            return b.append_column("cell", pa.array(cell, pa.int64()))

        withc = ds.map_batches(add_cell, batch_format="pyarrow")
        root = f"/tmp/graft_out/spatial_zm_{fx.sf_tag(sf_dir)}"
        lancelike.write_dataset(
            withc.sort("cell"), root, stage="spatial_zm",
            parent=fx.sf_tag(sf_dir),
            fingerprint=lancelike.input_fingerprint(ds),
            zonemap_cols=["cell"])
        qx8, qy8 = geo.cell_xy(np.array([SPATIAL_SCAN_LON]),
                               np.array([SPATIAL_SCAN_LAT]), rc)
        m8 = geo.interleave2(qy8.astype(np.uint64),
                             qx8.astype(np.uint64))[0]
        span = np.uint64(1) << np.uint64(2 * (rf - rc))
        base = np.uint64(rf) << geo._RES_SHIFT
        lo = int(base | (m8 * span))
        hi = int(base | ((m8 + np.uint64(1)) * span - np.uint64(1)))
        out, scanned, total = lancelike.read_dataset_range(
            root, "cell", lo, hi, columns=["image_id", "lon", "lat"])
        # a tiny store (few fragments, query covers the extent) can
        # legitimately scan everything — demand pruning only when there
        # is something to prune
        if scanned == 0 or (total >= 8 and scanned == total):
            raise AssertionError(
                f"spatial zone-map pruning ineffective: {scanned}/{total}")
        return out
    q["lancelike_spatial_scan"] = lancelike_spatial_scan

    def polygon_overlap_pairs(sf_dir):
        """Polygon⋈polygon overlay join — the last cell of the join
        matrix (point×poly = PIP, segment×poly = crossings,
        segment×segment = intersections, now poly×poly): pairs of
        polygons whose boundaries CROSS or where one CONTAINS the
        other, with the relation. PBSM shape again: each polygon's bbox
        replicates to its POLY_XRES cells carrying the ring coordinate
        arrays (rings are small; bytes-bounded by polygons × cells),
        candidate pairs bbox-pretested within a cell, reference-point
        dedup, then the exact tests mirror the twin's float trees
        exactly: strict d1·d2<0 ∧ d3·d4<0 edge crossing (the
        ways_crossing convention) and first-vertex ray-cast parity (the
        way_polygon_relation convention)."""
        from ..util import bucketed_group_apply, typed_empty_series
        res = POLY_XRES
        n = np.int64(1) << np.int64(res)

        ds = fx.read_fixture(sf_dir, "polygons",
                             columns=["polygon_id", "ring", "bbox_w",
                                      "bbox_s", "bbox_e", "bbox_n"])

        def prep(b: pa.Table) -> pa.Table:
            rows = b.to_pylist()
            pid, rxs, rys = [], [], []
            for r in rows:
                pid.append(r["polygon_id"])
                rxs.append([p["lon"] for p in r["ring"]])
                rys.append([p["lat"] for p in r["ring"]])
            w = np.array([r["bbox_w"] for r in rows])
            s_ = np.array([r["bbox_s"] for r in rows])
            e = np.array([r["bbox_e"] for r in rows])
            nn_ = np.array([r["bbox_n"] for r in rows])
            qxl, qyl = geo.cell_xy(w, s_, res)
            qxh, qyh = geo.cell_xy(e, nn_, res)
            cols = {"polygon_id": pa.array(pid, pa.string()),
                    "rx": pa.array(rxs, pa.list_(pa.float64())),
                    "ry": pa.array(rys, pa.list_(pa.float64())),
                    "w": pa.array(w), "s": pa.array(s_),
                    "e": pa.array(e), "n": pa.array(nn_),
                    "qxl": pa.array(qxl, pa.int64()),
                    "qyl": pa.array(qyl, pa.int64()),
                    "qxh": pa.array(qxh, pa.int64()),
                    "qyh": pa.array(qyh, pa.int64())}
            # explode to covered cells
            cx = qxh - qxl + 1
            cy = qyh - qyl + 1
            cnt = cx * cy
            si = np.repeat(np.arange(len(cnt)), cnt)
            within = np.arange(int(cnt.sum())) \
                - np.repeat(np.cumsum(cnt) - cnt, cnt)
            ccx = qxl[si] + within // cy[si]
            ccy = qyl[si] + within % cy[si]
            t = pa.table(cols).take(pa.array(si, pa.int64()))
            return t.append_column("cell",
                                   pa.array(ccx * n + ccy, pa.int64()))

        exploded = ds.map_batches(prep, batch_format="pyarrow",
                                  batch_size=None)

        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            out_a, out_b, out_r = [], [], []
            for cell, gg in g.groupby("cell", sort=False):
                m = len(gg)
                if m < 2:
                    continue
                if m > 50_000:
                    raise RuntimeError(
                        f"polygon_overlap_pairs: hot cell with {m} "
                        f"polygons; raise POLY_XRES or salt")
                pid = gg["polygon_id"].to_numpy()
                W = gg["w"].to_numpy()
                S = gg["s"].to_numpy()
                E = gg["e"].to_numpy()
                N_ = gg["n"].to_numpy()
                qxl = gg["qxl"].to_numpy()
                qyl = gg["qyl"].to_numpy()
                rx = gg["rx"].to_numpy()
                ry = gg["ry"].to_numpy()
                ov = ((W[:, None] <= E[None, :])
                      & (W[None, :] <= E[:, None])
                      & (S[:, None] <= N_[None, :])
                      & (S[None, :] <= N_[:, None]))
                jj = np.arange(m)[None, :]
                ov &= jj > np.arange(m)[:, None]
                ov &= pid[:, None] != pid[None, :]
                # reference point over the pair's bbox-intersection min
                ccell = (np.maximum(qxl[:, None], qxl[None, :]) * n
                         + np.maximum(qyl[:, None], qyl[None, :]))
                ov &= ccell == int(cell)
                ai, bj = np.nonzero(ov)
                for i, j in zip(ai, bj):
                    ea = geo.ring_edges_float(rx[i], ry[i])
                    eb = geo.ring_edges_float(rx[j], ry[j])
                    rel = None
                    if geo.edges_cross_float(ea, eb):
                        rel = "crosses"
                    elif geo.point_in_edges_float(ea, eb[0][0], eb[1][0]) \
                            or geo.point_in_edges_float(eb, ea[0][0],
                                                        ea[1][0]):
                        rel = "contains"
                    if rel is not None:
                        a_, b_ = sorted((pid[i], pid[j]))
                        out_a.append(a_)
                        out_b.append(b_)
                        out_r.append(rel)
            if not out_a:
                es = typed_empty_series(np.array(["x"], dtype=object))
                return pd.DataFrame({"poly_a": es, "poly_b": es.copy(),
                                     "relation": es.copy()})
            return pd.DataFrame({"poly_a": out_a, "poly_b": out_b,
                                 "relation": out_r})

        return bucketed_group_apply(exploded, ["cell"], pairs,
                                    n_buckets=128)
    q["polygon_overlap_pairs"] = polygon_overlap_pairs

    def polygon_dissolve_components(sf_dir):
        """Dissolve-by-attribute (the GIS ST_Union-by-kind prep):
        polygons of the SAME kind that overlap (boundary cross or
        containment, per [[polygon_overlap_pairs]]) merge into one
        dissolved feature; output is one row per dissolved component
        (id = min polygon_id) with its kind and member count. Pure
        composition: the overlay join feeds the production CC (plus
        self-loops so isolated polygons dissolve to themselves); the
        twin re-derives the same pairs and closes over them with a
        recursive CTE."""
        from ..stages import dedup as dd
        from ..util import broadcast_inner_join

        pairs = polygon_overlap_pairs(sf_dir)
        polys = fx.read_fixture(sf_dir, "polygons",
                                columns=["polygon_id", "kind"])

        # same-kind filter: kinds attach via a capped broadcast (the
        # polygon dimension table), never a shuffle join
        kinds = polys.map_batches(
            lambda b: pa.table({"poly_a": b["polygon_id"],
                                "kind_a": b["kind"]}),
            batch_format="pyarrow")
        kinds_b = polys.map_batches(
            lambda b: pa.table({"poly_b": b["polygon_id"],
                                "kind_b": b["kind"]}),
            batch_format="pyarrow")
        pe = pairs.map_batches(
            lambda b: pa.table({"poly_a": b["poly_a"],
                                "poly_b": b["poly_b"]}),
            batch_format="pyarrow")
        pe = broadcast_inner_join(pe, kinds, on="poly_a")
        pe = broadcast_inner_join(pe, kinds_b, on="poly_b")

        def same_kind(b: pa.Table) -> pa.Table:
            m = pc.equal(b["kind_a"], b["kind_b"])
            t = b.filter(m)
            return pa.table({"id_a": t["poly_a"], "id_b": t["poly_b"]})

        edges = pe.map_batches(same_kind, batch_format="pyarrow")

        def self_loops(b: pa.Table) -> pa.Table:
            return pa.table({"id_a": b["polygon_id"],
                             "id_b": b["polygon_id"]})

        labels = dd.connected_components_pairs(
            edges.union(polys.map_batches(self_loops,
                                          batch_format="pyarrow")))
        lab = labels.rename_columns({"id": "polygon_id",
                                     "label": "component_id"})
        withk = broadcast_inner_join(lab, polys.map_batches(
            lambda b: pa.table({"polygon_id": b["polygon_id"],
                                "kind": b["kind"]}),
            batch_format="pyarrow"), on="polygon_id")
        from ..util import grouped_agg_vec
        return grouped_agg_vec(withk, ["component_id", "kind"],
                               [(None, "count", "n_members")])
    q["polygon_dissolve_components"] = polygon_dissolve_components

    def lancelike_compact_scan(sf_dir):
        """Fragment compaction through the correctness gate: the geo
        points are written as MANY deliberately-small fragments, compacted
        (greedy size-binned rewrites in parallel; big fragments carried by
        reference), and read back from the new version — the oracle pins
        byte-identical content, and the query asserts the fragment count
        actually dropped and a version was committed."""
        from ..sources import lancelike
        ds = fx.read_fixture(sf_dir, "geo", columns=["image_id", "lon"])
        root = f"/tmp/graft_out/compact_demo_{fx.sf_tag(sf_dir)}"
        man = lancelike.write_dataset(
            ds.repartition(24), root, stage="tiny_frags",
            parent=fx.sf_tag(sf_dir),
            fingerprint=lancelike.input_fingerprint(ds))
        man2 = lancelike.compact(root, stage="compacted",
                                 target_bytes=8 * 1024 * 1024)
        # a committed compaction must shrink the fragment count (compact
        # is a no-op — same manifest back — when no multi-fragment bin
        # exists, which tiny-fragment geo always provides)
        if (man2["version"] > man["version"]
                and not len(man2["fragments"]) < len(man["fragments"])):
            raise AssertionError("compaction did not reduce fragments")
        return lancelike.read_dataset(root, columns=["image_id", "lon"])
    q["lancelike_compact_scan"] = lancelike_compact_scan

    def incremental_user_counts(sf_dir):
        """Incremental view maintenance: a per-user event-count aggregate
        is committed to the lancelike store from the FIRST 20 days of
        events (checkpoint, fingerprinted resume), then the remaining
        days arrive as a delta and merge as partials (base counts ∪ delta
        partials → one groupby sum) into a new committed version. The
        oracle recomputes from scratch over ALL events — pinning that
        increment-and-merge equals a full recompute."""
        from ray.data.aggregate import Sum

        from ..sources import lancelike
        CUT_US = int(pd.Timestamp("2024-01-21").value // 1000)
        ds = fx.driver_table(sf_dir, "events", columns=["user_id", "ts"])

        def split(keep_before: bool):
            def fn(b: pa.Table) -> pa.Table:
                ts = b["ts"].cast(pa.int64()).to_numpy()
                m = ts < CUT_US if keep_before else ts >= CUT_US
                f = b.filter(pa.array(m))
                u, c = np.unique(np.asarray(f["user_id"].to_pylist()),
                                 return_counts=True)
                # type from the input schema: an all-filtered block's
                # np.unique([]) is float64 and would drift user_id to
                # double (events are ts-sorted, so whole blocks land on
                # one side of the cut — review finding, reproduced)
                return pa.table({"user_id": pa.array(
                                     u, b.schema.field("user_id").type),
                                 "cnt": pa.array(c, pa.int64())})
            return fn

        base = ds.map_batches(split(True), batch_format="pyarrow") \
                 .groupby("user_id").aggregate(Sum("cnt", alias_name="cnt"))
        root = f"/tmp/graft_out/ivm_demo_{fx.sf_tag(sf_dir)}"
        lancelike.write_dataset(base, root, stage="base_counts",
                                parent=fx.sf_tag(sf_dir),
                                fingerprint=lancelike.input_fingerprint(ds))
        stored = lancelike.read_dataset(root, columns=["user_id", "cnt"])
        delta = ds.map_batches(split(False), batch_format="pyarrow")
        merged = stored.union(delta).groupby("user_id") \
                       .aggregate(Sum("cnt", alias_name="n_events"))
        lancelike.write_dataset(merged.materialize(), root,
                                stage="merged_counts", parent="base_counts")
        return lancelike.read_dataset(root, columns=["user_id", "n_events"])
    q["incremental_user_counts"] = incremental_user_counts

    def distinct_users_hll_by_type(sf_dir):
        """GROUPED HyperLogLog: approximate distinct users per event
        type — per-group register sketches through one bounded shuffle
        (O(groups × 2^p) rows regardless of user cardinality; the scale
        path when even the unique (group, value) tuple set is too big to
        exchange for util.grouped_count_distinct). Rows-only by design
        (±3.3% at p=10); deterministic across parallelism, accuracy and
        determinism pinned by pytest."""
        from ..stages import sketch
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "user_id"])
        return sketch.hll_distinct_by_group(ds, "event_type", "user_id",
                                            p=10)
    q["distinct_users_hll_by_type"] = distinct_users_hll_by_type

    def hll_group_registers_check(sf_dir):
        """The grouped-HLL sketch VALUE-PINNED (round-3 VERDICT item 4):
        the merged per-group (register, max rank) rows are pure integers
        from a splitmix64-style finalizer, so the whole fold — hash,
        register split, leading-zero rank, per-group max-merge — has an
        exact DuckDB HUGEINT twin (``hllmix`` macro + ``bin()`` length
        for integer bit_length). The float estimator on top stays
        rows-only in ``distinct_users_hll_by_type``; this entry proves
        the distributed sketch state itself is byte-correct."""
        from ..stages import sketch
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "user_id"])
        return sketch.hll_grouped_registers(ds, "event_type", "user_id",
                                            p=10)
    q["hll_group_registers_check"] = hll_group_registers_check

    def nearest_boundary_distance(sf_dir):
        """Nearest-polygon-boundary distance join (round-4 operator): for
        every geo point, the exact min segment-projection distance to any
        admin-polygon edge — broadcast geometry, map-only over the points
        (zero shuffles), (P, E) matrix chunked. Twin: the same clamped-t
        point-segment expression over the exploded edges fixture, with
        MIN (order-independent for floats, unlike SUM) and the identical
        sqrt+e9 rounding applied after the min on both sides."""
        import pyarrow.parquet as pq
        from ..stages import pip_join
        pts = fx.read_fixture(sf_dir, "geo", columns=["image_id", "lon",
                                                      "lat"])
        polys = pq.read_table(fx.fixture_path(sf_dir, "polygons"))
        return pip_join.nearest_boundary_join(pts, polys)
    q["nearest_boundary_distance"] = nearest_boundary_distance

    def top_users_per_event_type(sf_dir):
        """Grouped top-k (the QUALIFY row_number() <= k shape,
        distributed): per event type, the 5 heaviest users by event
        count. Counts pre-aggregate map-side (Arrow group_by partials)
        before one groupby-sum; util.grouped_topk then keeps ≤k rows per
        (group, block) ahead of its single bounded bucketed shuffle.
        Total order: cnt DESC, user_id ASC."""
        from ray.data.aggregate import Sum
        from ..util import grouped_topk
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "user_id"])

        def pre(b: pa.Table) -> pa.Table:
            return b.group_by(["event_type", "user_id"]).aggregate(
                [([], "count_all")]).rename_columns(
                ["event_type", "user_id", "cnt"])

        counts = ds.map_batches(pre, batch_format="pyarrow") \
                   .groupby(["event_type", "user_id"]) \
                   .aggregate(Sum("cnt", alias_name="cnt"))
        return grouped_topk(counts, ["event_type"], 5,
                            [("cnt", "desc"), ("user_id", "asc")])
    q["top_users_per_event_type"] = top_users_per_event_type

    def event_value_histogram_quantiles(sf_dir):
        """Histogram quantile sketch per group, VALUE-PINNED approximate
        quantiles (round-4 operator): fixed [0, 512)×256-bin histogram of
        event values per type — ≤ groups×bins integer partial rows cross
        the wire regardless of data volume (the mergeable-sketch scale
        path where exact per-group sort-quantiles would shuffle every
        row). The q-quantile is the lower edge of the first bin whose
        cumulative count reaches ceil(q·n); identical float expression
        trees in the SQL twin."""
        from ..stages import sketch
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "value"])
        return sketch.histogram_quantiles_by_group(
            ds, "event_type", "value", lo=0.0, hi=512.0, bins=256)
    q["event_value_histogram_quantiles"] = event_value_histogram_quantiles

    def user_value_rolling3(sf_dir):
        """Per-user moving-window aggregate (SUM OVER ... ROWS BETWEEN 2
        PRECEDING AND CURRENT ROW): event values scaled to exact e2
        integers, one bounded bucketed shuffle on user_id, vectorized
        grouped rolling sum per bucket. Total order inside each user =
        (ts, event_id)."""
        from ..stages import asof
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_id", "user_id", "ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            v2 = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
            return pa.table({"event_id": b["event_id"],
                             "user_id": b["user_id"],
                             "ts_us": b["ts"].cast(pa.int64()),
                             "v2": pa.array(v2, pa.int64())})

        rolled = asof.rolling_window_sum(
            ds.map_batches(prep, batch_format="pyarrow"),
            "user_id", ["ts_us", "event_id"], "v2", 3, out_col="roll3_v2")

        def out(b: pa.Table) -> pa.Table:
            return b.select(["event_id", "roll3_v2"])
        return rolled.map_batches(out, batch_format="pyarrow")
    q["user_value_rolling3"] = user_value_rolling3

    def tpch_q8_market_share(sf_dir):
        """TPC-H Q8 shape: NATION_3's share of PROMO-part revenue among
        ASIA-region customers, by order year. Region/nation are spec-tiny
        driver LUTs; the PROMO part-key set and the ASIA customer-key set
        attach as keys-only broadcast semi-filters (capped w/ hash-join
        fallback via broadcast_inner_join); supplier→nation rides the
        same capped broadcast. One hash join (lineitem⋈orders); revenue
        partials are per-row int-e4 so every sum is association-proof;
        share = floor(num/den·1e6+0.5) over exact ints on both engines."""
        from ray.data.aggregate import Sum
        from ..util import broadcast_inner_join
        TARGET, REGION, PTYPE = "NATION_3", "ASIA", "PROMO"

        nat, nk_sorted, nname_sorted = _nation_sorted(sf_dir)
        reg = fx.driver_table(sf_dir, "region").to_pandas()
        asia_rk = set(reg[reg["r_name"] == REGION]["r_regionkey"])
        asia_nk = set(nat[nat["n_regionkey"].isin(asia_rk)]["n_nationkey"])

        pt_keys = fx.driver_table(sf_dir, "part",
                                  columns=["p_partkey", "p_type"]) \
            .filter(expr=f"p_type == '{PTYPE}'") \
            .map_batches(lambda b: pa.table({"l_partkey": b["p_partkey"]}),
                         batch_format="pyarrow")

        sup_lut = _supplier_nation_lut(sf_dir, nk_sorted, nname_sorted)

        def cust_asia(b: pa.Table) -> pa.Table:
            keep = np.fromiter((k in asia_nk for k in
                                b["c_nationkey"].to_pylist()), bool,
                               b.num_rows)
            return pa.table({"o_custkey": b.filter(pa.array(keep))
                             ["c_custkey"]})

        cust_keys = fx.driver_table(sf_dir, "customer",
                                    columns=["c_custkey", "c_nationkey"]) \
            .map_batches(cust_asia, batch_format="pyarrow")

        def l_narrow(b: pa.Table) -> pa.Table:
            rev = (b["l_extendedprice"].to_numpy()
                   * (1.0 - b["l_discount"].to_numpy()))
            return pa.table({
                "o_orderkey": b["l_orderkey"],
                "l_partkey": b["l_partkey"],
                "l_suppkey": b["l_suppkey"],
                "rev4": pa.array(np.floor(rev * 1e4 + 0.5).astype(np.int64)),
            })

        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_orderkey", "l_partkey", "l_suppkey",
                                      "l_extendedprice", "l_discount"]) \
            .map_batches(l_narrow, batch_format="pyarrow")
        li = broadcast_inner_join(li, pt_keys, on="l_partkey") \
            .drop_columns(["l_partkey"])
        li = broadcast_inner_join(li, sup_lut, on="l_suppkey") \
            .drop_columns(["l_suppkey"])

        def o_narrow(b: pa.Table) -> pa.Table:
            year = pd.to_datetime(
                b["o_orderdate"].cast(pa.int64()).to_numpy(), unit="us").year
            return pa.table({"o_orderkey": b["o_orderkey"],
                             "o_custkey": b["o_custkey"],
                             "o_year": pa.array(np.asarray(year), pa.int64())})

        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_custkey",
                                          "o_orderdate"]) \
            .map_batches(o_narrow, batch_format="pyarrow")
        orders = broadcast_inner_join(orders, cust_keys, on="o_custkey") \
            .drop_columns(["o_custkey"])

        joined = li.join(orders, on=("o_orderkey",), join_type="inner",
                         **join_kwargs(fx.table_join_partitions(
                             sf_dir, "lineitem", "orders")))

        def partial(b: pa.Table) -> pa.Table:
            rev = b["rev4"].to_numpy()
            is_t = (b["supp_nation"].to_numpy(zero_copy_only=False)
                    == TARGET)
            yr = b["o_year"].to_numpy()
            yu, yi = np.unique(yr, return_inverse=True)
            num = np.zeros(len(yu), np.int64)
            den = np.zeros(len(yu), np.int64)
            np.add.at(den, yi, rev)
            np.add.at(num, yi[is_t], rev[is_t])
            return pa.table({"o_year": pa.array(yu, pa.int64()),
                             "num4": pa.array(num, pa.int64()),
                             "den4": pa.array(den, pa.int64())})

        agg = joined.map_batches(partial, batch_format="pyarrow") \
            .groupby("o_year") \
            .aggregate(Sum("num4", alias_name="num4"),
                       Sum("den4", alias_name="den4")).to_pandas()
        share = np.floor(agg["num4"].to_numpy().astype(np.float64)
                         / agg["den4"].to_numpy().astype(np.float64)
                         * 1e6 + 0.5).astype(np.int64)
        return pd.DataFrame({"o_year": agg["o_year"].astype(np.int64),
                             "mkt_share_e6": share}) \
                 .sort_values("o_year", ignore_index=True)
    q["tpch_q8_market_share"] = tpch_q8_market_share

    def tpch_q22_shape(sf_dir):
        """TPC-H Q22 shape (no c_phone column → group by nation key):
        customers with balance STRICTLY above the positive-balance
        average and no RECENT order (since 2000-01-01 — every sf0.01
        customer has *some* order, which would make the classic "never
        ordered" check vacuous), counted per nation. The average
        comparison is EXACT integer math on both engines (bal2·n > sum2
        over e2-scaled balances — no float average); the no-recent-order
        set comes from the distributed anti-join, never a driver-side
        NOT IN."""
        from ray.data.aggregate import Count, Sum
        from ..util import anti_semi_join

        def c_narrow(b: pa.Table) -> pa.Table:
            bal2 = np.floor(b["c_acctbal"].to_numpy() * 100 + 0.5) \
                     .astype(np.int64)
            return pa.table({"c_custkey": b["c_custkey"],
                             "c_nationkey": b["c_nationkey"],
                             "bal2": pa.array(bal2, pa.int64())})

        cust = fx.driver_table(sf_dir, "customer",
                               columns=["c_custkey", "c_nationkey",
                                        "c_acctbal"]) \
            .map_batches(c_narrow, batch_format="pyarrow").materialize()

        def pos_partial(b: pa.Table) -> pa.Table:
            bal = b["bal2"].to_numpy()
            pos = bal[bal > 0]
            return pa.table({"s2": pa.array([int(pos.sum())], pa.int64()),
                             "n": pa.array([len(pos)], pa.int64())})

        g = cust.map_batches(pos_partial, batch_format="pyarrow") \
                .aggregate(Sum("s2"), Sum("n")) or {}
        s2 = int(g.get("sum(s2)") or 0)
        n = int(g.get("sum(n)") or 0)

        def above(b: pa.Table) -> pa.Table:
            return b.filter(pa.array(
                b["bal2"].to_numpy() * n > s2))

        rich = cust.map_batches(above, batch_format="pyarrow")
        cutoff = pd.Timestamp("2000-01-01").value // 1000

        def recent(b: pa.Table) -> pa.Table:
            m = pc.greater_equal(b["o_orderdate"].cast(pa.int64()),
                                 pa.scalar(cutoff, pa.int64()))
            return pa.table({"o_custkey": b.filter(m)["o_custkey"]})

        okeys = fx.driver_table(sf_dir, "orders",
                                columns=["o_custkey", "o_orderdate"]) \
            .map_batches(recent, batch_format="pyarrow")
        never = anti_semi_join(rich, okeys, on="c_custkey",
                               keys_on="o_custkey")
        agg = never.groupby("c_nationkey") \
            .aggregate(Count(), Sum("bal2", alias_name="total_bal2"))

        # anti_semi_join emits pandas blocks; rename_columns is an Arrow
        # Project and would crash (NOTES_r3) — re-type explicitly instead
        def out(b: pa.Table) -> pa.Table:
            return pa.table({
                "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
                "n_custs": pc.cast(b["count()"], pa.int64()),
                "total_bal2": pc.cast(b["total_bal2"], pa.int64())})
        return agg.map_batches(out, batch_format="pyarrow")
    q["tpch_q22_shape"] = tpch_q22_shape

    def modal_event_type_per_user(sf_dir):
        """Grouped MODE (most frequent value per key, ties → smaller
        value) — composed from map-side count partials + one groupby-sum
        + util.grouped_topk(k=1): the same machinery as top-k, no new
        shuffle shape. SQL twin: QUALIFY row_number() = 1."""
        from ray.data.aggregate import Sum
        from ..util import grouped_topk
        ds = fx.driver_table(sf_dir, "events",
                             columns=["user_id", "event_type"])

        def pre(b: pa.Table) -> pa.Table:
            return b.group_by(["user_id", "event_type"]).aggregate(
                [([], "count_all")]).rename_columns(
                ["user_id", "event_type", "cnt"])

        counts = ds.map_batches(pre, batch_format="pyarrow") \
                   .groupby(["user_id", "event_type"]) \
                   .aggregate(Sum("cnt", alias_name="cnt"))
        return grouped_topk(counts, ["user_id"], 1,
                            [("cnt", "desc"), ("event_type", "asc")])
    q["modal_event_type_per_user"] = modal_event_type_per_user

    def embedding_dim_stats(sf_dir):
        """Columnar math over a vector column: per-DIMENSION sum and
        sum-of-squares across all embeddings — per-block (dim, sum)
        partials from one matrix fold (fixed dim-count rows cross the
        wire regardless of corpus size), merged by one tiny groupby.
        Fixed-point e6 per-block partials keep the sums integer-exact,
        so the result is engine-stable; twin = lateral UNNEST. (e6 holds
        |ss6| < 2^63 to ~10^6 rows/block × ~10^6 blocks; at 10^12-row
        scale drop to e3 or add a second-level hierarchical fold.)"""
        from ray.data.aggregate import Sum
        ds = fx.driver_table(sf_dir, "embeddings",
                             columns=["vec_id", "embedding"])

        def partial(b: pa.Table) -> pa.Table:
            vecs = np.asarray(b["embedding"].to_pylist(), dtype=np.float64)
            if vecs.size == 0:
                return pa.table({"dim": pa.array([], pa.int64()),
                                 "s6": pa.array([], pa.int64()),
                                 "ss6": pa.array([], pa.int64())})
            v6 = np.floor(vecs * 1e6 + 0.5).astype(np.int64)
            return pa.table({
                "dim": pa.array(np.arange(vecs.shape[1]), pa.int64()),
                "s6": pa.array(v6.sum(axis=0), pa.int64()),
                "ss6": pa.array((v6 * v6).sum(axis=0), pa.int64()),
            })

        return ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("dim").aggregate(Sum("s6", alias_name="s6"),
                                      Sum("ss6", alias_name="ss6"))
    q["embedding_dim_stats"] = embedding_dim_stats

    def embedding_pq_codes_check(sf_dir):
        """Product-quantization ENCODE value-pinned: with the
        deterministic 0-iteration codebook (subvectors of the 8 smallest
        vec_ids; m=4 subspaces × 16 dims), every vector's per-subspace
        argmin code is an exact integer the SQL twin reproduces with the
        same Σ(x_j−c_j)² expression (ties → lowest code on both sides).
        The Lloyd-TRAINED codebook path is covered rows-only by
        ``embedding_pq_topk`` + a recall pytest."""
        from ..stages import simsearch
        ds = fx.driver_table(sf_dir, "embeddings",
                             columns=["vec_id", "embedding"])
        C = simsearch.pq_train(ds, "embedding", "vec_id", m=4, k=8,
                               n_iters=0)
        codes = simsearch.pq_encode(ds, C)

        def explode(b: pa.Table) -> pa.Table:
            n = b.num_rows
            if n == 0:
                return pa.table({"vec_id": b["vec_id"],
                                 "s": pa.array([], pa.int64()),
                                 "code": pa.array([], pa.int64())})
            c = np.stack(b["codes"].to_numpy(zero_copy_only=False))
            vid = b["vec_id"].take(
                pa.array(np.repeat(np.arange(n), c.shape[1]), pa.int64()))
            return pa.table({
                "vec_id": vid,
                "s": pa.array(np.tile(np.arange(c.shape[1]), n), pa.int64()),
                "code": pa.array(c.reshape(-1), pa.int64())})
        return codes.map_batches(explode, batch_format="pyarrow")
    q["embedding_pq_codes_check"] = embedding_pq_codes_check

    def embedding_pq_topk(sf_dir):
        """PQ + asymmetric-distance top-k (the billion-scale ANN path:
        d-dim floats compress to m uint8-sized codes; queries scan codes
        with an (m, k) LUT gather-sum, never a float matmul against the
        corpus). Codebooks Lloyd-trained (2 rounds, mergeable partials,
        zero shuffles); per-block top-k partials reduce through one
        bounded grouped_topk shuffle. Approximate by construction →
        rows-only; recall vs brute force pinned by pytest."""
        from ..stages import simsearch
        ds = fx.driver_table(sf_dir, "embeddings",
                             columns=["vec_id", "embedding"])
        C = simsearch.pq_train(ds, "embedding", "vec_id", m=4, k=16,
                               n_iters=2)
        from ..util import distributed_topk
        seeds = distributed_topk(ds, 3, [("vec_id", "ascending")])
        queries = np.stack([np.asarray(v, np.float64)
                            for v in seeds["embedding"]])
        return simsearch.pq_adc_topk(ds, C, queries, k_top=10)
    q["embedding_pq_topk"] = embedding_pq_topk

    def embedding_ivfpq_topk(sf_dir):
        """IVF-PQ composed ANN (the faiss-style scale path): coarse
        lists from the zero-shuffle distributed k-means, PQ codebooks
        trained on RESIDUALS, per-query LUT scan of only the probed
        lists. Approximate by construction → rows-only; recall vs brute
        force pinned by pytest (test_ivfpq_topk_recall)."""
        from ..stages import simsearch
        from ..util import distributed_topk
        ds = fx.driver_table(sf_dir, "embeddings",
                             columns=["vec_id", "embedding"])
        seeds = distributed_topk(ds, 3, [("vec_id", "ascending")])
        queries = np.stack([np.asarray(v, np.float64)
                            for v in seeds["embedding"]])
        return simsearch.ivfpq_topk(ds, queries, k_top=10,
                                    n_centroids=8, nprobe=4, m=4, kc=16)
    q["embedding_ivfpq_topk"] = embedding_ivfpq_topk

    def focal_cell_smooth(sf_dir):
        """Raster FOCAL aggregation (3×3 moving-window sum over the
        per-cell point-count surface — GIS focal statistics): per-block
        pre-aggregated cell counts explode to their 9 neighbor cells
        map-side (each sketch row carries its count to every window it
        belongs to), then ONE groupby-sum yields every cell's focal sum.
        The exchange carries ≤ 9 × distinct-cells rows, never points.
        Out-of-grid neighbors drop on both engines."""
        from ray.data.aggregate import Sum
        from ..functions import geo as G
        RES = 12
        N = 1 << RES
        pts = fx.read_fixture(sf_dir, "geo", columns=["lon", "lat"])

        def explode(b: pa.Table) -> pa.Table:
            x, y = G.cell_xy(b["lon"].to_numpy(), b["lat"].to_numpy(), RES)
            key = x * N + y
            uk, cnt = np.unique(key, return_counts=True)   # block pre-agg
            ux, uy = uk // N, uk % N
            out_k, out_c = [], []
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nx, ny = ux + dx, uy + dy
                    ok = (nx >= 0) & (nx < N) & (ny >= 0) & (ny < N)
                    out_k.append(nx[ok] * N + ny[ok])
                    out_c.append(cnt[ok])
            return pa.table({
                "k": pa.array(np.concatenate(out_k), pa.int64()),
                "cnt": pa.array(np.concatenate(out_c).astype(np.int64),
                                pa.int64())})

        agg = pts.map_batches(explode, batch_format="pyarrow") \
                 .groupby("k").aggregate(Sum("cnt", alias_name="focal_cnt"))

        def out(b: pa.Table) -> pa.Table:
            k = b["k"].to_numpy()
            return pa.table({
                "qx": pa.array(k // N, pa.int64()),
                "qy": pa.array(k % N, pa.int64()),
                "focal_cnt": pc.cast(b["focal_cnt"], pa.int64())})
        return agg.map_batches(out, batch_format="pyarrow")
    q["focal_cell_smooth"] = focal_cell_smooth

    def event_value_trend_per_type(sf_dir):
        """Distributed OLS regression per group via SUFFICIENT STATISTICS
        (n, Σx, Σy, Σxy, Σx²) — each block emits one ≤groups-row integer
        partial, one tiny groupby-sum merges, and the slope/intercept are
        computed from EXACT integer sums (x = whole days since epoch,
        y = e2-scaled value), so both engines divide the same integers:
        slope_e6 = floor((nΣxy−ΣxΣy)/(nΣx²−(Σx)²)·1e6+0.5). The
        mergeable-statistics shape that fits any 100 TB column pair.
        NULL groups are filtered and degenerate groups (all x equal, so
        the denominator is 0 and the slope undefined) are dropped — on
        BOTH engines, with the same float test."""
        from ray.data.aggregate import Sum
        US_PER_DAY = 86_400_000_000

        def partial(b: pa.Table) -> pa.Table:
            gtype = b.schema.field("event_type").type
            b = b.filter(pc.is_valid(b["event_type"]))  # SQL twin filters
            if not b.num_rows:                          # NULL groups too
                e = pa.array([], pa.int64())
                return pa.table({"event_type": pa.array([], gtype),
                                 "n": e, "sx": e, "sy": e,
                                 "sxy": e, "sxx": e})
            x = (b["ts"].cast(pa.int64()).to_numpy() // US_PER_DAY) \
                .astype(np.int64)
            y = np.floor(b["value"].to_numpy() * 100 + 0.5).astype(np.int64)
            gv = np.asarray(b["event_type"].to_pylist())
            gu, gi = np.unique(gv, return_inverse=True)
            n = np.bincount(gi)
            sx = np.zeros(len(gu), np.int64)
            sy = np.zeros(len(gu), np.int64)
            sxy = np.zeros(len(gu), np.int64)
            sxx = np.zeros(len(gu), np.int64)
            np.add.at(sx, gi, x)
            np.add.at(sy, gi, y)
            np.add.at(sxy, gi, x * y)
            np.add.at(sxx, gi, x * x)
            return pa.table({"event_type": pa.array(gu, gtype),
                             "n": pa.array(n.astype(np.int64), pa.int64()),
                             "sx": pa.array(sx), "sy": pa.array(sy),
                             "sxy": pa.array(sxy), "sxx": pa.array(sxx)})

        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "ts", "value"])
        agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("event_type") \
            .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                       Sum("sy", alias_name="sy"),
                       Sum("sxy", alias_name="sxy"),
                       Sum("sxx", alias_name="sxx")).to_pandas()
        n = agg["n"].to_numpy().astype(np.float64)
        sx = agg["sx"].to_numpy().astype(np.float64)
        sy = agg["sy"].to_numpy().astype(np.float64)
        sxy = agg["sxy"].to_numpy().astype(np.float64)
        sxx = agg["sxx"].to_numpy().astype(np.float64)
        den = n * sxx - sx * sx
        ok = den != 0.0   # degenerate group (all x equal / n=1): slope
        slope = np.where(ok, (n * sxy - sx * sy) / np.where(ok, den, 1.0),
                         0.0)   # undefined — dropped on BOTH engines
        return pd.DataFrame({
            "event_type": agg["event_type"][ok],
            "n": agg["n"][ok].astype(np.int64),
            "slope_e6": np.floor(slope[ok] * 1e6 + 0.5).astype(np.int64),
        }).sort_values("event_type", ignore_index=True)
    q["event_value_trend_per_type"] = event_value_trend_per_type

    def user_event_entropy(sf_dir):
        """Per-user Shannon entropy of the event-type distribution (the
        info-theory diversity score a curation pipeline gates on):
        per-(user, type) counts pre-aggregate map-side; the entropy sum
        runs over types in a FIXED (alphabetical) order on both engines
        (DuckDB list_sum over list(... ORDER BY type); numpy sequential
        sum over the sorted slice), so the float trees match and e6
        rounding pins the value. Output: user_id, n_events, entropy_e6."""
        from ray.data.aggregate import Sum
        from ..util import bucketed_group_apply
        ds = fx.driver_table(sf_dir, "events",
                             columns=["user_id", "event_type"])

        def pre(b: pa.Table) -> pa.Table:
            return b.group_by(["user_id", "event_type"]).aggregate(
                [([], "count_all")]).rename_columns(
                ["user_id", "event_type", "cnt"])

        counts = ds.map_batches(pre, batch_format="pyarrow") \
                   .groupby(["user_id", "event_type"]) \
                   .aggregate(Sum("cnt", alias_name="cnt"))

        def ent(g: pd.DataFrame) -> pd.DataFrame:
            # pivot to a (users × types) count matrix, types in sorted
            # order; axis-1 sums over ≤8 columns are SEQUENTIAL in numpy
            # (pairwise only kicks in past 8 terms) and +0.0 terms for
            # absent types are exact identities, so the float tree equals
            # the SQL list_sum over the type-ordered present-only list
            piv = g.pivot_table(index="user_id", columns="event_type",
                                values="cnt", aggfunc="sum", fill_value=0)
            piv = piv.reindex(sorted(piv.columns), axis=1)
            c = piv.to_numpy(dtype=np.float64)
            n = c.sum(axis=1)
            p = c / n[:, None]
            terms = np.where(c > 0, p * np.log(np.where(c > 0, p, 1.0)), 0.0)
            h = terms.sum(axis=1)
            return pd.DataFrame({
                "user_id": piv.index.to_numpy().astype(np.int64),
                "n_events": n.astype(np.int64),
                "entropy_e6": np.floor(-h * 1e6 + 0.5).astype(np.int64)})

        return bucketed_group_apply(counts, ["user_id"], ent, n_buckets=256)
    q["user_event_entropy"] = user_event_entropy

    def lancelike_partition_counts(sf_dir):
        """S5 partitioned sink through the correctness gate: write the geo
        points partitioned by tile-x shard, then return the MANIFEST's
        per-partition row counts — the oracle recomputes them with a SQL
        groupby over the same fixture, so fragment routing, atomic
        commit, and manifest accounting are all value-hash-pinned."""
        import ray

        from ..sources import lancelike
        ds = fx.read_fixture(sf_dir, "geo", columns=["image_id", "lon", "lat"])

        def shard(b: pa.Table) -> pa.Table:
            qx, _ = geo.cell_xy(b["lon"].to_numpy(), b["lat"].to_numpy(),
                                TILE_RES)
            return b.append_column("shard",
                                   pa.array(qx % 4, pa.int64()))
        sharded = ds.map_batches(shard, batch_format="pyarrow")
        root = f"/tmp/graft_out/part_demo_{fx.sf_tag(sf_dir)}"
        man = lancelike.write_dataset_partitioned(
            sharded, root, stage="part_demo", partition_col="shard",
            parent=fx.sf_tag(sf_dir),
            fingerprint=lancelike.input_fingerprint(ds))
        rows = man["metrics"]["partition_rows"]
        return pd.DataFrame({
            "shard": pd.array(sorted(int(k) for k in rows), dtype="int64"),
            "n_rows": pd.array([rows[str(k)] for k in
                                sorted(int(k) for k in rows)],
                               dtype="int64"),
        })
    q["lancelike_partition_counts"] = lancelike_partition_counts

    def audio_features(sf_dir):
        """REAL WAV PCM16 decode (pure-numpy RIFF parser) + duration from
        the DECODED sample count — the oracle recomputes duration from the
        redundant metadata columns, so a decoder bug (wrong chunk walk,
        wrong dtype) breaks the hash."""
        ds = fx.read_fixture(sf_dir, "audio")
        out = multimodal.audio_features(ds)
        return out.select_columns(["audio_id", "n_samples_dec", "duration_us"])
    q["audio_features"] = audio_features

    def audio_loudness_rank(sf_dir):
        """Audio feature analytics: top-20 loudest clips by decoded RMS
        (rows-only: RMS is a pixel/sample-domain float)."""
        ds = fx.read_fixture(sf_dir, "audio")
        out = multimodal.audio_features(ds)
        feats = out.map_batches(
            lambda b: pa.table({"audio_id": b["audio_id"],
                                "rms": pc.round(b["rms"], 4)}),
            batch_format="pyarrow")
        return distributed_topk(feats, 20, [("rms", "descending"),
                                            ("audio_id", "ascending")])
    q["audio_loudness_rank"] = audio_loudness_rank

    def video_frame_index(sf_dir):
        """REAL rawvid container decode: every 2nd frame of every video →
        (video_id, frame_idx) rows. Oracle expands the metadata n_frames
        with generate_series — decode must agree with the header."""
        ds = fx.read_fixture(sf_dir, "videos",
                             columns=["video_id", "bytes"])
        out = multimodal.video_frame_sample(ds, stride=2)
        return out.select_columns(["video_id", "frame_idx"])
    q["video_frame_index"] = video_frame_index

    def video_scene_scores(sf_dir):
        """Shot-boundary scoring per video (strongest consecutive-frame
        pixel diff, e4 fixed-point) — rows-only by design: SQL cannot
        decode the rawvid container; the kernel is pinned by a golden
        pytest against the synth frame generator."""
        ds = fx.read_fixture(sf_dir, "videos",
                             columns=["video_id", "bytes"])
        return multimodal.video_scene_scores(ds)
    q["video_scene_scores"] = video_scene_scores

    A_FIELDS = ["housenumber", "postcode", "street"]

    def _shape_flat_rows(sf_dir):
        """Shared flat stage of the reference document shape: elements
        merged with the pivoted/normalized addr:* tags via one bucketed
        shuffle. Consumed by the nested struct assembly AND by the
        oracle-paired flat check."""
        from ..functions import shape as shp
        from ..util import bucketed_group_apply

        def doc_rows(kind):
            def f(b: pa.Table) -> pa.Table:
                n = len(b)
                cols = {
                    "kind": pa.array([kind] * n, pa.string()),
                    "id": b["id"],
                    "version": pc.cast(b["version"], pa.string()),
                    "changeset": pc.cast(b["changeset"], pa.string()),
                    # cast to [s] first: Arrow's %S appends fractional
                    # digits for sub-second units
                    "timestamp": pc.strftime(
                        pc.cast(b["timestamp"], pa.timestamp("s")),
                        format="%Y-%m-%dT%H:%M:%SZ"),
                    "user": b["user"],
                    "uid": pc.cast(b["uid"], pa.string()),
                    "lat": (pc.cast(b["lat"], pa.float64()) if kind == "node"
                            else pa.nulls(n, pa.float64())),
                    "lon": (pc.cast(b["lon"], pa.float64()) if kind == "node"
                            else pa.nulls(n, pa.float64())),
                    "is_addr": pa.array(np.zeros(n, np.int8)),
                }
                for c in A_FIELDS:
                    cols[c] = pa.nulls(n, pa.string())
                return pa.table(cols)
            return f

        def addr_rows(b: pa.Table) -> pa.Table:
            p = shp.pivot_address_tags(b)      # partial per-batch pivot
            n = len(p)
            return pa.table({
                "kind": p["elem_kind"],
                "id": p["elem_id"],
                "version": pa.nulls(n, pa.string()),
                "changeset": pa.nulls(n, pa.string()),
                "timestamp": pa.nulls(n, pa.string()),
                "user": pa.nulls(n, pa.string()),
                "uid": pa.nulls(n, pa.string()),
                "lat": pa.nulls(n, pa.float64()),
                "lon": pa.nulls(n, pa.float64()),
                "is_addr": pa.array(np.ones(n, np.int8)),
                "housenumber": pc.cast(p["housenumber"], pa.string()),
                "postcode": pc.cast(p["postcode"], pa.string()),
                "street": pc.cast(p["street"], pa.string()),
            })

        elems = fx.read_fixture(sf_dir, "nodes").map_batches(
            doc_rows("node"), batch_format="pyarrow").union(
            fx.read_fixture(sf_dir, "ways").map_batches(
                doc_rows("way"), batch_format="pyarrow"))
        tags = fx.read_fixture(sf_dir, "tags")
        unioned = elems.union(
            tags.map_batches(addr_rows, batch_format="pyarrow"))

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            base = g[g["is_addr"] == 0].drop(columns=A_FIELDS + ["_bucket",
                                                                 "is_addr"])
            addr = (g[g["is_addr"] == 1]
                    .groupby(["kind", "id"], sort=False)[A_FIELDS]
                    .first().reset_index())   # first non-null per field
            return base.merge(addr, on=["kind", "id"], how="left")

        return bucketed_group_apply(unioned, ["kind", "id"], merge,
                                    n_buckets=256)

    def shape_documents_flat_check(sf_dir):
        """[R:data.py::shape_element] content of the NESTED document
        shape, flattened for value-hashing — the oracle rebuilds the same
        rows with a SQL tag pivot + the normalize/clean SQL twins, so the
        nested pipeline's data (created fields, pos, address) is pinned
        even though struct columns themselves can't hash across engines."""
        flat = _shape_flat_rows(sf_dir)

        def proj(b: pa.Table) -> pa.Table:
            return b.select(["kind", "id", "version", "changeset",
                             "timestamp", "user", "uid", "lat", "lon",
                             "housenumber", "postcode", "street"])
        return flat.map_batches(proj, batch_format="pyarrow")
    q["shape_documents_flat_check"] = shape_documents_flat_check

    def shape_documents_nested(sf_dir):
        """[R:data.py::shape_element] M8/M9 nested form — the reference's
        full document shape as Arrow structs: created{version, changeset,
        timestamp, user, uid}, pos{lat,lon}, address{housenumber,
        postcode, street} pivoted from the addr:* tags (normalized M5 /
        cleaned M6 in the pivot). (rows-only — struct columns don't
        value-hash across engines; the CONTENT is oracle-pinned by
        shape_documents_flat_check.)"""
        flat = _shape_flat_rows(sf_dir)

        def assemble(b: pa.Table) -> pa.Table:
            n = len(b)
            created = pa.StructArray.from_arrays(
                [b[c].combine_chunks() for c in
                 ("version", "changeset", "timestamp", "user", "uid")],
                names=["version", "changeset", "timestamp", "user", "uid"])
            pos_null = pc.invert(pc.is_valid(b["lat"])).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            pos = pa.StructArray.from_arrays(
                [b["lat"].combine_chunks(), b["lon"].combine_chunks()],
                names=["lat", "lon"], mask=pa.array(pos_null))
            no_addr = ~np.logical_or.reduce(
                [pc.is_valid(b[c]).combine_chunks()
                 .to_numpy(zero_copy_only=False) for c in A_FIELDS])
            address = pa.StructArray.from_arrays(
                [b[c].combine_chunks() for c in A_FIELDS],
                names=A_FIELDS, mask=pa.array(no_addr))
            return pa.table({"id": b["id"], "type": b["kind"],
                             "created": created, "pos": pos,
                             "address": address})

        return flat.map_batches(assemble, batch_format="pyarrow")
    q["shape_documents_nested"] = shape_documents_nested

    def top_event_value_per_user(sf_dir):
        """Window-rank op: each user's single highest-value event
        (rank-1 per partition; ties broken by event_id)."""
        from ..util import bucketed_group_apply
        ds = fx.driver_table(sf_dir, "events",
                            columns=["user_id", "event_id", "value"])

        def local_top(b: pd.DataFrame) -> pd.DataFrame:
            b = b.sort_values(["user_id", "value", "event_id"],
                              ascending=[True, False, True], kind="mergesort")
            return b[~b.duplicated("user_id", keep="first")]

        pre = ds.map_batches(local_top, batch_format="pandas")

        def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["user_id", "value", "event_id"],
                              ascending=[True, False, True], kind="mergesort")
            g = g[~g.duplicated("user_id", keep="first")]
            return g[["user_id", "event_id", "value"]]

        return bucketed_group_apply(pre, ["user_id"], bucket_top, n_buckets=64)
    q["top_event_value_per_user"] = top_event_value_per_user

    def decode_image_features(sf_dir):
        """S6 — decode every stored format, verify stored phash, emit
        brightness stats (actor pool; rows-only check)."""
        ds = fx.read_fixture(sf_dir, "images")
        out = multimodal.decode_features(ds, verify_phash=True)
        return out.select_columns(["image_id", "phash_ok", "brightness"])
    q["decode_image_features"] = decode_image_features

    def asof_last_order(sf_dir):
        """As-of join (backward, inclusive): for each event, the latest
        order date of the same customer at or before the event time."""
        from ..stages.asof import asof_join_last
        events = fx.driver_table(sf_dir, "events",
                                 columns=["event_id", "user_id", "ts"]) \
                   .rename_columns({"user_id": "key"})
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_custkey", "o_orderdate"]) \
                   .rename_columns({"o_custkey": "key"})
        out = asof_join_last(events, orders, "key", "ts", "o_orderdate",
                             left_keep=["event_id"],
                             out_col="last_order_us")
        return out
    q["asof_last_order"] = asof_last_order

    def range_join_value_brackets(sf_dir):
        """Range join against a small interval table (broadcast, map-side:
        the scalable pattern for band joins — no shuffle; np.searchsorted
        per batch against the sorted bracket bounds)."""
        brackets = [(0.0, 2.0), (2.0, 5.0), (5.0, 10.0), (10.0, 20.0),
                    (20.0, 1e18)]
        lo = np.array([b[0] for b in brackets])
        ds = fx.driver_table(sf_dir, "events", columns=["value"])

        def f(b: pa.Table) -> pa.Table:
            v = b["value"].to_numpy()
            idx = np.searchsorted(lo, v, side="right") - 1
            idx = np.clip(idx, 0, len(brackets) - 1)
            return pa.table({"bracket_lo": pa.array(lo[idx], pa.float64())})
        return ds.map_batches(f, batch_format="pyarrow") \
                 .groupby("bracket_lo").count().rename_columns({"count()": "cnt"})
    q["range_join_value_brackets"] = range_join_value_brackets

    def lossy_psnr_floor(sf_dir):
        """BASELINE invariant in-pipeline: decoded pixels vs the ORIGINAL
        pixel function — lossless formats bit-exact, lossy8 PSNR ≥ 40 dB.
        Emits one row: counts + the global min PSNR (rows-only)."""
        from .. import synth
        from ..functions import codecs
        ds = fx.read_fixture(sf_dir, "images",
                             columns=["image_id", "bytes", "w", "h", "fmt"])

        def f(b: pa.Table) -> pa.Table:
            n_exact = n_lossy = 0
            min_psnr = np.inf
            ids = b["image_id"].to_pylist()
            fmts = b["fmt"].to_pylist()
            ws, hs = b["w"].to_numpy(), b["h"].to_numpy()
            blobs = b["bytes"]
            for i in range(len(ids)):
                idx = int(ids[i][3:])
                src = idx - 1 if (idx % synth.DUP_RATE == synth.DUP_RATE - 1
                                  and idx > 0) else idx
                ref = synth._pixels(src, int(hs[i]), int(ws[i]))
                img = codecs.decode(blobs[i].as_py(), fmts[i],
                                    int(ws[i]), int(hs[i]))
                if fmts[i] == "lossy8":
                    n_lossy += 1
                    min_psnr = min(min_psnr, codecs.psnr(ref, img))
                else:
                    n_exact += int((ref == img).all())
            return pa.table({"n_exact": pa.array([n_exact], pa.int64()),
                             "n_lossy": pa.array([n_lossy], pa.int64()),
                             "min_psnr": pa.array(
                                 [min_psnr if np.isfinite(min_psnr) else 1e9],
                                 pa.float64())})
        parts = ds.map_batches(f, batch_format="pyarrow").to_pandas()
        return pd.DataFrame({
            "n_exact": [int(parts["n_exact"].sum())],
            "n_lossy": [int(parts["n_lossy"].sum())],
            "min_psnr_db": [round(float(parts["min_psnr"].min()), 1)],
        })
    q["lossy_psnr_floor"] = lossy_psnr_floor

    # ------------------------------ round-2 additions: relational breadth

    def customers_without_recent_orders(sf_dir):
        """Distributed anti-join (NOT EXISTS): customers with no order on
        or after 2001-01-01 — one bucketed shuffle, keys null-padded from
        the probe schema (util.anti_semi_join)."""
        from datetime import datetime

        from ..util import anti_semi_join
        cust = fx.driver_table(sf_dir, "customer", columns=["c_custkey"])
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_custkey", "o_orderdate"])
        cutoff = datetime(2001, 1, 1)

        def recent(b: pa.Table) -> pa.Table:
            keep = pc.greater_equal(b["o_orderdate"], pa.scalar(cutoff))
            return b.filter(keep).select(["o_custkey"])
        rec = orders.map_batches(recent, batch_format="pyarrow")
        return anti_semi_join(cust, rec, on="c_custkey", keys_on="o_custkey")
    q["customers_without_recent_orders"] = customers_without_recent_orders

    def tpch_q3_topk(sf_dir):
        """TPC-H Q3 shape: σ(customer) ⋈ σ(orders) ⋈ σ(lineitem) →
        groupby revenue → distributed top-10. Filters pushed before both
        hash joins; revenue rounded identically on both sides before the
        top-k so boundary ties agree."""
        from datetime import datetime

        from ray.data.aggregate import Sum
        from ..util import cluster_cpus
        cutoff = datetime(1998, 1, 1)
        # consolidate the filtered dim side: a selective filter at high
        # parallelism leaves schema-less empty blocks that break Ray
        # 2.49's hash-join aggregator (ArrowInvalid) — and fewer, fuller
        # blocks are what you want feeding a shuffle anyway
        cust = fx.driver_table(sf_dir, "customer",
                               columns=["c_custkey", "c_mktsegment"]) \
                 .filter(expr="c_mktsegment == 'BUILDING'") \
                 .select_columns(["c_custkey"]) \
                 .repartition(max(2, cluster_cpus() // 8))
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_custkey",
                                          "o_orderdate"])

        def o_filt(b: pa.Table) -> pa.Table:
            keep = pc.less(b["o_orderdate"], pa.scalar(cutoff))
            return b.filter(keep).select(["o_orderkey", "o_custkey"]) \
                    .rename_columns(["o_orderkey", "c_custkey"])
        o = orders.map_batches(o_filt, batch_format="pyarrow")
        oc = o.join(cust, on=("c_custkey",), join_type="inner",
                    **join_kwargs(fx.table_join_partitions(
                        sf_dir, "orders", "customer")))
        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_orderkey", "l_extendedprice",
                                      "l_discount", "l_shipdate"])

        def l_filt(b: pa.Table) -> pa.Table:
            keep = pc.greater(b["l_shipdate"], pa.scalar(cutoff))
            f = b.filter(keep)
            rev = pc.multiply(f["l_extendedprice"],
                              pc.subtract(pa.scalar(1.0), f["l_discount"]))
            return pa.table({"o_orderkey": f["l_orderkey"], "rev": rev})
        l = li.map_batches(l_filt, batch_format="pyarrow")
        joined = l.join(oc.select_columns(["o_orderkey"])
                          .repartition(max(2, cluster_cpus() // 8)),
                        on=("o_orderkey",), join_type="inner",
                        **join_kwargs(fx.table_join_partitions(
                            sf_dir, "lineitem")))
        agg = joined.groupby("o_orderkey").aggregate(
            Sum("rev", alias_name="revenue"))

        def round_rev(b: pa.Table) -> pa.Table:
            return pa.table({"o_orderkey": b["o_orderkey"],
                             "revenue": pc.round(b["revenue"], 2)})
        rounded = agg.map_batches(round_rev, batch_format="pyarrow")
        return distributed_topk(rounded, 10, [("revenue", "descending"),
                                              ("o_orderkey", "ascending")])
    q["tpch_q3_topk"] = tpch_q3_topk

    def events_running_sum(sf_dir):
        """Cumulative window: per-user running sum of value ordered by
        (ts, event_id) — bucketed per-user apply, vectorized cumsum."""
        from ..util import bucketed_group_apply
        ds = fx.driver_table(sf_dir, "events",
                             columns=["user_id", "event_id", "ts", "value"])

        def run(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
            rs = g.groupby("user_id", sort=False)["value"].cumsum().round(2)
            return pd.DataFrame({"event_id": g["event_id"].to_numpy(),
                                 "running_value": rs.to_numpy()})

        return bucketed_group_apply(ds, ["user_id"], run, n_buckets=64)
    q["events_running_sum"] = events_running_sum

    def top3_parts_per_brand(sf_dir):
        """Grouped top-N (rank ≤ 3 per brand by retail price): per-batch
        local top-3 per brand, then one bucketed per-brand re-reduce —
        never a global sort, never a driver-side full table."""
        from ..util import bucketed_group_apply
        ds = fx.driver_table(sf_dir, "part",
                             columns=["p_brand", "p_partkey", "p_retailprice"])

        def local(b: pd.DataFrame) -> pd.DataFrame:
            b = b.sort_values(["p_brand", "p_retailprice", "p_partkey"],
                              ascending=[True, False, True], kind="mergesort")
            return b.groupby("p_brand", sort=False).head(3)
        pre = ds.map_batches(local, batch_format="pandas")

        def reduce3(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["p_brand", "p_retailprice", "p_partkey"],
                              ascending=[True, False, True], kind="mergesort")
            out = g.groupby("p_brand", sort=False).head(3)
            return out[["p_brand", "p_partkey", "p_retailprice"]]
        return bucketed_group_apply(pre, ["p_brand"], reduce3, n_buckets=64)
    q["top3_parts_per_brand"] = top3_parts_per_brand

    def lineitem_quantity_quantiles(sf_dir):
        """Exact discrete quantiles at scale: l_quantity has bounded
        cardinality, so a distributed value-histogram (tiny) + driver
        cumulative walk gives EXACT q25/q50/q75 with no global sort."""
        ds = fx.driver_table(sf_dir, "lineitem", columns=["l_quantity"])
        hist = grouped_count(ds, "l_quantity").to_pandas().sort_values("l_quantity")
        vals = hist["l_quantity"].to_numpy()
        cum = hist["cnt"].to_numpy().cumsum()
        n = int(cum[-1])

        def q_disc(qq: float) -> float:
            target = int(np.floor(qq * (n - 1)))
            return float(vals[np.searchsorted(cum, target, side="right")])
        return pd.DataFrame({"q25": [q_disc(0.25)], "q50": [q_disc(0.5)],
                             "q75": [q_disc(0.75)]})
    q["lineitem_quantity_quantiles"] = lineitem_quantity_quantiles

    def event_type_pivot(sf_dir):
        """Pivot: one row per hour, one count column per event type
        (one-hot in the map, Sum in the shuffle — single pass)."""
        from ray.data.aggregate import Sum
        types = ["click", "view", "purchase", "signup", "error"]
        ds = fx.driver_table(sf_dir, "events", columns=["ts", "event_type"])

        def onehot(b: pa.Table) -> pa.Table:
            us = pc.cast(b["ts"], pa.int64()).to_numpy()
            et = np.asarray(b["event_type"].to_pylist())
            cols = {"hour_idx": pa.array(us // 3_600_000_000, pa.int64())}
            for t in types:
                cols[f"cnt_{t}"] = pa.array((et == t).astype(np.int64))
            return pa.table(cols)
        return (ds.map_batches(onehot, batch_format="pyarrow")
                  .groupby("hour_idx")
                  .aggregate(*[Sum(f"cnt_{t}", alias_name=f"cnt_{t}")
                               for t in types]))
    q["event_type_pivot"] = event_type_pivot

    def orders_per_nation(sf_dir):
        """Broadcast dim join: orders ⋈ customer (hash shuffle on custkey)
        then the 25-row nation table broadcast once (ray.put) and mapped
        in-batch — the small side never shuffles."""
        import ray
        from ray.data.aggregate import Count, Sum
        import pyarrow.parquet as pq
        nat = pq.read_table(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey", "n_name"])
        lut = np.empty(int(pc.max(nat["n_nationkey"]).as_py()) + 1, object)
        for k, v in zip(nat["n_nationkey"].to_pylist(),
                        nat["n_name"].to_pylist()):
            lut[k] = v
        ref = ray.put(lut)
        cust = fx.driver_table(sf_dir, "customer",
                               columns=["c_custkey", "c_nationkey"])
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_custkey", "o_totalprice"]) \
                   .rename_columns({"o_custkey": "c_custkey"})
        joined = orders.join(cust, on=("c_custkey",), join_type="inner",
                             **join_kwargs(fx.table_join_partitions(
                                 sf_dir, "orders", "customer")))

        def attach(b: pa.Table) -> pa.Table:
            names = ray.get(ref)[b["c_nationkey"].to_numpy()]
            return pa.table({"n_name": pa.array(names.tolist(), pa.string()),
                             "o_totalprice": b["o_totalprice"]})
        out = (joined.map_batches(attach, batch_format="pyarrow")
               .groupby("n_name")
               .aggregate(Count(alias_name="n_orders"),
                          Sum("o_totalprice", alias_name="revenue"))).to_pandas()
        out["revenue"] = out["revenue"].round(0)
        return out
    q["orders_per_nation"] = orders_per_nation

    def asof_next_event(sf_dir):
        """Forward as-of join: for each order, the EARLIEST event of the
        same customer at/after the order date (negated-timestamp sweep)."""
        from ..stages.asof import asof_join_next
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_custkey",
                                          "o_orderdate"]) \
                   .rename_columns({"o_custkey": "key"})
        events = fx.driver_table(sf_dir, "events",
                                 columns=["user_id", "ts"]) \
                   .rename_columns({"user_id": "key"})
        out = asof_join_next(orders, events, "key", "o_orderdate", "ts",
                             left_keep=["o_orderkey"],
                             out_col="next_event_us")

        def finalize(b: pd.DataFrame) -> pd.DataFrame:
            # null → -1 sentinel (both sides): nullable ints don't survive
            # the driver's value-hash canonicalization
            return pd.DataFrame({
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "next_event_us": pd.array(b["next_event_us"], dtype="Int64")
                                   .fillna(-1).astype("int64"),
            })
        return out.map_batches(finalize, batch_format="pandas")
    q["asof_next_event"] = asof_next_event

    def props_k_histogram(sf_dir):
        """JSON scalar function (§2.8): parse the events ``props`` JSON
        column, extract field k, histogram by k-decile. Fast path is a
        vectorized Arrow regex over the fixed ``"k": <int>`` layout; rows
        the regex misses (reordered keys, nesting) fall back to per-row
        ``json.loads`` — so the stage stays Arrow-native on the hot path
        without narrowing the accepted JSON."""
        ds = fx.driver_table(sf_dir, "events", columns=["props"])

        def parse(b: pa.Table) -> pa.Table:
            ext = pc.extract_regex(b["props"], r'"k"\s*:\s*(?P<k>-?\d+)')
            ks = pc.cast(pc.struct_field(ext, "k"), pa.int64())
            if ks.null_count:
                import json
                vals = ks.to_pylist()
                props = b["props"].to_pylist()
                ks = pa.array(
                    [v if v is not None else int(json.loads(props[i])["k"])
                     for i, v in enumerate(vals)], pa.int64())
            dec = np.floor_divide(ks.to_numpy(zero_copy_only=False), 10)
            return pa.table({"k_decile": pa.array(dec, pa.int64())})
        return ds.map_batches(parse, batch_format="pyarrow") \
                 .groupby("k_decile").count().rename_columns({"count()": "cnt"})
    q["props_k_histogram"] = props_k_histogram

    def image_phash_near_dup(sf_dir):
        """Image near-dup by perceptual-hash Hamming distance ≤ 3:
        banded 64-bit signature buckets (exact guarantee by pigeonhole),
        verified with vectorized popcount — the image-payload twin of
        SimHash, oracle-paired against a bit_count cross join."""
        ds = fx.read_fixture(sf_dir, "images", columns=["image_id", "phash"])
        return dedup.band_hamming_pairs(ds, "image_id", "phash",
                                        max_hamming=3) \
                    .select_columns(["id_a", "id_b"])
    q["image_phash_near_dup"] = image_phash_near_dup

    def events_sliding_1h15m(sf_dir):
        """Sliding-window aggregate: 1h windows every 15 min — each event
        replicated map-side into its 4 covering windows (no self-join),
        then one count/sum shuffle."""
        from ray.data.aggregate import Count, Sum
        ds = fx.driver_table(sf_dir, "events", columns=["ts", "value"])

        def explode(b: pa.Table) -> pa.Table:
            q15 = pc.cast(b["ts"], pa.int64()).to_numpy() // 900_000_000
            val = b["value"].to_numpy()
            n = len(q15)
            win = (np.repeat(q15, 4)
                   - np.tile(np.arange(4, dtype=np.int64), n))
            return pa.table({"window_q": pa.array(win, pa.int64()),
                             "value": pa.array(np.repeat(val, 4))})
        out = (ds.map_batches(explode, batch_format="pyarrow")
                 .groupby("window_q")
                 .aggregate(Count(alias_name="cnt"),
                            Sum("value", alias_name="sum_value"))).to_pandas()
        out["sum_value"] = out["sum_value"].round(2)
        return out
    q["events_sliding_1h15m"] = events_sliding_1h15m

    def tpch_q5_volume(sf_dir):
        """TPC-H Q5 shape (6-table): lineitem ⋈ orders ⋈ customer hash
        joins; supplier/nation dim tables broadcast once (ray.put) and
        applied map-side; revenue per nation where the customer and
        supplier share a nation."""
        import pyarrow.parquet as pq
        import ray
        from ray.data.aggregate import Sum
        sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"])
        s_lut = np.full(int(pc.max(sup["s_suppkey"]).as_py()) + 1, -1,
                        np.int64)
        s_lut[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
        nat = pq.read_table(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey", "n_name"])
        n_lut = np.empty(int(pc.max(nat["n_nationkey"]).as_py()) + 1, object)
        for k, v in zip(nat["n_nationkey"].to_pylist(),
                        nat["n_name"].to_pylist()):
            n_lut[k] = v
        ref = ray.put((s_lut, n_lut))

        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_custkey"]) \
                   .rename_columns({"o_custkey": "c_custkey"})
        cust = fx.driver_table(sf_dir, "customer",
                               columns=["c_custkey", "c_nationkey"])
        oc = orders.join(cust, on=("c_custkey",), join_type="inner",
                         **join_kwargs(fx.table_join_partitions(
                             sf_dir, "orders", "customer")))
        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_orderkey", "l_suppkey",
                                      "l_extendedprice", "l_discount"])

        def rev(b: pa.Table) -> pa.Table:
            r = pc.multiply(b["l_extendedprice"],
                            pc.subtract(pa.scalar(1.0), b["l_discount"]))
            return pa.table({"o_orderkey": b["l_orderkey"],
                             "l_suppkey": b["l_suppkey"], "rev": r})
        l = li.map_batches(rev, batch_format="pyarrow")
        joined = l.join(oc.select_columns(["o_orderkey", "c_nationkey"]),
                        on=("o_orderkey",), join_type="inner",
                        **join_kwargs(fx.table_join_partitions(
                            sf_dir, "lineitem")))

        def local_supplier(b: pa.Table) -> pa.Table:
            s_nk = ray.get(ref)[0][b["l_suppkey"].to_numpy()]
            c_nk = b["c_nationkey"].to_numpy().astype(np.int64)
            keep = s_nk == c_nk
            names = ray.get(ref)[1][c_nk[keep]]
            return pa.table({
                "n_name": pa.array(names.tolist(), pa.string()),
                "rev": b["rev"].filter(pa.array(keep))})
        out = (joined.map_batches(local_supplier, batch_format="pyarrow")
               .groupby("n_name")
               .aggregate(Sum("rev", alias_name="revenue"))).to_pandas()
        out["revenue"] = out["revenue"].round(0)
        return out
    q["tpch_q5_volume"] = tpch_q5_volume

    def orders_rollup(sf_dir):
        """ROLLUP(status, priority): three groupby levels unioned, 'ALL'
        sentinel for the rolled-up dimensions (null-free hashing)."""
        ds = fx.driver_table(sf_dir, "orders",
                             columns=["o_orderstatus", "o_orderpriority"])
        fine = ds.groupby(["o_orderstatus", "o_orderpriority"]).count() \
                 .rename_columns({"count()": "cnt"}).to_pandas()
        mid = fine.groupby("o_orderstatus", as_index=False)["cnt"].sum()
        mid["o_orderpriority"] = "ALL"
        top = pd.DataFrame({"o_orderstatus": ["ALL"],
                            "o_orderpriority": ["ALL"],
                            "cnt": [int(fine["cnt"].sum())]})
        out = pd.concat([fine, mid, top], ignore_index=True)
        return out[["o_orderstatus", "o_orderpriority", "cnt"]]
    q["orders_rollup"] = orders_rollup

    def distinct_users_hll(sf_dir):
        """Approximate distinct via HyperLogLog (mergeable sketch — a
        fixed 2^12-row exchange instead of shuffling every distinct key;
        rows-only: ±1.6% by construction, exactness tested in pytest)."""
        from ..stages import sketch
        ds = fx.driver_table(sf_dir, "events", columns=["user_id"])
        est = sketch.hll_distinct(ds, "user_id", p=12)
        return pd.DataFrame({"n_users_approx": [int(round(est))]})
    q["distinct_users_hll"] = distinct_users_hll

    # ----------------------- round-3 additions (all oracle-paired) ------

    def doc_quality_features_check(sf_dir):
        """The SQL-expressible slice of quality scoring (VERDICT r2 item
        6): whitespace token count, mean token length, punctuation ratio —
        same kernels as doc_quality, pinned value-exact against regex SQL."""
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])
        feats = textstage.analyze_text(ds)

        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": b["doc_id"],
                "n_tokens_ws": b["n_tokens_ws"],
                "mean_token_len": _round_half_away(b["mean_token_len"]),
                "punct_ratio": _round_half_away(b["punct_ratio"]),
            })
        return feats.map_batches(f, batch_format="pyarrow")
    q["doc_quality_features_check"] = doc_quality_features_check

    def doc_quality_full_check(sf_dir):
        """The REMAINING quality-scoring floats oracle-paired (stopword /
        upper ratios and the composite quality_score): the DuckDB twin
        reproduces the exact clip-and-blend formula with LEAST/GREATEST
        and list lambdas. Valid because the driver docs contain no cased
        non-ASCII characters (audited), so Python isupper() == [A-Z].
        Together with doc_quality_features_check this pins every
        doc_quality column except the heuristic lang_pred."""
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])
        feats = textstage.analyze_text(ds)

        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": b["doc_id"],
                "stopword_ratio": _round_half_away(b["stopword_ratio"]),
                "upper_ratio": _round_half_away(b["upper_ratio"]),
                "quality_score": _round_half_away(b["quality_score"]),
            })
        return feats.map_batches(f, batch_format="pyarrow")
    q["doc_quality_full_check"] = doc_quality_full_check

    def doc_langid_check(sf_dir):
        """Language-ID oracle-paired: the stopword-vote classifier
        (functions/text.langid — CJK codepoint check on the first 400
        chars, else argmax of per-language stopword hits over the first
        2000 chars with earliest-alphabetical tie-break) reproduced in
        SQL via list lambdas + a CASE argmax chain. With this, EVERY
        doc_quality column is oracle-pinned."""
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])
        feats = textstage.analyze_text(ds)
        return feats.select_columns(["doc_id", "lang_pred"])
    q["doc_langid_check"] = doc_langid_check

    def tpch_q6_revenue(sf_dir):
        """TPC-H Q6 shape: predicate-pruned scan + one global product sum
        (per-batch partial, on-cluster Sum — no groupby, no driver rows)."""
        from ray.data.aggregate import Sum
        ds = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_shipdate", "l_discount",
                                      "l_quantity", "l_extendedprice"])
        lo = pd.Timestamp("1996-01-01").value // 1000   # µs
        hi = pd.Timestamp("1997-01-01").value // 1000

        def partial(b: pa.Table) -> pa.Table:
            ship = pc.cast(b["l_shipdate"], pa.int64()).to_numpy()
            disc = b["l_discount"].to_numpy()
            qty = b["l_quantity"].to_numpy()
            price = b["l_extendedprice"].to_numpy()
            m = ((ship >= lo) & (ship < hi) & (disc >= 0.02)
                 & (disc <= 0.04) & (qty < 24))
            return pa.table({"rev": pa.array([float((price[m] * disc[m]).sum())],
                                             pa.float64())})
        agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(Sum("rev"))
        rev = 0.0 if agg is None else (agg.get("sum(rev)") or 0.0)
        return pd.DataFrame({"revenue": [round(float(rev), 2)]})
    q["tpch_q6_revenue"] = tpch_q6_revenue

    def tpch_q4_priority(sf_dir):
        """TPC-H Q4 shape (EXISTS → aggregate-then-join): per-order max
        shipdate is a pre-aggregable reduction (map-side pandas partial,
        then Max), so the EXISTS predicate becomes one sized hash join +
        vectorized compare — no correlated per-row probe anywhere."""
        from ray.data.aggregate import Max
        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_orderkey", "l_shipdate"])

        def partial(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            df["ship_us"] = df["l_shipdate"].astype("int64") // 1000
            g = df.groupby("l_orderkey", as_index=False)["ship_us"].max()
            return pa.table({
                "l_orderkey": pa.array(g["l_orderkey"].to_numpy(), pa.int64()),
                "ship_us": pa.array(g["ship_us"].to_numpy(), pa.int64())})

        maxship = li.map_batches(partial, batch_format="pyarrow") \
                    .groupby("l_orderkey").aggregate(Max("ship_us",
                                                         alias_name="max_ship_us")) \
                    .rename_columns({"l_orderkey": "o_orderkey"})
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_orderdate",
                                          "o_orderpriority"])
        joined = orders.join(maxship, on=("o_orderkey",), join_type="inner",
                             **join_kwargs(fx.table_join_partitions(
                                 sf_dir, "orders", "lineitem")))

        def late(b: pa.Table) -> pa.Table:
            od = pc.cast(b["o_orderdate"], pa.int64()).to_numpy() // 1000
            keep = b["max_ship_us"].to_numpy() > od
            return pa.table({"o_orderpriority":
                             b["o_orderpriority"].filter(pa.array(keep))})
        return joined.map_batches(late, batch_format="pyarrow") \
                     .groupby("o_orderpriority").count() \
                     .rename_columns({"count()": "cnt"})
    q["tpch_q4_priority"] = tpch_q4_priority

    def tpch_q14_promo(sf_dir):
        """TPC-H Q14 shape: the part promo flags attach via
        ``broadcast_inner_join`` (capped, hash-join fallback — round-3
        VERDICT: no unconditional driver pull of an SF-scaling table);
        the date window prunes lineitem map-side BEFORE the attach, so
        only the month's rows carry the extra column."""
        from ray.data.aggregate import Sum
        from ..util import broadcast_inner_join
        lo = pd.Timestamp("1997-06-01").value // 1000
        hi = pd.Timestamp("1997-07-01").value // 1000

        def promo_lut(b: pa.Table) -> pa.Table:
            return pa.table({
                "l_partkey": b["p_partkey"],
                "is_promo": pc.equal(b["p_type"], "PROMO")})

        def pre(b: pa.Table) -> pa.Table:
            ship = pc.cast(b["l_shipdate"], pa.int64()).to_numpy()
            m = (ship >= lo) & (ship < hi)
            f = b.filter(pa.array(m))
            rev = (f["l_extendedprice"].to_numpy()
                   * (1.0 - f["l_discount"].to_numpy()))
            return pa.table({"l_partkey": f["l_partkey"],
                             "rev": pa.array(rev, pa.float64())})

        def partial(b: pa.Table) -> pa.Table:
            rev = b["rev"].to_numpy()
            pr = b["is_promo"].to_numpy(zero_copy_only=False).astype(bool)
            return pa.table({
                "promo_rev": pa.array([float(rev[pr].sum())], pa.float64()),
                "total_rev": pa.array([float(rev.sum())], pa.float64()),
            })

        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_partkey", "l_shipdate",
                                      "l_extendedprice", "l_discount"]) \
               .map_batches(pre, batch_format="pyarrow")
        pt = fx.driver_table(sf_dir, "part",
                             columns=["p_partkey", "p_type"]) \
               .map_batches(promo_lut, batch_format="pyarrow")
        agg = broadcast_inner_join(li, pt, on="l_partkey") \
            .map_batches(partial, batch_format="pyarrow") \
            .aggregate(Sum("promo_rev"), Sum("total_rev"))
        p = agg.get("sum(promo_rev)") or 0.0
        t = agg.get("sum(total_rev)") or 0.0
        pct = round(100.0 * p / t, 4) if t else 0.0
        return pd.DataFrame({"promo_revenue_pct": [pct]})
    q["tpch_q14_promo"] = tpch_q14_promo

    def tpch_q18_large_orders(sf_dir):
        """TPC-H Q18 shape: hot-key-safe per-order quantity rollup (Ray's
        hash agg does map-side partials) → selective HAVING filter
        (repartitioned before the join — NOTES_r2 empty-block gotcha) →
        sized hash join → distributed top-k."""
        from ray.data.aggregate import Sum

        from ..util import cluster_cpus
        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_orderkey", "l_quantity"])
        qty = li.groupby("l_orderkey").aggregate(Sum("l_quantity",
                                                     alias_name="sum_qty"))
        big = qty.filter(expr="sum_qty > 180.0") \
                 .rename_columns({"l_orderkey": "o_orderkey"}) \
                 .repartition(max(2, cluster_cpus() // 8))
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_totalprice"])
        joined = orders.join(big, on=("o_orderkey",), join_type="inner",
                             **join_kwargs(fx.table_join_partitions(
                                 sf_dir, "orders")))
        out = distributed_topk(joined, 10,
                               [("o_totalprice", "descending"),
                                ("o_orderkey", "ascending")])
        out["sum_qty"] = out["sum_qty"].round(2)
        out["o_totalprice"] = out["o_totalprice"].round(2)
        return out[["o_orderkey", "o_totalprice", "sum_qty"]]
    q["tpch_q18_large_orders"] = tpch_q18_large_orders

    def event_gap_stats(sf_dir):
        """Per-user inter-arrival gaps (LAG window shape): one bucketed
        shuffle on user_id, vectorized per-bucket diff over (ts, event_id)
        order — the sessionization kernel generalized to gap statistics."""
        from ..util import bucketed_group_apply
        ev = fx.driver_table(sf_dir, "events",
                             columns=["user_id", "ts", "event_id"])

        def t_us(b: pa.Table) -> pa.Table:
            return pa.table({"user_id": b["user_id"],
                             "ts_us": pc.cast(b["ts"], pa.int64()),
                             "event_id": b["event_id"]})

        def gaps(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["user_id", "ts_us", "event_id"],
                              kind="mergesort")
            uid = g["user_id"].to_numpy()
            ts = g["ts_us"].to_numpy()
            same = np.empty(len(g), bool)
            if len(g) == 0:
                return pd.DataFrame({"user_id": uid[:0],
                                     "n_gaps": np.empty(0, np.int64),
                                     "avg_gap_s": np.empty(0, np.float64)})
            same[0] = False
            same[1:] = uid[1:] == uid[:-1]
            gap = np.diff(ts, prepend=ts[0])
            df = pd.DataFrame({"user_id": uid[same], "gap": gap[same]})
            out = df.groupby("user_id", as_index=False).agg(
                n_gaps=("gap", "size"), avg_gap_s=("gap", "mean"))
            out["n_gaps"] = out["n_gaps"].astype("int64")
            out["avg_gap_s"] = (out["avg_gap_s"] / 1e6).round(3)
            # users with a single event have zero gaps → emit (0, NaN) to
            # mirror the SQL twin's COUNT(gap)=0 / AVG(gap)=NULL rows
            singles = np.unique(uid[~same][~np.isin(uid[~same], out["user_id"])])
            if len(singles):
                out = pd.concat([out, pd.DataFrame({
                    "user_id": singles,
                    "n_gaps": np.zeros(len(singles), np.int64),
                    "avg_gap_s": np.full(len(singles), np.nan)})],
                    ignore_index=True)
            return out

        return bucketed_group_apply(
            ev.map_batches(t_us, batch_format="pyarrow"), ["user_id"], gaps,
            n_buckets=64)
    q["event_gap_stats"] = event_gap_stats

    def corpus_prep_summary(sf_dir):
        """The LLM training-data prep lifecycle as ONE pinned composite:
        documents → content-fingerprint exact dedup (keep min doc_id per
        normalized text) → token-count quality gate → per-language corpus
        stats. Every stage is the production operator (analyze_text
        kernels, stages.dedup.exact_dedup's two-level bucketed reduce) and
        the whole composition hash-matches a single SQL twin."""
        from ray.data.aggregate import Count, Sum
        ds = fx.driver_table(sf_dir, "documents",
                             columns=["doc_id", "text", "lang"])
        feats = textstage.analyze_text(ds)   # adds fingerprint, n_tokens_ws
        kept = dedup.exact_dedup(feats, "fingerprint", "doc_id")
        gated = kept.filter(expr="n_tokens_ws >= 5") \
                    .filter(expr="n_tokens_ws <= 2000")
        return gated.groupby("lang").aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens_ws", alias_name="total_tokens"))
    q["corpus_prep_summary"] = corpus_prep_summary

    def event_value_quantiles_by_type(sf_dir):
        """Per-group EXACT discrete quantiles over a continuous column:
        one shuffle on the (low-cardinality) group key, per-group sort +
        index pick matching DuckDB quantile_disc's ceil(q·n)−1 rule
        (verified empirically). Partitioning assumption: one group's
        values fit a worker — same as any per-key exact reduce; for
        billions of rows per group, switch to the value-histogram
        (lineitem_quantity_quantiles) or a t-digest sketch."""
        import math
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "value"])

        def qs_(g: pd.DataFrame) -> pd.DataFrame:
            v = np.sort(g["value"].to_numpy())
            n = len(v)

            def qd(qq: float) -> float:
                return round(float(v[max(0, math.ceil(qq * n) - 1)]), 6)
            return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                                 "p50": [qd(0.5)], "p95": [qd(0.95)]})
        return ds.groupby("event_type").map_groups(qs_,
                                                   batch_format="pandas")
    q["event_value_quantiles_by_type"] = event_value_quantiles_by_type

    def jaccard_doc_pairs(sf_dir):
        """N-gram (word 3-shingle) Jaccard near-dup as a FIRST-CLASS
        oracle-paired op: MinHash-LSH candidates → exact shingle-set
        Jaccard ≥ τ=0.8 — pinned against a DuckDB twin that computes the
        same shingle-set Jaccard over ALL pairs of the dup-injected
        fixture (at τ=0.8 with 32×4 banding the LSH miss probability per
        true pair is (1−0.8⁴)³² ≈ 5e-8, so candidate generation is
        exhaustive for every oracle row)."""
        ds = fx.read_fixture(sf_dir, "docs_dup", columns=["doc_id", "text"])
        out = dedup.minhash_verified_pairs(ds, "doc_id", "text", tau=0.8)

        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "id_a": b["id_a"], "id_b": b["id_b"],
                "jaccard": pc.round(b["jaccard"], ndigits=6)})
        return out.map_batches(f, batch_format="pyarrow")
    q["jaccard_doc_pairs"] = jaccard_doc_pairs

    def parts_order_coverage(sf_dir):
        """Native LEFT OUTER hash join (the one join type the registry
        didn't yet surface; anti/semi/full-outer live in util and
        user_customer_coverage): per-brand part counts split by whether
        the part was ever ordered — the narrow pre-aggregated lineitem
        side left-joins onto part, null probes counted vectorized."""
        li = fx.driver_table(sf_dir, "lineitem", columns=["l_partkey"])
        ordered = li.groupby("l_partkey").count() \
                    .rename_columns({"count()": "n_li",
                                     "l_partkey": "p_partkey"})
        parts = fx.driver_table(sf_dir, "part",
                                columns=["p_partkey", "p_brand"])
        joined = parts.join(ordered, on=("p_partkey",),
                            join_type="left_outer",
                            **join_kwargs(fx.table_join_partitions(
                                sf_dir, "part", "lineitem")))

        def flags(b: pa.Table) -> pa.Table:
            return pa.table({
                "p_brand": b["p_brand"],
                "never": pc.cast(pc.is_null(b["n_li"]), pa.int64())})
        from ray.data.aggregate import Count, Sum
        return joined.map_batches(flags, batch_format="pyarrow") \
                     .groupby("p_brand").aggregate(
                         Count(alias_name="n_parts"),
                         Sum("never", alias_name="n_never_ordered"))
    q["parts_order_coverage"] = parts_order_coverage

    def near_dedup_docs_check(sf_dir):
        """END-TO-END near-dedup oracle-pinned (pairs → distributed
        connected components → min-id representative kept): the DuckDB
        twin recomputes ALL-pairs shingle Jaccard on the docs_dup fixture
        and resolves components with a recursive-CTE transitive closure —
        so LSH candidate recall, the jaccard verify, CC labeling AND the
        drop-set application are all pinned in one hash (the full
        documents table keeps its rows-only twin,
        near_dedup_docs_minhash, because an all-pairs SQL oracle over 5k
        docs is infeasible)."""
        ds = fx.read_fixture(sf_dir, "docs_dup", columns=["doc_id", "text"])
        return dedup.near_dedup_minhash(ds, "doc_id", "text", tau=0.8) \
                    .select_columns(["doc_id"])
    q["near_dedup_docs_check"] = near_dedup_docs_check

    def polygon_geometry_stats(sf_dir):
        """Vector-side geometry (north_rule raster↔vector): per-polygon
        shoelace area, vertex centroid, vertex count over the ring
        list<struct> column — numpy per ring, SQL twin via list lambdas."""
        polys = fx.read_fixture(sf_dir, "polygons",
                                columns=["polygon_id", "ring"])

        def f(b: pa.Table) -> pa.Table:
            pids, nv, area, clon, clat = [], [], [], [], []
            for pid, ring in zip(b["polygon_id"].to_pylist(),
                                 b["ring"].to_pylist()):
                rx = np.array([p["lon"] for p in ring])
                ry = np.array([p["lat"] for p in ring])
                nx, ny = np.roll(rx, -1), np.roll(ry, -1)
                pids.append(pid)
                nv.append(len(rx))
                area.append(round(abs(float((rx * ny - nx * ry).sum())) / 2, 9))
                clon.append(round(float(rx.sum()) / len(rx), 9))
                clat.append(round(float(ry.sum()) / len(ry), 9))
            return pa.table({
                "polygon_id": pa.array(pids, pa.string()),
                "n_vertices": pa.array(nv, pa.int64()),
                "area_deg2": pa.array(area, pa.float64()),
                "centroid_lon": pa.array(clon, pa.float64()),
                "centroid_lat": pa.array(clat, pa.float64()),
            })
        return polys.map_batches(f, batch_format="pyarrow")
    q["polygon_geometry_stats"] = polygon_geometry_stats

    def raster_vectorize_regions(sf_dir):
        """Raster→vector (north_rule raster↔vector, reverse direction):
        rasterize geo points onto 16×16 per-tile count grids at
        RASTER_RES, then vectorize 4-connected occupied-pixel regions
        into exact degree bboxes. SQL twin recomputes the raster with
        identical integer quantization and resolves regions with a
        recursive-CTE transitive closure (min-label)."""
        from ..stages import rastervec
        pts = fx.read_fixture(sf_dir, "geo", columns=["lon", "lat"])
        return rastervec.rasterize_vectorize(pts, tile_res=RASTER_RES)
    q["raster_vectorize_regions"] = raster_vectorize_regions

    SEQ_LEN = 2048

    def pack_sequences(sf_dir):
        """LLM corpus prep — sequence packing (concat-then-chunk): per
        language, documents are concatenated in doc_id order and the
        token stream is chunked into SEQ_LEN-token bins; each doc is
        assigned the bin its first token lands in (start_offset //
        SEQ_LEN). Per-lang ordered prefix sums run vectorized inside one
        bucketed group apply; partitioning assumption: one language's
        docs fit one bucket (shard by (lang, doc_id range) at corpus
        scale — the offsets then need one tiny per-shard base-offset
        exchange, same two-pass shape)."""
        from ..functions import text
        from ..util import bucketed_group_apply
        ds = fx.driver_table(sf_dir, "documents",
                             columns=["doc_id", "lang", "text"])

        def tok(b: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": b["doc_id"], "lang": b["lang"],
                "ntok": pa.array(text.token_count_ws(b["text"].to_pylist()),
                                 pa.int64())})

        def pack(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["lang", "doc_id"], kind="mergesort")
            start = (g.groupby("lang", sort=False)["ntok"].cumsum()
                     - g["ntok"])
            g = g.assign(bin_idx=(start // SEQ_LEN).astype("int64"))
            out = (g.groupby(["lang", "bin_idx"], as_index=False)
                    .agg(n_docs=("doc_id", "size"), n_tokens=("ntok", "sum")))
            return out
        return bucketed_group_apply(
            ds.map_batches(tok, batch_format="pyarrow"), ["lang"], pack,
            n_buckets=16)
    q["pack_sequences"] = pack_sequences

    def tpch_q10_returns(sf_dir):
        """TPC-H Q10 shape: revenue lost to returned items per customer —
        σ(lineitem: returnflag='R') ⋈ orders ⋈ customer ⋈ nation(broadcast
        LUT) → groupby customer revenue → distributed top-20."""
        import ray
        import pyarrow.parquet as pq
        from ray.data.aggregate import Sum

        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_orderkey", "l_extendedprice",
                                      "l_discount", "l_returnflag"])

        def l_filt(b: pa.Table) -> pa.Table:
            f = b.filter(pc.equal(b["l_returnflag"], pa.scalar("R")))
            # exact integer ten-thousandths: float Sum is order-dependent
            # (association varies with block arrival), which flips
            # round(2) on boundary values run-to-run — int64 sums are
            # exact at ANY parallelism; the SQL twin mirrors the cast
            rev = pc.multiply(f["l_extendedprice"],
                              pc.subtract(pa.scalar(1.0), f["l_discount"]))
            rev4 = np.floor(rev.to_numpy(zero_copy_only=False) * 1e4
                            + 0.5).astype(np.int64)
            return pa.table({"o_orderkey": f["l_orderkey"],
                             "rev4": pa.array(rev4, pa.int64())})

        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_custkey"])
        lo = li.map_batches(l_filt, batch_format="pyarrow") \
               .join(orders, on=("o_orderkey",), join_type="inner",
                     **join_kwargs(fx.table_join_partitions(
                         sf_dir, "lineitem", "orders")))
        cust = fx.driver_table(sf_dir, "customer",
                               columns=["c_custkey", "c_name",
                                        "c_acctbal", "c_nationkey"]) \
                 .rename_columns({"c_custkey": "o_custkey"})
        j = lo.select_columns(["o_custkey", "rev4"]) \
              .join(cust, on=("o_custkey",), join_type="inner",
                    **join_kwargs(fx.table_join_partitions(
                        sf_dir, "lineitem", "customer")))
        agg = j.groupby(["o_custkey", "c_name", "c_acctbal", "c_nationkey"]) \
               .aggregate(Sum("rev4", alias_name="rev4sum"))
        # nation is a 25-row dim: broadcast once, attach map-side
        nat = pq.read_table(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey", "n_name"])
        lut = np.empty(int(pc.max(nat["n_nationkey"]).as_py()) + 1, object)
        for k, v in zip(nat["n_nationkey"].to_pylist(),
                        nat["n_name"].to_pylist()):
            lut[k] = v
        ref = ray.put(lut)

        def attach(b: pa.Table) -> pa.Table:
            names = ray.get(ref)[b["c_nationkey"].to_numpy()]
            return pa.table({
                "c_custkey": b["o_custkey"], "c_name": b["c_name"],
                "n_name": pa.array(names.tolist(), pa.string()),
                "c_acctbal": b["c_acctbal"],
                # exact double: int ten-thousandths / 1e4 is bit-identical
                # to the SQL twin's BIGINT-sum / 10000.0
                "revenue": pc.divide(pc.cast(b["rev4sum"], pa.float64()),
                                     pa.scalar(1e4))})
        rounded = agg.map_batches(attach, batch_format="pyarrow")
        return distributed_topk(rounded, 20, [("revenue", "descending"),
                                              ("c_custkey", "ascending")])
    q["tpch_q10_returns"] = tpch_q10_returns

    def heavy_hitter_tokens(sf_dir):
        """Vocab mining — EXACT counts of every token occurring ≥500
        times, via the sketch-then-verify heavy-hitter operator
        (bounded per-block summaries with undercount bounds → guaranteed
        recall; broadcast exact recheck → exact precision). capacity=16
        is deliberately below the corpus vocabulary so the truncation /
        bound machinery genuinely exercises in the paired check."""
        from ..functions import text
        from ..stages import sketch
        ds = fx.driver_table(sf_dir, "documents", columns=["text"])

        def explode(b: pa.Table) -> pa.Table:
            toks: list[str] = []
            for t in b["text"].to_pylist():
                toks.extend(text.WS_RE.findall(t))
            return pa.table({"token": pa.array(toks, pa.string())})

        stream = ds.map_batches(explode, batch_format="pyarrow")
        return sketch.heavy_hitters(stream, "token", threshold=500,
                                    capacity=16)
    q["heavy_hitter_tokens"] = heavy_hitter_tokens

    def bloom_join_march_revenue(sf_dir):
        """Bloom-filtered big⋈big join: lineitem is pre-filtered map-side
        by a bloom filter of March-1995 order keys (~1.2% selectivity),
        so ~99% of lineitem never enters the join shuffle; the exact hash
        join then removes the bloom's false positives, making the result
        identical to the plain join (the SQL twin). Revenue summed in
        exact integer ten-thousandths (parallelism-stable)."""
        import datetime

        from ..util import bloom_semi_filter

        lo = datetime.datetime(1995, 3, 1)
        hi = datetime.datetime(1995, 4, 1)
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_orderdate"])

        def o_filt(b: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                        pc.less(b["o_orderdate"], pa.scalar(hi)))
            return b.filter(m).select(["o_orderkey"])

        okeys = orders.map_batches(o_filt, batch_format="pyarrow") \
                      .repartition(max(2, cluster_cpus() // 8))
        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_orderkey", "l_extendedprice",
                                      "l_discount"])

        def l_rev(b: pa.Table) -> pa.Table:
            rev = pc.multiply(b["l_extendedprice"],
                              pc.subtract(pa.scalar(1.0), b["l_discount"]))
            rev4 = np.floor(rev.to_numpy(zero_copy_only=False) * 1e4
                            + 0.5).astype(np.int64)
            return pa.table({"o_orderkey": b["l_orderkey"],
                             "rev4": pa.array(rev4, pa.int64())})

        survivors = bloom_semi_filter(
            li.map_batches(l_rev, batch_format="pyarrow"), okeys,
            on="o_orderkey", n_bits=1 << 20) \
            .repartition(max(2, cluster_cpus() // 8))
        j = survivors.join(okeys, on=("o_orderkey",), join_type="inner",
                           **join_kwargs(max(2, cluster_cpus() // 8)))

        def summ(b: pa.Table) -> pa.Table:
            return pa.table({
                "n_items": pa.array([b.num_rows], pa.int64()),
                "rev4": pa.array([pc.sum(b["rev4"]).as_py() or 0],
                                 pa.int64())})

        parts = j.map_batches(summ, batch_format="pyarrow").to_pandas()
        return pd.DataFrame({
            "n_items": [int(parts["n_items"].sum())],
            "revenue": [int(parts["rev4"].sum()) / 1e4]})
    q["bloom_join_march_revenue"] = bloom_join_march_revenue

    def stratified_sample_events(sf_dir):
        """Deterministic hash-based stratified sampling: frequent event
        types downsampled hard, rare ones kept — the keep decision is
        splitmix64(event_id ^ seed) < rate, a pure function of the key,
        so the sample is parallelism/resume-stable, join-consistent,
        and EXACTLY reproduced by the SQL twin (splitmix64 in HUGEINT
        modular arithmetic) — seeded sampling as a value-pinned check,
        not a rows-only one."""
        from ..util import hash_stratified_sample
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_id", "user_id", "event_type"])
        return hash_stratified_sample(
            ds, "event_id", SAMPLE_RATES_PERMILLE,
            strata_col="event_type", seed=SAMPLE_SEED)
    q["stratified_sample_events"] = stratified_sample_events

    def dataset_split_counts(sf_dir):
        """Deterministic train/val/test assignment (80/10/10): the split
        is a pure function of splitmix64(doc_id ^ seed), so it is stable
        across parallelism / resume / re-runs and reproducible in SQL
        (same HUGEINT macro as the stratified sampler). Output: doc
        counts per (lang, split) — map-side pre-aggregated."""
        from ray.data.aggregate import Sum

        from ..functions.hashing import hash64_ints
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "lang"])
        UNIT = (1 << 64) // 1000
        t_train = np.uint64(800 * UNIT)
        t_val = np.uint64(900 * UNIT)

        def assign(b: pa.Table) -> pa.Table:
            u = hash64_ints(b["doc_id"].to_numpy(), SPLIT_SEED)
            split = np.where(u < t_train, "train",
                             np.where(u < t_val, "val", "test"))
            df = pd.DataFrame({"lang": b["lang"].to_pylist(),
                               "split": split})
            g = df.groupby(["lang", "split"], sort=False) \
                  .size().reset_index(name="n")
            return pa.Table.from_pandas(g, preserve_index=False)

        return ds.map_batches(assign, batch_format="pyarrow") \
                 .groupby(["lang", "split"]) \
                 .aggregate(Sum("n", alias_name="n_docs"))
    q["dataset_split_counts"] = dataset_split_counts

    def tfidf_top_terms(sf_dir):
        """Corpus TF-IDF (the classic two-statistic text-vectorization
        pass): per-doc top-3 whitespace terms by tf·ln(N/df). tf is a
        map-only pass, df a combiner-pre-aggregated vocab shuffle
        broadcast back map-side; scores fixed-point e4 and ORDERED BY
        the rounded integer on both sides (ties by token) so engine
        float ulps cannot reorder the top-k."""
        ds = fx.driver_table(sf_dir, "documents", columns=["doc_id", "text"])
        n_docs = ds.count()   # metadata-only on a pure parquet read
        return textstage.tfidf_top_terms(ds, n_docs, k=3)
    q["tfidf_top_terms"] = tfidf_top_terms

    def pagerank_order_part(sf_dir):
        """Iterative distributed PageRank (3 power iterations, d=0.85)
        over the symmetrized order⋈part bipartite MULTIGRAPH from
        lineitem (nodes namespaced 2k / 2k+1; parallel edges each
        contribute — the twin matches by not deduplicating). In the
        broadcast regime (nodes ≤ 2M) every iteration is one map-only
        pass with driver-merged node-sized partials — zero shuffles;
        past the cap it's hash-join + groupby-sum per round. Output is
        the global top-20 by fixed-point e6 rank via distributed_topk —
        ordering uses the rounded integer on both sides."""
        from ..stages import graph
        ds = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_orderkey", "l_partkey"])

        def mk_edges(b: pa.Table) -> pa.Table:
            o = pc.multiply(b["l_orderkey"], pa.scalar(2, pa.int64()))
            p = pc.add(pc.multiply(b["l_partkey"], pa.scalar(2, pa.int64())),
                       pa.scalar(1, pa.int64()))
            return pa.table({"src": pa.concat_arrays([o.combine_chunks(),
                                                      p.combine_chunks()]),
                             "dst": pa.concat_arrays([p.combine_chunks(),
                                                      o.combine_chunks()])})

        edges = ds.map_batches(mk_edges, batch_format="pyarrow")
        ranks = graph.pagerank(edges, n_iters=3, d=0.85)

        def fixed(b: pa.Table) -> pa.Table:
            r = b["r"].to_numpy(zero_copy_only=False)
            e6 = np.floor(r * 1e6 + 0.5).astype(np.int64)
            return pa.table({"node": b["node"],
                             "rank_e6": pa.array(e6, pa.int64())})

        return distributed_topk(
            ranks.map_batches(fixed, batch_format="pyarrow"), 20,
            [("rank_e6", "descending"), ("node", "ascending")])
    q["pagerank_order_part"] = pagerank_order_part

    def kmeans_embeddings(sf_dir):
        """Distributed Lloyd k-means (k=8, 2 assignment rounds) over the
        64-d embedding column: centroids broadcast once per round, each
        round ONE map-only pass emitting ≤k-row per-block partials
        (count + per-dim sums) merged driver-side — no shuffle. Init is
        the k smallest vec_ids (deterministic); ties to the lowest
        cluster. Output is the final round's centroids in LONG form
        (c, j, coord_e4, n_points) — fixed-point e4, 1-based dim j —
        computed by the identical Σ(x_j−c_j)² / mean expressions in the
        DuckDB twin's chained CTE rounds."""
        ds = fx.driver_table(sf_dir, "embeddings",
                             columns=["vec_id", "embedding"])
        C, counts = simsearch.kmeans_fit(ds, "embedding", "vec_id",
                                         k=8, n_iters=2)
        kk, d = C.shape
        e4 = np.floor(C * 1e4 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "c": np.repeat(np.arange(kk, dtype=np.int64), d),
            "j": np.tile(np.arange(1, d + 1, dtype=np.int64), kk),
            "coord_e4": e4.ravel(),
            "n_points": np.repeat(counts, d)})
    q["kmeans_embeddings"] = kmeans_embeddings

    def tpch_q13_order_distribution(sf_dir):
        """TPC-H Q13 shape — distribution of customers by order count,
        INCLUDING zero-order customers: per-customer counts (one
        groupby shuffle) are LEFT-attached back onto the customer
        dimension via broadcast_left_join (missing → 0), then the tiny
        second groupby histograms the counts."""
        from ..util import broadcast_left_join
        cust = fx.driver_table(sf_dir, "customer", columns=["c_custkey"])
        orders = fx.driver_table(sf_dir, "orders", columns=["o_custkey"])
        counts = orders.groupby("o_custkey").count() \
            .rename_columns({"o_custkey": "c_custkey", "count()": "c_count"})
        per_cust = broadcast_left_join(cust, counts, on="c_custkey")

        def fill0(b: pa.Table) -> pa.Table:
            c = pc.fill_null(b["c_count"], 0)
            return b.set_column(b.schema.get_field_index("c_count"),
                                "c_count", pc.cast(c, pa.int64()))

        return per_cust.map_batches(fill0, batch_format="pyarrow") \
            .groupby("c_count").count() \
            .rename_columns({"count()": "custdist"})
    q["tpch_q13_order_distribution"] = tpch_q13_order_distribution

    def tpch_q17_small_quantity_revenue(sf_dir):
        """TPC-H Q17 shape — the correlated scalar subquery
        ("l_quantity < 0.2 × that part's average quantity") as
        pre-aggregate + broadcast: the brand's ~1/25 of parts is
        broadcast as a semi-filter so 96% of lineitem never leaves the
        scan; per-part qty sums/counts (small) come back as a broadcast
        threshold map; revenue sums on-cluster in integer cents.
        Quantities are integer-valued floats so the per-part average is
        EXACT and the < comparison is engine-stable."""
        from ray.data.aggregate import Count, Sum
        from ..util import broadcast_inner_join
        import ray

        li = fx.driver_table(
            sf_dir, "lineitem",
            columns=["l_partkey", "l_quantity", "l_extendedprice"])
        parts = fx.driver_table(sf_dir, "part",
                                columns=["p_partkey", "p_brand"]) \
            .filter(expr="p_brand == 'Brand#23'").select_columns(["p_partkey"])
        # semi-filter: broadcast is_in when the brand's key set is small
        # (the common case — ~1/25 of part), distributed semi-join past the
        # cap (round-3 VERDICT: audit every TPC-H broadcast for a guard)
        if parts.count() <= 2_000_000:
            pk = pa.concat_tables(
                [t for t in ray.get(parts.to_arrow_refs())
                 if t.num_rows and t.num_columns])
            pk_ref = ray.put(pk["p_partkey"].combine_chunks())

            def semi(b: pa.Table) -> pa.Table:
                from ..util import _bcast_get
                return b.filter(pc.is_in(b["l_partkey"], _bcast_get(pk_ref)))

            brand_li = li.map_batches(semi, batch_format="pyarrow")
        else:
            from ..util import anti_semi_join
            brand_li = anti_semi_join(li, parts, on="l_partkey",
                                      keys_on="p_partkey", semi=True)
        brand_li = brand_li.materialize()
        stats = brand_li.groupby("l_partkey") \
            .aggregate(Sum("l_quantity"), Count()) \
            .rename_columns({"sum(l_quantity)": "sq", "count()": "cq"})

        def thresh(b: pa.Table) -> pa.Table:
            avg = b["sq"].to_numpy(zero_copy_only=False) \
                / b["cq"].to_numpy(zero_copy_only=False)
            return pa.table({"l_partkey": b["l_partkey"],
                             "lim": pa.array(0.2 * avg, pa.float64())})

        limited = broadcast_inner_join(
            brand_li, stats.map_batches(thresh, batch_format="pyarrow"),
            on="l_partkey")

        def cents(b: pa.Table) -> pa.Table:
            keep = pc.less(b["l_quantity"], b["lim"])
            ep = b.filter(keep)["l_extendedprice"] \
                .to_numpy(zero_copy_only=False)
            c = np.floor(ep * 100 + 0.5).astype(np.int64)
            return pa.table({"cents": pa.array(c, pa.int64())})

        agg = limited.map_batches(cents, batch_format="pyarrow") \
            .aggregate(Sum("cents"))
        total = 0 if agg is None else int(agg.get("sum(cents)") or 0)
        e4 = int(np.floor((total / 100.0) / 7.0 * 10000 + 0.5))
        return pd.DataFrame({"avg_yearly_e4": [e4]})
    q["tpch_q17_small_quantity_revenue"] = tpch_q17_small_quantity_revenue

    def tpch_q16_shape(sf_dir):
        """TPC-H Q16 shape (no partsupp table in this schema, so supplier
        counts come from lineitem): for filtered parts, EXACT
        COUNT(DISTINCT supplier) per (brand, type, size) via
        util.grouped_count_distinct — map-side tuple dedup combiner, one
        bounded-bucket shuffle, no driver-side value sets. The small
        filtered part table attaches via broadcast_inner_join."""
        from ..util import broadcast_inner_join, grouped_count_distinct
        part = fx.driver_table(sf_dir, "part",
                               columns=["p_partkey", "p_brand", "p_type",
                                        "p_size"])
        SIZES = [1, 9, 14, 19, 23, 36, 45, 49]

        def p_filt(b: pa.Table) -> pa.Table:
            m = pc.and_(pc.and_(pc.not_equal(b["p_brand"], "Brand#5"),
                                pc.not_equal(b["p_type"], "PROMO")),
                        pc.is_in(b["p_size"], value_set=pa.array(SIZES)))
            t = b.filter(m)
            return t.rename_columns(["l_partkey", "p_brand", "p_type",
                                     "p_size"])

        small = part.map_batches(p_filt, batch_format="pyarrow")
        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_partkey", "l_suppkey"])
        joined = broadcast_inner_join(li, small, on="l_partkey")
        return grouped_count_distinct(joined,
                                      ["p_brand", "p_type", "p_size"],
                                      "l_suppkey", out_col="n_supp")
    q["tpch_q16_shape"] = tpch_q16_shape

    def tpch_q19_disjunctive(sf_dir):
        """TPC-H Q19: disjunctive (brand × size-range × quantity-range)
        predicates across a part⋈lineitem join — part attributes broadcast
        once (sorted-key searchsorted), the disjunction evaluates
        map-side, and only an int-ten-thousandths revenue partial crosses
        the exchange (one Sum aggregate)."""
        from ray.data.aggregate import Sum
        from ..util import broadcast_inner_join
        # (brand, size_lo, size_hi, qty_lo, qty_hi) disjuncts
        arms = [("Brand#12", 1, 5, 1.0, 11.0),
                ("Brand#23", 1, 10, 10.0, 20.0),
                ("Brand#15", 20, 35, 20.0, 30.0)]
        arm_brand = {b: (slo, shi, qlo, qhi) for b, slo, shi, qlo, qhi in arms}
        arm_names = sorted(arm_brand)

        def arm_parts(b: pa.Table) -> pa.Table:
            # only the 3 arm brands' parts ever leave the part scan
            # (~1/8 of part) — inner-join semantics prune the rest here
            f = b.filter(pc.is_in(b["p_brand"],
                                  pa.array(arm_names, pa.string())))
            return pa.table({"l_partkey": f["p_partkey"],
                             "p_brand": f["p_brand"],
                             "p_size": f["p_size"]})

        def partial(b: pa.Table) -> pa.Table:
            qty = b["l_quantity"].to_numpy()
            br = b["p_brand"].to_numpy(zero_copy_only=False)
            sz = b["p_size"].to_numpy()
            keep = np.zeros(len(qty), bool)
            for bname, (slo, shi, qlo, qhi) in arm_brand.items():
                keep |= ((br == bname) & (sz >= slo) & (sz <= shi)
                         & (qty >= qlo) & (qty <= qhi))
            rev = (b["l_extendedprice"].to_numpy()[keep]
                   * (1.0 - b["l_discount"].to_numpy()[keep]))
            rev4 = np.floor(rev * 1e4 + 0.5).astype(np.int64)
            return pa.table({"rev4": pa.array([int(rev4.sum())], pa.int64()),
                             "n": pa.array([int(keep.sum())], pa.int64())})

        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_partkey", "l_quantity",
                                      "l_extendedprice", "l_discount"])
        pt = fx.driver_table(sf_dir, "part",
                             columns=["p_partkey", "p_brand", "p_size"]) \
               .map_batches(arm_parts, batch_format="pyarrow")
        # capped broadcast attach w/ hash-join fallback (round-3 VERDICT:
        # no unconditional driver pull of an SF-scaling table); per-row
        # int-e4 rounding keeps the sum association-proof on either path
        agg = broadcast_inner_join(li, pt, on="l_partkey") \
            .map_batches(partial, batch_format="pyarrow") \
            .aggregate(Sum("rev4"), Sum("n")) or {}
        rev4 = agg.get("sum(rev4)") or 0
        n = agg.get("sum(n)") or 0
        # revenue in exact integer ten-thousandths: immune to float-sum
        # association and to ROUND boundary cases on both engines
        return pd.DataFrame({"rev4": [int(rev4)], "n_lines": [int(n)]})
    q["tpch_q19_disjunctive"] = tpch_q19_disjunctive

    def tpch_q7_volume_shipping(sf_dir):
        """TPC-H Q7 shape: shipping volume between two nations by year
        and direction. Supplier→nation and customer→nation attach via
        ``broadcast_inner_join`` — capped at 2M rows with a hash-join
        fallback (round-3 VERDICT: the old unconditional driver pull of
        customer/supplier was a driver OOM at 100× SF). Only nation
        itself (spec-fixed 25 rows) is pulled driver-side. The one real
        exchange is the lineitem⋈orders hash join; revenue partials are
        int-e4."""
        from ray.data.aggregate import Sum
        from ..util import broadcast_inner_join
        NA, NB = "NATION_3", "NATION_7"

        _, nk_sorted, nname_sorted = _nation_sorted(sf_dir)
        sup_lut = _supplier_nation_lut(sf_dir, nk_sorted, nname_sorted)

        def cus_narrow(b: pa.Table) -> pa.Table:
            pos = np.searchsorted(nk_sorted, b["c_nationkey"].to_numpy())
            return pa.table({"o_custkey": b["c_custkey"],
                             "cust_nation": pa.array(nname_sorted[pos],
                                                     pa.string())})

        cus_lut = fx.driver_table(sf_dir, "customer",
                                  columns=["c_custkey", "c_nationkey"]) \
            .map_batches(cus_narrow, batch_format="pyarrow")

        def l_narrow(b: pa.Table) -> pa.Table:
            rev = (b["l_extendedprice"].to_numpy()
                   * (1.0 - b["l_discount"].to_numpy()))
            year = pd.to_datetime(
                b["l_shipdate"].cast(pa.int64()).to_numpy(), unit="us").year
            return pa.table({
                "o_orderkey": b["l_orderkey"],
                "l_suppkey": b["l_suppkey"],
                "l_year": pa.array(np.asarray(year), pa.int64()),
                "rev4": pa.array(np.floor(rev * 1e4 + 0.5).astype(np.int64)),
            })

        li = broadcast_inner_join(
            fx.driver_table(sf_dir, "lineitem",
                            columns=["l_orderkey", "l_suppkey", "l_shipdate",
                                     "l_extendedprice", "l_discount"])
              .map_batches(l_narrow, batch_format="pyarrow"),
            sup_lut, on="l_suppkey").drop_columns(["l_suppkey"])
        orders = broadcast_inner_join(
            fx.driver_table(sf_dir, "orders",
                            columns=["o_orderkey", "o_custkey"]),
            cus_lut, on="o_custkey").drop_columns(["o_custkey"])
        joined = li.join(orders, on=("o_orderkey",), join_type="inner",
                         **join_kwargs(fx.table_join_partitions(
                             sf_dir, "lineitem", "orders")))

        def keep_pair(b: pa.Table) -> pa.Table:
            s = b["supp_nation"].to_numpy(zero_copy_only=False)
            c = b["cust_nation"].to_numpy(zero_copy_only=False)
            m = ((s == NA) & (c == NB)) | ((s == NB) & (c == NA))
            f = b.filter(pa.array(m))
            df = pd.DataFrame({"supp_nation": f["supp_nation"].to_pylist(),
                               "cust_nation": f["cust_nation"].to_pylist(),
                               "l_year": f["l_year"].to_numpy(),
                               "rev4": f["rev4"].to_numpy()})
            g = df.groupby(["supp_nation", "cust_nation", "l_year"],
                           sort=False)["rev4"].sum().reset_index()
            # explicit types: an all-filtered block's object columns would
            # otherwise infer Arrow null and drift the groupby schema
            return pa.table({
                "supp_nation": pa.array(g["supp_nation"], pa.string()),
                "cust_nation": pa.array(g["cust_nation"], pa.string()),
                "l_year": pa.array(g["l_year"], pa.int64()),
                "rev4": pa.array(g["rev4"], pa.int64())})

        return joined.map_batches(keep_pair, batch_format="pyarrow") \
                     .groupby(["supp_nation", "cust_nation", "l_year"]) \
                     .aggregate(Sum("rev4", alias_name="rev4"))
    q["tpch_q7_volume_shipping"] = tpch_q7_volume_shipping

    def tpch_q12_shape(sf_dir):
        """TPC-H Q12 shape (no l_shipmode column, so priority stands in
        for shipmode): lineitem ⋈ orders hash join (size-aware
        partitions), late = shipped > 60 days after the order date,
        per-priority line counts via a CASE-style conditional partial
        pre-aggregated map-side before one tiny groupby."""
        from ray.data.aggregate import Sum
        LATE_US = 60 * 86_400_000_000

        def l_narrow(b: pa.Table) -> pa.Table:
            return pa.table({"o_orderkey": b["l_orderkey"],
                             "ship_us": b["l_shipdate"].cast(pa.int64())})

        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_orderkey", "l_shipdate"]) \
               .map_batches(l_narrow, batch_format="pyarrow")
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_orderpriority",
                                          "o_orderdate"])
        joined = li.join(orders, on=("o_orderkey",), join_type="inner",
                         **join_kwargs(fx.table_join_partitions(
                             sf_dir, "lineitem", "orders")))

        def pre(b: pa.Table) -> pa.Table:
            ship = b["ship_us"].to_numpy()
            odate = b["o_orderdate"].cast(pa.int64()).to_numpy()
            late = (ship > odate + LATE_US).astype(np.int64)
            df = pd.DataFrame({"o_orderpriority":
                               b["o_orderpriority"].to_pylist(),
                               "late": late})
            g = df.groupby("o_orderpriority", sort=False)["late"] \
                  .agg(["count", "sum"]).reset_index()
            return pa.table({"o_orderpriority": pa.array(g["o_orderpriority"]),
                             "n_lines": pa.array(g["count"], pa.int64()),
                             "n_late": pa.array(g["sum"], pa.int64())})

        return joined.map_batches(pre, batch_format="pyarrow") \
                     .groupby("o_orderpriority") \
                     .aggregate(Sum("n_lines", alias_name="n_lines"),
                                Sum("n_late", alias_name="n_late"))
    q["tpch_q12_shape"] = tpch_q12_shape

    def ssjoin_prefix_pairs(sf_dir):
        """EXACT set-similarity join via prefix filtering (AllPairs /
        PPJoin family) at τ=0.7 — deterministic exhaustiveness by
        construction (vs jaccard_doc_pairs' probabilistic LSH at
        τ=0.8): docs sharing a rarest-first prefix shingle meet in one
        bucketed shuffle and verify exact shingle Jaccard. The twin
        computes the same Jaccard over ALL pairs, so the check pins
        that prefix filtering lost no pair."""
        ds = fx.read_fixture(sf_dir, "docs_dup", columns=["doc_id", "text"])
        out = dedup.prefix_filtered_pairs(ds, "doc_id", "text", tau=0.7)

        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                "id_a": b["id_a"], "id_b": b["id_b"],
                "jaccard": pc.round(b["jaccard"], ndigits=6)})
        return out.map_batches(f, batch_format="pyarrow")
    q["ssjoin_prefix_pairs"] = ssjoin_prefix_pairs

    def lancelike_merge_upsert_check(sf_dir):
        """Copy-on-write MERGE into the lancelike store, value-pinned:
        base = orders; update batch doubles o_totalprice (exact float
        ×2) and stamps priority for keys %7==0, inserts NEW keys
        (+1e8) for %13==0; the merged store is read back and
        aggregated. The twin computes the same NOT IN ∪ updates merge
        relationally — pinning replace, insert, and carry-over
        semantics in one check. Untouched fragments are carried by
        manifest reference (no rewrite I/O)."""
        import shutil

        from ray.data.aggregate import Count, Sum
        from ..sources import lancelike

        tag = os.path.basename(os.path.normpath(sf_dir))
        root = f"/tmp/graft_merge/{tag}"
        shutil.rmtree(root, ignore_errors=True)
        orders = fx.driver_table(sf_dir, "orders")
        lancelike.write_dataset(orders, root, stage="base", resume=False)

        upd = orders.map_batches(_orders_merge_update,
                                 batch_format="pyarrow")
        lancelike.merge_upsert(upd, root, "o_orderkey", stage="merge1")

        merged = lancelike.read_dataset(
            root, columns=["o_orderpriority", "o_totalprice"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(b["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
            return pa.table({"o_orderpriority": b["o_orderpriority"],
                             "cents": pa.array(c, pa.int64())})

        return merged.map_batches(cents, batch_format="pyarrow") \
            .groupby("o_orderpriority").aggregate(Count(), Sum("cents")) \
            .rename_columns({"count()": "n", "sum(cents)": "cents"})
    q["lancelike_merge_upsert_check"] = lancelike_merge_upsert_check

    def lancelike_merge_upsert_mor_check(sf_dir):
        """Merge-on-READ upsert, value-pinned against the SAME relational
        twin as the copy-on-write check (identical update batch, so the
        two verbs are pinned result-equivalent): the update stream
        commits as new fragments + a sequence-scoped tombstone with ZERO
        existing-fragment I/O; the store is aggregated once THROUGH the
        pending tombstone (scan-time anti-join, scoped so the
        re-inserted rows survive) and once after ``apply_tombstones``
        materializes the mask — both must match the oracle, and each
        other."""
        import shutil

        from ray.data.aggregate import Count, Sum
        from ..sources import lancelike

        tag = os.path.basename(os.path.normpath(sf_dir))
        root = f"/tmp/graft_merge_mor/{tag}"
        shutil.rmtree(root, ignore_errors=True)
        orders = fx.driver_table(sf_dir, "orders")
        lancelike.write_dataset(orders, root, stage="base", resume=False)

        upd = orders.map_batches(_orders_merge_update,
                                 batch_format="pyarrow")
        man = lancelike.merge_upsert_mor(upd, root, "o_orderkey",
                                         stage="mor_merge")
        assert man["metrics"]["new_fragments"] >= 1, man["metrics"]
        assert man.get("tombstones"), "MoR upsert must commit a tombstone"

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(b["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
            return pa.table({"o_orderpriority": b["o_orderpriority"],
                             "cents": pa.array(c, pa.int64())})

        def agg(ds):
            return ds.map_batches(cents, batch_format="pyarrow") \
                .groupby("o_orderpriority") \
                .aggregate(Count(), Sum("cents")) \
                .rename_columns({"count()": "n", "sum(cents)": "cents"})

        mor = agg(lancelike.read_dataset(
            root, columns=["o_orderpriority", "o_totalprice"])).take_all()
        man2 = lancelike.apply_tombstones(root, stage="materialize")
        assert not man2.get("tombstones")
        applied = agg(lancelike.read_dataset(
            root, columns=["o_orderpriority", "o_totalprice"]))
        got = {r["o_orderpriority"]: (r["n"], r["cents"])
               for r in mor}
        out = applied.take_all()
        assert {r["o_orderpriority"]: (r["n"], r["cents"])
                for r in out} == got, \
            "tombstone-scan vs materialized read diverged"
        import ray.data as rd
        return rd.from_items(out)
    q["lancelike_merge_upsert_mor_check"] = lancelike_merge_upsert_mor_check

    def bigram_pmi_top(sf_dir):
        """Collocation mining: top-20 adjacent-token bigrams by PMI
        (ln(c_ab·T / (c_a·c_b)), T = total bigrams, count ≥ 5).
        Combiner-pre-aggregated bigram + unigram count shuffles;
        unigram counts come back as a broadcast LUT attached twice
        map-side; T is an on-cluster Sum. Fixed-point e4 with ordering
        on the rounded integer (ties by words) on both sides."""
        from collections import Counter

        from ray.data.aggregate import Sum
        from ..functions import text
        from ..util import broadcast_inner_join

        ds = fx.driver_table(sf_dir, "documents", columns=["text"])

        def pairs(b: pa.Table) -> pa.Table:
            cb: Counter = Counter()
            for t in b["text"].to_pylist():
                toks = text.WS_RE.findall(t)
                cb.update(zip(toks, toks[1:]))
            w1, w2 = zip(*cb.keys()) if cb else ((), ())
            return pa.table({"w1": pa.array(list(w1), pa.string()),
                             "w2": pa.array(list(w2), pa.string()),
                             "c": pa.array(list(cb.values()), pa.int64())})

        def unis(b: pa.Table) -> pa.Table:
            cu: Counter = Counter()
            for t in b["text"].to_pylist():
                cu.update(text.WS_RE.findall(t))
            return pa.table({"w": pa.array(list(cu.keys()), pa.string()),
                             "c": pa.array(list(cu.values()), pa.int64())})

        bg = ds.map_batches(pairs, batch_format="pyarrow") \
            .groupby(["w1", "w2"]).sum("c") \
            .rename_columns({"sum(c)": "cab"}).materialize()
        uni = ds.map_batches(unis, batch_format="pyarrow") \
            .groupby("w").sum("c").rename_columns({"sum(c)": "cu"}) \
            .materialize()
        agg = bg.aggregate(Sum("cab"))
        t_total = int(agg.get("sum(cab)") or 0)

        freq = bg.filter(expr="cab >= 5")
        freq = broadcast_inner_join(
            freq, uni.rename_columns({"w": "w1", "cu": "c1"}), on="w1")
        freq = broadcast_inner_join(
            freq, uni.rename_columns({"w": "w2", "cu": "c2"}), on="w2")

        def score(b: pa.Table) -> pa.Table:
            cab = b["cab"].to_numpy(zero_copy_only=False).astype(np.float64)
            c1 = b["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
            c2 = b["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
            pmi = np.log(cab) + np.log(float(t_total)) \
                - np.log(c1) - np.log(c2)
            e4 = np.floor(pmi * 1e4 + 0.5).astype(np.int64)
            return pa.table({"w1": b["w1"], "w2": b["w2"],
                             "cab": b["cab"],
                             "pmi_e4": pa.array(e4, pa.int64())})

        return distributed_topk(
            freq.map_batches(score, batch_format="pyarrow"), 20,
            [("pmi_e4", "descending"), ("w1", "ascending"),
             ("w2", "ascending")])
    q["bigram_pmi_top"] = bigram_pmi_top

    def ncm_confusion(sf_dir):
        """Embedding-quality evaluation by nearest-class-mean: class
        prototypes (per-label vector means — one map-only pass with
        label-sized per-block partials merged driver-side) are
        broadcast once and every vector assigns to its nearest
        prototype (explicit Σ(x_j−c_j)², ties to the lowest label) in a
        second map-only pass; the (label, pred) confusion matrix
        reduces through one tiny groupby. Same float expressions in
        the twin's lateral-UNNEST CTEs."""
        ds = fx.driver_table(sf_dir, "embeddings",
                             columns=["embedding", "label"])
        return simsearch.nearest_class_mean_confusion(
            ds, "embedding", "label")
    q["ncm_confusion"] = ncm_confusion

    def simplify_ways_dp(sf_dir):
        """Douglas-Peucker polyline simplification (ε=0.05°) over the
        resolved way geometries: nodes broadcast onto way_nodes
        map-side, one bucketed shuffle groups each way, and the
        iterative DP kernel keeps the indices whose squared cross
        product exceeds ε²·|AB|² (division-free — the twin's recursive
        CTE branches on the identical doubles; argmax ties to the
        lowest index). Output (way_id, idx) of KEPT points."""
        from ..functions.geo import dp_simplify_indices
        from ..util import broadcast_inner_join, bucketed_group_apply

        wn = fx.read_fixture(sf_dir, "way_nodes")
        nodes = fx.read_fixture(sf_dir, "nodes",
                                columns=["id", "lon", "lat"]) \
            .rename_columns({"id": "node_id"})
        pts = broadcast_inner_join(wn, nodes, on="node_id")

        def simplify(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["way_id", "position"], kind="mergesort")
            out_w, out_i = [], []
            for wid, grp in g.groupby("way_id", sort=False):
                idx = dp_simplify_indices(grp["lon"].to_numpy(),
                                          grp["lat"].to_numpy(), eps=0.05)
                out_w.extend([wid] * len(idx))
                out_i.extend(idx.tolist())
            return pd.DataFrame({
                "way_id": pd.Series(out_w, dtype=g["way_id"].dtype),
                "idx": pd.Series(out_i, dtype=np.int64)})

        return bucketed_group_apply(pts, ["way_id"], simplify,
                                    n_buckets=64)
    q["simplify_ways_dp"] = simplify_ways_dp

    def street_typo_pairs(sf_dir):
        """Fuzzy street-name matching (the wrangling theme's typo
        clustering): all pairs of DISTINCT street spellings within edit
        distance 1, via deletion-neighborhood signatures (FastSS /
        SymSpell — exhaustive for k=1 by pigeonhole) grouped in one
        bucketed shuffle and verified with the exact two-pointer check.
        The twin brute-forces levenshtein(a,b) <= 1 over all pairs."""
        streets = fx.read_fixture(sf_dir, "tags",
                                  columns=["key", "value"]) \
            .filter(expr="key == 'addr:street'") \
            .groupby("value").count().select_columns(["value"])
        return dedup.ed1_pairs(streets, "value")
    q["street_typo_pairs"] = street_typo_pairs

    def parts_skyline(sf_dir):
        """Distributed skyline (Pareto frontier): parts not dominated on
        (price low, size high). Two phases: each block drops its
        locally-dominated rows (the global skyline is a subset of the
        union of local skylines), one exact pass over the tiny union.
        Comparisons only — no arithmetic, engine-exact."""
        from ..util import skyline
        parts = fx.driver_table(
            sf_dir, "part", columns=["p_partkey", "p_retailprice", "p_size"])
        return skyline(parts, min_cols=["p_retailprice"],
                       max_cols=["p_size"])
    q["parts_skyline"] = parts_skyline

    # ------------- TPC-H completion: the six shapes whose canonical form
    # needs PARTSUPP / commit+receipt dates (absent from the driver
    # schema) — each ADAPTED to the available columns with the decisive
    # distributed machinery intact and documented per query. With these
    # the full 22-query suite is covered (Q1 = agg_lineitem_pricing).

    def tpch_q2_min_cost_supplier(sf_dir):
        """TPC-H Q2 shape (correlated MIN subquery → per-group top-1):
        adapted — part↔supplier pairs come from DISTINCT lineitem
        (partkey, suppkey) since PARTSUPP doesn't exist, and "min cost"
        is min s_acctbal. The correlated `= (SELECT min(..))` becomes
        grouped_topk(k=1) with a total order (bal2, suppkey): no per-row
        probe, one bounded shuffle. Part keys and the region-filtered
        supplier attrs attach via capped broadcast (hash-join fallback)."""
        from ..util import broadcast_inner_join, grouped_topk

        nat, nk_sorted, nname_sorted = _nation_sorted(sf_dir)
        reg = fx.driver_table(sf_dir, "region").to_pandas()
        rk = set(reg[reg["r_name"] == "ASIA"]["r_regionkey"])
        in_region = np.isin(nk_sorted,
                            nat[nat["n_regionkey"].isin(rk)]
                            ["n_nationkey"].to_numpy())

        def part_keys(b: pa.Table) -> pa.Table:
            m = pc.and_(pc.equal(b["p_type"], "STANDARD"),
                        pc.less_equal(b["p_size"], 10))
            return pa.table({"l_partkey": b.filter(m)["p_partkey"]})

        pt = fx.driver_table(sf_dir, "part",
                             columns=["p_partkey", "p_type", "p_size"]) \
            .map_batches(part_keys, batch_format="pyarrow")

        def sup_attrs(b: pa.Table) -> pa.Table:
            pos = np.searchsorted(nk_sorted, b["s_nationkey"].to_numpy())
            f = b.filter(pa.array(in_region[pos]))
            pos = np.searchsorted(nk_sorted, f["s_nationkey"].to_numpy())
            bal2 = np.floor(f["s_acctbal"].to_numpy() * 100 + 0.5)
            return pa.table({
                "l_suppkey": f["s_suppkey"], "s_name": f["s_name"],
                "n_name": pa.array(nname_sorted[pos], pa.string()),
                "bal2": pa.array(bal2.astype(np.int64), pa.int64())})

        sup = fx.driver_table(sf_dir, "supplier",
                              columns=["s_suppkey", "s_name", "s_nationkey",
                                       "s_acctbal"]) \
            .map_batches(sup_attrs, batch_format="pyarrow")

        pairs = fx.driver_table(sf_dir, "lineitem",
                                columns=["l_partkey", "l_suppkey"]) \
            .groupby(["l_partkey", "l_suppkey"]).count() \
            .select_columns(["l_partkey", "l_suppkey"])
        cand = broadcast_inner_join(pairs, pt, on="l_partkey")
        cand = broadcast_inner_join(cand, sup, on="l_suppkey")
        best = grouped_topk(cand, ["l_partkey"], 1,
                            [("bal2", "asc"), ("l_suppkey", "asc")])
        out = distributed_topk(best, 100, [("bal2", "descending"),
                                           ("l_partkey", "ascending")])
        out = out.rename(columns={"l_partkey": "p_partkey",
                                  "l_suppkey": "s_suppkey"})
        return out[["p_partkey", "s_suppkey", "s_name", "n_name", "bal2"]]
    q["tpch_q2_min_cost_supplier"] = tpch_q2_min_cost_supplier

    def tpch_q9_profit_shape(sf_dir):
        """TPC-H Q9 shape (product-type profit by nation × year):
        adapted — supply cost is p_retailprice·qty/10 (no PARTSUPP).
        amount is exact int e4 per row (rev4 − retail3·qty), so the
        nation×year sums are association-proof. Narrow part-cost LUT and
        supplier→nation ride capped broadcasts; the one big exchange is
        lineitem⋈orders for the year."""
        from ray.data.aggregate import Sum
        from ..util import broadcast_inner_join

        nat, nk_sorted, nname_sorted = _nation_sorted(sf_dir)
        sup_lut = _supplier_nation_lut(sf_dir, nk_sorted, nname_sorted)

        def part_cost(b: pa.Table) -> pa.Table:
            f = b.filter(pc.match_substring(b["p_name"], "red"))
            r3 = np.floor(f["p_retailprice"].to_numpy() * 1e3 + 0.5)
            return pa.table({"l_partkey": f["p_partkey"],
                             "retail3": pa.array(r3.astype(np.int64),
                                                 pa.int64())})

        pt = fx.driver_table(sf_dir, "part",
                             columns=["p_partkey", "p_name",
                                      "p_retailprice"]) \
            .map_batches(part_cost, batch_format="pyarrow")

        def l_narrow(b: pa.Table) -> pa.Table:
            rev = (b["l_extendedprice"].to_numpy()
                   * (1.0 - b["l_discount"].to_numpy()))
            return pa.table({
                "l_orderkey": b["l_orderkey"],
                "l_partkey": b["l_partkey"],
                "l_suppkey": b["l_suppkey"],
                "qty": pa.array(b["l_quantity"].to_numpy().astype(np.int64),
                                pa.int64()),
                "rev4": pa.array(np.floor(rev * 1e4 + 0.5).astype(np.int64),
                                 pa.int64())})

        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_orderkey", "l_partkey", "l_suppkey",
                                      "l_quantity", "l_extendedprice",
                                      "l_discount"]) \
            .map_batches(l_narrow, batch_format="pyarrow")
        li = broadcast_inner_join(li, pt, on="l_partkey") \
            .drop_columns(["l_partkey"])
        li = broadcast_inner_join(li, sup_lut, on="l_suppkey") \
            .drop_columns(["l_suppkey"])

        def o_year(b: pa.Table) -> pa.Table:
            year = pd.to_datetime(
                b["o_orderdate"].cast(pa.int64()).to_numpy(), unit="us").year
            return pa.table({"l_orderkey": b["o_orderkey"],
                             "o_year": pa.array(np.asarray(year),
                                                pa.int64())})

        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_orderdate"]) \
            .map_batches(o_year, batch_format="pyarrow")
        joined = li.join(orders, on=("l_orderkey",), join_type="inner",
                         **join_kwargs(fx.table_join_partitions(
                             sf_dir, "lineitem", "orders")))

        def amount(b: pa.Table) -> pa.Table:
            amt = (b["rev4"].to_numpy()
                   - b["retail3"].to_numpy() * b["qty"].to_numpy())
            return pa.table({"n_name": b["supp_nation"],
                             "o_year": b["o_year"],
                             "amount4": pa.array(amt, pa.int64())})

        return joined.map_batches(amount, batch_format="pyarrow") \
            .groupby(["n_name", "o_year"]) \
            .aggregate(Sum("amount4", alias_name="profit4"))
    q["tpch_q9_profit_shape"] = tpch_q9_profit_shape

    def tpch_q11_important_parts(sf_dir):
        """TPC-H Q11 shape (global scalar subquery + HAVING): part
        revenue share over lineitem (no PARTSUPP). Per-part exact-int
        revenue via one hash agg; the global total is a single on-cluster
        Sum (one scalar to the driver — Q11's `> SUM(..)·fraction`
        correlate); the HAVING filter runs map-side against that
        broadcast scalar. Threshold: share > 1/2000 (integer
        cross-multiplication, no float division)."""
        from ray.data.aggregate import Sum

        def pre(b: pa.Table) -> pa.Table:
            rev = (b["l_extendedprice"].to_numpy()
                   * (1.0 - b["l_discount"].to_numpy()))
            return pa.table({
                "p_partkey": b["l_partkey"],
                "rev4": pa.array(np.floor(rev * 1e4 + 0.5).astype(np.int64),
                                 pa.int64())})

        v = fx.driver_table(sf_dir, "lineitem",
                            columns=["l_partkey", "l_extendedprice",
                                     "l_discount"]) \
            .map_batches(pre, batch_format="pyarrow") \
            .groupby("p_partkey").aggregate(Sum("rev4", alias_name="val4"))
        agg = v.aggregate(Sum("val4"))
        tot = int(agg.get("sum(val4)") or 0)

        def having(b: pa.Table) -> pa.Table:
            keep = b["val4"].to_numpy() * 2000 > tot
            return b.filter(pa.array(keep))

        return v.map_batches(having, batch_format="pyarrow")
    q["tpch_q11_important_parts"] = tpch_q11_important_parts

    def tpch_q15_top_supplier(sf_dir):
        """TPC-H Q15 (top supplier = revenue view + MAX correlate): the
        view is a per-supplier exact-int hash agg over a 3-month shipdate
        window (map-side prune); the `= (SELECT max(..))` correlate is a
        single on-cluster Max scalar, applied as a map-side filter —
        exact ints make revenue ties and the max equality deterministic.
        Names attach by streaming supplier past the tiny winner set."""
        from ray.data.aggregate import Max, Sum
        from ..util import broadcast_inner_join
        lo = pd.Timestamp("1996-01-01").value // 1000
        hi = pd.Timestamp("1996-04-01").value // 1000

        def pre(b: pa.Table) -> pa.Table:
            ship = pc.cast(b["l_shipdate"], pa.int64()).to_numpy()
            f = b.filter(pa.array((ship >= lo) & (ship < hi)))
            rev = (f["l_extendedprice"].to_numpy()
                   * (1.0 - f["l_discount"].to_numpy()))
            return pa.table({
                "s_suppkey": f["l_suppkey"],
                "rev4": pa.array(np.floor(rev * 1e4 + 0.5).astype(np.int64),
                                 pa.int64())})

        rev = fx.driver_table(sf_dir, "lineitem",
                              columns=["l_suppkey", "l_shipdate",
                                       "l_extendedprice", "l_discount"]) \
            .map_batches(pre, batch_format="pyarrow") \
            .groupby("s_suppkey").aggregate(Sum("rev4",
                                                alias_name="total_rev4"))
        mx = int(rev.aggregate(Max("total_rev4")).get("max(total_rev4)"))

        def is_max(b: pa.Table) -> pa.Table:
            return b.filter(pa.array(b["total_rev4"].to_numpy() == mx))

        best = rev.map_batches(is_max, batch_format="pyarrow")
        sup = fx.driver_table(sf_dir, "supplier",
                              columns=["s_suppkey", "s_name"])
        out = broadcast_inner_join(sup, best, on="s_suppkey").to_pandas()
        return out[["s_suppkey", "s_name", "total_rev4"]] \
            .sort_values("s_suppkey", ignore_index=True)
    q["tpch_q15_top_supplier"] = tpch_q15_top_supplier

    def tpch_q20_excess_share(sf_dir):
        """TPC-H Q20 shape (nested aggregate-vs-aggregate subquery):
        adapted — `ps_availqty > ½·SUM(shipped)` becomes "supplier ships
        > ⅛ of a part's total quantity" (no PARTSUPP). Two chained hash
        aggs — (part,supp) then part — joined back on the part key
        (aggregate self-join, not a correlated probe), integer
        cross-multiplied filter, DISTINCT suppliers, then the ASIA
        region supplier attrs attach via capped broadcast."""
        from ray.data.aggregate import Sum
        from ..util import broadcast_inner_join

        nat, nk_sorted, nname_sorted = _nation_sorted(sf_dir)
        reg = fx.driver_table(sf_dir, "region").to_pandas()
        rk = set(reg[reg["r_name"] == "ASIA"]["r_regionkey"])
        in_region = np.isin(nk_sorted,
                            nat[nat["n_regionkey"].isin(rk)]
                            ["n_nationkey"].to_numpy())

        def pre(b: pa.Table) -> pa.Table:
            q2 = np.floor(b["l_quantity"].to_numpy() * 100 + 0.5)
            return pa.table({"l_partkey": b["l_partkey"],
                             "l_suppkey": b["l_suppkey"],
                             "qty2": pa.array(q2.astype(np.int64),
                                              pa.int64())})

        ps = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_partkey", "l_suppkey",
                                      "l_quantity"]) \
            .map_batches(pre, batch_format="pyarrow") \
            .groupby(["l_partkey", "l_suppkey"]) \
            .aggregate(Sum("qty2", alias_name="q2"))
        pt = ps.groupby("l_partkey").aggregate(Sum("q2", alias_name="tot2"))
        j = ps.join(pt, on=("l_partkey",), join_type="inner",
                    **join_kwargs(fx.table_join_partitions(sf_dir,
                                                           "lineitem")))

        def share(b: pa.Table) -> pa.Table:
            keep = b["q2"].to_numpy() * 8 > b["tot2"].to_numpy()
            return pa.table({"l_suppkey": b.filter(pa.array(keep))
                             ["l_suppkey"]})

        supp_keys = j.map_batches(share, batch_format="pyarrow") \
            .groupby("l_suppkey").count().select_columns(["l_suppkey"])

        def sup_attrs(b: pa.Table) -> pa.Table:
            pos = np.searchsorted(nk_sorted, b["s_nationkey"].to_numpy())
            f = b.filter(pa.array(in_region[pos]))
            pos = np.searchsorted(nk_sorted, f["s_nationkey"].to_numpy())
            return pa.table({
                "l_suppkey": f["s_suppkey"], "s_name": f["s_name"],
                "n_name": pa.array(nname_sorted[pos], pa.string())})

        sup = fx.driver_table(sf_dir, "supplier",
                              columns=["s_suppkey", "s_name",
                                       "s_nationkey"]) \
            .map_batches(sup_attrs, batch_format="pyarrow")
        out = broadcast_inner_join(supp_keys, sup, on="l_suppkey") \
            .to_pandas().rename(columns={"l_suppkey": "s_suppkey"})
        return out[["s_suppkey", "s_name", "n_name"]]
    q["tpch_q20_excess_share"] = tpch_q20_excess_share

    def tpch_q21_waiting_suppliers(sf_dir):
        """TPC-H Q21 shape (EXISTS + NOT EXISTS over the same order):
        adapted — "late" is l_shipdate > o_orderdate + 75 days (no
        commit/receipt dates). The double correlate collapses into
        per-order aggregates: distinct (order,supp,any-late) rows, then
        ns (suppliers) / nl (late suppliers) per order; qualifying
        orders (ns≥2 ∧ nl=1) semi-join back the late pairs — so the only
        wide exchanges are two hash aggs, one lineitem⋈orders join and
        one capped broadcast semi-join. Exact-int day arithmetic."""
        from ray.data.aggregate import Count, Max, Sum
        from ..util import broadcast_inner_join
        LATE_US = 75 * 86400 * 1_000_000

        def o_narrow(b: pa.Table) -> pa.Table:
            return pa.table({"l_orderkey": b["o_orderkey"],
                             "od_us": pc.cast(b["o_orderdate"], pa.int64())})

        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_orderdate"]) \
            .map_batches(o_narrow, batch_format="pyarrow")

        def l_narrow(b: pa.Table) -> pa.Table:
            return pa.table({"l_orderkey": b["l_orderkey"],
                             "l_suppkey": b["l_suppkey"],
                             "ship_us": pc.cast(b["l_shipdate"],
                                                pa.int64())})

        li = fx.driver_table(sf_dir, "lineitem",
                             columns=["l_orderkey", "l_suppkey",
                                      "l_shipdate"]) \
            .map_batches(l_narrow, batch_format="pyarrow")
        j = li.join(orders, on=("l_orderkey",), join_type="inner",
                    **join_kwargs(fx.table_join_partitions(
                        sf_dir, "lineitem", "orders")))

        def late_flag(b: pa.Table) -> pa.Table:
            late = (b["ship_us"].to_numpy() - b["od_us"].to_numpy()
                    > LATE_US)
            return pa.table({"l_orderkey": b["l_orderkey"],
                             "l_suppkey": b["l_suppkey"],
                             "late": pa.array(late.astype(np.int64),
                                              pa.int64())})

        osl = j.map_batches(late_flag, batch_format="pyarrow") \
            .groupby(["l_orderkey", "l_suppkey"]) \
            .aggregate(Max("late", alias_name="slate"))
        per = osl.groupby("l_orderkey") \
            .aggregate(Count(alias_name="ns"), Sum("slate", alias_name="nl"))

        def qualifying(b: pa.Table) -> pa.Table:
            keep = (b["ns"].to_numpy() >= 2) & (b["nl"].to_numpy() == 1)
            return pa.table({"l_orderkey": b.filter(pa.array(keep))
                             ["l_orderkey"]})

        qual = per.map_batches(qualifying, batch_format="pyarrow")

        def late_pairs(b: pa.Table) -> pa.Table:
            f = b.filter(pa.array(b["slate"].to_numpy() == 1))
            return pa.table({"l_orderkey": f["l_orderkey"],
                             "l_suppkey": f["l_suppkey"]})

        hit = broadcast_inner_join(
            osl.map_batches(late_pairs, batch_format="pyarrow"),
            qual, on="l_orderkey")
        cnt = hit.groupby("l_suppkey").count() \
            .rename_columns({"count()": "numwait"})
        top = distributed_topk(cnt, 10, [("numwait", "descending"),
                                         ("l_suppkey", "ascending")])
        import ray.data as rd
        top_ds = rd.from_pandas(
            top.rename(columns={"l_suppkey": "s_suppkey"}))
        sup = fx.driver_table(sf_dir, "supplier",
                              columns=["s_suppkey", "s_name"])
        out = broadcast_inner_join(sup, top_ds, on="s_suppkey").to_pandas()
        return out[["s_suppkey", "s_name", "numwait"]] \
            .sort_values(["numwait", "s_suppkey"],
                         ascending=[False, True], ignore_index=True)
    q["tpch_q21_waiting_suppliers"] = tpch_q21_waiting_suppliers

    # ------------- spatial clustering + flood-fill (geospatial tier)

    def _cell_counts(sf_dir, res: int):
        """geo points → (key, cnt) per occupied grid cell at ``res``
        (key = qx·2^res + qy; map-side np.unique combiner, one hash agg)."""
        from ray.data.aggregate import Sum
        n = np.int64(1) << np.int64(res)

        def quant(b: pa.Table) -> pa.Table:
            qx, qy = geo.cell_xy(b["lon"].to_numpy(), b["lat"].to_numpy(),
                                 res)
            uniq, cnt = np.unique(qx * n + qy, return_counts=True)
            return pa.table({"key": pa.array(uniq, pa.int64()),
                             "cnt": pa.array(cnt.astype(np.int64),
                                             pa.int64())})

        return fx.read_fixture(sf_dir, "geo", columns=["lon", "lat"]) \
            .map_batches(quant, batch_format="pyarrow") \
            .groupby("key").aggregate(Sum("cnt", alias_name="cnt"))

    def _neighbor_edges(cells, res: int):
        """Directed 8-adjacency edges among the given cells: each cell
        explodes to its ≤8 in-range neighbor keys (map-side), then one
        distributed semi-join keeps only neighbors that exist — edge
        rows are bounded by 8·cells, never cells²."""
        from ..util import anti_semi_join
        n = np.int64(1) << np.int64(res)

        def nbrs(b: pa.Table) -> pa.Table:
            key = b["key"].to_numpy()
            qx, qy = key // n, key % n
            srcs, dsts = [], []
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    ax, ay = qx + dx, qy + dy
                    m = (ax >= 0) & (ax < n) & (ay >= 0) & (ay < n)
                    srcs.append(key[m])
                    dsts.append(ax[m] * n + ay[m])
            return pa.table({
                "src": pa.array(np.concatenate(srcs) if srcs
                                else np.empty(0, np.int64), pa.int64()),
                "dst": pa.array(np.concatenate(dsts) if dsts
                                else np.empty(0, np.int64), pa.int64())})

        cand = cells.map_batches(nbrs, batch_format="pyarrow")
        return anti_semi_join(cand, cells.select_columns(["key"]),
                              on="dst", keys_on="key", semi=True)

    def _dbscan_core_labeled(sf_dir):
        """Shared DBSCAN label stage → Dataset (key, cnt, cluster_id):
        cells with ≥ minpts points are core; cluster_id is the min cell
        key of the cell's 8-connected component. All exchanges are
        cell-bounded: map-side count combiner, neighbor explode +
        semi-join for edges, and the production
        ``connected_components_pairs`` (union-find ≤ cap, min-label
        beyond) for labels — points never cross a shuffle."""
        from ..stages import dedup as dd
        from ..util import broadcast_inner_join
        res, minpts = DBSCAN_RES, DBSCAN_MINPTS

        cells = _cell_counts(sf_dir, res)

        def is_core(b: pa.Table) -> pa.Table:
            return b.filter(pa.array(b["cnt"].to_numpy() >= minpts))

        core = cells.map_batches(is_core, batch_format="pyarrow") \
            .materialize()

        def to_pairs(b: pa.Table) -> pa.Table:
            # semi-join output blocks are pandas; re-type via pyarrow
            # batch_format (rename_columns/Project needs arrow blocks)
            return pa.table({"id_a": b["src"], "id_b": b["dst"]})

        edges = _neighbor_edges(core, res) \
            .map_batches(to_pairs, batch_format="pyarrow")

        def self_loops(b: pa.Table) -> pa.Table:
            return pa.table({"id_a": b["key"], "id_b": b["key"]})

        # self-loops make isolated core cells CC-incident → every core
        # cell gets a label
        labels = dd.connected_components_pairs(
            edges.union(core.map_batches(self_loops,
                                         batch_format="pyarrow")))
        lab = labels.rename_columns({"id": "key", "label": "cluster_id"})
        return broadcast_inner_join(core, lab, on="key")

    def grid_dbscan_clusters(sf_dir):
        """Grid DBSCAN (density-based spatial clustering, the GDBSCAN /
        raster variant) — one row per cluster (id = min cell key) with
        exact-int extent and population; the twin recomputes labels
        with a recursive-CTE transitive closure over the same
        quantization. Label stage shared in ``_dbscan_core_labeled``."""
        from ray.data.aggregate import Count, Max, Min, Sum
        n = np.int64(1) << np.int64(DBSCAN_RES)

        joined = _dbscan_core_labeled(sf_dir)

        def extent(b: pa.Table) -> pa.Table:
            key = b["key"].to_numpy()
            return pa.table({"cluster_id": b["cluster_id"],
                             "cnt": b["cnt"],
                             "qx": pa.array(key // n, pa.int64()),
                             "qy": pa.array(key % n, pa.int64())})

        return joined.map_batches(extent, batch_format="pyarrow") \
            .groupby("cluster_id") \
            .aggregate(Count(alias_name="n_cells"),
                       Sum("cnt", alias_name="n_points"),
                       Min("qx", alias_name="qx_min"),
                       Max("qx", alias_name="qx_max"),
                       Min("qy", alias_name="qy_min"),
                       Max("qy", alias_name="qy_max"))
    q["grid_dbscan_clusters"] = grid_dbscan_clusters

    def cell_hop_distance(sf_dir):
        """Grid flood-fill (cost-distance): BFS hop count from the
        densest occupied cell (ties → min key) to every reachable
        occupied cell through 8-adjacency — the raster cost-distance /
        service-area primitive. Seed via distributed top-1; frontier
        expansion in ``graph.bfs_hops`` (per-round exchanges bounded by
        the frontier's out-edges); unreachable cells emit no row, which
        the twin's bounded recursive CTE reproduces exactly."""
        import ray.data as rd
        from ..stages import graph
        from ..util import broadcast_inner_join
        res = DBSCAN_RES
        n = np.int64(1) << np.int64(res)

        cells = _cell_counts(sf_dir, res).materialize()
        seed = distributed_topk(cells, 1, [("cnt", "descending"),
                                           ("key", "ascending")])
        seeds = rd.from_pandas(seed[["key"]].rename(
            columns={"key": "node"}))
        edges = _neighbor_edges(cells, res).map_batches(
            lambda b: pa.table({"src": b["src"], "dst": b["dst"]}),
            batch_format="pyarrow")
        hops = graph.bfs_hops(edges, seeds, node="node").map_batches(
            lambda b: pa.table({"key": b["node"], "hops": b["hops"]}),
            batch_format="pyarrow")
        out = broadcast_inner_join(cells, hops, on="key")

        def final(b: pa.Table) -> pa.Table:
            key = b["key"].to_numpy()
            return pa.table({"qx": pa.array(key // n, pa.int64()),
                             "qy": pa.array(key % n, pa.int64()),
                             "cnt": b["cnt"], "hops": b["hops"]})

        return out.map_batches(final, batch_format="pyarrow")
    q["cell_hop_distance"] = cell_hop_distance

    def cell_cost_isochrone(sf_dir):
        """Weighted cost-distance (isochrone / service-area): min path
        cost from the densest cell to every occupied cell reachable
        within ISO_BUDGET, where entering a dense (≥ minpts) cell costs
        1 and a sparse cell costs 2 — the raster travel-cost primitive.
        Engine: ``graph.sssp_costs`` (vectorized one-task Bellman-Ford
        under the cap, frontier relaxation beyond; budget-pruned so
        rounds ≤ budget). Twin: bounded recursive-CTE Bellman-Ford over
        the same adjacency + MIN fold."""
        import ray.data as rd
        from ..stages import graph
        from ..util import broadcast_inner_join
        res = DBSCAN_RES
        n = np.int64(1) << np.int64(res)

        cells = _cell_counts(sf_dir, res).materialize()
        seed = distributed_topk(cells, 1, [("cnt", "descending"),
                                           ("key", "ascending")])
        seeds = rd.from_pandas(seed[["key"]].rename(
            columns={"key": "node"}))
        adj = _neighbor_edges(cells, res).map_batches(
            lambda b: pa.table({"src": b["src"], "dst": b["dst"]}),
            batch_format="pyarrow")

        # attach the ENTER cost of dst (1 dense / 2 sparse)
        def cost_rows(b: pa.Table) -> pa.Table:
            wv = np.where(b["cnt"].to_numpy() >= DBSCAN_MINPTS, 1, 2)
            return pa.table({"key": b["key"],
                             "w": pa.array(wv.astype(np.int64),
                                           pa.int64())})

        costs = cells.map_batches(cost_rows, batch_format="pyarrow")
        edges_w = broadcast_inner_join(
            adj.rename_columns({"dst": "key"}), costs, on="key") \
            .map_batches(lambda b: pa.table(
                {"src": b["src"], "dst": b["key"], "w": b["w"]}),
                batch_format="pyarrow")

        dist = graph.sssp_costs(edges_w, seeds, node="node",
                                budget=ISO_BUDGET).map_batches(
            lambda b: pa.table({"key": b["node"], "cost": b["cost"]}),
            batch_format="pyarrow")
        out = broadcast_inner_join(cells, dist, on="key")

        def final(b: pa.Table) -> pa.Table:
            key = b["key"].to_numpy()
            return pa.table({"qx": pa.array(key // n, pa.int64()),
                             "qy": pa.array(key % n, pa.int64()),
                             "cnt": b["cnt"], "cost": b["cost"]})

        return out.map_batches(final, batch_format="pyarrow")
    q["cell_cost_isochrone"] = cell_cost_isochrone

    def cell_voronoi_allocation(sf_dir):
        """Grid Voronoi / nearest-facility allocation: every occupied
        cell reachable within VOR_HOPLIM hops is labeled with its
        nearest of the VOR_NSEEDS densest cells (ties: fewer hops
        first, then smaller seed key) — the service-area allocation
        primitive. ONE ``graph.sssp_costs`` run does it: the
        lexicographic (hops, seed) objective is encoded as
        hops·VOR_SHIFT + seed_key with uniform edge weight VOR_SHIFT
        and per-seed initial cost = its own key, so min-cost IS the
        allocation rule. The twin's bounded recursive CTE carries the
        same combined key."""
        import ray.data as rd
        from ..stages import graph
        from ..util import broadcast_inner_join
        res = DBSCAN_RES
        n = np.int64(1) << np.int64(res)

        cells = _cell_counts(sf_dir, res).materialize()
        seed = distributed_topk(cells, VOR_NSEEDS,
                                [("cnt", "descending"),
                                 ("key", "ascending")])
        seeds = rd.from_pandas(pd.DataFrame(
            {"node": seed["key"].to_numpy(),
             "c0": seed["key"].to_numpy()}))
        edges = _neighbor_edges(cells, res).map_batches(
            lambda b: pa.table({
                "src": b["src"], "dst": b["dst"],
                "w": pa.array(np.full(len(b["src"]), VOR_SHIFT,
                                      np.int64))}),
            batch_format="pyarrow")
        alloc = graph.sssp_costs(
            edges, seeds, node="node", init_cost="c0",
            budget=VOR_HOPLIM * VOR_SHIFT + VOR_SHIFT - 1) \
            .map_batches(lambda b: pa.table(
                {"key": b["node"], "c": b["cost"]}),
                batch_format="pyarrow")
        out = broadcast_inner_join(cells, alloc, on="key")

        def final(b: pa.Table) -> pa.Table:
            key = b["key"].to_numpy()
            c = b["c"].to_numpy()
            sk = c % VOR_SHIFT
            return pa.table({"qx": pa.array(key // n, pa.int64()),
                             "qy": pa.array(key % n, pa.int64()),
                             "cnt": b["cnt"],
                             "hops": pa.array(c // VOR_SHIFT, pa.int64()),
                             "seed_qx": pa.array(sk // n, pa.int64()),
                             "seed_qy": pa.array(sk % n, pa.int64())})

        return out.map_batches(final, batch_format="pyarrow")
    q["cell_voronoi_allocation"] = cell_voronoi_allocation

    def dbscan_cluster_diameter(sf_dir):
        """Exact squared diameter (max pairwise cell distance) per
        DBSCAN cluster: convex-hull prune + hull-pair max inside one
        bucketed pass (diameter endpoints are hull vertices, so
        O(n log n + h²) per cluster, never n² over cells) — the twin
        brute-forces MAX over the within-cluster self-join, pinning the
        hull path against the quadratic definition. Integer coords →
        exact cross products, no float orientation ties."""
        from ..util import bucketed_group_apply
        n = np.int64(1) << np.int64(DBSCAN_RES)

        joined = _dbscan_core_labeled(sf_dir)

        def pts_rows(b: pa.Table) -> pa.Table:
            key = b["key"].to_numpy()
            return pa.table({"cluster_id": b["cluster_id"],
                             "qx": pa.array(key // n, pa.int64()),
                             "qy": pa.array(key % n, pa.int64())})

        pts = joined.map_batches(pts_rows, batch_format="pyarrow")

        def diam(g: pd.DataFrame) -> pd.DataFrame:
            ids, ncells, d2s = [], [], []
            for cid, gg in g.groupby("cluster_id", sort=False):
                p = np.stack([gg["qx"].to_numpy(), gg["qy"].to_numpy()],
                             axis=1)
                ids.append(cid)
                ncells.append(len(p))
                d2s.append(geo.hull_diameter2(p))
            return pd.DataFrame({
                "cluster_id": pd.Series(ids,
                                        dtype=g["cluster_id"].dtype),
                "n_cells": pd.Series(ncells, dtype=np.int64),
                "diam2": pd.Series(d2s, dtype=np.int64)})

        return bucketed_group_apply(pts, ["cluster_id"], diam,
                                    n_buckets=256)
    q["dbscan_cluster_diameter"] = dbscan_cluster_diameter

    def hexbin_counts(sf_dir):
        """H3-style hexagonal binning: flat-top axial hex assignment of
        every geo point at HEX_SIZE degrees (fractional axial coords +
        cube rounding) → exact per-hex counts. Map-side np.unique
        combiner, one hash agg; the float expression tree is mirrored
        token-for-token in the twin (see ``geo.hex_axial``), so the
        assignment itself — not just the counts — is value-pinned."""
        from ray.data.aggregate import Sum
        OFF, SPAN = np.int64(1) << 22, np.int64(1) << 23

        def assign(b: pa.Table) -> pa.Table:
            hq, hr = geo.hex_axial(b["lon"].to_numpy(),
                                   b["lat"].to_numpy(), HEX_SIZE)
            uniq, cnt = np.unique((hq + OFF) * SPAN + (hr + OFF),
                                  return_counts=True)
            return pa.table({"k": pa.array(uniq, pa.int64()),
                             "cnt": pa.array(cnt.astype(np.int64),
                                             pa.int64())})

        agg = fx.read_fixture(sf_dir, "geo", columns=["lon", "lat"]) \
            .map_batches(assign, batch_format="pyarrow") \
            .groupby("k").aggregate(Sum("cnt", alias_name="cnt"))

        def decode(b: pa.Table) -> pa.Table:
            k = b["k"].to_numpy()
            return pa.table({"q": pa.array(k // SPAN - OFF, pa.int64()),
                             "r": pa.array(k % SPAN - OFF, pa.int64()),
                             "cnt": b["cnt"]})

        return agg.map_batches(decode, batch_format="pyarrow")
    q["hexbin_counts"] = hexbin_counts

    def idw_cell_surface(sf_dir):
        """Inverse-distance-weighted (IDW, Shepard) leave-one-out
        density surface: each occupied cell's density re-estimated from
        the occupied cells within Chebyshev radius 3, weights 1/d².
        EXACT-INTEGER formulation: 1/d² = (L/d²)/L with L = lcm of the
        possible d² values (9360 for r=3), so num_w/den_w are integer
        sums — no float summation order to pin; the single final
        division is IEEE-identical on both engines. Map-side combiner
        (≤48 offers per cell pre-reduced per block), ONE hash agg, and
        a capped broadcast join back to the cell table."""
        from ray.data.aggregate import Sum
        from ..util import broadcast_inner_join
        res, R, L = DBSCAN_RES, 3, 9360
        n = np.int64(1) << np.int64(res)

        cells = _cell_counts(sf_dir, res).materialize()

        def offers(b: pa.Table) -> pa.Table:
            key = b["key"].to_numpy()
            cnt = b["cnt"].to_numpy()
            qx, qy = key // n, key % n
            ts, nps, dps = [], [], []
            for dx in range(-R, R + 1):
                for dy in range(-R, R + 1):
                    if dx == 0 and dy == 0:
                        continue
                    ax, ay = qx + dx, qy + dy
                    m = (ax >= 0) & (ax < n) & (ay >= 0) & (ay < n)
                    wq = L // (dx * dx + dy * dy)   # exact: L = lcm(d²)
                    ts.append(ax[m] * n + ay[m])
                    nps.append(cnt[m] * wq)
                    dps.append(np.full(int(m.sum()), wq, np.int64))
            t = np.concatenate(ts) if ts else np.empty(0, np.int64)
            np_ = np.concatenate(nps) if nps else np.empty(0, np.int64)
            dp_ = np.concatenate(dps) if dps else np.empty(0, np.int64)
            # per-block combine: offers land on ~overlapping targets
            uniq, inv = np.unique(t, return_inverse=True)
            nsum = np.zeros(len(uniq), np.int64)
            dsum = np.zeros(len(uniq), np.int64)
            np.add.at(nsum, inv, np_)
            np.add.at(dsum, inv, dp_)
            return pa.table({"key": pa.array(uniq, pa.int64()),
                             "np_": pa.array(nsum, pa.int64()),
                             "dp_": pa.array(dsum, pa.int64())})

        agg = cells.map_batches(offers, batch_format="pyarrow") \
            .groupby("key").aggregate(Sum("np_", alias_name="num_w"),
                                      Sum("dp_", alias_name="den_w"))
        out = broadcast_inner_join(cells, agg, on="key")

        def final(b: pa.Table) -> pa.Table:
            key = b["key"].to_numpy()
            num = b["num_w"].to_numpy().astype(np.float64)
            den = b["den_w"].to_numpy().astype(np.float64)
            idw = pa.array(num / den, pa.float64())
            return pa.table({"qx": pa.array(key // n, pa.int64()),
                             "qy": pa.array(key % n, pa.int64()),
                             "cnt": b["cnt"],
                             "num_w": b["num_w"], "den_w": b["den_w"],
                             "idw": _round_half_away(idw, 9)})

        return out.map_batches(final, batch_format="pyarrow")
    q["idw_cell_surface"] = idw_cell_surface

    def moran_i_cells(sf_dir):
        """Global Moran's I spatial autocorrelation of per-cell point
        counts under 8-adjacency weights (w_ij = 1), EXACT-INTEGER
        core: scaling the centered values by n turns
        Σ w_ij (x_i−x̄)(x_j−x̄) and Σ (x_i−x̄)² into the integer sums
        Σ (n·x_i−S)(n·x_j−S) and Σ (n·x_i−S)² (S = Σx) — block partials
        fit int64, the final merge is arbitrary-precision Python int
        (the distributed-topk tiny-partials pattern), and the twin
        accumulates in HUGEINT; I = (n/W)·(num/den) with the identical
        float tree on both sides. One row out."""
        import ray
        from ray.data.aggregate import Sum
        from ..util import broadcast_inner_join
        res = DBSCAN_RES

        cells = _cell_counts(sf_dir, res).materialize()
        n_cells = int(cells.count())
        s_tot = int((cells.aggregate(Sum("cnt")) or {}).get("sum(cnt)")
                    or 0)

        adj = _neighbor_edges(cells, res).map_batches(
            lambda b: pa.table({"src": b["src"], "dst": b["dst"]}),
            batch_format="pyarrow")
        xu = broadcast_inner_join(
            adj.rename_columns({"src": "key"}), cells, on="key") \
            .map_batches(lambda b: pa.table(
                {"key": b["dst"], "xu": b["cnt"]}),
                batch_format="pyarrow")
        both = broadcast_inner_join(xu, cells, on="key")

        def num_partial(b: pa.Table) -> pa.Table:
            a = n_cells * b["xu"].to_numpy() - s_tot
            c = n_cells * b["cnt"].to_numpy() - s_tot
            return pa.table({"p": pa.array([int((a * c).sum())],
                                           pa.int64()),
                             "w": pa.array([b.num_rows], pa.int64())})

        def den_partial(b: pa.Table) -> pa.Table:
            c = n_cells * b["cnt"].to_numpy() - s_tot
            return pa.table({"p": pa.array([int((c * c).sum())],
                                           pa.int64())})

        def gather(ds, col):
            tabs = [t for t in ray.get(ds.to_arrow_refs())
                    if isinstance(t, pa.Table) and t.num_rows]
            return sum(int(v) for t in tabs
                       for v in t[col].to_pylist())   # exact python int

        nparts = both.map_batches(num_partial,
                                  batch_format="pyarrow").materialize()
        num = gather(nparts, "p")
        w_pairs = gather(nparts, "w")
        den = gather(cells.map_batches(den_partial,
                                       batch_format="pyarrow"), "p")
        moran = (float(n_cells) / float(w_pairs)) \
            * (float(num) / float(den))
        moran = float(np.floor(moran * 1e9 + 0.5) / 1e9)
        return pd.DataFrame({"n_cells": [n_cells],
                             "w_pairs": [w_pairs],
                             "num": [num], "den": [den],
                             "moran_i": [moran]})
    q["moran_i_cells"] = moran_i_cells

    def getis_ord_hotspots(sf_dir):
        """Getis-Ord Gi* hot-spot z-score per occupied cell (the local
        companion to [[moran_i_cells]]): Gi* compares each cell's
        8-neighborhood+self count sum against the global mean, scaled
        by the neighborhood size. Every ingredient (n, S = Σx,
        S2 = Σx², per-cell k_i = |N(i)|+1, nsum_i = Σ_{j∈N(i)∪i} x_j)
        is an EXACT integer computed distributively (neighbor explode +
        vectorized combiner + one hash agg); only the final z is float,
        with the identical expression tree on both engines, rounded e6.
        Output: one row per cell with the exact ints and the z-score."""
        from ray.data.aggregate import Sum
        from ..util import broadcast_inner_join
        res = DBSCAN_RES
        n2 = np.int64(1) << np.int64(res)

        cells = _cell_counts(sf_dir, res).materialize()
        n_cells = int(cells.count())
        agg = cells.aggregate(Sum("cnt")) or {}
        s_tot = int(agg.get("sum(cnt)") or 0)

        def sq(b: pa.Table) -> pa.Table:
            c = b["cnt"].to_numpy()
            return pa.table({"p": pa.array([int((c * c).sum())],
                                           pa.int64())})

        import ray
        s2_tot = sum(int(v) for t in ray.get(
            cells.map_batches(sq, batch_format="pyarrow").to_arrow_refs())
            if isinstance(t, pa.Table) and t.num_rows
            for v in t["p"].to_pylist())

        # each cell OFFERS its count to its ≤8 in-range neighbors AND to
        # itself (Gi* includes self); offers to unoccupied cells must
        # not count toward k_i, so the per-target reduce joins back to
        # the occupied-cell table (inner join drops ghost targets)
        def offers(b: pa.Table) -> pa.Table:
            key = b["key"].to_numpy()
            cnt = b["cnt"].to_numpy()
            qx, qy = key // n2, key % n2
            ts, vs = [key], [cnt]
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    ax, ay = qx + dx, qy + dy
                    m = (ax >= 0) & (ax < n2) & (ay >= 0) & (ay < n2)
                    ts.append(ax[m] * n2 + ay[m])
                    vs.append(cnt[m])
            t = np.concatenate(ts)
            v = np.concatenate(vs)
            uniq, inv = np.unique(t, return_inverse=True)
            vsum = np.zeros(len(uniq), np.int64)
            kcnt = np.zeros(len(uniq), np.int64)
            np.add.at(vsum, inv, v)
            np.add.at(kcnt, inv, 1)
            return pa.table({"key": pa.array(uniq, pa.int64()),
                             "nsum": pa.array(vsum, pa.int64()),
                             "k": pa.array(kcnt, pa.int64())})

        per_cell = cells.map_batches(offers, batch_format="pyarrow") \
            .groupby("key").aggregate(Sum("nsum", alias_name="nsum"),
                                      Sum("k", alias_name="k"))
        # offers from the cell itself guarantee every occupied cell has
        # a row; ghost targets (unoccupied neighbors) are dropped here
        out = broadcast_inner_join(cells, per_cell, on="key")

        def final(b: pa.Table) -> pa.Table:
            key = b["key"].to_numpy()
            nsum = b["nsum"].to_numpy().astype(np.float64)
            k = b["k"].to_numpy().astype(np.float64)
            nf = float(n_cells)
            xbar = float(s_tot) / nf
            s = np.sqrt(float(s2_tot) / nf - xbar * xbar)
            denom = s * np.sqrt((nf * k - k * k) / (nf - 1.0))
            z = (nsum - xbar * k) / denom
            z = np.floor(z * 1e6 + 0.5) / 1e6
            return pa.table({"qx": pa.array(key // n2, pa.int64()),
                             "qy": pa.array(key % n2, pa.int64()),
                             "cnt": b["cnt"],
                             "nsum": b["nsum"], "k": b["k"],
                             "z": pa.array(z, pa.float64())})

        return out.map_batches(final, batch_format="pyarrow")
    q["getis_ord_hotspots"] = getis_ord_hotspots

    def way_network_components(sf_dir):
        """Road-network topology: connected components of the way graph
        where two ways are adjacent iff they share a node (the OSM
        routing-graph prep step). Per shared node the engine emits a
        STAR (min way ↔ each other way, O(k) rows) rather than the
        O(k²) clique — same components, hub-node safe; labels via the
        production ``connected_components_pairs``; the twin closes over
        its own clique edge set with a recursive CTE. Output: one row
        per component with way count and DISTINCT node count (via the
        map-side-deduped ``grouped_count_distinct``)."""
        from ..stages import dedup as dd
        from ..util import (broadcast_inner_join, bucketed_group_apply,
                            grouped_count_distinct)

        wn = fx.read_fixture(sf_dir, "way_nodes",
                             columns=["way_id", "node_id"])

        def star(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["node_id", "way_id"], kind="mergesort") \
                 .drop_duplicates(["node_id", "way_id"])
            nid = g["node_id"].to_numpy()
            wid = g["way_id"].to_numpy()
            new = np.empty(len(nid), bool)
            if len(nid):
                new[0] = True
                new[1:] = nid[1:] != nid[:-1]
            run_id = np.cumsum(new) - 1
            first = wid[new][run_id]      # min way per node, broadcast
            m = wid != first
            return pd.DataFrame({"id_a": first[m], "id_b": wid[m]})

        edges = bucketed_group_apply(wn, ["node_id"], star,
                                     n_buckets=64) \
            .map_batches(lambda b: pa.table({"id_a": b["id_a"],
                                             "id_b": b["id_b"]}),
                         batch_format="pyarrow")   # pandas→arrow re-type

        def self_loops(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            u = pc.unique(b["way_id"])
            return pa.table({"id_a": u, "id_b": u})

        labels = dd.connected_components_pairs(
            edges.union(wn.map_batches(self_loops,
                                       batch_format="pyarrow")))
        lab = labels.rename_columns({"id": "way_id",
                                     "label": "component_id"})
        n_ways = grouped_count(lab, "component_id", out="n_ways")
        with_nodes = broadcast_inner_join(wn, lab, on="way_id")
        n_nodes = grouped_count_distinct(with_nodes, ["component_id"],
                                         "node_id", out_col="n_nodes")
        return broadcast_inner_join(n_ways, n_nodes, on="component_id")
    q["way_network_components"] = way_network_components

    def phash_topk_retrieval(sf_dir):
        """Query-by-image retrieval over the 64-bit perceptual-hash
        column: the PHASH_NQ lexicographically-smallest image_ids are
        the query set (deterministic, oracle-expressible); for each
        query, the top-PHASH_K nearest OTHER images by Hamming distance
        (ties → min image_id). Engine: queries broadcast once
        (``ray.put``), per-batch vectorized XOR + 16×4-bit popcount
        table over the full corpus, per-block top-k pre-reduce via
        ``grouped_topk`` — only k×blocks candidate rows reach the
        merge. Twin: bit_count over the cross join + QUALIFY-shaped
        window."""
        import ray
        from ..util import _bcast_get, grouped_topk

        ds = fx.read_fixture(sf_dir, "images",
                             columns=["image_id", "phash"])
        qdf = ds.map_batches(
            lambda b: pa.table({"image_id": b["image_id"]}),
            batch_format="pyarrow")
        qids = distributed_topk(qdf, PHASH_NQ,
                                [("image_id", "ascending")])
        # pull ONLY the query rows (narrow columns, tiny id filter)
        import pyarrow.parquet as pq
        qset = pa.array(list(qids["image_id"]), pa.string())
        qall = pq.read_table(fx.fixture_path(sf_dir, "images"),
                             columns=["image_id", "phash"])
        qrows = qall.filter(pc.is_in(qall["image_id"],
                                     value_set=qset)) \
            .to_pandas().sort_values("image_id", ignore_index=True)
        ref = ray.put((qrows["image_id"].to_numpy(),
                       qrows["phash"].to_numpy().astype(np.uint64)))

        pop4 = np.array([bin(i).count("1") for i in range(16)],
                        np.int64)

        def score(b: pa.Table) -> pa.Table:
            qid, qh = _bcast_get(ref)
            ids = b["image_id"].to_numpy(zero_copy_only=False)
            h = b["phash"].to_numpy().astype(np.uint64)
            # (corpus, queries) XOR then nibble-table popcount
            x = h[:, None] ^ qh[None, :]
            d = np.zeros(x.shape, np.int64)
            for _ in range(16):
                d += pop4[(x & np.uint64(0xF)).astype(np.int64)]
                x >>= np.uint64(4)
            nq = len(qid)
            return pa.table({
                "query_id": pa.array(np.repeat(qid, len(ids))),
                "image_id": pa.array(np.tile(ids, nq)),
                "dist": pa.array(d.T.reshape(-1), pa.int64())})

        cand = ds.map_batches(score, batch_format="pyarrow") \
            .map_batches(lambda b: b.filter(
                pc.not_equal(b["query_id"], b["image_id"])),
                batch_format="pyarrow")
        return grouped_topk(cand, ["query_id"], PHASH_K,
                            [("dist", "asc"), ("image_id", "asc")])
    q["phash_topk_retrieval"] = phash_topk_retrieval

    def way_segment_intersections(sf_dir):
        """Big⋈big segment-intersection join (the GIS overlay / map-
        conflation core): pairs of ways whose polyline segments PROPERLY
        cross, with the crossing count per way pair. PBSM shape
        (Patel-DeWitt): segments replicate to the grid cells their bbox
        covers at SEG_XRES, candidate pairs are tested only within a
        cell, and each pair is emitted exactly once via the REFERENCE-
        POINT rule (only the cell containing the max-of-min corners of
        the two bboxes reports it) — no global dedup shuffle. The
        orientation tests run on e7-scaled integer coords (exact, no
        float ties; the twin runs the identical tests on the identical
        ints over the full n² segment cross join). Hot cells are capped
        with a loud raise, never silently truncated."""
        from ..util import bucketed_group_apply
        res = SEG_XRES
        n = np.int64(1) << np.int64(res)
        joined = _way_points(sf_dir)

        def segs(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["way_id", "position"], kind="mergesort")
            wid = g["way_id"].to_numpy()
            pos = g["position"].to_numpy()
            lon = g["lon"].to_numpy()
            lat = g["lat"].to_numpy()
            same = (wid[1:] == wid[:-1]) & (pos[1:] == pos[:-1] + 1)
            # e7 integer coords — identical to the twin's
            # floor(v*1e7+0.5)
            x = np.floor(lon * 1e7 + 0.5).astype(np.int64)
            y = np.floor(lat * 1e7 + 0.5).astype(np.int64)
            qx, qy = geo.cell_xy(lon, lat, res)
            out = pd.DataFrame({
                "way_id": wid[1:][same],
                "x1": x[:-1][same], "y1": y[:-1][same],
                "x2": x[1:][same], "y2": y[1:][same],
                "qx_min": np.minimum(qx[:-1][same], qx[1:][same]),
                "qx_max": np.maximum(qx[:-1][same], qx[1:][same]),
                "qy_min": np.minimum(qy[:-1][same], qy[1:][same]),
                "qy_max": np.maximum(qy[:-1][same], qy[1:][same])})
            return out

        seg = bucketed_group_apply(joined, ["way_id"], segs, n_buckets=64)

        def explode(b: pa.Table) -> pa.Table:
            qxm = b["qx_min"].to_numpy()
            qym = b["qy_min"].to_numpy()
            cx = b["qx_max"].to_numpy() - qxm + 1
            cy = b["qy_max"].to_numpy() - qym + 1
            cnt = cx * cy
            if cnt.size and int(cnt.max()) > 65536:
                raise RuntimeError(
                    "way_segment_intersections: a segment bbox covers "
                    f"{int(cnt.max())} cells at res {res}; lower SEG_XRES")
            tot = int(cnt.sum())
            si = np.repeat(np.arange(len(cnt)), cnt)
            within = np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            cqx = qxm[si] + within // cy[si]
            cqy = qym[si] + within % cy[si]
            cols = {"cell": pa.array(cqx * n + cqy, pa.int64())}
            for c in ("way_id", "x1", "y1", "x2", "y2",
                      "qx_min", "qy_min"):
                cols[c] = pa.array(b[c].to_numpy()[si], pa.int64())
            return pa.table(cols)

        exploded = seg.map_batches(explode, batch_format="pyarrow")

        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            out_a, out_b = [], []
            for cell, gg in g.groupby("cell", sort=False):
                m = len(gg)
                if m < 2:
                    continue
                if m > 100_000:
                    raise RuntimeError(
                        f"way_segment_intersections: hot cell with {m} "
                        f"segments; raise SEG_XRES or salt")
                w = gg["way_id"].to_numpy()
                x1 = gg["x1"].to_numpy()
                y1 = gg["y1"].to_numpy()
                x2 = gg["x2"].to_numpy()
                y2 = gg["y2"].to_numpy()
                qxm = gg["qx_min"].to_numpy()
                qym = gg["qy_min"].to_numpy()
                cq = int(cell)
                for i0 in range(0, m, 256):
                    i1 = min(i0 + 256, m)
                    sl = slice(i0, i1)
                    # orientation of b's endpoints vs segment a (rows)
                    dax = (x2[sl] - x1[sl])[:, None]
                    day = (y2[sl] - y1[sl])[:, None]
                    d1 = dax * (y1[None, :] - y1[sl][:, None]) \
                        - day * (x1[None, :] - x1[sl][:, None])
                    d2 = dax * (y2[None, :] - y1[sl][:, None]) \
                        - day * (x2[None, :] - x1[sl][:, None])
                    # orientation of a's endpoints vs segment b (cols)
                    dbx = (x2 - x1)[None, :]
                    dby = (y2 - y1)[None, :]
                    d3 = dbx * (y1[sl][:, None] - y1[None, :]) \
                        - dby * (x1[sl][:, None] - x1[None, :])
                    d4 = dbx * (y2[sl][:, None] - y1[None, :]) \
                        - dby * (x2[sl][:, None] - x1[None, :])
                    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
                        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
                    # strict upper triangle in GLOBAL index: j > i
                    jj = np.arange(m)[None, :]
                    ii = np.arange(i0, i1)[:, None]
                    proper &= jj > ii
                    proper &= w[sl][:, None] != w[None, :]
                    # reference point: only the canonical shared cell
                    # (max of bbox-min corners) reports the pair
                    ccell = (np.maximum(qxm[sl][:, None], qxm[None, :]) * n
                             + np.maximum(qym[sl][:, None], qym[None, :]))
                    proper &= ccell == cq
                    ai, bj = np.nonzero(proper)
                    if len(ai):
                        wa = w[sl][ai]
                        wb = w[bj]
                        out_a.append(np.minimum(wa, wb))
                        out_b.append(np.maximum(wa, wb))
            if out_a:
                a = np.concatenate(out_a)
                b_ = np.concatenate(out_b)
            else:
                a = np.empty(0, np.int64)
                b_ = np.empty(0, np.int64)
            # pre-reduce to per-bucket (pair, n) partials on ONE packed
            # int64 key: a raw two-key groupby-Count over the hit rows
            # measured >270 s at 1.1M rows (Ray 2.49 sort-agg on pandas
            # blocks) vs ~1 s for the packed pre-reduced Sum
            key, cnt = np.unique(a * PAIR_PACK + b_, return_counts=True)
            return pd.DataFrame({"pair": key,
                                 "n": cnt.astype(np.int64)})

        hits = bucketed_group_apply(exploded, ["cell"], pairs,
                                    n_buckets=256)

        # final pair-sum via ONE more bucketed shuffle with a VECTORIZED
        # pandas groupby — ray groupby().aggregate() walks rows in
        # Python (TableBlock._aggregate → iter_rows) and took minutes
        # over the ~0.5M per-bucket partials this synthetic corpus
        # produces (nearly every way pair crosses)
        def pair_sum(g: pd.DataFrame) -> pd.DataFrame:
            s = g.groupby("pair", sort=False)["n"].sum()
            k = s.index.to_numpy()
            return pd.DataFrame({
                "way_a": (k // PAIR_PACK).astype(np.int64),
                "way_b": (k % PAIR_PACK).astype(np.int64),
                "n_crossings": s.to_numpy().astype(np.int64)})

        return bucketed_group_apply(hits, ["pair"], pair_sum,
                                    n_buckets=256)
    q["way_segment_intersections"] = way_segment_intersections

    # ------------- trajectory analytics over the node edit history

    def user_edit_path_length(sf_dir):
        """Per-user trajectory length over the OSM edit history: each
        user's node edits ordered by (timestamp, id) become a path whose
        consecutive great-circle hops are summed. Hop distances go to
        integer millimeters BEFORE the sum (floor(d*1000+0.5)) so the
        per-user total is exact at any parallelism; single-edit users
        have no hops and appear on neither side. Scale shape: ONE
        bounded-bucket shuffle on the trajectory key (user), vectorized
        haversine inside the bucket — the same plan at 10^12 edit rows."""
        from ..util import bucketed_group_apply, typed_empty_series
        nodes = fx.read_fixture(sf_dir, "nodes",
                                columns=["id", "lon", "lat", "timestamp",
                                         "user"])

        def hops(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["user", "timestamp", "id"], kind="mergesort")
            u = g["user"].to_numpy()
            lon = g["lon"].to_numpy()
            lat = g["lat"].to_numpy()
            same = u[1:] == u[:-1]
            d = geo.haversine_m(lon[:-1][same], lat[:-1][same],
                                lon[1:][same], lat[1:][same])
            mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
            df = pd.DataFrame({"user": u[1:][same], "mm": mm})
            if not len(df):
                return pd.DataFrame({"user": typed_empty_series(u),
                                     "n_hops": np.empty(0, np.int64),
                                     "path_mm": np.empty(0, np.int64)})
            out = df.groupby("user", sort=False)["mm"] \
                    .agg(["size", "sum"]).reset_index()
            return pd.DataFrame({"user": out["user"],
                                 "n_hops": out["size"].astype(np.int64),
                                 "path_mm": out["sum"].astype(np.int64)})

        return bucketed_group_apply(nodes, ["user"], hops, n_buckets=64)
    q["user_edit_path_length"] = user_edit_path_length

    def od_cell_flows(sf_dir):
        """Origin→destination flow matrix: consecutive node edits per user
        (same (timestamp, id) total order as the path query) become
        directed cell→cell flows on the coarse OD grid, counted
        globally. Per-user transition extraction is one bucketed
        shuffle; the flow count merges per-block partials through the
        vectorized arrow combiner (never a raw row-walked aggregate)."""
        from ..util import bucketed_group_apply, grouped_agg_vec
        nodes = fx.read_fixture(sf_dir, "nodes",
                                columns=["id", "lon", "lat", "timestamp",
                                         "user"])

        def transitions(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["user", "timestamp", "id"], kind="mergesort")
            u = g["user"].to_numpy()
            qx, qy = geo.cell_xy(g["lon"].to_numpy(), g["lat"].to_numpy(),
                                 OD_RES)
            same = u[1:] == u[:-1]
            return pd.DataFrame({"from_x": qx[:-1][same],
                                 "from_y": qy[:-1][same],
                                 "to_x": qx[1:][same],
                                 "to_y": qy[1:][same]})

        flows = bucketed_group_apply(nodes, ["user"], transitions,
                                     n_buckets=64)
        return grouped_agg_vec(flows, ["from_x", "from_y", "to_x", "to_y"],
                               [(None, "count", "n_flows")])
    q["od_cell_flows"] = od_cell_flows

    def _snap_segments_table(sf_dir) -> pa.Table:
        """Road-network segment table from the resolved way points
        (dimension-scale by the same argument as the polygon edge set);
        zero-length segments dropped to match the twin's WHERE."""
        import pyarrow.parquet as pq
        wn = pq.read_table(fx.fixture_path(sf_dir, "way_nodes")).to_pandas()
        nd = pq.read_table(fx.fixture_path(sf_dir, "nodes"),
                           columns=["id", "lon", "lat"]).to_pandas()
        j = wn.merge(nd.rename(columns={"id": "node_id"}), on="node_id") \
              .sort_values(["way_id", "position"], kind="mergesort")
        wid = j["way_id"].to_numpy()
        pos = j["position"].to_numpy()
        lon = j["lon"].to_numpy()
        lat = j["lat"].to_numpy()
        same = (wid[1:] == wid[:-1]) & (pos[1:] == pos[:-1] + 1)
        x1, y1 = lon[:-1][same], lat[:-1][same]
        x2, y2 = lon[1:][same], lat[1:][same]
        keep = (x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1) > 0
        return pa.table({"way_id": pa.array(wid[1:][same][keep], pa.int64()),
                         "x1": pa.array(x1[keep], pa.float64()),
                         "y1": pa.array(y1[keep], pa.float64()),
                         "x2": pa.array(x2[keep], pa.float64()),
                         "y2": pa.array(y2[keep], pa.float64())})

    def snap_points_to_ways(sf_dir):
        """Map matching: every geo point snapped to its NEAREST way
        segment (exact — the road network is the broadcast dimension
        side, capped with a loud raise; points stream map-only).
        Distance ties resolve to the smallest way_id on both engines."""
        segs = _snap_segments_table(sf_dir)
        pts = fx.read_fixture(sf_dir, "geo",
                              columns=["image_id", "lon", "lat"])
        return pip_join.snap_to_segments(pts, segs)
    q["snap_points_to_ways"] = snap_points_to_ways

    def snap_points_to_ways_bucketed(sf_dir):
        """The beyond-broadcast-cap map-matching path (VERDICT r4 item
        2): same snap contract, but the segment network is a DATASET
        cell-bucketed at res 12 and points probe expanding rings — the
        shape that survives a 10^7–10^8-segment country network where
        ``snap_to_segments`` raises. Same oracle SQL as
        ``snap_points_to_ways`` (results are value-identical: shared
        ``_snap_tile_min`` float tree, lexicographic (d2, way_id) merge
        across cells ≡ the broadcast first-min scan)."""
        import ray.data as rd
        segs = _snap_segments_table(sf_dir)
        pts = fx.read_fixture(sf_dir, "geo",
                              columns=["image_id", "lon", "lat"])
        return pip_join.snap_to_segments_bucketed(
            pts, rd.from_arrow(segs), res=12)
    q["snap_points_to_ways_bucketed"] = snap_points_to_ways_bucketed

    def way_rasterize_cells(sf_dir):
        """Vector→raster line burn: the distinct grid cells each way
        covers, by fixed-step DDA sampling of every segment in GRID
        space (steps = ceil(chebyshev length in cells), so consecutive
        samples never skip a cell column/row). The whole explode runs
        inside the same bucketed pass that resolves way order — distinct
        cells settle in-bucket (a way lives in one bucket), and only
        ≤ cells-per-way rows leave the shuffle. Float discipline: grid
        coords, step counts and the i/steps parameter use identical
        expression trees on both engines."""
        from ..util import bucketed_group_apply
        n = 1 << WAY_RASTER_RES
        joined = _way_points(sf_dir)

        def burn(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["way_id", "position"], kind="mergesort")
            wid = g["way_id"].to_numpy()
            pos = g["position"].to_numpy()
            gx = (g["lon"].to_numpy() + 180.0) / 360.0 * n
            gy = (g["lat"].to_numpy() + 90.0) / 180.0 * n
            same = (wid[1:] == wid[:-1]) & (pos[1:] == pos[:-1] + 1)
            w = wid[1:][same]
            gx1, gy1 = gx[:-1][same], gy[:-1][same]
            gx2, gy2 = gx[1:][same], gy[1:][same]
            if not len(w):
                z = np.empty(0, np.int64)
                return pd.DataFrame({"way_id": z, "cx": z, "cy": z})
            steps = np.maximum(np.ceil(np.maximum(np.abs(gx2 - gx1),
                                                  np.abs(gy2 - gy1))),
                               1.0).astype(np.int64)
            cnt = steps + 1
            seg = np.repeat(np.arange(len(steps)), cnt)
            i = np.arange(int(cnt.sum()), dtype=np.int64) \
                - np.repeat(np.cumsum(cnt) - cnt, cnt)
            t = i.astype(np.float64) / steps[seg].astype(np.float64)
            cx = np.clip(np.floor(gx1[seg] + (gx2 - gx1)[seg] * t)
                         .astype(np.int64), 0, n - 1)
            cy = np.clip(np.floor(gy1[seg] + (gy2 - gy1)[seg] * t)
                         .astype(np.int64), 0, n - 1)
            df = pd.DataFrame({"way_id": w[seg], "cx": cx, "cy": cy})
            return df.drop_duplicates()

        return bucketed_group_apply(joined, ["way_id"], burn, n_buckets=64)
    q["way_rasterize_cells"] = way_rasterize_cells

    def ripley_k_counts(sf_dir):
        """Ripley's K point-pattern statistic (the exact-integer core):
        directed pair counts within each radius band, from ONE exact
        radius join at the largest radius (ring-1 cell guarantee — no
        retry rounds) banded per block and merged through the vectorized
        combiner. K̂(r) is these counts times the constant
        area/(n·(n−1)); the counts are the hash-stable surface."""
        from ..util import grouped_agg_vec
        pts = fx.read_fixture(sf_dir, "knn_pts")
        pairs = knn.radius_join(pts, radius_m=RIPLEY_MAX_M,
                                id_col="image_id")
        rs = np.array(RIPLEY_RADII_MM, np.int64)

        def band(b: pa.Table) -> pa.Table:
            mm = np.floor(b["dist_m"].to_numpy() * 1000.0 + 0.5) \
                   .astype(np.int64)
            n = (mm[None, :] <= rs[:, None]).sum(axis=1).astype(np.int64)
            return pa.table({"r_mm": pa.array(rs, pa.int64()),
                             "n_pairs_p": pa.array(n, pa.int64())})

        partials = pairs.map_batches(band, batch_format="pyarrow")
        return grouped_agg_vec(partials, ["r_mm"],
                               [("n_pairs_p", "sum", "n_pairs")])
    q["ripley_k_counts"] = ripley_k_counts

    def image_augment_manifest(sf_dir):
        """Training-data image augmentation (hflip / rot90 / crop75):
        decode → transform → re-encode as raw8 on the task pool, ONE row
        per (image, op). The manifest surface is oracle-pinned: output
        geometry per op is integer arithmetic over (w, h), the raw8 byte
        length must equal 3·w'·h' (so REAL bytes flowed through the
        transform), and the caption rides through unchanged (the
        BASELINE caption-equality invariant). Pixels themselves are
        pinned by pytest (involution/geometry goldens) — SQL can't
        decode."""
        ds = fx.read_fixture(sf_dir, "images")
        aug = multimodal.augment_images(ds, out_fmt="raw8")

        def manifest(b: pa.Table) -> pa.Table:
            nb = pc.binary_length(b["bytes"]).cast(pa.int64())
            return pa.table({"image_id": b["image_id"], "aug": b["aug"],
                             "w": b["w"], "h": b["h"], "fmt": b["fmt"],
                             "n_bytes": nb, "caption": b["caption"]})
        return aug.map_batches(manifest, batch_format="pyarrow")
    q["image_augment_manifest"] = image_augment_manifest

    def lancelike_time_travel_check(sf_dir):
        """Snapshot isolation / time travel through the store: commit a
        base version, MERGE a second version on top, then read BOTH
        pinned versions back concurrently — the old snapshot must still
        equal the pre-merge table value-exactly (copy-on-write means the
        base fragments are untouched, only the manifest moved). The twin
        computes both relational states; the comparison pins that
        version pinning really isolates (same mk_upd kernel as the
        merge check, different store root so the two queries never race
        on a manifest chain)."""
        import shutil

        from ..sources import lancelike
        from ..util import grouped_agg_vec

        tag = os.path.basename(os.path.normpath(sf_dir))
        root = f"/tmp/graft_timetravel/{tag}"
        shutil.rmtree(root, ignore_errors=True)
        orders = fx.driver_table(sf_dir, "orders")
        man1 = lancelike.write_dataset(orders, root, stage="base",
                                       resume=False)

        upd = orders.map_batches(_orders_merge_update,
                                 batch_format="pyarrow")
        man2 = lancelike.merge_upsert(upd, root, "o_orderkey",
                                      stage="merge1")

        def cents_tagged(snapshot):
            def fn(b: pa.Table) -> pa.Table:
                c = np.floor(b["o_totalprice"].to_numpy(zero_copy_only=False)
                             * 100 + 0.5).astype(np.int64)
                return pa.table({
                    "snapshot": pa.array([snapshot] * b.num_rows,
                                         pa.string()),
                    "o_orderpriority": b["o_orderpriority"],
                    "cents_p": pa.array(c, pa.int64()),
                    "n_p": pa.array(np.ones(b.num_rows, np.int64))})
            return fn

        cols = ["o_orderpriority", "o_totalprice"]
        v1 = lancelike.read_dataset(root, columns=cols,
                                    version=man1["version"]) \
            .map_batches(cents_tagged("v1"), batch_format="pyarrow")
        v2 = lancelike.read_dataset(root, columns=cols,
                                    version=man2["version"]) \
            .map_batches(cents_tagged("v2"), batch_format="pyarrow")
        return grouped_agg_vec(v1.union(v2),
                               ["snapshot", "o_orderpriority"],
                               [("n_p", "sum", "n"),
                                ("cents_p", "sum", "cents")])
    q["lancelike_time_travel_check"] = lancelike_time_travel_check

    def lancelike_delete_check(sf_dir):
        """DELETE through the store (the CRUD verb next to merge/compact):
        base = orders, delete every key ≡ 0 (mod 11), read the new
        version back and aggregate — value-pinned against the
        relational complement. The delete is fragment-granular
        copy-on-write (unhit fragments carried by reference), and a
        second delete of the same keys is a no-op (idempotence checked
        engine-side via the manifest row count)."""
        import shutil

        from ..sources import lancelike
        from ..util import grouped_agg_vec

        tag = os.path.basename(os.path.normpath(sf_dir))
        root = f"/tmp/graft_delete/{tag}"
        shutil.rmtree(root, ignore_errors=True)
        orders = fx.driver_table(sf_dir, "orders")
        lancelike.write_dataset(orders, root, stage="base", resume=False)

        def victim_keys(b: pa.Table) -> pa.Table:
            kk = b["o_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table({"o_orderkey": pa.array(kk[kk % 11 == 0],
                                                    pa.int64())})
        keys = orders.map_batches(victim_keys, batch_format="pyarrow")
        man = lancelike.delete_by_keys(keys, root, "o_orderkey",
                                       stage="delete1")
        man2 = lancelike.delete_by_keys(keys, root, "o_orderkey",
                                        stage="delete2")
        n_after = sum(int(f["rows"]) for f in man["fragments"])
        n_again = sum(int(f["rows"]) for f in man2["fragments"])
        if n_after != n_again:
            raise AssertionError("repeated delete was not idempotent")

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(b["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
            return pa.table({"o_orderstatus": b["o_orderstatus"],
                             "cents_p": pa.array(c, pa.int64()),
                             "n_p": pa.array(np.ones(b.num_rows, np.int64))})

        kept = lancelike.read_dataset(
            root, columns=["o_orderstatus", "o_totalprice"]) \
            .map_batches(cents, batch_format="pyarrow")
        return grouped_agg_vec(kept, ["o_orderstatus"],
                               [("n_p", "sum", "n"),
                                ("cents_p", "sum", "cents")])
    q["lancelike_delete_check"] = lancelike_delete_check

    def kcore_radius_graph(sf_dir):
        """k-core decomposition of the exact radius graph: peel nodes of
        degree < KCORE_K until fixpoint, return (id, deg) of the
        surviving core. The twin unrolls the SAME number of peel rounds
        (peeling is idempotent after convergence; the engine raises if
        it would need more)."""
        from ..stages import graph
        pts = fx.read_fixture(sf_dir, "knn_pts")
        pairs = knn.radius_join(pts, radius_m=RADIUS_M, id_col="image_id")
        edges = pairs.map_batches(
            lambda b: pa.table({"src": b["id"], "dst": b["neighbor_id"]}),
            batch_format="pyarrow")
        core = graph.k_core(edges, KCORE_K, max_rounds=KCORE_ROUNDS)
        return core.rename_columns({"src": "id"})
    q["kcore_radius_graph"] = kcore_radius_graph

    def user_stay_segments(sf_dir):
        """Stay-point detection (gaps-and-islands over trajectories):
        maximal runs of consecutive near hops (≤ STAY_MM integer mm)
        in each user's (timestamp, id)-ordered edit path — the segment
        anchor ids, point count per stay. One bucketed shuffle on the
        trajectory key; run-length extraction is pure numpy in-bucket.
        The twin is the classic islands window (hop_no − ROW_NUMBER)."""
        from ..util import bucketed_group_apply, typed_empty_series
        nodes = fx.read_fixture(sf_dir, "nodes",
                                columns=["id", "lon", "lat", "timestamp",
                                         "user"])

        def stays(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["user", "timestamp", "id"], kind="mergesort")
            u = g["user"].to_numpy()
            ids = g["id"].to_numpy()
            lon = g["lon"].to_numpy()
            lat = g["lat"].to_numpy()
            same = u[1:] == u[:-1]
            d = geo.haversine_m(lon[:-1], lat[:-1], lon[1:], lat[1:])
            mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
            near = same & (mm <= STAY_MM)
            idx = np.nonzero(near)[0]
            if not len(idx):
                z = np.empty(0, np.int64)
                return pd.DataFrame({"user": typed_empty_series(u),
                                     "start_id": z, "end_id": z,
                                     "n_points": z})
            isl = idx - np.arange(len(idx))
            df = pd.DataFrame({"user": u[idx], "isl": isl,
                               "pid": ids[idx], "cid": ids[idx + 1]})
            gr = df.groupby(["user", "isl"], sort=False) \
                   .agg(start_id=("pid", "first"), end_id=("cid", "last"),
                        n=("pid", "size")).reset_index()
            return pd.DataFrame({
                "user": gr["user"],
                "start_id": gr["start_id"].astype(np.int64),
                "end_id": gr["end_id"].astype(np.int64),
                "n_points": (gr["n"] + 1).astype(np.int64)})

        return bucketed_group_apply(nodes, ["user"], stays, n_buckets=64)
    q["user_stay_segments"] = user_stay_segments

    def doc_chunk_windows(sf_dir):
        """RAG chunking: overlapping CHUNK_SIZE-token windows every
        CHUNK_STRIDE tokens over the documents table (\\S+ tokens,
        single-space rejoin) — the exact chunk TEXT is part of the
        pinned surface, so tokenize→slice→rejoin matches DuckDB's
        regexp_extract_all/list_slice/array_to_string bit-for-bit."""
        ds = fx.driver_table(sf_dir, "documents",
                             columns=["doc_id", "text"])
        return textstage.chunk_documents(ds, size=CHUNK_SIZE,
                                         stride=CHUNK_STRIDE)
    q["doc_chunk_windows"] = doc_chunk_windows

    def doc_pii_scrub(sf_dir):
        """PII scrubbing (LLM-corpus prep): every document gets a
        deterministic synthetic contact line (the fixture corpus
        carries no PII of its own), then the Arrow-RE2 scrub stage
        redacts emails / IPv4s / phone-shaped numbers and counts each
        category on the pre-redaction text. The scrubbed TEXT itself is
        oracle-pinned: both engines build the identical input
        expression and share the PII_PATTERNS regex strings verbatim
        (both are RE2). The per-row formatting below is injection
        scaffolding for the contract query only — the operator
        (stages/textstage.scrub_pii) is pure Arrow C++ kernels."""
        ds = fx.driver_table(sf_dir, "documents",
                             columns=["doc_id", "text"])

        def inject(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy()
            sfx = [(" Contact user%d@example.com or call 555-%04d"
                    " from 10.%d.%d.%d."
                    % (i, (i * 7919) % 10000, i % 256, (i * 3) % 256,
                       (i * 5) % 256))
                   + (" cc user%db@example.org" % i if i % 3 == 0 else "")
                   for i in ids]
            joined = pc.binary_join_element_wise(
                b["text"], pa.array(sfx, pa.string()), "")
            return pa.table({"doc_id": b["doc_id"], "text": joined})

        return textstage.scrub_pii(
            ds.map_batches(inject, batch_format="pyarrow"))
    q["doc_pii_scrub"] = doc_pii_scrub

    def user_retention_cohorts(sf_dir):
        """Cohort retention triangle: users grouped by first-active epoch
        week, counted per week offset they return in. Active (user,
        week) pairs pre-dedupe in the block combiner (repeats never
        cross the wire; GLOBAL dedupe lands in the final count-distinct
        shuffle — block dedupe alone is not distinct across blocks),
        the user→cohort map attaches through the capped broadcast join
        (hash-join fallback past 2M users), and the triangle is one
        exact grouped COUNT(DISTINCT user)."""
        from ..util import (broadcast_inner_join, grouped_agg_vec,
                            grouped_count_distinct)
        ev = fx.driver_table(sf_dir, "events", columns=["user_id", "ts"])
        WK_US = 86400 * 10**6    # day grain: ~35 cohorts on this corpus
                                 # (week grain collapses to one)

        def wk_pairs(b: pa.Table) -> pa.Table:
            us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            t = pa.table({"user_id": b["user_id"],
                          "wk": pa.array(us // WK_US, pa.int64())})
            return t.group_by(["user_id", "wk"]).aggregate([])

        pairs = ev.map_batches(wk_pairs, batch_format="pyarrow")
        cohort = grouped_agg_vec(pairs, ["user_id"],
                                 [("wk", "min", "cohort")])
        joined = broadcast_inner_join(pairs, cohort, on="user_id")

        def offs(b: pa.Table) -> pa.Table:
            wk = b["wk"].to_numpy()
            co = b["cohort"].to_numpy()
            return pa.table({"user_id": b["user_id"],
                             "cohort_week": pa.array(co, pa.int64()),
                             "week_offset": pa.array(wk - co, pa.int64())})

        tri = joined.map_batches(offs, batch_format="pyarrow")
        return grouped_count_distinct(tri, ["cohort_week", "week_offset"],
                                      "user_id", out_col="n_users",
                                      n_buckets=64)
    q["user_retention_cohorts"] = user_retention_cohorts

    # -------- round-4 session-4: orientation / dispersion / buffer /
    # simplification (geospatial analytics over the OSM edit tables)

    def way_bearing_octants(sf_dir):
        """Street-orientation histogram (the osmnx bearing-entropy shape):
        every consecutive way segment classified into one of 8 compass
        octants with TRIG-FREE sign/magnitude comparisons on the raw
        lon/lat deltas — the identical CASE tree runs in SQL, so the
        histogram is exact (no atan2, no libm divergence). Scale shape:
        hash join to resolve coordinates, ONE bounded-bucket shuffle on
        way_id to order vertices, per-octant counts merged through the
        vectorized combiner."""
        from ..util import bucketed_group_apply, grouped_agg_vec
        wn = fx.read_fixture(sf_dir, "way_nodes")
        nodes = fx.read_fixture(sf_dir, "nodes",
                                columns=["id", "lon", "lat"]) \
                  .rename_columns({"id": "node_id"})
        j = wn.join(nodes, on=("node_id",), join_type="inner",
                    **join_kwargs(fx.table_join_partitions(
                        sf_dir, "way_nodes", "nodes")))

        def octants(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["way_id", "position"], kind="mergesort")
            wid = g["way_id"].to_numpy()
            pos = g["position"].to_numpy()
            lon = g["lon"].to_numpy()
            lat = g["lat"].to_numpy()
            same = (wid[1:] == wid[:-1]) & (pos[1:] == pos[:-1] + 1)
            dx = (lon[1:] - lon[:-1])[same]
            dy = (lat[1:] - lat[:-1])[same]
            nz = (dx != 0.0) | (dy != 0.0)
            dx, dy = dx[nz], dy[nz]
            # first-match-wins chain, mirrored verbatim in the SQL CASE
            conds = [
                (dy >= 0) & (dx > 0) & (dx >= dy),      # 0: E  (0°,45°]
                (dy > 0) & (dx >= 0) & (dy > dx),       # 1: N-ish
                (dy > 0) & (dx < 0) & (dy >= -dx),      # 2
                (dy >= 0) & (dx < 0) & (-dx > dy),      # 3: W-ish
                (dy < 0) & (dx < 0) & (-dx >= -dy),     # 4
                (dy < 0) & (dx <= 0) & (-dy > -dx),     # 5: S-ish
                (dy < 0) & (dx > 0) & (-dy >= dx),      # 6
            ]
            oc = np.select(conds, np.arange(7, dtype=np.int64),
                           default=np.int64(7))
            cnt = np.bincount(oc.astype(np.int64), minlength=8)
            nz = np.nonzero(cnt)[0]     # pre-reduce: <=8 rows per bucket
            return pd.DataFrame({"octant": nz.astype(np.int64),
                                 "n_p": cnt[nz].astype(np.int64)})

        segs = bucketed_group_apply(j, ["way_id"], octants, n_buckets=64)
        return grouped_agg_vec(segs, ["octant"],
                               [("n_p", "sum", "n_segments")])
    q["way_bearing_octants"] = way_bearing_octants

    def user_radius_gyration(sf_dir):
        """Per-user radius of gyration (trajectory dispersion, Gonzalez
        et al. human-mobility metric): mean squared deviation from the
        user's mean edit location, EXACT — coordinates quantize to an
        e4 integer grid (~11 m), the translation-invariant identity
        n·Σd² − (Σd)² runs on per-user MIN-anchored deviations so every
        partial fits int64, and the final division is integer floor on
        both engines (the n·Σ product goes through Python/HUGEINT ints,
        never floats). One bounded-bucket shuffle on the user key."""
        from ..util import bucketed_group_apply
        nodes = fx.read_fixture(sf_dir, "nodes",
                                columns=["lon", "lat", "user"])

        def rg(g: pd.DataFrame) -> pd.DataFrame:
            from ..util import typed_empty_series
            if not len(g):      # empty bucket: keep user string-typed
                return pd.DataFrame({
                    "user": typed_empty_series(g["user"].to_numpy()),
                    "n_edits": np.empty(0, np.int64),
                    "rg2_e8": np.empty(0, np.int64)})
            g = g.copy()
            g["x"] = np.floor(g["lon"].to_numpy() * 1e4 + 0.5) \
                       .astype(np.int64)
            g["y"] = np.floor(g["lat"].to_numpy() * 1e4 + 0.5) \
                       .astype(np.int64)
            gb = g.groupby("user", sort=False, dropna=False)
            g["x"] -= gb["x"].transform("min")
            g["y"] -= gb["y"].transform("min")
            g["xx"] = g["x"] * g["x"]
            g["yy"] = g["y"] * g["y"]
            a = g.groupby("user", sort=False, dropna=False) \
                 .agg(n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
                      sxx=("xx", "sum"), syy=("yy", "sum")).reset_index()
            n = a["n"].astype(object)
            num = (n * (a["sxx"].astype(object) + a["syy"].astype(object))
                   - a["sx"].astype(object) * a["sx"]
                   - a["sy"].astype(object) * a["sy"])
            rg2 = (num // (n * n)).astype(np.int64)
            return pd.DataFrame({"user": a["user"],
                                 "n_edits": a["n"].astype(np.int64),
                                 "rg2_e8": rg2})

        return bucketed_group_apply(nodes, ["user"], rg, n_buckets=64)
    q["user_radius_gyration"] = user_radius_gyration

    def cell_buffer_dilate(sf_dir):
        """Morphological BUFFER of the occupied-cell set: every grid cell
        holding at least one geo point, dilated by a Chebyshev radius of
        BUFFER_R cells (the raster analogue of a vector buffer — the
        coverage mask a tiling/render stage would precompute). Per-block
        arrow dedup bounds the explode input at distinct-cells×blocks;
        the 25-fold neighbor expansion happens AFTER the first global
        distinct, so the shuffles only ever carry cell keys."""
        from ..util import grouped_agg_vec
        g = fx.read_fixture(sf_dir, "geo", columns=["lon", "lat"])
        n = np.int64(1 << BUFFER_RES)
        offs = np.arange(-BUFFER_R, BUFFER_R + 1, dtype=np.int64)
        ox = np.repeat(offs, len(offs))
        oy = np.tile(offs, len(offs))

        def cells(b: pa.Table) -> pa.Table:
            qx, qy = geo.cell_xy(b["lon"].to_numpy(), b["lat"].to_numpy(),
                                 BUFFER_RES)
            t = pa.table({"qx": pa.array(qx, pa.int64()),
                          "qy": pa.array(qy, pa.int64())})
            return t.group_by(["qx", "qy"]).aggregate([])

        occ = grouped_agg_vec(g.map_batches(cells, batch_format="pyarrow"),
                              ["qx", "qy"], [(None, "count", "_c")])

        def dilate(b: pa.Table) -> pa.Table:
            qx = b["qx"].to_numpy()
            qy = b["qy"].to_numpy()
            dx = (qx[:, None] + ox[None, :]).ravel()
            dy = (qy[:, None] + oy[None, :]).ravel()
            np.clip(dx, 0, n - 1, out=dx)
            np.clip(dy, 0, n - 1, out=dy)
            t = pa.table({"qx": pa.array(dx, pa.int64()),
                          "qy": pa.array(dy, pa.int64())})
            return t.group_by(["qx", "qy"]).aggregate([])

        dil = grouped_agg_vec(occ.map_batches(dilate,
                                              batch_format="pyarrow"),
                              ["qx", "qy"], [(None, "count", "_c")])
        return dil.map_batches(
            lambda b: b.select(["qx", "qy"]), batch_format="pyarrow")
    q["cell_buffer_dilate"] = cell_buffer_dilate

    def way_simplify_onepass(sf_dir):
        """One-pass polyline vertex decimation (the non-iterative
        Visvalingam screen): an interior vertex survives iff the
        triangle it forms with its two neighbors has |cross product| ≥
        SIMPLIFY_MIN_CROSS in e7-integer coordinate units — endpoints
        always survive. Exact integer geometry (deltas ≤ the extract
        span keep every product inside int64), LAG/LEAD adjacency
        identical to the SQL window twin. Same bucketed per-way shuffle
        as the other trajectory kernels."""
        from ..util import bucketed_group_apply
        wn = fx.read_fixture(sf_dir, "way_nodes")
        nodes = fx.read_fixture(sf_dir, "nodes",
                                columns=["id", "lon", "lat"]) \
                  .rename_columns({"id": "node_id"})
        j = wn.join(nodes, on=("node_id",), join_type="inner",
                    **join_kwargs(fx.table_join_partitions(
                        sf_dir, "way_nodes", "nodes")))

        def simp(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["way_id", "position"], kind="mergesort")
            wid = g["way_id"].to_numpy()
            x = np.floor(g["lon"].to_numpy() * 1e7 + 0.5).astype(np.int64)
            y = np.floor(g["lat"].to_numpy() * 1e7 + 0.5).astype(np.int64)
            m = len(g)
            keep = np.ones(m, dtype=bool)
            if m >= 3:
                interior = (wid[1:-1] == wid[:-2]) & (wid[1:-1] == wid[2:])
                cross = ((x[1:-1] - x[:-2]) * (y[2:] - y[:-2])
                         - (y[1:-1] - y[:-2]) * (x[2:] - x[:-2]))
                keep[1:-1] = ~interior | (np.abs(cross)
                                          >= SIMPLIFY_MIN_CROSS)
            df = pd.DataFrame({"way_id": wid, "k": keep.astype(np.int64)})
            out = df.groupby("way_id", sort=False)["k"] \
                    .agg(["size", "sum"]).reset_index()
            return pd.DataFrame({"way_id": out["way_id"],
                                 "n_total": out["size"].astype(np.int64),
                                 "n_kept": out["sum"].astype(np.int64)})

        return bucketed_group_apply(j, ["way_id"], simp, n_buckets=64)
    q["way_simplify_onepass"] = way_simplify_onepass

    def cumulative_new_users(sf_dir):
        """Running cumulative-distinct-users curve (the growth-metric
        window): first-seen hour per user (vectorized min combiner), new
        users counted per hour, and the running total taken driver-side
        over the CALENDAR-BOUNDED hour table (≤ tens of thousands of
        rows at any corpus size — the only all-to-one step is over
        hours, never users or events)."""
        from ..util import grouped_agg_vec, grouped_count
        ev = fx.driver_table(sf_dir, "events", columns=["user_id", "ts"])
        HOUR_US = 3600 * 10**6

        def hour(b: pa.Table) -> pa.Table:
            us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            return pa.table({"user_id": b["user_id"],
                             "hr": pa.array(us // HOUR_US, pa.int64())})

        first = grouped_agg_vec(ev.map_batches(hour, batch_format="pyarrow"),
                                ["user_id"], [("hr", "min", "first_hr")])
        per_hr = grouped_count(first, "first_hr", out="n_new").to_pandas()
        per_hr = per_hr.sort_values("first_hr").reset_index(drop=True)
        return pd.DataFrame({
            "hr": per_hr["first_hr"].astype(np.int64),
            "n_new": per_hr["n_new"].astype(np.int64),
            "cum_users": per_hr["n_new"].cumsum().astype(np.int64)})
    q["cumulative_new_users"] = cumulative_new_users

    def doc_dup_ngram_counts(sf_dir):
        """Cross-document exact n-gram duplication (the substring-level
        dedup signal next to MinHash's doc-level one): per document, the
        count of distinct word 3-grams and how many of those are shared
        with at least one OTHER document. Shingles hash to 64-bit
        map-side (same blake2b kernel as decontamination — only fixed-
        width ints cross the wire, never shingle text); per-shingle doc
        counts resolve in ONE bounded-bucket shuffle whose groups carry
        the doc ids, so no second join is needed; per-doc totals merge
        through the vectorized combiner."""
        from ..functions import text as tx
        from ..util import bucketed_group_apply, grouped_agg_vec
        docs = fx.driver_table(sf_dir, "documents",
                               columns=["doc_id", "text"])

        def shingle_rows(b: pa.Table) -> pa.Table:
            ids, hs = [], []
            for i, t in zip(b["doc_id"].to_pylist(),
                            b["text"].to_pylist()):
                toks = tx.WS_RE.findall(t or "")
                if len(toks) >= 3:
                    # _shingle_hashes output is already unique per doc
                    u = tx._shingle_hashes(toks, 3).view(np.int64)
                    ids.append(np.full(len(u), i, np.int64))
                    hs.append(u)
            if not ids:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "h": pa.array([], pa.int64())})
            return pa.table({
                "doc_id": pa.array(np.concatenate(ids), pa.int64()),
                "h": pa.array(np.concatenate(hs), pa.int64())})

        rows = docs.map_batches(shingle_rows, batch_format="pyarrow")

        def mark(g: pd.DataFrame) -> pd.DataFrame:
            sz = g.groupby("h", sort=False)["doc_id"].transform("size")
            return pd.DataFrame({
                "doc_id": g["doc_id"],
                "dup": (sz >= 2).to_numpy().astype(np.int64)})

        marked = bucketed_group_apply(rows, ["h"], mark, n_buckets=64)
        return grouped_agg_vec(marked, ["doc_id"],
                               [(None, "count", "n_shingles"),
                                ("dup", "sum", "n_dup")])
    q["doc_dup_ngram_counts"] = doc_dup_ngram_counts

    def graph_degree_assortativity(sf_dir):
        """Degree assortativity of the radius graph (Newman's r over the
        directed edge list): the five sufficient statistics are EXACT
        integer sums — per-edge endpoint degrees attach through two
        capped broadcast LUT joins (hash-join fallback past 2M nodes),
        blocks pre-reduce to one partial row each, and only the final
        1-row division touches floats (identical expression tree +
        floor-e6 fixed point on both engines). Degenerate den²=0 drops
        the row on both sides."""
        import math
        from ..util import broadcast_inner_join, grouped_agg_vec, grouped_count
        pts = fx.read_fixture(sf_dir, "knn_pts")
        pairs = knn.radius_join(pts, radius_m=RADIUS_M, id_col="image_id") \
                   .select_columns(["id", "neighbor_id"])
        deg = grouped_count(pairs, "id", out="du")
        ndeg = deg.map_batches(
            lambda b: pa.table({"neighbor_id": b["id"], "dv": b["du"]}),
            batch_format="pyarrow")
        e = broadcast_inner_join(pairs, deg, on="id")
        e = broadcast_inner_join(e, ndeg, on="neighbor_id")

        def part(b: pa.Table) -> pa.Table:
            du = b["du"].to_numpy()
            dv = b["dv"].to_numpy()
            return pa.table({
                "k": pa.array([0], pa.int64()),
                "m_p": pa.array([len(du)], pa.int64()),
                "su_p": pa.array([int(du.sum())], pa.int64()),
                "sv_p": pa.array([int(dv.sum())], pa.int64()),
                "suv_p": pa.array([int((du * dv).sum())], pa.int64()),
                "su2_p": pa.array([int((du * du).sum())], pa.int64()),
                "sv2_p": pa.array([int((dv * dv).sum())], pa.int64())})

        s = grouped_agg_vec(e.map_batches(part, batch_format="pyarrow"),
                            ["k"],
                            [("m_p", "sum", "m"), ("su_p", "sum", "su"),
                             ("sv_p", "sum", "sv"), ("suv_p", "sum", "suv"),
                             ("su2_p", "sum", "su2"),
                             ("sv2_p", "sum", "sv2")]).to_pandas()
        m, su, sv = int(s["m"][0]), int(s["su"][0]), int(s["sv"][0])
        suv, su2, sv2 = int(s["suv"][0]), int(s["su2"][0]), int(s["sv2"][0])
        den_a, den_b = m * su2 - su * su, m * sv2 - sv * sv
        if den_a <= 0 or den_b <= 0:
            return pd.DataFrame({"n_edges": pd.Series([], dtype=np.int64),
                                 "s_du": pd.Series([], dtype=np.int64),
                                 "s_dudv": pd.Series([], dtype=np.int64),
                                 "s_du2": pd.Series([], dtype=np.int64),
                                 "r_e6": pd.Series([], dtype=np.int64)})
        r = float(m * suv - su * sv) / math.sqrt(float(den_a) * float(den_b))
        return pd.DataFrame({"n_edges": [m], "s_du": [su], "s_dudv": [suv],
                             "s_du2": [su2],
                             "r_e6": [int(np.floor(r * 1000000 + 0.5))]})
    q["graph_degree_assortativity"] = graph_degree_assortativity

    def lancelike_vacuum_check(sf_dir):
        """Version GC through the store: base write → copy-on-write MERGE
        → ``vacuum(keep_versions=1)`` — the superseded manifest and every
        fragment only it referenced must be GONE (pinned: re-reading the
        old version raises), while the latest version must read back
        value-identical to the relational merge (the twin). Every
        surviving file must be referenced by the kept manifest (no
        leaked strands)."""
        import shutil

        from ..sources import lancelike
        from ..util import grouped_agg_vec

        tag = os.path.basename(os.path.normpath(sf_dir))
        root = f"/tmp/graft_vacuum/{tag}"
        shutil.rmtree(root, ignore_errors=True)
        orders = fx.driver_table(sf_dir, "orders")
        man1 = lancelike.write_dataset(orders, root, stage="base",
                                       resume=False)

        upd = orders.map_batches(_orders_merge_update,
                                 batch_format="pyarrow")
        lancelike.merge_upsert(upd, root, "o_orderkey", stage="merge1")
        stats = lancelike.vacuum(root, keep_versions=1)
        if stats["removed_manifests"] < 1 or stats["removed_fragments"] < 1:
            raise AssertionError(f"vacuum reclaimed nothing: {stats}")
        try:
            lancelike.read_dataset(root, version=man1["version"])
        except FileNotFoundError:
            pass
        else:
            raise AssertionError("vacuumed version is still readable")
        kept = {f["path"] for f in lancelike.latest_manifest(root)
                ["fragments"]}
        on_disk = set()
        fdir = os.path.join(root, "fragments")
        for dirpath, _dirs, files in os.walk(fdir):
            for name in files:
                on_disk.add(os.path.relpath(os.path.join(dirpath, name),
                                            root))
        if on_disk != kept:
            raise AssertionError(
                f"orphans={on_disk - kept} missing={kept - on_disk}")

        merged = lancelike.read_dataset(
            root, columns=["o_orderpriority", "o_totalprice"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(b["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
            return pa.table({"o_orderpriority": b["o_orderpriority"],
                             "cents_p": pa.array(c, pa.int64()),
                             "n_p": pa.array(np.ones(b.num_rows, np.int64))})

        return grouped_agg_vec(
            merged.map_batches(cents, batch_format="pyarrow"),
            ["o_orderpriority"],
            [("n_p", "sum", "n"), ("cents_p", "sum", "cents")])
    q["lancelike_vacuum_check"] = lancelike_vacuum_check

    def nn_distance_stats(sf_dir):
        """Nearest-neighbor distance statistics (the Clark–Evans point-
        pattern surface): each point's 1-NN great-circle distance from
        the engine's own exact kNN join (compact-cell ring pass + guarded
        laggard rounds), floored to integer millimeters BEFORE the global
        sum/min/max so the one-row result is exact at any parallelism —
        the mean is sum_nn_mm / n_points on the consumer side."""
        from ..util import grouped_agg_vec
        pts = fx.read_fixture(sf_dir, "knn_pts")
        pairs = knn.knn_join(pts, k=1, res=11, id_col="image_id",
                             exact=True)

        def part(b: pa.Table) -> pa.Table:
            mm = np.floor(b["dist_m"].to_numpy() * 1000.0 + 0.5) \
                   .astype(np.int64)
            if not len(mm):
                return pa.table({"k": pa.array([], pa.int64()),
                                 "n_p": pa.array([], pa.int64()),
                                 "s_p": pa.array([], pa.int64()),
                                 "mn_p": pa.array([], pa.int64()),
                                 "mx_p": pa.array([], pa.int64())})
            return pa.table({"k": pa.array([0], pa.int64()),
                             "n_p": pa.array([len(mm)], pa.int64()),
                             "s_p": pa.array([int(mm.sum())], pa.int64()),
                             "mn_p": pa.array([int(mm.min())], pa.int64()),
                             "mx_p": pa.array([int(mm.max())], pa.int64())})

        s = grouped_agg_vec(pairs.map_batches(part, batch_format="pyarrow"),
                            ["k"],
                            [("n_p", "sum", "n_points"),
                             ("s_p", "sum", "sum_nn_mm"),
                             ("mn_p", "min", "min_nn_mm"),
                             ("mx_p", "max", "max_nn_mm")]).to_pandas()
        return s[["n_points", "sum_nn_mm", "min_nn_mm", "max_nn_mm"]] \
            .astype(np.int64)
    q["nn_distance_stats"] = nn_distance_stats

    def corpus_filter_funnel(sf_dir):
        """Gopher-style quality-filter FUNNEL: documents surviving each
        cumulative filter stage — minimum length, distinct-token ratio,
        modal-bigram repetition — counted per stage. The per-doc signals
        are the already-oracle-pinned repetition surface (e6 fixed-point
        on both engines, so the threshold comparisons agree exactly);
        per-block flag partials merge through the vectorized combiner,
        so the whole funnel is one streaming pass."""
        from ..stages import textstage
        from ..util import grouped_agg_vec
        docs = fx.driver_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
        stats = textstage.repetition_stats(docs)

        def flags(b: pa.Table) -> pa.Table:
            n = b["n_tokens"].to_numpy()
            dr = b["distinct_token_ratio"].to_numpy(zero_copy_only=False)
            bf = b["top_bigram_frac"].to_numpy(zero_copy_only=False)
            s1 = n >= 30
            s2 = s1 & ~np.isnan(dr) & (dr >= 0.45)
            s3 = s2 & (bf <= 0.04)
            return pa.table({
                "stage": pa.array(["s0_total", "s1_min_len",
                                   "s2_distinct_ratio", "s3_repetition"],
                                  pa.string()),
                "n_p": pa.array([len(n), int(s1.sum()), int(s2.sum()),
                                 int(s3.sum())], pa.int64())})

        return grouped_agg_vec(stats.map_batches(flags,
                                                 batch_format="pyarrow"),
                               ["stage"], [("n_p", "sum", "n_docs")])
    q["corpus_filter_funnel"] = corpus_filter_funnel

    def way_sinuosity(sf_dir):
        """Per-way sinuosity (route-directness metric): great-circle path
        length over endpoint chord, both floored to integer millimeters
        first so the inputs to the one float division are exact at any
        parallelism; the e6 ratio uses the identical cast/divide/floor
        tree in SQL. Zero-chord ways (identical endpoints) drop on both
        engines. Same bucketed per-way shuffle as the polyline kernels."""
        from ..util import bucketed_group_apply
        joined = _way_points(sf_dir)

        def sinu(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["way_id", "position"], kind="mergesort")
            wid = g["way_id"].to_numpy()
            pos = g["position"].to_numpy()
            lon = g["lon"].to_numpy()
            lat = g["lat"].to_numpy()
            same = (wid[1:] == wid[:-1]) & (pos[1:] == pos[:-1] + 1)
            d = geo.haversine_m(lon[:-1][same], lat[:-1][same],
                                lon[1:][same], lat[1:][same])
            mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
            path = pd.DataFrame({"way_id": wid[1:][same], "mm": mm}) \
                .groupby("way_id", sort=False)["mm"].sum().reset_index() \
                .rename(columns={"mm": "path_mm"})
            first = np.r_[0, np.nonzero(wid[1:] != wid[:-1])[0] + 1] \
                if len(wid) else np.empty(0, np.int64)
            last = np.r_[first[1:] - 1, len(wid) - 1] \
                if len(wid) else np.empty(0, np.int64)
            cd = geo.haversine_m(lon[first], lat[first],
                                 lon[last], lat[last])
            chord = pd.DataFrame({
                "way_id": wid[first],
                "chord_mm": np.floor(cd * 1000.0 + 0.5).astype(np.int64)})
            out = path.merge(chord, on="way_id")
            out = out[out["chord_mm"] > 0]
            s = np.floor(out["path_mm"].to_numpy().astype(np.float64)
                         / out["chord_mm"].to_numpy().astype(np.float64)
                         * 1000000 + 0.5).astype(np.int64)
            return pd.DataFrame({
                "way_id": out["way_id"].to_numpy(),
                "path_mm": out["path_mm"].to_numpy(),
                "chord_mm": out["chord_mm"].to_numpy(),
                "sinuosity_e6": s})

        return bucketed_group_apply(joined, ["way_id"], sinu, n_buckets=64)
    q["way_sinuosity"] = way_sinuosity

    def churned_users(sf_dir):
        """Churn split (the retention complement): users whose LAST event
        is more than 7 days before the corpus high-water mark vs still-
        active users. Per-user max through the vectorized combiner
        (user-bounded table), the global max is one tiny aggregate over
        it, and the split is a broadcast-scalar comparison — integer
        microseconds end to end."""
        from ..util import grouped_agg_vec
        ev = fx.driver_table(sf_dir, "events", columns=["user_id", "ts"])
        CUT_US = 7 * 86400 * 10**6

        def us(b: pa.Table) -> pa.Table:
            t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            return pa.table({"user_id": b["user_id"],
                             "ts_us": pa.array(t, pa.int64())})

        last = grouped_agg_vec(ev.map_batches(us, batch_format="pyarrow"),
                               ["user_id"], [("ts_us", "max", "last_us")]) \
            .materialize()
        gmax = int(last.max("last_us"))

        def split(b: pa.Table) -> pa.Table:
            lu = b["last_us"].to_numpy()
            ch = lu < gmax - CUT_US
            return pa.table({"k": pa.array([0], pa.int64()),
                             "c_p": pa.array([int(ch.sum())], pa.int64()),
                             "a_p": pa.array([int((~ch).sum())],
                                             pa.int64())})

        s = grouped_agg_vec(last.map_batches(split, batch_format="pyarrow"),
                            ["k"], [("c_p", "sum", "n_churned"),
                                    ("a_p", "sum", "n_active")]).to_pandas()
        return s[["n_churned", "n_active"]].astype(np.int64)
    q["churned_users"] = churned_users

    def graph_clustering_coefficient(sf_dir):
        """Global clustering coefficient of the kNN graph: 3·triangles /
        wedges, both counted EXACTLY — triangles by the degree-ordered
        node-iterator (the production `graph.triangle_count`), wedges as
        Σ deg·(deg−1)/2 over the deduped undirected edge set (degrees via
        the vectorized combiner, integer arithmetic throughout). Only the
        final 1-row ratio touches floats (identical cast/divide/floor-e6
        tree in SQL); a wedge-free graph drops the row on both sides."""
        from ray.data.aggregate import Sum
        from ..stages import graph
        from ..util import grouped_agg_vec, grouped_count
        pts = fx.read_fixture(sf_dir, "knn_pts")
        pairs = knn.knn_join(pts, k=KNN_K, res=11, id_col="image_id",
                             exact=True)

        def to_edges(b: pa.Table) -> pa.Table:
            x = b["id"].to_numpy(zero_copy_only=False)
            y = b["neighbor_id"].to_numpy(zero_copy_only=False)
            t = pa.table({"a": pa.array(np.where(x < y, x, y)),
                          "b": pa.array(np.where(x < y, y, x))})
            return t.group_by(["a", "b"]).aggregate([])

        canon = pairs.map_batches(to_edges, batch_format="pyarrow") \
            .materialize()   # feeds BOTH the triangle count and degrees
        n_tri = graph.triangle_count(canon)
        # global dedupe of the undirected edge set, then degree counts
        edges = grouped_agg_vec(canon, ["a", "b"],
                                [(None, "count", "_c")])

        def endpoints(b: pa.Table) -> pa.Table:
            return pa.table({"node": pa.concat_arrays(
                [b["a"].combine_chunks(), b["b"].combine_chunks()])})

        deg = grouped_count(edges.map_batches(endpoints,
                                              batch_format="pyarrow"),
                            "node", out="deg")

        def wedge_part(b: pa.Table) -> pa.Table:
            d = b["deg"].to_numpy()
            return pa.table({"w_p": pa.array([int((d * (d - 1) // 2).sum())],
                                             pa.int64())})

        n_wedges = int(deg.map_batches(wedge_part, batch_format="pyarrow")
                       .aggregate(Sum("w_p", alias_name="w"))["w"])
        if n_wedges <= 0:
            return pd.DataFrame({
                "n_triangles": pd.Series([], dtype=np.int64),
                "n_wedges": pd.Series([], dtype=np.int64),
                "global_cc_e6": pd.Series([], dtype=np.int64)})
        cc = float(3 * n_tri) / float(n_wedges)
        return pd.DataFrame({"n_triangles": [int(n_tri)],
                             "n_wedges": [n_wedges],
                             "global_cc_e6":
                                 [int(np.floor(cc * 1000000 + 0.5))]})
    q["graph_clustering_coefficient"] = graph_clustering_coefficient

    def hourly_anomaly_hours(sf_dir):
        """Exact-integer anomaly detection: per event type, the hours
        whose count sits more than 2 population standard deviations from
        that type's hourly mean. The z² > 4 test is cross-multiplied to
        pure integers — (cnt·H − T)² > 4·(SS·H − T²) — so there is NO
        float anywhere and both engines agree exactly even at the
        threshold. Counts come from the vectorized combiner; the per-type
        screen runs in a bounded bucket shuffle over the calendar-bounded
        count table (Python-int products, overflow-free at any scale)."""
        from ..util import bucketed_group_apply, grouped_agg_vec
        ev = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "ts"])
        HOUR_US = 3600 * 10**6

        def hr(b: pa.Table) -> pa.Table:
            t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            return pa.table({"event_type": b["event_type"],
                             "hour_idx": pa.array(t // HOUR_US, pa.int64())})

        counts = grouped_agg_vec(ev.map_batches(hr, batch_format="pyarrow"),
                                 ["event_type", "hour_idx"],
                                 [(None, "count", "cnt")])

        def screen(g: pd.DataFrame) -> pd.DataFrame:
            from ..util import typed_empty_series
            if not len(g):
                return pd.DataFrame({
                    "event_type": typed_empty_series(
                        g["event_type"].to_numpy()),
                    "hour_idx": np.empty(0, np.int64),
                    "cnt": np.empty(0, np.int64)})
            c = g["cnt"].astype(object)   # Python ints: overflow-free
            gb = g.groupby("event_type", sort=False)
            h = gb["cnt"].transform("size").astype(object)
            t = c.groupby(g["event_type"]).transform("sum")
            ss = (c * c).groupby(g["event_type"]).transform("sum")
            dev = c * h - t
            keep = (dev * dev > 4 * (ss * h - t * t)).to_numpy(
                dtype=bool)
            out = g[keep]
            return pd.DataFrame({
                "event_type": out["event_type"].to_numpy(),
                "hour_idx": out["hour_idx"].to_numpy().astype(np.int64),
                "cnt": out["cnt"].to_numpy().astype(np.int64)})

        return bucketed_group_apply(counts, ["event_type"], screen,
                                    n_buckets=8)
    q["hourly_anomaly_hours"] = hourly_anomaly_hours

    def lancelike_add_column_check(sf_dir):
        """Schema evolution through the store (ALTER TABLE ADD COLUMN with
        backfill): base write of orders → ``add_column`` computes an
        integer price band per row (exact cents arithmetic) as a NEW
        column in a NEW committed version → the evolved table reads back
        and aggregates per band, pinned against the relational twin. The
        pre-evolution version must still be readable with the OLD schema
        (copy-on-write), and the rewrite is row-count-verified per
        fragment."""
        import shutil

        from ..sources import lancelike
        from ..util import grouped_agg_vec

        tag = os.path.basename(os.path.normpath(sf_dir))
        root = f"/tmp/graft_addcol/{tag}"
        shutil.rmtree(root, ignore_errors=True)
        orders = fx.driver_table(sf_dir, "orders")
        man1 = lancelike.write_dataset(orders, root, stage="base",
                                       resume=False)

        def with_band(t: pa.Table) -> pa.Table:
            cents = np.floor(t["o_totalprice"].to_numpy(
                zero_copy_only=False) * 100 + 0.5).astype(np.int64)
            return t.append_column(
                "price_band", pa.array(cents // 5_000_000, pa.int64()))

        man2 = lancelike.add_column(root, stage="band", compute=with_band)
        if man2["version"] != man1["version"] + 1:
            raise AssertionError("add_column must commit a new version")
        old = lancelike.read_dataset(root, version=man1["version"])
        if "price_band" in old.schema().names:
            raise AssertionError("old version gained the new column")
        if old.count() != man1["total_rows"]:
            raise AssertionError("old version changed under evolution")

        evolved = lancelike.read_dataset(
            root, columns=["price_band", "o_totalprice"])

        def agg(b: pa.Table) -> pa.Table:
            cents = np.floor(b["o_totalprice"].to_numpy(
                zero_copy_only=False) * 100 + 0.5).astype(np.int64)
            return pa.table({"price_band": b["price_band"],
                             "cents_p": pa.array(cents, pa.int64()),
                             "n_p": pa.array(np.ones(b.num_rows,
                                                     np.int64))})

        return grouped_agg_vec(
            evolved.map_batches(agg, batch_format="pyarrow"),
            ["price_band"],
            [("n_p", "sum", "n"), ("cents_p", "sum", "cents")])
    q["lancelike_add_column_check"] = lancelike_add_column_check

    def top_next_token(sf_dir):
        """Conditional bigram completion table (the count side of a
        bigram language model): for each token, its top-3 next tokens by
        corpus count, ties to the lexicographically smaller successor.
        Block-local Counter partials merge through the vectorized
        combiner; the per-token head(3) is the distributed QUALIFY
        machinery (`grouped_topk` — O(groups×k) per block through the
        shuffle)."""
        from collections import Counter

        from ..functions import text
        from ..util import grouped_agg_vec, grouped_topk
        ds = fx.driver_table(sf_dir, "documents", columns=["text"])

        def pairs(b: pa.Table) -> pa.Table:
            cb: Counter = Counter()
            for t in b["text"].to_pylist():
                toks = text.WS_RE.findall(t or "")
                cb.update(zip(toks, toks[1:]))
            w1, w2 = zip(*cb.keys()) if cb else ((), ())
            return pa.table({"w1": pa.array(list(w1), pa.string()),
                             "w2": pa.array(list(w2), pa.string()),
                             "c_p": pa.array(list(cb.values()), pa.int64())})

        counts = grouped_agg_vec(ds.map_batches(pairs,
                                                batch_format="pyarrow"),
                                 ["w1", "w2"], [("c_p", "sum", "c")])
        return grouped_topk(counts, ["w1"], 3,
                            [("c", "desc"), ("w2", "asc")], n_buckets=64)
    q["top_next_token"] = top_next_token

    def doc_keyword_and_search(sf_dir):
        """Conjunctive keyword retrieval (the boolean-AND search
        primitive): documents containing ALL query tokens, with the
        total occurrence count of the query tokens per matching doc.
        Map-only — the tiny query vocabulary is a constant, membership
        is a vectorized per-doc set check, zero shuffles at any corpus
        size."""
        from ..functions import text
        docs = fx.driver_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
        terms = list(SEARCH_TOKENS)

        def match(b: pa.Table) -> pa.Table:
            ids, hits = [], []
            for i, t in zip(b["doc_id"].to_pylist(),
                            b["text"].to_pylist()):
                toks = text.WS_RE.findall(t or "")
                n = 0
                ok = True
                for q in terms:
                    c = toks.count(q)
                    if c == 0:
                        ok = False
                        break
                    n += c
                if ok:
                    ids.append(i)
                    hits.append(n)
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "n_occurrences": pa.array(hits, pa.int64())})

        return docs.map_batches(match, batch_format="pyarrow")
    q["doc_keyword_and_search"] = doc_keyword_and_search

    def cell_amenity_diversity(sf_dir):
        """Spatial diversity index: distinct amenity kinds per grid cell
        (the land-use-mix surface a tiling stage would color by) —
        amenity-tagged nodes resolve coordinates through the hash join,
        cells quantize map-side, and the exact per-cell COUNT(DISTINCT)
        runs through the tuple-dedup combiner. Cells with at least two
        kinds are emitted (the 'mixed-use' screen)."""
        from ..util import grouped_count_distinct
        tags = fx.read_fixture(sf_dir, "tags",
                               columns=["elem_id", "key", "value"]) \
            .filter(expr="key == 'amenity'") \
            .rename_columns({"elem_id": "id"})
        nodes = fx.read_fixture(sf_dir, "nodes",
                                columns=["id", "lon", "lat"])
        j = tags.join(nodes, on=("id",), join_type="inner",
                      **join_kwargs(fx.table_join_partitions(
                          sf_dir, "tags", "nodes")))

        def cells(b: pa.Table) -> pa.Table:
            qx, qy = geo.cell_xy(b["lon"].to_numpy(), b["lat"].to_numpy(),
                                 TILE_RES)
            return pa.table({"qx": pa.array(qx, pa.int64()),
                             "qy": pa.array(qy, pa.int64()),
                             "value": b["value"]})

        div = grouped_count_distinct(
            j.map_batches(cells, batch_format="pyarrow"),
            ["qx", "qy"], "value", out_col="n_kinds", n_buckets=64)
        return div.filter(expr="n_kinds >= 2")
    q["cell_amenity_diversity"] = cell_amenity_diversity

    def cell_edit_delta(sf_dir):
        """Temporal change-detection raster: per-cell edit counts in the
        first vs second half of the corpus time range (the before/after
        map-algebra difference a monitoring pipeline renders). The
        cutoff is exact integer-µs midpoint arithmetic; per-block
        min/max partials feed one tiny aggregate (never a row-walked
        ray aggregate over data volume); per-cell early/late sums merge
        through the vectorized combiner."""
        from ray.data.aggregate import Max, Min
        from ..util import grouped_agg_vec
        nodes = fx.read_fixture(sf_dir, "nodes",
                                columns=["lon", "lat", "timestamp"])

        def us_part(b: pa.Table) -> pa.Table:
            t = b["timestamp"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
            if not len(t):
                return pa.table({"mn_p": pa.array([], pa.int64()),
                                 "mx_p": pa.array([], pa.int64())})
            return pa.table({"mn_p": pa.array([int(t.min())], pa.int64()),
                             "mx_p": pa.array([int(t.max())], pa.int64())})

        mm = nodes.map_batches(us_part, batch_format="pyarrow") \
            .aggregate(Min("mn_p", alias_name="mn"),
                       Max("mx_p", alias_name="mx"))
        cutoff = (int(mm["mn"]) + int(mm["mx"])) // 2

        def cells(b: pa.Table) -> pa.Table:
            t = b["timestamp"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
            qx, qy = geo.cell_xy(b["lon"].to_numpy(), b["lat"].to_numpy(),
                                 OD_RES)
            early = (t <= cutoff).astype(np.int64)
            return pa.table({"qx": pa.array(qx, pa.int64()),
                             "qy": pa.array(qy, pa.int64()),
                             "e_p": pa.array(early, pa.int64()),
                             "l_p": pa.array(1 - early, pa.int64())})

        agg = grouped_agg_vec(nodes.map_batches(cells,
                                                batch_format="pyarrow"),
                              ["qx", "qy"],
                              [("e_p", "sum", "n_early"),
                               ("l_p", "sum", "n_late")])

        def delta(b: pa.Table) -> pa.Table:
            d = b["n_late"].to_numpy() - b["n_early"].to_numpy()
            return b.append_column("delta", pa.array(d, pa.int64()))

        return agg.map_batches(delta, batch_format="pyarrow")
    q["cell_edit_delta"] = cell_edit_delta

    def fuzzy_street_pairs(sf_dir):
        """Edit-distance-1 join over the distinct street-name vocabulary
        (the fuzzy-dedup screen feeding canonicalization): distinct names
        reduce DISTRIBUTED (combiner distinct — the vocabulary is the
        dimension side, capped with a loud raise), then the pair scan
        runs per length bucket — equal lengths as one vectorized char-
        matrix mismatch count, adjacent lengths as a two-pointer deletion
        check — which is exactly levenshtein = 1 (the SQL twin's
        predicate) without a full DP."""
        from ..util import grouped_count
        tags = fx.read_fixture(sf_dir, "tags", columns=["key", "value"]) \
            .filter(expr="key == 'addr:street'")
        vals = grouped_count(tags, "value").to_pandas()["value"].tolist()
        names = sorted(vals)
        by_len: dict[int, list[str]] = {}
        for nm in names:
            by_len.setdefault(len(nm), []).append(nm)
        # the pair scan is O(bucket²·L) — cap the per-LENGTH bucket (the
        # quantity that actually drives cost), not just the vocabulary
        # (review finding: a 200k global cap never bounded the matrix)
        big = {L: len(b) for L, b in by_len.items() if len(b) > 20_000}
        if big:
            raise ValueError(f"same-length name buckets exceed the pair-"
                             f"scan cap (20k): {big}; shard the scan")
        out_a, out_b = [], []
        for L, bucket in by_len.items():
            if L > 0 and len(bucket) > 1:   # substitution: same length
                arr = np.array(bucket, dtype=f"U{L}")
                m = arr.view(np.uint32).reshape(len(bucket), L)
                step = max(1, (64 << 20) // max(1, len(bucket) * L))
                for r0 in range(0, len(bucket), step):
                    # row-tiled so the (rows, B, L) cube stays ≤ ~64 MB
                    mism = (m[r0:r0 + step, None, :]
                            != m[None, :, :]).sum(axis=2)
                    ii, jj = np.nonzero(mism == 1)
                    for i, j in zip((ii + r0).tolist(), jj.tolist()):
                        if i < j:
                            out_a.append(bucket[i])
                            out_b.append(bucket[j])
            for b in by_len.get(L + 1, []):  # deletion: len differs by 1
                for a in bucket:
                    k = 0
                    while k < L and a[k] == b[k]:
                        k += 1
                    if a[k:] == b[k + 1:]:
                        x, y = (a, b) if a < b else (b, a)
                        out_a.append(x)
                        out_b.append(y)
        return pd.DataFrame({"name_a": pd.Series(out_a, dtype=object),
                             "name_b": pd.Series(out_b, dtype=object)})
    q["fuzzy_street_pairs"] = fuzzy_street_pairs

    def way_self_intersections(sf_dir):
        """Geometry validity audit: per way, the count of STRICTLY
        crossing non-adjacent segment pairs (a self-intersecting
        polyline is invalid as a boundary). Uses the repo's shared
        d1·d2<0 ∧ d3·d4<0 float convention (identical expression text
        in the SQL self-join); the per-way pair matrix is bounded by
        the way's own vertex count inside the bucketed shuffle."""
        from ..util import bucketed_group_apply, typed_empty_series
        joined = _way_points(sf_dir)

        def selfx(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["way_id", "position"], kind="mergesort")
            wid = g["way_id"].to_numpy()
            pos = g["position"].to_numpy()
            x = g["lon"].to_numpy()
            y = g["lat"].to_numpy()
            same = (wid[1:] == wid[:-1]) & (pos[1:] == pos[:-1] + 1)
            sw = wid[1:][same]
            x1 = x[:-1][same]
            y1 = y[:-1][same]
            x2 = x[1:][same]
            y2 = y[1:][same]
            sp = pos[:-1][same]
            out_w, out_n = [], []
            starts = (np.r_[0, np.nonzero(sw[1:] != sw[:-1])[0] + 1]
                      if len(sw) else np.empty(0, np.int64))
            ends = np.r_[starts[1:], len(sw)] if len(sw) \
                else np.empty(0, np.int64)
            for s0, s1 in zip(starts.tolist(), ends.tolist()):
                k = s1 - s0
                if k < 3:
                    continue
                ax1, ay1 = x1[s0:s1], y1[s0:s1]
                ax2, ay2 = x2[s0:s1], y2[s0:s1]
                # s = row segment, e = column segment — the crossing
                # twin's exact float trees, self-joined
                d1 = ((ax2 - ax1)[:, None] * (ay1[None, :] - ay1[:, None])
                      - (ay2 - ay1)[:, None] * (ax1[None, :] - ax1[:, None]))
                d2 = ((ax2 - ax1)[:, None] * (ay2[None, :] - ay1[:, None])
                      - (ay2 - ay1)[:, None] * (ax2[None, :] - ax1[:, None]))
                d3 = ((ax2 - ax1)[None, :] * (ay1[:, None] - ay1[None, :])
                      - (ay2 - ay1)[None, :] * (ax1[:, None] - ax1[None, :]))
                d4 = ((ax2 - ax1)[None, :] * (ay2[:, None] - ay1[None, :])
                      - (ay2 - ay1)[None, :] * (ax2[:, None] - ax1[None, :]))
                cross = (d1 * d2 < 0) & (d3 * d4 < 0)
                p = sp[s0:s1]
                nonadj = (p[None, :] - p[:, None]) >= 2
                n = int((cross & nonadj).sum())
                if n:
                    out_w.append(sw[s0])
                    out_n.append(n)
            return pd.DataFrame({
                "way_id": np.array(out_w, np.int64) if out_w
                else typed_empty_series(sw),
                "n_self_crossings": np.array(out_n, np.int64)})

        return bucketed_group_apply(joined, ["way_id"], selfx,
                                    n_buckets=64)
    q["way_self_intersections"] = way_self_intersections

    def user_activity_gini(sf_dir):
        """Contribution-inequality (Gini) over per-user event counts, the
        participation-skew metric of crowd-sourced corpora: the sorted-
        rank numerator Σ(2i−n−1)·x₍ᵢ₎ is EXACT integer arithmetic (tie
        order provably irrelevant — equal x under a linear-in-i weight),
        counts reduce through the vectorized combiner, and only the
        final 1-row ratio touches floats (identical cast/divide/floor-e6
        tree). The sort runs on the user-BOUNDED count table (dimension
        side), never on events."""
        from ..util import grouped_count
        ev = fx.driver_table(sf_dir, "events", columns=["user_id"])
        counts = grouped_count(ev, "user_id").to_pandas()
        x = np.sort(counts["cnt"].to_numpy().astype(np.int64))
        n = len(x)
        if n == 0:
            return pd.DataFrame({
                "n_users": pd.Series([], dtype=np.int64),
                "total_events": pd.Series([], dtype=np.int64),
                "gini_num": pd.Series([], dtype=np.int64),
                "gini_e6": pd.Series([], dtype=np.int64)})
        t = int(x.sum())
        i = np.arange(1, n + 1, dtype=object)
        num = int(((2 * i - n - 1) * x.astype(object)).sum())
        g6 = int(np.floor(float(num) / float(n * t) * 1000000 + 0.5))
        return pd.DataFrame({"n_users": [n], "total_events": [t],
                             "gini_num": [num], "gini_e6": [g6]})
    q["user_activity_gini"] = user_activity_gini

    def anchor_nearest_points(sf_dir):
        """Bichromatic nearest-neighbor top-k: for each of the fixed
        query anchors, the 5 closest points by great-circle distance —
        the broadcast-small-query-side NN shape (anchors are constants;
        per-block (anchor, point) distances floor to integer mm
        map-side, the per-anchor head(5) is the distributed QUALIFY
        pre-reduce, so only ≤ anchors×k rows per block cross the
        shuffle)."""
        from ..util import grouped_topk
        pts = fx.read_fixture(sf_dir, "knn_pts")
        aid = np.arange(len(ANCHORS), dtype=np.int64)
        alon = np.array([a[0] for a in ANCHORS])
        alat = np.array([a[1] for a in ANCHORS])

        def dists(b: pa.Table) -> pa.Table:
            lon = b["lon"].to_numpy()
            lat = b["lat"].to_numpy()
            d = geo.haversine_m(alon[:, None], alat[:, None],
                                lon[None, :], lat[None, :])
            mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
            ids = b["image_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "anchor_id": pa.array(np.repeat(aid, len(lon)), pa.int64()),
                # explicit type: an empty object array infers Arrow null
                "image_id": pa.array(np.tile(ids, len(aid)), pa.string()),
                "d_mm": pa.array(mm.ravel(), pa.int64())})

        expl = pts.map_batches(dists, batch_format="pyarrow")
        return grouped_topk(expl, ["anchor_id"], 5,
                            [("d_mm", "asc"), ("image_id", "asc")],
                            n_buckets=8)
    q["anchor_nearest_points"] = anchor_nearest_points

    def user_longest_streak(sf_dir):
        """Longest consecutive-day activity streak per user (the classic
        gaps-and-islands MAX run): active (user, day) pairs dedupe in
        the block combiner, then day − rank inside the per-user bucket
        labels each island and the longest one wins. Integer days end to
        end; users with a streak ≥ 2 are emitted (the single-day floor
        keeps the result non-trivial)."""
        from ..util import bucketed_group_apply, grouped_agg_vec
        ev = fx.driver_table(sf_dir, "events", columns=["user_id", "ts"])
        DAY_US = 86400 * 10**6

        def days(b: pa.Table) -> pa.Table:
            t = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            tt = pa.table({"user_id": b["user_id"],
                           "day": pa.array(t // DAY_US, pa.int64())})
            return tt.group_by(["user_id", "day"]).aggregate([])

        pairs = grouped_agg_vec(ev.map_batches(days, batch_format="pyarrow"),
                                ["user_id", "day"], [(None, "count", "_c")])

        def streaks(g: pd.DataFrame) -> pd.DataFrame:
            from ..util import typed_empty_series
            if not len(g):
                return pd.DataFrame({
                    "user_id": typed_empty_series(g["user_id"].to_numpy()),
                    "longest_streak": np.empty(0, np.int64)})
            g = g.sort_values(["user_id", "day"], kind="mergesort")
            isl = g["day"].to_numpy() - g.groupby("user_id", sort=False) \
                .cumcount().to_numpy()
            runs = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                                 "isl": isl}) \
                .groupby(["user_id", "isl"], sort=False).size() \
                .reset_index(name="run")
            out = runs.groupby("user_id", sort=False)["run"].max() \
                .reset_index(name="longest_streak")
            out = out[out["longest_streak"] >= 2]
            return pd.DataFrame({
                "user_id": out["user_id"].to_numpy(),
                "longest_streak":
                    out["longest_streak"].to_numpy().astype(np.int64)})

        return bucketed_group_apply(pairs, ["user_id"], streaks,
                                    n_buckets=64)
    q["user_longest_streak"] = user_longest_streak

    def geohash_cells(sf_dir):
        """Base32 geohash encoding (precision 6) of every point — the
        third spatial index family next to the Morton cell ids and the
        axial hex bins. Pure integer bit interleaving (15 lon bits over
        15 lat bits, lon first) and an alphabet gather, vectorized; the
        SQL twin expands the identical interleave as a 30-term integer
        sum and the same quantization float trees, so the STRING hashes
        are value-pinned."""
        pts = fx.read_fixture(sf_dir, "knn_pts")
        B = 15
        alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
        lut = np.array(list(alpha))

        def enc(b: pa.Table) -> pa.Table:
            lon = b["lon"].to_numpy()
            lat = b["lat"].to_numpy()
            n = np.int64(1) << np.int64(B)
            qlon = np.clip(np.floor((lon + 180.0) / 360.0 * n)
                           .astype(np.int64), 0, n - 1)
            qlat = np.clip(np.floor((lat + 90.0) / 180.0 * n)
                           .astype(np.int64), 0, n - 1)
            v = np.zeros(len(lon), np.int64)
            for i in range(B):
                v |= ((qlon >> i) & 1) << (2 * i + 1)
                v |= ((qlat >> i) & 1) << (2 * i)
            chars = [lut[(v >> (25 - 5 * k)) & 31] for k in range(6)]
            gh = chars[0]
            for c in chars[1:]:
                gh = np.char.add(gh, c)
            return pa.table({"image_id": b["image_id"],
                             "gh6": pa.array(gh.tolist(), pa.string())})

        return pts.map_batches(enc, batch_format="pyarrow")
    q["geohash_cells"] = geohash_cells

    def way_orientation_entropy(sf_dir):
        """Per-way orientation entropy (the street-grid 'griddedness'
        score of Boeing's bearing-entropy analysis): Shannon entropy of
        each way's segment-octant distribution, built on the trig-free
        octant CASE tree. The p·ln p sum runs over the 8 octants in
        FIXED order on both engines (numpy sums ≤8 columns sequentially;
        absent octants contribute exact +0.0 identities, matching
        DuckDB's present-only list_sum ORDER BY octant), so e6 rounding
        pins the float."""
        from ..util import bucketed_group_apply, typed_empty_series
        joined = _way_points(sf_dir)

        def ent(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["way_id", "position"], kind="mergesort")
            wid = g["way_id"].to_numpy()
            pos = g["position"].to_numpy()
            lon = g["lon"].to_numpy()
            lat = g["lat"].to_numpy()
            same = (wid[1:] == wid[:-1]) & (pos[1:] == pos[:-1] + 1)
            sw = wid[1:][same]
            dx = (lon[1:] - lon[:-1])[same]
            dy = (lat[1:] - lat[:-1])[same]
            nz = (dx != 0.0) | (dy != 0.0)
            sw, dx, dy = sw[nz], dx[nz], dy[nz]
            if not len(sw):
                return pd.DataFrame({
                    "way_id": typed_empty_series(wid),
                    "n_segments": np.empty(0, np.int64),
                    "entropy_e6": np.empty(0, np.int64)})
            conds = [
                (dy >= 0) & (dx > 0) & (dx >= dy),
                (dy > 0) & (dx >= 0) & (dy > dx),
                (dy > 0) & (dx < 0) & (dy >= -dx),
                (dy >= 0) & (dx < 0) & (-dx > dy),
                (dy < 0) & (dx < 0) & (-dx >= -dy),
                (dy < 0) & (dx <= 0) & (-dy > -dx),
                (dy < 0) & (dx > 0) & (-dy >= dx),
            ]
            oc = np.select(conds, np.arange(7, dtype=np.int64),
                           default=np.int64(7))
            piv = pd.DataFrame({"way_id": sw, "oc": oc}) \
                .groupby(["way_id", "oc"], sort=False).size() \
                .unstack(fill_value=0) \
                .reindex(columns=range(8), fill_value=0)
            c = piv.to_numpy(dtype=np.float64)
            n = c.sum(axis=1)
            p = c / n[:, None]
            terms = np.where(c > 0, p * np.log(np.where(c > 0, p, 1.0)),
                             0.0)
            h = terms.sum(axis=1)
            return pd.DataFrame({
                "way_id": piv.index.to_numpy().astype(np.int64),
                "n_segments": n.astype(np.int64),
                "entropy_e6": np.floor(-h * 1e6 + 0.5).astype(np.int64)})

        return bucketed_group_apply(joined, ["way_id"], ent, n_buckets=64)
    q["way_orientation_entropy"] = way_orientation_entropy

    def lancelike_mor_delete_check(sf_dir):
        """Merge-on-read DELETE through the store (the second delete
        strategy next to copy-on-write): tombstone keys commit with ZERO
        data I/O — pinned by asserting the new version references the
        IDENTICAL fragment files — while reads apply the anti-join at
        scan time (including under column pruning that drops the key
        column). CoW mutators must refuse while tombstones are pending;
        ``apply_tombstones`` then materializes them and the re-read must
        equal the merge-on-read answer row-for-row. The twin is the
        relational complement (same as the CoW delete check)."""
        import shutil

        from ..sources import lancelike
        from ..util import grouped_agg_vec

        tag = os.path.basename(os.path.normpath(sf_dir))
        root = f"/tmp/graft_mor/{tag}"
        shutil.rmtree(root, ignore_errors=True)
        orders = fx.driver_table(sf_dir, "orders")
        man1 = lancelike.write_dataset(orders, root, stage="base",
                                       resume=False)

        def keys(b: pa.Table) -> pa.Table:
            kk = b["o_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table({"o_orderkey":
                             pa.array(kk[kk % 11 == 0], pa.int64())})

        man2 = lancelike.delete_by_keys_mor(
            orders.map_batches(keys, batch_format="pyarrow"),
            root, "o_orderkey", stage="mor1")
        f1 = {f["path"] for f in man1["fragments"]}
        f2 = {f["path"] for f in man2["fragments"]}
        if f1 != f2:
            raise AssertionError("MoR delete must not touch data "
                                 "fragments")
        try:
            lancelike.compact(root, stage="nope")
        except ValueError:
            pass
        else:
            raise AssertionError("compact must refuse pending tombstones")

        def agg_of(ds):
            def cents(b: pa.Table) -> pa.Table:
                c = np.floor(b["o_totalprice"].to_numpy(
                    zero_copy_only=False) * 100 + 0.5).astype(np.int64)
                return pa.table({"o_orderstatus": b["o_orderstatus"],
                                 "cents_p": pa.array(c, pa.int64()),
                                 "n_p": pa.array(np.ones(b.num_rows,
                                                         np.int64))})
            out = grouped_agg_vec(
                ds.map_batches(cents, batch_format="pyarrow"),
                ["o_orderstatus"],
                [("n_p", "sum", "n"), ("cents_p", "sum", "cents")]) \
                .to_pandas()
            return out.sort_values("o_orderstatus").reset_index(drop=True)

        mor = agg_of(lancelike.read_dataset(
            root, columns=["o_orderstatus", "o_totalprice"]))
        man3 = lancelike.apply_tombstones(root, stage="mat")
        if man3.get("tombstones"):
            raise AssertionError("apply_tombstones left tombstones")
        cow = agg_of(lancelike.read_dataset(
            root, columns=["o_orderstatus", "o_totalprice"]))
        if not mor.equals(cow):
            raise AssertionError("materialized delete diverged from the "
                                 "merge-on-read scan")
        return mor
    q["lancelike_mor_delete_check"] = lancelike_mor_delete_check

    def lancelike_version_diff_check(sf_dir):
        """CDC snapshot diff through the store (Delta CDF / Iceberg
        changelog shape): base version → copy-on-write DELETE (%11 keys)
        → MERGE (the shared update recipe) → ``version_diff(v1, v3)``
        classifying every key as added / removed / changed in ONE
        bucketed shuffle over (key, compared columns). The twin derives
        the same three classes relationally: added = the NEWROW keys,
        removed = deleted keys the merge did not re-add, changed = every
        %7 key (replaced with a doubled price, including re-added ones)."""
        import shutil

        from ..sources import lancelike
        from ..util import grouped_agg_vec

        tag = os.path.basename(os.path.normpath(sf_dir))
        root = f"/tmp/graft_vdiff/{tag}"
        shutil.rmtree(root, ignore_errors=True)
        orders = fx.driver_table(sf_dir, "orders")
        man1 = lancelike.write_dataset(orders, root, stage="base",
                                       resume=False)

        def keys(b: pa.Table) -> pa.Table:
            kk = b["o_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table({"o_orderkey":
                             pa.array(kk[kk % 11 == 0], pa.int64())})

        lancelike.delete_by_keys(
            orders.map_batches(keys, batch_format="pyarrow"),
            root, "o_orderkey", stage="del")
        upd = orders.map_batches(_orders_merge_update,
                                 batch_format="pyarrow")
        man3 = lancelike.merge_upsert(upd, root, "o_orderkey",
                                      stage="merge")
        diff = lancelike.version_diff(root, man1["version"],
                                      man3["version"], "o_orderkey")
        return grouped_agg_vec(diff, ["change"], [(None, "count", "n")])
    q["lancelike_version_diff_check"] = lancelike_version_diff_check

    def dau_wau_stickiness(sf_dir):
        """DAU/WAU stickiness table (the product-analytics engagement
        ratio): per day, the exact distinct daily actives and the
        distinct actives of the trailing 7-day window ending that day.
        Distinct (user, day) pairs dedupe in the combiner; each pair
        replicates to the ≤7 windows it covers and the exact tuple-
        dedup combiner resolves window distincts — no self-join."""
        from ray.data.aggregate import Max

        from ..util import (grouped_agg_vec, grouped_count_distinct,
                            join_kwargs)
        ev = fx.driver_table(sf_dir, "events",
                             columns=["user_id", "ts"])

        def days(b: pa.Table) -> pa.Table:
            d = pc.cast(b["ts"], pa.int64()).to_numpy() \
                // 86_400_000_000
            return pa.table({"user_id": b["user_id"],
                             "day": pa.array(d, pa.int64())})

        ud = grouped_agg_vec(
            ev.map_batches(days, batch_format="pyarrow"),
            ["user_id", "day"], [(None, "count", "x")]) \
            .drop_columns(["x"]).materialize()
        mx = int(ud.aggregate(Max("day", alias_name="m"))["m"])
        dau = grouped_agg_vec(ud, ["day"], [(None, "count", "dau")])

        def windows(b: pa.Table) -> pa.Table:
            d = b["day"].to_numpy()
            u = b["user_id"].to_numpy()
            w = (np.repeat(d, 7)
                 + np.tile(np.arange(7, dtype=np.int64), len(d)))
            uu = np.repeat(u, 7)
            keep = w <= mx
            return pa.table({"wday": pa.array(w[keep], pa.int64()),
                             "user_id": pa.array(uu[keep], pa.int64())})

        wau = grouped_count_distinct(
            ud.map_batches(windows, batch_format="pyarrow"),
            ["wday"], "user_id", out_col="wau", n_buckets=16)

        def retype(b: pa.Table) -> pa.Table:
            # pandas blocks out of the bucketed distinct: re-type to
            # arrow AND rename (rename_columns on a pandas block crashes
            # Ray's Project operator)
            return pa.table({"day": pc.cast(b["wday"], pa.int64()),
                             "wau": pc.cast(b["wau"], pa.int64())})

        wau = wau.map_batches(retype, batch_format="pyarrow")
        return dau.join(wau, on=("day",), join_type="inner",
                        num_partitions=4)
    q["dau_wau_stickiness"] = dau_wau_stickiness

    def polygon_compactness(sf_dir):
        """Polsby-Popper compactness per polygon (4πA/P², the
        gerrymander/shape-regularity score): shoelace area on EXACT
        e7-integer coords, perimeter as an integer sum of per-edge
        floor-e2 lengths (each sqrt fixes to an int before summation —
        order-free), and one mirrored float expression for the final
        e6 ratio."""
        edges = fx.read_fixture(sf_dir, "edges")

        def comp(b: pa.Table) -> pa.Table:
            x1 = np.floor(b["x1"].to_numpy() * 1e7 + 0.5) \
                .astype(np.int64)
            y1 = np.floor(b["y1"].to_numpy() * 1e7 + 0.5) \
                .astype(np.int64)
            x2 = np.floor(b["x2"].to_numpy() * 1e7 + 0.5) \
                .astype(np.int64)
            y2 = np.floor(b["y2"].to_numpy() * 1e7 + 0.5) \
                .astype(np.int64)
            cross = x1 * y2 - x2 * y1
            dx, dy = x2 - x1, y2 - y1
            ln2 = np.floor(np.sqrt((dx * dx + dy * dy)
                                   .astype(np.float64)) * 100 + 0.5) \
                .astype(np.int64)
            return pa.table({"polygon_id": b["polygon_id"],
                             "cr_p": pa.array(cross, pa.int64()),
                             "pl_p": pa.array(ln2, pa.int64())})

        from ..util import grouped_agg_vec
        agg = grouped_agg_vec(
            edges.map_batches(comp, batch_format="pyarrow"),
            ["polygon_id"], [("cr_p", "sum", "a2"),
                             ("pl_p", "sum", "p2")])

        def fin(b: pa.Table) -> pa.Table:
            a2 = np.abs(b["a2"].to_numpy()).astype(np.float64)
            p = b["p2"].to_numpy().astype(np.float64)
            c = np.floor(2 * np.pi * a2 * 1e4 / (p * p) * 1e6 + 0.5) \
                .astype(np.int64)
            return pa.table({"polygon_id": b["polygon_id"],
                             "perim_e2": b["p2"],
                             "compact_e6": pa.array(c, pa.int64())})

        return agg.map_batches(fin, batch_format="pyarrow")
    q["polygon_compactness"] = polygon_compactness

    def view_to_purchase_lag_days(sf_dir):
        """Funnel-latency distribution: per user the exact integer-day
        lag between the FIRST view and the FIRST purchase (purchases
        that precede any view report negative lags — a data-quality
        signal in its own right), aggregated into a lag-day histogram.
        Two min-combiner passes and one bounded join; no row-walked
        aggregate anywhere."""
        from ..util import grouped_agg_vec, join_kwargs
        ev = fx.driver_table(sf_dir, "events",
                             columns=["user_id", "ts", "event_type"])

        def firsts(kind):
            def fn(b: pa.Table) -> pa.Table:
                m = pc.equal(b["event_type"], kind)
                bb = b.filter(m)
                us = pc.cast(bb["ts"], pa.int64())
                return pa.table({"user_id": bb["user_id"],
                                 "us_p": us})
            return fn

        fv = grouped_agg_vec(
            ev.map_batches(firsts("view"), batch_format="pyarrow"),
            ["user_id"], [("us_p", "min", "v_us")])
        fp = grouped_agg_vec(
            ev.map_batches(firsts("purchase"), batch_format="pyarrow"),
            ["user_id"], [("us_p", "min", "p_us")])
        j = fv.join(fp, on=("user_id",), join_type="inner",
                    num_partitions=4)

        def lag(b: pa.Table) -> pa.Table:
            v = b["v_us"].to_numpy()
            p = b["p_us"].to_numpy()
            d = (p - v) // 86_400_000_000
            return pa.table({"lag_days": pa.array(d, pa.int64())})

        return grouped_agg_vec(
            j.map_batches(lag, batch_format="pyarrow"),
            ["lag_days"], [(None, "count", "n_users")])
    q["view_to_purchase_lag_days"] = view_to_purchase_lag_days

    def orders_cusum_days(sf_dir):
        """CUSUM change detection over the daily order-count series per
        priority (the SPC run-chart screen): days where the cumulative
        excess over the global per-priority daily mean — resetting
        whenever it dips below zero — exceeds two days' worth of mean.
        EXACT integers throughout: counts scale by the day total
        (den) so the mean never becomes a float, and the classic
        max(0, ·) recursion is computed with the prefix-minus-running-
        min identity (s_i = P_i − min_{j≤i} P_j), which both numpy and
        the twin's two stacked windows express without recursion."""
        from ..util import bucketed_group_apply, grouped_agg_vec
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderdate",
                                          "o_orderpriority"])

        def days(b: pa.Table) -> pa.Table:
            d = pc.cast(b["o_orderdate"], pa.int64()).to_numpy() \
                // 86_400_000_000
            return pa.table({"pri": b["o_orderpriority"],
                             "day": pa.array(d, pa.int64())})

        dc = grouped_agg_vec(
            orders.map_batches(days, batch_format="pyarrow"),
            ["pri", "day"], [(None, "count", "cnt")])

        def cusum(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for pri, p in g.groupby("pri"):
                p = p.sort_values("day", kind="mergesort")
                d = p["day"].to_numpy()
                c = p["cnt"].to_numpy()
                full = np.arange(d[0], d[-1] + 1, dtype=np.int64)
                dense = np.zeros(len(full), np.int64)
                dense[d - d[0]] = c
                num = int(dense.sum())          # mean = num / den
                den = len(full)
                pref = np.cumsum(dense * den - num)
                runmin = np.minimum.accumulate(
                    np.concatenate([np.zeros(1, np.int64), pref]))[:-1]
                s = pref - runmin
                hit = s > 2 * num
                outs.append(pd.DataFrame({
                    "pri": pd.Series([pri] * int(hit.sum()),
                                     dtype="string"),
                    "day": pd.Series(full[hit], dtype="int64"),
                    "cusum_scaled": pd.Series(s[hit], dtype="int64")}))
            if not outs:
                return pd.DataFrame({
                    "pri": pd.Series([], dtype="string"),
                    "day": pd.Series([], dtype="int64"),
                    "cusum_scaled": pd.Series([], dtype="int64")})
            return pd.concat(outs, ignore_index=True)

        from ..util import arrow_retype
        return arrow_retype(
            bucketed_group_apply(dc, ["pri"], cusum, n_buckets=8))
    q["orders_cusum_days"] = orders_cusum_days

    def knn_link_prediction(sf_dir):
        """Jaccard link prediction over the kNN graph: for every
        wedge-connected node pair NOT already adjacent, the Jaccard of
        their (undirected) neighbor sets as an exact fraction — the
        classic common-neighbors recommender. Adjacency is bounded by
        k, wedge pairs enumerate inside one bucketed pass per center
        node, and the score stays a (common, union) integer pair."""
        from ..util import bucketed_group_apply, grouped_agg_vec
        pts = fx.read_fixture(sf_dir, "knn_pts")
        kn = knn.knn_join(pts, k=KNN_K, res=11, id_col="image_id",
                          exact=True)

        def undirect(b: pa.Table) -> pa.Table:
            a = b["id"].to_pylist()
            bb = b["neighbor_id"].to_pylist()
            lo = [min(x, y) for x, y in zip(a, bb)]
            hi = [max(x, y) for x, y in zip(a, bb)]
            return pa.table({"u": pa.array(lo, pa.string()),
                             "v": pa.array(hi, pa.string())})

        edges = grouped_agg_vec(
            kn.map_batches(undirect, batch_format="pyarrow"),
            ["u", "v"], [(None, "count", "x")]).drop_columns(["x"]) \
            .materialize()

        def star(b: pa.Table) -> pa.Table:
            u = b["u"].to_pylist()
            v = b["v"].to_pylist()
            return pa.table({
                "center": pa.array(u + v, pa.string()),
                "leaf": pa.array(v + u, pa.string())})

        stars = edges.map_batches(star, batch_format="pyarrow")

        def wedges(g: pd.DataFrame) -> pd.DataFrame:
            oa, ob = [], []
            for _c, gg in g.groupby("center", sort=False):
                ls = sorted(set(gg["leaf"].tolist()))
                for i in range(len(ls)):
                    for jj in range(i + 1, len(ls)):
                        oa.append(ls[i])
                        ob.append(ls[jj])
            return pd.DataFrame({
                "u": pd.Series(oa, dtype="string"),
                "v": pd.Series(ob, dtype="string")})

        cand = grouped_agg_vec(
            bucketed_group_apply(stars, ["center"], wedges,
                                 n_buckets=64),
            ["u", "v"], [(None, "count", "n_common")])
        # drop already-adjacent pairs with a distributed anti-join on a
        # packed pair key (edges are data-volume — never a driver set)
        from ..util import anti_semi_join

        def packc(b: pa.Table) -> pa.Table:
            k = pc.binary_join_element_wise(b["u"], b["v"], "|")
            return b.append_column("pk", k)

        def packe(b: pa.Table) -> pa.Table:
            return pa.table({"pk": pc.binary_join_element_wise(
                b["u"], b["v"], "|")})

        cand = anti_semi_join(
            cand.map_batches(packc, batch_format="pyarrow"),
            edges.map_batches(packe, batch_format="pyarrow"),
            on="pk", n_buckets=64).drop_columns(["pk"])
        # degrees are a bounded per-node table: broadcast for the union
        deg = grouped_agg_vec(stars, ["center"],
                              [(None, "count", "degree")]).to_pandas()
        import ray

        from ..util import _bcast_get
        ref = ray.put(dict(zip(deg["center"], deg["degree"])))

        def score(b: pd.DataFrame) -> pd.DataFrame:
            dm = _bcast_get(ref)
            du = b["u"].map(dm).astype("int64")
            dv = b["v"].map(dm).astype("int64")
            un = du + dv - b["n_common"]
            return pd.DataFrame({
                "u": b["u"].astype("string"),
                "v": b["v"].astype("string"),
                "n_common": b["n_common"].astype("int64"),
                "n_union": un.astype("int64")})

        from ..util import arrow_retype
        return arrow_retype(
            cand.map_batches(score, batch_format="pandas"))
    q["knn_link_prediction"] = knn_link_prediction

    def doc_langid_confusion(sf_dir):
        """Model-eval confusion matrix for the language-ID classifier:
        counts per (true lang, predicted lang) — the precision/recall
        surface a corpus-quality dashboard reads. The predictor is the
        same SQL-pinned stopword-vote classifier as doc_langid_check;
        the twin wraps that exact SQL and joins the truth column."""
        from ..util import grouped_agg_vec
        ds = fx.driver_table(sf_dir, "documents",
                             columns=["doc_id", "text"])
        feats = textstage.analyze_text(ds) \
            .select_columns(["doc_id", "lang_pred"])
        truth = fx.driver_table(sf_dir, "documents",
                                columns=["doc_id", "lang"])
        j = feats.join(truth, on=("doc_id",), join_type="inner",
                       **join_kwargs(fx.table_join_partitions(
                           sf_dir, "documents", "documents")))
        return grouped_agg_vec(j, ["lang", "lang_pred"],
                               [(None, "count", "n")])
    q["doc_langid_confusion"] = doc_langid_confusion

    def hourly_burst_hours(sf_dir):
        """Trailing-window burst detection (the streaming rate-spike
        screen, complementary to the global z-score anomaly query): per
        event type, hours whose count exceeds 3× the trailing-24h
        average — the test is cross-multiplied to pure integers
        (cnt·24 > 3·sum24) and requires a FULL trailing window. Hour
        counts ride the combiner (bounded distinct keys); the per-type
        series scan is one bucketed pass."""
        from ..util import bucketed_group_apply, grouped_agg_vec
        ev = fx.driver_table(sf_dir, "events",
                             columns=["ts", "event_type"])

        def hours(b: pa.Table) -> pa.Table:
            hr = pc.cast(b["ts"], pa.int64()).to_numpy() \
                // 3_600_000_000
            return pa.table({"event_type": b["event_type"],
                             "hour": pa.array(hr, pa.int64())})

        hc = grouped_agg_vec(
            ev.map_batches(hours, batch_format="pyarrow"),
            ["event_type", "hour"], [(None, "count", "cnt")])

        def burst(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for et, p in g.groupby("event_type"):
                p = p.sort_values("hour", kind="mergesort")
                # dense hour series: missing hours count 0 (the twin
                # generates the same dense series per type)
                h = p["hour"].to_numpy()
                c = p["cnt"].to_numpy()
                full = np.arange(h[0], h[-1] + 1, dtype=np.int64)
                dense = np.zeros(len(full), np.int64)
                dense[h - h[0]] = c
                if len(full) <= 24:
                    continue
                cum = np.concatenate([[0], np.cumsum(dense)])
                s24 = cum[24:-1] - cum[:-25]      # trailing 24, excl cur
                cur = dense[24:]
                hit = cur * 24 > 3 * s24
                hrs = full[24:][hit]
                outs.append(pd.DataFrame({
                    "event_type": pd.Series([et] * len(hrs),
                                            dtype="string"),
                    "hour": pd.Series(hrs, dtype="int64"),
                    "cnt": pd.Series(cur[hit], dtype="int64"),
                    "sum24": pd.Series(s24[hit], dtype="int64")}))
            if not outs:
                return pd.DataFrame({
                    "event_type": pd.Series([], dtype="string"),
                    "hour": pd.Series([], dtype="int64"),
                    "cnt": pd.Series([], dtype="int64"),
                    "sum24": pd.Series([], dtype="int64")})
            return pd.concat(outs, ignore_index=True)

        from ..util import arrow_retype
        return arrow_retype(bucketed_group_apply(hc, ["event_type"], burst,
                                                 n_buckets=8))
    q["hourly_burst_hours"] = hourly_burst_hours

    def chunk_dedup_counts(sf_dir):
        """Paragraph/chunk-level exact dedup profile (the LLM-corpus
        boilerplate signal one level below document dedup): RAG chunks
        whose exact text recurs across the corpus, with occurrence
        count and the smallest owning doc_id.
        Chunk text shuffles once through the bounded bucket pass; only
        recurring chunks (count ≥ 2) are emitted."""
        from ..util import grouped_agg_vec
        ds = fx.driver_table(sf_dir, "documents",
                             columns=["doc_id", "text"])
        chunks = textstage.chunk_documents(ds, size=CHUNK_SIZE,
                                           stride=CHUNK_STRIDE)

        def prep(b: pa.Table) -> pa.Table:
            return pa.table({"chunk_text": b["chunk_text"],
                             "d_p": b["doc_id"],
                             "n_p": pa.array(np.ones(b.num_rows,
                                                     np.int64))})

        agg = grouped_agg_vec(
            chunks.map_batches(prep, batch_format="pyarrow"),
            ["chunk_text"], [("n_p", "sum", "n_occurrences"),
                             ("d_p", "min", "owner_doc")])
        return agg.filter(expr="n_occurrences >= 2")
    q["chunk_dedup_counts"] = chunk_dedup_counts

    def token_zipf_fit(sf_dir):
        """Zipf's-law fit over the top-100 corpus tokens: OLS slope of
        floor-e6 ln(count) against floor-e6 ln(rank), computed from
        EXACT integer sufficient statistics (each log term fixes to an
        int BEFORE the sums, the float-free screen pattern — the slope
        numerator/denominator are pinned integers). Token counts ride
        the combiner; the top-100 head is the distributed top-k."""
        from ..functions import text
        from ..util import distributed_topk, grouped_agg_vec
        ds = fx.driver_table(sf_dir, "documents", columns=["text"])

        def toks(b: pa.Table) -> pa.Table:
            from collections import Counter
            c: Counter = Counter()
            for t in b["text"].to_pylist():
                c.update(text.WS_RE.findall(t or ""))
            return pa.table({
                "token": pa.array(list(c.keys()), pa.string()),
                "c_p": pa.array(list(c.values()), pa.int64())})

        counts = grouped_agg_vec(
            ds.map_batches(toks, batch_format="pyarrow"),
            ["token"], [("c_p", "sum", "cnt")])
        top = distributed_topk(counts, 100, [("cnt", "descending"),
                                             ("token", "ascending")])
        r = np.arange(1, len(top) + 1, dtype=np.float64)
        x = np.floor(np.log(r) * 1e6).astype(np.int64)
        y = np.floor(np.log(top["cnt"].to_numpy().astype(np.float64))
                     * 1e6).astype(np.int64)
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x * x).sum())
        sxy = int((x * y).sum())
        num = n * sxy - sx * sy            # exact python ints
        den = n * sxx - sx * sx
        # divide as double(num)/double(den) — the SQL cast-then-divide
        # tree (python int/int true division rounds the exact rational,
        # which can differ in the last bit)
        ratio = np.float64(num) / np.float64(den)
        return pd.DataFrame({
            "n_tokens": pd.Series([n], dtype="int64"),
            "slope_num": pd.Series([num], dtype="int64"),
            "slope_den": pd.Series([den], dtype="int64"),
            "slope_e6": pd.Series(
                [int(np.floor(ratio * 1e6 + 0.5))], dtype="int64")})
    q["token_zipf_fit"] = token_zipf_fit

    def tag_key_cooccurrence(sf_dir):
        """Tag-key market basket: pairs of tag KEYS that appear on the
        same OSM element, with co-occurrence counts (the schema-mining
        signal 'amenity implies cuisine'). Within-element pair
        expansion is vectorized per bucket; pairs ≥ 5 emitted."""
        from ..util import bucketed_group_apply, grouped_agg_vec
        tags = fx.read_fixture(sf_dir, "tags",
                               columns=["elem_id", "key"])

        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            oa, ob = [], []
            for _e, gg in g.groupby("elem_id", sort=False):
                ks = sorted(set(gg["key"].tolist()))
                for i in range(len(ks)):
                    for jj in range(i + 1, len(ks)):
                        oa.append(ks[i])
                        ob.append(ks[jj])
            return pd.DataFrame({
                "key_a": pd.Series(oa, dtype="string"),
                "key_b": pd.Series(ob, dtype="string")})

        pp = bucketed_group_apply(tags, ["elem_id"], pairs, n_buckets=64)
        agg = grouped_agg_vec(pp, ["key_a", "key_b"],
                              [(None, "count", "n")])
        return agg.filter(expr="n >= 5")
    q["tag_key_cooccurrence"] = tag_key_cooccurrence

    def amenity_join_counts(sf_dir):
        """Join-count spatial autocorrelation (the classic binary
        colocation statistic): over the grid cells OCCUPIED by cafes
        (A) or restaurants (B), the number of rook-adjacent cell pairs
        of each coloring — AA / AB / BB (cells holding both kinds count
        as both, i.e. the pair contributes to every matching class).
        Cell sets dedupe in the combiner; adjacency resolves by
        exploding each occupied cell to its 2 canonical (east, north)
        neighbor edges so every adjacent pair is counted exactly once —
        no self-join."""
        from ..util import bucketed_group_apply, grouped_agg_vec
        kinds = ("cafe", "restaurant")
        tags = fx.read_fixture(sf_dir, "tags",
                               columns=["elem_id", "key", "value"]) \
            .filter(expr="key == 'amenity'") \
            .rename_columns({"elem_id": "id"})
        nodes = fx.read_fixture(sf_dir, "nodes",
                                columns=["id", "lon", "lat"])
        j = tags.join(nodes, on=("id",), join_type="inner",
                      **join_kwargs(fx.table_join_partitions(
                          sf_dir, "tags", "nodes")))

        def cells(b: pa.Table) -> pa.Table:
            v = np.asarray(b["value"].to_pylist())
            m = np.isin(v, kinds)
            qx, qy = geo.cell_xy(b["lon"].to_numpy()[m],
                                 b["lat"].to_numpy()[m], TILE_RES)
            isa = (v[m] == kinds[0]).astype(np.int64)
            return pa.table({"qx": pa.array(qx, pa.int64()),
                             "qy": pa.array(qy, pa.int64()),
                             "a_p": pa.array(isa, pa.int64()),
                             "b_p": pa.array(1 - isa, pa.int64())})

        occ = grouped_agg_vec(
            j.map_batches(cells, batch_format="pyarrow"),
            ["qx", "qy"], [("a_p", "sum", "na"), ("b_p", "sum", "nb")])

        def edges(b: pa.Table) -> pa.Table:
            qx = b["qx"].to_numpy()
            qy = b["qy"].to_numpy()
            # canonical directed edges: east and north neighbors only
            ex = np.concatenate([qx + 1, qx])
            ey = np.concatenate([qy, qy + 1])
            sx = np.concatenate([qx, qx])
            sy = np.concatenate([qy, qy])
            n = np.int64(1) << np.int64(TILE_RES)
            rep = np.concatenate([np.arange(len(qx))] * 2)
            return pa.table({
                "cell": pa.array(ex * n + ey, pa.int64()),
                "side": pa.array(np.zeros(2 * len(qx), np.int64)),
                "a": pa.array(
                    (b["na"].to_numpy() > 0).astype(np.int64)[rep],
                    pa.int64()),
                "bb": pa.array(
                    (b["nb"].to_numpy() > 0).astype(np.int64)[rep],
                    pa.int64()),
                "own": pa.array(sx * n + sy, pa.int64())})

        def self_rows(b: pa.Table) -> pa.Table:
            qx = b["qx"].to_numpy()
            qy = b["qy"].to_numpy()
            n = np.int64(1) << np.int64(TILE_RES)
            return pa.table({
                "cell": pa.array(qx * n + qy, pa.int64()),
                "side": pa.array(np.ones(len(qx), np.int64)),
                "a": pa.array((b["na"].to_numpy() > 0)
                              .astype(np.int64), pa.int64()),
                "bb": pa.array((b["nb"].to_numpy() > 0)
                               .astype(np.int64), pa.int64()),
                "own": pa.array(qx * n + qy, pa.int64())})

        occ = occ.materialize()
        probes = occ.map_batches(edges, batch_format="pyarrow") \
            .union(occ.map_batches(self_rows, batch_format="pyarrow"))

        def count_pairs(g: pd.DataFrame) -> pd.DataFrame:
            aa = ab = bb_ = 0
            for _cell, gg in g.groupby("cell", sort=False):
                here = gg[gg["side"] == 1]
                if not len(here):
                    continue
                ha = int(here["a"].iloc[0])
                hb = int(here["bb"].iloc[0])
                nb = gg[gg["side"] == 0]
                for _, r in nb.iterrows():
                    aa += ha * int(r["a"])
                    bb_ += hb * int(r["bb"])
                    ab += ha * int(r["bb"]) + hb * int(r["a"])
            return pd.DataFrame({
                "jc_aa": pd.Series([aa], dtype="int64"),
                "jc_ab": pd.Series([ab], dtype="int64"),
                "jc_bb": pd.Series([bb_], dtype="int64")})

        parts = bucketed_group_apply(probes, ["cell"], count_pairs,
                                     n_buckets=32)
        from ray.data.aggregate import Sum
        agg = parts.aggregate(Sum("jc_aa", alias_name="jc_aa"),
                              Sum("jc_ab", alias_name="jc_ab"),
                              Sum("jc_bb", alias_name="jc_bb"))
        return pd.DataFrame({"jc_aa": [int(agg["jc_aa"])],
                             "jc_ab": [int(agg["jc_ab"])],
                             "jc_bb": [int(agg["jc_bb"])]})
    q["amenity_join_counts"] = amenity_join_counts

    def way_chain_components(sf_dir):
        """GIS line merge (ST_LineMerge semantics over the way graph):
        ways stitch into chains through shared ENDPOINT nodes of
        endpoint-degree exactly 2 (a node where only those two ways
        terminate — junction nodes never merge). Endpoints resolve via
        per-way min/max positions in one bounded bucket pass; the
        2-degree nodes emit way-way edges; connected components label
        each chain by its smallest way id. Twin: the same edge
        derivation + a recursive min-label closure."""
        from ..stages import dedup as dd
        from ..util import bucketed_group_apply, grouped_agg_vec
        wn = fx.read_fixture(sf_dir, "way_nodes",
                             columns=["way_id", "node_id", "position"])

        def ends(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for wid, p in g.groupby("way_id"):
                p = p.sort_values("position", kind="mergesort")
                outs.append((int(wid), int(p["node_id"].iloc[0])))
                outs.append((int(wid), int(p["node_id"].iloc[-1])))
            if not outs:
                return pd.DataFrame({
                    "way_id": pd.Series([], dtype="int64"),
                    "node_id": pd.Series([], dtype="int64")})
            w, n = zip(*outs)
            return pd.DataFrame({
                "way_id": pd.Series(w, dtype="int64"),
                "node_id": pd.Series(n, dtype="int64")})

        ep = bucketed_group_apply(wn, ["way_id"], ends, n_buckets=64)

        def links(g: pd.DataFrame) -> pd.DataFrame:
            oa, ob = [], []
            for nid, gg in g.groupby("node_id", sort=False):
                ws = sorted(set(gg["way_id"].tolist()))
                # endpoint-degree-2 rule: exactly two endpoint rows at
                # this node, from two DISTINCT ways
                if len(gg) == 2 and len(ws) == 2:
                    oa.append(ws[0])
                    ob.append(ws[1])
            return pd.DataFrame({
                "id_a": pd.Series(oa, dtype="int64"),
                "id_b": pd.Series(ob, dtype="int64")})

        edges = bucketed_group_apply(ep, ["node_id"], links,
                                     n_buckets=64)
        labels = dd.connected_components_pairs(edges)
        return grouped_agg_vec(labels, ["label"],
                               [(None, "count", "n_ways")]) \
            .rename_columns({"label": "chain_id"})
    q["way_chain_components"] = way_chain_components

    def top_session_paths(sf_dir):
        """Sequence mining lite: the 10 most common per-(user, day)
        event-type PATHS (types joined in exact (ts, event_id) order) —
        the funnel-path table a product-analytics pipeline mines.
        Paths build inside one bounded bucket shuffle per user; the
        global head is the distributed top-k."""
        from ..util import bucketed_group_apply, distributed_topk, \
            grouped_agg_vec
        ev = fx.driver_table(sf_dir, "events",
                             columns=["user_id", "event_id", "ts",
                                      "event_type"])

        def paths(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            us = g["ts"].to_numpy().astype("datetime64[us]") \
                .astype(np.int64)
            g = g.assign(_day=us // 86_400_000_000)
            g = g.sort_values(["user_id", "_day", "ts", "event_id"],
                              kind="mergesort")
            for (_u, _d), p in g.groupby(["user_id", "_day"],
                                         sort=False):
                outs.append(">".join(p["event_type"].tolist()))
            return pd.DataFrame({"path": pd.Series(outs,
                                                   dtype="string")})

        pp = bucketed_group_apply(ev, ["user_id"], paths, n_buckets=64)
        counts = grouped_agg_vec(pp, ["path"], [(None, "count", "n")])
        return distributed_topk(counts, 10, [("n", "descending"),
                                             ("path", "ascending")])
    q["top_session_paths"] = top_session_paths

    def orders_price_ntile(sf_dir):
        """Distributed global ROW_NUMBER + NTILE(4) over the full price
        order (§2.6 completion — the window shapes that need a TOTAL
        global rank, not a per-group one): util.global_row_number
        range-partitions via one sort, ships one typed metadata row per
        block, and assigns ranks map-only from broadcast prefix
        offsets. NTILE uses the standard bigger-tiles-first split,
        mirrored exactly."""
        from ..util import global_row_number
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_totalprice"])
        rn = global_row_number(orders, [("o_totalprice", "desc"),
                                        ("o_orderkey", "asc")],
                               out_col="rn")
        n = orders.count()
        k = 4
        qsz, rem = divmod(n, k)
        boundary = (qsz + 1) * rem

        def tile(b: pa.Table) -> pa.Table:
            r = b["rn"].to_numpy()
            t = np.where(r <= boundary, (r - 1) // (qsz + 1),
                         rem + (r - 1 - boundary) // max(qsz, 1)) + 1
            return pa.table({"o_orderkey": b["o_orderkey"],
                             "rn": b["rn"],
                             "tile": pa.array(t.astype(np.int64),
                                              pa.int64())})

        return rn.map_batches(tile, batch_format="pyarrow")
    q["orders_price_ntile"] = orders_price_ntile

    def stream_upsert_latest(sf_dir):
        """CDC stream compaction (the 'upsert view' a changelog
        materializes to): the LATEST event per user under the total
        (ts, event_id) order — per-block pre-reduce keeps one candidate
        per (user, block), one bounded shuffle resolves the winner."""
        from ..util import grouped_topk
        ev = fx.driver_table(sf_dir, "events",
                             columns=["user_id", "event_id", "ts",
                                      "event_type"])
        latest = grouped_topk(ev, ["user_id"], 1,
                              [("ts", "desc"), ("event_id", "desc")],
                              n_buckets=64)

        def out(b: pd.DataFrame) -> pd.DataFrame:
            return b[["user_id", "event_id", "event_type"]]

        return latest.map_batches(out, batch_format="pandas")
    q["stream_upsert_latest"] = stream_upsert_latest

    def nearest_knnpt_per_geo(sf_dir):
        """Bichromatic nearest-neighbor JOIN, broadcast regime: every
        geo point finds its nearest knn_pts point by great-circle
        distance (integer mm; ties to the smaller image_id — the B side
        is sorted by id once, so argmin's first-minimum IS the
        tiebreak). The B side is dimension-sized and ships once; the A
        side streams map-only — zero shuffles (the big⋈big regime is
        knn.radius_join / knn_join)."""
        import ray

        from ..util import _bcast_get
        pts = fx.read_fixture(sf_dir, "geo",
                              columns=["image_id", "lon", "lat"])
        import pyarrow.parquet as pq
        bt = pq.read_table(fx.fixture_path(sf_dir, "knn_pts"),
                           columns=["image_id", "lon", "lat"])
        order = pc.sort_indices(bt["image_id"])
        bt = bt.take(order)
        ref = ray.put((np.asarray(bt["image_id"].to_pylist()),
                       bt["lon"].to_numpy(), bt["lat"].to_numpy()))

        def nn(b: pa.Table) -> pa.Table:
            bid, blon, blat = _bcast_get(ref)
            lon = b["lon"].to_numpy()
            lat = b["lat"].to_numpy()
            best_i = np.empty(len(lon), np.int64)
            best_d = np.empty(len(lon), np.int64)
            for c0 in range(0, len(lon), 1024):
                sl = slice(c0, c0 + 1024)
                d = geo.haversine_m(lon[sl][:, None], lat[sl][:, None],
                                    blon[None, :], blat[None, :])
                mm = np.floor(d * 1000.0 + 0.5).astype(np.int64)
                ii = np.argmin(mm, axis=1)
                best_i[sl] = ii
                best_d[sl] = mm[np.arange(len(ii)), ii]
            return pa.table({
                "id": b["image_id"],
                "neighbor_id": pa.array(bid[best_i], pa.string()),
                "d_mm": pa.array(best_d, pa.int64())})

        return pts.map_batches(nn, batch_format="pyarrow")
    q["nearest_knnpt_per_geo"] = nearest_knnpt_per_geo

    def orders_cube_agg(sf_dir):
        """OLAP CUBE over (priority, status): all four grouping sets —
        (p,s), (p), (s), () — with rolled dimensions as the sentinel
        'ALL' (avoiding NULL group keys). Computed the scale-correct
        way: ONE pass builds the finest (p,s) partials through the
        vectorized combiner, then the three rollups derive from those
        bounded distinct-key partials in plain pandas — the data volume
        is touched once. Twin: GROUP BY CUBE with COALESCE sentinels."""
        from ..util import grouped_agg_vec
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderpriority",
                                          "o_orderstatus",
                                          "o_totalprice"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(b["o_totalprice"].to_numpy() * 100 + 0.5) \
                .astype(np.int64)
            return pa.table({"p": b["o_orderpriority"],
                             "s": b["o_orderstatus"],
                             "c_p": pa.array(c, pa.int64()),
                             "n_p": pa.array(np.ones(b.num_rows,
                                                     np.int64))})

        fine = grouped_agg_vec(
            orders.map_batches(cents, batch_format="pyarrow"),
            ["p", "s"], [("n_p", "sum", "n"),
                         ("c_p", "sum", "cents")]).to_pandas()
        outs = [fine.rename(columns={"p": "priority", "s": "status"})]
        g1 = fine.groupby("p", as_index=False)[["n", "cents"]].sum()
        g1 = g1.rename(columns={"p": "priority"})
        g1["status"] = "ALL"
        outs.append(g1)
        g2 = fine.groupby("s", as_index=False)[["n", "cents"]].sum()
        g2 = g2.rename(columns={"s": "status"})
        g2["priority"] = "ALL"
        outs.append(g2)
        outs.append(pd.DataFrame({
            "priority": ["ALL"], "status": ["ALL"],
            "n": [int(fine["n"].sum())],
            "cents": [int(fine["cents"].sum())]}))
        out = pd.concat(outs, ignore_index=True)
        out["priority"] = out["priority"].astype(object)
        out["status"] = out["status"].astype(object)
        return out[["priority", "status", "n", "cents"]]
    q["orders_cube_agg"] = orders_cube_agg

    def event_value_winsorized_mean(sf_dir):
        """Robust-statistics cleaning op: per event type, the WINSORIZED
        sum/count of values — every value clamps to the [P05, P95]
        edges of the value-pinned histogram quantile sketch, so the
        heavy tail cannot dominate the mean. The edges come from the
        same deterministic sketch the quantile query pins; the clamp
        and sum run on e6 integers (exact under any partitioning)."""
        from ..stages import sketch
        from ..util import _bcast_get, grouped_agg_vec
        import ray
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "value"])
        edges = sketch.histogram_quantiles_by_group(
            ds, "event_type", "value", lo=0.0, hi=512.0, bins=256,
            qs=(0.05, 0.95))
        edf = edges.to_pandas() if not isinstance(edges, pd.DataFrame) \
            else edges
        lo6 = {r["event_type"]: int(r["edge6"])
               for _, r in edf[edf["q"] == 0.05].iterrows()}
        hi6 = {r["event_type"]: int(r["edge6"])
               for _, r in edf[edf["q"] == 0.95].iterrows()}
        ref = ray.put((lo6, hi6))

        def clamp(b: pa.Table) -> pa.Table:
            lo, hi = _bcast_get(ref)
            et = b["event_type"].to_pylist()
            v6 = np.floor(b["value"].to_numpy() * 1e6 + 0.5) \
                .astype(np.int64)
            lo_a = np.fromiter((lo[t] for t in et), np.int64, len(et))
            hi_a = np.fromiter((hi[t] for t in et), np.int64, len(et))
            cv = np.minimum(np.maximum(v6, lo_a), hi_a)
            return pa.table({"event_type": b["event_type"],
                             "cv_p": pa.array(cv, pa.int64()),
                             "n_p": pa.array(np.ones(b.num_rows,
                                                     np.int64))})

        return grouped_agg_vec(
            ds.map_batches(clamp, batch_format="pyarrow"),
            ["event_type"], [("n_p", "sum", "n"),
                             ("cv_p", "sum", "winsor_sum_e6")])
    q["event_value_winsorized_mean"] = event_value_winsorized_mean

    def polygon_symdiff_cells(sf_dir):
        """Overlay METRIC: for every overlapping polygon pair, the
        intersection and symmetric-difference areas in res-POLYFILL
        interior cells (|A∩B| and |A|+|B|−2|A∩B| — exact integers on
        the shared polyfill cover). One self-join shuffle keyed on the
        cell; per-polygon totals ride the same combiner."""
        from ..util import bucketed_group_apply, grouped_agg_vec
        # consumed twice (sizes + pair join): materialize once or Ray
        # re-executes the whole polyfill lineage (review finding)
        cells = polygon_polyfill_cells(sf_dir).materialize()
        sizes = grouped_agg_vec(cells, ["polygon_id"],
                                [(None, "count", "sz")]).to_pandas()
        szmap = dict(zip(sizes["polygon_id"], sizes["sz"]))

        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            oa, ob, oc = [], [], []
            for _cell, gg in g.groupby(["qx", "qy"], sort=False):
                ps = sorted(gg["polygon_id"].tolist())
                for i in range(len(ps)):
                    for jj in range(i + 1, len(ps)):
                        oa.append(ps[i])
                        ob.append(ps[jj])
                        oc.append(1)
            return pd.DataFrame({
                "poly_a": pd.Series(oa, dtype="string"),
                "poly_b": pd.Series(ob, dtype="string"),
                "i_p": pd.Series(oc, dtype="int64")})

        inter = grouped_agg_vec(
            bucketed_group_apply(cells, ["qx", "qy"], pairs,
                                 n_buckets=64),
            ["poly_a", "poly_b"], [("i_p", "sum", "n_common")])

        def finish(b: pd.DataFrame) -> pd.DataFrame:
            sa = b["poly_a"].map(szmap).astype("int64")
            sb = b["poly_b"].map(szmap).astype("int64")
            return pd.DataFrame({
                "poly_a": b["poly_a"].astype("string"),
                "poly_b": b["poly_b"].astype("string"),
                "n_common": b["n_common"].astype("int64"),
                "n_symdiff": (sa + sb - 2 * b["n_common"])
                .astype("int64")})

        from ..util import arrow_retype
        return arrow_retype(
            inter.map_batches(finish, batch_format="pandas"))
    q["polygon_symdiff_cells"] = polygon_symdiff_cells

    def user_home_cells(sf_dir):
        """Home-location detection (trajectory analytics): each user's
        MODAL res-OD grid cell over their node edits — grouped mode via
        the distributed QUALIFY head, count ties to the smaller cell.
        Twin: ROW_NUMBER over per-(user, cell) counts."""
        from ..util import grouped_agg_vec, grouped_topk
        nodes = fx.read_fixture(sf_dir, "nodes",
                                columns=["uid", "lon", "lat"])

        def cellify(b: pa.Table) -> pa.Table:
            qx, qy = geo.cell_xy(b["lon"].to_numpy(),
                                 b["lat"].to_numpy(), OD_RES)
            return pa.table({"uid": b["uid"],
                             "qx": pa.array(qx, pa.int64()),
                             "qy": pa.array(qy, pa.int64())})

        counts = grouped_agg_vec(
            nodes.map_batches(cellify, batch_format="pyarrow"),
            ["uid", "qx", "qy"], [(None, "count", "cnt")])
        return grouped_topk(counts, ["uid"], 1,
                            [("cnt", "desc"), ("qx", "asc"),
                             ("qy", "asc")], n_buckets=64)
    q["user_home_cells"] = user_home_cells

    def phash_bit_stats(sf_dir):
        """Perceptual-hash bit-position statistics (the index-health
        diagnostic: a near-constant bit carries no discriminative
        power): for each of the 64 phash bit positions, how many images
        have it set. Fixed 64-row block partials into the combiner; the
        twin shifts the same int64 hash."""
        from ..util import grouped_agg_vec
        imgs = fx.read_fixture(sf_dir, "images", columns=["phash"])

        def bits(b: pa.Table) -> pa.Table:
            h = b["phash"].to_numpy().astype(np.uint64)
            pos = np.arange(64, dtype=np.uint64)
            setc = ((h[:, None] >> pos[None, :])
                    & np.uint64(1)).sum(axis=0).astype(np.int64)
            return pa.table({"bit": pa.array(pos.astype(np.int64),
                                             pa.int64()),
                             "s_p": pa.array(setc, pa.int64())})

        return grouped_agg_vec(
            imgs.map_batches(bits, batch_format="pyarrow"),
            ["bit"], [("s_p", "sum", "n_set")])
    q["phash_bit_stats"] = phash_bit_stats

    def lancelike_tag_vacuum_check(sf_dir):
        """Named refs through the store (Iceberg/Lance tags): the base
        version is tagged 'prod', two more versions commit on top, then
        ``vacuum(keep_versions=1)`` runs — the TAGGED version must
        survive GC (its manifest and fragments are retained) while the
        untagged intermediate is expired. The returned result is the
        tag-pinned read, which must still equal the ORIGINAL relational
        state after the mutations and the GC; asserts the intermediate
        manifest really died and the latest state really differs."""
        import shutil

        from ..sources import lancelike
        from ..util import grouped_agg_vec

        tag = os.path.basename(os.path.normpath(sf_dir))
        root = f"/tmp/graft_tagref/{tag}"
        shutil.rmtree(root, ignore_errors=True)
        orders = fx.driver_table(sf_dir, "orders")
        man1 = lancelike.write_dataset(orders, root, stage="base",
                                       resume=False)
        lancelike.create_tag(root, "prod", man1["version"])
        upd = orders.map_batches(_orders_merge_update,
                                 batch_format="pyarrow")
        man2 = lancelike.merge_upsert(upd, root, "o_orderkey",
                                      stage="merge1")
        man3 = lancelike.merge_upsert(upd, root, "o_orderkey",
                                      stage="merge2")
        stats = lancelike.vacuum(root, keep_versions=1)
        if man1["version"] not in stats["kept_versions"]:
            raise AssertionError("vacuum expired the tagged version")
        if man2["version"] in stats["kept_versions"]:
            raise AssertionError("vacuum kept the untagged intermediate")
        pinned = lancelike.resolve_tag(root, "prod")

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(b["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
            return pa.table({"o_orderstatus": b["o_orderstatus"],
                             "cents_p": pa.array(c, pa.int64()),
                             "n_p": pa.array(np.ones(b.num_rows,
                                                     np.int64))})

        cols = ["o_orderstatus", "o_totalprice"]
        tagged = grouped_agg_vec(
            lancelike.read_dataset(root, columns=cols, version=pinned)
            .map_batches(cents, batch_format="pyarrow"),
            ["o_orderstatus"], [("n_p", "sum", "n"),
                                ("cents_p", "sum", "cents")]).to_pandas()
        latest = grouped_agg_vec(
            lancelike.read_dataset(root, columns=cols,
                                   version=man3["version"])
            .map_batches(cents, batch_format="pyarrow"),
            ["o_orderstatus"], [("n_p", "sum", "n"),
                                ("cents_p", "sum", "cents")]).to_pandas()
        if int(tagged["n"].sum()) == int(latest["n"].sum()):
            raise AssertionError("latest should differ from the tag "
                                 "(merge added NEWROW keys)")
        return tagged
    q["lancelike_tag_vacuum_check"] = lancelike_tag_vacuum_check

    def caption_keyword_cells(sf_dir):
        """Cross-modal spatial retrieval: images whose CAPTION contains
        the token 'food' (same \\S+ token convention as the text ops)
        join to their geotags and aggregate per grid cell — the
        text-filter × spatial-heatmap query a caption-indexed image
        corpus serves. Caption filtering is map-side (bytes never read
        — column pruning at the scan); the join ships only matching
        ids."""
        from ..functions import text
        from ..util import grouped_agg_vec
        imgs = fx.read_fixture(sf_dir, "images",
                               columns=["image_id", "caption"])

        def match(b: pa.Table) -> pa.Table:
            keep = [i for i, c in enumerate(b["caption"].to_pylist())
                    if "food" in text.WS_RE.findall(c or "")]
            return b.take(pa.array(keep, pa.int64())) \
                .select(["image_id"])

        hit = imgs.map_batches(match, batch_format="pyarrow")
        geo_t = fx.read_fixture(sf_dir, "geo",
                                columns=["image_id", "lon", "lat"])
        j = hit.join(geo_t, on=("image_id",), join_type="inner",
                     **join_kwargs(fx.table_join_partitions(
                         sf_dir, "images", "geo")))

        def cells(b: pa.Table) -> pa.Table:
            qx, qy = geo.cell_xy(b["lon"].to_numpy(),
                                 b["lat"].to_numpy(), TILE_RES)
            return pa.table({"qx": pa.array(qx, pa.int64()),
                             "qy": pa.array(qy, pa.int64())})

        return grouped_agg_vec(
            j.map_batches(cells, batch_format="pyarrow"),
            ["qx", "qy"], [(None, "count", "n_images")])
    q["caption_keyword_cells"] = caption_keyword_cells

    def cell_kring_counts(sf_dir):
        """H3 gridDisk-style ring profile: for each anchor, the point
        count in every Chebyshev ring 0..KRING_K around the anchor's
        grid cell (the concentric-ring density profile a density map
        colors by). Map-only partials into the vectorized combiner —
        the anchors are constants, the ring index is max(|Δqx|, |Δqy|)
        in exact ints."""
        from ..util import grouped_agg_vec
        pts = fx.read_fixture(sf_dir, "knn_pts",
                              columns=["lon", "lat"])
        alon = np.array([a[0] for a in ANCHORS])
        alat = np.array([a[1] for a in ANCHORS])
        aqx, aqy = geo.cell_xy(alon, alat, TILE_RES)

        def rings(b: pa.Table) -> pa.Table:
            qx, qy = geo.cell_xy(b["lon"].to_numpy(),
                                 b["lat"].to_numpy(), TILE_RES)
            ai, ri = [], []
            for i in range(len(ANCHORS)):
                r = np.maximum(np.abs(qx - aqx[i]), np.abs(qy - aqy[i]))
                keep = r <= KRING_K
                ai.append(np.full(int(keep.sum()), i, np.int64))
                ri.append(r[keep])
            return pa.table({
                "anchor_id": pa.array(np.concatenate(ai), pa.int64()),
                "ring": pa.array(np.concatenate(ri), pa.int64())})

        return grouped_agg_vec(
            pts.map_batches(rings, batch_format="pyarrow"),
            ["anchor_id", "ring"], [(None, "count", "n_points")])
    q["cell_kring_counts"] = cell_kring_counts

    def events_sliding_distinct_users(sf_dir):
        """Hopping-window COUNT DISTINCT (the streaming 'unique actives
        per 1h window, every 15 min' metric): each event replicates
        map-side into its 4 covering windows, then the exact tuple-dedup
        combiner resolves distinct users per window — no self-join, one
        bounded shuffle."""
        from ..util import grouped_count_distinct
        ds = fx.driver_table(sf_dir, "events",
                             columns=["ts", "user_id"])

        def explode(b: pa.Table) -> pa.Table:
            q15 = pc.cast(b["ts"], pa.int64()).to_numpy() // 900_000_000
            uid = b["user_id"].to_numpy()
            n = len(q15)
            win = (np.repeat(q15, 4)
                   - np.tile(np.arange(4, dtype=np.int64), n))
            return pa.table({"win": pa.array(win, pa.int64()),
                             "user_id": pa.array(np.repeat(uid, 4),
                                                 pa.int64())})

        return grouped_count_distinct(
            ds.map_batches(explode, batch_format="pyarrow"),
            ["win"], "user_id", out_col="n_users", n_buckets=64)
    q["events_sliding_distinct_users"] = events_sliding_distinct_users

    def lancelike_column_stats_check(sf_dir):
        """ANALYZE through the store: exact per-column statistics (rows,
        nulls, distinct, min/max — the CBO stats surface) computed over
        the committed version and committed back as a new manifest
        version's metrics with fragments carried by reference (zero
        data writes). The returned stats table is value-pinned against
        plain SQL aggregates; the commit is asserted to carry them."""
        from ..sources import lancelike
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_custkey"])
        root = f"/tmp/graft_out/stats_demo_{fx.sf_tag(sf_dir)}"
        lancelike.write_dataset(
            orders, root, stage="stats_demo", parent=fx.sf_tag(sf_dir),
            fingerprint=lancelike.input_fingerprint(orders))
        cols = ["o_orderkey", "o_custkey"]
        man = lancelike.analyze(root, cols)
        st = man["metrics"]["column_stats"]
        if set(st) != set(cols):
            raise AssertionError("analyze commit missing column stats")
        return pd.DataFrame({
            "col_name": pd.Series(cols, dtype=object),
            "n_rows": pd.Series([st[c]["n_rows"] for c in cols],
                                dtype="int64"),
            "n_null": pd.Series([st[c]["n_null"] for c in cols],
                                dtype="int64"),
            "n_distinct": pd.Series([st[c]["n_distinct"] for c in cols],
                                    dtype="int64"),
            "min_v": pd.Series([st[c]["min"] for c in cols],
                               dtype="int64"),
            "max_v": pd.Series([st[c]["max"] for c in cols],
                               dtype="int64")})
    q["lancelike_column_stats_check"] = lancelike_column_stats_check

    def way_segmentize_points(sf_dir):
        """ST_Segmentize-style polyline densification: every segment
        emits interpolated vertices every SEGMENTIZE_D degrees along its
        own length (k = 0 anchors each segment start; zero-length
        segments are skipped on both sides). Per-way runs sort inside
        one bounded-bucket shuffle; interpolation is pure vectorized
        float math with the identical (k·D)/len tree in the twin's
        generate_series expansion, e7-rounded after."""
        from ..util import bucketed_group_apply
        joined = _way_points(sf_dir)
        D = SEGMENTIZE_D

        def dens(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["way_id", "position"], kind="mergesort")
            wid = g["way_id"].to_numpy()
            pos = g["position"].to_numpy()
            lon = g["lon"].to_numpy()
            lat = g["lat"].to_numpy()
            same = (wid[1:] == wid[:-1]) & (pos[1:] == pos[:-1] + 1)
            x1, y1 = lon[:-1][same], lat[:-1][same]
            x2, y2 = lon[1:][same], lat[1:][same]
            w = wid[1:][same]
            sp = pos[:-1][same]
            ln = np.sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))
            keep = ln > 0
            x1, y1, x2, y2, w, sp, ln = (x1[keep], y1[keep], x2[keep],
                                         y2[keep], w[keep], sp[keep],
                                         ln[keep])
            nk = np.floor(ln / D).astype(np.int64) + 1
            si = np.repeat(np.arange(len(nk)), nk)
            k = (np.arange(int(nk.sum()))
                 - np.repeat(np.cumsum(nk) - nk, nk))
            t = (k * D) / ln[si]
            x = x1[si] + t * (x2[si] - x1[si])
            y = y1[si] + t * (y2[si] - y1[si])
            return pd.DataFrame({
                "way_id": pd.Series(w[si], dtype="int64"),
                "sp": pd.Series(sp[si], dtype="int64"),
                "k": pd.Series(k, dtype="int64"),
                "x7": np.floor(x * 1e7 + 0.5).astype(np.int64),
                "y7": np.floor(y * 1e7 + 0.5).astype(np.int64)})

        return bucketed_group_apply(joined, ["way_id"], dens,
                                    n_buckets=64)
    q["way_segmentize_points"] = way_segmentize_points

    def way_direction_reversals(sf_dir):
        """Per-way sharp-turn screen (curvature audit): count of interior
        vertices where the heading changes by more than 90° — i.e. the
        dot product of consecutive segment vectors is negative, in EXACT
        e7-integer arithmetic (no float angle ties). Twin: the same dot
        product via LAG over the resolved way points."""
        from ..util import bucketed_group_apply
        joined = _way_points(sf_dir)

        def rev(g: pd.DataFrame) -> pd.DataFrame:
            outs_w, outs_n = [], []
            for wid, p in g.groupby("way_id"):
                p = p.sort_values("position", kind="mergesort")
                x = np.floor(p["lon"].to_numpy() * 1e7 + 0.5) \
                    .astype(np.int64)
                y = np.floor(p["lat"].to_numpy() * 1e7 + 0.5) \
                    .astype(np.int64)
                if len(x) < 3:
                    continue
                dx, dy = np.diff(x), np.diff(y)
                dot = dx[:-1] * dx[1:] + dy[:-1] * dy[1:]
                outs_w.append(int(wid))
                outs_n.append(int((dot < 0).sum()))
            return pd.DataFrame({
                "way_id": pd.Series(outs_w, dtype="int64"),
                "n_reversals": pd.Series(outs_n, dtype="int64")})

        return bucketed_group_apply(joined, ["way_id"], rev, n_buckets=64)
    q["way_direction_reversals"] = way_direction_reversals

    def reverse_geocode_points(sf_dir):
        """Reverse geocoding: every point resolves to ONE polygon — the
        smallest-id containing polygon when inside, else the polygon
        with the nearest boundary (ties to the smaller id). ONE
        broadcast map stage, zero shuffles: per batch the cell-
        prefiltered PIP index resolves containment (min id via
        np.minimum.at over candidate hits) and only the MISSES pay the
        per-polygon nearest-boundary scan (running strict-< best in
        ascending id order == the twin's ORDER BY d2, polygon_id)."""
        import pyarrow.parquet as pq

        import ray

        from ..stages import pip_join
        from ..util import _bcast_get
        pts = fx.read_fixture(sf_dir, "geo",
                              columns=["image_id", "lon", "lat"])
        polys = pq.read_table(fx.fixture_path(sf_dir, "polygons"))
        idx = pip_join.PolygonIndex(polys)
        ex1, ey1, ex2, ey2, pid = geo.ring_edges(polys)
        pnum = np.array([int(p[4:]) for p in pid], np.int64)
        order = np.argsort(pnum, kind="stable")
        ex1, ey1, ex2, ey2 = (ex1[order], ey1[order], ex2[order],
                              ey2[order])
        dx, dy = ex2 - ex1, ey2 - ey1
        len2 = dx * dx + dy * dy
        ref = ray.put((idx, ex1, ey1, dx, dy, len2, pnum[order]))

        def resolve(b: pa.Table) -> pa.Table:
            bidx, bx1, by1, bdx, bdy, bl2, bpn = _bcast_get(ref)
            px = b["lon"].to_numpy()
            py = b["lat"].to_numpy()
            n = len(px)
            big = np.int64(1) << np.int64(40)
            bestpid = np.full(n, big, np.int64)    # min containing id
            cells = geo.cell_encode(px, py, bidx.res)
            for pi, ptsl in bidx.candidates(cells).items():
                rx, ry = bidx.rings[pi]
                ins = geo.point_in_polygon(px[ptsl], py[ptsl], rx, ry)
                hit = ptsl[ins]
                if len(hit):
                    np.minimum.at(bestpid, hit,
                                  np.int64(int(bidx.ids[pi][4:])))
            inside = bestpid < big
            miss = np.nonzero(~inside)[0]
            if len(miss):
                mx, my = px[miss], py[miss]
                best = np.full(len(miss), np.inf)
                bestp = np.zeros(len(miss), np.int64)
                for pv in np.unique(bpn):          # ascending polygon id
                    m = bpn == pv
                    x1, y1, ddx, ddy, l2 = (bx1[m], by1[m], bdx[m],
                                            bdy[m], bl2[m])
                    t = ((mx[:, None] - x1[None, :]) * ddx[None, :]
                         + (my[:, None] - y1[None, :]) * ddy[None, :]) \
                        / l2[None, :]
                    t = np.minimum(1.0, np.maximum(0.0, t))
                    qx = mx[:, None] - (x1[None, :] + t * ddx[None, :])
                    qy = my[:, None] - (y1[None, :] + t * ddy[None, :])
                    d2 = (qx * qx + qy * qy).min(axis=1)
                    upd = d2 < best                # strict: ties keep
                    best[upd] = d2[upd]            # the smaller id
                    bestp[upd] = pv
                bestpid[miss] = bestp
            meth = np.where(inside, "inside", "nearest")
            return pa.table({
                "id": b["image_id"],
                "polygon_id": pa.array(
                    [f"poly{v:04d}" for v in bestpid], pa.string()),
                "method": pa.array(meth.tolist(), pa.string())})

        return pts.map_batches(resolve, batch_format="pyarrow")
    q["reverse_geocode_points"] = reverse_geocode_points

    def hilbert_cells(sf_dir):
        """Hilbert-curve cell encoding of the point table (the locality-
        preserving alternative to the Morton index: consecutive curve
        positions are always ADJACENT cells, so clustered range reads
        cut fewer spatial seams). Map-only; the twin unrolls the same
        HILBERT_ORDER (16) rotate/reflect rounds as integer CASE/XOR
        steps over MATERIALIZED CTEs."""
        pts = fx.read_fixture(sf_dir, "knn_pts")

        def enc(b: pa.Table) -> pa.Table:
            qx, qy = geo.cell_xy(b["lon"].to_numpy(),
                                 b["lat"].to_numpy(), HILBERT_ORDER)
            hd = geo.hilbert_d(qx, qy, HILBERT_ORDER)
            return pa.table({"image_id": b["image_id"],
                             "hd": pa.array(hd, pa.int64())})

        return pts.map_batches(enc, batch_format="pyarrow")
    q["hilbert_cells"] = hilbert_cells

    def lancelike_hilbert_cluster_scan(sf_dir):
        """OPTIMIZE/CLUSTER-BY rewrite through the store: geo points are
        first written in NATURAL order (hilbert-key zone maps overlap →
        a range read must open nearly every fragment), then a cluster
        rewrite sorts by the hilbert key and commits a new version —
        after which the same range read prunes to a strict subset from
        metadata alone. Asserts pruning strictly improved; returns the
        clustered range read (twin: the unrolled hilbert SQL with
        BETWEEN over the fixture)."""
        import shutil

        from ..sources import lancelike
        ds = fx.read_fixture(sf_dir, "geo",
                             columns=["image_id", "lon", "lat"])

        def enc(b: pa.Table) -> pa.Table:
            qx, qy = geo.cell_xy(b["lon"].to_numpy(),
                                 b["lat"].to_numpy(), HILBERT_ORDER)
            hd = geo.hilbert_d(qx, qy, HILBERT_ORDER)
            return pa.table({"image_id": b["image_id"],
                             "hd": pa.array(hd, pa.int64())})

        withh = ds.map_batches(enc, batch_format="pyarrow")
        root = f"/tmp/graft_out/hilbert_zm_{fx.sf_tag(sf_dir)}"
        shutil.rmtree(root, ignore_errors=True)
        lancelike.write_dataset(withh.repartition(16), root, stage="base",
                                resume=False, zonemap_cols=["hd"])
        lo, hi = HILBERT_SCAN_RANGE
        _, s1, t1 = lancelike.read_dataset_range(
            root, "hd", lo, hi, columns=["image_id", "hd"])
        lancelike.write_dataset(
            lancelike.read_dataset(root).sort("hd"), root,
            stage="cluster", parent="base", resume=False,
            zonemap_cols=["hd"])
        out, s2, t2 = lancelike.read_dataset_range(
            root, "hd", lo, hi, columns=["image_id", "hd"])
        if not (0 < s2 < t2 and s2 / t2 < s1 / t1):
            raise AssertionError(
                f"cluster rewrite did not improve pruning: "
                f"{s1}/{t1} -> {s2}/{t2}")
        return out
    q["lancelike_hilbert_cluster_scan"] = lancelike_hilbert_cluster_scan

    def user_out_of_order_events(sf_dir):
        """Streaming out-of-orderness screen (the watermark-lateness
        signal): per user, events whose timestamp regresses below the
        running max of earlier-INGESTED events (ingest order =
        event_id). Per-user runs sort inside one bounded-bucket
        shuffle; the prefix max is one np.maximum.accumulate. Twin: the
        same MAX window with ROWS UNBOUNDED PRECEDING AND 1 PRECEDING."""
        from ..util import bucketed_group_apply
        ev = fx.driver_table(sf_dir, "events",
                             columns=["event_id", "user_id", "ts"])

        def ooo(g: pd.DataFrame) -> pd.DataFrame:
            uids, nev, noo = [], [], []
            for uid, p in g.groupby("user_id"):
                p = p.sort_values("event_id", kind="mergesort")
                us = p["ts"].to_numpy().astype("datetime64[us]") \
                    .astype(np.int64)
                run = np.maximum.accumulate(us)
                late = us[1:] < run[:-1]
                uids.append(int(uid))
                nev.append(len(us))
                noo.append(int(late.sum()))
            return pd.DataFrame({
                "user_id": pd.Series(uids, dtype="int64"),
                "n_events": pd.Series(nev, dtype="int64"),
                "n_out_of_order": pd.Series(noo, dtype="int64")})

        return bucketed_group_apply(ev, ["user_id"], ooo, n_buckets=64)
    q["user_out_of_order_events"] = user_out_of_order_events

    def user_value_ewma(sf_dir):
        """Per-user exponentially-weighted moving average with alpha=1/2
        over the last 8 events — DYADIC weights (128,64,…,1) make the
        windowed sum EXACT integer arithmetic on e6-scaled values (the
        float-free screen pattern: no running float state, so the
        result is identical under any partitioning). The per-user runs
        sort inside one bounded-bucket shuffle and the window is one
        np.convolve; the twin spells the same 8 weighted LAG terms."""
        from ..util import bucketed_group_apply
        ev = fx.driver_table(sf_dir, "events",
                             columns=["event_id", "user_id", "ts",
                                      "value"])
        wts = (np.int64(1) << np.arange(EWMA_W - 1, -1, -1,
                                        dtype=np.int64))

        def ew(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for uid, p in g.groupby("user_id"):
                p = p.sort_values(["ts", "event_id"], kind="mergesort")
                v6 = np.floor(p["value"].to_numpy() * 1e6 + 0.5) \
                    .astype(np.int64)
                num = np.convolve(v6, wts)[:len(v6)]
                outs.append(pd.DataFrame({
                    "user_id": p["user_id"].to_numpy(),
                    "event_id": p["event_id"].to_numpy(),
                    "ewma256_e6": num}))
            if not outs:
                return pd.DataFrame({
                    "user_id": pd.Series([], dtype="int64"),
                    "event_id": pd.Series([], dtype="int64"),
                    "ewma256_e6": pd.Series([], dtype="int64")})
            return pd.concat(outs, ignore_index=True)

        return bucketed_group_apply(ev, ["user_id"], ew, n_buckets=64)
    q["user_value_ewma"] = user_value_ewma

    def doc_ngram_novelty(sf_dir):
        """Corpus novelty scoring: per document, how many of its
        DISTINCT word trigrams it is the first to introduce (owner =
        smallest doc_id holding the trigram) — the incremental-crawl
        dedup signal. Per-doc distinct shingle hashes fan into the
        vectorized min-combiner (two bounded shuffles over distinct
        shingles; document text never leaves its block); the twin
        groups the raw trigram strings — parity holds because the
        64-bit shingle hash is collision-free at observable scales
        (same contract as doc_dup_ngram_counts)."""
        from ..functions import text
        from ..functions.hashing import hash64_str_array
        from ..util import grouped_agg_vec
        ds = fx.driver_table(sf_dir, "documents",
                             columns=["doc_id", "text"])

        def sh(b: pa.Table) -> pa.Table:
            ids, hs = [], []
            for did, t in zip(b["doc_id"].to_pylist(),
                              b["text"].to_pylist()):
                toks = text.WS_RE.findall(t or "")
                if len(toks) < 3:
                    continue
                grams = [" ".join(toks[i:i + 3])
                         for i in range(len(toks) - 2)]
                hh = np.unique(hash64_str_array(grams).astype(np.int64))
                ids.append(np.full(len(hh), did, np.int64))
                hs.append(hh)
            if not ids:
                return pa.table({"h": pa.array([], pa.int64()),
                                 "doc_id": pa.array([], pa.int64())})
            return pa.table({
                "h": pa.array(np.concatenate(hs), pa.int64()),
                "doc_id": pa.array(np.concatenate(ids), pa.int64())})

        own = grouped_agg_vec(ds.map_batches(sh, batch_format="pyarrow"),
                              ["h"], [("doc_id", "min", "owner")])
        nov = grouped_agg_vec(own, ["owner"],
                              [(None, "count", "n_novel")])
        return nov.rename_columns({"owner": "doc_id"})
    q["doc_ngram_novelty"] = doc_ngram_novelty

    def cms_user_counts_check(sf_dir):
        """Count-min sketch of per-user event counts, VALUE-PINNED: the
        full nonzero counter table (4 hash rows × 1024 buckets, splitmix
        bucket assignment) must match the twin, which reimplements the
        identical hash in HUGEINT SQL (the sm64 macro XORed with the row
        index). The exchange is bounded by the sketch size — block
        partials are ≤ 4096 rows regardless of data volume."""
        from ..stages import sketch
        ev = fx.driver_table(sf_dir, "events", columns=["user_id"])
        return sketch.cms_counts(ev, "user_id", depth=4, width=1024)
    q["cms_user_counts_check"] = cms_user_counts_check

    def kmv_distinct_check(sf_dir):
        """K-minimum-values distinct sketch over user ids, VALUE-PINNED:
        the 256 smallest distinct 63-bit splitmix hashes (rank, h63)
        must equal the twin's ORDER BY hash LIMIT k — pinning both the
        hash function and the distributed distinct-merge. The ±1/sqrt(k)
        estimate itself is covered by pytest."""
        from ..stages import sketch
        ev = fx.driver_table(sf_dir, "events", columns=["user_id"])
        return sketch.kmv_sketch(ev, "user_id", k=256)
    q["kmv_distinct_check"] = kmv_distinct_check

    def doc_lm_scores(sf_dir):
        """Bigram-language-model document scoring (the perplexity-filter
        primitive of an LLM data pipeline): train add-one-smoothed
        bigram counts over the corpus in one combiner pass, broadcast
        the model once (capped with a loud raise — past the cap the
        scoring becomes a bigram join), then score every document as
        the INTEGER sum of per-bigram floor-e6 log-probs — each term is
        floored to a fixed-point int BEFORE summation, so the total is
        exact under any batch/partition order (the float-free anomaly-
        screen pattern). Twin: identical ln float tree per bigram in
        SQL, integer-summed the same way."""
        from collections import Counter

        import ray

        from ..functions import text
        from ..util import _bcast_get, grouped_agg_vec
        ds = fx.driver_table(sf_dir, "documents",
                             columns=["doc_id", "text"])

        def pairs(b: pa.Table) -> pa.Table:
            cb: Counter = Counter()
            for t in b["text"].to_pylist():
                toks = text.WS_RE.findall(t or "")
                cb.update(zip(toks, toks[1:]))
            w1, w2 = zip(*cb.keys()) if cb else ((), ())
            return pa.table({"w1": pa.array(list(w1), pa.string()),
                             "w2": pa.array(list(w2), pa.string()),
                             "c_p": pa.array(list(cb.values()),
                                             pa.int64())})

        counts = grouped_agg_vec(
            ds.map_batches(pairs, batch_format="pyarrow"),
            ["w1", "w2"], [("c_p", "sum", "cb")]).to_pandas()
        if len(counts) > 5_000_000:
            raise RuntimeError(
                f"doc_lm_scores: {len(counts)} distinct bigrams exceeds "
                f"the broadcast cap; score via a bigram join instead")

        def tok_part(b: pa.Table) -> pa.Table:
            vocab = set()
            for t in b["text"].to_pylist():
                vocab.update(text.WS_RE.findall(t or ""))
            return pa.table({"tok": pa.array(sorted(vocab), pa.string())})

        n_vocab = int(grouped_agg_vec(
            ds.map_batches(tok_part, batch_format="pyarrow"),
            ["tok"], [(None, "count", "n")]).count())

        bdict = {(a, b_): int(c) for a, b_, c in
                 zip(counts["w1"], counts["w2"], counts["cb"])}
        hdict = counts.groupby("w1")["cb"].sum().to_dict()
        ref = ray.put((bdict, hdict, n_vocab))

        def score(b: pa.Table) -> pa.Table:
            bd, hd, V = _bcast_get(ref)
            ids, bgs, offs = [], [], [0]
            for did, t in zip(b["doc_id"].to_pylist(),
                              b["text"].to_pylist()):
                toks = text.WS_RE.findall(t or "")
                if len(toks) < 2:
                    continue
                ids.append(did)
                bgs.extend(zip(toks, toks[1:]))
                offs.append(len(bgs))
            if not ids:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "n_bigrams": pa.array([], pa.int64()),
                                 "logprob_e6": pa.array([], pa.int64())})
            cb = np.fromiter((bd[k] for k in bgs), np.int64, len(bgs))
            ch = np.fromiter((hd[k[0]] for k in bgs), np.int64, len(bgs))
            lp = np.floor(np.log((cb + 1.0) / (ch + V)) * 1e6) \
                .astype(np.int64)
            off = np.asarray(offs)
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(np.diff(off), pa.int64()),
                "logprob_e6": pa.array(np.add.reduceat(lp, off[:-1]),
                                       pa.int64())})

        return ds.map_batches(score, batch_format="pyarrow")
    q["doc_lm_scores"] = doc_lm_scores

    def doc_bm25_topk(sf_dir):
        """BM25 ranked retrieval for the fixed SEARCH_TOKENS query
        (k1=1.2, b=0.75): one combiner pass collects the corpus stats
        (N, total tokens, per-term document frequencies — a 1-row
        partial per block), then a map-only scoring pass emits matching
        docs and the distributed top-k machinery returns the 20 best.
        The three per-term scores are summed in FIXED query order on
        both sides and the result is floored to e6 fixed point, making
        the ranking hash-stable; ties break to the smaller doc_id."""
        from ..functions import text
        from ..util import distributed_topk
        import ray.data as rd
        ds = fx.driver_table(sf_dir, "documents",
                             columns=["doc_id", "text"])
        toks_q = SEARCH_TOKENS
        k1, bb = 1.2, 0.75

        def stats(b: pa.Table) -> pa.Table:
            n = dl = 0
            dfs = [0] * len(toks_q)
            for t in b["text"].to_pylist():
                tk = text.WS_RE.findall(t or "")
                n += 1
                dl += len(tk)
                s = set(tk)
                for qi, qt in enumerate(toks_q):
                    if qt in s:
                        dfs[qi] += 1
            cols = {"n_p": pa.array([n], pa.int64()),
                    "tot_p": pa.array([dl], pa.int64())}
            for qi in range(len(toks_q)):
                cols[f"df{qi}_p"] = pa.array([dfs[qi]], pa.int64())
            return pa.table(cols)

        from ray.data.aggregate import Sum
        aggs = [Sum("n_p", alias_name="n"), Sum("tot_p", alias_name="tot")]
        aggs += [Sum(f"df{qi}_p", alias_name=f"df{qi}")
                 for qi in range(len(toks_q))]
        st = ds.map_batches(stats, batch_format="pyarrow").aggregate(*aggs)
        N, tot = int(st["n"]), int(st["tot"])
        dfs = [int(st[f"df{qi}"]) for qi in range(len(toks_q))]
        avgl = tot / N
        idfs = [np.log((N - d + 0.5) / (d + 0.5) + 1.0) for d in dfs]

        def score(b: pa.Table) -> pa.Table:
            ids, tfl, dll = [], [], []
            for did, t in zip(b["doc_id"].to_pylist(),
                              b["text"].to_pylist()):
                tk = text.WS_RE.findall(t or "")
                tf = [tk.count(qt) for qt in toks_q]
                if any(tf):
                    ids.append(did)
                    tfl.append(tf)
                    dll.append(len(tk))
            if not ids:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "bm25_e6": pa.array([], pa.int64())})
            tf = np.asarray(tfl, np.float64)
            dl = np.asarray(dll, np.float64)
            total = np.zeros(len(ids))
            for qi in range(len(toks_q)):    # fixed query order
                total = total + idfs[qi] * (tf[:, qi] * (k1 + 1.0)) \
                    / (tf[:, qi] + k1 * (1.0 - bb + bb * dl / avgl))
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "bm25_e6": pa.array(np.floor(total * 1e6)
                                    .astype(np.int64), pa.int64())})

        scored = ds.map_batches(score, batch_format="pyarrow")
        return distributed_topk(scored, 20, [("bm25_e6", "descending"),
                                             ("doc_id", "ascending")])
    q["doc_bm25_topk"] = doc_bm25_topk

    def way_hausdorff_pairs(sf_dir):
        """Shape-similarity join: pairs of ways whose discrete symmetric
        Hausdorff distance (over e7-integer vertex coords — exact, no
        float ties) is within HAUS_T_E7 (~7.7 km — sized to the
        fixture's way spacing). PBSM shape: each way
        ships ONE row (vertex arrays + bbox) to the grid cells its
        t-EXPANDED bbox covers; H ≤ t implies the expanded bboxes
        intersect, so every qualifying pair shares a cell and the
        reference-point rule emits it exactly once. In-cell, a strong
        bbox-alignment prefilter (|Δbbox edge| ≤ t per axis, a necessary
        condition of H ≤ t) gates the per-pair (na × nb) distance
        matrix. The twin is the exhaustive n² max-of-min over the same
        integer coords."""
        from ..util import bucketed_group_apply
        res = HAUS_XRES
        n = np.int64(1) << np.int64(res)
        t = HAUS_T_E7
        joined = _way_points(sf_dir)

        def per_way(g: pd.DataFrame) -> pd.DataFrame:
            rows = []
            exp = t / 1e7
            for wid, p in g.groupby("way_id"):
                lon = p["lon"].to_numpy()
                lat = p["lat"].to_numpy()
                x = np.floor(lon * 1e7 + 0.5).astype(np.int64)
                y = np.floor(lat * 1e7 + 0.5).astype(np.int64)
                qlo = geo.cell_xy(np.array([lon.min() - exp]),
                                  np.array([lat.min() - exp]), res)
                qhi = geo.cell_xy(np.array([lon.max() + exp]),
                                  np.array([lat.max() + exp]), res)
                rows.append((int(wid), x.tolist(), y.tolist(),
                             int(qlo[0][0]), int(qhi[0][0]),
                             int(qlo[1][0]), int(qhi[1][0])))
            if not rows:
                return pd.DataFrame({
                    "way_id": pd.Series([], dtype="int64"),
                    "xs": pd.Series([], dtype=object),
                    "ys": pd.Series([], dtype=object),
                    "qx_min": pd.Series([], dtype="int64"),
                    "qx_max": pd.Series([], dtype="int64"),
                    "qy_min": pd.Series([], dtype="int64"),
                    "qy_max": pd.Series([], dtype="int64")})
            wid_, xs_, ys_, a, b_, c, d = zip(*rows)
            return pd.DataFrame({
                "way_id": np.asarray(wid_, np.int64), "xs": list(xs_),
                "ys": list(ys_),
                "qx_min": np.asarray(a, np.int64),
                "qx_max": np.asarray(b_, np.int64),
                "qy_min": np.asarray(c, np.int64),
                "qy_max": np.asarray(d, np.int64)})

        ways = bucketed_group_apply(joined, ["way_id"], per_way,
                                    n_buckets=64)

        def explode(b: pa.Table) -> pa.Table:
            qxm = b["qx_min"].to_numpy()
            qym = b["qy_min"].to_numpy()
            cx = b["qx_max"].to_numpy() - qxm + 1
            cy = b["qy_max"].to_numpy() - qym + 1
            cnt = cx * cy
            if cnt.size and int(cnt.max()) > 65536:
                raise RuntimeError(
                    "way_hausdorff_pairs: a way bbox covers "
                    f"{int(cnt.max())} cells at res {res}; raise "
                    f"HAUS_XRES bounds")
            tot = int(cnt.sum())
            si = np.repeat(np.arange(len(cnt)), cnt)
            within = np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
            cqx = qxm[si] + within // cy[si]
            cqy = qym[si] + within % cy[si]
            ti = pa.array(si)
            return pa.table({
                "cell": pa.array(cqx * n + cqy, pa.int64()),
                "way_id": b["way_id"].take(ti),
                "xs": b["xs"].take(ti), "ys": b["ys"].take(ti),
                "qx_min": b["qx_min"].take(ti),
                "qy_min": b["qy_min"].take(ti)})

        exploded = ways.map_batches(explode, batch_format="pyarrow")

        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            oa, ob, od = [], [], []
            for cell, gg in g.groupby("cell", sort=False):
                m = len(gg)
                if m < 2:
                    continue
                if m > 20_000:
                    raise RuntimeError(
                        f"way_hausdorff_pairs: hot cell with {m} ways; "
                        f"raise HAUS_XRES")
                w = gg["way_id"].to_numpy()
                qxm = gg["qx_min"].to_numpy()
                qym = gg["qy_min"].to_numpy()
                xs = [np.asarray(v, np.int64) for v in gg["xs"]]
                ys = [np.asarray(v, np.int64) for v in gg["ys"]]
                bx0 = np.array([v.min() for v in xs], np.int64)
                bx1 = np.array([v.max() for v in xs], np.int64)
                by0 = np.array([v.min() for v in ys], np.int64)
                by1 = np.array([v.max() for v in ys], np.int64)
                idx = np.arange(m)
                cand = idx[None, :] > idx[:, None]
                cand &= (np.maximum(qxm[:, None], qxm[None, :]) * n
                         + np.maximum(qym[:, None], qym[None, :])
                         == int(cell))
                cand &= np.abs(bx0[:, None] - bx0[None, :]) <= t
                cand &= np.abs(bx1[:, None] - bx1[None, :]) <= t
                cand &= np.abs(by0[:, None] - by0[None, :]) <= t
                cand &= np.abs(by1[:, None] - by1[None, :]) <= t
                for i, j in zip(*np.nonzero(cand)):
                    dx = xs[i][:, None] - xs[j][None, :]
                    dy = ys[i][:, None] - ys[j][None, :]
                    d2 = dx * dx + dy * dy
                    h = max(int(d2.min(axis=1).max()),
                            int(d2.min(axis=0).max()))
                    if h <= HAUS_D2_MAX:
                        oa.append(min(int(w[i]), int(w[j])))
                        ob.append(max(int(w[i]), int(w[j])))
                        od.append(h)
            return pd.DataFrame({
                "way_a": pd.Series(oa, dtype="int64"),
                "way_b": pd.Series(ob, dtype="int64"),
                "haus_d2": pd.Series(od, dtype="int64")})

        return bucketed_group_apply(exploded, ["cell"], pairs,
                                    n_buckets=64)
    q["way_hausdorff_pairs"] = way_hausdorff_pairs

    def polygon_polyfill_cells(sf_dir):
        """H3-polyfill-style interior cover: every res-POLYFILL grid cell
        whose CENTER lies inside each polygon (the set H3's polyfill
        returns, on this engine's integer grid). Work distributes over
        polygons — each group enumerates its own bbox candidate cells
        (bounded by the res choice; loud raise past the cap) and runs
        the vectorized even-odd crossing kernel over (candidates ×
        edges). Shuffle traffic is the 595-row edge table only; the
        candidate grid never leaves its task. Twin: the same bbox →
        generate_series cross-expansion → crossing-parity SQL used by
        the PIP join, with identical float trees for quantize, center
        and intersection."""
        from ..util import bucketed_group_apply
        edges = fx.read_fixture(sf_dir, "edges")
        n = float(1 << POLYFILL_RES)
        nmax = (1 << POLYFILL_RES) - 1

        def fill(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for pid, p in g.groupby("polygon_id"):
                x1 = p["x1"].to_numpy()
                y1 = p["y1"].to_numpy()
                x2 = p["x2"].to_numpy()
                y2 = p["y2"].to_numpy()
                qlo = geo.cell_xy(np.array([min(x1.min(), x2.min())]),
                                  np.array([min(y1.min(), y2.min())]),
                                  POLYFILL_RES)
                qhi = geo.cell_xy(np.array([max(x1.max(), x2.max())]),
                                  np.array([max(y1.max(), y2.max())]),
                                  POLYFILL_RES)
                gx = np.arange(qlo[0][0], qhi[0][0] + 1, dtype=np.int64)
                gy = np.arange(qlo[1][0], qhi[1][0] + 1, dtype=np.int64)
                if len(gx) * len(gy) > 500_000:
                    raise ValueError(
                        f"polyfill bbox of {pid} spans "
                        f"{len(gx) * len(gy)} cells at res "
                        f"{POLYFILL_RES}; lower the res or tile the "
                        f"polygon")
                QX, QY = np.meshgrid(gx, gy)
                qx, qy = QX.ravel(), QY.ravel()
                cx = geo.LON_MIN + (qx + 0.5) / n * (geo.LON_MAX
                                                     - geo.LON_MIN)
                cy = geo.LAT_MIN + (qy + 0.5) / n * (geo.LAT_MAX
                                                     - geo.LAT_MIN)
                inside = np.zeros(len(cx), dtype=bool)
                for i in range(len(x1)):
                    crosses = (y1[i] <= cy) != (y2[i] <= cy)
                    if not crosses.any():
                        continue
                    with np.errstate(divide="ignore", invalid="ignore"):
                        t = (cy - y1[i]) / (y2[i] - y1[i])
                        xint = x1[i] + t * (x2[i] - x1[i])
                    inside ^= crosses & (cx < xint)
                nin = int(inside.sum())
                outs.append(pd.DataFrame({
                    "polygon_id": pd.Series([pid] * nin, dtype="string"),
                    "qx": qx[inside], "qy": qy[inside]}))
            if not outs:
                return pd.DataFrame({
                    "polygon_id": pd.Series([], dtype="string"),
                    "qx": pd.Series([], dtype="int64"),
                    "qy": pd.Series([], dtype="int64")})
            return pd.concat(outs, ignore_index=True)

        from ..util import arrow_retype
        return arrow_retype(bucketed_group_apply(edges, ["polygon_id"],
                                                 fill, n_buckets=32))
    q["polygon_polyfill_cells"] = polygon_polyfill_cells

    def lancelike_bloom_point_get(sf_dir):
        """Bloom-filter point lookup through the lancelike store: orders
        are written sorted by CUSTOMER key (so order-key ranges fully
        overlap across fragments and zone maps cannot prune), with a
        per-fragment 1 KiB bloom over ``o_orderkey`` in the manifest;
        a 3-key point get then opens ONLY the fragments whose bloom
        possibly holds a key (metadata decision, asserted to be a strict
        subset — no false negatives by construction) before the exact
        IN-filter. The key set is data-derived deterministically: the 3
        smallest order keys ≡ 3 (mod 7)."""
        from ..sources import lancelike
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_orderkey", "o_custkey",
                                          "o_totalprice"])
        root = f"/tmp/graft_out/bloom_demo_{fx.sf_tag(sf_dir)}"
        lancelike.write_dataset(
            orders.sort("o_custkey"), root, stage="bloom_demo",
            parent=fx.sf_tag(sf_dir),
            fingerprint=lancelike.input_fingerprint(orders),
            bloom_cols=["o_orderkey"])

        def cand(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            k = np.sort(k[k % 7 == 3])
            return pa.table({"o_orderkey": pa.array(k[:3], pa.int64())})

        keys = [r["o_orderkey"] for r in orders.map_batches(
            cand, batch_format="pyarrow").sort("o_orderkey").take(3)]
        out, scanned, total = lancelike.read_dataset_keys(
            root, "o_orderkey", keys,
            columns=["o_orderkey", "o_custkey", "o_totalprice"])
        if not (0 < scanned < total):
            raise AssertionError(
                f"bloom pruning ineffective: {scanned}/{total}")
        return out
    q["lancelike_bloom_point_get"] = lancelike_bloom_point_get

    def doc_dup_spans(sf_dir):
        """ExactSubstr-style duplicated-SPAN profile (Lee et al. 2022,
        "Deduplicating Training Data Makes Language Models Better"):
        per document, maximal runs of word 3-grams that occur ≥ 2 times
        anywhere in the corpus (cross-doc or within-doc), merged when
        their windows overlap or touch (start-gap ≤ 2), with the token
        coverage of each run. Positional shingle hashes (fixed-width
        ints, never text) resolve their global occurrence count in ONE
        bounded-bucket shuffle; span merging is a vectorized
        gaps-and-islands pass per doc bucket."""
        from ..functions import text as tx
        from ..util import bucketed_group_apply
        docs = fx.driver_table(sf_dir, "documents",
                               columns=["doc_id", "text"])

        def shingle_pos(b: pa.Table) -> pa.Table:
            ids, ps, hs = [], [], []
            for i, t in zip(b["doc_id"].to_pylist(),
                            b["text"].to_pylist()):
                h = tx.shingle_hashes_positional(
                    tx.WS_RE.findall(t or ""), 3).view(np.int64)
                if len(h):
                    ids.append(np.full(len(h), i, np.int64))
                    ps.append(np.arange(len(h), dtype=np.int64))
                    hs.append(h)
            if not ids:
                z = pa.array([], pa.int64())
                return pa.table({"doc_id": z, "pos": z, "h": z})
            return pa.table({
                "doc_id": pa.array(np.concatenate(ids), pa.int64()),
                "pos": pa.array(np.concatenate(ps), pa.int64()),
                "h": pa.array(np.concatenate(hs), pa.int64())})

        rows = docs.map_batches(shingle_pos, batch_format="pyarrow")

        def mark(g: pd.DataFrame) -> pd.DataFrame:
            # occurrence count INCLUDES within-doc repeats (ExactSubstr
            # treats self-repetition as duplication too)
            sz = g.groupby("h", sort=False)["h"].transform("size")
            return g.loc[sz.to_numpy() >= 2, ["doc_id", "pos"]]

        dup = bucketed_group_apply(rows, ["h"], mark, n_buckets=64)

        def spans(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["doc_id", "pos"], kind="mergesort")
            d = g["doc_id"].to_numpy()
            p = g["pos"].to_numpy()
            if not len(d):
                z = pd.Series([], dtype="int64")
                return pd.DataFrame({"doc_id": z, "n_spans": z,
                                     "dup_tokens": z})
            new = np.ones(len(d), bool)
            new[1:] = (d[1:] != d[:-1]) | (p[1:] - p[:-1] > 2)
            isl = np.cumsum(new) - 1
            starts = np.nonzero(new)[0]
            ends = np.append(starts[1:] - 1, len(d) - 1)
            cov = p[ends] - p[starts] + 3       # 3-token window length
            out = pd.DataFrame({"doc_id": d[starts], "cov": cov})
            r = out.groupby("doc_id", sort=False).agg(
                n_spans=("cov", "size"),
                dup_tokens=("cov", "sum")).reset_index()
            return r.astype({"n_spans": "int64", "dup_tokens": "int64"})

        return bucketed_group_apply(dup, ["doc_id"], spans, n_buckets=32)
    q["doc_dup_spans"] = doc_dup_spans

    def lancelike_fts_search(sf_dir):
        """Full-text search through the store's INVERTED INDEX: captions
        index into token-hash-partitioned posting lists committed as an
        index dataset (one distributed build pass, stale-guarded by data
        version); an AND query then opens ONLY the posting partitions
        its tokens hash to — asserted a strict subset — and never the
        data files. Result = image ids whose caption contains every
        query token, equal by construction to the full-scan filter the
        SQL twin runs."""
        from ..sources import lancelike
        imgs = fx.read_fixture(sf_dir, "images",
                               columns=["image_id", "caption"])
        root = f"/tmp/graft_out/fts_demo_{fx.sf_tag(sf_dir)}"
        lancelike.write_dataset(
            imgs, root, stage="fts_demo", parent=fx.sf_tag(sf_dir),
            fingerprint=lancelike.input_fingerprint(imgs))
        lancelike.create_inverted_index(root, "caption", "image_id",
                                        n_buckets=8)
        out, scanned, total = lancelike.search_inverted_index(
            root, "caption", ["stall", "Serangoon"], mode="and")
        if not (0 < scanned < total):
            raise AssertionError(
                f"FTS partition pruning ineffective: {scanned}/{total}")

        def ren(b: pa.Table) -> pa.Table:
            return b.rename_columns(["image_id"])
        return out.map_batches(ren, batch_format="pyarrow")
    q["lancelike_fts_search"] = lancelike_fts_search

    def semdedup_pairs(sf_dir):
        """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding
        space, then search near-duplicate pairs ONLY within a cluster —
        the scalable alternative to an all-pairs cosine join. Centroids
        come from the pinned Lloyd kernel (k=4, 1 update round, id-
        ordered seeds); assignment is one broadcast map pass with the
        same Σ(x_j−c_j)² expression as the SQL twin; within-cluster
        pairs resolve in a bucketed shuffle keyed on the cluster id
        (per-cluster matmul, hot-cluster cap raises loudly). τ=0.98 sits
        far from any pair's cosine, so the pair set is value-exact."""
        import ray

        from ..util import _bcast_get, bucketed_group_apply
        ds = fx.read_fixture(sf_dir, "embeddings_dup",
                             columns=["vec_id", "embedding"]).materialize()
        C, _ = simsearch.kmeans_fit(ds, "embedding", "vec_id",
                                    k=4, n_iters=1)
        ref = ray.put(C)

        def assign(b: pa.Table, _c=ref) -> pa.Table:
            cen = _bcast_get(_c)
            x = np.stack(b["embedding"].to_numpy(zero_copy_only=False)) \
                  .astype(np.float64)
            d2 = ((x[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
            return pa.table({
                "vec_id": b["vec_id"],
                "c": pa.array(np.argmin(d2, axis=1).astype(np.int64)),
                "embedding": b["embedding"]})

        asg = ds.map_batches(assign, batch_format="pyarrow")

        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for c, grp in g.groupby("c", sort=False):
                if len(grp) > 100_000:
                    raise ValueError(
                        f"cluster {c} holds {len(grp)} vectors — raise k "
                        "or sub-bucket before the within-cluster scan")
                ids = grp["vec_id"].to_numpy()
                X = np.stack(grp["embedding"].to_numpy()) \
                      .astype(np.float64)
                Xn = X / np.sqrt((X * X).sum(axis=1))[:, None]
                ia, ib = np.nonzero(np.triu(Xn @ Xn.T >= 0.98, k=1))
                a, b_ = ids[ia], ids[ib]
                outs.append(pd.DataFrame({
                    "c": np.full(len(a), c, np.int64),
                    "id_a": np.minimum(a, b_).astype(np.int64),
                    "id_b": np.maximum(a, b_).astype(np.int64)}))
            if not outs:
                z = pd.Series([], dtype="int64")
                return pd.DataFrame({"c": z, "id_a": z, "id_b": z})
            return pd.concat(outs, ignore_index=True)

        return bucketed_group_apply(asg, ["c"], pairs, n_buckets=4)
    q["semdedup_pairs"] = semdedup_pairs

    def phash_caption_conflicts(sf_dir):
        """Label-conflict screen for multimodal training data: images
        whose VISUAL content collides (identical phash) but whose
        captions disagree — per phash group with ≥ 2 images, the image
        count and the distinct-caption count. One bounded-bucket shuffle
        on the hash key; per-bucket aggregation is a vectorized pandas
        groupby."""
        from ..util import bucketed_group_apply
        imgs = fx.read_fixture(sf_dir, "images",
                               columns=["image_id", "phash", "caption"])

        def agg(g: pd.DataFrame) -> pd.DataFrame:
            r = g.groupby("phash", sort=False).agg(
                n_imgs=("caption", "size"),
                n_captions=("caption", "nunique")).reset_index()
            r = r[r["n_imgs"] >= 2]
            return r.astype({"n_imgs": "int64", "n_captions": "int64"})

        return bucketed_group_apply(imgs, ["phash"], agg, n_buckets=32)
    q["phash_caption_conflicts"] = phash_caption_conflicts

    def kde_cell_density(sf_dir):
        """Kernel density surface over the point table (heatmap KDE with
        an integer Epanechnikov-style kernel): density(cell) =
        Σ_{|dx|,|dy| ≤ 2} n(cell+δ) · (9 − dx² − dy²) over the per-cell
        point counts at res 13 — all weights integer, so the surface is
        exact under any partitioning. Counts pre-reduce per block
        (pyarrow C++ combiner), the 25-neighbor explode runs over
        DISTINCT cells only, and one bounded sum merges the partials —
        points never cross the wire."""
        from ..functions import geo as G
        from ..util import bucketed_sum, grouped_agg_vec
        RES, N = 13, 1 << 13
        pts = fx.read_fixture(sf_dir, "geo", columns=["lon", "lat"])

        def cells(b: pa.Table) -> pa.Table:
            x, y = G.cell_xy(b["lon"].to_numpy(), b["lat"].to_numpy(), RES)
            return pa.table({"k": pa.array(x * N + y, pa.int64())})

        cnt = grouped_agg_vec(pts.map_batches(cells, batch_format="pyarrow"),
                              ["k"], [(None, "count", "n")])

        def explode(b: pa.Table) -> pa.Table:
            k = b["k"].to_numpy()
            n = pc.cast(b["n"], pa.int64()).to_numpy()
            ux, uy = k // N, k % N
            ks, ws = [], []
            for dx in range(-2, 3):
                for dy in range(-2, 3):
                    w = 9 - (dx * dx + dy * dy)
                    nx, ny = ux + dx, uy + dy
                    ok = (nx >= 0) & (nx < N) & (ny >= 0) & (ny < N)
                    ks.append(nx[ok] * N + ny[ok])
                    ws.append(n[ok] * w)
            return pa.table({
                "k": pa.array(np.concatenate(ks), pa.int64()),
                "wn": pa.array(np.concatenate(ws).astype(np.int64),
                               pa.int64())})

        dens = bucketed_sum(cnt.map_batches(explode, batch_format="pyarrow"),
                            ["k"], {"wn": "dens"}, n_buckets=64)

        def out(g: pd.DataFrame) -> pd.DataFrame:
            k = g["k"].to_numpy()
            return pd.DataFrame({"qx": (k // N).astype(np.int64),
                                 "qy": (k % N).astype(np.int64),
                                 "dens": g["dens"].to_numpy()
                                          .astype(np.int64)})

        return dens.map_batches(out, batch_format="pandas")
    q["kde_cell_density"] = kde_cell_density

    def event_type_transitions(sf_dir):
        """First-order Markov transition matrix of the event stream:
        per user, consecutive event-type pairs in exact (ts, event_id)
        order, counted globally, with the row-normalized transition
        probability in permille (floor division over positive ints —
        exact on both engines). Pairs build inside one bounded bucket
        shuffle per user; the tiny (≤ n_types²) count table finishes
        on the driver."""
        from ..util import bucketed_group_apply
        ev = fx.driver_table(sf_dir, "events",
                             columns=["user_id", "event_id", "ts",
                                      "event_type"])

        def trans(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
            u = g["user_id"].to_numpy()
            t = g["event_type"].to_numpy()
            same = u[1:] == u[:-1]
            out = pd.DataFrame({"prev_type": t[:-1][same],
                                "next_type": t[1:][same]})
            r = out.groupby(["prev_type", "next_type"], sort=False) \
                   .size().reset_index(name="cnt")
            r["prev_type"] = r["prev_type"].astype("string")
            r["next_type"] = r["next_type"].astype("string")
            return r.astype({"cnt": "int64"})

        counts = bucketed_group_apply(ev, ["user_id"], trans,
                                      n_buckets=64)
        from ..util import bucketed_sum
        merged = bucketed_sum(counts, ["prev_type", "next_type"],
                              {"cnt": "cnt"}, n_buckets=16).to_pandas()
        tot = merged.groupby("prev_type")["cnt"].transform("sum")
        merged["p_permille"] = (1000 * merged["cnt"]) // tot
        merged["prev_type"] = merged["prev_type"].astype(object)
        merged["next_type"] = merged["next_type"].astype(object)
        return merged.reset_index(drop=True)
    q["event_type_transitions"] = event_type_transitions

    def polygon_centroids(sf_dir):
        """Exact polygon centroids (the shoelace moment formula) on e7
        integer coordinates: per polygon, Σcross and the two first-
        moment sums run in arbitrary-precision Python ints inside one
        bucketed pass (the per-edge moment products overflow int64),
        anchored at the polygon's min corner so the final floor
        division has a non-negative numerator — the sign-normalized
        HUGEINT twin floors identically. Degenerate (zero-area) rings
        drop on both engines."""
        from ..util import bucketed_group_apply
        edges = fx.read_fixture(sf_dir, "edges")

        def cent(g: pd.DataFrame) -> pd.DataFrame:
            pids, cxs, cys = [], [], []
            for pid, e in g.groupby("polygon_id", sort=False):
                x1 = np.floor(e["x1"].to_numpy() * 1e7 + 0.5) \
                    .astype(np.int64)
                y1 = np.floor(e["y1"].to_numpy() * 1e7 + 0.5) \
                    .astype(np.int64)
                x2 = np.floor(e["x2"].to_numpy() * 1e7 + 0.5) \
                    .astype(np.int64)
                y2 = np.floor(e["y2"].to_numpy() * 1e7 + 0.5) \
                    .astype(np.int64)
                ax = int(min(x1.min(), x2.min()))
                ay = int(min(y1.min(), y2.min()))
                a2 = sx = sy = 0
                for i in range(len(x1)):    # ≤ ring length, exact ints
                    u1, v1 = int(x1[i]) - ax, int(y1[i]) - ay
                    u2, v2 = int(x2[i]) - ax, int(y2[i]) - ay
                    cr = u1 * v2 - u2 * v1
                    a2 += cr
                    sx += (u1 + u2) * cr
                    sy += (v1 + v2) * cr
                if a2 == 0:
                    continue
                if a2 < 0:
                    a2, sx, sy = -a2, -sx, -sy
                pids.append(pid)
                cxs.append(ax + sx // (3 * a2))
                cys.append(ay + sy // (3 * a2))
            return pd.DataFrame({
                "polygon_id": pd.Series(pids, dtype="string"),
                "cx_e7": pd.Series(cxs, dtype="int64"),
                "cy_e7": pd.Series(cys, dtype="int64")})

        from ..util import arrow_retype
        return arrow_retype(bucketed_group_apply(edges, ["polygon_id"],
                                                 cent, n_buckets=16))
    q["polygon_centroids"] = polygon_centroids

    def polyfill_compact_cells(sf_dir):
        """S2/H3-style cell COMPACTION of the polyfill cover: where all
        4 children of a res-15 (then res-14) quadtree parent are in the
        cover, replace them by the parent — the mixed-resolution cover
        a spatial index serves range queries from. Two bottom-up levels
        run vectorized inside the per-polygon bucket (a polygon's cells
        colocate, so promotion is exact); output is (polygon_id, res,
        qx, qy) at res 16/15/14."""
        from ..util import bucketed_group_apply
        cells = polygon_polyfill_cells(sf_dir)
        M = np.int64(1) << np.int64(20)

        def compact(g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for pid, grp in g.groupby("polygon_id", sort=False):
                qx = grp["qx"].to_numpy().astype(np.int64)
                qy = grp["qy"].to_numpy().astype(np.int64)
                for res in (16, 15):
                    pk = (qx // 2) * M + (qy // 2)
                    uniq, inv, cnts = np.unique(
                        pk, return_inverse=True, return_counts=True)
                    promoted = cnts[inv] == 4
                    keep = ~promoted
                    outs.append(pd.DataFrame({
                        "polygon_id": pd.Series([pid] * int(keep.sum()),
                                                dtype="string"),
                        "res": np.full(int(keep.sum()), res, np.int64),
                        "qx": qx[keep], "qy": qy[keep]}))
                    par = uniq[cnts == 4]
                    qx, qy = par // M, par % M
                outs.append(pd.DataFrame({
                    "polygon_id": pd.Series([pid] * len(qx),
                                            dtype="string"),
                    "res": np.full(len(qx), 14, np.int64),
                    "qx": qx, "qy": qy}))
            if not outs:
                z = pd.Series([], dtype="int64")
                return pd.DataFrame({
                    "polygon_id": pd.Series([], dtype="string"),
                    "res": z, "qx": z, "qy": z})
            return pd.concat(outs, ignore_index=True)

        from ..util import arrow_retype
        return arrow_retype(bucketed_group_apply(cells, ["polygon_id"],
                                                 compact, n_buckets=16))
    q["polyfill_compact_cells"] = polyfill_compact_cells

    def way_buffer_cells(sf_dir):
        """Polyline BUFFER as a cell cover: the distinct raster cells
        any way burns (the DDA kernel), dilated by one Chebyshev ring —
        dilation multiplies the globally-DISTINCT cell set, never the
        per-way burn, so shuffles carry only cell keys (the
        cell_buffer_dilate discipline applied to line geometry)."""
        from ..util import grouped_count
        n = 1 << WAY_RASTER_RES
        burned = way_rasterize_cells(sf_dir)

        def key(b: pa.Table) -> pa.Table:
            k = b["cx"].to_numpy().astype(np.int64) * n \
                + b["cy"].to_numpy().astype(np.int64)
            return pa.table({"k": pa.array(k, pa.int64())})

        distinct = grouped_count(
            burned.map_batches(key, batch_format="pyarrow"), "k")

        def dilate(b: pa.Table) -> pa.Table:
            k = b["k"].to_numpy()
            ux, uy = k // n, k % n
            ks = []
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nx, ny = ux + dx, uy + dy
                    ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
                    ks.append(nx[ok] * n + ny[ok])
            return pa.table({"k": pa.array(np.concatenate(ks),
                                           pa.int64())})

        dil = grouped_count(
            distinct.map_batches(dilate, batch_format="pyarrow"), "k")

        def out(b: pa.Table) -> pa.Table:
            k = b["k"].to_numpy()
            return pa.table({"cx": pa.array(k // n, pa.int64()),
                             "cy": pa.array(k % n, pa.int64())})
        return dil.map_batches(out, batch_format="pyarrow")
    q["way_buffer_cells"] = way_buffer_cells

    def image_dedup_keep_list(sf_dir):
        """The dedup DECISION LIST a training pipeline actually applies:
        per exact-duplicate phash group, keep the smallest image_id and
        emit every other member with its keeper — the drop manifest.
        One bounded-bucket shuffle on the hash key; per-bucket keeper
        resolution is a vectorized groupby-transform."""
        from ..util import bucketed_group_apply
        imgs = fx.read_fixture(sf_dir, "images",
                               columns=["image_id", "phash"])

        def keep(g: pd.DataFrame) -> pd.DataFrame:
            gg = g.groupby("phash", sort=False)["image_id"]
            keeper = gg.transform("min")
            sz = gg.transform("size")
            m = (sz.to_numpy() >= 2) & (g["image_id"].to_numpy()
                                        != keeper.to_numpy())
            return pd.DataFrame({
                "dropped_id": g["image_id"].to_numpy()[m],
                "keeper_id": keeper.to_numpy()[m]}).astype(
                {"dropped_id": "string", "keeper_id": "string"})

        from ..util import arrow_retype
        return arrow_retype(
            bucketed_group_apply(imgs, ["phash"], keep, n_buckets=32))
    q["image_dedup_keep_list"] = image_dedup_keep_list

    def image_phash_clusters(sf_dir):
        """Near-dup image CLUSTERS: connected components over the
        banded-Hamming pair graph (phash distance ≤ 3), reported as
        (root_id = component min image_id, n_members). Pairs come from
        the pigeonhole-exact banding kernel; labels from the two-regime
        distributed CC — the oracle closes the same pair set with a
        recursive-CTE transitive closure."""
        from ..util import grouped_agg_vec
        ds = fx.read_fixture(sf_dir, "images",
                             columns=["image_id", "phash"])
        pairs = dedup.band_hamming_pairs(ds, "image_id", "phash",
                                         max_hamming=3) \
                     .select_columns(["id_a", "id_b"])
        labels = dedup.connected_components_pairs(pairs)
        agg = grouped_agg_vec(labels, ["label"],
                              [(None, "count", "n_members")])

        def ren(b: pa.Table) -> pa.Table:   # rename via arrow map (the
            # rename_columns-on-pandas-blocks gotcha, NOTES_r4)
            return pa.table({"root_id": b["label"],
                             "n_members": pc.cast(b["n_members"],
                                                  pa.int64())})
        return agg.map_batches(ren, batch_format="pyarrow")
    q["image_phash_clusters"] = image_phash_clusters

    def doc_quality_filter_ids(sf_dir):
        """The quality-filter KEEP LIST (the artifact the funnel counts
        summarize): ids of documents passing every Gopher-style stage —
        min length, distinct-token ratio, modal-bigram repetition — over
        the oracle-pinned repetition signals. Map-only over the signal
        pass; no shuffle."""
        from ..stages import textstage
        docs = fx.driver_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
        stats = textstage.repetition_stats(docs)

        def passing(b: pa.Table) -> pa.Table:
            n = b["n_tokens"].to_numpy()
            dr = b["distinct_token_ratio"].to_numpy(zero_copy_only=False)
            bf = b["top_bigram_frac"].to_numpy(zero_copy_only=False)
            keep = (n >= 30) & ~np.isnan(dr) & (dr >= 0.45) & (bf <= 0.04)
            return pa.table({"doc_id": pc.cast(
                b["doc_id"].filter(pa.array(keep)), pa.int64())})

        return stats.map_batches(passing, batch_format="pyarrow")
    q["doc_quality_filter_ids"] = doc_quality_filter_ids

    def embedding_outlier_screen(sf_dir):
        """Embedding data-quality screen: squared distance of every
        vector to its OWN label's class prototype (the per-label mean
        from one map-only partial pass, broadcast once), fixed-pointed
        at e4 — the far tail of this column is what a curation pipeline
        drops. Same Σ(x_j−m_j)² expression as the SQL twin's
        lateral-UNNEST prototype join."""
        import ray

        from ..util import _bcast_get
        ds = fx.driver_table(sf_dir, "embeddings",
                             columns=["vec_id", "embedding", "label"]) \
            .materialize()
        keys, means, _ = simsearch.grouped_vector_mean(ds, "embedding",
                                                       "label")
        ref = ray.put((keys, means))

        def score(b: pa.Table, _r=ref) -> pa.Table:
            ks, cen = _bcast_get(_r)
            pos = {k: i for i, k in enumerate(ks)}
            x = np.stack(b["embedding"].to_numpy(zero_copy_only=False)) \
                  .astype(np.float64)
            lab = b["label"].to_numpy(zero_copy_only=False)
            m = cen[np.array([pos[v] for v in lab])]
            # dim-sequential accumulation == the twin's list_sum left
            # fold (numpy axis-sums go pairwise past 8 terms — NOTES_r4)
            d2 = np.zeros(len(x), np.float64)
            for j in range(x.shape[1]):
                d2 += (x[:, j] - m[:, j]) ** 2
            return pa.table({
                "vec_id": b["vec_id"],
                "label": b["label"],
                "d2_e4": pa.array(np.floor(d2 * 1e4 + 0.5)
                                  .astype(np.int64), pa.int64())})

        return ds.map_batches(score, batch_format="pyarrow")
    q["embedding_outlier_screen"] = embedding_outlier_screen

    # ---------------- training-data curation plans (session-6 batch A)

    def spatial_stratified_sample(sf_dir):
        """Spatially stratified curation sampling: ONE representative
        image per occupied res-12 grid cell, picked by a deterministic
        pseudo-random key (splitmix64 of the numeric image index) so the
        pick is stable across parallelism / resume / re-runs — the
        primitive that de-biases a hot-spot-skewed corpus before
        training. Per-block pre-reduce keeps ≤1 row per (cell, block);
        the shuffle carries only cell keys + ids + one uint64."""
        from ..functions.hashing import splitmix64
        from ..util import grouped_topk
        ds = fx.read_fixture(sf_dir, "geo",
                             columns=["image_id", "lon", "lat"])

        def keyed(b: pa.Table) -> pa.Table:
            qx, qy = geo.cell_xy(b["lon"].to_numpy(),
                                 b["lat"].to_numpy(), CELL_RES)
            idnum = pc.cast(pc.utf8_slice_codeunits(b["image_id"], 3),
                            pa.uint64()).to_numpy(zero_copy_only=False)
            h = splitmix64(idnum)
            return pa.table({"image_id": b["image_id"],
                             "qx": pa.array(qx, pa.int64()),
                             "qy": pa.array(qy, pa.int64()),
                             "h": pa.array(h, pa.uint64())})

        picked = grouped_topk(ds.map_batches(keyed, batch_format="pyarrow"),
                              ["qx", "qy"], 1,
                              [("h", "asc"), ("image_id", "asc")])
        return picked.map_batches(
            lambda b: b.select(["qx", "qy", "image_id"]),
            batch_format="pyarrow")
    q["spatial_stratified_sample"] = spatial_stratified_sample

    def label_balance_plan(sf_dir):
        """Class-balance curation plan: per-label vector counts plus the
        permille undersampling rate that equalizes every label to the
        rarest one (floor(1000·min/n)) — the plan a builder feeds back
        into hash_stratified_sample. Counts via the vectorized map-side
        combiner; only the distinct-label table (bounded) leaves the
        cluster."""
        ds = fx.driver_table(sf_dir, "embeddings", columns=["label"])
        counts = grouped_count(ds, "label", out="n_vecs").to_pandas()
        m = int(counts["n_vecs"].min())
        counts["rate_permille"] = (1000 * m) // counts["n_vecs"]
        counts["label"] = counts["label"].astype("int64")
        return counts
    q["label_balance_plan"] = label_balance_plan

    def epoch_shuffle_positions(sf_dir):
        """Deterministic epoch-shuffle plan: the global training order
        for two epochs as rank-of-hash (splitmix64(doc_id ^ epoch)) via
        a range-partitioned sort + O(blocks) offset merge
        (global_row_number) — never a driver-side sort. Epochs
        decorrelate because the seed enters the MIXER, not the
        comparator; the permutation is reproducible byte-for-byte in
        HUGEINT SQL."""
        from ..functions.hashing import hash64_ints
        from ..util import global_row_number
        outs = []
        for epoch in (0, 1):
            ds = fx.driver_table(sf_dir, "documents", columns=["doc_id"])

            def keyed(b: pa.Table, _e=epoch) -> pa.Table:
                h = hash64_ints(b["doc_id"].to_numpy(), seed=_e)
                return pa.table({"doc_id": b["doc_id"],
                                 "h": pa.array(h, pa.uint64())})

            rn = global_row_number(
                ds.map_batches(keyed, batch_format="pyarrow"),
                [("h", "asc"), ("doc_id", "asc")], out_col="pos")
            outs.append(rn.map_batches(
                lambda b, _e=epoch: pa.table({
                    "epoch": pa.array(
                        np.full(b.num_rows, _e, np.int64)),
                    "doc_id": b["doc_id"],
                    "pos": b["pos"]}),
                batch_format="pyarrow"))
        return outs[0].union(outs[1])
    q["epoch_shuffle_positions"] = epoch_shuffle_positions

    def event_value_exact_median_by_type(sf_dir):
        """EXACT per-type median of the value column (e6 fixed point) by
        distributed selection — iterative histogram refinement
        (sketch.exact_grouped_kth): 3 streaming passes, each shipping
        ≤ groups×4096 integer partials, instead of a global sort of the
        data volume. Lower median (rank ⌈n/2⌉) so the answer is an
        ELEMENT, exactly reproducible in SQL via ROW_NUMBER."""
        from ..stages import sketch
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "value"])

        def scale(b: pa.Table) -> pa.Table:
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table({"event_type": b["event_type"],
                             "v": pa.array(np.floor(v * 1e6 + 0.5)
                                           .astype(np.int64), pa.int64())})

        out = sketch.exact_grouped_kth(
            ds.map_batches(scale, batch_format="pyarrow"),
            "event_type", "v")
        return out.rename(columns={"v": "median_e6"})
    q["event_value_exact_median_by_type"] = event_value_exact_median_by_type

    def lancelike_schema_evolution_check(sf_dir):
        """Metadata-only schema evolution (Lance/Iceberg-style):
        RENAME COLUMN + DROP COLUMN commit in ZERO data I/O (fragments
        carried by reference; the scan path applies the projection),
        data-rewriting verbs refuse until ``materialize_schema`` bakes
        the edits into fragments, and the physical rewrite is
        byte-equivalent to the metadata view. The pre-evolution version
        stays readable under the OLD schema (copy-on-write)."""
        import shutil

        from ..sources import lancelike

        tag = os.path.basename(os.path.normpath(sf_dir))
        root = f"/tmp/graft_schemaevo/{tag}"
        shutil.rmtree(root, ignore_errors=True)
        geo_ds = fx.read_fixture(sf_dir, "geo")
        man1 = lancelike.write_dataset(geo_ds, root, stage="base",
                                       resume=False)
        man2 = lancelike.rename_column(root, "ren", "addr_street",
                                       "street_name")
        man3 = lancelike.drop_column(root, "drop", "addr_postcode")
        if (man2["version"], man3["version"]) != \
                (man1["version"] + 1, man1["version"] + 2):
            raise AssertionError("schema edits must commit new versions")
        if any(f not in man1["fragments"] for f in man3["fragments"]):
            raise AssertionError("metadata-only edits rewrote data")
        try:
            lancelike.compact(root, stage="bad")
            raise AssertionError("compact must refuse pending edits")
        except ValueError:
            pass
        cols = ["image_id", "street_name", "lon"]
        meta_view = lancelike.read_dataset(root, columns=cols) \
            .to_pandas().sort_values("image_id").reset_index(drop=True)
        old = lancelike.read_dataset(root, version=man1["version"])
        if "addr_postcode" not in old.schema().names:
            raise AssertionError("old version lost a column")
        man4 = lancelike.materialize_schema(root)
        if man4.get("schema_edits"):
            raise AssertionError("materialize left pending edits")
        final = lancelike.read_dataset(root)
        names = set(final.schema().names)
        if "street_name" not in names or "addr_postcode" in names:
            raise AssertionError(f"materialized schema wrong: {names}")
        phys = final.select_columns(cols).to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        if not phys.equals(meta_view):
            raise AssertionError("physical rewrite != metadata view")
        return phys
    q["lancelike_schema_evolution_check"] = lancelike_schema_evolution_check

    def polygon_value_cell_alloc(sf_dir):
        """Areal interpolation (dasymetric downscaling): each polygon's
        unit weight (1e6) spreads uniformly over its polyfill cells
        (integer share = 1e6 // n_cells, exact on both engines); per-cell
        totals then come from one bounded-bucket integer sum. The
        polygon→share table is distinct-polygon-bounded, so it rides a
        plain broadcast dict; cells never leave their bucket until
        pre-reduced."""
        from ..util import bucketed_sum
        pf = polygon_polyfill_cells(sf_dir).materialize()
        sizes = grouped_count(pf, "polygon_id", out="nc").to_pandas()
        share = {p: 1_000_000 // int(n)
                 for p, n in zip(sizes["polygon_id"], sizes["nc"])}

        def with_share(b: pa.Table) -> pa.Table:
            s = [share[p] for p in b["polygon_id"].to_pylist()]
            return pa.table({"qx": b["qx"], "qy": b["qy"],
                             "share": pa.array(s, pa.int64()),
                             "one": pa.array(np.ones(b.num_rows,
                                                     np.int64))})

        out = bucketed_sum(pf.map_batches(with_share,
                                          batch_format="pyarrow"),
                           ["qx", "qy"],
                           {"share": "alloc_sum", "one": "n_polys"},
                           n_buckets=64)
        return out.map_batches(
            lambda b: pa.table({
                "qx": pc.cast(b["qx"], pa.int64()),
                "qy": pc.cast(b["qy"], pa.int64()),
                "alloc_sum": pc.cast(b["alloc_sum"], pa.int64()),
                "n_polys": pc.cast(b["n_polys"], pa.int64())}),
            batch_format="pyarrow")
    q["polygon_value_cell_alloc"] = polygon_value_cell_alloc

    def cell_majority_kind(sf_dir):
        """Per-cell MAJORITY polygon kind over the polyfill cover (ties →
        lexicographic smallest kind): the zonal-classification primitive.
        Kind attaches via a bounded broadcast dict (polygons are the
        small side); counts pre-reduce map-side, then one grouped top-1
        under a TOTAL order."""
        from ..util import bucketed_sum, grouped_topk
        pf = polygon_polyfill_cells(sf_dir)
        polys = fx.read_fixture(sf_dir, "polygons",
                                columns=["polygon_id", "kind"]).to_pandas()
        kind = dict(zip(polys["polygon_id"], polys["kind"]))

        def with_kind(b: pa.Table) -> pa.Table:
            k = [kind[p] for p in b["polygon_id"].to_pylist()]
            return pa.table({"qx": b["qx"], "qy": b["qy"],
                             "kind": pa.array(k, pa.string()),
                             "one": pa.array(np.ones(b.num_rows,
                                                     np.int64))})

        # distinct (cell, kind) scales with the cover — use the bounded
        # bucketed vectorized sum, never the ray sort-agg (NOTES_r4)
        counts = bucketed_sum(
            pf.map_batches(with_kind, batch_format="pyarrow"),
            ["qx", "qy", "kind"], {"one": "cnt"}, n_buckets=64)
        top = grouped_topk(counts, ["qx", "qy"], 1,
                           [("cnt", "desc"), ("kind", "asc")])
        return top.map_batches(
            lambda b: pa.table({
                "qx": pc.cast(b["qx"], pa.int64()),
                "qy": pc.cast(b["qy"], pa.int64()),
                "kind": pc.cast(b["kind"], pa.string()),
                "cnt": pc.cast(b["cnt"], pa.int64())}),
            batch_format="pyarrow")
    q["cell_majority_kind"] = cell_majority_kind

    def kmv_type_jaccard(sf_dir):
        """Pairwise audience overlap between event types from grouped
        KMV sketches (sketch.kmv_grouped_jaccard) — set similarity
        without shipping the user sets: bounded groups×k hash rows per
        block, union-sketch Jaccard on the driver, VALUE-PINNED via the
        shared splitmix63 hash surface."""
        from ..stages import sketch
        ev = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "user_id"])
        return sketch.kmv_grouped_jaccard(ev, "event_type", "user_id",
                                          k=256)
    q["kmv_type_jaccard"] = kmv_type_jaccard

    def doc_readability(sf_dir):
        """Readability proxy per document: whitespace word count,
        vowel-group syllable proxy, and mean syllables-per-word at e6
        fixed point — one map-only pass on Arrow's C++ regex counter
        (no Python row loop), the standard complexity signal a corpus
        curator bins on."""
        docs = fx.driver_table(sf_dir, "documents",
                               columns=["doc_id", "text"])

        def f(b: pa.Table) -> pa.Table:
            words = pc.count_substring_regex(b["text"], r"\S+")
            syl = pc.count_substring_regex(pc.utf8_lower(b["text"]),
                                           "[aeiou]+")
            w = pc.cast(words, pa.int64()).to_numpy()
            s = pc.cast(syl, pa.int64()).to_numpy()
            keep = w > 0
            return pa.table({
                "doc_id": b["doc_id"].filter(pa.array(keep)),
                "n_words": pa.array(w[keep], pa.int64()),
                "n_syl": pa.array(s[keep], pa.int64()),
                "syl_per_word_e6": pa.array(
                    1_000_000 * s[keep] // w[keep], pa.int64())})

        return docs.map_batches(f, batch_format="pyarrow")
    q["doc_readability"] = doc_readability

    def weighted_sample_orders(sf_dir):
        """Deterministic weighted sampling WITHOUT replacement (priority
        sampling — Efraimidis & Spirakis 2006 with a fixed splitmix hash
        in place of the RNG): priority = hash(key)/weight, the k
        smallest priorities win, so heavier orders are proportionally
        likelier — reproducible across parallelism/resume, exactly
        twinned in SQL because uint64→double CAST and one division are
        single IEEE ops on both engines. Distributed top-k partials;
        only ≤ k rows per block reach the driver."""
        from ..functions.hashing import hash64_ints
        ds = fx.driver_table(sf_dir, "orders",
                             columns=["o_orderkey", "o_totalprice"])

        def pr(b: pa.Table) -> pa.Table:
            h = hash64_ints(b["o_orderkey"].to_numpy())
            prio = h.astype(np.float64) / \
                b["o_totalprice"].to_numpy(zero_copy_only=False)
            return pa.table({"o_orderkey": b["o_orderkey"],
                             "o_totalprice": b["o_totalprice"],
                             "prio": pa.array(prio, pa.float64())})

        top = distributed_topk(ds.map_batches(pr, batch_format="pyarrow"),
                               50, [("prio", "ascending"),
                                    ("o_orderkey", "ascending")])
        return top[["o_orderkey", "o_totalprice"]]
    q["weighted_sample_orders"] = weighted_sample_orders

    def event_value_rank_in_type(sf_dir):
        """Distributed partitioned WINDOW at data volume: per-type dense
        row_number over (value, event_id) via ONE global range-
        partitioned sort + O(blocks) offset merge (global_row_number on
        the composite key), then rank-in-type = global rank − the
        type's prefix offset (types are bounded, offsets broadcast).
        Emits the e6 percent position — the full ROW_NUMBER() OVER
        (PARTITION BY ... ORDER BY ...) shape without any per-group
        driver pull."""
        from ..util import global_row_number
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_id", "event_type", "value"])

        def scale(b: pa.Table) -> pa.Table:
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table({"event_id": b["event_id"],
                             "event_type": b["event_type"],
                             "v": pa.array(np.floor(v * 1e6 + 0.5)
                                           .astype(np.int64), pa.int64())})

        keyed = ds.map_batches(scale, batch_format="pyarrow")
        rn = global_row_number(keyed, [("event_type", "asc"),
                                       ("v", "asc"),
                                       ("event_id", "asc")], out_col="grn")
        counts = grouped_count(rn, "event_type").to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
        offs = dict(zip(counts["event_type"],
                        counts["cnt"].cumsum().shift(fill_value=0)
                        .astype("int64")))
        ns = dict(zip(counts["event_type"], counts["cnt"].astype("int64")))
        import ray

        from ..util import _bcast_get
        ref = ray.put((offs, ns))

        def rank(b: pa.Table, _r=ref) -> pa.Table:
            om, nm = _bcast_get(_r)
            et = b["event_type"].to_pylist()
            off = np.array([om[t] for t in et], np.int64)
            n = np.array([nm[t] for t in et], np.int64)
            r = b["grn"].to_numpy() - off
            pct = np.where(n > 1, 1_000_000 * (r - 1) // np.maximum(
                n - 1, 1), 0).astype(np.int64)
            return pa.table({"event_id": b["event_id"],
                             "event_type": b["event_type"],
                             "rank_in_type": pa.array(r, pa.int64()),
                             "pct_e6": pa.array(pct, pa.int64())})

        return rn.map_batches(rank, batch_format="pyarrow")
    q["event_value_rank_in_type"] = event_value_rank_in_type

    def kcenter_diverse_points(sf_dir):
        """Diverse-subset selection over the geotags: greedy farthest-
        first traversal (simsearch.kcenter_select, Gonzalez k-center) on
        e7-integer coordinates — k streaming passes, one broadcast
        center set, one top-1 partial per block, exact integer L2. The
        selected ids and their coverage-radius curve are pinned against
        an 8-step unrolled MATERIALIZED-CTE twin."""
        from ..stages import simsearch
        ds = fx.read_fixture(sf_dir, "geo",
                             columns=["image_id", "lon", "lat"])

        def to_int(b: pa.Table) -> pa.Table:
            x = np.floor(b["lon"].to_numpy() * 1e7 + 0.5).astype(np.int64)
            y = np.floor(b["lat"].to_numpy() * 1e7 + 0.5).astype(np.int64)
            vals = np.column_stack([x, y]).ravel()
            offs = np.arange(0, 2 * (len(x) + 1), 2, dtype=np.int32)
            fv = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                          pa.array(vals, pa.int64()))
            return pa.table({"image_id": b["image_id"], "fv": fv})

        return simsearch.kcenter_select(
            ds.map_batches(to_int, batch_format="pyarrow"),
            "image_id", "fv", k=KCENTER_K)
    q["kcenter_diverse_points"] = kcenter_diverse_points

    def kcenter_diverse_embeddings(sf_dir):
        """The same farthest-first traversal in EMBEDDING space — the
        diverse-core selection step of a training-data curator (pick k
        maximally spread exemplars before labeling/dedup). Vectors are
        e6 fixed-pointed so the squared-L2 chain is exact integers on
        both engines; the generic kcenter_select op is shared with the
        geospatial variant."""
        from ..stages import simsearch
        ds = fx.driver_table(sf_dir, "embeddings",
                             columns=["vec_id", "embedding"])

        def to_int(b: pa.Table) -> pa.Table:
            X = np.stack(b["embedding"].to_numpy(zero_copy_only=False)) \
                .astype(np.float64)
            V = np.floor(X * 1e6 + 0.5).astype(np.int64)
            d = V.shape[1]
            offs = np.arange(0, d * (len(V) + 1), d, dtype=np.int32)
            fv = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                          pa.array(V.ravel(), pa.int64()))
            return pa.table({"vec_id": b["vec_id"], "fv": fv})

        return simsearch.kcenter_select(
            ds.map_batches(to_int, batch_format="pyarrow"),
            "vec_id", "fv", k=KCENTER_K)
    q["kcenter_diverse_embeddings"] = kcenter_diverse_embeddings

    def doc_token_counts_bpe(sf_dir):
        """BPE-ish regex token counting (the GPT-2 pre-tokenizer shape,
        RE2-safe — no lookahead): ' ?letters | ?digits | ?other-runs'
        over the lowered text. Both engines run the SAME RE2 engine
        (pyarrow's count_substring_regex and DuckDB both bind RE2), so
        the counts are pinned, not merely similar."""
        docs = fx.driver_table(sf_dir, "documents",
                               columns=["doc_id", "text"])
        pat = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"

        def f(b: pa.Table) -> pa.Table:
            n = pc.count_substring_regex(pc.utf8_lower(b["text"]), pat)
            return pa.table({"doc_id": b["doc_id"],
                             "n_tokens_bpe": pc.cast(n, pa.int64())})

        return docs.map_batches(f, batch_format="pyarrow")
    q["doc_token_counts_bpe"] = doc_token_counts_bpe

    def way_point_loads(sf_dir):
        """Map-matched LOAD per way: how many geo points snap to each
        way (the edge-flow aggregation a routing/traffic pipeline runs
        after map matching). Composition: the exact snap kernel → one
        vectorized grouped count (ways are dimension-bounded)."""
        snapped = snap_points_to_ways(sf_dir)
        return grouped_count(snapped, "way_id", out="n_points")
    q["way_point_loads"] = way_point_loads

    def event_value_mad_by_type(sf_dir):
        """Robust dispersion per type: the MEDIAN ABSOLUTE DEVIATION,
        exactly — two composed distributed-selection passes
        (sketch.exact_grouped_kth): the per-type median, broadcast as a
        bounded dict, then the median of |v − median|. Never sorts the
        data volume; ~6 streaming passes total. The robust-outlier
        primitive (x is an outlier iff |x−med| > c·MAD) a curation
        pipeline thresholds on."""
        import ray

        from ..stages import sketch
        from ..util import _bcast_get
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "value"])

        def scale(b: pa.Table) -> pa.Table:
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table({"event_type": b["event_type"],
                             "v": pa.array(np.floor(v * 1e6 + 0.5)
                                           .astype(np.int64), pa.int64())})

        sv = ds.map_batches(scale, batch_format="pyarrow").materialize()
        med = sketch.exact_grouped_kth(sv, "event_type", "v")
        mmap = dict(zip(med["event_type"], med["v"].astype(int)))
        ref = ray.put(mmap)

        def absdev(b: pa.Table, _r=ref) -> pa.Table:
            mm = _bcast_get(_r)
            m = np.array([mm[t] for t in b["event_type"].to_pylist()],
                         np.int64)
            return pa.table({"event_type": b["event_type"],
                             "av": pa.array(np.abs(b["v"].to_numpy() - m),
                                            pa.int64())})

        mad = sketch.exact_grouped_kth(
            sv.map_batches(absdev, batch_format="pyarrow"),
            "event_type", "av")
        out = med.rename(columns={"v": "median_e6"}) \
            .merge(mad.rename(columns={"av": "mad_e6"})[
                ["event_type", "mad_e6"]], on="event_type")
        return out[["event_type", "median_e6", "mad_e6", "n"]]
    q["event_value_mad_by_type"] = event_value_mad_by_type

    def user_time_weighted_value(sf_dir):
        """Time-weighted average for an IRREGULARLY sampled series (the
        standard ops-metrics estimator: each value holds until the next
        event): per user, Σ v_e6·Δt_µs // ΣΔt_µs. The v×Δt products
        overflow int64 (≈1.3e21 here), so they accumulate in arbitrary-
        precision Python ints inside ONE bounded-bucket pass (the
        polygon-centroid precedent); the HUGEINT twin floors
        identically. Single-event users have no interval and drop on
        both engines."""
        from ..util import bucketed_group_apply, typed_empty_series
        ev = fx.driver_table(sf_dir, "events",
                             columns=["event_id", "user_id", "ts",
                                      "value"])

        def twa(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
            u = g["user_id"].to_numpy()
            t = g["ts"].astype("int64").to_numpy()
            v = np.floor(g["value"].to_numpy() * 1e6 + 0.5) \
                .astype(np.int64)
            same = u[1:] == u[:-1]
            uu = u[1:][same]
            if not len(uu):
                return pd.DataFrame({
                    "user_id": typed_empty_series(u),
                    "twa_e6": np.empty(0, np.int64),
                    "n_intervals": np.empty(0, np.int64)})
            dt = (t[1:] - t[:-1])[same].astype(object)
            vv = v[:-1][same].astype(object)
            df = pd.DataFrame({"user_id": uu, "num": vv * dt, "den": dt})
            agg = df.groupby("user_id", sort=False).agg(
                num=("num", "sum"), den=("den", "sum"),
                n=("den", "size")).reset_index()
            return pd.DataFrame({
                "user_id": agg["user_id"],
                "twa_e6": np.array([int(a) // int(b) for a, b in
                                    zip(agg["num"], agg["den"])],
                                   np.int64),
                "n_intervals": agg["n"].astype("int64")})

        return bucketed_group_apply(ev, ["user_id"], twa, n_buckets=64)
    q["user_time_weighted_value"] = user_time_weighted_value

    def event_value_exact_p90_by_type(sf_dir):
        """Exact per-type 90th percentile (rank ⌈0.9·n⌉ element) — the
        same distributed histogram-refinement selection as the median,
        at an arbitrary rank; the ELEMENT semantics make it
        SQL-pinnable where an interpolated percentile would not be."""
        import math

        from ..stages import sketch
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "value"])

        def scale(b: pa.Table) -> pa.Table:
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table({"event_type": b["event_type"],
                             "v": pa.array(np.floor(v * 1e6 + 0.5)
                                           .astype(np.int64), pa.int64())})

        out = sketch.exact_grouped_kth(
            ds.map_batches(scale, batch_format="pyarrow"),
            "event_type", "v",
            k_of_n=lambda n: math.ceil(0.9 * n))
        return out.rename(columns={"v": "p90_e6"})
    q["event_value_exact_p90_by_type"] = event_value_exact_p90_by_type

    def lancelike_metadata_count_check(sf_dir):
        """Aggregate pushdown to MANIFEST METADATA (Iceberg-style):
        per-fragment value counts recorded at write time answer a
        GROUP-BY-count with zero data I/O, and stay correct through a
        copy-on-write DELETE (rewritten fragments recompute their
        counts; carried ones keep theirs by reference). The oracle is
        the relational GROUP BY over the same post-delete content."""
        import shutil

        from ..sources import lancelike

        tag = os.path.basename(os.path.normpath(sf_dir))
        root = f"/tmp/graft_vcount/{tag}"
        shutil.rmtree(root, ignore_errors=True)
        imgs = fx.read_fixture(sf_dir, "images",
                               columns=["image_id", "fmt"])
        lancelike.write_dataset(imgs, root, stage="base", resume=False,
                                count_cols=["fmt"])
        victims = pa.array([f"img{i:012d}" for i in range(0, 200, 7)],
                           pa.string())
        lancelike.delete_by_keys(victims, root, "image_id", stage="del")
        counts = lancelike.metadata_value_counts(root, "fmt")
        return pd.DataFrame(
            {"fmt": sorted(counts),
             "n": np.array([counts[k] for k in sorted(counts)],
                           np.int64)})
    q["lancelike_metadata_count_check"] = lancelike_metadata_count_check

    def bot_like_users(sf_dir):
        """Abuse/bot screen for event streams (the curation gate before
        any engagement-weighted sampling): users whose burstiest hour
        holds ≥ {BOT_HOURLY} events. Per-(user, hour) counts pre-reduce
        in one bounded bucketed pass, then a per-user max — all
        integers, no float heuristics."""
        from ..util import bucketed_sum, grouped_agg_vec
        ev = fx.driver_table(sf_dir, "events",
                             columns=["user_id", "ts"])

        def keyed(b: pa.Table) -> pa.Table:
            t = b["ts"].cast(pa.int64()).to_numpy()
            return pa.table({"user_id": b["user_id"],
                             "hour": pa.array(t // 3_600_000_000,
                                              pa.int64()),
                             "one": pa.array(np.ones(b.num_rows,
                                                     np.int64))})

        hourly = bucketed_sum(ev.map_batches(keyed,
                                             batch_format="pyarrow"),
                              ["user_id", "hour"], {"one": "cnt"},
                              n_buckets=64)
        peak = grouped_agg_vec(hourly, ["user_id"],
                               [("cnt", "max", "peak_hourly")])
        out = peak.filter(expr=f"peak_hourly >= {BOT_HOURLY}")
        return out.map_batches(
            lambda b: pa.table({
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "peak_hourly": pc.cast(b["peak_hourly"], pa.int64())}),
            batch_format="pyarrow")
    q["bot_like_users"] = bot_like_users

    def type_hour_chi2(sf_dir):
        """χ² independence screen between event type and hour-of-day —
        the drift/seasonality gate of an eval pipeline. The contingency
        table is bounded (types × 24), so one bucketed count pass feeds
        a driver-side EXACT integer statistic: per cell
        (o·N − r·c)²·1e6 // (N·r·c), floored per-term on BOTH engines
        (Python big ints here, HUGEINT in the twin), summed in cell
        order — no float anywhere."""
        from ..util import bucketed_sum
        ev = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "ts"])

        def keyed(b: pa.Table) -> pa.Table:
            t = b["ts"].cast(pa.int64()).to_numpy()
            return pa.table({"event_type": b["event_type"],
                             "hod": pa.array((t // 3_600_000_000) % 24,
                                             pa.int64()),
                             "one": pa.array(np.ones(b.num_rows,
                                                     np.int64))})

        cells = bucketed_sum(ev.map_batches(keyed,
                                            batch_format="pyarrow"),
                             ["event_type", "hod"], {"one": "o"},
                             n_buckets=16).to_pandas()
        N = int(cells["o"].sum())
        r = cells.groupby("event_type")["o"].sum().to_dict()
        c = cells.groupby("hod")["o"].sum().to_dict()
        chi2_e6 = 0
        dof = (len(r) - 1) * (len(c) - 1)
        for _, row in cells.sort_values(["event_type", "hod"]).iterrows():
            o, rr, cc = int(row["o"]), int(r[row["event_type"]]), \
                int(c[row["hod"]])
            num = (o * N - rr * cc) ** 2 * 1_000_000
            chi2_e6 += num // (N * rr * cc)
        return pd.DataFrame({"chi2_e6": np.array([chi2_e6], np.int64),
                             "dof": np.array([dof], np.int64),
                             "n": np.array([N], np.int64)})
    q["type_hour_chi2"] = type_hour_chi2

    def ks_view_purchase(sf_dir):
        """EXACT two-sample Kolmogorov–Smirnov distance between the
        'view' and 'purchase' value distributions — the distribution-
        drift gate. Fully distributed: per-value side counts settle in
        one bounded-bucket pass; a range-partitioned sort + O(blocks)
        prefix-sum offsets (the global_row_number trick applied to
        SUMS) give every distinct value its two cumulative counts; the
        supremum |cumA·n_b − cumB·n_a| (cross-multiplied — no float
        division) reduces via distributed top-1. Driver state is
        O(blocks); the distinct-value table never leaves the cluster."""
        import ray

        from ..util import _bcast_get, bucketed_sum, distributed_topk
        ev = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "value"])

        def keyed(b: pa.Table) -> pa.Table:
            et = b["event_type"]
            m = pc.or_(pc.equal(et, "view"), pc.equal(et, "purchase"))
            b = b.filter(m)
            v = np.floor(b["value"].to_numpy(zero_copy_only=False)
                         * 1e6 + 0.5).astype(np.int64)
            isa = pc.equal(b["event_type"], "view").to_numpy(
                zero_copy_only=False)
            return pa.table({"v": pa.array(v, pa.int64()),
                             "a": pa.array(isa.astype(np.int64)),
                             "b": pa.array((~isa).astype(np.int64))})

        pv = bucketed_sum(ev.map_batches(keyed, batch_format="pyarrow"),
                          ["v"], {"a": "a", "b": "b"}, n_buckets=64)
        # re-type to arrow blocks before the sort (pandas-block sort-
        # shuffle gotcha, NOTES_r4), then range-partition by v
        ordered = pv.map_batches(
            lambda t: pa.table({"v": pc.cast(t["v"], pa.int64()),
                                "a": pc.cast(t["a"], pa.int64()),
                                "b": pc.cast(t["b"], pa.int64())}),
            batch_format="pyarrow").sort("v").materialize()

        def block_meta(t: pa.Table) -> pa.Table:
            return pa.table({
                "v": t["v"].slice(0, min(1, t.num_rows)),
                "sa": pa.array([int(pc.sum(t["a"]).as_py() or 0)]
                               if t.num_rows else [], pa.int64()),
                "sb": pa.array([int(pc.sum(t["b"]).as_py() or 0)]
                               if t.num_rows else [], pa.int64())})

        meta = ordered.map_batches(block_meta, batch_format="pyarrow",
                                   batch_size=None).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        n_a = int(meta["sa"].sum())
        n_b = int(meta["sb"].sum())
        if max(n_a, n_b) > (1 << 31):
            raise ValueError("KS cross-products would overflow int64 — "
                             "switch the reducer to Python ints")
        offs = {int(v): (int(oa), int(ob)) for v, oa, ob in zip(
            meta["v"],
            meta["sa"].cumsum().shift(fill_value=0),
            meta["sb"].cumsum().shift(fill_value=0))}
        ref = ray.put(offs)

        def dstat(t: pa.Table, _r=ref) -> pa.Table:
            if not t.num_rows:
                return pa.table({"v": pa.array([], pa.int64()),
                                 "d": pa.array([], pa.int64())})
            om = _bcast_get(_r)
            oa, ob = om[int(t["v"][0].as_py())]
            ca = oa + np.cumsum(t["a"].to_numpy())
            cb = ob + np.cumsum(t["b"].to_numpy())
            d = np.abs(ca * n_b - cb * n_a)
            return pa.table({"v": t["v"], "d": pa.array(d, pa.int64())})

        top = distributed_topk(
            ordered.map_batches(dstat, batch_format="pyarrow"), 1,
            [("d", "descending"), ("v", "ascending")])
        return pd.DataFrame({"d_num": top["d"].astype("int64"),
                             "at_v": top["v"].astype("int64"),
                             "n_a": np.array([n_a], np.int64),
                             "n_b": np.array([n_b], np.int64)})
    q["ks_view_purchase"] = ks_view_purchase

    def caption_street_match_rate(sf_dir):
        """Cross-modal consistency audit: does each image's NORMALIZED
        caption mention its geotag's NORMALIZED street? Match rates per
        postcode district expose label/caption drift by area — the QA
        table a captioning pipeline watches. One hash join on image_id
        (both sides are data volume), the shared canonicalization
        kernel on both columns, elementwise substring via numpy's C
        kernel (per-row needles — no scalar-pattern Arrow kernel
        exists), bounded per-district counts."""
        from ..util import bucketed_sum
        imgs = fx.read_fixture(sf_dir, "images",
                               columns=["image_id", "caption"])
        geo_ds = fx.read_fixture(sf_dir, "geo",
                                 columns=["image_id", "addr_street",
                                          "addr_postcode"])
        joined = imgs.join(geo_ds, on=("image_id",), join_type="inner",
                           **join_kwargs(fx.table_join_partitions(
                               sf_dir, "images", "geo")))

        def f(b: pa.Table) -> pa.Table:
            cn = normalize.normalize_street(b["caption"]) \
                .to_numpy(zero_copy_only=False).astype(str)
            sn = normalize.normalize_street(b["addr_street"]) \
                .to_numpy(zero_copy_only=False).astype(str)
            match = np.char.find(cn, sn) >= 0
            pcv = b["addr_postcode"].to_numpy(zero_copy_only=False)
            ok = pc.match_substring_regex(
                b["addr_postcode"], r"^[0-9]{6}$").to_numpy(
                zero_copy_only=False)
            # '<U2' astype is the vectorized 2-char prefix
            dist = np.where(ok, pcv.astype(str).astype("U2"), "NA")
            return pa.table({
                "district": pa.array(dist.astype(object), pa.string()),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
                "m": pa.array(match.astype(np.int64))})

        out = bucketed_sum(joined.map_batches(f, batch_format="pyarrow"),
                           ["district"], {"one": "n", "m": "n_match"},
                           n_buckets=16)
        return out.map_batches(
            lambda b: pa.table({
                "district": pc.cast(b["district"], pa.string()),
                "n": pc.cast(b["n"], pa.int64()),
                "n_match": pc.cast(b["n_match"], pa.int64())}),
            batch_format="pyarrow")
    q["caption_street_match_rate"] = caption_street_match_rate

    def events_watermark_windows(sf_dir):
        """Streaming-semantics batch replay: 15-minute tumbling-window
        counts under a WATERMARK (max event ts − 1 h). Windows that
        close at/before the watermark are 'final'; later ones are
        'open' — the deterministic batch twin of a streaming engine's
        on-time/late split. Max-ts from a 1-row-per-block partial; the
        window table is calendar-bounded."""
        from ..util import bucketed_sum, grouped_agg_vec
        ev = fx.driver_table(sf_dir, "events", columns=["ts"])
        W = 15 * 60 * 10**6

        def keyed(b: pa.Table) -> pa.Table:
            t = b["ts"].cast(pa.int64()).to_numpy()
            return pa.table({"win": pa.array((t // W) * W, pa.int64()),
                             "mx": pa.array(t, pa.int64()),
                             "one": pa.array(np.ones(b.num_rows,
                                                     np.int64))})

        kd = ev.map_batches(keyed, batch_format="pyarrow").materialize()
        wm = int(grouped_agg_vec(
            kd.map_batches(lambda b: pa.table(
                {"k": pa.array(np.zeros(b.num_rows, np.int64)),
                 "mx": b["mx"]}), batch_format="pyarrow"),
            ["k"], [("mx", "max", "mx")]).to_pandas()["mx"].iloc[0]) \
            - 3_600 * 10**6
        wins = bucketed_sum(kd, ["win"], {"one": "cnt"}, n_buckets=16)

        def label(b: pa.Table) -> pa.Table:
            w = b["win"].to_numpy()
            st = np.where(w + W <= wm, "final", "open")
            return pa.table({"win_start_us": pa.array(w, pa.int64()),
                             "cnt": pc.cast(b["cnt"], pa.int64()),
                             "state": pa.array(st.astype(object),
                                               pa.string())})

        return wins.map_batches(label, batch_format="pyarrow")
    q["events_watermark_windows"] = events_watermark_windows

    def street_vocab_overlap(sf_dir):
        """Entity-resolution audit ACROSS SOURCES: the canonicalized
        street vocabulary of the geotag sidecar vs the OSM addr:street
        tags — how many normalized names appear in both vs one side
        only. Each side's distinct vocab settles map-side; the overlap
        is a bounded set op."""
        geo_ds = fx.read_fixture(sf_dir, "geo", columns=["addr_street"])
        tags = fx.read_fixture(sf_dir, "tags", columns=["key", "value"])

        def norm_geo(b: pa.Table) -> pa.Table:
            return pa.table({"nm": pc.unique(
                normalize.normalize_street(b["addr_street"]))})

        def norm_tag(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b["key"], "addr:street"))
            return pa.table({"nm": pc.unique(
                normalize.normalize_street(b["value"]))})

        ga = geo_ds.map_batches(norm_geo, batch_format="pyarrow") \
            .to_pandas()["nm"].unique()
        ta = tags.map_batches(norm_tag, batch_format="pyarrow") \
            .to_pandas()["nm"].unique()
        gs, ts_ = set(ga), set(ta)
        return pd.DataFrame({
            "category": ["both", "geo_only", "tags_only"],
            "n": np.array([len(gs & ts_), len(gs - ts_), len(ts_ - gs)],
                          np.int64)})
    q["street_vocab_overlap"] = street_vocab_overlap

    def colbert_maxsim_topk(sf_dir):
        """Late-interaction (ColBERT-style) retrieval: documents are
        8-vector GROUPS of the embedding table, the query is the first
        4 vectors, and score(doc) = Σ_j max_i ⟨q_j, d_i⟩ over e6
        fixed-point integer dot products — exact under any partitioning
        (no cosine float trees). One bounded-bucket shuffle co-locates
        each doc's token vectors; inside the bucket the whole block
        multiplies against the broadcast 4×D query matrix in one int64
        matmul; top-5 via distributed partials."""
        from ..util import bucketed_group_apply, distributed_topk
        ds = fx.driver_table(sf_dir, "embeddings",
                             columns=["vec_id", "embedding"])

        def to_int(b: pa.Table) -> pa.Table:
            X = np.stack(b["embedding"].to_numpy(zero_copy_only=False)) \
                .astype(np.float64)
            V = np.floor(X * 1e6 + 0.5).astype(np.int64)
            d = V.shape[1]
            offs = np.arange(0, d * (len(V) + 1), d, dtype=np.int32)
            return pa.table({
                "grp": pa.array(b["vec_id"].to_numpy() // 8, pa.int64()),
                "vec_id": b["vec_id"],
                "fv": pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()),
                    pa.array(V.ravel(), pa.int64()))})

        iv = ds.map_batches(to_int, batch_format="pyarrow").materialize()
        qrows = iv.filter(expr="vec_id < 4").to_pandas() \
            .sort_values("vec_id")
        Q = np.stack([np.asarray(v, np.int64) for v in qrows["fv"]])

        def maxsim(g: pd.DataFrame) -> pd.DataFrame:
            D = np.stack([np.asarray(v, np.int64) for v in g["fv"]])
            dots = D @ Q.T                        # (m, 4) exact int64
            df = pd.DataFrame({"grp": g["grp"].to_numpy()})
            for j in range(Q.shape[0]):
                df[f"d{j}"] = dots[:, j]
            mx = df.groupby("grp", sort=False).max()
            return pd.DataFrame({"grp": mx.index.to_numpy(),
                                 "score": mx.sum(axis=1).to_numpy()
                                 .astype(np.int64)})

        scores = bucketed_group_apply(iv, ["grp"], maxsim, n_buckets=32)
        top = distributed_topk(scores, 5, [("score", "descending"),
                                           ("grp", "ascending")])
        return pd.DataFrame({"doc_grp": top["grp"].astype("int64"),
                             "score": top["score"].astype("int64")})
    q["colbert_maxsim_topk"] = colbert_maxsim_topk

    def hybrid_rank_fusion(sf_dir):
        """Hybrid retrieval: reciprocal-rank fusion (Cormack et al.'s
        RRF, integerized as 1e9 // (60 + rank)) of the BM25 top-20 and
        a raw term-frequency top-20 for the same query — the standard
        lexical+second-signal fusion step of a search pipeline. Both
        ranked lists are k-bounded, so the fuse is a driver-side dict
        fold; the rankings themselves come from the distributed
        scorers."""
        from ..functions import text
        from ..util import distributed_topk
        bm = doc_bm25_topk(sf_dir).reset_index(drop=True)
        docs = fx.driver_table(sf_dir, "documents",
                               columns=["doc_id", "text"])

        def tf(b: pa.Table) -> pa.Table:
            n = np.zeros(b.num_rows, np.int64)
            for qt in SEARCH_TOKENS:   # fixed query order
                n += pc.count_substring_regex(
                    b["text"], rf"\b{qt}\b").to_numpy(
                    zero_copy_only=False).astype(np.int64)
            keep = n > 0
            return pa.table({"doc_id": b["doc_id"].filter(pa.array(keep)),
                             "tf": pa.array(n[keep], pa.int64())})

        tft = distributed_topk(docs.map_batches(tf,
                                                batch_format="pyarrow"),
                               20, [("tf", "descending"),
                                    ("doc_id", "ascending")])
        fused: dict = {}
        for rank, did in enumerate(bm["doc_id"], start=1):
            fused[int(did)] = fused.get(int(did), 0) \
                + 1_000_000_000 // (60 + rank)
        for rank, did in enumerate(tft["doc_id"], start=1):
            fused[int(did)] = fused.get(int(did), 0) \
                + 1_000_000_000 // (60 + rank)
        out = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        return pd.DataFrame({
            "doc_id": np.array([d for d, _ in out], np.int64),
            "rrf": np.array([s for _, s in out], np.int64)})
    q["hybrid_rank_fusion"] = hybrid_rank_fusion

    def image_aspect_bucket_plan(sf_dir):
        """Aspect-ratio BUCKETING (the SDXL-style training-shard plan):
        every image goes to the nearest of five canonical aspect
        buckets, nearest measured by EXACT integer cross-multiplication
        |w·bh − h·bw| scaled to a common denominator (no float ratios,
        no ties by construction order — first minimum wins on both
        engines via the same bucket order). Map-only + bounded counts."""
        buckets = (("1:1", 1, 1), ("4:3", 4, 3), ("3:4", 3, 4),
                   ("16:9", 16, 9), ("9:16", 9, 16))
        imgs = fx.read_fixture(sf_dir, "images",
                               columns=["image_id", "w", "h"])

        def assign(b: pa.Table) -> pa.Table:
            w = b["w"].to_numpy().astype(np.int64)
            h = b["h"].to_numpy().astype(np.int64)
            # distance of w/h to bw/bh == |w*bh - h*bw| / (h*bh); put on
            # the common denominator prod(bh_i) so magnitudes compare
            # exactly: d_i = |w*bh_i - h*bw_i| * (D // bh_i)
            D = 1 * 3 * 4 * 9 * 16
            ds_ = np.stack([np.abs(w * bh - h * bw) * (D // bh)
                            for _, bw, bh in buckets])
            best = np.argmin(ds_, axis=0)     # first min = bucket order
            names = np.array([n for n, _, _ in buckets], dtype=object)
            return pa.table({"bucket": pa.array(names[best], pa.string()),
                             "px": pa.array(w * h, pa.int64()),
                             "one": pa.array(np.ones(len(w), np.int64))})

        from ..util import bucketed_sum
        out = bucketed_sum(imgs.map_batches(assign,
                                            batch_format="pyarrow"),
                           ["bucket"], {"one": "n_images",
                                        "px": "total_px"}, n_buckets=8)
        return out.map_batches(
            lambda b: pa.table({
                "bucket": pc.cast(b["bucket"], pa.string()),
                "n_images": pc.cast(b["n_images"], pa.int64()),
                "total_px": pc.cast(b["total_px"], pa.int64())}),
            batch_format="pyarrow")
    q["image_aspect_bucket_plan"] = image_aspect_bucket_plan

    def image_compression_audit(sf_dir):
        """Storage audit per codec: encoded bytes-per-kilopixel (e3
        integer) min/max/sum per format — the table a storage planner
        reads before re-encoding a 100 TB image corpus. Map-only with
        Arrow's C++ binary_length; bounded per-format aggregate."""
        from ..util import grouped_agg_vec
        imgs = fx.read_fixture(sf_dir, "images",
                               columns=["fmt", "bytes", "w", "h"])

        def f(b: pa.Table) -> pa.Table:
            nb = pc.binary_length(b["bytes"]).to_numpy() \
                .astype(np.int64)
            px = b["w"].to_numpy().astype(np.int64) \
                * b["h"].to_numpy().astype(np.int64)
            return pa.table({"fmt": b["fmt"],
                             "bpk": pa.array(1000 * nb // px, pa.int64()),
                             "nb": pa.array(nb, pa.int64())})

        out = grouped_agg_vec(
            imgs.map_batches(f, batch_format="pyarrow"), ["fmt"],
            [("bpk", "min", "bpk_min"), ("bpk", "max", "bpk_max"),
             ("nb", "sum", "total_bytes"), (None, "count", "n")]) \
            .to_pandas()
        for c in ("bpk_min", "bpk_max", "total_bytes", "n"):
            out[c] = out[c].astype("int64")
        return out
    q["image_compression_audit"] = image_compression_audit

    def doc_template_clusters(sf_dir):
        """Boilerplate/template detection: documents sharing an
        identical 8-token PREFIX (the scraped-page template signal that
        survives MinHash because bodies differ). Arrow-kernel prefix
        extraction (split → slice → rejoin), bounded-bucket counts,
        clusters of ≥2 emitted with their min doc id as the exemplar."""
        from ..util import bucketed_group_apply
        docs = fx.driver_table(sf_dir, "documents",
                               columns=["doc_id", "text"])

        def prefix(b: pa.Table) -> pa.Table:
            toks = pc.utf8_split_whitespace(b["text"])
            head = pc.list_slice(toks, 0, 8)
            pfx = pc.binary_join(head, " ")
            return pa.table({"prefix": pfx, "doc_id": b["doc_id"]})

        def agg(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("prefix", sort=False).agg(
                n_docs=("doc_id", "size"),
                exemplar=("doc_id", "min")).reset_index()
            return out[out["n_docs"] >= 2]

        res = bucketed_group_apply(
            docs.map_batches(prefix, batch_format="pyarrow"),
            ["prefix"], agg, n_buckets=32)
        return res.map_batches(
            lambda b: pa.table({
                "prefix": pc.cast(b["prefix"], pa.string()),
                "n_docs": pc.cast(b["n_docs"], pa.int64()),
                "exemplar": pc.cast(b["exemplar"], pa.int64())}),
            batch_format="pyarrow")
    q["doc_template_clusters"] = doc_template_clusters

    def image_dup_group_profile(sf_dir):
        """Duplicate-group PROFILE: every pixel-identical (same-phash)
        group of ≥2 images with its size, the number of codecs it spans
        and the keeper — the reclaim table a storage dedup pass sorts
        by bytes. One bucketed pass per phash group."""
        from ..util import bucketed_group_apply
        imgs = fx.read_fixture(sf_dir, "images",
                               columns=["image_id", "phash", "fmt"])

        def agg(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("phash", sort=False).agg(
                n_images=("image_id", "size"),
                n_formats=("fmt", "nunique"),
                keeper=("image_id", "min")).reset_index()
            return out[out["n_images"] >= 2]

        res = bucketed_group_apply(imgs, ["phash"], agg, n_buckets=32)
        return res.map_batches(
            lambda b: pa.table({
                "phash": pc.cast(b["phash"], pa.int64()),
                "n_images": pc.cast(b["n_images"], pa.int64()),
                "n_formats": pc.cast(b["n_formats"], pa.int64()),
                "keeper": pc.cast(b["keeper"], pa.string())}),
            batch_format="pyarrow")
    q["image_dup_group_profile"] = image_dup_group_profile

    def event_value_mad_outlier_counts(sf_dir):
        """Robust outlier COUNTS per type: |v − median| > 5·MAD, the
        standard heavy-tail-safe screen (a z-score screen would move
        with the outliers it hunts). Third composition of the
        distributed-selection operator — median and MAD from
        exact_grouped_kth, one final counting pass with the bounded
        (median, MAD) dict broadcast."""
        import ray

        from ..util import _bcast_get, bucketed_sum
        stats = event_value_mad_by_type(sf_dir)
        mm = {r["event_type"]: (int(r["median_e6"]), int(r["mad_e6"]))
              for _, r in stats.iterrows()}
        ref = ray.put(mm)
        ds = fx.driver_table(sf_dir, "events",
                             columns=["event_type", "value"])

        def flag(b: pa.Table, _r=ref) -> pa.Table:
            m = _bcast_get(_r)
            v = np.floor(b["value"].to_numpy(zero_copy_only=False)
                         * 1e6 + 0.5).astype(np.int64)
            et = b["event_type"].to_pylist()
            med = np.array([m[t][0] for t in et], np.int64)
            mad = np.array([m[t][1] for t in et], np.int64)
            out = (np.abs(v - med) > 5 * mad).astype(np.int64)
            return pa.table({"event_type": b["event_type"],
                             "one": pa.array(np.ones(len(v), np.int64)),
                             "o": pa.array(out, pa.int64())})

        res = bucketed_sum(ds.map_batches(flag, batch_format="pyarrow"),
                           ["event_type"], {"one": "n", "o": "n_outliers"},
                           n_buckets=8)
        return res.map_batches(
            lambda b: pa.table({
                "event_type": pc.cast(b["event_type"], pa.string()),
                "n": pc.cast(b["n"], pa.int64()),
                "n_outliers": pc.cast(b["n_outliers"], pa.int64())}),
            batch_format="pyarrow")
    q["event_value_mad_outlier_counts"] = event_value_mad_outlier_counts

    def customer_pareto_share(sf_dir):
        """Pareto concentration (the 80/20 read): total revenue held by
        the top-20% customers — WITHOUT sorting the customer table. The
        revenue threshold is the rank-(n−⌈n/5⌉) element from the
        distributed selection operator (ties included on both engines:
        'top' = revenue ≥ threshold); one more counting pass sums the
        mass above it. Exact integer cents end to end."""
        from ..stages import sketch
        from ..util import bucketed_sum, grouped_agg_vec
        orders = fx.driver_table(sf_dir, "orders",
                                 columns=["o_custkey", "o_totalprice"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(b["o_totalprice"].to_numpy(
                zero_copy_only=False) * 100 + 0.5).astype(np.int64)
            return pa.table({"o_custkey": b["o_custkey"],
                             "c": pa.array(c, pa.int64())})

        rev = bucketed_sum(orders.map_batches(cents,
                                              batch_format="pyarrow"),
                           ["o_custkey"], {"c": "rev"}, n_buckets=64)
        rev = rev.map_batches(
            lambda b: pa.table({
                "k": pa.array(np.zeros(len(b["rev"]), np.int64)),
                "rev": pc.cast(b["rev"], pa.int64())}),
            batch_format="pyarrow").materialize()
        kth = sketch.exact_grouped_kth(
            rev, "k", "rev",
            k_of_n=lambda n: n - -(-n // 5))   # rank n - ceil(n/5)
        thr = int(kth["rev"].iloc[0])
        n = int(kth["n"].iloc[0])

        def above(b: pa.Table) -> pa.Table:
            r = b["rev"].to_numpy()
            top = r > thr       # threshold row(s) excluded here; the
            return pa.table({   # kth element defines the strict cut
                "k": pa.array(np.zeros(len(r), np.int64)),
                "top_rev": pa.array(np.where(top, r, 0), pa.int64()),
                "n_top": pa.array(top.astype(np.int64)),
                "tot": pa.array(r, pa.int64())})

        agg = grouped_agg_vec(
            rev.map_batches(above, batch_format="pyarrow"), ["k"],
            [("top_rev", "sum", "top_rev"), ("n_top", "sum", "n_top"),
             ("tot", "sum", "total_rev")]).to_pandas()
        return pd.DataFrame({
            "n_customers": np.array([n], np.int64),
            "n_top": agg["n_top"].astype("int64").to_numpy(),
            "threshold_cents": np.array([thr], np.int64),
            "top_rev_cents": agg["top_rev"].astype("int64").to_numpy(),
            "total_rev_cents": agg["total_rev"].astype("int64")
            .to_numpy()})
    q["customer_pareto_share"] = customer_pareto_share

    # Driver-facing order: the graft driver correctness-checks a fixed-size
    # PREFIX of this dict (50 entries in rounds 1-2), so the window must
    # hold the most representative pipelines — flagship composites, every
    # operator family, oracle-paired wherever a SQL twin exists (round-2
    # VERDICT item 7). Every entry stays registered; only insertion order
    # changes, and tools/check_contract.py still sweeps all of them.
    missing = [k for k in _DRIVER_WINDOW if k not in q]
    assert not missing, f"stale _DRIVER_WINDOW entries: {missing}"
    q = {**{k: q[k] for k in _DRIVER_WINDOW},
         **{k: v for k, v in q.items() if k not in _DRIVER_WINDOW}}
    return q


# The 50-query window the driver samples, most-representative first:
# composites, then one row per SURVEY §2 / LLM-pipeline operator family.
# render_tile_stats is the one rows-only entry (pixel bytes have no SQL
# twin); everything else here is oracle-paired.
_DRIVER_WINDOW = [
    # failure-first (VERDICT r4 item 4): the one row the r4 driver
    # artifact recorded red leads the window post-fix (float64
    # cluster_id contamination — see anti_semi_join's dtype restore),
    # followed by the round-5 beyond-broadcast snap path
    "grid_dbscan_clusters",
    "snap_points_to_ways_bucketed",
    "flagship_full_summary", "tpch_q3_topk",
    "render_tile_stats", "knn_pairs", "pip_join_pairs",
    "way_node_resolution", "normalize_streets",
    "clean_postcodes", "corpus_prep_summary",
    "bbox_quarantine", "cell_encode_points",
    "shape_documents_flat_check", "tag_counts",
    "per_cell_counts",
    "exact_dedup_images",
    "image_phash_verify", "near_dedup_docs_check",
    "embedding_dup_pairs", "embedding_topk",
    "audio_features", "lancelike_partition_counts",
    "sessionize_events",
    "lineitem_quantity_quantiles", "asof_next_event",
    # round-3 additions — each a distinct operator family, all paired
    "pagerank_order_part", "kmeans_embeddings", "tfidf_top_terms",
    "ssjoin_prefix_pairs", "lancelike_merge_upsert_check",
    "stratified_sample_events",
    # extended-session additions — again one row per NEW operator family
    # (demoted to make room, all still paired in the full sweep:
    # tile_assignments, shape_elements, osm_distinct_users, hot_cells,
    # quarantine_rows, doc_token_counts, events_hourly,
    # image_phash_near_dup)
    "radius_join_pairs", "decontaminate_docs",
    "doc_repetition_stats",
    # round-4 additions — new operator families, all oracle-paired
    # (demoted to keep the 50-window: funnel_conversion, zonal_stats,
    # way_polyline_length, doc_fingerprint_cluster_sizes, bigram_pmi_top,
    # event_value_histogram_quantiles — still paired in the full sweep)
    "hll_group_registers_check",
    "way_segment_intersections",
    # round-4 session-3 additions — one row per new family (demoted, all
    # still paired in the full sweep: tag_key_classification,
    # orders_rollup, embedding_topk_ivf_fullprobe, video_frame_index,
    # cell_hop_distance, tpch_q16_shape)
    "snap_points_to_ways",
    "kcore_radius_graph",
    "user_edit_path_length",
    # round-4 session-4 additions — one row per new family (demoted to
    # keep the 50-window, all still paired in the full sweep:
    # lancelike_delete_check — vacuum_check exercises the same store
    # CRUD path plus GC; doc_chunk_windows — doc_dup_ngram_counts is
    # the sharper text-explode representative; way_geometry — same J1
    # family as way_node_resolution; tpch_q5_volume — q3 keeps the
    # TPC-H seat; event_type_pivot — sessionize/asof keep the window
    # family; resize_images_thumb — image_augment_manifest covers the
    # decode→transform→encode path)
    "way_simplify_onepass", "doc_dup_ngram_counts",
    "graph_degree_assortativity",
    # round-5: merge-on-read upsert (lancelike_vacuum_check demoted —
    # driver-green in r4, same oracle family, still paired in the sweep)
    "lancelike_merge_upsert_mor_check",
    # (nn_distance_stats demoted for the round-5 failure-first rotation:
    # knn_pairs keeps the kNN family seat; still paired in the sweep)
    # round-4 session-6 additions — one row per NEW operator family
    # (demoted to keep the 50-window, all still paired in the full
    # sweep: audit_street_types — normalize_streets keeps the M4/M5
    # seat; osm_top_contributors — per_cell_counts/tag_counts keep the
    # agg family; interval_overlap_pairs — asof/sessionize keep the
    # temporal seat; nearest_boundary_distance — snap_points_to_ways
    # covers point-to-geometry distance; image_augment_manifest —
    # image_phash_verify keeps the decode path; corpus_filter_funnel —
    # doc_repetition_stats keeps the Gopher family)
    "event_value_exact_median_by_type",    # distributed selection
    "lancelike_schema_evolution_check",    # metadata-only rename/drop
    "lancelike_metadata_count_check",      # aggregate pushdown
    "kcenter_diverse_points",              # diverse-subset curation
    "ks_view_purchase",                    # distribution-drift stats
    "colbert_maxsim_topk",                 # late-interaction retrieval
]


# ============================================================= oracle SQL

def oracle_sql():
    # the oracle reads the same fixture files → make sure they exist for the
    # sf the driver compares at (cheap + cached; pure pyarrow, no Ray)
    import os
    fx.materialize(f"/root/testdata/{_SQL_ORACLE_TAG}")

    from ..functions.text import PII_PATTERNS as _pii_patterns
    _PII_RE = {name: pat for name, pat, _ in _pii_patterns}

    geo_p = f"read_parquet('{_fxp('geo')}')"
    images_p = f"read_parquet('{_fxp('images')}')"
    edges_p = f"read_parquet('{_fxp('edges')}')"
    knn_p = f"read_parquet('{_fxp('knn_pts')}')"
    nodes_p = f"read_parquet('{_fxp('nodes')}')"
    _sx, _sy = geo.cell_xy(np.array([SPATIAL_SCAN_LON]),
                           np.array([SPATIAL_SCAN_LAT]), 8)
    _sscan_qx, _sscan_qy = int(_sx[0]), int(_sy[0])
    ways_p = f"read_parquet('{_fxp('ways')}')"
    way_nodes_p = f"read_parquet('{_fxp('way_nodes')}')"
    tags_p = f"read_parquet('{_fxp('tags')}')"
    polys_p = f"read_parquet('{_fxp('polygons')}')"

    expected = ", ".join(f"'{t}'" for t in EXPECTED_STREET_TYPES)
    stype = _street_type_sql("addr_street")
    pc_clean = normalize.clean_postcode_sql("addr_postcode")
    w, s, e, n = geo.SG_BBOX

    hav = ("2*6371008.8*asin(sqrt(LEAST(GREATEST("
           "sin((radians(b.lat)-radians(a.lat))/2)^2"
           " + cos(radians(a.lat))*cos(radians(b.lat))"
           "*sin((radians(b.lon)-radians(a.lon))/2)^2, 0.0), 1.0)))")

    o = {
        "agg_lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 0) AS sum_price,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS cnt
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "count_by_event_type": """
            SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type""",
        "top_users_by_events": """
            SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
            ORDER BY cnt DESC, user_id LIMIT 10""",
        "distinct_event_users": """
            SELECT COUNT(DISTINCT user_id) AS n_users FROM events""",
        "one_shot_users": """
            SELECT COUNT(*) AS n_one_shot FROM (
              SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) = 1)""",
        "top_parts_by_brand": """
            SELECT p_brand, COUNT(*) AS cnt FROM part GROUP BY p_brand
            ORDER BY cnt DESC, p_brand LIMIT 10""",
        "orders_topk_price": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
        "nations_per_region": """
            SELECT r.r_name, COUNT(*) AS n_nations
            FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name""",
        "orders_by_segment": """
            SELECT c.c_mktsegment, COUNT(*) AS n_orders,
                   ROUND(SUM(o.o_totalprice), 0) AS revenue
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment""",
        "top_cuisines": f"""
            SELECT value, COUNT(*) AS cnt FROM {tags_p}
            WHERE key = 'cuisine' GROUP BY value
            ORDER BY cnt DESC, value LIMIT 10""",
        "exact_dedup_docs": """
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text""",
        "doc_token_counts": r"""
            SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                   AS n_tokens_ws
            FROM documents""",
        "decontaminate_docs": r"""
            WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                          FROM documents),
            sh AS (SELECT doc_id, array_to_string(t[i:i+2], ' ') AS s
                   FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)),
            bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
            corpus AS (SELECT * FROM sh WHERE doc_id % 97 != 0)
            SELECT c.doc_id, COUNT(DISTINCT c.s) AS n_hits
            FROM corpus c JOIN bench b ON c.s = b.s GROUP BY c.doc_id""",
        "doc_repetition_stats": r"""
            WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                          FROM documents),
            bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS b
                   FROM toks, UNNEST(generate_series(1, len(t)-1)) AS g(i)),
            bgtop AS (SELECT doc_id, MAX(c) AS topc, SUM(c) AS tot FROM
                      (SELECT doc_id, b, COUNT(*) AS c FROM bg
                       GROUP BY doc_id, b) GROUP BY doc_id)
            SELECT k.doc_id, len(k.t) AS n_tokens,
                   ROUND(len(list_distinct(k.t)) * 1.0 / len(k.t), 6)
                     AS distinct_token_ratio,
                   ROUND(COALESCE(g.topc * 1.0 / g.tot, 0.0), 6)
                     AS top_bigram_frac
            FROM toks k LEFT JOIN bgtop g USING (doc_id)""",
        "doc_char_stats": r"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(text) - length(regexp_replace(text,
                        '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
                   CAST(length(text) - length(replace(text, ' ', ''))
                        AS BIGINT) AS n_spaces
            FROM documents""",
        "doc_lang_breakdown": """
            SELECT lang, source, COUNT(*) AS cnt FROM documents
            GROUP BY lang, source""",
        "doc_fingerprint_cluster_sizes": r"""
            SELECT cluster_size, COUNT(*) AS n_clusters FROM (
              SELECT COUNT(*) AS cluster_size FROM documents
              GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
            GROUP BY cluster_size""",
        "doc_dup_content_count": r"""
            SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_dup_docs FROM (
              SELECT COUNT(*) AS c FROM documents
              GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
              HAVING COUNT(*) >= 2)""",
        "embedding_dup_pairs": f"""
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM read_parquet('{_fxp('embeddings_dup')}') a,
                 read_parquet('{_fxp('embeddings_dup')}') b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding, b.embedding) >= 0.98""",
        "embedding_topk": """
            SELECT query_id, vec_id FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding, c.embedding)
                                DESC, c.vec_id) AS rn
              FROM embeddings q, embeddings c
              WHERE q.vec_id < 3 AND c.vec_id >= 3)
            WHERE rn <= 10""",
        "normalize_streets": f"""
            SELECT image_id, {normalize.normalize_street_sql('addr_street')}
                   AS street_norm
            FROM {geo_p}""",
        "caption_normalize": f"""
            SELECT image_id, {normalize.normalize_street_sql('caption')}
                   AS caption_norm
            FROM {images_p}""",
        "audit_street_types": f"""
            SELECT street_type, COUNT(*) AS cnt FROM (
              SELECT {stype} AS street_type FROM {geo_p})
            WHERE street_type NOT IN ({expected})
            GROUP BY street_type""",
        "clean_postcodes": f"""
            SELECT image_id, {pc_clean} AS postcode_clean FROM {geo_p}""",
        "postcode_district_histogram": f"""
            SELECT substr(pcc, 1, 2) AS district, COUNT(*) AS cnt FROM (
              SELECT {pc_clean} AS pcc FROM {geo_p})
            WHERE pcc IS NOT NULL GROUP BY substr(pcc, 1, 2)""",
        "bbox_quarantine": f"""
            SELECT (lon >= {w} AND lon <= {e} AND lat >= {s} AND lat <= {n})
                   AS in_bbox, COUNT(*) AS cnt
            FROM {geo_p} GROUP BY 1""",
        "cell_cover_compact_roundtrip": f"""
            SELECT DISTINCT
                   {_grid_sql('lon', CELL_RES, -180.0, 360.0)} AS qx,
                   {_grid_sql('lat', CELL_RES, -90.0, 180.0)} AS qy
            FROM {geo_p}""",
        "cell_encode_points": f"""
            SELECT image_id,
                   {_grid_sql('lon', CELL_RES, -180.0, 360.0)} AS qx,
                   {_grid_sql('lat', CELL_RES, -90.0, 180.0)} AS qy
            FROM {geo_p}""",
        "tile_pyramid_counts": f"""
            WITH base AS (SELECT
                   {_grid_sql('lon', CELL_RES, -180.0, 360.0)} AS qx,
                   {_grid_sql('lat', CELL_RES, -90.0, 180.0)} AS qy
                 FROM {geo_p})
            SELECT CAST({CELL_RES} AS BIGINT) AS res, qx, qy,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM base GROUP BY 2, 3
            UNION ALL
            SELECT CAST({CELL_RES - 1} AS BIGINT), qx // 2, qy // 2,
                   CAST(COUNT(*) AS BIGINT)
            FROM base GROUP BY 2, 3
            UNION ALL
            SELECT CAST({CELL_RES - 2} AS BIGINT), qx // 4, qy // 4,
                   CAST(COUNT(*) AS BIGINT)
            FROM base GROUP BY 2, 3""",
        "tile_assignments": f"""
            SELECT image_id,
                   {_grid_sql('lon', TILE_RES, -180.0, 360.0)} AS tile_x,
                   {_grid_sql('lat', TILE_RES, -90.0, 180.0)} AS tile_y
            FROM {geo_p}""",
        "pip_join_pairs": f"""
            SELECT g.image_id, e.polygon_id
            FROM {geo_p} g JOIN {edges_p} e
              ON ((e.y1 <= g.lat) != (e.y2 <= g.lat)
                  AND g.lon < e.x1 + (g.lat - e.y1)/(e.y2 - e.y1)*(e.x2 - e.x1))
            GROUP BY g.image_id, e.polygon_id
            HAVING COUNT(*) % 2 = 1""",
        "knn_pairs": f"""
            SELECT id, neighbor_id FROM (
              SELECT a.image_id AS id, b.image_id AS neighbor_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY a.image_id
                       ORDER BY {hav}, b.image_id) AS rn
              FROM {knn_p} a, {knn_p} b
              WHERE a.image_id != b.image_id)
            WHERE rn <= {KNN_K}""",
        "knn_pairs_salted": f"""
            SELECT id, neighbor_id FROM (
              SELECT a.image_id AS id, b.image_id AS neighbor_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY a.image_id
                       ORDER BY {hav}, b.image_id) AS rn
              FROM {knn_p} a, {knn_p} b
              WHERE a.image_id != b.image_id)
            WHERE rn <= {KNN_K}""",
        "knn_graph_triangles": f"""
            WITH knn AS (
              SELECT id, neighbor_id FROM (
                SELECT a.image_id AS id, b.image_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                         PARTITION BY a.image_id
                         ORDER BY {hav}, b.image_id) AS rn
                FROM {knn_p} a, {knn_p} b
                WHERE a.image_id != b.image_id)
              WHERE rn <= {KNN_K}),
            e AS (SELECT DISTINCT LEAST(id, neighbor_id) AS a,
                         GREATEST(id, neighbor_id) AS b FROM knn)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM e e1 JOIN e e2 ON e2.a = e1.b
                      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b""",
        "radius_join_pairs": f"""
            SELECT a.image_id AS id, b.image_id AS neighbor_id,
                   ROUND({hav}, 1) AS dist_m
            FROM {knn_p} a, {knn_p} b
            WHERE a.image_id != b.image_id AND {hav} <= {RADIUS_M}""",
        "interval_overlap_pairs": """
            WITH a AS (SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS s,
                              CAST(epoch_us(ts) AS BIGINT) + 1800000000 AS e
                       FROM events WHERE event_type = 'view'),
                 b AS (SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS s,
                              CAST(epoch_us(ts) AS BIGINT) + 7200000000 AS e
                       FROM events WHERE event_type = 'purchase')
            SELECT a.event_id AS view_id, b.event_id AS purchase_id
            FROM a, b WHERE a.s <= b.e AND b.s <= a.e""",
        "oldest_events_sorted": """
            SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
            FROM events ORDER BY ts, event_id LIMIT 50""",
        "orders_by_month": """
            SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
                        AS BIGINT) AS yyyymm,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 0) AS revenue
            FROM orders GROUP BY 1""",
        "events_value_stats_by_type": """
            SELECT event_type, COUNT(*) AS cnt,
                   ROUND(AVG(value), 4) AS avg_value,
                   ROUND(STDDEV_SAMP(value), 4) AS sd_value
            FROM events GROUP BY event_type""",
        "exact_dedup_images": f"""
            SELECT MIN(image_id) AS image_id FROM {images_p} GROUP BY phash""",
        "way_node_resolution": f"""
            SELECT wn.way_id, wn.position, nd.lon, nd.lat
            FROM {way_nodes_p} wn JOIN {nodes_p} nd ON wn.node_id = nd.id""",
        "tag_key_classification": f"""
            SELECT {normalize.classify_keys_sql('key')} AS bucket,
                   COUNT(*) AS cnt
            FROM {tags_p} GROUP BY 1""",
        "tag_counts": f"""
            SELECT key, COUNT(*) AS cnt FROM {tags_p} GROUP BY key""",
        "tags_clean": f"""
            SELECT elem_id, key, value FROM {tags_p}
            WHERE NOT regexp_matches(key,
                      '[=\\+/&<>;''"\\?%#$@\\,\\. \\t\\r\\n]')
              AND length(key) - length(replace(key, ':', '')) < 2""",
        "top_amenities": f"""
            SELECT value, COUNT(*) AS cnt FROM {tags_p}
            WHERE key = 'amenity' GROUP BY value
            ORDER BY cnt DESC, value LIMIT 10""",
        "shape_elements": f"""
            SELECT id, 'node' AS elem_type, lon, lat, user, uid,
                   version, changeset,
                   CAST(epoch_us(timestamp) AS BIGINT) AS ts_us
            FROM {nodes_p}
            UNION ALL
            SELECT id, 'way' AS elem_type, NULL AS lon, NULL AS lat, user,
                   uid, version, changeset,
                   CAST(epoch_us(timestamp) AS BIGINT) AS ts_us
            FROM {ways_p}""",
        "shape_documents_flat_check": f"""
            WITH addr AS (
              SELECT elem_kind, elem_id,
                     MAX(CASE WHEN key = 'addr:housenumber'
                         THEN value END) AS housenumber,
                     MAX(CASE WHEN key = 'addr:postcode'
                         THEN {normalize.clean_postcode_sql('value')} END)
                       AS postcode,
                     MAX(CASE WHEN key = 'addr:street'
                         THEN {normalize.normalize_street_sql('value')} END)
                       AS street
              FROM {tags_p} GROUP BY 1, 2),
            elems AS (
              SELECT 'node' AS kind, id, version, changeset,
                     strftime(timestamp, '%Y-%m-%dT%H:%M:%SZ') AS "timestamp",
                     user, CAST(uid AS VARCHAR) AS uid,
                     CAST(lat AS DOUBLE) AS lat, CAST(lon AS DOUBLE) AS lon
              FROM {nodes_p}
              UNION ALL
              SELECT 'way', id, version, changeset,
                     strftime(timestamp, '%Y-%m-%dT%H:%M:%SZ'),
                     user, CAST(uid AS VARCHAR),
                     NULL, NULL
              FROM {ways_p})
            SELECT e.kind, e.id, e.version, e.changeset, e."timestamp",
                   e.user, e.uid, e.lat, e.lon,
                   a.housenumber, a.postcode, a.street
            FROM elems e
            LEFT JOIN addr a ON a.elem_kind = e.kind AND a.elem_id = e.id""",
        "osm_distinct_users": f"""
            SELECT COUNT(DISTINCT uid) AS n_users FROM (
              SELECT uid FROM {nodes_p} UNION ALL SELECT uid FROM {ways_p})""",
        "osm_top_contributors": f"""
            SELECT user, COUNT(*) AS cnt FROM (
              SELECT user FROM {nodes_p} UNION ALL SELECT user FROM {ways_p})
            GROUP BY user ORDER BY cnt DESC, user LIMIT 10""",
        "osm_one_shot_users": f"""
            SELECT COUNT(*) AS n_one_shot FROM (
              SELECT uid FROM (
                SELECT uid FROM {nodes_p} UNION ALL SELECT uid FROM {ways_p})
              GROUP BY uid HAVING COUNT(*) = 1)""",
        "count_by_elem_type": f"""
            SELECT elem_type, COUNT(*) AS cnt FROM (
              SELECT 'node' AS elem_type FROM {nodes_p}
              UNION ALL SELECT 'way' AS elem_type FROM {ways_p})
            GROUP BY elem_type""",
        "systematic_sample_nodes": f"""
            SELECT id FROM {nodes_p} WHERE id % 10 = 0""",
        "quarantine_rows": f"""
            SELECT image_id, 'postcode' AS reason FROM {geo_p}
            WHERE {pc_clean} IS NULL
            UNION ALL
            SELECT image_id, 'bbox' AS reason FROM {geo_p}
            WHERE NOT (lon >= {w} AND lon <= {e} AND lat >= {s} AND lat <= {n})""",
        "per_cell_counts": f"""
            SELECT {_grid_sql('lon', CELL_RES, -180.0, 360.0)} AS qx,
                   {_grid_sql('lat', CELL_RES, -90.0, 180.0)} AS qy,
                   COUNT(*) AS cnt
            FROM {geo_p} GROUP BY 1, 2""",
        "hot_cells": f"""
            SELECT qx, qy, cnt FROM (
              SELECT {_grid_sql('lon', CELL_RES, -180.0, 360.0)} AS qx,
                     {_grid_sql('lat', CELL_RES, -90.0, 180.0)} AS qy,
                     COUNT(*) AS cnt
              FROM {geo_p} GROUP BY 1, 2)
            ORDER BY cnt DESC, qx, qy LIMIT 20""",
        "events_hourly": """
            SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_idx,
                   event_type, COUNT(*) AS cnt,
                   ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY 1, 2""",
        "sessionize_events": """
            SELECT COUNT(*) AS n_sessions FROM (
              SELECT CASE WHEN prev_ts IS NULL
                          OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                     THEN 1 ELSE 0 END AS is_new
              FROM (SELECT user_id, ts,
                           LAG(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_ts
                    FROM events))
            WHERE is_new = 1""",
        "image_format_histogram": f"""
            SELECT fmt, COUNT(*) AS cnt FROM {images_p} GROUP BY fmt""",
        "image_size_stats": f"""
            SELECT fmt, COUNT(*) AS cnt,
                   ROUND(AVG(CAST(w AS BIGINT) * h), 2) AS avg_px,
                   CAST(MAX(CAST(w AS BIGINT) * h) AS BIGINT) AS max_px
            FROM {images_p} GROUP BY fmt""",
        "top_event_value_per_user": """
            SELECT user_id, event_id, value FROM (
              SELECT user_id, event_id, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id) AS rn
              FROM events)
            WHERE rn = 1""",
        "range_join_value_brackets": """
            SELECT b.lo AS bracket_lo, COUNT(*) AS cnt
            FROM events e
            JOIN (VALUES (0.0, 2.0), (2.0, 5.0), (5.0, 10.0),
                         (10.0, 20.0), (20.0, 1e18)) AS b(lo, hi)
              ON e.value >= b.lo AND e.value < b.hi
            GROUP BY b.lo""",
        "asof_last_order": """
            SELECT e.event_id,
                   (SELECT CAST(epoch_us(MAX(o.o_orderdate)) AS BIGINT)
                    FROM orders o
                    WHERE o.o_custkey = e.user_id
                      AND epoch_us(o.o_orderdate) <= epoch_us(e.ts))
                   AS last_order_us
            FROM events e""",
        "customers_without_recent_orders": """
            SELECT c_custkey FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2001-01-01')""",
        "tpch_q3_topk": """
            SELECT l.l_orderkey AS o_orderkey,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                     AS revenue
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND l.l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY l.l_orderkey
            ORDER BY revenue DESC, o_orderkey LIMIT 10""",
        "events_running_sum": """
            SELECT event_id,
                   ROUND(SUM(value) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING), 2) AS running_value
            FROM events""",
        "top3_parts_per_brand": """
            SELECT p_brand, p_partkey, p_retailprice FROM (
              SELECT p_brand, p_partkey, p_retailprice,
                     ROW_NUMBER() OVER (
                       PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey) AS rn
              FROM part)
            WHERE rn <= 3""",
        "lineitem_quantity_quantiles": """
            SELECT quantile_disc(l_quantity, 0.25) AS q25,
                   quantile_disc(l_quantity, 0.5)  AS q50,
                   quantile_disc(l_quantity, 0.75) AS q75
            FROM lineitem""",
        "event_type_pivot": """
            SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_idx,
                   COUNT(*) FILTER (event_type = 'click')    AS cnt_click,
                   COUNT(*) FILTER (event_type = 'view')     AS cnt_view,
                   COUNT(*) FILTER (event_type = 'purchase') AS cnt_purchase,
                   COUNT(*) FILTER (event_type = 'signup')   AS cnt_signup,
                   COUNT(*) FILTER (event_type = 'error')    AS cnt_error
            FROM events GROUP BY 1""",
        "orders_per_nation": """
            SELECT n.n_name, COUNT(*) AS n_orders,
                   ROUND(SUM(o.o_totalprice), 0) AS revenue
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name""",
        "asof_next_event": """
            SELECT o.o_orderkey,
                   COALESCE((SELECT CAST(epoch_us(MIN(e.ts)) AS BIGINT)
                             FROM events e
                             WHERE e.user_id = o.o_custkey
                               AND epoch_us(e.ts) >= epoch_us(o.o_orderdate)),
                            -1) AS next_event_us
            FROM orders o""",
        "embedding_topk_ivf_fullprobe": """
            SELECT query_id, vec_id FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding, c.embedding)
                                DESC, c.vec_id) AS rn
              FROM embeddings q, embeddings c
              WHERE q.vec_id < 3 AND c.vec_id >= 3)
            WHERE rn <= 10""",
        "flagship_full_summary": f"""
            WITH kept AS (
              SELECT MIN(image_id) AS image_id FROM {images_p}
              GROUP BY phash),
            kg AS (
              SELECT g.* FROM {geo_p} g
              WHERE g.image_id IN (SELECT image_id FROM kept))
            SELECT
              (SELECT COUNT(*) FROM {images_p}) AS n_images,
              (SELECT COUNT(*) FROM kept) AS n_kept,
              (SELECT COUNT(*) FROM (
                 SELECT g.image_id, e.polygon_id
                 FROM kg g JOIN {edges_p} e
                   ON ((e.y1 <= g.lat) != (e.y2 <= g.lat)
                       AND g.lon < e.x1
                           + (g.lat - e.y1)/(e.y2 - e.y1)*(e.x2 - e.x1))
                 GROUP BY g.image_id, e.polygon_id
                 HAVING COUNT(*) % 2 = 1)) AS n_pip_pairs,
              (SELECT COUNT(*) FROM kept) * 3 AS n_knn_pairs,
              (SELECT COUNT(*) FROM (
                 SELECT DISTINCT
                   {_grid_sql('lon', TILE_RES, -180.0, 360.0)},
                   {_grid_sql('lat', TILE_RES, -90.0, 180.0)}
                 FROM kg)) AS n_tiles,
              (SELECT COUNT(*) FROM {images_p} i
               WHERE i.image_id IN (SELECT image_id FROM kept)
                 AND {normalize.normalize_street_sql('caption')}
                     != caption) AS n_caption_changed""",
        "uids_in_both_nodes_and_ways": f"""
            SELECT uid FROM (SELECT DISTINCT uid FROM {nodes_p})
            WHERE uid IN (SELECT uid FROM {ways_p})""",
        "user_customer_coverage": """
            SELECT category, COUNT(*) AS cnt FROM (
              SELECT CASE WHEN e.user_id IS NULL THEN 'customer_only'
                          WHEN c.c_custkey IS NULL THEN 'event_only'
                          ELSE 'both' END AS category
              FROM (SELECT DISTINCT user_id FROM events) e
              FULL OUTER JOIN customer c ON e.user_id = c.c_custkey)
            GROUP BY category""",
        "lancelike_zonemap_scan": f"""
            SELECT image_id, lon FROM {geo_p}
            WHERE lon >= 103.8 AND lon <= 103.9""",
        "lancelike_compact_scan": f"""
            SELECT image_id, lon FROM {geo_p}""",
        "incremental_user_counts": """
            SELECT user_id, COUNT(*) AS n_events
            FROM events GROUP BY user_id""",
        "lancelike_partition_counts": f"""
            SELECT {_grid_sql('lon', TILE_RES, -180.0, 360.0)} % 4 AS shard,
                   COUNT(*) AS n_rows
            FROM {geo_p} GROUP BY 1""",
        "audio_features": f"""
            SELECT audio_id, CAST(n_samples AS BIGINT) AS n_samples_dec,
                   (CAST(n_samples AS BIGINT) * 1000000) // sr AS duration_us
            FROM read_parquet('{_fxp('audio')}')""",
        "video_frame_index": f"""
            SELECT video_id, CAST(g AS BIGINT) AS frame_idx
            FROM read_parquet('{_fxp('videos')}') v,
                 UNNEST(range(0, CAST(v.n_frames AS BIGINT), 2)) AS t(g)""",
        "image_phash_verify": f"""
            SELECT image_id, TRUE AS phash_ok FROM {images_p}""",
        "resize_images_thumb": f"""
            SELECT image_id, CAST(16 * 16 * 3 AS BIGINT) AS n_bytes
            FROM {images_p}""",
        "image_phash_near_dup": f"""
            SELECT a.image_id AS id_a, b.image_id AS id_b
            FROM {images_p} a, {images_p} b
            WHERE a.image_id < b.image_id
              AND bit_count(xor(a.phash, b.phash)) <= 3""",
        "events_sliding_1h15m": """
            SELECT (epoch_us(ts) // 900000000) - v.off AS window_q,
                   COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value
            FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) v(off)
            GROUP BY 1""",
        "tpch_q5_volume": """
            SELECT n.n_name,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 0)
                     AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE s.s_nationkey = c.c_nationkey
            GROUP BY n.n_name""",
        "orders_rollup": """
            SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   COUNT(*) AS cnt
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
        "props_k_histogram": """
            SELECT CAST(CAST(props->>'$.k' AS BIGINT) // 10 AS BIGINT)
                     AS k_decile,
                   COUNT(*) AS cnt
            FROM events GROUP BY 1""",
        "way_geometry": f"""
            SELECT wn.way_id,
                   CAST(COUNT(*) AS BIGINT) AS n_points,
                   arg_min(nd.lon, wn.position) AS first_lon,
                   arg_min(nd.lat, wn.position) AS first_lat,
                   arg_max(nd.lon, wn.position) AS last_lon,
                   arg_max(nd.lat, wn.position) AS last_lat
            FROM {way_nodes_p} wn JOIN {nodes_p} nd ON wn.node_id = nd.id
            GROUP BY wn.way_id""",
        "way_polyline_length": f"""
            WITH pts AS (SELECT wn.way_id, wn.position, nd.lon, nd.lat
                         FROM {way_nodes_p} wn
                         JOIN {nodes_p} nd ON wn.node_id = nd.id),
            segs AS (SELECT a.way_id, {hav} AS d
                     FROM pts a JOIN pts b ON a.way_id = b.way_id
                      AND b.position = a.position + 1)
            SELECT way_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
                   CAST(SUM(CAST(floor(d * 1000 + 0.5) AS BIGINT))
                        AS BIGINT) AS len_mm
            FROM segs GROUP BY way_id""",
        "ways_crossing_polygons": f"""
            WITH pts AS (SELECT wn.way_id, wn.position,
                                nd.lon AS x, nd.lat AS y
                         FROM {way_nodes_p} wn
                         JOIN {nodes_p} nd ON wn.node_id = nd.id),
            segs AS (SELECT a.way_id, a.x AS x1, a.y AS y1,
                            b.x AS x2, b.y AS y2
                     FROM pts a JOIN pts b ON a.way_id = b.way_id
                      AND b.position = a.position + 1)
            SELECT DISTINCT s.way_id, e.polygon_id
            FROM segs s, {edges_p} e
            WHERE ((s.x2-s.x1)*(e.y1-s.y1) - (s.y2-s.y1)*(e.x1-s.x1))
                * ((s.x2-s.x1)*(e.y2-s.y1) - (s.y2-s.y1)*(e.x2-s.x1)) < 0
              AND ((e.x2-e.x1)*(s.y1-e.y1) - (e.y2-e.y1)*(s.x1-e.x1))
                * ((e.x2-e.x1)*(s.y2-e.y1) - (e.y2-e.y1)*(s.x2-e.x1)) < 0""",
        "way_polygon_relation": f"""
            WITH pts AS (SELECT wn.way_id, wn.position,
                                nd.lon AS x, nd.lat AS y
                         FROM {way_nodes_p} wn
                         JOIN {nodes_p} nd ON wn.node_id = nd.id),
            nn AS (SELECT way_id, COUNT(*) AS n FROM pts GROUP BY 1),
            inside AS (
              SELECT p.way_id, p.position, e.polygon_id
              FROM pts p JOIN {edges_p} e
                ON ((e.y1 <= p.y) != (e.y2 <= p.y)
                    AND p.x < e.x1 + (p.y - e.y1)/(e.y2 - e.y1)
                                     *(e.x2 - e.x1))
              GROUP BY p.way_id, p.position, e.polygon_id
              HAVING COUNT(*) % 2 = 1),
            ic AS (SELECT way_id, polygon_id, COUNT(*) AS n_in
                   FROM inside GROUP BY 1, 2),
            segs AS (SELECT a.way_id, a.x AS x1, a.y AS y1,
                            b.x AS x2, b.y AS y2
                     FROM pts a JOIN pts b ON a.way_id = b.way_id
                      AND b.position = a.position + 1),
            xings AS (
              SELECT DISTINCT s.way_id, e.polygon_id
              FROM segs s, {edges_p} e
              WHERE ((s.x2-s.x1)*(e.y1-s.y1) - (s.y2-s.y1)*(e.x1-s.x1))
                  * ((s.x2-s.x1)*(e.y2-s.y1) - (s.y2-s.y1)*(e.x2-s.x1)) < 0
                AND ((e.x2-e.x1)*(s.y1-e.y1) - (e.y2-e.y1)*(s.x1-e.x1))
                  * ((e.x2-e.x1)*(s.y2-e.y1) - (e.y2-e.y1)*(s.x2-e.x1)) < 0),
            pairs AS (SELECT way_id, polygon_id FROM ic
                      UNION SELECT way_id, polygon_id FROM xings)
            SELECT p.way_id, p.polygon_id,
                   COALESCE(ic.n_in, 0) AS n_in, nn.n AS n_nodes,
                   CASE WHEN x.way_id IS NOT NULL THEN 'crosses'
                        WHEN COALESCE(ic.n_in, 0) = nn.n THEN 'within'
                        ELSE 'partial' END AS relation
            FROM pairs p
            LEFT JOIN ic USING (way_id, polygon_id)
            LEFT JOIN xings x USING (way_id, polygon_id)
            JOIN nn ON nn.way_id = p.way_id""",
        "zonal_stats": f"""
            WITH pip AS (
              SELECT g.image_id, e.polygon_id,
                     MIN(g.lon) AS lon, MIN(g.lat) AS lat
              FROM {geo_p} g JOIN {edges_p} e
                ON ((e.y1 <= g.lat) != (e.y2 <= g.lat)
                    AND g.lon < e.x1 + (g.lat - e.y1)/(e.y2 - e.y1)
                                       *(e.x2 - e.x1))
              GROUP BY g.image_id, e.polygon_id
              HAVING COUNT(*) % 2 = 1)
            SELECT polygon_id, CAST(COUNT(*) AS BIGINT) AS n_points,
                   CAST(SUM(CAST(floor(lon * 1000000 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_lon_e6,
                   CAST(SUM(CAST(floor(lat * 1000000 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_lat_e6
            FROM pip GROUP BY polygon_id""",
        "funnel_conversion": """
            WITH v AS (SELECT user_id,
                              MIN(CAST(epoch_us(ts) AS BIGINT)) AS fv
                       FROM events WHERE event_type = 'view' GROUP BY 1),
            c AS (SELECT DISTINCT e.user_id
                  FROM events e JOIN v USING (user_id)
                  WHERE e.event_type = 'purchase'
                    AND CAST(epoch_us(e.ts) AS BIGINT) > v.fv
                    AND CAST(epoch_us(e.ts) AS BIGINT) <= v.fv + 86400000000)
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_viewers,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_converted""",
        "doc_quality_features_check": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+')) AS n_tokens_ws,
                   ROUND(CASE WHEN len(regexp_extract_all(text, '\S+')) = 0
                         THEN 0.0
                         ELSE CAST(length(regexp_replace(text, '\s', '', 'g'))
                                   AS DOUBLE)
                              / len(regexp_extract_all(text, '\S+')) END,
                         6) AS mean_token_len,
                   ROUND(CAST(len(regexp_extract_all(
                                  text, '[.,;:!?''"()\[\]{}<>-]')) AS DOUBLE)
                         / greatest(1, length(text)), 6) AS punct_ratio
            FROM documents""",
        "doc_quality_full_check": r"""
            WITH f AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\S+')) AS ntok,
                       CAST(len(list_filter(
                               regexp_extract_all(lower(text), '\S+'),
                               w -> w IN ('the','a','and','of','to','in',
                                          'is','it','that','for','on','with')
                           )) AS DOUBLE)
                         / greatest(1, len(regexp_extract_all(text, '\S+')))
                         AS stop_ratio,
                       CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE)
                         / greatest(1, length(text)) AS upper_ratio,
                       CAST(len(regexp_extract_all(
                               text, '[.,;:!?''"()\[\]{}<>-]')) AS DOUBLE)
                         / greatest(1, length(text)) AS punct_ratio
                FROM documents)
            SELECT doc_id,
                   ROUND(stop_ratio, 6) AS stopword_ratio,
                   ROUND(upper_ratio, 6) AS upper_ratio,
                   ROUND(0.4 * (LEAST(GREATEST(ntok / 50.0, 0), 1)
                                * LEAST(GREATEST((2000 - ntok) / 2000.0,
                                                 0), 1))
                         + 0.3 * LEAST(GREATEST(stop_ratio * 5, 0), 1)
                         + 0.15 * (1 - LEAST(GREATEST(punct_ratio * 5,
                                                      0), 1))
                         + 0.15 * (1 - LEAST(GREATEST(upper_ratio * 3,
                                                      0), 1)),
                         6) AS quality_score
            FROM f""",
        "doc_langid_check": r"""
            WITH f AS (
                SELECT doc_id,
                       regexp_matches(substr(text, 1, 400), '[一-鿿]') AS zh,
                       regexp_extract_all(lower(substr(text, 1, 2000)),
                                          '\S+') AS t
                FROM documents),
            h AS (
                SELECT doc_id, zh,
                       len(list_filter(t, w -> w IN ('der','die','das','und',
                           'ist','nicht','ein','mit','auf','für'))) AS de,
                       len(list_filter(t, w -> w IN ('the','a','and','of',
                           'to','in','is','it','that','for','on','with')))
                           AS en,
                       len(list_filter(t, w -> w IN ('el','la','los','las',
                           'y','es','en','un','una','con','por','que')))
                           AS es,
                       len(list_filter(t, w -> w IN ('le','la','les','et',
                           'est','un','une','dans','pour','que','des')))
                           AS fr
                FROM f)
            SELECT doc_id,
                   CASE WHEN zh THEN 'zh'
                        WHEN greatest(de, en, es, fr) = 0 THEN 'und'
                        WHEN de >= en AND de >= es AND de >= fr THEN 'de'
                        WHEN en >= es AND en >= fr THEN 'en'
                        WHEN es >= fr THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM h""",
        "tpch_q6_revenue": """
            SELECT ROUND(COALESCE(SUM(l_extendedprice * l_discount), 0.0), 2)
                     AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount >= 0.02 AND l_discount <= 0.04
              AND l_quantity < 24""",
        "tpch_q4_priority": """
            SELECT o_orderpriority, COUNT(*) AS cnt
            FROM orders
            WHERE EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate)
            GROUP BY o_orderpriority""",
        "tpch_q14_promo": """
            SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                     THEN l_extendedprice * (1 - l_discount)
                                     ELSE 0.0 END)
                         / SUM(l_extendedprice * (1 - l_discount)), 4)
                     AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-06-01'
              AND l_shipdate <  TIMESTAMP '1997-07-01'""",
        "tpch_q18_large_orders": """
            SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
                   ROUND(sum_qty, 2) AS sum_qty
            FROM orders JOIN (
                SELECT l_orderkey AS o_orderkey,
                       SUM(l_quantity) AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING SUM(l_quantity) > 180.0) USING (o_orderkey)
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        "event_gap_stats": """
            WITH g AS (
                SELECT user_id,
                       epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS gap
                FROM events)
            SELECT user_id, COUNT(gap) AS n_gaps,
                   ROUND(AVG(gap) / 1e6, 3) AS avg_gap_s
            FROM g GROUP BY user_id""",
        "corpus_prep_summary": r"""
            WITH norm AS (
                SELECT doc_id, lang,
                       len(regexp_extract_all(text, '\S+')) AS ntok,
                       trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
                           AS ntext
                FROM documents),
            kept AS (
                SELECT * FROM norm
                QUALIFY row_number() OVER (PARTITION BY ntext
                                           ORDER BY doc_id) = 1)
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(ntok) AS BIGINT) AS total_tokens
            FROM kept WHERE ntok >= 5 AND ntok <= 2000
            GROUP BY lang""",
        "event_value_quantiles_by_type": """
            SELECT event_type,
                   ROUND(quantile_disc(value, 0.5), 6)  AS p50,
                   ROUND(quantile_disc(value, 0.95), 6) AS p95
            FROM events GROUP BY event_type""",
        "jaccard_doc_pairs": f"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '\\S+') AS t
                FROM read_parquet('{_fxp('docs_dup')}')),
            sh AS (
                SELECT doc_id, list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || chr(1) || t[i+1] || chr(1) || t[i+2]
                       )) AS s
                FROM toks)
            SELECT id_a, id_b, jaccard FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                             / len(list_distinct(list_concat(a.s, b.s))),
                             6) AS jaccard,
                       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                             / len(list_distinct(list_concat(a.s, b.s)))
                             AS raw_j
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
            WHERE raw_j >= 0.8""",
        "parts_order_coverage": """
            SELECT p_brand, COUNT(*) AS n_parts,
                   CAST(COUNT(*) FILTER (WHERE o.n_li IS NULL) AS BIGINT)
                     AS n_never_ordered
            FROM part LEFT JOIN (
                SELECT l_partkey, COUNT(*) AS n_li
                FROM lineitem GROUP BY l_partkey) o
            ON p_partkey = o.l_partkey
            GROUP BY p_brand""",
        "near_dedup_docs_check": f"""
            WITH RECURSIVE toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '\\S+') AS t
                FROM read_parquet('{_fxp('docs_dup')}')),
            sh AS (
                SELECT doc_id, list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || chr(1) || t[i+1] || chr(1) || t[i+2]
                       )) AS s
                FROM toks),
            p AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
            e AS (SELECT id_a AS u, id_b AS v FROM p
                  UNION SELECT id_b, id_a FROM p),
            reach(u, v) AS (SELECT u, v FROM e
                            UNION
                            SELECT r.u, e2.v
                            FROM reach r JOIN e e2 ON r.v = e2.u),
            lab AS (SELECT u, MIN(v) AS mn FROM reach GROUP BY u)
            SELECT doc_id FROM read_parquet('{_fxp('docs_dup')}')
            WHERE doc_id NOT IN (SELECT u FROM lab WHERE mn < u)""",
        "pack_sequences": r"""
            WITH t AS (
                SELECT lang, doc_id,
                       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                           AS ntok
                FROM documents),
            c AS (
                SELECT lang, ntok,
                       COALESCE(SUM(ntok) OVER (
                           PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS start
                FROM t)
            SELECT lang, CAST(start // 2048 AS BIGINT) AS bin_idx,
                   COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens
            FROM c GROUP BY lang, bin_idx""",
        "tpch_q10_returns": """
            SELECT c_custkey, c_name, n_name, c_acctbal, revenue FROM (
                SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
                       SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                      * 10000 + 0.5) AS BIGINT)) / 10000.0
                           AS revenue
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation n ON c.c_nationkey = n.n_nationkey
                WHERE l.l_returnflag = 'R'
                GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal)
            ORDER BY revenue DESC, c_custkey LIMIT 20""",
        "heavy_hitter_tokens": r"""
            SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
                SELECT unnest(regexp_extract_all(text, '\S+')) AS token
                FROM documents)
            GROUP BY token HAVING COUNT(*) >= 500""",
        "bloom_join_march_revenue": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
                   SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                  * 10000 + 0.5) AS BIGINT)) / 10000.0
                       AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderdate >= DATE '1995-03-01'
              AND o.o_orderdate <  DATE '1995-04-01'""",
        # splitmix64 reproduced exactly in SQL: UBIGINT xor/shift, and
        # 64-bit modular multiply split into 32-bit halves so the
        # HUGEINT (int128) intermediate never overflows
        "stratified_sample_events": _SM64_MACROS + f"""
            SELECT event_id, user_id, event_type FROM events
            WHERE CAST(sm64(xor(CAST(event_id AS UBIGINT),
                                {SAMPLE_SEED}::UBIGINT)) AS HUGEINT)
                  < CASE event_type {' '.join(
                      f"WHEN '{k}' THEN {v * ((1 << 64) // 1000)}::HUGEINT"
                      for k, v in SAMPLE_RATES_PERMILLE.items())}
                    ELSE 0::HUGEINT END""",
        # nearest boundary: the SAME clamped-t point-segment expression
        # tree as stages/pip_join.nearest_boundary_join; MIN is order-
        # independent for floats, and sqrt + e9 rounding apply AFTER the
        # min on both sides
        "nearest_boundary_distance": f"""
            WITH e AS (SELECT x1, y1, x2 - x1 AS dx, y2 - y1 AS dy,
                              (x2-x1)*(x2-x1) + (y2-y1)*(y2-y1) AS len2
                       FROM {edges_p}),
            t AS (SELECT g.image_id, g.lon AS px, g.lat AS py,
                         e.x1, e.y1, e.dx, e.dy,
                         LEAST(1.0, GREATEST(0.0,
                             ((g.lon - e.x1) * e.dx + (g.lat - e.y1) * e.dy)
                             / e.len2)) AS tt
                  FROM {geo_p} g CROSS JOIN e),
            d AS (SELECT image_id,
                         (px - (x1 + tt*dx)) * (px - (x1 + tt*dx))
                       + (py - (y1 + tt*dy)) * (py - (y1 + tt*dy)) AS d2
                  FROM t)
            SELECT image_id AS id,
                   CAST(floor(sqrt(MIN(d2)) * 1e9 + 0.5) AS BIGINT) AS d9
            FROM d GROUP BY 1""",
        "top_users_per_event_type": """
            SELECT event_type, user_id, cnt FROM (
                SELECT event_type, user_id, COUNT(*) AS cnt,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY COUNT(*) DESC, user_id)
                           AS rn
                FROM events GROUP BY 1, 2)
            WHERE rn <= 5""",
        # histogram quantile sketch: identical float trees — bin =
        # clip(floor((v-lo)/span*bins)), need = ceil(q*n) in float64,
        # edge = lo + bin*(span/bins), e6-rounded after
        "event_value_histogram_quantiles": """
            WITH b AS (SELECT event_type,
                         CAST(LEAST(255, GREATEST(0,
                             floor((value - 0.0) / 512.0 * 256)))
                           AS BIGINT) AS bin
                       FROM events WHERE event_type IS NOT NULL),
            h AS (SELECT event_type, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
            c AS (SELECT event_type, bin,
                         SUM(c) OVER (PARTITION BY event_type
                                      ORDER BY bin) AS cum,
                         SUM(c) OVER (PARTITION BY event_type) AS n
                  FROM h),
            qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
            SELECT c.event_type, qs.q,
                   CAST(floor((0.0 + MIN(c.bin) FILTER (
                            WHERE c.cum >= ceil(qs.q * c.n))
                        * (512.0 / 256)) * 1e6 + 0.5) AS BIGINT) AS edge6
            FROM c CROSS JOIN qs
            GROUP BY 1, 2""",
        "tpch_q8_market_share": """
            WITH y AS (
                SELECT CAST(date_part('year', o.o_orderdate) AS BIGINT)
                           AS o_year,
                       CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                  * 1e4 + 0.5) AS BIGINT) AS rev4,
                       sn.n_name AS supp_nation
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                           AND p.p_type = 'PROMO'
                JOIN supplier s ON s.s_suppkey = l.l_suppkey
                JOIN nation sn ON sn.n_nationkey = s.s_nationkey
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN nation cn ON cn.n_nationkey = c.c_nationkey
                JOIN region r ON r.r_regionkey = cn.n_regionkey
                            AND r.r_name = 'ASIA')
            SELECT o_year,
                   CAST(floor(
                       CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                     THEN rev4 ELSE 0 END) AS DOUBLE)
                       / CAST(SUM(rev4) AS DOUBLE) * 1e6 + 0.5)
                     AS BIGINT) AS mkt_share_e6
            FROM y GROUP BY 1""",
        "tpch_q22_shape": """
            WITH c AS (SELECT c_custkey, c_nationkey,
                              CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                                  AS bal2
                       FROM customer),
            g AS (SELECT CAST(SUM(bal2) AS BIGINT) AS s2, COUNT(*) AS n
                  FROM c WHERE bal2 > 0)
            SELECT c.c_nationkey, COUNT(*) AS n_custs,
                   CAST(SUM(c.bal2) AS BIGINT) AS total_bal2
            FROM c, g
            WHERE c.bal2 * g.n > g.s2
              AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
                                      WHERE o_orderdate >= '2000-01-01')
            GROUP BY 1""",
        # PQ encode with the 0-iteration codebook: same Σ(x−c)² tree,
        # ties → lowest code via (d2, c) row_number on both sides
        "embedding_pq_codes_check": """
            WITH cen AS (SELECT row_number() OVER (ORDER BY vec_id) - 1
                             AS c, embedding AS ce
                         FROM (SELECT vec_id, embedding FROM embeddings
                               ORDER BY vec_id LIMIT 8)),
            sub AS (SELECT unnest([0, 1, 2, 3]) AS s),
            d AS (SELECT e.vec_id, sub.s, cen.c,
                         list_sum(list_transform(generate_series(1, 16),
                             j -> (CAST(e.embedding[sub.s*16 + j] AS DOUBLE)
                                   - CAST(cen.ce[sub.s*16 + j] AS DOUBLE))
                                * (CAST(e.embedding[sub.s*16 + j] AS DOUBLE)
                                   - CAST(cen.ce[sub.s*16 + j] AS DOUBLE))))
                             AS d2
                  FROM embeddings e CROSS JOIN sub CROSS JOIN cen)
            SELECT vec_id, s, code FROM (
                SELECT vec_id, s, c AS code,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY d2, c) AS rn
                FROM d)
            WHERE rn = 1""",
        "focal_cell_smooth": f"""
            WITH c AS (SELECT {_grid_sql('lon', 12, -180.0, 360.0)} AS x,
                              {_grid_sql('lat', 12, -90.0, 180.0)} AS y,
                              COUNT(*) AS cnt
                       FROM {geo_p} GROUP BY 1, 2),
            d AS (SELECT unnest([-1, 0, 1]) AS dx),
            e AS (SELECT unnest([-1, 0, 1]) AS dy)
            SELECT c.x + d.dx AS qx, c.y + e.dy AS qy,
                   CAST(SUM(c.cnt) AS BIGINT) AS focal_cnt
            FROM c CROSS JOIN d CROSS JOIN e
            WHERE c.x + d.dx BETWEEN 0 AND 4095
              AND c.y + e.dy BETWEEN 0 AND 4095
            GROUP BY 1, 2""",
        # OLS via exact-integer sufficient statistics; both engines
        # divide the same doubles built from the same ints
        "event_value_trend_per_type": """
            WITH r AS (SELECT event_type,
                              epoch_us(ts) // 86400000000 AS x,
                              CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
                       FROM events WHERE event_type IS NOT NULL),
            a AS (SELECT event_type, COUNT(*) AS n,
                         CAST(SUM(x) AS BIGINT) AS sx,
                         CAST(SUM(y) AS BIGINT) AS sy,
                         CAST(SUM(x * y) AS BIGINT) AS sxy,
                         CAST(SUM(x * x) AS BIGINT) AS sxx
                  FROM r GROUP BY 1)
            SELECT event_type, n,
                   CAST(floor((CAST(n AS DOUBLE) * sxy
                               - CAST(sx AS DOUBLE) * sy)
                              / (CAST(n AS DOUBLE) * sxx
                                 - CAST(sx AS DOUBLE) * sx)
                              * 1e6 + 0.5) AS BIGINT) AS slope_e6
            FROM a
            WHERE CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx
                  <> 0.0""",
        # entropy: the p·ln p sum runs in type-sorted order on both
        # engines (list_sum over an ORDER BY list; numpy axis-1 sums are
        # sequential below 9 terms and +0.0 identities are exact)
        "user_event_entropy": """
            WITH c AS (SELECT user_id, event_type, COUNT(*) AS cnt
                       FROM events GROUP BY 1, 2),
            n AS (SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n
                  FROM c GROUP BY 1),
            l AS (SELECT c.user_id, n.n,
                         list(CAST(c.cnt AS DOUBLE) / n.n
                              ORDER BY c.event_type) AS ps
                  FROM c JOIN n USING (user_id) GROUP BY c.user_id, n.n)
            SELECT user_id, n AS n_events,
                   CAST(floor(-(list_sum(list_transform(ps, p -> p * ln(p))))
                              * 1e6 + 0.5) AS BIGINT) AS entropy_e6
            FROM l""",
        "modal_event_type_per_user": """
            SELECT user_id, event_type, cnt FROM (
                SELECT user_id, event_type, COUNT(*) AS cnt,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY COUNT(*) DESC, event_type)
                           AS rn
                FROM events GROUP BY 1, 2)
            WHERE rn = 1""",
        "embedding_dim_stats": """
            WITH u AS (SELECT t.j - 1 AS dim,
                              CAST(floor(CAST(embedding[t.j] AS DOUBLE)
                                         * 1e6 + 0.5) AS BIGINT) AS v6
                       FROM embeddings,
                            LATERAL UNNEST(generate_series(
                                1, len(embedding))) AS t(j))
            SELECT dim, CAST(SUM(v6) AS BIGINT) AS s6,
                   CAST(SUM(v6 * v6) AS BIGINT) AS ss6
            FROM u GROUP BY 1""",
        "user_value_rolling3": """
            SELECT event_id,
                   CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS roll3_v2
            FROM events""",
        # grouped-HLL register fold: hllmix == stages.sketch._hash_col's
        # integer path (splitmix64 finalizer WITHOUT the +golden-ratio
        # increment); p=10 → register = h >> 54, rank = 55 − bit_length
        # of the 54-bit suffix (DuckDB bin() has no leading zeros, so
        # length(bin(x)) IS bit_length for x > 0)
        "hll_group_registers_check": _SM64_MACROS + """
            CREATE OR REPLACE MACRO hllmix(x) AS (
                WITH s1 AS (SELECT mulmod64(xor(CAST(x AS UBIGINT),
                        CAST(x AS UBIGINT) >> 30),
                        13787848793156543929::HUGEINT) AS z),
                s2 AS (SELECT mulmod64(xor(z, z >> 27),
                        10723151780598845931::HUGEINT) AS z FROM s1)
                SELECT xor(z, z >> 31) FROM s2);
            SELECT event_type,
                   CAST(h >> 54 AS BIGINT) AS register,
                   MAX(CASE WHEN (h & ((1::UBIGINT << 54) - 1)) = 0 THEN 55
                            ELSE 55 - length(bin(h & ((1::UBIGINT << 54) - 1)))
                       END) AS rank
            FROM (SELECT event_type, hllmix(user_id) AS h FROM events
                  WHERE event_type IS NOT NULL)
            GROUP BY 1, 2""",
        "part_cooccurrence": """
            SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                   COUNT(*) AS n
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2""",
        "event_transition_counts": """
            WITH s AS (SELECT user_id, event_type,
                              LEAD(event_type) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
                       FROM events)
            SELECT event_type AS src, nxt AS dst, COUNT(*) AS n
            FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2""",
        "embedding_sq8_check": """
            WITH d AS (SELECT j,
                         CAST(MIN(embedding[j]) AS DOUBLE) AS mn,
                         CAST(MAX(embedding[j]) AS DOUBLE) AS mx
                       FROM embeddings,
                            UNNEST(generate_series(1, 64)) AS t(j)
                       GROUP BY j),
            q AS (SELECT e.vec_id,
                         CAST(e.embedding[t.j] AS DOUBLE) AS v,
                         d.mn, (d.mx - d.mn) / 255.0 AS sc
                  FROM embeddings e,
                       UNNEST(generate_series(1, 64)) AS t(j)
                  JOIN d ON d.j = t.j),
            r AS (SELECT vec_id,
                         MAX(ABS(v - (mn +
                           CASE WHEN sc = 0 THEN 0.0
                                ELSE LEAST(GREATEST(
                                  floor((v - mn) / sc + 0.5), 0.0), 255.0)
                           END * sc))) AS err
                  FROM q GROUP BY vec_id)
            SELECT vec_id, CAST(floor(err * 1000000 + 0.5) AS BIGINT)
                     AS max_err_e6
            FROM r""",
        "dataset_split_counts": _SM64_MACROS + f"""
            WITH h AS (SELECT lang,
                   CAST(sm64(xor(CAST(doc_id AS UBIGINT),
                                 {SPLIT_SEED}::UBIGINT)) AS HUGEINT) AS u
                       FROM documents)
            SELECT lang,
                   CASE WHEN u < {800 * ((1 << 64) // 1000)}::HUGEINT
                        THEN 'train'
                        WHEN u < {900 * ((1 << 64) // 1000)}::HUGEINT
                        THEN 'val' ELSE 'test' END AS split,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM h GROUP BY 1, 2""",
        "parts_skyline": """
            SELECT p_partkey, p_retailprice, p_size FROM part p
            WHERE NOT EXISTS (
                SELECT 1 FROM part q
                WHERE q.p_retailprice <= p.p_retailprice
                  AND q.p_size >= p.p_size
                  AND (q.p_retailprice < p.p_retailprice
                       OR q.p_size > p.p_size))""",
        "street_typo_pairs": f"""
            WITH s AS (SELECT DISTINCT value AS name FROM {tags_p}
                       WHERE key = 'addr:street')
            SELECT a.name AS name_a, b.name AS name_b
            FROM s a JOIN s b ON a.name < b.name
            WHERE levenshtein(a.name, b.name) <= 1""",
        # Douglas-Peucker as a worklist recursive CTE: every segment row
        # either stops (no interior point beyond eps) or expands into its
        # two halves; kept points = all segment endpoints ever created.
        # Identical division-free expressions to the numpy kernel.
        "simplify_ways_dp": f"""
            WITH RECURSIVE pts AS (
                SELECT wn.way_id,
                       row_number() OVER (PARTITION BY wn.way_id
                           ORDER BY wn.position) - 1 AS idx,
                       n.lon, n.lat
                FROM {way_nodes_p} wn
                JOIN {nodes_p} n ON wn.node_id = n.id),
            ends AS (SELECT way_id, MAX(idx) AS last FROM pts
                     GROUP BY way_id),
            segs(way_id, i, j) AS (
                SELECT way_id, CAST(0 AS BIGINT), last FROM ends
                UNION ALL
                SELECT t.way_id,
                       CASE WHEN sides.side = 0 THEN t.i ELSE t.k END,
                       CASE WHEN sides.side = 0 THEN t.k ELSE t.j END
                FROM (
                    SELECT s.way_id, s.i, s.j, sp.idx AS k
                    FROM segs s, LATERAL (
                        SELECT p.idx,
                            CASE WHEN (b.lon-a.lon)*(b.lon-a.lon)
                                      + (b.lat-a.lat)*(b.lat-a.lat) = 0
                                 THEN (p.lon-a.lon)*(p.lon-a.lon)
                                      + (p.lat-a.lat)*(p.lat-a.lat)
                                 ELSE ((b.lon-a.lon)*(p.lat-a.lat)
                                       - (b.lat-a.lat)*(p.lon-a.lon))
                                      * ((b.lon-a.lon)*(p.lat-a.lat)
                                         - (b.lat-a.lat)*(p.lon-a.lon))
                            END AS score,
                            CASE WHEN (b.lon-a.lon)*(b.lon-a.lon)
                                      + (b.lat-a.lat)*(b.lat-a.lat) = 0
                                 THEN 0.05*0.05
                                 ELSE (0.05*0.05)
                                      * ((b.lon-a.lon)*(b.lon-a.lon)
                                         + (b.lat-a.lat)*(b.lat-a.lat))
                            END AS thr
                        FROM pts p, pts a, pts b
                        WHERE p.way_id = s.way_id AND a.way_id = s.way_id
                          AND b.way_id = s.way_id AND a.idx = s.i
                          AND b.idx = s.j AND p.idx > s.i AND p.idx < s.j
                        ORDER BY score DESC, p.idx LIMIT 1) sp
                    WHERE s.j > s.i + 1 AND sp.score > sp.thr) t
                CROSS JOIN (SELECT 0 AS side UNION ALL SELECT 1) sides)
            SELECT DISTINCT way_id, i AS idx FROM segs
            UNION
            SELECT DISTINCT way_id, j FROM segs""",
        "ncm_confusion": """
            WITH emb AS (SELECT vec_id, label,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
            cen AS (SELECT label AS c, list(m ORDER BY j) AS v FROM (
                        SELECT label, j, AVG(v[j]) AS m
                        FROM emb, UNNEST(generate_series(1, len(v))) AS t(j)
                        GROUP BY label, j) GROUP BY label),
            d AS (SELECT e.vec_id, e.label, cen.c,
                      list_sum(list_transform(generate_series(1, len(e.v)),
                          j -> (e.v[j] - cen.v[j])**2)) AS dist
                  FROM emb e CROSS JOIN cen),
            a AS (SELECT vec_id, label, c AS pred FROM (
                      SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY dist, c) AS rn FROM d) WHERE rn = 1)
            SELECT label, pred, CAST(COUNT(*) AS BIGINT) AS n
            FROM a GROUP BY label, pred""",
        # same float expression as the Ray kernel: ln c_ab + ln T −
        # ln c_a − ln c_b, rounded e4 before the top-k ordering
        "bigram_pmi_top": r"""
            WITH toks AS (
                SELECT regexp_extract_all(text, '\S+') AS t FROM documents),
            bg AS (
                SELECT t[i] AS w1, t[i+1] AS w2, CAST(COUNT(*) AS BIGINT)
                       AS cab
                FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
                GROUP BY t[i], t[i+1]),
            uni AS (
                SELECT w, CAST(COUNT(*) AS BIGINT) AS cu FROM (
                    SELECT unnest(t) AS w FROM toks) GROUP BY w),
            tt AS (SELECT CAST(SUM(cab) AS DOUBLE) AS t FROM bg),
            scored AS (
                SELECT bg.w1, bg.w2, bg.cab,
                       CAST(floor((ln(CAST(bg.cab AS DOUBLE)) + ln(tt.t)
                                   - ln(CAST(u1.cu AS DOUBLE))
                                   - ln(CAST(u2.cu AS DOUBLE)))*10000 + 0.5)
                            AS BIGINT) AS pmi_e4
                FROM bg JOIN uni u1 ON bg.w1 = u1.w
                        JOIN uni u2 ON bg.w2 = u2.w
                        CROSS JOIN tt
                WHERE bg.cab >= 5)
            SELECT w1, w2, cab, pmi_e4 FROM scored
            ORDER BY pmi_e4 DESC, w1, w2 LIMIT 20""",
        "lancelike_merge_upsert_check": """
            WITH upd AS (
                SELECT o_orderkey, o_custkey, o_orderstatus,
                       o_totalprice*2 AS o_totalprice, o_orderdate,
                       'MERGED' AS o_orderpriority
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
                       o_totalprice, o_orderdate, 'NEWROW'
                FROM orders WHERE o_orderkey % 13 = 0),
            merged AS (
                SELECT o_orderpriority, o_totalprice FROM orders
                WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
                UNION ALL
                SELECT o_orderpriority, o_totalprice FROM upd)
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM merged GROUP BY o_orderpriority""",
        "ssjoin_prefix_pairs": f"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '\\S+') AS t
                FROM read_parquet('{_fxp('docs_dup')}')),
            sh AS (
                SELECT doc_id, list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || chr(1) || t[i+1] || chr(1) || t[i+2]
                       )) AS s
                FROM toks)
            SELECT id_a, id_b, jaccard FROM (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                             / len(list_distinct(list_concat(a.s, b.s))),
                             6) AS jaccard,
                       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                             / len(list_distinct(list_concat(a.s, b.s)))
                             AS raw_j
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
            WHERE raw_j >= 0.7""",
        "tpch_q13_order_distribution": """
            SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
                SELECT c.c_custkey,
                       CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
                FROM customer c LEFT JOIN orders o
                     ON c.c_custkey = o.o_custkey
                GROUP BY c.c_custkey)
            GROUP BY c_count""",
        # quantities are integer-valued floats: the per-part AVG is an
        # exact double on both engines, so the < comparison is stable
        "tpch_q16_shape": """
            SELECT p_brand, p_type, p_size,
                   COUNT(DISTINCT l_suppkey) AS n_supp
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand != 'Brand#5' AND p_type != 'PROMO'
              AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
            GROUP BY 1, 2, 3""",
        "tpch_q19_disjunctive": """
            SELECT CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                       * 10000 + 0.5) AS BIGINT))
                        AS BIGINT) AS rev4,
                   COUNT(*) AS n_lines
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1.0 AND 11.0)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10.0 AND 20.0)
               OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 35
                   AND l_quantity BETWEEN 20.0 AND 30.0)""",
        "tpch_q7_volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                       * 10000 + 0.5) AS BIGINT))
                        AS BIGINT) AS rev4
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
               OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
            GROUP BY 1, 2, 3""",
        "tpch_q12_shape": """
            SELECT o_orderpriority, COUNT(*) AS n_lines,
                   CAST(SUM(CASE
                        WHEN CAST(epoch_us(l_shipdate) AS BIGINT) >
                             CAST(epoch_us(o_orderdate) AS BIGINT)
                             + 5184000000000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1""",
        "tpch_q17_small_quantity_revenue": """
            SELECT CAST(floor((SUM(cents)/100.0)/7.0*10000 + 0.5)
                        AS BIGINT) AS avg_yearly_e4
            FROM (
                SELECT CAST(floor(l.l_extendedprice*100 + 0.5) AS BIGINT)
                       AS cents
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                WHERE p.p_brand = 'Brand#23'
                  AND l.l_quantity < (
                      SELECT 0.2 * (SUM(l2.l_quantity) / COUNT(*))
                      FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey))""",
        # two Lloyd rounds as chained CTEs; same float expressions as the
        # Ray kernel (explicit squared-diff sums, plain means)
        "kmeans_embeddings": """
            WITH emb AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
            init AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
                     FROM (SELECT * FROM emb ORDER BY vec_id LIMIT 8)),
            d1 AS (SELECT e.vec_id, e.v, i.c,
                       list_sum(list_transform(generate_series(1, len(e.v)),
                           j -> (e.v[j] - i.v[j])**2)) AS dist
                   FROM emb e CROSS JOIN init i),
            a1 AS (SELECT vec_id, v, c FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id
                           ORDER BY dist, c) AS rn FROM d1) WHERE rn = 1),
            c1 AS (SELECT c, list(m ORDER BY j) AS v FROM (
                       SELECT c, j, AVG(v[j]) AS m
                       FROM a1, UNNEST(generate_series(1, len(v))) AS t(j)
                       GROUP BY c, j) GROUP BY c),
            d2 AS (SELECT e.vec_id, e.v, i.c,
                       list_sum(list_transform(generate_series(1, len(e.v)),
                           j -> (e.v[j] - i.v[j])**2)) AS dist
                   FROM emb e CROSS JOIN c1 i),
            a2 AS (SELECT vec_id, v, c FROM (
                       SELECT *, row_number() OVER (PARTITION BY vec_id
                           ORDER BY dist, c) AS rn FROM d2) WHERE rn = 1),
            n2 AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n_points
                   FROM a2 GROUP BY c),
            m2 AS (SELECT c, j, AVG(v[j]) AS m
                   FROM a2, UNNEST(generate_series(1, len(v))) AS t(j)
                   GROUP BY c, j)
            SELECT m2.c, m2.j,
                   CAST(floor(m2.m*10000 + 0.5) AS BIGINT) AS coord_e4,
                   n2.n_points
            FROM m2 JOIN n2 USING (c)""",
        # identical float expressions to the Ray kernel: w = 1.0/deg
        # precomputed, update = (1.0-0.85) + 0.85*SUM(w*r) — so both
        # engines round the same doubles at every iteration
        "pagerank_order_part": """
            WITH base AS (
                SELECT l_orderkey*2 AS src, l_partkey*2+1 AS dst
                FROM lineitem),
            edges AS (SELECT src, dst FROM base
                      UNION ALL SELECT dst, src FROM base),
            deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
            ew AS (SELECT e.src, e.dst, 1.0/deg AS w
                   FROM edges e JOIN deg USING (src)),
            r0 AS (SELECT src AS node, 1.0::DOUBLE AS r FROM deg),
            r1 AS (SELECT ew.dst AS node, (1.0-0.85) + 0.85*SUM(ew.w*r.r) AS r
                   FROM ew JOIN r0 r ON ew.src = r.node GROUP BY ew.dst),
            r2 AS (SELECT ew.dst AS node, (1.0-0.85) + 0.85*SUM(ew.w*r.r) AS r
                   FROM ew JOIN r1 r ON ew.src = r.node GROUP BY ew.dst),
            r3 AS (SELECT ew.dst AS node, (1.0-0.85) + 0.85*SUM(ew.w*r.r) AS r
                   FROM ew JOIN r2 r ON ew.src = r.node GROUP BY ew.dst)
            SELECT node, CAST(floor(r*1000000 + 0.5) AS BIGINT) AS rank_e6
            FROM r3 ORDER BY rank_e6 DESC, node LIMIT 20""",
        # same float expression as the Ray kernel (ln N − ln df, not
        # ln(N/df)) so both engines round the identical double
        "tfidf_top_terms": r"""
            WITH tf AS (
                SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
                FROM (SELECT doc_id,
                             unnest(regexp_extract_all(text, '\S+')) AS token
                      FROM documents)
                GROUP BY doc_id, token),
            df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.token,
                       CAST(floor(tf.tf * (ln(n.n) - ln(CAST(df.df AS DOUBLE)))
                                  * 10000 + 0.5) AS BIGINT) AS score_e4
                FROM tf JOIN df USING (token) CROSS JOIN n),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id
                    ORDER BY score_e4 DESC, token) AS rk
                FROM scored)
            SELECT doc_id, token, score_e4 FROM ranked WHERE rk <= 3""",
        "raster_vectorize_regions": f"""
            WITH RECURSIVE pix AS (
                SELECT qxf // 16 AS tile_qx, qyf // 16 AS tile_qy,
                       qxf % 16 AS px, 15 - (qyf % 16) AS py,
                       COUNT(*) AS cnt
                FROM (SELECT
                        {_grid_sql('lon', RASTER_RES + 4, -180.0, 360.0)} AS qxf,
                        {_grid_sql('lat', RASTER_RES + 4, -90.0, 180.0)} AS qyf
                      FROM {geo_p})
                GROUP BY 1, 2, 3, 4),
            e0 AS (
                SELECT a.tile_qx, a.tile_qy,
                       a.py * 16 + a.px AS u, b.py * 16 + b.px AS v
                FROM pix a JOIN pix b USING (tile_qx, tile_qy)
                WHERE (b.px = a.px + 1 AND b.py = a.py)
                   OR (b.px = a.px AND b.py = a.py + 1)),
            e AS (SELECT tile_qx, tile_qy, u, v FROM e0
                  UNION SELECT tile_qx, tile_qy, v, u FROM e0),
            reach(tile_qx, tile_qy, u, v) AS (
                SELECT tile_qx, tile_qy, u, v FROM e
                UNION
                SELECT r.tile_qx, r.tile_qy, r.u, e2.v
                FROM reach r JOIN e e2 ON r.tile_qx = e2.tile_qx
                 AND r.tile_qy = e2.tile_qy AND r.v = e2.u),
            lab AS (
                SELECT p.tile_qx, p.tile_qy, p.px, p.py, p.cnt,
                       LEAST(p.py * 16 + p.px,
                             COALESCE(MIN(r.v), p.py * 16 + p.px))
                           AS region_id
                FROM pix p LEFT JOIN reach r
                  ON r.tile_qx = p.tile_qx AND r.tile_qy = p.tile_qy
                 AND r.u = p.py * 16 + p.px
                GROUP BY p.tile_qx, p.tile_qy, p.px, p.py, p.cnt)
            SELECT tile_qx, tile_qy, region_id,
                   COUNT(*) AS n_px, CAST(SUM(cnt) AS BIGINT) AS n_points,
                   MIN(px) AS px_min, MAX(px) AS px_max,
                   MIN(py) AS py_min, MAX(py) AS py_max,
                   -180.0 + (tile_qx * 16 + MIN(px))
                       * {360.0 / (1 << (RASTER_RES + 4))!r} AS west,
                   -180.0 + (tile_qx * 16 + MAX(px) + 1)
                       * {360.0 / (1 << (RASTER_RES + 4))!r} AS east,
                   -90.0 + ((tile_qy + 1) * 16 - MAX(py) - 1)
                       * {180.0 / (1 << (RASTER_RES + 4))!r} AS south,
                   -90.0 + ((tile_qy + 1) * 16 - MIN(py))
                       * {180.0 / (1 << (RASTER_RES + 4))!r} AS north
            FROM lab GROUP BY tile_qx, tile_qy, region_id""",
        "polygon_geometry_stats": f"""
            SELECT polygon_id,
                   len(ring) AS n_vertices,
                   ROUND(ABS(list_sum(list_transform(
                       generate_series(1, len(ring)),
                       i -> ring[i].lon * ring[i % len(ring) + 1].lat
                          - ring[i % len(ring) + 1].lon * ring[i].lat
                   ))) / 2, 9) AS area_deg2,
                   ROUND(list_sum(list_transform(ring, p -> p.lon))
                         / len(ring), 9) AS centroid_lon,
                   ROUND(list_sum(list_transform(ring, p -> p.lat))
                         / len(ring), 9) AS centroid_lat
            FROM read_parquet('{_fxp('polygons')}')""",
        "tpch_q2_min_cost_supplier": """
            WITH pr AS (SELECT p_partkey FROM part
                        WHERE p_type = 'STANDARD' AND p_size <= 10),
            pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
            sup AS (SELECT s_suppkey, s_name, n_name,
                           CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)
                               AS bal2
                    FROM supplier
                    JOIN nation ON n_nationkey = s_nationkey
                    JOIN region ON r_regionkey = n_regionkey
                    WHERE r_name = 'ASIA'),
            c AS (SELECT l_partkey AS p_partkey, s_suppkey, s_name,
                         n_name, bal2,
                         row_number() OVER (PARTITION BY l_partkey
                                            ORDER BY bal2, s_suppkey) AS rn
                  FROM pairs
                  JOIN pr ON p_partkey = l_partkey
                  JOIN sup ON s_suppkey = l_suppkey)
            SELECT p_partkey, s_suppkey, s_name, n_name, bal2
            FROM c WHERE rn = 1
            ORDER BY bal2 DESC, p_partkey LIMIT 100""",
        "tpch_q9_profit_shape": """
            SELECT n.n_name, CAST(date_part('year', o.o_orderdate)
                                  AS BIGINT) AS o_year,
                   CAST(SUM(
                       CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                  * 1e4 + 0.5) AS BIGINT)
                       - CAST(floor(p.p_retailprice * 1e3 + 0.5) AS BIGINT)
                         * CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                       AS profit4
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
                       AND p.p_name LIKE '%red%'
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2""",
        "tpch_q11_important_parts": """
            WITH v AS (SELECT l_partkey AS p_partkey,
                              CAST(SUM(CAST(floor(
                                  l_extendedprice * (1.0 - l_discount)
                                  * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
                                  AS val4
                       FROM lineitem GROUP BY 1),
            g AS (SELECT CAST(SUM(val4) AS BIGINT) AS tot FROM v)
            SELECT p_partkey, val4 FROM v, g WHERE val4 * 2000 > tot""",
        "tpch_q15_top_supplier": """
            WITH rev AS (SELECT l_suppkey AS s_suppkey,
                                CAST(SUM(CAST(floor(
                                    l_extendedprice * (1.0 - l_discount)
                                    * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
                                    AS total_rev4
                         FROM lineitem
                         WHERE l_shipdate >= '1996-01-01'
                           AND l_shipdate < '1996-04-01'
                         GROUP BY 1)
            SELECT s_suppkey, s_name, total_rev4
            FROM rev JOIN supplier USING (s_suppkey)
            WHERE total_rev4 = (SELECT MAX(total_rev4) FROM rev)
            ORDER BY s_suppkey""",
        "tpch_q20_excess_share": """
            WITH ps AS (SELECT l_partkey, l_suppkey,
                               CAST(SUM(CAST(floor(l_quantity * 100 + 0.5)
                                             AS BIGINT)) AS BIGINT) AS q2
                        FROM lineitem GROUP BY 1, 2),
            pt AS (SELECT l_partkey, CAST(SUM(q2) AS BIGINT) AS tot2
                   FROM ps GROUP BY 1),
            keys AS (SELECT DISTINCT l_suppkey
                     FROM ps JOIN pt USING (l_partkey)
                     WHERE ps.q2 * 8 > pt.tot2)
            SELECT s_suppkey, s_name, n_name
            FROM keys
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'ASIA'""",
        "grid_dbscan_clusters": f"""
            WITH RECURSIVE c AS (
                SELECT {_grid_sql('lon', DBSCAN_RES, -180.0, 360.0)} AS qx,
                       {_grid_sql('lat', DBSCAN_RES, -90.0, 180.0)} AS qy,
                       COUNT(*) AS cnt
                FROM {geo_p} GROUP BY 1, 2),
            k AS (SELECT qx * {1 << DBSCAN_RES} + qy AS key, qx, qy, cnt
                  FROM c WHERE cnt >= {DBSCAN_MINPTS}),
            e0 AS (SELECT a.key AS u, b.key AS v FROM k a JOIN k b
                   ON abs(a.qx - b.qx) <= 1 AND abs(a.qy - b.qy) <= 1
                  AND a.key < b.key),
            e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
            reach(u, v) AS (
                SELECT u, v FROM e
                UNION
                SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u),
            lab AS (SELECT k.key,
                           LEAST(k.key, COALESCE(MIN(r.v), k.key))
                               AS cluster_id
                    FROM k LEFT JOIN reach r ON r.u = k.key
                    GROUP BY k.key)
            SELECT cluster_id, COUNT(*) AS n_cells,
                   CAST(SUM(cnt) AS BIGINT) AS n_points,
                   MIN(qx) AS qx_min, MAX(qx) AS qx_max,
                   MIN(qy) AS qy_min, MAX(qy) AS qy_max
            FROM k JOIN lab USING (key) GROUP BY 1""",
        "cell_hop_distance": f"""
            WITH RECURSIVE c AS (
                SELECT {_grid_sql('lon', DBSCAN_RES, -180.0, 360.0)} AS qx,
                       {_grid_sql('lat', DBSCAN_RES, -90.0, 180.0)} AS qy,
                       COUNT(*) AS cnt
                FROM {geo_p} GROUP BY 1, 2),
            k AS (SELECT qx * {1 << DBSCAN_RES} + qy AS key, qx, qy, cnt
                  FROM c),
            seed AS (SELECT key FROM k
                     ORDER BY cnt DESC, key LIMIT 1),
            e AS (SELECT a.key AS u, b.key AS v FROM k a JOIN k b
                  ON abs(a.qx - b.qx) <= 1 AND abs(a.qy - b.qy) <= 1
                 AND a.key <> b.key),
            r(key, d) AS (
                SELECT key, 0 FROM seed
                UNION
                SELECT e.v, r.d + 1 FROM r JOIN e ON e.u = r.key
                WHERE r.d < 127),
            m AS (SELECT key, MIN(d) AS hops FROM r GROUP BY 1)
            SELECT qx, qy, cnt, hops FROM k JOIN m USING (key)""",
        "cell_cost_isochrone": f"""
            WITH RECURSIVE c AS (
                SELECT {_grid_sql('lon', DBSCAN_RES, -180.0, 360.0)} AS qx,
                       {_grid_sql('lat', DBSCAN_RES, -90.0, 180.0)} AS qy,
                       COUNT(*) AS cnt
                FROM {geo_p} GROUP BY 1, 2),
            k AS (SELECT qx * {1 << DBSCAN_RES} + qy AS key, qx, qy, cnt,
                         CASE WHEN cnt >= {DBSCAN_MINPTS} THEN 1 ELSE 2
                         END AS w
                  FROM c),
            seed AS (SELECT key FROM k
                     ORDER BY cnt DESC, key LIMIT 1),
            e AS (SELECT a.key AS u, b.key AS v, b.w FROM k a JOIN k b
                  ON abs(a.qx - b.qx) <= 1 AND abs(a.qy - b.qy) <= 1
                 AND a.key <> b.key),
            r(key, d) AS (
                SELECT key, 0 FROM seed
                UNION
                SELECT e.v, r.d + e.w FROM r JOIN e ON e.u = r.key
                WHERE r.d + e.w <= {ISO_BUDGET}),
            m AS (SELECT key, MIN(d) AS cost FROM r GROUP BY 1)
            SELECT qx, qy, cnt, cost FROM k JOIN m USING (key)""",
        "dbscan_cluster_diameter": f"""
            WITH RECURSIVE c AS (
                SELECT {_grid_sql('lon', DBSCAN_RES, -180.0, 360.0)} AS qx,
                       {_grid_sql('lat', DBSCAN_RES, -90.0, 180.0)} AS qy,
                       COUNT(*) AS cnt
                FROM {geo_p} GROUP BY 1, 2),
            k AS (SELECT qx * {1 << DBSCAN_RES} + qy AS key, qx, qy, cnt
                  FROM c WHERE cnt >= {DBSCAN_MINPTS}),
            e0 AS (SELECT a.key AS u, b.key AS v FROM k a JOIN k b
                   ON abs(a.qx - b.qx) <= 1 AND abs(a.qy - b.qy) <= 1
                  AND a.key < b.key),
            e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
            reach(u, v) AS (
                SELECT u, v FROM e
                UNION
                SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u),
            lab AS (SELECT k.key,
                           LEAST(k.key, COALESCE(MIN(r.v), k.key))
                               AS cluster_id
                    FROM k LEFT JOIN reach r ON r.u = k.key
                    GROUP BY k.key)
            SELECT la.cluster_id,
                   COUNT(DISTINCT a.key) AS n_cells,
                   MAX((a.qx - b.qx) * (a.qx - b.qx)
                       + (a.qy - b.qy) * (a.qy - b.qy)) AS diam2
            FROM k a JOIN lab la ON la.key = a.key
                 JOIN lab lb ON lb.cluster_id = la.cluster_id
                 JOIN k b ON b.key = lb.key
            GROUP BY 1""",
        "hexbin_counts": f"""
            WITH h AS (
                SELECT ((2.0/3.0) * lon) / {HEX_SIZE} AS x,
                       ((sqrt(3.0)/3.0) * lat - (1.0/3.0) * lon)
                           / {HEX_SIZE} AS z
                FROM {geo_p}),
            h2 AS (SELECT x, z, -x - z AS y FROM h),
            h3 AS (SELECT x, y, z,
                          floor(x + 0.5) AS rx, floor(y + 0.5) AS ry,
                          floor(z + 0.5) AS rz
                   FROM h2),
            h4 AS (SELECT rx, ry, rz,
                          abs(rx - x) AS dx, abs(ry - y) AS dy,
                          abs(rz - z) AS dz
                   FROM h3),
            b AS (SELECT
                    CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz
                              ELSE rx END AS BIGINT) AS q,
                    CAST(CASE WHEN NOT (dx > dy AND dx > dz)
                               AND NOT (dy > dz) THEN -rx - ry
                              ELSE rz END AS BIGINT) AS r
                  FROM h4)
            SELECT q, r, COUNT(*) AS cnt FROM b GROUP BY 1, 2""",
        "idw_cell_surface": f"""
            WITH c AS (
                SELECT {_grid_sql('lon', DBSCAN_RES, -180.0, 360.0)} AS qx,
                       {_grid_sql('lat', DBSCAN_RES, -90.0, 180.0)} AS qy,
                       COUNT(*) AS cnt
                FROM {geo_p} GROUP BY 1, 2),
            k AS (SELECT qx * {1 << DBSCAN_RES} + qy AS key, qx, qy, cnt
                  FROM c),
            pairs AS (
                SELECT a.key AS t, b.cnt AS ncnt,
                       (a.qx - b.qx) * (a.qx - b.qx)
                       + (a.qy - b.qy) * (a.qy - b.qy) AS d2
                FROM k a JOIN k b
                ON abs(a.qx - b.qx) <= 3 AND abs(a.qy - b.qy) <= 3
               AND a.key <> b.key),
            s AS (SELECT t,
                         CAST(SUM(ncnt * (9360 // d2)) AS BIGINT)
                             AS num_w,
                         CAST(SUM(9360 // d2) AS BIGINT) AS den_w
                  FROM pairs GROUP BY t)
            SELECT k.qx, k.qy, k.cnt, s.num_w, s.den_w,
                   ROUND(CAST(s.num_w AS DOUBLE)
                         / CAST(s.den_w AS DOUBLE), 9) AS idw
            FROM k JOIN s ON s.t = k.key""",
        "moran_i_cells": f"""
            WITH c AS (
                SELECT {_grid_sql('lon', DBSCAN_RES, -180.0, 360.0)} AS qx,
                       {_grid_sql('lat', DBSCAN_RES, -90.0, 180.0)} AS qy,
                       COUNT(*) AS cnt
                FROM {geo_p} GROUP BY 1, 2),
            k AS (SELECT qx * {1 << DBSCAN_RES} + qy AS key, qx, qy, cnt
                  FROM c),
            st AS (SELECT COUNT(*) AS n, SUM(cnt) AS s FROM k),
            e AS (SELECT a.cnt AS xu, b.cnt AS xv FROM k a JOIN k b
                  ON abs(a.qx - b.qx) <= 1 AND abs(a.qy - b.qy) <= 1
                 AND a.key <> b.key),
            nm AS (SELECT CAST(SUM((st.n * xu - st.s)
                                   * (st.n * xv - st.s)) AS BIGINT)
                              AS num,
                          COUNT(*) AS w
                   FROM e CROSS JOIN st),
            dn AS (SELECT CAST(SUM((st.n * cnt - st.s)
                                   * (st.n * cnt - st.s)) AS BIGINT)
                              AS den
                   FROM k CROSS JOIN st)
            SELECT st.n AS n_cells, nm.w AS w_pairs, nm.num, dn.den,
                   ROUND((CAST(st.n AS DOUBLE) / CAST(nm.w AS DOUBLE))
                         * (CAST(nm.num AS DOUBLE)
                            / CAST(dn.den AS DOUBLE)), 9) AS moran_i
            FROM st, nm, dn""",
        "way_network_components": f"""
            WITH RECURSIVE wn AS (SELECT way_id, node_id
                                  FROM {way_nodes_p}),
            w AS (SELECT DISTINCT way_id FROM wn),
            e0 AS (SELECT DISTINCT a.way_id AS u, b.way_id AS v
                   FROM wn a JOIN wn b ON a.node_id = b.node_id
                  AND a.way_id < b.way_id),
            e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
            reach(u, v) AS (
                SELECT u, v FROM e
                UNION
                SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u),
            lab AS (SELECT w.way_id,
                           LEAST(w.way_id, COALESCE(MIN(r.v), w.way_id))
                               AS component_id
                    FROM w LEFT JOIN reach r ON r.u = w.way_id
                    GROUP BY w.way_id)
            SELECT l.component_id,
                   COUNT(DISTINCT wn.way_id) AS n_ways,
                   COUNT(DISTINCT wn.node_id) AS n_nodes
            FROM lab l JOIN wn ON wn.way_id = l.way_id
            GROUP BY 1""",
        "phash_topk_retrieval": f"""
            WITH q AS (SELECT image_id AS query_id, phash AS qh
                       FROM {images_p} ORDER BY image_id
                       LIMIT {PHASH_NQ}),
            d AS (SELECT q.query_id, i.image_id,
                         bit_count(xor(i.phash, q.qh)) AS dist
                  FROM q JOIN {images_p} i
                  ON i.image_id <> q.query_id),
            r AS (SELECT query_id, image_id, CAST(dist AS BIGINT) AS dist,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY dist, image_id)
                             AS rn
                  FROM d)
            SELECT query_id, image_id, dist FROM r
            WHERE rn <= {PHASH_K}""",
        "lancelike_spatial_scan": f"""
            SELECT image_id, lon, lat FROM {geo_p}
            WHERE {_grid_sql('lon', 8, -180.0, 360.0)} = {_sscan_qx}
              AND {_grid_sql('lat', 8, -90.0, 180.0)} = {_sscan_qy}""",
        "polygon_overlap_pairs": f"""
            WITH p AS (SELECT polygon_id, bbox_w, bbox_s, bbox_e, bbox_n,
                              ring[1].lon AS v0x, ring[1].lat AS v0y
                       FROM {polys_p}),
            cand AS (SELECT a.polygon_id AS pa, b.polygon_id AS pb,
                            a.v0x AS avx, a.v0y AS avy,
                            b.v0x AS bvx, b.v0y AS bvy
                     FROM p a JOIN p b ON a.polygon_id < b.polygon_id
                      AND a.bbox_w <= b.bbox_e AND b.bbox_w <= a.bbox_e
                      AND a.bbox_s <= b.bbox_n AND b.bbox_s <= a.bbox_n),
            r AS (SELECT c.*,
              EXISTS (SELECT 1 FROM {edges_p} ea, {edges_p} eb
                      WHERE ea.polygon_id = c.pa
                        AND eb.polygon_id = c.pb
                        AND ((ea.x2-ea.x1)*(eb.y1-ea.y1)
                             - (ea.y2-ea.y1)*(eb.x1-ea.x1))
                          * ((ea.x2-ea.x1)*(eb.y2-ea.y1)
                             - (ea.y2-ea.y1)*(eb.x2-ea.x1)) < 0
                        AND ((eb.x2-eb.x1)*(ea.y1-eb.y1)
                             - (eb.y2-eb.y1)*(ea.x1-eb.x1))
                          * ((eb.x2-eb.x1)*(ea.y2-eb.y1)
                             - (eb.y2-eb.y1)*(ea.x2-eb.x1)) < 0)
                  AS crosses,
              ((SELECT COUNT(*) FROM {edges_p} e
                WHERE e.polygon_id = c.pa
                  AND ((e.y1 <= c.bvy) != (e.y2 <= c.bvy))
                  AND c.bvx < e.x1 + (c.bvy - e.y1)/(e.y2 - e.y1)
                                     *(e.x2 - e.x1)) % 2 = 1)
                  AS a_has_b,
              ((SELECT COUNT(*) FROM {edges_p} e
                WHERE e.polygon_id = c.pb
                  AND ((e.y1 <= c.avy) != (e.y2 <= c.avy))
                  AND c.avx < e.x1 + (c.avy - e.y1)/(e.y2 - e.y1)
                                     *(e.x2 - e.x1)) % 2 = 1)
                  AS b_has_a
              FROM cand c)
            SELECT pa AS poly_a, pb AS poly_b,
                   CASE WHEN crosses THEN 'crosses'
                        ELSE 'contains' END AS relation
            FROM r WHERE crosses OR a_has_b OR b_has_a""",
        "polygon_dissolve_components": f"""
            WITH RECURSIVE p AS (
                SELECT polygon_id, kind, bbox_w, bbox_s, bbox_e, bbox_n,
                       ring[1].lon AS v0x, ring[1].lat AS v0y
                FROM {polys_p}),
            cand AS (SELECT a.polygon_id AS pa, b.polygon_id AS pb,
                            a.v0x AS avx, a.v0y AS avy,
                            b.v0x AS bvx, b.v0y AS bvy
                     FROM p a JOIN p b ON a.polygon_id < b.polygon_id
                      AND a.kind = b.kind
                      AND a.bbox_w <= b.bbox_e AND b.bbox_w <= a.bbox_e
                      AND a.bbox_s <= b.bbox_n AND b.bbox_s <= a.bbox_n),
            rr AS (SELECT c.*,
              EXISTS (SELECT 1 FROM {edges_p} ea, {edges_p} eb
                      WHERE ea.polygon_id = c.pa
                        AND eb.polygon_id = c.pb
                        AND ((ea.x2-ea.x1)*(eb.y1-ea.y1)
                             - (ea.y2-ea.y1)*(eb.x1-ea.x1))
                          * ((ea.x2-ea.x1)*(eb.y2-ea.y1)
                             - (ea.y2-ea.y1)*(eb.x2-ea.x1)) < 0
                        AND ((eb.x2-eb.x1)*(ea.y1-eb.y1)
                             - (eb.y2-eb.y1)*(ea.x1-eb.x1))
                          * ((eb.x2-eb.x1)*(ea.y2-eb.y1)
                             - (eb.y2-eb.y1)*(ea.x2-eb.x1)) < 0)
                  AS crosses,
              ((SELECT COUNT(*) FROM {edges_p} e
                WHERE e.polygon_id = c.pa
                  AND ((e.y1 <= c.bvy) != (e.y2 <= c.bvy))
                  AND c.bvx < e.x1 + (c.bvy - e.y1)/(e.y2 - e.y1)
                                     *(e.x2 - e.x1)) % 2 = 1)
                  AS a_has_b,
              ((SELECT COUNT(*) FROM {edges_p} e
                WHERE e.polygon_id = c.pb
                  AND ((e.y1 <= c.avy) != (e.y2 <= c.avy))
                  AND c.avx < e.x1 + (c.avy - e.y1)/(e.y2 - e.y1)
                                     *(e.x2 - e.x1)) % 2 = 1)
                  AS b_has_a
              FROM cand c),
            ov AS (SELECT pa AS u, pb AS v FROM rr
                   WHERE crosses OR a_has_b OR b_has_a),
            e AS (SELECT u, v FROM ov UNION SELECT v, u FROM ov),
            reach(u, v) AS (
                SELECT u, v FROM e
                UNION
                SELECT r2.u, e2.v FROM reach r2 JOIN e e2 ON r2.v = e2.u),
            lab AS (SELECT p.polygon_id, p.kind,
                           LEAST(p.polygon_id,
                                 COALESCE(MIN(r3.v), p.polygon_id))
                               AS component_id
                    FROM p LEFT JOIN reach r3 ON r3.u = p.polygon_id
                    GROUP BY p.polygon_id, p.kind)
            SELECT component_id, kind, COUNT(*) AS n_members
            FROM lab GROUP BY 1, 2""",
        "cell_voronoi_allocation": f"""
            WITH RECURSIVE c AS (
                SELECT {_grid_sql('lon', DBSCAN_RES, -180.0, 360.0)} AS qx,
                       {_grid_sql('lat', DBSCAN_RES, -90.0, 180.0)} AS qy,
                       COUNT(*) AS cnt
                FROM {geo_p} GROUP BY 1, 2),
            k AS (SELECT qx * {1 << DBSCAN_RES} + qy AS key, qx, qy, cnt
                  FROM c),
            seeds AS (SELECT key FROM k
                      ORDER BY cnt DESC, key LIMIT {VOR_NSEEDS}),
            e AS (SELECT a.key AS u, b.key AS v FROM k a JOIN k b
                  ON abs(a.qx - b.qx) <= 1 AND abs(a.qy - b.qy) <= 1
                 AND a.key <> b.key),
            r(key, cc) AS (
                SELECT key, key FROM seeds
                UNION
                SELECT e.v, r.cc + {int(VOR_SHIFT)}
                FROM r JOIN e ON e.u = r.key
                WHERE r.cc + {int(VOR_SHIFT)}
                      <= {VOR_HOPLIM * int(VOR_SHIFT) + int(VOR_SHIFT) - 1}),
            m AS (SELECT key, MIN(cc) AS cc FROM r GROUP BY 1)
            SELECT qx, qy, cnt, cc // {int(VOR_SHIFT)} AS hops,
                   (cc % {int(VOR_SHIFT)}) // {1 << DBSCAN_RES} AS seed_qx,
                   (cc % {int(VOR_SHIFT)}) % {1 << DBSCAN_RES} AS seed_qy
            FROM k JOIN m USING (key)""",
        "getis_ord_hotspots": f"""
            WITH c AS (
                SELECT {_grid_sql('lon', DBSCAN_RES, -180.0, 360.0)} AS qx,
                       {_grid_sql('lat', DBSCAN_RES, -90.0, 180.0)} AS qy,
                       COUNT(*) AS cnt
                FROM {geo_p} GROUP BY 1, 2),
            k0 AS (SELECT qx * {1 << DBSCAN_RES} + qy AS key, qx, qy, cnt
                   FROM c),
            st AS (SELECT COUNT(*) AS n, SUM(cnt) AS s,
                          SUM(cnt * cnt) AS s2 FROM k0),
            nb AS (SELECT a.key, CAST(SUM(b.cnt) AS BIGINT) AS nsum,
                          COUNT(*) AS k
                   FROM k0 a JOIN k0 b
                   ON abs(a.qx - b.qx) <= 1 AND abs(a.qy - b.qy) <= 1
                   GROUP BY a.key)
            SELECT a.qx, a.qy, a.cnt, nb.nsum, nb.k,
                   ROUND((CAST(nb.nsum AS DOUBLE)
                          - (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
                            * CAST(nb.k AS DOUBLE))
                         / (sqrt(CAST(st.s2 AS DOUBLE)
                                     / CAST(st.n AS DOUBLE)
                                 - (CAST(st.s AS DOUBLE)
                                        / CAST(st.n AS DOUBLE))
                                   * (CAST(st.s AS DOUBLE)
                                          / CAST(st.n AS DOUBLE)))
                            * sqrt((CAST(st.n AS DOUBLE)
                                        * CAST(nb.k AS DOUBLE)
                                    - CAST(nb.k AS DOUBLE)
                                        * CAST(nb.k AS DOUBLE))
                                   / (CAST(st.n AS DOUBLE) - 1.0))), 6)
                       AS z
            FROM k0 a JOIN nb ON nb.key = a.key CROSS JOIN st""",
        "way_segment_intersections": f"""
            WITH p AS (SELECT wn.way_id, wn.position,
                         CAST(floor(nd.lon * 10000000.0 + 0.5) AS BIGINT)
                             AS x,
                         CAST(floor(nd.lat * 10000000.0 + 0.5) AS BIGINT)
                             AS y
                       FROM {way_nodes_p} wn
                       JOIN {nodes_p} nd ON wn.node_id = nd.id),
            s0 AS (SELECT way_id, position, x AS x1, y AS y1,
                          LEAD(x) OVER w AS x2, LEAD(y) OVER w AS y2,
                          LEAD(position) OVER w AS p2
                   FROM p WINDOW w AS (PARTITION BY way_id
                                       ORDER BY position)),
            s AS (SELECT way_id, x1, y1, x2, y2 FROM s0
                  WHERE p2 = position + 1),
            d AS (SELECT a.way_id AS wa, b.way_id AS wb,
                    (a.x2-a.x1)*(b.y1-a.y1) - (a.y2-a.y1)*(b.x1-a.x1)
                        AS d1,
                    (a.x2-a.x1)*(b.y2-a.y1) - (a.y2-a.y1)*(b.x2-a.x1)
                        AS d2,
                    (b.x2-b.x1)*(a.y1-b.y1) - (b.y2-b.y1)*(a.x1-b.x1)
                        AS d3,
                    (b.x2-b.x1)*(a.y2-b.y1) - (b.y2-b.y1)*(a.x2-b.x1)
                        AS d4
                  FROM s a JOIN s b ON a.way_id < b.way_id)
            SELECT wa AS way_a, wb AS way_b, COUNT(*) AS n_crossings
            FROM d
            WHERE ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0))
              AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0))
            GROUP BY 1, 2""",
        "tpch_q21_waiting_suppliers": """
            WITH osl AS (
                SELECT l_orderkey, l_suppkey,
                       MAX(CASE WHEN epoch_us(l_shipdate)
                                     - epoch_us(o_orderdate)
                                     > 75::BIGINT * 86400000000
                                THEN 1 ELSE 0 END) AS slate
                FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                GROUP BY 1, 2),
            per AS (SELECT l_orderkey, COUNT(*) AS ns,
                           CAST(SUM(slate) AS BIGINT) AS nl
                    FROM osl GROUP BY 1)
            SELECT s_suppkey, s_name, numwait FROM (
                SELECT osl.l_suppkey AS s_suppkey, COUNT(*) AS numwait
                FROM osl
                JOIN per USING (l_orderkey)
                WHERE osl.slate = 1 AND per.ns >= 2 AND per.nl = 1
                GROUP BY 1)
            JOIN supplier USING (s_suppkey)
            ORDER BY numwait DESC, s_suppkey LIMIT 10""",
        # trajectory analytics: LAG window = the engine's in-bucket
        # consecutive-row adjacency after the same (ts, id) total order
        "user_edit_path_length": f"""
            WITH s AS (SELECT user, id, lon, lat, timestamp AS ts
                       FROM {nodes_p}),
            p AS (SELECT user, lon, lat,
                         LAG(lon) OVER w AS plon, LAG(lat) OVER w AS plat
                  FROM s WINDOW w AS (PARTITION BY user ORDER BY ts, id)),
            d AS (SELECT user,
                         2*6371008.8*asin(sqrt(LEAST(GREATEST(
                             sin((radians(lat)-radians(plat))/2)^2
                             + cos(radians(plat))*cos(radians(lat))
                             *sin((radians(lon)-radians(plon))/2)^2,
                             0.0), 1.0))) AS dm
                  FROM p WHERE plon IS NOT NULL)
            SELECT user, COUNT(*) AS n_hops,
                   CAST(SUM(CAST(floor(dm * 1000 + 0.5) AS BIGINT))
                        AS BIGINT) AS path_mm
            FROM d GROUP BY user""",
        "od_cell_flows": f"""
            WITH s AS (SELECT user, id, lon, lat, timestamp AS ts
                       FROM {nodes_p}),
            p AS (SELECT lon, lat,
                         LAG(lon) OVER w AS plon, LAG(lat) OVER w AS plat
                  FROM s WINDOW w AS (PARTITION BY user ORDER BY ts, id))
            SELECT {_grid_sql('plon', OD_RES, -180.0, 360.0)} AS from_x,
                   {_grid_sql('plat', OD_RES, -90.0, 180.0)} AS from_y,
                   {_grid_sql('lon', OD_RES, -180.0, 360.0)} AS to_x,
                   {_grid_sql('lat', OD_RES, -90.0, 180.0)} AS to_y,
                   COUNT(*) AS n_flows
            FROM p WHERE plon IS NOT NULL
            GROUP BY 1, 2, 3, 4""",
        # map matching: same clamped-projection float tree as the
        # nearest-boundary twin, ties broken by (d2, way_id)
        "snap_points_to_ways": f"""
            WITH pts AS (SELECT wn.way_id, wn.position, nd.lon, nd.lat
                         FROM {way_nodes_p} wn
                         JOIN {nodes_p} nd ON wn.node_id = nd.id),
            segs AS (SELECT a.way_id, a.lon AS x1, a.lat AS y1,
                            b.lon - a.lon AS dx, b.lat - a.lat AS dy,
                            (b.lon-a.lon)*(b.lon-a.lon)
                              + (b.lat-a.lat)*(b.lat-a.lat) AS len2
                     FROM pts a JOIN pts b ON a.way_id = b.way_id
                      AND b.position = a.position + 1
                     WHERE (b.lon-a.lon)*(b.lon-a.lon)
                             + (b.lat-a.lat)*(b.lat-a.lat) > 0),
            t AS (SELECT g.image_id AS id, s.way_id,
                         g.lon AS px, g.lat AS py, s.x1, s.y1, s.dx, s.dy,
                         LEAST(1.0, GREATEST(0.0,
                             ((g.lon - s.x1) * s.dx + (g.lat - s.y1) * s.dy)
                             * (1.0 / s.len2))) AS tt
                  FROM {geo_p} g CROSS JOIN segs s),
            d AS (SELECT id, way_id,
                         ((px - x1) - tt*dx) * ((px - x1) - tt*dx)
                       + ((py - y1) - tt*dy) * ((py - y1) - tt*dy) AS d2
                  FROM t),
            r AS (SELECT id, way_id, d2, ROW_NUMBER() OVER
                      (PARTITION BY id ORDER BY d2, way_id) AS rn
                  FROM d)
            SELECT id, way_id,
                   CAST(floor(sqrt(d2) * 1e9 + 0.5) AS BIGINT) AS d9
            FROM r WHERE rn = 1""",
        # DDA line burn: identical grid/step/parameter float trees
        "way_rasterize_cells": f"""
            WITH pts AS (SELECT wn.way_id, wn.position,
                                (nd.lon + 180.0) / 360.0
                                    * {1 << WAY_RASTER_RES}.0 AS gx,
                                (nd.lat + 90.0) / 180.0
                                    * {1 << WAY_RASTER_RES}.0 AS gy
                         FROM {way_nodes_p} wn
                         JOIN {nodes_p} nd ON wn.node_id = nd.id),
            st AS (SELECT a.way_id, a.gx AS gx1, a.gy AS gy1,
                          b.gx AS gx2, b.gy AS gy2,
                          GREATEST(CAST(ceil(GREATEST(abs(b.gx - a.gx),
                                                      abs(b.gy - a.gy)))
                                        AS BIGINT), 1) AS steps
                   FROM pts a JOIN pts b ON a.way_id = b.way_id
                    AND b.position = a.position + 1),
            e AS (SELECT way_id, gx1, gy1, gx2, gy2, steps,
                         unnest(generate_series(0, steps)) AS i FROM st),
            c AS (SELECT way_id,
                         LEAST(GREATEST(CAST(floor(gx1 + (gx2 - gx1)
                             * (CAST(i AS DOUBLE) / steps)) AS BIGINT), 0),
                             {(1 << WAY_RASTER_RES) - 1}) AS cx,
                         LEAST(GREATEST(CAST(floor(gy1 + (gy2 - gy1)
                             * (CAST(i AS DOUBLE) / steps)) AS BIGINT), 0),
                             {(1 << WAY_RASTER_RES) - 1}) AS cy
                  FROM e)
            SELECT DISTINCT way_id, cx, cy FROM c""",
        # Ripley banding over the same exact radius predicate as the
        # radius join; LEFT JOIN keeps empty bands at count 0
        "ripley_k_counts": f"""
            WITH d AS (SELECT CAST(floor({hav.replace(chr(10), ' ')}
                                 * 1000 + 0.5) AS BIGINT) AS mm
                       FROM {knn_p} a, {knn_p} b
                       WHERE a.image_id != b.image_id
                         AND {hav} <= {RIPLEY_MAX_M}),
            r AS (SELECT CAST(unnest([{', '.join(map(str, RIPLEY_RADII_MM))}])
                              AS BIGINT) AS r_mm)
            SELECT r.r_mm, COUNT(d.mm) AS n_pairs
            FROM r LEFT JOIN d ON d.mm <= r.r_mm GROUP BY 1""",
        # augmentation manifest: per-op output geometry is integer
        # arithmetic over (w, h); raw8 length == 3*w'*h' pins that real
        # bytes flowed; caption equality rides through
        "image_augment_manifest": f"""
            SELECT image_id, 'hflip' AS aug, w, h, 'raw8' AS fmt,
                   3 * CAST(w AS BIGINT) * h AS n_bytes, caption
            FROM {images_p}
            UNION ALL
            SELECT image_id, 'rot90', h, w, 'raw8',
                   3 * CAST(w AS BIGINT) * h, caption
            FROM {images_p}
            UNION ALL
            SELECT image_id, 'crop75',
                   CAST(CAST(w AS BIGINT) * 3 // 4 AS INTEGER),
                   CAST(CAST(h AS BIGINT) * 3 // 4 AS INTEGER), 'raw8',
                   3 * (CAST(w AS BIGINT) * 3 // 4)
                     * (CAST(h AS BIGINT) * 3 // 4), caption
            FROM {images_p}""",
        # time travel: v1 = the untouched base, v2 = the merged state
        "lancelike_time_travel_check": """
            WITH upd AS (
                SELECT o_orderkey, o_totalprice*2 AS o_totalprice,
                       'MERGED' AS o_orderpriority
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey + 100000000, o_totalprice, 'NEWROW'
                FROM orders WHERE o_orderkey % 13 = 0),
            v2 AS (
                SELECT o_orderpriority, o_totalprice FROM orders
                WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
                UNION ALL
                SELECT o_orderpriority, o_totalprice FROM upd),
            snaps AS (
                SELECT 'v1' AS snapshot, o_orderpriority, o_totalprice
                FROM orders
                UNION ALL
                SELECT 'v2', o_orderpriority, o_totalprice FROM v2)
            SELECT snapshot, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM snaps GROUP BY 1, 2""",
        "lancelike_delete_check": """
            SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders WHERE o_orderkey % 11 != 0
            GROUP BY o_orderstatus""",
        # gaps-and-islands stay segments: hop_no − ROW_NUMBER() labels
        # each maximal run of near hops; arg_min/arg_max anchor it
        "user_stay_segments": f"""
            WITH s AS (SELECT user, id, lon, lat,
                              ROW_NUMBER() OVER (PARTITION BY user
                                  ORDER BY timestamp, id) AS rn
                       FROM {nodes_p}),
            h AS (SELECT cur.user, prev.id AS pid, cur.id AS cid,
                         cur.rn AS hn,
                         CAST(floor(2*6371008.8*asin(sqrt(LEAST(GREATEST(
                             sin((radians(cur.lat)-radians(prev.lat))/2)^2
                             + cos(radians(prev.lat))*cos(radians(cur.lat))
                             *sin((radians(cur.lon)-radians(prev.lon))/2)^2,
                             0.0), 1.0))) * 1000 + 0.5) AS BIGINT) AS mm
                  FROM s cur JOIN s prev ON prev.user = cur.user
                   AND prev.rn = cur.rn - 1),
            n AS (SELECT user, pid, cid, hn,
                         hn - ROW_NUMBER() OVER (PARTITION BY user
                                                 ORDER BY hn) AS isl
                  FROM h WHERE mm <= {STAY_MM})
            SELECT user, arg_min(pid, hn) AS start_id,
                   arg_max(cid, hn) AS end_id,
                   COUNT(*) + 1 AS n_points
            FROM n GROUP BY user, isl""",
        # RAG chunking: DuckDB list_slice is 1-based/inclusive; the
        # engine's Arrow list_slice is 0-based/exclusive — same window
        # PII patterns spliced verbatim from functions.text.PII_PATTERNS
        # (both sides RE2); input expression mirrors the engine's inject
        "doc_pii_scrub": """
            WITH inp AS (SELECT doc_id,
                   text || ' Contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com or call 555-'
                        || lpad(CAST((doc_id*7919)%10000 AS VARCHAR),4,'0')
                        || ' from 10.' || CAST(doc_id%256 AS VARCHAR) || '.'
                        || CAST((doc_id*3)%256 AS VARCHAR) || '.'
                        || CAST((doc_id*5)%256 AS VARCHAR) || '.'
                        || CASE WHEN doc_id%3=0 THEN ' cc user' ||
                             CAST(doc_id AS VARCHAR) || 'b@example.org'
                           ELSE '' END AS t
                  FROM documents)
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t, '@EMAIL@')) AS BIGINT)
                       AS n_email,
                   CAST(len(regexp_extract_all(t, '@IP@')) AS BIGINT)
                       AS n_ip,
                   CAST(len(regexp_extract_all(t, '@PHONE@')) AS BIGINT)
                       AS n_phone,
                   regexp_replace(regexp_replace(regexp_replace(t,
                       '@EMAIL@', '<EMAIL>', 'g'),
                       '@IP@', '<IP>', 'g'),
                       '@PHONE@', '<PHONE>', 'g') AS clean_text
            FROM inp"""
        .replace("@EMAIL@", _PII_RE["email"]).replace("@IP@", _PII_RE["ip"])
        .replace("@PHONE@", _PII_RE["phone"]),
        "doc_chunk_windows": f"""
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(text, '\\S+') AS tk
                          FROM documents),
            c AS (SELECT doc_id, tk, len(tk) AS n FROM toks),
            e AS (SELECT doc_id, tk, n,
                         unnest(generate_series(0,
                             (n + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} - 1))
                             AS k
                  FROM c)
            SELECT doc_id, k AS chunk_no,
                   CAST(len(list_slice(tk, k*{CHUNK_STRIDE} + 1,
                                       k*{CHUNK_STRIDE} + {CHUNK_SIZE}))
                        AS BIGINT) AS n_tokens,
                   array_to_string(list_slice(tk, k*{CHUNK_STRIDE} + 1,
                                              k*{CHUNK_STRIDE} + {CHUNK_SIZE}),
                                   ' ') AS chunk_text
            FROM e""",
        "user_retention_cohorts": """
            WITH w AS (SELECT user_id,
                              epoch_us(ts) // 86400000000 AS wk
                       FROM events GROUP BY 1, 2),
            c AS (SELECT user_id, MIN(wk) AS cohort FROM w GROUP BY 1)
            SELECT c.cohort AS cohort_week,
                   w.wk - c.cohort AS week_offset,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM w JOIN c USING (user_id) GROUP BY 1, 2""",
    }
    # the auto-salted kNN must equal the unsalted oracle bit-for-bit
    o["knn_pairs_autosalt"] = o["knn_pairs"]
    # k-core: unroll exactly KCORE_ROUNDS peel rounds (peeling is
    # idempotent once converged; the engine raises if it needs more)
    _kc = [f"""e0 AS MATERIALIZED (SELECT a.image_id AS s, b.image_id AS t
                      FROM {knn_p} a, {knn_p} b
                      WHERE a.image_id != b.image_id
                        AND {hav} <= {RADIUS_M})"""]
    for i in range(KCORE_ROUNDS):
        _kc.append(f"d{i} AS MATERIALIZED (SELECT s, COUNT(*) AS c "
                   f"FROM e{i} GROUP BY s)")
        _kc.append(f"""e{i + 1} AS MATERIALIZED (SELECT e.s, e.t FROM e{i} e
                    JOIN d{i} da ON e.s = da.s AND da.c >= {KCORE_K}
                    JOIN d{i} db ON e.t = db.s AND db.c >= {KCORE_K})""")
    o["kcore_radius_graph"] = (
        "WITH " + ",\n".join(_kc)
        + f" SELECT s AS id, COUNT(*) AS deg FROM e{KCORE_ROUNDS} "
          f"GROUP BY s")

    # round-4 session-4: orientation / dispersion / buffer / simplification
    o["way_bearing_octants"] = f"""
        WITH pts AS (SELECT wn.way_id, wn.position, nd.lon, nd.lat
                     FROM {way_nodes_p} wn
                     JOIN {nodes_p} nd ON wn.node_id = nd.id),
        seg AS (SELECT b.lon - a.lon AS dx, b.lat - a.lat AS dy
                FROM pts a JOIN pts b ON a.way_id = b.way_id
                 AND b.position = a.position + 1
                WHERE b.lon - a.lon != 0 OR b.lat - a.lat != 0)
        SELECT CASE
            WHEN dy >= 0 AND dx > 0 AND dx >= dy THEN 0
            WHEN dy > 0 AND dx >= 0 AND dy > dx THEN 1
            WHEN dy > 0 AND dx < 0 AND dy >= -dx THEN 2
            WHEN dy >= 0 AND dx < 0 AND -dx > dy THEN 3
            WHEN dy < 0 AND dx < 0 AND -dx >= -dy THEN 4
            WHEN dy < 0 AND dx <= 0 AND -dy > -dx THEN 5
            WHEN dy < 0 AND dx > 0 AND -dy >= dx THEN 6
            ELSE 7 END AS octant,
            CAST(SUM(1) AS BIGINT) AS n_segments
        FROM seg GROUP BY 1"""
    o["user_radius_gyration"] = f"""
        WITH s AS (SELECT user,
                          CAST(floor(lon * 10000.0 + 0.5) AS BIGINT) AS x,
                          CAST(floor(lat * 10000.0 + 0.5) AS BIGINT) AS y
                   FROM {nodes_p}),
        c AS (SELECT user, x - MIN(x) OVER (PARTITION BY user) AS cx,
                     y - MIN(y) OVER (PARTITION BY user) AS cy FROM s),
        a AS (SELECT user, COUNT(*) AS n,
                     SUM(CAST(cx AS HUGEINT)) AS sx,
                     SUM(CAST(cy AS HUGEINT)) AS sy,
                     SUM(CAST(cx AS HUGEINT) * cx) AS sxx,
                     SUM(CAST(cy AS HUGEINT) * cy) AS syy
              FROM c GROUP BY user)
        SELECT user, CAST(n AS BIGINT) AS n_edits,
               CAST((CAST(n AS HUGEINT) * (sxx + syy) - sx*sx - sy*sy)
                    // (CAST(n AS HUGEINT) * n) AS BIGINT) AS rg2_e8
        FROM a"""
    _bn = (1 << BUFFER_RES) - 1
    o["cell_buffer_dilate"] = f"""
        WITH occ AS (SELECT DISTINCT
                 {_grid_sql('lon', BUFFER_RES, -180.0, 360.0)} AS qx,
                 {_grid_sql('lat', BUFFER_RES, -90.0, 180.0)} AS qy
                 FROM {geo_p})
        SELECT DISTINCT LEAST(GREATEST(qx + i, 0), {_bn}) AS qx,
               LEAST(GREATEST(qy + j, 0), {_bn}) AS qy
        FROM occ,
             UNNEST(generate_series(-{BUFFER_R}, {BUFFER_R})) AS gi(i),
             UNNEST(generate_series(-{BUFFER_R}, {BUFFER_R})) AS gj(j)"""
    o["way_simplify_onepass"] = f"""
        WITH pts AS (SELECT wn.way_id, wn.position, nd.lon, nd.lat
                     FROM {way_nodes_p} wn
                     JOIN {nodes_p} nd ON wn.node_id = nd.id),
        e AS (SELECT way_id, position,
                     CAST(floor(lon * 10000000.0 + 0.5) AS BIGINT) AS x,
                     CAST(floor(lat * 10000000.0 + 0.5) AS BIGINT) AS y
              FROM pts),
        t AS (SELECT way_id, x, y,
                     LAG(x) OVER w AS px, LAG(y) OVER w AS py,
                     LEAD(x) OVER w AS nx, LEAD(y) OVER w AS ny
              FROM e WINDOW w AS (PARTITION BY way_id ORDER BY position))
        SELECT way_id, CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE
                   WHEN px IS NULL OR nx IS NULL THEN 1
                   WHEN abs((x - px) * (ny - py) - (y - py) * (nx - px))
                        >= {SIMPLIFY_MIN_CROSS} THEN 1
                   ELSE 0 END) AS BIGINT) AS n_kept
        FROM t GROUP BY way_id"""
    o["cumulative_new_users"] = """
        WITH f AS (SELECT user_id,
                          MIN(epoch_us(ts) // 3600000000) AS hr
                   FROM events GROUP BY user_id),
        d AS (SELECT hr, COUNT(*) AS n_new FROM f GROUP BY hr)
        SELECT hr, CAST(n_new AS BIGINT) AS n_new,
               CAST(SUM(n_new) OVER (ORDER BY hr) AS BIGINT) AS cum_users
        FROM d"""
    o["doc_dup_ngram_counts"] = r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                      FROM documents),
        sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
               FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)),
        c AS (SELECT s, COUNT(*) AS ndocs FROM sh GROUP BY s)
        SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN c.ndocs >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup
        FROM sh JOIN c USING (s) GROUP BY sh.doc_id"""
    o["graph_degree_assortativity"] = f"""
        WITH e AS (SELECT a.image_id AS id, b.image_id AS nid
                   FROM {knn_p} a, {knn_p} b
                   WHERE a.image_id != b.image_id AND {hav} <= {RADIUS_M}),
        d AS (SELECT id, COUNT(*) AS deg FROM e GROUP BY id),
        j AS (SELECT CAST(da.deg AS HUGEINT) AS du,
                     CAST(db.deg AS HUGEINT) AS dv
              FROM e JOIN d da ON e.id = da.id JOIN d db ON e.nid = db.id),
        s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m, SUM(du) AS su,
                     SUM(dv) AS sv, SUM(du*dv) AS suv,
                     SUM(du*du) AS su2, SUM(dv*dv) AS sv2 FROM j),
        f AS (SELECT m, su, suv, su2,
                     m*su2 - su*su AS dena, m*sv2 - sv*sv AS denb,
                     m*suv - su*sv AS num FROM s)
        SELECT CAST(m AS BIGINT) AS n_edges, CAST(su AS BIGINT) AS s_du,
               CAST(suv AS BIGINT) AS s_dudv, CAST(su2 AS BIGINT) AS s_du2,
               CAST(floor(CAST(num AS DOUBLE)
                    / sqrt(CAST(dena AS DOUBLE) * CAST(denb AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) AS r_e6
        FROM f WHERE dena > 0 AND denb > 0"""
    o["lancelike_vacuum_check"] = o["lancelike_merge_upsert_check"]
    # MoR upsert is pinned result-equivalent to the CoW merge: same
    # update batch, same relational twin
    o["lancelike_merge_upsert_mor_check"] = o["lancelike_merge_upsert_check"]
    o["nn_distance_stats"] = f"""
        WITH nn AS (SELECT a.image_id AS id,
                           CAST(floor({hav} * 1000.0 + 0.5) AS BIGINT) AS mm,
                           ROW_NUMBER() OVER (PARTITION BY a.image_id
                               ORDER BY {hav}, b.image_id) AS rn
                    FROM {knn_p} a, {knn_p} b
                    WHERE a.image_id != b.image_id)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(mm) AS BIGINT) AS sum_nn_mm,
               MIN(mm) AS min_nn_mm, MAX(mm) AS max_nn_mm
        FROM nn WHERE rn = 1"""
    o["corpus_filter_funnel"] = r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                      FROM documents),
        bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS b
               FROM toks, UNNEST(generate_series(1, len(t)-1)) AS g(i)),
        bgtop AS (SELECT doc_id, MAX(c) AS topc, SUM(c) AS tot FROM
                  (SELECT doc_id, b, COUNT(*) AS c FROM bg
                   GROUP BY doc_id, b) GROUP BY doc_id),
        r AS (SELECT len(k.t) AS n,
                     ROUND(len(list_distinct(k.t)) * 1.0 / len(k.t), 6)
                       AS dr,
                     ROUND(COALESCE(g.topc * 1.0 / g.tot, 0.0), 6) AS bf
              FROM toks k LEFT JOIN bgtop g USING (doc_id))
        SELECT 's0_total' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM r
        UNION ALL SELECT 's1_min_len',
            CAST(SUM(CASE WHEN n >= 30 THEN 1 ELSE 0 END) AS BIGINT)
        FROM r
        UNION ALL SELECT 's2_distinct_ratio',
            CAST(SUM(CASE WHEN n >= 30 AND dr IS NOT NULL AND dr >= 0.45
                     THEN 1 ELSE 0 END) AS BIGINT)
        FROM r
        UNION ALL SELECT 's3_repetition',
            CAST(SUM(CASE WHEN n >= 30 AND dr IS NOT NULL AND dr >= 0.45
                          AND bf <= 0.04 THEN 1 ELSE 0 END) AS BIGINT)
        FROM r"""
    o["way_sinuosity"] = f"""
        WITH pts AS (SELECT wn.way_id, wn.position, nd.lon, nd.lat
                     FROM {way_nodes_p} wn
                     JOIN {nodes_p} nd ON wn.node_id = nd.id),
        hop AS (SELECT a.way_id,
                       CAST(floor({hav} * 1000.0 + 0.5) AS BIGINT) AS mm
                FROM pts a JOIN pts b ON a.way_id = b.way_id
                 AND b.position = a.position + 1),
        path AS (SELECT way_id, CAST(SUM(mm) AS BIGINT) AS path_mm
                 FROM hop GROUP BY way_id),
        ends AS (SELECT way_id,
                        arg_min(lon, position) AS flon,
                        arg_min(lat, position) AS flat,
                        arg_max(lon, position) AS llon,
                        arg_max(lat, position) AS llat
                 FROM pts GROUP BY way_id),
        chord AS (SELECT way_id,
                         CAST(floor(2*6371008.8*asin(sqrt(LEAST(GREATEST(
                             sin((radians(llat)-radians(flat))/2)^2
                             + cos(radians(flat))*cos(radians(llat))
                             *sin((radians(llon)-radians(flon))/2)^2,
                             0.0), 1.0))) * 1000.0 + 0.5) AS BIGINT)
                             AS chord_mm
                  FROM ends)
        SELECT p.way_id, p.path_mm, c.chord_mm,
               CAST(floor(CAST(p.path_mm AS DOUBLE)
                    / CAST(c.chord_mm AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS sinuosity_e6
        FROM path p JOIN chord c USING (way_id) WHERE c.chord_mm > 0"""
    o["churned_users"] = """
        WITH l AS (SELECT user_id, MAX(epoch_us(ts)) AS last_us
                   FROM events GROUP BY user_id),
        m AS (SELECT MAX(last_us) AS gmax FROM l)
        SELECT CAST(SUM(CASE WHEN l.last_us < m.gmax - 604800000000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
               CAST(SUM(CASE WHEN l.last_us >= m.gmax - 604800000000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_active
        FROM l, m"""
    o["graph_clustering_coefficient"] = f"""
        WITH knn AS (
          SELECT id, neighbor_id FROM (
            SELECT a.image_id AS id, b.image_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY a.image_id
                     ORDER BY {hav}, b.image_id) AS rn
            FROM {knn_p} a, {knn_p} b
            WHERE a.image_id != b.image_id)
          WHERE rn <= {KNN_K}),
        e AS (SELECT DISTINCT LEAST(id, neighbor_id) AS a,
                     GREATEST(id, neighbor_id) AS b FROM knn),
        tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
                FROM e e1 JOIN e e2 ON e2.a = e1.b
                          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        deg AS (SELECT node, COUNT(*) AS d FROM (
                  SELECT a AS node FROM e
                  UNION ALL SELECT b AS node FROM e) GROUP BY node),
        w AS (SELECT CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
              FROM deg)
        SELECT t.n_triangles, w.n_wedges,
               CAST(floor(CAST(3 * t.n_triangles AS DOUBLE)
                    / CAST(w.n_wedges AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS global_cc_e6
        FROM tri t, w WHERE w.n_wedges > 0"""
    o["hourly_anomaly_hours"] = """
        WITH c AS (SELECT event_type,
                          epoch_us(ts) // 3600000000 AS hour_idx,
                          COUNT(*) AS cnt
                   FROM events GROUP BY 1, 2),
        s AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS h,
                     SUM(CAST(cnt AS HUGEINT)) AS t,
                     SUM(CAST(cnt AS HUGEINT) * cnt) AS ss
              FROM c GROUP BY event_type)
        SELECT c.event_type, c.hour_idx, CAST(c.cnt AS BIGINT) AS cnt
        FROM c JOIN s USING (event_type)
        WHERE (c.cnt * s.h - s.t) * (c.cnt * s.h - s.t)
              > 4 * (s.ss * s.h - s.t * s.t)"""
    o["lancelike_add_column_check"] = """
        WITH b AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents FROM orders)
        SELECT cents // 5000000 AS price_band,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM b GROUP BY 1"""
    o["top_next_token"] = r"""
        WITH toks AS (SELECT regexp_extract_all(text, '\S+') AS t
                      FROM documents),
        bg AS (SELECT t[i] AS w1, t[i+1] AS w2
               FROM toks, UNNEST(generate_series(1, len(t)-1)) AS g(i)),
        bc AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        r AS (SELECT w1, w2, c, ROW_NUMBER() OVER
                  (PARTITION BY w1 ORDER BY c DESC, w2) AS rn FROM bc)
        SELECT w1, w2, CAST(c AS BIGINT) AS c FROM r WHERE rn <= 3"""
    _terms = ", ".join(f"len(list_filter(t, x -> x = '{q}')) AS c{i}"
                       for i, q in enumerate(SEARCH_TOKENS))
    _sum = " + ".join(f"c{i}" for i in range(len(SEARCH_TOKENS)))
    _all = " AND ".join(f"c{i} > 0" for i in range(len(SEARCH_TOKENS)))
    o["doc_keyword_and_search"] = rf"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                      FROM documents),
        m AS (SELECT doc_id, {_terms} FROM toks)
        SELECT doc_id, CAST({_sum} AS BIGINT) AS n_occurrences
        FROM m WHERE {_all}"""
    o["cell_amenity_diversity"] = f"""
        WITH a AS (SELECT t.value, n.lon, n.lat
                   FROM {tags_p} t JOIN {nodes_p} n ON t.elem_id = n.id
                   WHERE t.key = 'amenity'),
        c AS (SELECT {_grid_sql('lon', TILE_RES, -180.0, 360.0)} AS qx,
                     {_grid_sql('lat', TILE_RES, -90.0, 180.0)} AS qy,
                     value FROM a)
        SELECT qx, qy, CAST(COUNT(DISTINCT value) AS BIGINT) AS n_kinds
        FROM c GROUP BY qx, qy HAVING COUNT(DISTINCT value) >= 2"""
    o["cell_edit_delta"] = f"""
        WITH s AS (SELECT lon, lat,
                          CAST(epoch_us(timestamp) AS BIGINT) AS us
                   FROM {nodes_p}),
        m AS (SELECT (MIN(us) + MAX(us)) // 2 AS cutoff FROM s),
        c AS (SELECT {_grid_sql('lon', OD_RES, -180.0, 360.0)} AS qx,
                     {_grid_sql('lat', OD_RES, -90.0, 180.0)} AS qy,
                     CASE WHEN us <= m.cutoff THEN 1 ELSE 0 END AS e
              FROM s CROSS JOIN m)
        SELECT qx, qy, CAST(SUM(e) AS BIGINT) AS n_early,
               CAST(SUM(1 - e) AS BIGINT) AS n_late,
               CAST(SUM(1 - e) - SUM(e) AS BIGINT) AS delta
        FROM c GROUP BY qx, qy"""
    o["fuzzy_street_pairs"] = f"""
        WITH v AS (SELECT DISTINCT value FROM {tags_p}
                   WHERE key = 'addr:street')
        SELECT a.value AS name_a, b.value AS name_b
        FROM v a JOIN v b ON a.value < b.value
        WHERE levenshtein(a.value, b.value) = 1"""
    o["way_self_intersections"] = f"""
        WITH pts AS (SELECT wn.way_id, wn.position,
                            nd.lon AS x, nd.lat AS y
                     FROM {way_nodes_p} wn
                     JOIN {nodes_p} nd ON wn.node_id = nd.id),
        segs AS (SELECT a.way_id, a.position AS sp, a.x AS x1, a.y AS y1,
                        b.x AS x2, b.y AS y2
                 FROM pts a JOIN pts b ON a.way_id = b.way_id
                  AND b.position = a.position + 1)
        SELECT s.way_id, CAST(COUNT(*) AS BIGINT) AS n_self_crossings
        FROM segs s JOIN segs e ON s.way_id = e.way_id
         AND e.sp >= s.sp + 2
        WHERE ((s.x2-s.x1)*(e.y1-s.y1) - (s.y2-s.y1)*(e.x1-s.x1))
            * ((s.x2-s.x1)*(e.y2-s.y1) - (s.y2-s.y1)*(e.x2-s.x1)) < 0
          AND ((e.x2-e.x1)*(s.y1-e.y1) - (e.y2-e.y1)*(s.x1-e.x1))
            * ((e.x2-e.x1)*(s.y2-e.y1) - (e.y2-e.y1)*(s.x2-e.x1)) < 0
        GROUP BY s.way_id"""
    o["user_activity_gini"] = """
        WITH c AS (SELECT user_id, COUNT(*) AS x FROM events
                   GROUP BY user_id),
        r AS (SELECT CAST(x AS HUGEINT) AS x,
                     CAST(ROW_NUMBER() OVER (ORDER BY x, user_id)
                          AS HUGEINT) AS i,
                     CAST(COUNT(*) OVER () AS HUGEINT) AS n,
                     CAST(SUM(x) OVER () AS HUGEINT) AS t FROM c)
        SELECT CAST(MAX(n) AS BIGINT) AS n_users,
               CAST(MAX(t) AS BIGINT) AS total_events,
               CAST(SUM((2*i - n - 1) * x) AS BIGINT) AS gini_num,
               CAST(floor(CAST(SUM((2*i - n - 1) * x) AS DOUBLE)
                    / CAST(MAX(n) * MAX(t) AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS gini_e6
        FROM r"""
    _avals = ", ".join(f"({i}, {a[0]}, {a[1]})"
                       for i, a in enumerate(ANCHORS))
    o["anchor_nearest_points"] = f"""
        WITH a AS (SELECT * FROM (VALUES {_avals})
                   AS t(anchor_id, alon, alat)),
        d AS (SELECT a.anchor_id, g.image_id,
                     CAST(floor(2*6371008.8*asin(sqrt(LEAST(GREATEST(
                         sin((radians(g.lat)-radians(a.alat))/2)^2
                         + cos(radians(a.alat))*cos(radians(g.lat))
                         *sin((radians(g.lon)-radians(a.alon))/2)^2,
                         0.0), 1.0))) * 1000.0 + 0.5) AS BIGINT) AS d_mm
              FROM a CROSS JOIN {knn_p} g),
        r AS (SELECT anchor_id, image_id, d_mm, ROW_NUMBER() OVER
                  (PARTITION BY anchor_id ORDER BY d_mm, image_id) AS rn
              FROM d)
        SELECT anchor_id, image_id, d_mm FROM r WHERE rn <= 5"""
    o["user_longest_streak"] = """
        WITH d AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 86400000000 AS day FROM events),
        r AS (SELECT user_id, day,
                     day - ROW_NUMBER() OVER (PARTITION BY user_id
                                              ORDER BY day) AS isl
              FROM d),
        runs AS (SELECT user_id, isl, COUNT(*) AS run FROM r GROUP BY 1, 2)
        SELECT user_id, CAST(MAX(run) AS BIGINT) AS longest_streak
        FROM runs GROUP BY user_id HAVING MAX(run) >= 2"""
    _ghq = ("LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 32768.0) "
            "AS BIGINT), 0), 32767)")
    _ghr = ("LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 32768.0) "
            "AS BIGINT), 0), 32767)")
    _terms = " + ".join(
        [f"(((qlon >> {i}) & 1) << {2 * i + 1})" for i in range(15)]
        + [f"(((qlat >> {i}) & 1) << {2 * i})" for i in range(15)])
    _alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    _chars = " || ".join(
        f"substr('{_alpha}', CAST(((v >> {25 - 5 * k}) & 31) AS INTEGER)"
        f" + 1, 1)" for k in range(6))
    o["geohash_cells"] = f"""
        WITH q AS (SELECT image_id, {_ghq} AS qlon, {_ghr} AS qlat
                   FROM {knn_p}),
        iv AS (SELECT image_id, {_terms} AS v FROM q)
        SELECT image_id, {_chars} AS gh6 FROM iv"""
    o["way_orientation_entropy"] = f"""
        WITH pts AS (SELECT wn.way_id, wn.position, nd.lon, nd.lat
                     FROM {way_nodes_p} wn
                     JOIN {nodes_p} nd ON wn.node_id = nd.id),
        seg AS (SELECT a.way_id, b.lon - a.lon AS dx, b.lat - a.lat AS dy
                FROM pts a JOIN pts b ON a.way_id = b.way_id
                 AND b.position = a.position + 1
                WHERE b.lon - a.lon != 0 OR b.lat - a.lat != 0),
        oc AS (SELECT way_id, CASE
                   WHEN dy >= 0 AND dx > 0 AND dx >= dy THEN 0
                   WHEN dy > 0 AND dx >= 0 AND dy > dx THEN 1
                   WHEN dy > 0 AND dx < 0 AND dy >= -dx THEN 2
                   WHEN dy >= 0 AND dx < 0 AND -dx > dy THEN 3
                   WHEN dy < 0 AND dx < 0 AND -dx >= -dy THEN 4
                   WHEN dy < 0 AND dx <= 0 AND -dy > -dx THEN 5
                   WHEN dy < 0 AND dx > 0 AND -dy >= dx THEN 6
                   ELSE 7 END AS octant
               FROM seg),
        c AS (SELECT way_id, octant, COUNT(*) AS cnt FROM oc
              GROUP BY 1, 2),
        n AS (SELECT way_id, CAST(SUM(cnt) AS BIGINT) AS n FROM c
              GROUP BY 1),
        l AS (SELECT c.way_id, n.n,
                     list(CAST(c.cnt AS DOUBLE) / n.n
                          ORDER BY c.octant) AS ps
              FROM c JOIN n USING (way_id) GROUP BY c.way_id, n.n)
        SELECT way_id, n AS n_segments,
               CAST(floor(-(list_sum(list_transform(ps, p -> p * ln(p))))
                          * 1e6 + 0.5) AS BIGINT) AS entropy_e6
        FROM l"""
    o["lancelike_mor_delete_check"] = o["lancelike_delete_check"]
    def _hilbert_sql(src: str, idc: str) -> str:
        """Unrolled Hilbert xy->d twin over a point source (8 rounds of
        the same rotate/reflect integer steps as geo.hilbert_d)."""
        hx = _grid_sql("lon", HILBERT_ORDER, -180.0, 360.0)
        hy = _grid_sql("lat", HILBERT_ORDER, -90.0, 180.0)
        parts = [f"h0 AS (SELECT {idc}, {hx} AS x, {hy} AS y, 0 AS d "
                 f"FROM {src})"]
        for k in range(HILBERT_ORDER):
            st = 1 << (HILBERT_ORDER - 1 - k)
            parts.append(f"""h{k + 1} AS MATERIALIZED (
          SELECT {idc}, d + {st * st}::BIGINT * xor(3 * rx, ry) AS d,
                 CASE WHEN ry = 0 THEN CASE WHEN rx = 1
                      THEN {st} - 1 - y ELSE y END ELSE x END AS x,
                 CASE WHEN ry = 0 THEN CASE WHEN rx = 1
                      THEN {st} - 1 - x ELSE x END ELSE y END AS y
          FROM (SELECT {idc}, d, x, y,
                       CASE WHEN (x & {st}) > 0 THEN 1 ELSE 0 END AS rx,
                       CASE WHEN (y & {st}) > 0 THEN 1 ELSE 0 END AS ry
                FROM h{k}))""")
        return "WITH " + ",\n".join(parts)

    _uhx = _grid_sql("lon", OD_RES, -180.0, 360.0)
    _uhy = _grid_sql("lat", OD_RES, -90.0, 180.0)
    o["user_home_cells"] = f"""
        WITH c AS (SELECT uid, {_uhx} AS qx, {_uhy} AS qy,
                          CAST(COUNT(*) AS BIGINT) AS cnt
                   FROM {nodes_p} GROUP BY 1, 2, 3),
        r AS (SELECT uid, qx, qy, cnt,
                     ROW_NUMBER() OVER (PARTITION BY uid
                                        ORDER BY cnt DESC, qx, qy) AS rn
              FROM c)
        SELECT uid, qx, qy, cnt FROM r WHERE rn = 1"""
    o["phash_bit_stats"] = f"""
        WITH b AS (SELECT unnest(generate_series(0, 63)) AS bit)
        SELECT b.bit, CAST(SUM((i.phash >> b.bit) & 1) AS BIGINT)
                   AS n_set
        FROM {images_p} i CROSS JOIN b GROUP BY b.bit"""
    o["lancelike_tag_vacuum_check"] = """
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_orderstatus"""
    _ckx = _grid_sql("g.lon", TILE_RES, -180.0, 360.0)
    _cky = _grid_sql("g.lat", TILE_RES, -90.0, 180.0)
    o["caption_keyword_cells"] = rf"""
        WITH hit AS (SELECT image_id FROM {images_p}
                     WHERE len(list_filter(
                         regexp_extract_all(caption, '\S+'),
                         x -> x = 'food')) > 0)
        SELECT {_ckx} AS qx, {_cky} AS qy,
               CAST(COUNT(*) AS BIGINT) AS n_images
        FROM hit JOIN {geo_p} g USING (image_id)
        GROUP BY 1, 2"""
    _avals2 = ", ".join(f"({i}, {a[0]}, {a[1]})"
                        for i, a in enumerate(ANCHORS))
    _kx = _grid_sql("p.lon", TILE_RES, -180.0, 360.0)
    _ky = _grid_sql("p.lat", TILE_RES, -90.0, 180.0)
    _kax = _grid_sql("a.alon", TILE_RES, -180.0, 360.0)
    _kay = _grid_sql("a.alat", TILE_RES, -90.0, 180.0)
    o["cell_kring_counts"] = f"""
        WITH a AS (SELECT * FROM (VALUES {_avals2})
                   AS t(anchor_id, alon, alat)),
        r AS (SELECT a.anchor_id,
                     GREATEST(ABS({_kx} - {_kax}),
                              ABS({_ky} - {_kay})) AS ring
              FROM {knn_p} p CROSS JOIN a)
        SELECT CAST(anchor_id AS BIGINT) AS anchor_id, ring,
               CAST(COUNT(*) AS BIGINT) AS n_points
        FROM r WHERE ring <= {KRING_K} GROUP BY 1, 2"""
    o["events_sliding_distinct_users"] = """
        WITH e AS (SELECT CAST(epoch_us(ts) AS BIGINT) // 900000000 AS q15,
                          user_id FROM events),
        w AS (SELECT q15 - unnest(generate_series(0, 3)) AS win, user_id
              FROM e)
        SELECT win, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM w GROUP BY win"""
    o["lancelike_column_stats_check"] = """
        SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
               CAST(MIN(o_orderkey) AS BIGINT) AS min_v,
               CAST(MAX(o_orderkey) AS BIGINT) AS max_v FROM orders
        UNION ALL
        SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
               CAST(MIN(o_custkey) AS BIGINT),
               CAST(MAX(o_custkey) AS BIGINT) FROM orders
"""
    o["way_segmentize_points"] = f"""
        WITH pts AS (SELECT wn.way_id, wn.position, nd.lon, nd.lat
                     FROM {way_nodes_p} wn
                     JOIN {nodes_p} nd ON wn.node_id = nd.id),
        seg AS (SELECT a.way_id, a.position AS sp,
                       a.lon AS x1, a.lat AS y1, b.lon AS x2, b.lat AS y2,
                       sqrt((b.lon - a.lon) * (b.lon - a.lon)
                            + (b.lat - a.lat) * (b.lat - a.lat)) AS ln
                FROM pts a JOIN pts b ON a.way_id = b.way_id
                 AND b.position = a.position + 1),
        ks AS (SELECT way_id, sp, x1, y1, x2, y2, ln,
                      unnest(generate_series(0,
                          CAST(floor(ln / {SEGMENTIZE_D}) AS BIGINT))) AS k
               FROM seg WHERE ln > 0)
        SELECT way_id, sp, k,
               CAST(floor((x1 + ((k * {SEGMENTIZE_D}) / ln) * (x2 - x1))
                          * 1e7 + 0.5) AS BIGINT) AS x7,
               CAST(floor((y1 + ((k * {SEGMENTIZE_D}) / ln) * (y2 - y1))
                          * 1e7 + 0.5) AS BIGINT) AS y7
        FROM ks"""
    o["way_direction_reversals"] = f"""
        WITH pts AS (SELECT wn.way_id, wn.position,
                            CAST(floor(nd.lon * 1e7 + 0.5) AS BIGINT) AS x,
                            CAST(floor(nd.lat * 1e7 + 0.5) AS BIGINT) AS y
                     FROM {way_nodes_p} wn
                     JOIN {nodes_p} nd ON wn.node_id = nd.id),
        d AS (SELECT way_id, position, x - LAG(x) OVER w AS dx,
                     y - LAG(y) OVER w AS dy,
                     LEAD(x) OVER w - x AS nx, LEAD(y) OVER w - y AS ny
              FROM pts WINDOW w AS (PARTITION BY way_id
                                    ORDER BY position)),
        c AS (SELECT way_id,
                     CAST(SUM(CASE WHEN dx * nx + dy * ny < 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_reversals
              FROM d WHERE dx IS NOT NULL AND nx IS NOT NULL
              GROUP BY way_id),
        nv AS (SELECT way_id, COUNT(*) AS n FROM pts GROUP BY way_id)
        SELECT c.way_id, c.n_reversals FROM c
        JOIN nv ON nv.way_id = c.way_id WHERE nv.n >= 3"""
    o["reverse_geocode_points"] = f"""
        WITH ins AS (
          SELECT g.image_id, e.polygon_id
          FROM {geo_p} g JOIN {edges_p} e
            ON ((e.y1 <= g.lat) != (e.y2 <= g.lat)
                AND g.lon < e.x1
                    + (g.lat - e.y1)/(e.y2 - e.y1)*(e.x2 - e.x1))
          GROUP BY g.image_id, e.polygon_id
          HAVING COUNT(*) % 2 = 1),
        insmin AS (SELECT image_id AS id, MIN(polygon_id) AS polygon_id
                   FROM ins GROUP BY 1),
        e AS (SELECT polygon_id, x1, y1, x2 - x1 AS dx, y2 - y1 AS dy,
                     (x2-x1)*(x2-x1) + (y2-y1)*(y2-y1) AS len2
              FROM {edges_p}),
        t AS (SELECT g.image_id, g.lon AS px, g.lat AS py, e.polygon_id,
                     e.x1, e.y1, e.dx, e.dy,
                     LEAST(1.0, GREATEST(0.0,
                         ((g.lon - e.x1) * e.dx + (g.lat - e.y1) * e.dy)
                         / e.len2)) AS tt
              FROM {geo_p} g CROSS JOIN e),
        pd AS (SELECT image_id, polygon_id,
                      MIN((px - (x1 + tt*dx)) * (px - (x1 + tt*dx))
                        + (py - (y1 + tt*dy)) * (py - (y1 + tt*dy)))
                          AS d2
               FROM t GROUP BY 1, 2),
        pick AS (SELECT image_id AS id, polygon_id,
                        ROW_NUMBER() OVER (PARTITION BY image_id
                                           ORDER BY d2, polygon_id) AS rn
                 FROM pd)
        SELECT id, polygon_id, 'inside' AS method FROM insmin
        UNION ALL
        SELECT p.id, p.polygon_id, 'nearest' AS method FROM pick p
        WHERE p.rn = 1 AND p.id NOT IN (SELECT id FROM insmin)"""
    o["hilbert_cells"] = _hilbert_sql(knn_p, "image_id") + f"""
        SELECT image_id, CAST(d AS BIGINT) AS hd
        FROM h{HILBERT_ORDER}"""
    o["lancelike_hilbert_cluster_scan"] = _hilbert_sql(geo_p, "image_id") \
        + f"""
        SELECT image_id, CAST(d AS BIGINT) AS hd FROM h{HILBERT_ORDER}
        WHERE d BETWEEN {HILBERT_SCAN_RANGE[0]} AND {HILBERT_SCAN_RANGE[1]}"""
    o["user_out_of_order_events"] = """
        WITH s AS (SELECT user_id, event_id,
                          CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
        m AS (SELECT user_id, us,
                     MAX(us) OVER (PARTITION BY user_id ORDER BY event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) AS pm
              FROM s)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN us < pm THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_out_of_order
        FROM m GROUP BY user_id"""
    o["user_value_ewma"] = """
        WITH s AS (SELECT user_id, event_id, ts,
                          CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v6
                   FROM events)
        SELECT user_id, event_id,
               CAST(v6 * 128 + COALESCE(LAG(v6, 1) OVER win, 0) * 64 + COALESCE(LAG(v6, 2) OVER win, 0) * 32 + COALESCE(LAG(v6, 3) OVER win, 0) * 16 + COALESCE(LAG(v6, 4) OVER win, 0) * 8 + COALESCE(LAG(v6, 5) OVER win, 0) * 4 + COALESCE(LAG(v6, 6) OVER win, 0) * 2 + COALESCE(LAG(v6, 7) OVER win, 0) * 1 AS BIGINT) AS ewma256_e6
        FROM s WINDOW win AS (PARTITION BY user_id
                              ORDER BY ts, event_id)"""
    o["doc_ngram_novelty"] = r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                      FROM documents),
        tg AS (SELECT DISTINCT doc_id,
                      t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
               FROM toks, UNNEST(generate_series(1, len(t)-2)) AS s(i)),
        own AS (SELECT g, MIN(doc_id) AS doc_id FROM tg GROUP BY g)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
        FROM own GROUP BY doc_id"""
    o["cms_user_counts_check"] = _SM64_MACROS + """
        WITH j AS (SELECT unnest(generate_series(0, 3)) AS row_j),
        h AS (SELECT j.row_j,
                     CAST(sm64(xor(CAST(e.user_id AS UBIGINT),
                                   CAST(j.row_j AS UBIGINT))) & 1023
                          AS BIGINT) AS bucket
              FROM events e CROSS JOIN j)
        SELECT CAST(row_j AS BIGINT) AS row_j, bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM h GROUP BY 1, 2"""
    o["kmv_distinct_check"] = _SM64_MACROS + """
        WITH d AS (SELECT DISTINCT
                       CAST(sm64(CAST(user_id AS UBIGINT)) >> 1
                            AS BIGINT) AS h63
                   FROM events),
        r AS (SELECT h63, ROW_NUMBER() OVER (ORDER BY h63) AS rnk FROM d)
        SELECT CAST(rnk AS BIGINT) AS rank, h63 FROM r WHERE rnk <= 256"""
    o["doc_lm_scores"] = r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                      FROM documents),
        bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
               FROM toks, UNNEST(generate_series(1, len(t)-1)) AS g(i)),
        bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb
               FROM bg GROUP BY 1, 2),
        hc AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS ch
               FROM bc GROUP BY 1),
        v AS (SELECT COUNT(DISTINCT tok) AS nv
              FROM (SELECT unnest(t) AS tok FROM toks)),
        sc AS (SELECT g.doc_id,
                      CAST(floor(ln((bc.cb + 1.0) / (hc.ch + v.nv))
                                 * 1e6) AS BIGINT) AS lp
               FROM bg g JOIN bc USING (w1, w2) JOIN hc USING (w1)
               CROSS JOIN v)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(lp) AS BIGINT) AS logprob_e6
        FROM sc GROUP BY doc_id"""
    _bmq = []
    for _qi, _qt in enumerate(SEARCH_TOKENS):
        _bmq.append(
            f"ln((st.n - df.df{_qi} + 0.5) / (df.df{_qi} + 0.5) + 1.0)"
            f" * (m.tf{_qi} * (1.2 + 1.0))"
            f" / (m.tf{_qi} + 1.2 * (1.0 - 0.75 + 0.75 * m.dl / st.avgl))")
    _bm_tfs = ", ".join(
        f"CAST(len(list_filter(t, x -> x = '{qt}')) AS BIGINT) AS tf{qi}"
        for qi, qt in enumerate(SEARCH_TOKENS))
    _bm_dfs = ", ".join(
        f"CAST(SUM(CASE WHEN tf{qi} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df{qi}" for qi in range(len(SEARCH_TOKENS)))
    _bm_any = " OR ".join(f"m.tf{qi} > 0"
                          for qi in range(len(SEARCH_TOKENS)))
    o["doc_bm25_topk"] = rf"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                      FROM documents),
        m AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, {_bm_tfs}
              FROM toks),
        st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgl
               FROM m),
        df AS (SELECT {_bm_dfs} FROM m)
        SELECT m.doc_id,
               CAST(floor(({' + '.join(_bmq)}) * 1e6) AS BIGINT)
                   AS bm25_e6
        FROM m, st, df WHERE {_bm_any}
        ORDER BY bm25_e6 DESC, m.doc_id LIMIT 20"""
    o["way_hausdorff_pairs"] = f"""
        WITH pts AS (
          SELECT wn.way_id,
                 CAST(floor(nd.lon * 1e7 + 0.5) AS BIGINT) AS x,
                 CAST(floor(nd.lat * 1e7 + 0.5) AS BIGINT) AS y
          FROM {way_nodes_p} wn JOIN {nodes_p} nd ON wn.node_id = nd.id),
        dmin AS (
          SELECT a.way_id AS wa, b.way_id AS wb, a.x, a.y,
                 MIN((a.x - b.x) * (a.x - b.x)
                     + (a.y - b.y) * (a.y - b.y)) AS md
          FROM pts a JOIN pts b ON a.way_id != b.way_id
          GROUP BY a.way_id, b.way_id, a.x, a.y),
        dirmax AS (
          SELECT wa, wb, MAX(md) AS h FROM dmin GROUP BY wa, wb),
        sym AS (
          SELECT LEAST(wa, wb) AS way_a, GREATEST(wa, wb) AS way_b,
                 MAX(h) AS haus_d2
          FROM dirmax GROUP BY 1, 2)
        SELECT way_a, way_b, CAST(haus_d2 AS BIGINT) AS haus_d2
        FROM sym WHERE haus_d2 <= {HAUS_D2_MAX}"""
    _pfn = float(1 << POLYFILL_RES)
    o["polygon_polyfill_cells"] = f"""
        WITH bb AS (
          SELECT polygon_id,
                 MIN(LEAST(x1, x2)) AS mnx, MAX(GREATEST(x1, x2)) AS mxx,
                 MIN(LEAST(y1, y2)) AS mny, MAX(GREATEST(y1, y2)) AS mxy
          FROM {edges_p} GROUP BY polygon_id),
        q AS (
          SELECT polygon_id,
                 CAST(floor((mnx + 180.0) / 360.0 * {_pfn}) AS BIGINT) AS qx0,
                 CAST(floor((mxx + 180.0) / 360.0 * {_pfn}) AS BIGINT) AS qx1,
                 CAST(floor((mny + 90.0) / 180.0 * {_pfn}) AS BIGINT) AS qy0,
                 CAST(floor((mxy + 90.0) / 180.0 * {_pfn}) AS BIGINT) AS qy1
          FROM bb),
        cx_ AS (SELECT polygon_id, unnest(generate_series(qx0, qx1)) AS qx,
                       qy0, qy1 FROM q),
        cand AS (SELECT polygon_id, qx,
                        unnest(generate_series(qy0, qy1)) AS qy FROM cx_),
        ctr AS (SELECT polygon_id, qx, qy,
                       -180.0 + (qx + 0.5) / {_pfn} * 360.0 AS cx,
                       -90.0 + (qy + 0.5) / {_pfn} * 180.0 AS cy
                FROM cand)
        SELECT c.polygon_id, c.qx, c.qy
        FROM ctr c JOIN {edges_p} e USING (polygon_id)
        WHERE (e.y1 <= c.cy) != (e.y2 <= c.cy)
          AND c.cx < e.x1 + (c.cy - e.y1) / (e.y2 - e.y1) * (e.x2 - e.x1)
        GROUP BY c.polygon_id, c.qx, c.qy
        HAVING COUNT(*) % 2 = 1"""
    o["dau_wau_stickiness"] = """
        WITH ud AS (SELECT DISTINCT user_id,
                           CAST(epoch_us(ts) AS BIGINT) // 86400000000
                               AS day
                    FROM events),
        mx AS (SELECT MAX(day) AS m FROM ud),
        dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
                FROM ud GROUP BY 1),
        w AS (SELECT ud.user_id, ud.day + k AS wday
              FROM ud, UNNEST(generate_series(0, 6)) AS t(k)),
        wau AS (SELECT wday AS day,
                       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
                FROM w, mx WHERE wday <= mx.m GROUP BY 1)
        SELECT d.day, d.dau, wau.wau
        FROM dau d JOIN wau USING (day)"""
    o["polygon_compactness"] = f"""
        WITH e AS (SELECT polygon_id,
                          CAST(floor(x1*1e7 + 0.5) AS BIGINT) AS x1,
                          CAST(floor(y1*1e7 + 0.5) AS BIGINT) AS y1,
                          CAST(floor(x2*1e7 + 0.5) AS BIGINT) AS x2,
                          CAST(floor(y2*1e7 + 0.5) AS BIGINT) AS y2
                   FROM {edges_p}),
        agg AS (SELECT polygon_id,
                       CAST(SUM(x1*y2 - x2*y1) AS BIGINT) AS a2s,
                       CAST(SUM(CAST(floor(sqrt(CAST(
                           (x2-x1)*(x2-x1) + (y2-y1)*(y2-y1)
                           AS DOUBLE)) * 100 + 0.5) AS BIGINT))
                           AS BIGINT) AS p2
                FROM e GROUP BY 1)
        SELECT polygon_id, p2 AS perim_e2,
               CAST(floor(2 * pi() * CAST(ABS(a2s) AS DOUBLE) * 1e4
                          / (CAST(p2 AS DOUBLE) * CAST(p2 AS DOUBLE))
                          * 1e6 + 0.5) AS BIGINT) AS compact_e6
        FROM agg"""
    o["view_to_purchase_lag_days"] = """
        WITH fv AS (SELECT user_id,
                           MIN(CAST(epoch_us(ts) AS BIGINT)) AS v
                    FROM events WHERE event_type = 'view' GROUP BY 1),
        fp AS (SELECT user_id,
                      MIN(CAST(epoch_us(ts) AS BIGINT)) AS p
               FROM events WHERE event_type = 'purchase' GROUP BY 1),
        l AS (SELECT CASE WHEN p >= v
                          THEN (p - v) // 86400000000
                          -- DuckDB // truncates toward zero; numpy
                          -- floors — mirror floor for negative lags
                          ELSE -(((v - p) + 86399999999) // 86400000000)
                     END AS lag_days
              FROM fv JOIN fp USING (user_id))
        SELECT lag_days, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM l GROUP BY lag_days"""
    o["orders_cusum_days"] = """
        WITH dc AS (SELECT o_orderpriority AS pri,
                           CAST(epoch_us(o_orderdate) AS BIGINT)
                               // 86400000000 AS day,
                           CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM orders GROUP BY 1, 2),
        rng AS (SELECT pri, MIN(day) AS d0, MAX(day) AS d1
                FROM dc GROUP BY 1),
        dense AS (SELECT r.pri,
                         unnest(generate_series(r.d0, r.d1)) AS day
                  FROM rng r),
        d2 AS (SELECT d.pri, d.day, COALESCE(dc.cnt, 0) AS cnt
               FROM dense d LEFT JOIN dc
                 ON dc.pri = d.pri AND dc.day = d.day),
        tot AS (SELECT pri, CAST(SUM(cnt) AS BIGINT) AS num,
                       CAST(COUNT(*) AS BIGINT) AS den
                FROM d2 GROUP BY 1),
        pr AS (SELECT d2.pri, d2.day, t.num,
                      CAST(SUM(d2.cnt * t.den - t.num) OVER
                          (PARTITION BY d2.pri ORDER BY d2.day)
                          AS BIGINT) AS pref
               FROM d2 JOIN tot t ON t.pri = d2.pri),
        cs AS (SELECT pri, day, num,
                      pref - LEAST(0, CAST(MIN(pref) OVER
                          (PARTITION BY pri ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT))
                          AS s
               FROM pr)
        SELECT pri, day, CAST(s AS BIGINT) AS cusum_scaled
        FROM cs WHERE s > 2 * num"""
    o["knn_link_prediction"] = f"""
        WITH kn AS (
          SELECT id, neighbor_id FROM (
            SELECT a.image_id AS id, b.image_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY a.image_id
                     ORDER BY {hav}, b.image_id) AS rn
            FROM {knn_p} a, {knn_p} b
            WHERE a.image_id != b.image_id)
          WHERE rn <= {KNN_K}),
        e AS (SELECT DISTINCT LEAST(id, neighbor_id) AS u,
                     GREATEST(id, neighbor_id) AS v FROM kn),
        st AS (SELECT u AS center, v AS leaf FROM e
               UNION ALL SELECT v, u FROM e),
        w AS (SELECT a.leaf AS u, b.leaf AS v
              FROM st a JOIN st b
                ON a.center = b.center AND a.leaf < b.leaf),
        cand AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n_common
                 FROM w GROUP BY 1, 2),
        deg AS (SELECT center, CAST(COUNT(*) AS BIGINT) AS d
                FROM st GROUP BY 1)
        SELECT c.u, c.v, c.n_common,
               CAST(du.d + dv.d - c.n_common AS BIGINT) AS n_union
        FROM cand c
        JOIN deg du ON du.center = c.u
        JOIN deg dv ON dv.center = c.v
        WHERE NOT EXISTS (SELECT 1 FROM e
                          WHERE e.u = c.u AND e.v = c.v)"""
    o["doc_langid_confusion"] = f"""
        WITH pred AS ({o["doc_langid_check"]})
        SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred p JOIN documents d USING (doc_id)
        GROUP BY 1, 2"""
    o["hourly_burst_hours"] = """
        WITH hc AS (SELECT event_type,
                           CAST(epoch_us(ts) AS BIGINT) // 3600000000
                               AS hour,
                           CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM events GROUP BY 1, 2),
        rng AS (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
                FROM hc GROUP BY 1),
        dense AS (SELECT r.event_type,
                         unnest(generate_series(r.h0, r.h1)) AS hour
                  FROM rng r),
        d2 AS (SELECT d.event_type, d.hour, COALESCE(hc.cnt, 0) AS cnt,
                      ROW_NUMBER() OVER (PARTITION BY d.event_type
                                         ORDER BY d.hour) AS rn
               FROM dense d LEFT JOIN hc
                 ON hc.event_type = d.event_type AND hc.hour = d.hour),
        w AS (SELECT event_type, hour, cnt, rn,
                     SUM(cnt) OVER (PARTITION BY event_type
                                    ORDER BY hour
                                    ROWS BETWEEN 24 PRECEDING
                                             AND 1 PRECEDING) AS s24
              FROM d2)
        SELECT event_type, hour, cnt, CAST(s24 AS BIGINT) AS sum24
        FROM w WHERE rn > 24 AND cnt * 24 > 3 * s24"""
    o["chunk_dedup_counts"] = rf"""
        WITH toks AS (SELECT doc_id,
                             regexp_extract_all(text, '\S+') AS tk
                      FROM documents),
        c AS (SELECT doc_id, tk, len(tk) AS n FROM toks),
        e AS (SELECT doc_id, tk, n,
                     unnest(generate_series(0,
                         (n + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} - 1))
                         AS k
              FROM c),
        ch AS (SELECT doc_id,
                      array_to_string(list_slice(tk,
                          k*{CHUNK_STRIDE} + 1,
                          k*{CHUNK_STRIDE} + {CHUNK_SIZE}), ' ')
                          AS chunk_text
               FROM e)
        SELECT chunk_text, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(MIN(doc_id) AS BIGINT) AS owner_doc
        FROM ch GROUP BY chunk_text HAVING COUNT(*) >= 2"""
    o["token_zipf_fit"] = r"""
        WITH tok AS (SELECT unnest(regexp_extract_all(text, '\S+'))
                         AS token FROM documents),
        tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM tok GROUP BY token),
        top AS (SELECT cnt, ROW_NUMBER() OVER
                    (ORDER BY cnt DESC, token) AS r
                FROM tc ORDER BY cnt DESC, token LIMIT 100),
        xy AS (SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1e6)
                           AS BIGINT) AS x,
                      CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e6)
                           AS BIGINT) AS y FROM top),
        st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(x) AS BIGINT) AS sx,
                      CAST(SUM(y) AS BIGINT) AS sy,
                      CAST(SUM(x * x) AS BIGINT) AS sxx,
                      CAST(SUM(x * y) AS BIGINT) AS sxy FROM st0),
        st0 AS (SELECT x, y FROM xy)
        SELECT n AS n_tokens,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
               CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sxx - sx * sx AS DOUBLE)
                          * 1e6 + 0.5) AS BIGINT) AS slope_e6
        FROM st"""
    o["tag_key_cooccurrence"] = f"""
        WITH d AS (SELECT DISTINCT elem_id, key FROM {tags_p}),
        p AS (SELECT a.key AS key_a, b.key AS key_b
              FROM d a JOIN d b ON a.elem_id = b.elem_id
               AND a.key < b.key)
        SELECT key_a, key_b, CAST(COUNT(*) AS BIGINT) AS n
        FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 5"""
    _jx = _grid_sql("n.lon", TILE_RES, -180.0, 360.0)
    _jy = _grid_sql("n.lat", TILE_RES, -90.0, 180.0)
    o["amenity_join_counts"] = f"""
        WITH pts AS (SELECT t.value, n.lon, n.lat
                     FROM {tags_p} t JOIN {nodes_p} n ON t.elem_id = n.id
                     WHERE t.key = 'amenity'
                       AND t.value IN ('cafe', 'restaurant')),
        occ AS (SELECT {_jx.replace("n.lon", "lon").replace("n.lat", "lat")} AS qx,
                       {_jy.replace("n.lon", "lon").replace("n.lat", "lat")} AS qy,
                       MAX(CASE WHEN value = 'cafe' THEN 1 ELSE 0 END)
                           AS a,
                       MAX(CASE WHEN value = 'restaurant' THEN 1
                           ELSE 0 END) AS b
                FROM pts GROUP BY 1, 2),
        adj AS (SELECT l.a AS la, l.b AS lb, r.a AS ra, r.b AS rb
                FROM occ l JOIN occ r
                  ON (r.qx = l.qx + 1 AND r.qy = l.qy)
                  OR (r.qx = l.qx AND r.qy = l.qy + 1))
        SELECT CAST(SUM(la * ra) AS BIGINT) AS jc_aa,
               CAST(SUM(la * rb + lb * ra) AS BIGINT) AS jc_ab,
               CAST(SUM(lb * rb) AS BIGINT) AS jc_bb
        FROM adj"""
    o["way_chain_components"] = f"""
        WITH RECURSIVE mm AS (SELECT way_id, MIN(position) AS mn,
                           MAX(position) AS mx
                    FROM {way_nodes_p} GROUP BY 1),
        ep AS (SELECT w.way_id, w.node_id FROM {way_nodes_p} w
               JOIN mm USING (way_id) WHERE w.position = mm.mn
               UNION ALL
               SELECT w.way_id, w.node_id FROM {way_nodes_p} w
               JOIN mm USING (way_id) WHERE w.position = mm.mx),
        deg AS (SELECT node_id, COUNT(*) AS c,
                       COUNT(DISTINCT way_id) AS dw,
                       MIN(way_id) AS wa, MAX(way_id) AS wb
                FROM ep GROUP BY 1),
        e AS (SELECT wa AS a, wb AS b FROM deg
              WHERE c = 2 AND dw = 2),
        u AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        reach(x, y) AS (SELECT a, b FROM u
                        UNION
                        SELECT r.x, e2.b
                        FROM reach r JOIN u e2 ON r.y = e2.a),
        lab AS (SELECT x, LEAST(MIN(y), x) AS label
                FROM reach GROUP BY x)
        SELECT label AS chain_id, CAST(COUNT(*) AS BIGINT) AS n_ways
        FROM lab GROUP BY 1"""
    o["top_session_paths"] = """
        WITH s AS (SELECT user_id,
                          CAST(epoch_us(ts) AS BIGINT) // 86400000000
                              AS day,
                          event_type, ts, event_id FROM events),
        p AS (SELECT user_id, day,
                     string_agg(event_type, '>'
                                ORDER BY ts, event_id) AS path
              FROM s GROUP BY user_id, day),
        c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n
              FROM p GROUP BY path)
        SELECT path, n FROM c ORDER BY n DESC, path LIMIT 10"""
    o["orders_price_ntile"] = """
        SELECT o_orderkey,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
               CAST(NTILE(4) OVER w AS BIGINT) AS tile
        FROM orders
        WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)"""
    o["stream_upsert_latest"] = """
        SELECT user_id, event_id, event_type FROM (
            SELECT user_id, event_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC)
                       AS rn
            FROM events) WHERE rn = 1"""
    _bnn_hav = ("2*6371008.8*asin(sqrt(LEAST(GREATEST("
                "sin((radians(b.lat)-radians(g.lat))/2)^2"
                " + cos(radians(g.lat))*cos(radians(b.lat))"
                "*sin((radians(b.lon)-radians(g.lon))/2)^2, 0.0), 1.0)))")
    o["nearest_knnpt_per_geo"] = f"""
        SELECT id, neighbor_id, d_mm FROM (
            SELECT g.image_id AS id, b.image_id AS neighbor_id,
                   CAST(floor({_bnn_hav} * 1000.0 + 0.5) AS BIGINT)
                       AS d_mm,
                   ROW_NUMBER() OVER (
                       PARTITION BY g.image_id
                       ORDER BY CAST(floor({_bnn_hav} * 1000.0 + 0.5)
                                     AS BIGINT), b.image_id) AS rn
            FROM {geo_p} g CROSS JOIN {knn_p} b)
        WHERE rn = 1"""
    o["orders_cube_agg"] = """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        GROUP BY CUBE (o_orderpriority, o_orderstatus)"""
    o["event_value_winsorized_mean"] = """
        WITH b AS (SELECT event_type,
                     CAST(LEAST(255, GREATEST(0,
                         floor((value - 0.0) / 512.0 * 256)))
                       AS BIGINT) AS bin
                   FROM events WHERE event_type IS NOT NULL),
        h AS (SELECT event_type, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
        c AS (SELECT event_type, bin,
                     SUM(c) OVER (PARTITION BY event_type
                                  ORDER BY bin) AS cum,
                     SUM(c) OVER (PARTITION BY event_type) AS n
              FROM h),
        e AS (SELECT event_type,
                     CAST(floor((0.0 + MIN(bin) FILTER (
                              WHERE cum >= ceil(0.05 * n))
                          * (512.0 / 256)) * 1e6 + 0.5) AS BIGINT) AS lo6,
                     CAST(floor((0.0 + MIN(bin) FILTER (
                              WHERE cum >= ceil(0.95 * n))
                          * (512.0 / 256)) * 1e6 + 0.5) AS BIGINT) AS hi6
              FROM c GROUP BY 1)
        SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(LEAST(GREATEST(
                   CAST(floor(v.value * 1e6 + 0.5) AS BIGINT),
                   e.lo6), e.hi6)) AS BIGINT) AS winsor_sum_e6
        FROM events v JOIN e USING (event_type)
        GROUP BY v.event_type"""
    o["polygon_symdiff_cells"] = f"""
        WITH pf AS ({o["polygon_polyfill_cells"]}),
        sz AS (SELECT polygon_id, COUNT(*) AS sz FROM pf GROUP BY 1),
        ix AS (SELECT a.polygon_id AS poly_a, b.polygon_id AS poly_b,
                      CAST(COUNT(*) AS BIGINT) AS n_common
               FROM pf a JOIN pf b
                 ON a.qx = b.qx AND a.qy = b.qy
                AND a.polygon_id < b.polygon_id
               GROUP BY 1, 2)
        SELECT ix.poly_a, ix.poly_b, ix.n_common,
               CAST(sa.sz + sb.sz - 2 * ix.n_common AS BIGINT)
                   AS n_symdiff
        FROM ix JOIN sz sa ON sa.polygon_id = ix.poly_a
                JOIN sz sb ON sb.polygon_id = ix.poly_b"""
    o["lancelike_bloom_point_get"] = """
        WITH k AS (SELECT o_orderkey FROM orders
                   WHERE o_orderkey % 7 = 3
                   ORDER BY o_orderkey LIMIT 3)
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM orders o JOIN k USING (o_orderkey)"""
    o["lancelike_version_diff_check"] = """
        SELECT 'added' AS change, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders WHERE o_orderkey % 13 = 0
        UNION ALL SELECT 'changed', CAST(COUNT(*) AS BIGINT)
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL SELECT 'removed', CAST(COUNT(*) AS BIGINT)
        FROM orders WHERE o_orderkey % 11 = 0 AND o_orderkey % 7 != 0"""
    # ExactSubstr spans: duplicated = 3-gram occurs >= 2 times anywhere
    # (within-doc repeats count); islands merge windows with start-gap
    # <= 2; coverage = span token length (mx - mn + 3)
    o["doc_dup_spans"] = r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                      FROM documents),
        sh AS (SELECT doc_id, i AS pos,
                      array_to_string(t[i:i+2], ' ') AS s
               FROM toks, UNNEST(generate_series(1, len(t)-2)) AS g(i)),
        c AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 2),
        dp AS (SELECT doc_id, pos FROM sh JOIN c USING (s)),
        isl AS (SELECT doc_id, pos,
                       CASE WHEN pos - LAG(pos) OVER (
                           PARTITION BY doc_id ORDER BY pos) <= 2
                            THEN 0 ELSE 1 END AS brk
                FROM dp),
        gg AS (SELECT doc_id, pos, SUM(brk) OVER (
                   PARTITION BY doc_id ORDER BY pos) AS gid FROM isl),
        sp AS (SELECT doc_id, gid, MIN(pos) AS mn, MAX(pos) AS mx
               FROM gg GROUP BY doc_id, gid)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(mx - mn + 3) AS BIGINT) AS dup_tokens
        FROM sp GROUP BY doc_id"""
    o["lancelike_fts_search"] = f"""
        SELECT image_id FROM {images_p}
        WHERE list_contains(regexp_extract_all(caption, '\\S+'), 'stall')
          AND list_contains(regexp_extract_all(caption, '\\S+'),
                            'Serangoon')"""
    # SemDeDup: the pinned Lloyd chain (k=4, 1 update round — a2 is the
    # assignment by the round-1 means c1), then pairs within a cluster
    o["semdedup_pairs"] = f"""
        WITH emb AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             FROM read_parquet('{_fxp('embeddings_dup')}')),
        init AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
                 FROM (SELECT * FROM emb ORDER BY vec_id LIMIT 4)),
        d1 AS (SELECT e.vec_id, e.v, i.c,
                   list_sum(list_transform(generate_series(1, len(e.v)),
                       j -> (e.v[j] - i.v[j])**2)) AS dist
               FROM emb e CROSS JOIN init i),
        a1 AS (SELECT vec_id, v, c FROM (
                   SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY dist, c) AS rn FROM d1) WHERE rn = 1),
        c1 AS (SELECT c, list(m ORDER BY j) AS v FROM (
                   SELECT c, j, AVG(v[j]) AS m
                   FROM a1, UNNEST(generate_series(1, len(v))) AS t(j)
                   GROUP BY c, j) GROUP BY c),
        d2 AS (SELECT e.vec_id, e.v, i.c,
                   list_sum(list_transform(generate_series(1, len(e.v)),
                       j -> (e.v[j] - i.v[j])**2)) AS dist
               FROM emb e CROSS JOIN c1 i),
        a2 AS (SELECT vec_id, c FROM (
                   SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY dist, c) AS rn FROM d2) WHERE rn = 1)
        SELECT a.c, a.vec_id AS id_a, b.vec_id AS id_b
        FROM a2 a JOIN a2 b ON a.c = b.c AND a.vec_id < b.vec_id
        JOIN read_parquet('{_fxp('embeddings_dup')}') ea
          ON ea.vec_id = a.vec_id
        JOIN read_parquet('{_fxp('embeddings_dup')}') eb
          ON eb.vec_id = b.vec_id
        WHERE list_cosine_similarity(ea.embedding, eb.embedding)
              >= 0.98"""
    o["phash_caption_conflicts"] = f"""
        SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_imgs,
               CAST(COUNT(DISTINCT caption) AS BIGINT) AS n_captions
        FROM {images_p} GROUP BY phash HAVING COUNT(*) >= 2"""
    o["kde_cell_density"] = f"""
        WITH c AS (SELECT {_grid_sql('lon', 13, -180.0, 360.0)} AS x,
                          {_grid_sql('lat', 13, -90.0, 180.0)} AS y,
                          COUNT(*) AS n
                   FROM {geo_p} GROUP BY 1, 2),
        d AS (SELECT unnest([-2, -1, 0, 1, 2]) AS dx),
        e AS (SELECT unnest([-2, -1, 0, 1, 2]) AS dy)
        SELECT c.x + d.dx AS qx, c.y + e.dy AS qy,
               CAST(SUM(c.n * (9 - d.dx*d.dx - e.dy*e.dy)) AS BIGINT)
                   AS dens
        FROM c CROSS JOIN d CROSS JOIN e
        WHERE c.x + d.dx BETWEEN 0 AND 8191
          AND c.y + e.dy BETWEEN 0 AND 8191
        GROUP BY 1, 2"""
    # shoelace centroid: min-corner anchor keeps the numerator
    # non-negative after sign normalization, so HUGEINT // floors
    # exactly like the engine's Python-int floordiv
    o["polygon_centroids"] = f"""
        WITH e AS (SELECT polygon_id,
                          CAST(floor(x1*1e7 + 0.5) AS BIGINT) AS x1,
                          CAST(floor(y1*1e7 + 0.5) AS BIGINT) AS y1,
                          CAST(floor(x2*1e7 + 0.5) AS BIGINT) AS x2,
                          CAST(floor(y2*1e7 + 0.5) AS BIGINT) AS y2
                   FROM {edges_p}),
        a AS (SELECT polygon_id, MIN(LEAST(x1, x2)) AS ax,
                     MIN(LEAST(y1, y2)) AS ay
              FROM e GROUP BY 1),
        t AS (SELECT e.polygon_id, a.ax, a.ay,
                     CAST(e.x1 - a.ax AS HUGEINT) AS u1,
                     CAST(e.y1 - a.ay AS HUGEINT) AS v1,
                     CAST(e.x2 - a.ax AS HUGEINT) AS u2,
                     CAST(e.y2 - a.ay AS HUGEINT) AS v2
              FROM e JOIN a USING (polygon_id)),
        s AS (SELECT polygon_id, ax, ay,
                     SUM(u1*v2 - u2*v1) AS a2,
                     SUM((u1 + u2) * (u1*v2 - u2*v1)) AS sx,
                     SUM((v1 + v2) * (u1*v2 - u2*v1)) AS sy
              FROM t GROUP BY polygon_id, ax, ay),
        nrm AS (SELECT polygon_id, ax, ay,
                       CASE WHEN a2 < 0 THEN -a2 ELSE a2 END AS a2,
                       CASE WHEN a2 < 0 THEN -sx ELSE sx END AS sx,
                       CASE WHEN a2 < 0 THEN -sy ELSE sy END AS sy
                FROM s WHERE a2 != 0)
        SELECT polygon_id,
               CAST(ax + sx // (3 * a2) AS BIGINT) AS cx_e7,
               CAST(ay + sy // (3 * a2) AS BIGINT) AS cy_e7
        FROM nrm"""
    # quadtree compaction, 2 bottom-up levels; every step MATERIALIZED
    # (the unrolled-CTE expansion lesson)
    o["polyfill_compact_cells"] = f"""
        WITH pf AS MATERIALIZED ({o["polygon_polyfill_cells"]}),
        p15 AS MATERIALIZED (
            SELECT polygon_id, qx // 2 AS qx, qy // 2 AS qy
            FROM pf GROUP BY polygon_id, qx // 2, qy // 2
            HAVING COUNT(*) = 4),
        r16 AS (SELECT f.polygon_id, CAST(16 AS BIGINT) AS res,
                       f.qx, f.qy
                FROM pf f LEFT JOIN p15 p
                  ON p.polygon_id = f.polygon_id
                 AND p.qx = f.qx // 2 AND p.qy = f.qy // 2
                WHERE p.qx IS NULL),
        p14 AS MATERIALIZED (
            SELECT polygon_id, qx // 2 AS qx, qy // 2 AS qy
            FROM p15 GROUP BY polygon_id, qx // 2, qy // 2
            HAVING COUNT(*) = 4),
        r15 AS (SELECT f.polygon_id, CAST(15 AS BIGINT) AS res,
                       f.qx, f.qy
                FROM p15 f LEFT JOIN p14 p
                  ON p.polygon_id = f.polygon_id
                 AND p.qx = f.qx // 2 AND p.qy = f.qy // 2
                WHERE p.qx IS NULL)
        SELECT * FROM r16
        UNION ALL SELECT * FROM r15
        UNION ALL SELECT polygon_id, CAST(14 AS BIGINT) AS res, qx, qy
        FROM p14"""
    o["way_buffer_cells"] = f"""
        WITH rc AS MATERIALIZED ({o["way_rasterize_cells"]}),
        c AS (SELECT DISTINCT cx, cy FROM rc),
        d AS (SELECT unnest([-1, 0, 1]) AS dx),
        e AS (SELECT unnest([-1, 0, 1]) AS dy)
        SELECT DISTINCT c.cx + d.dx AS cx, c.cy + e.dy AS cy
        FROM c CROSS JOIN d CROSS JOIN e
        WHERE c.cx + d.dx BETWEEN 0 AND {(1 << WAY_RASTER_RES) - 1}
          AND c.cy + e.dy BETWEEN 0 AND {(1 << WAY_RASTER_RES) - 1}"""
    o["image_dedup_keep_list"] = f"""
        WITH g AS (SELECT phash, MIN(image_id) AS keeper,
                          COUNT(*) AS c
                   FROM {images_p} GROUP BY phash)
        SELECT i.image_id AS dropped_id, g.keeper AS keeper_id
        FROM {images_p} i JOIN g USING (phash)
        WHERE g.c >= 2 AND i.image_id != g.keeper"""
    o["image_phash_clusters"] = f"""
        WITH RECURSIVE p AS (
            SELECT a.image_id AS id_a, b.image_id AS id_b
            FROM {images_p} a, {images_p} b
            WHERE a.image_id < b.image_id
              AND bit_count(xor(a.phash, b.phash)) <= 3),
        e AS (SELECT id_a AS u, id_b AS v FROM p
              UNION SELECT id_b, id_a FROM p),
        reach(u, v) AS (
            SELECT u, v FROM e
            UNION
            SELECT r.u, e2.v FROM reach r JOIN e e2 ON r.v = e2.u),
        n AS (SELECT DISTINCT u AS id FROM e),
        lab AS (SELECT n.id, LEAST(n.id, MIN(r.v)) AS root
                FROM n JOIN reach r ON r.u = n.id GROUP BY n.id)
        SELECT root AS root_id, CAST(COUNT(*) AS BIGINT) AS n_members
        FROM lab GROUP BY root"""
    o["doc_quality_filter_ids"] = r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                      FROM documents),
        bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS b
               FROM toks, UNNEST(generate_series(1, len(t)-1)) AS g(i)),
        bgtop AS (SELECT doc_id, MAX(c) AS topc, SUM(c) AS tot FROM
                  (SELECT doc_id, b, COUNT(*) AS c FROM bg
                   GROUP BY doc_id, b) GROUP BY doc_id),
        r AS (SELECT k.doc_id, len(k.t) AS n,
                     ROUND(len(list_distinct(k.t)) * 1.0 / len(k.t), 6)
                       AS dr,
                     ROUND(COALESCE(g.topc * 1.0 / g.tot, 0.0), 6) AS bf
              FROM toks k LEFT JOIN bgtop g USING (doc_id))
        SELECT doc_id FROM r
        WHERE n >= 30 AND dr IS NOT NULL AND dr >= 0.45 AND bf <= 0.04"""
    o["embedding_outlier_screen"] = """
        WITH emb AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             FROM embeddings),
        m AS (SELECT label, list(mm ORDER BY j) AS mv FROM (
                  SELECT label, j, AVG(v[j]) AS mm
                  FROM emb, UNNEST(generate_series(1, len(v))) AS t(j)
                  GROUP BY label, j) GROUP BY label)
        SELECT e.vec_id, e.label,
               CAST(floor(list_sum(list_transform(
                   generate_series(1, len(e.v)),
                   j -> (e.v[j] - m.mv[j])**2)) * 1e4 + 0.5)
                   AS BIGINT) AS d2_e4
        FROM emb e JOIN m USING (label)"""
    o["event_type_transitions"] = """
        WITH s AS (SELECT user_id, event_type,
                          LEAD(event_type) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS nxt
                   FROM events),
        p AS (SELECT event_type AS prev_type, nxt AS next_type,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
        t AS (SELECT prev_type, SUM(cnt) AS tot FROM p
              GROUP BY prev_type)
        SELECT p.prev_type, p.next_type, p.cnt,
               CAST((1000 * p.cnt) // t.tot AS BIGINT) AS p_permille
        FROM p JOIN t USING (prev_type)"""
    o["spatial_stratified_sample"] = _SM64_MACROS + f"""
        WITH g AS (SELECT image_id,
                   {_grid_sql('lon', CELL_RES, -180.0, 360.0)} AS qx,
                   {_grid_sql('lat', CELL_RES, -90.0, 180.0)} AS qy,
                   sm64(CAST(substring(image_id, 4) AS UBIGINT)) AS h
                   FROM {geo_p})
        SELECT qx, qy, image_id FROM g
        QUALIFY row_number() OVER (PARTITION BY qx, qy
                                   ORDER BY h, image_id) = 1"""
    o["label_balance_plan"] = """
        WITH c AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs
                   FROM embeddings GROUP BY label)
        SELECT label, n_vecs,
               CAST((1000 * (SELECT MIN(n_vecs) FROM c)) // n_vecs
                    AS BIGINT) AS rate_permille
        FROM c"""
    o["epoch_shuffle_positions"] = _SM64_MACROS + """
        WITH e AS (SELECT unnest([0, 1]) AS epoch),
        h AS (SELECT e.epoch, d.doc_id,
                     sm64(xor(CAST(d.doc_id AS UBIGINT),
                              CAST(e.epoch AS UBIGINT))) AS h
              FROM documents d CROSS JOIN e)
        SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
               CAST(row_number() OVER (PARTITION BY epoch
                    ORDER BY h, doc_id) AS BIGINT) AS pos
        FROM h"""
    o["event_value_exact_median_by_type"] = """
        WITH v AS (SELECT event_type,
                          CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v
                   FROM events)
        SELECT event_type, v AS median_e6,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n
        FROM v
        QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY v)
            = (COUNT(*) OVER (PARTITION BY event_type) + 1) // 2"""
    o["lancelike_schema_evolution_check"] = f"""
        SELECT image_id, addr_street AS street_name, lon
        FROM {geo_p}"""
    o["polygon_value_cell_alloc"] = f"""
        WITH pf AS MATERIALIZED ({o["polygon_polyfill_cells"]}),
        sz AS (SELECT polygon_id,
                      CAST(1000000 // COUNT(*) AS BIGINT) AS share
               FROM pf GROUP BY 1)
        SELECT qx, qy, CAST(SUM(share) AS BIGINT) AS alloc_sum,
               CAST(COUNT(*) AS BIGINT) AS n_polys
        FROM pf JOIN sz USING (polygon_id)
        GROUP BY qx, qy"""
    o["cell_majority_kind"] = f"""
        WITH pf AS MATERIALIZED ({o["polygon_polyfill_cells"]}),
        c AS (SELECT pf.qx, pf.qy, p.kind,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM pf JOIN {polys_p} p USING (polygon_id)
              GROUP BY 1, 2, 3)
        SELECT qx, qy, kind, cnt FROM c
        QUALIFY row_number() OVER (PARTITION BY qx, qy
                                   ORDER BY cnt DESC, kind) = 1"""
    o["kmv_type_jaccard"] = _SM64_MACROS + """
        WITH d AS (SELECT DISTINCT event_type,
                       CAST(sm64(CAST(user_id AS UBIGINT)) >> 1
                            AS BIGINT) AS h63
                   FROM events),
        s AS (SELECT event_type, h63 FROM d
              QUALIFY row_number() OVER (PARTITION BY event_type
                                         ORDER BY h63) <= 256),
        t AS (SELECT DISTINCT event_type FROM events),
        p AS (SELECT a.event_type AS type_a, b.event_type AS type_b
              FROM t a, t b WHERE a.event_type < b.event_type),
        un AS (SELECT DISTINCT p.type_a, p.type_b, s.h63
               FROM p JOIN s ON s.event_type IN (p.type_a, p.type_b)),
        uk AS (SELECT type_a, type_b, h63 FROM un
               QUALIFY row_number() OVER (PARTITION BY type_a, type_b
                                          ORDER BY h63) <= 256),
        c AS (SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_union
              FROM uk GROUP BY 1, 2),
        m AS (SELECT uk.type_a, uk.type_b,
                     CAST(COUNT(*) AS BIGINT) AS n_common
              FROM uk
              JOIN s sa ON sa.event_type = uk.type_a
                       AND sa.h63 = uk.h63
              JOIN s sb ON sb.event_type = uk.type_b
                       AND sb.h63 = uk.h63
              GROUP BY 1, 2)
        SELECT c.type_a, c.type_b, c.n_union,
               CAST(COALESCE(m.n_common, 0) AS BIGINT) AS n_common,
               CAST((1000000 * COALESCE(m.n_common, 0)) // c.n_union
                    AS BIGINT) AS jaccard_e6
        FROM c LEFT JOIN m USING (type_a, type_b)"""
    o["doc_readability"] = r"""
        WITH r AS (SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                     AS n_words,
                 CAST(len(regexp_extract_all(lower(text), '[aeiou]+'))
                     AS BIGINT) AS n_syl
                   FROM documents)
        SELECT doc_id, n_words, n_syl,
               CAST((1000000 * n_syl) // n_words AS BIGINT)
                   AS syl_per_word_e6
        FROM r WHERE n_words > 0"""
    o["weighted_sample_orders"] = _SM64_MACROS + """
        WITH p AS (SELECT o_orderkey, o_totalprice,
                   CAST(sm64(CAST(o_orderkey AS UBIGINT)) AS DOUBLE)
                       / o_totalprice AS prio
                   FROM orders)
        SELECT o_orderkey, o_totalprice FROM p
        ORDER BY prio, o_orderkey LIMIT 50"""
    o["event_value_rank_in_type"] = """
        WITH v AS (SELECT event_id, event_type,
                          CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v
                   FROM events),
        r AS (SELECT event_id, event_type,
                     CAST(row_number() OVER (PARTITION BY event_type
                          ORDER BY v, event_id) AS BIGINT)
                         AS rank_in_type,
                     CAST(COUNT(*) OVER (PARTITION BY event_type)
                          AS BIGINT) AS n
              FROM v)
        SELECT event_id, event_type, rank_in_type,
               CASE WHEN n > 1 THEN CAST((1000000 * (rank_in_type - 1))
                    // (n - 1) AS BIGINT) ELSE 0 END AS pct_e6
        FROM r"""
    # farthest-first traversal, unrolled: dN holds every point's exact
    # int min-distance to the first N centers; every step MATERIALIZED
    # (expression fan-out re-expands exponentially otherwise — NOTES_r4)
    _kc = [f"""
        pts AS MATERIALIZED (SELECT image_id,
            CAST(floor(lon * 1e7 + 0.5) AS BIGINT) AS x,
            CAST(floor(lat * 1e7 + 0.5) AS BIGINT) AS y FROM {geo_p}),
        c1 AS MATERIALIZED (SELECT image_id, x, y FROM pts
            ORDER BY image_id LIMIT 1),
        d1 AS MATERIALIZED (SELECT p.image_id, p.x, p.y,
            (p.x-c.x)*(p.x-c.x) + (p.y-c.y)*(p.y-c.y) AS dmin
            FROM pts p CROSS JOIN c1 c)"""]
    for i in range(2, KCENTER_K + 1):
        _kc.append(f"""
        c{i} AS MATERIALIZED (SELECT image_id, x, y, dmin FROM d{i-1}
            ORDER BY dmin DESC, image_id LIMIT 1)""")
        if i < KCENTER_K:
            _kc.append(f"""
        d{i} AS MATERIALIZED (SELECT d.image_id, d.x, d.y,
            LEAST(d.dmin, (d.x-c.x)*(d.x-c.x) + (d.y-c.y)*(d.y-c.y))
                AS dmin
            FROM d{i-1} d CROSS JOIN c{i} c)""")
    _kc_sel = ["SELECT CAST(1 AS BIGINT) AS rank, image_id, "
               "CAST(0 AS BIGINT) AS d2_sel FROM c1"]
    for i in range(2, KCENTER_K + 1):
        _kc_sel.append(f"SELECT CAST({i} AS BIGINT), image_id, dmin "
                       f"FROM c{i}")
    o["kcenter_diverse_points"] = ("WITH " + ",".join(_kc) + "\n        "
                                   + "\n        UNION ALL ".join(_kc_sel))
    _ke = ["""
        pts AS MATERIALIZED (SELECT vec_id,
            list_transform(embedding, e ->
                CAST(floor(CAST(e AS DOUBLE) * 1e6 + 0.5) AS BIGINT))
                AS v FROM embeddings),
        c1 AS MATERIALIZED (SELECT vec_id, v FROM pts
            ORDER BY vec_id LIMIT 1),
        d1 AS MATERIALIZED (SELECT p.vec_id, p.v, kd2(p.v, c.v) AS dmin
            FROM pts p CROSS JOIN c1 c)"""]
    for i in range(2, KCENTER_K + 1):
        _ke.append(f"""
        c{i} AS MATERIALIZED (SELECT vec_id, v, dmin FROM d{i-1}
            ORDER BY dmin DESC, vec_id LIMIT 1)""")
        if i < KCENTER_K:
            _ke.append(f"""
        d{i} AS MATERIALIZED (SELECT d.vec_id, d.v,
            LEAST(d.dmin, kd2(d.v, c.v)) AS dmin
            FROM d{i-1} d CROSS JOIN c{i} c)""")
    _ke_sel = ["SELECT CAST(1 AS BIGINT) AS rank, vec_id, "
               "CAST(0 AS BIGINT) AS d2_sel FROM c1"]
    for i in range(2, KCENTER_K + 1):
        _ke_sel.append(f"SELECT CAST({i} AS BIGINT), vec_id, "
                       f"CAST(dmin AS BIGINT) FROM c{i}")
    o["doc_token_counts_bpe"] = r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text),
                    ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+')) AS BIGINT)
                   AS n_tokens_bpe
        FROM documents"""
    o["way_point_loads"] = f"""
        WITH s AS MATERIALIZED ({{SNAP}})
        SELECT way_id, CAST(COUNT(*) AS BIGINT) AS n_points
        FROM s GROUP BY way_id"""
    o["kcenter_diverse_embeddings"] = (
        """CREATE OR REPLACE MACRO kd2(a, b) AS CAST(list_sum(
            list_transform(generate_series(1, len(a)),
                j -> (CAST(a[j] AS BIGINT) - CAST(b[j] AS BIGINT))
                   * (CAST(a[j] AS BIGINT) - CAST(b[j] AS BIGINT))))
            AS BIGINT);
        WITH """ + ",".join(_ke) + "\n        "
        + "\n        UNION ALL ".join(_ke_sel))
    # composed AFTER snap_points_to_ways' own twin exists in o
    o["way_point_loads"] = o["way_point_loads"].replace(
        "{SNAP}", o["snap_points_to_ways"])
    # the bucketed snap is value-identical by construction (shared
    # _snap_tile_min float tree) — same SQL twin pins both paths
    o["snap_points_to_ways_bucketed"] = o["snap_points_to_ways"]
    o["event_value_mad_by_type"] = """
        WITH v AS (SELECT event_type,
                          CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v
                   FROM events),
        m AS (SELECT event_type, v AS med,
                     CAST(COUNT(*) OVER (PARTITION BY event_type)
                          AS BIGINT) AS n
              FROM v
              QUALIFY row_number() OVER (PARTITION BY event_type
                  ORDER BY v)
                  = (COUNT(*) OVER (PARTITION BY event_type) + 1) // 2),
        a AS (SELECT v.event_type, ABS(v.v - m.med) AS av
              FROM v JOIN m USING (event_type)),
        d AS (SELECT event_type, av FROM a
              QUALIFY row_number() OVER (PARTITION BY event_type
                  ORDER BY av)
                  = (COUNT(*) OVER (PARTITION BY event_type) + 1) // 2)
        SELECT m.event_type, m.med AS median_e6, d.av AS mad_e6, m.n
        FROM m JOIN d USING (event_type)"""
    o["user_time_weighted_value"] = """
        WITH s AS (SELECT user_id, epoch_us(ts) AS t,
                          CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v,
                          event_id
                   FROM events),
        i AS (SELECT user_id, v,
                     LEAD(t) OVER (PARTITION BY user_id
                                   ORDER BY t, event_id) - t AS dt
              FROM s),
        g AS (SELECT user_id,
                     SUM(CAST(v AS HUGEINT) * CAST(dt AS HUGEINT))
                         AS num,
                     SUM(CAST(dt AS HUGEINT)) AS den,
                     CAST(COUNT(*) AS BIGINT) AS n_intervals
              FROM i WHERE dt IS NOT NULL GROUP BY user_id)
        SELECT user_id, CAST(num // den AS BIGINT) AS twa_e6,
               n_intervals
        FROM g"""
    o["event_value_exact_p90_by_type"] = """
        WITH v AS (SELECT event_type,
                          CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v
                   FROM events)
        SELECT event_type, v AS p90_e6,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n
        FROM v
        QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY v)
            = CAST(ceil(0.9 * (COUNT(*) OVER (PARTITION BY event_type)))
                   AS BIGINT)"""
    o["lancelike_metadata_count_check"] = f"""
        WITH victims AS (
            SELECT printf('img%012d', g.i) AS image_id
            FROM (SELECT unnest(generate_series(0, 199, 7)) AS i) g)
        SELECT i.fmt, CAST(COUNT(*) AS BIGINT) AS n
        FROM {images_p} i
        WHERE i.image_id NOT IN (SELECT image_id FROM victims)
        GROUP BY i.fmt"""
    o["bot_like_users"] = f"""
        WITH h AS (SELECT user_id,
                          epoch_us(ts) // 3600000000 AS hour,
                          COUNT(*) AS cnt
                   FROM events GROUP BY 1, 2),
        p AS (SELECT user_id, MAX(cnt) AS peak_hourly FROM h
              GROUP BY user_id)
        SELECT user_id, CAST(peak_hourly AS BIGINT) AS peak_hourly
        FROM p WHERE peak_hourly >= {BOT_HOURLY}"""
    o["type_hour_chi2"] = """
        WITH cells AS (SELECT event_type,
                           (epoch_us(ts) // 3600000000) % 24 AS hod,
                           CAST(COUNT(*) AS HUGEINT) AS o
                       FROM events GROUP BY 1, 2),
        rr AS (SELECT event_type, SUM(o) AS r FROM cells GROUP BY 1),
        cc AS (SELECT hod, SUM(o) AS c FROM cells GROUP BY 1),
        nn AS (SELECT SUM(o) AS n FROM cells),
        term AS (SELECT ((cells.o * nn.n - rr.r * cc.c)
                         * (cells.o * nn.n - rr.r * cc.c)
                         * 1000000::HUGEINT)
                        // (nn.n * rr.r * cc.c) AS t
                 FROM cells JOIN rr USING (event_type)
                            JOIN cc USING (hod) CROSS JOIN nn)
        SELECT CAST((SELECT SUM(t) FROM term) AS BIGINT) AS chi2_e6,
               CAST(((SELECT COUNT(*) FROM rr) - 1)
                    * ((SELECT COUNT(*) FROM cc) - 1) AS BIGINT) AS dof,
               CAST((SELECT n FROM nn) AS BIGINT) AS n"""
    o["ks_view_purchase"] = """
        WITH s AS (SELECT CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v,
                     CASE WHEN event_type = 'view' THEN 1 ELSE 0 END
                         AS a,
                     CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                         AS b
                   FROM events
                   WHERE event_type IN ('view', 'purchase')),
        pv AS (SELECT v, SUM(a) AS a, SUM(b) AS b FROM s GROUP BY v),
        n AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM s),
        c AS (SELECT v, SUM(a) OVER (ORDER BY v) AS ca,
                     SUM(b) OVER (ORDER BY v) AS cb
              FROM pv),
        t AS (SELECT v, ABS(c.ca * n.nb - c.cb * n.na) AS d
              FROM c CROSS JOIN n)
        SELECT CAST(d AS BIGINT) AS d_num, v AS at_v,
               CAST((SELECT na FROM n) AS BIGINT) AS n_a,
               CAST((SELECT nb FROM n) AS BIGINT) AS n_b
        FROM t ORDER BY d DESC, v LIMIT 1"""
    o["caption_street_match_rate"] = f"""
        WITH j AS (SELECT i.caption, g.addr_street, g.addr_postcode
                   FROM {images_p} i JOIN {geo_p} g USING (image_id)),
        r AS (SELECT CASE WHEN regexp_matches(addr_postcode,
                              '^[0-9]{{6}}$')
                          THEN substring(addr_postcode, 1, 2)
                          ELSE 'NA' END AS district,
                     CASE WHEN contains(
                          {normalize.normalize_street_sql('caption')},
                          {normalize.normalize_street_sql('addr_street')})
                          THEN 1 ELSE 0 END AS m
              FROM j)
        SELECT district, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(m) AS BIGINT) AS n_match
        FROM r GROUP BY district"""
    o["events_watermark_windows"] = """
        WITH t AS (SELECT epoch_us(ts) AS us FROM events),
        wm AS (SELECT MAX(us) - 3600000000 AS wm FROM t),
        w AS (SELECT (us // 900000000) * 900000000 AS win_start_us,
                     CAST(COUNT(*) AS BIGINT) AS cnt
              FROM t GROUP BY 1)
        SELECT win_start_us, cnt,
               CASE WHEN win_start_us + 900000000 <= (SELECT wm FROM wm)
                    THEN 'final' ELSE 'open' END AS state
        FROM w"""
    o["street_vocab_overlap"] = f"""
        WITH g AS (SELECT DISTINCT
                   {normalize.normalize_street_sql('addr_street')} AS nm
                   FROM {geo_p}),
        t AS (SELECT DISTINCT
              {normalize.normalize_street_sql('value')} AS nm
              FROM {tags_p} WHERE key = 'addr:street')
        SELECT 'both' AS category, CAST(COUNT(*) AS BIGINT) AS n
        FROM g WHERE nm IN (SELECT nm FROM t)
        UNION ALL
        SELECT 'geo_only', CAST(COUNT(*) AS BIGINT)
        FROM g WHERE nm NOT IN (SELECT nm FROM t)
        UNION ALL
        SELECT 'tags_only', CAST(COUNT(*) AS BIGINT)
        FROM t WHERE nm NOT IN (SELECT nm FROM g)"""
    o["colbert_maxsim_topk"] = """
        CREATE OR REPLACE MACRO dotp(a, b) AS CAST(list_sum(
            list_transform(generate_series(1, len(a)),
                j -> CAST(a[j] AS BIGINT) * CAST(b[j] AS BIGINT)))
            AS BIGINT);
        WITH emb AS (SELECT vec_id, vec_id // 8 AS grp,
                 list_transform(embedding, e ->
                     CAST(floor(CAST(e AS DOUBLE) * 1e6 + 0.5)
                          AS BIGINT)) AS v
                     FROM embeddings),
        q AS (SELECT vec_id AS qid, v FROM emb WHERE vec_id < 4),
        dots AS (SELECT e.grp, q.qid, MAX(dotp(q.v, e.v)) AS mx
                 FROM emb e CROSS JOIN q GROUP BY e.grp, q.qid),
        sc AS (SELECT grp, SUM(mx) AS score FROM dots GROUP BY grp)
        SELECT grp AS doc_grp, CAST(score AS BIGINT) AS score
        FROM sc ORDER BY score DESC, grp LIMIT 5"""
    _rrf_tf = " + ".join(
        rf"len(regexp_extract_all(text, '\b{qt}\b'))"
        for qt in SEARCH_TOKENS)
    o["hybrid_rank_fusion"] = rf"""
        WITH bm AS ({o["doc_bm25_topk"]}),
        bmr AS (SELECT doc_id, row_number() OVER
                    (ORDER BY bm25_e6 DESC, doc_id) AS r FROM bm),
        tf AS (SELECT doc_id, CAST({_rrf_tf} AS BIGINT) AS tf
               FROM documents),
        tfr AS (SELECT doc_id, row_number() OVER
                    (ORDER BY tf DESC, doc_id) AS r
                FROM tf WHERE tf > 0
                QUALIFY row_number() OVER
                    (ORDER BY tf DESC, doc_id) <= 20),
        u AS (SELECT doc_id, r FROM bmr
              UNION ALL SELECT doc_id, r FROM tfr),
        f AS (SELECT doc_id, SUM(1000000000 // (60 + r)) AS rrf
              FROM u GROUP BY doc_id)
        SELECT doc_id, CAST(rrf AS BIGINT) AS rrf
        FROM f ORDER BY rrf DESC, doc_id LIMIT 10"""
    # aspect buckets: same order, same common-denominator distances;
    # the CASE chain is first-match-wins exactly like np.argmin
    _ab = (("1:1", 1, 1), ("4:3", 4, 3), ("3:4", 3, 4),
           ("16:9", 16, 9), ("9:16", 9, 16))
    _abD = 1 * 3 * 4 * 9 * 16
    _abd = [f"abs(w * {bh} - h * {bw}) * {_abD // bh}"
            for _, bw, bh in _ab]
    _abm = f"LEAST({', '.join(_abd)})"
    _abcase = "CASE " + " ".join(
        f"WHEN {d} = {_abm} THEN '{n}'"
        for d, (n, _, _) in zip(_abd, _ab)) + " END"
    o["image_aspect_bucket_plan"] = f"""
        WITH a AS (SELECT {_abcase} AS bucket,
                          CAST(w AS BIGINT) * h AS px
                   FROM {images_p})
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_images,
               CAST(SUM(px) AS BIGINT) AS total_px
        FROM a GROUP BY bucket"""
    o["image_compression_audit"] = f"""
        WITH a AS (SELECT fmt,
                       (1000 * octet_length(bytes))
                           // (CAST(w AS BIGINT) * h) AS bpk,
                       CAST(octet_length(bytes) AS BIGINT) AS nb
                   FROM {images_p})
        SELECT fmt, CAST(MIN(bpk) AS BIGINT) AS bpk_min,
               CAST(MAX(bpk) AS BIGINT) AS bpk_max,
               CAST(SUM(nb) AS BIGINT) AS total_bytes,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM a GROUP BY fmt"""
    o["doc_template_clusters"] = r"""
        WITH p AS (SELECT doc_id,
                   array_to_string(regexp_extract_all(text, '\S+')[1:8],
                                   ' ') AS prefix
                   FROM documents)
        SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS exemplar
        FROM p GROUP BY prefix HAVING COUNT(*) >= 2"""
    o["image_dup_group_profile"] = f"""
        SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_images,
               CAST(COUNT(DISTINCT fmt) AS BIGINT) AS n_formats,
               MIN(image_id) AS keeper
        FROM {images_p}
        GROUP BY phash HAVING COUNT(*) >= 2"""
    o["event_value_mad_outlier_counts"] = f"""
        WITH s AS ({o["event_value_mad_by_type"]}),
        v AS (SELECT event_type,
                     CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v
              FROM events)
        SELECT v.event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN ABS(v.v - s.median_e6)
                             > 5 * s.mad_e6 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM v JOIN s USING (event_type)
        GROUP BY v.event_type"""
    o["customer_pareto_share"] = """
        WITH r AS (SELECT o_custkey,
                   CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS rev
                   FROM orders GROUP BY 1),
        k AS (SELECT rev AS thr FROM r
              QUALIFY row_number() OVER (ORDER BY rev)
                  = (SELECT COUNT(*) - (COUNT(*) + 4) // 5 FROM r))
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM r) AS n_customers,
               CAST(SUM(CASE WHEN rev > (SELECT thr FROM k)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
               (SELECT thr FROM k) AS threshold_cents,
               CAST(SUM(CASE WHEN rev > (SELECT thr FROM k)
                        THEN rev ELSE 0 END) AS BIGINT)
                   AS top_rev_cents,
               CAST(SUM(rev) AS BIGINT) AS total_rev_cents
        FROM r"""
    return o
