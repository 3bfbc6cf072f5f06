"""Deduplication stages: exact (hash key), MinHash+LSH, SimHash,
n-gram-Jaccard verify, embedding-cosine near-dup.

Shuffle discipline (SURVEY.md §4 / task brief): every family is
  map_batches (vectorized signature) → flat_map-style explode to
  (bucket, id) rows → groupby(bucket) → candidate pairs → cheap verify,
with only NARROW columns (ids + signatures) crossing the shuffle; document
text / image bytes never move. Final drop-sets are tiny (dup ids), resolved
with driver-side union-find and broadcast back as a filter set —
[R]-analogue: the reference dedups nothing; these are graft ops
(task brief "Beyond the reference's own operators").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.text import (WS_RE, hamming64, jaccard_shingles,
                              minhash_bands, minhash_signature, simhash64)
from ..util import pool_spec

# ------------------------------------------------------------------ exact


def exact_dedup(ds, key_col: str, tie_col: str, n_buckets: int = 1024):
    """D1 — keep exactly one row per ``key_col``: the row with the smallest
    ``tie_col`` (deterministic tie-break; oracle twin =
    ``QUALIFY row_number() OVER (PARTITION BY key ORDER BY tie) = 1``).

    Two-level: per-batch pre-reduce (vectorized pandas groupby — shrinks
    the shuffle to ≤1 row per key per block), then a bucketed hash shuffle
    with a bounded group count and one more vectorized reduce per bucket.
    """
    from ..util import bucketed_group_apply

    def local_first(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(tie_col, kind="mergesort")
        return b[~b.duplicated(key_col, keep="first")]

    pre = ds.map_batches(local_first, batch_format="pandas")

    def bucket_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(tie_col, kind="mergesort")
        return g[~g.duplicated(key_col, keep="first")].drop(columns=["_bucket"])

    return bucketed_group_apply(pre, [key_col], bucket_first, n_buckets)


# ----------------------------------------------------------- minhash + lsh


def _minhash_sig_fn(id_col: str, text_col: str, num_perm: int, num_bands: int,
                    shingle_n: int):
    """Per-batch MinHash band hashes as a PLAIN task fn: the permutation
    params and token-hash memo live in module-level caches that persist in
    each long-lived Ray worker process, so tasks get actor-warm state
    without actor-pool startup latency or CPU pinning."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        sigs = np.empty((len(ids), num_bands), np.uint64)
        for i, t in enumerate(texts):
            toks = WS_RE.findall(t.lower())
            sigs[i] = minhash_bands(
                minhash_signature(toks, num_perm, shingle_n), num_bands)
        return pa.table({
            "doc_id": pa.array(np.repeat(np.asarray(ids), num_bands)),
            "band_id": pa.array(np.tile(np.arange(num_bands, dtype=np.int32),
                                        len(ids)), pa.int32()),
            "band_hash": pa.array(sigs.reshape(-1).astype(np.int64), pa.int64()),
        })
    return fn


def _pairs_from_buckets(sigs, id_col: str = "doc_id", n_buckets: int = 1024,
                        hot_cap: int = 1000):
    """(band_id, band_hash) rows → candidate pairs (a < b).

    One bucketed shuffle on band_hash; within each shuffle bucket, run
    detection over the sorted rows finds every LSH bucket vectorized, and
    only multi-member runs (the rare dup candidates) emit pairs. Runs
    larger than ``hot_cap`` are skipped (hot-bucket guard).
    """
    from ..util import bucketed_group_apply

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_hash", id_col], kind="mergesort")
        bid = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        if len(g) < 2:
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0]})
        new = np.empty(len(g), bool)
        new[0] = True
        new[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
        counts = np.diff(np.append(np.nonzero(new)[0], len(g)))
        starts = np.cumsum(np.append(0, counts))[:-1]
        out_a, out_b = [ids[:0]], [ids[:0]]
        for r in np.nonzero((counts >= 2) & (counts <= hot_cap))[0]:
            seg = ids[starts[r]:starts[r] + counts[r]]
            ia, ib = np.triu_indices(len(seg), k=1)
            out_a.append(seg[ia])
            out_b.append(seg[ib])
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    # NOTE: the same pair can surface from several bands; downstream
    # consumers dedupe inside their own per-pair group (saves one shuffle).
    return bucketed_group_apply(sigs, ["band_hash"], emit, n_buckets)


def minhash_candidate_pairs(ds, id_col: str, text_col: str, num_perm: int = 128,
                            num_bands: int = 32, shingle_n: int = 3,
                            concurrency: int = 4):
    """docs → unique LSH candidate pairs. Only (doc_id, band_id, band_hash)
    rows cross the shuffle (narrow)."""
    sigs = ds.map_batches(
        _minhash_sig_fn(id_col, text_col, num_perm, num_bands, shingle_n),
        batch_format="pyarrow", batch_size=1024)
    return _pairs_from_buckets(sigs)


def minhash_verified_pairs(ds, id_col: str, text_col: str, tau: float = 0.8,
                           num_perm: int = 128, num_bands: int = 32,
                           shingle_n: int = 3, concurrency: int = 4):
    """Candidate pairs verified with EXACT shingle Jaccard >= tau.

    The verify step needs the two texts: broadcast is wrong for a big
    corpus, so texts are gathered to their pairs with a reduce-side
    groupby (see ``_attach_pair_texts``) — only (id, text) rows of docs
    actually referenced by a pair side move.
    """
    pairs = minhash_candidate_pairs(ds, id_col, text_col, num_perm, num_bands,
                                    shingle_n, concurrency)
    docs = ds.select_columns([id_col, text_col])
    sided = _attach_pair_texts(pairs, docs, id_col, text_col)

    def judge(g: pa.Table) -> pa.Table:
        texts = dict(zip(g["side"].to_pylist(), g["text"].to_pylist()))
        jac = -1.0
        if 0 in texts and 1 in texts:
            jac = jaccard_shingles(WS_RE.findall(texts[0].lower()),
                                   WS_RE.findall(texts[1].lower()), shingle_n)
        keep = 1 if jac >= tau else 0
        return pa.table({"id_a": g["id_a"].slice(0, keep),
                         "id_b": g["id_b"].slice(0, keep),
                         "jaccard": pa.array([jac] * keep, pa.float64())})

    return sided.groupby(["id_a", "id_b"]).map_groups(judge, batch_format="pyarrow")


def _attach_pair_texts(pairs, docs, id_col: str, text_col: str):
    """Reduce-side gather: attach each pair side's text via ONE
    groupby(doc id) over the union of doc rows and pair-request rows.

    Replaces ``Dataset.join`` here: Ray 2.49's hash join emits
    schema-less empty partitions when the (tiny) pair list spreads over
    many partitions, which poisons chained joins (ArrowInvalid). A
    sort-shuffle groupby has no such edge and moves each doc text at
    most once per referenced side — same asymptotics as the join.

    Output rows: (id_a, id_b, side∈{0,1}, text) — one per pair side.
    """
    base = docs.schema().base_schema          # pyarrow schema under Ray's wrapper
    id_type = base.field(id_col).type

    def doc_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "key": batch[id_col],
            "id_a": pa.nulls(n, id_type),
            "id_b": pa.nulls(n, id_type),
            "side": pa.array([-1] * n, pa.int32()),
            "text": batch[text_col],
        })

    def request_rows(batch: pa.Table) -> pa.Table:
        ia, ib = batch["id_a"], batch["id_b"]
        n = len(batch)
        return pa.table({
            "key": pa.concat_arrays([ia.combine_chunks(), ib.combine_chunks()]),
            "id_a": pa.concat_arrays([ia.combine_chunks()] * 2),
            "id_b": pa.concat_arrays([ib.combine_chunks()] * 2),
            "side": pa.array([0] * n + [1] * n, pa.int32()),
            "text": pa.nulls(2 * n, pa.string()),
        })

    unioned = docs.map_batches(doc_rows, batch_format="pyarrow").union(
        pairs.map_batches(request_rows, batch_format="pyarrow"))

    def attach(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy()
        docm = side == -1
        if not docm.any() or docm.all():
            return g.select(["id_a", "id_b", "side", "text"]).slice(0, 0)
        text = g["text"].to_pylist()[int(np.argmax(docm))]
        reqs = g.filter(pa.array(~docm))
        return pa.table({"id_a": reqs["id_a"], "id_b": reqs["id_b"],
                         "side": reqs["side"],
                         "text": pa.array([text] * len(reqs), pa.string())})

    return unioned.groupby("key").map_groups(attach, batch_format="pyarrow")


def drop_set_from_pairs(pairs_rows, id_a="id_a", id_b="id_b") -> set:
    """Union-find over verified dup pairs (a SMALL driver-side list):
    every component keeps its minimum id; the rest go into the drop set."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs_rows:
        ra, rb = find(r[id_a]), find(r[id_b])
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    drops = {x for x in parent if find(x) != x}
    return drops


def near_dedup_minhash(ds, id_col: str, text_col: str, tau: float = 0.8, **kw):
    """End-to-end near-dedup: docs → verified pairs → broadcast drop set →
    filtered docs (keeps the min-id representative of each dup cluster)."""
    pairs = minhash_verified_pairs(ds, id_col, text_col, tau, **kw).take_all()
    drops = drop_set_from_pairs(pairs)

    def filt(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        mask = pa.array([i not in drops for i in ids])
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash


class _SimHashSig:
    def __init__(self, id_col: str, text_col: str):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        sigs = [np.int64(np.uint64(simhash64(WS_RE.findall(t.lower()))))
                for t in batch[self.text_col].to_pylist()]
        return pa.table({"doc_id": pa.array(ids),
                         "simhash": pa.array(sigs, pa.int64())})


def simhash_pairs(ds, id_col: str, text_col: str, max_hamming: int = 3,
                  concurrency: int = 4):
    """SimHash near-dup: 64-bit signature → 4×16-bit band buckets (any pair
    within Hamming distance 3 shares at least one exact band) → verify."""
    sigs = ds.map_batches(_SimHashSig, fn_constructor_args=(id_col, text_col),
                          batch_format="pyarrow", batch_size=2048,
                          concurrency=pool_spec(concurrency), num_cpus=1)

    def explode(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy().astype(np.uint64)
        ids = batch["doc_id"].to_pylist()
        out_id, out_band, out_hash, out_sig = [], [], [], []
        for b in range(4):
            chunk = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out_id.extend(ids)
            out_band.extend([b] * len(ids))
            out_hash.extend(chunk.tolist())
            out_sig.extend(sh.astype(np.int64).tolist())
        return pa.table({"doc_id": pa.array(out_id),
                         "band_id": pa.array(out_band, pa.int32()),
                         "band_hash": pa.array(out_hash, pa.int64()),
                         "simhash": pa.array(out_sig, pa.int64())})

    bucketed = sigs.map_batches(explode, batch_format="pyarrow")

    from ..util import bucketed_group_apply

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_hash", "doc_id"], kind="mergesort")
        bid = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        if len(g) < 2:
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0],
                                 "hamming": np.empty(0, dtype=np.int64)})
        new = np.empty(len(g), bool)
        new[0] = True
        new[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
        counts = np.diff(np.append(np.nonzero(new)[0], len(g)))
        starts = np.cumsum(np.append(0, counts))[:-1]
        out_a, out_b = [ids[:0]], [ids[:0]]
        out_h = [np.empty(0, np.int64)]
        for r in np.nonzero((counts >= 2) & (counts <= 1000))[0]:
            s0, c = starts[r], counts[r]
            ia, ib = np.triu_indices(c, k=1)
            ham = hamming64(sh[s0 + ia], sh[s0 + ib])
            keep = ham <= max_hamming
            out_a.append(ids[s0 + ia[keep]])
            out_b.append(ids[s0 + ib[keep]])
            out_h.append(ham[keep])
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_h)})

    pairs = bucketed_group_apply(bucketed, ["band_hash"], emit)

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"]).drop(columns=["_bucket"])
    return bucketed_group_apply(pairs, ["id_a"], dedupe, n_buckets=256)


# ------------------------------------------------- embedding cosine dedup


class _HyperplaneSig:
    """Random-hyperplane LSH signature for embedding vectors (planes drawn
    once per actor from a fixed seed — identical across the pool)."""

    def __init__(self, id_col: str, vec_col: str, n_bits: int = 16, seed: int = 42):
        self.id_col, self.vec_col, self.n_bits = id_col, vec_col, n_bits
        self.seed = seed
        self.planes = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch[self.vec_col].to_pylist(), dtype=np.float64)
        if self.planes is None:
            rng = np.random.default_rng(self.seed)
            self.planes = rng.standard_normal((vecs.shape[1], self.n_bits))
        bits = (vecs @ self.planes) > 0
        sig = (bits.astype(np.uint64) << np.arange(self.n_bits, dtype=np.uint64)).sum(axis=1)
        return pa.table({"vec_id": batch[self.id_col],
                         "bucket": pa.array(sig.astype(np.int64), pa.int64()),
                         "vec": batch[self.vec_col]})


def embedding_dup_pairs(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                        tau: float = 0.95, n_bits: int = 12, concurrency: int = 4):
    """Embedding-cosine near-dup: hyperplane-LSH bucket → exact cosine verify
    within bucket (vectors only move once, into their bucket group)."""
    sigs = ds.map_batches(_HyperplaneSig, fn_constructor_args=(id_col, vec_col, n_bits),
                          batch_format="pyarrow", batch_size=4096,
                          concurrency=pool_spec(concurrency), num_cpus=1)

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > 2000:
            ids0 = g["vec_id"].to_numpy()[:0]
            return pd.DataFrame({"id_a": ids0, "id_b": ids0,
                                 "cosine": np.empty(0, dtype=np.float64)})
        g = g.sort_values("vec_id", kind="mergesort")
        ids = g["vec_id"].to_numpy()
        v = np.asarray(g["vec"].tolist(), dtype=np.float64)
        v = v / np.linalg.norm(v, axis=1, keepdims=True).clip(1e-12)
        sim = v @ v.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sim[ia, ib] >= tau
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "cosine": sim[ia, ib][keep]})

    return sigs.groupby("bucket").map_groups(emit, batch_format="pandas")
