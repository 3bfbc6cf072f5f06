"""Deduplication stages: exact (hash key), MinHash+LSH, SimHash,
n-gram-Jaccard verify, embedding-cosine near-dup.

Shuffle discipline (SURVEY.md §4 / task brief): every family is
  map_batches (vectorized signature) → flat_map-style explode to
  (bucket, id) rows → groupby(bucket) → candidate pairs → cheap verify,
with only NARROW columns (ids + signatures) crossing the shuffle; document
text / image bytes never move. Pair verification is two-regime (capped
driver-side judge over broadcast-gathered values when candidates are few,
bucketed reduce-side gather beyond); components resolve on-cluster
(``connected_components_pairs``) and drop-sets apply via bounded broadcast
with a distributed anti-join fallback — [R]-analogue: the reference dedups
nothing; these are graft ops (task brief "Beyond the reference's own
operators").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.text import (WS_RE, _shingle_hashes, hamming64,
                              jaccard_shingles, minhash_bands_batch,
                              simhash64)
from ..util import pool_spec

# ------------------------------------------------------------------ exact


def exact_dedup(ds, key_col: str, tie_col: str, n_buckets: int = 1024):
    """D1 — keep exactly one row per ``key_col``: the row with the smallest
    ``tie_col`` (deterministic tie-break — ``tie_col`` must be unique per
    key, e.g. a row id; oracle twin = ``QUALIFY row_number() OVER
    (PARTITION BY key ORDER BY tie) = 1``).

    Two-level: per-batch pre-reduce (shrinks the shuffle to ≤1 row per key
    per block), then a bucketed hash shuffle with a bounded group count and
    one more reduce per bucket. BOTH levels are Arrow-native (C++
    sort_indices on the two narrow columns + ``Table.take``) so rows
    carrying binary payloads (image bytes) are never copied into pandas
    object arrays (VERDICT r4 item 6)."""
    from ..util import bucketed_group_apply

    def _first_per_key(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if b.num_rows == 0:
            return b
        # key_col == tie_col (pure distinct) would duplicate the name in
        # select() and make the FieldRef ambiguous — sort the one column
        narrow = ([key_col] if tie_col == key_col else [key_col, tie_col])
        idx = pc.sort_indices(b.select(narrow),
                              sort_keys=[(c, "ascending") for c in narrow])
        # adjacent-diff mask on the narrow key column only; the full
        # rows (incl. binary payloads) move via ONE C++ take
        kn = b[key_col].take(idx).to_numpy(zero_copy_only=False)
        first = np.ones(len(kn), bool)
        first[1:] = kn[1:] != kn[:-1]
        return b.take(idx.filter(pa.array(first)))

    pre = ds.map_batches(_first_per_key, batch_format="pyarrow")

    def bucket_first(g: pa.Table) -> pa.Table:
        return _first_per_key(g.drop_columns(["_bucket"]))

    return bucketed_group_apply(pre, [key_col], bucket_first, n_buckets,
                                batch_format="pyarrow")


# ----------------------------------------------------------- minhash + lsh


def _minhash_sig_fn(id_col: str, text_col: str, num_perm: int, num_bands: int,
                    shingle_n: int):
    """Per-batch MinHash band hashes as a PLAIN task fn: the permutation
    params and token-hash memo live in module-level caches that persist in
    each long-lived Ray worker process, so tasks get actor-warm state
    without actor-pool startup latency or CPU pinning."""

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # whole-batch vectorized kernel (factorized token hashes, masked
        # concatenated shingle windows, minimum.reduceat over doc offsets)
        # — bit-identical to the per-doc path, pinned by pytest
        sigs = minhash_bands_batch(batch[text_col], num_perm, num_bands,
                                   shingle_n)
        # doc_id via Arrow take: typed even on zero-row blocks (an empty
        # pylist→asarray would infer float64 and drift the block schema)
        rep = batch[id_col].take(
            pa.array(np.repeat(np.arange(n), num_bands), pa.int64()))
        return pa.table({
            "doc_id": rep,
            "band_id": pa.array(np.tile(np.arange(num_bands, dtype=np.int32),
                                        n), pa.int32()),
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


def _pairs_df_capped(pairs, cap: int):
    """Stream a candidate-pair Dataset to the driver, aborting to ``None``
    the moment it outgrows ``cap`` rows (bounded driver memory — the same
    pattern as the near-dedup drop-set broadcast)."""
    chunks, n = [], 0
    for b in pairs.iter_batches(batch_format="pandas"):
        chunks.append(b)
        n += len(b)
        if n > cap:
            return None
    if not chunks:
        return pd.DataFrame({"id_a": [], "id_b": []})
    return pd.concat(chunks, ignore_index=True)


def _gather_vals(items, id_col: str, val_col: str, ids) -> dict:
    """{id: value} for the (few) ids referenced by pairs: broadcast the id
    set once, one vectorized ``pc.is_in`` filter pass over the corpus —
    only matching (id, value) rows ever leave the cluster."""
    import pyarrow.compute as pcc
    import ray

    ref = ray.put(pa.array(pd.unique(np.asarray(ids))))

    def filt(b: pa.Table) -> pa.Table:
        return b.filter(pcc.is_in(b[id_col], value_set=ray.get(ref)))

    sel = items.map_batches(filt, batch_format="pyarrow").to_pandas()
    return dict(zip(sel[id_col], sel[val_col]))


def minhash_verified_pairs(ds, id_col: str, text_col: str, tau: float = 0.8,
                           num_perm: int = 128, num_bands: int = 32,
                           shingle_n: int = 3, concurrency: int = 4,
                           small_cap: int = 50_000):
    """Candidate pairs verified with EXACT shingle Jaccard >= tau.

    Two verify regimes (identical judge kernel, identical output):
    - pair count ≤ ``small_cap`` (the common case — LSH candidates are
      rare by design): pairs stream to the driver (capped), referenced
      texts come back via ONE broadcast ``pc.is_in`` pass, and the judge
      runs locally. Saves the two chained hash shuffles (attach + judge)
      whose fixed partition latency dominated round-2's near-dedup bench.
    - beyond the cap: texts are gathered to their pairs with a bucketed
      reduce-side groupby (``_attach_pair_col``) and judged in bucketed
      groups — nothing materializes on the driver. Broadcast of the whole
      corpus is wrong at scale either way; only referenced texts move.
    """
    pairs = minhash_candidate_pairs(ds, id_col, text_col, num_perm, num_bands,
                                    shingle_n, concurrency)
    docs = ds.select_columns([id_col, text_col])

    if small_cap > 0:
        # pin the (narrow) candidate pairs so an over-cap abort falls back
        # to the distributed judge WITHOUT recomputing signature+LSH
        pairs = pairs.materialize()
    pairs_df = _pairs_df_capped(pairs, small_cap) if small_cap > 0 else None
    if pairs_df is not None:
        import ray.data as rd
        pairs_df = pairs_df.drop_duplicates(["id_a", "id_b"])
        texts = (_gather_vals(docs, id_col, text_col,
                              np.concatenate([pairs_df["id_a"].to_numpy(),
                                              pairs_df["id_b"].to_numpy()]))
                 if len(pairs_df) else {})
        out_a, out_b, out_j = [], [], []
        for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
            if a not in texts or b not in texts:
                continue
            jac = jaccard_shingles(WS_RE.findall(texts[a].lower()),
                                   WS_RE.findall(texts[b].lower()), shingle_n)
            if jac >= tau:
                out_a.append(a)
                out_b.append(b)
                out_j.append(jac)
        return rd.from_pandas(pd.DataFrame({
            "id_a": pd.Series(out_a, dtype=pairs_df["id_a"].dtype),
            "id_b": pd.Series(out_b, dtype=pairs_df["id_b"].dtype),
            "jaccard": pd.Series(out_j, dtype=np.float64),
        }))

    sided = _attach_pair_col(pairs, docs, id_col, text_col)

    # Judge in BUCKETED groups, never one Ray group per pair: map_groups
    # pays ~1ms per group, and candidate pairs are near-unique keys — at
    # sf0.1 that alone was ~5s (the round-1/2 near-dedup variance).
    from ..util import bucketed_group_apply

    def judge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for (a, b), grp in g.groupby(["id_a", "id_b"], sort=False):
            side = grp["side"].to_numpy()
            texts = dict(zip(side, grp["val"]))
            if 0 in texts and 1 in texts:
                jac = jaccard_shingles(WS_RE.findall(texts[0].lower()),
                                       WS_RE.findall(texts[1].lower()),
                                       shingle_n)
                if jac >= tau:
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(jac)
        return pd.DataFrame({
            "id_a": pd.Series(out_a, dtype=g["id_a"].dtype),
            "id_b": pd.Series(out_b, dtype=g["id_b"].dtype),
            "jaccard": pd.Series(out_j, dtype=np.float64),
        })

    return bucketed_group_apply(sided, ["id_a", "id_b"], judge_bucket,
                                n_buckets=256)


def _attach_pair_col(pairs, items, id_col: str, val_col: str,
                     n_buckets: int = 256):
    """Reduce-side gather: attach each pair side's value (text, vector, …)
    via ONE bucketed shuffle over the union of item rows and pair-request
    rows. Output column is named ``val``; value type comes from the items
    schema, never hardcoded.

    Replaces ``Dataset.join`` here: Ray 2.49's hash join emits
    schema-less empty partitions when the (tiny) pair list spreads over
    many partitions, which poisons chained joins (ArrowInvalid). A
    bucketed groupby has no such edge and moves each item value at
    most once per referenced side — same asymptotics as the join.

    The shuffle is BUCKETED (``util.bucketed_group_apply``), never one Ray
    group per item id: the item side carries EVERY corpus id, so per-key
    ``map_groups`` paid ~0.1 ms × n_docs of group overhead — the dominant
    cost of round-2's near-dedup at sf0.1. Inside a bucket the gather is
    one vectorized pandas merge.

    Output rows: (id_a, id_b, side∈{0,1}, val) — one per pair side.
    """
    from ..util import bucketed_group_apply
    base = items.schema().base_schema         # pyarrow schema under Ray's wrapper
    id_type = base.field(id_col).type
    val_type = base.field(val_col).type

    def item_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "key": batch[id_col],
            "id_a": pa.nulls(n, id_type),
            "id_b": pa.nulls(n, id_type),
            "side": pa.array([-1] * n, pa.int32()),
            "val": pc_cast_keep(batch[val_col], val_type),
        })

    def request_rows(batch: pa.Table) -> pa.Table:
        ia, ib = batch["id_a"], batch["id_b"]
        n = len(batch)
        return pa.table({
            "key": pa.concat_arrays([ia.combine_chunks(), ib.combine_chunks()]),
            "id_a": pa.concat_arrays([ia.combine_chunks()] * 2),
            "id_b": pa.concat_arrays([ib.combine_chunks()] * 2),
            "side": pa.array([0] * n + [1] * n, pa.int32()),
            "val": pa.nulls(2 * n, val_type),
        })

    unioned = items.map_batches(item_rows, batch_format="pyarrow").union(
        pairs.map_batches(request_rows, batch_format="pyarrow"))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        itemm = g["side"].to_numpy() == -1
        items_df = g.loc[itemm, ["key", "val"]].drop_duplicates("key")
        reqs = g.loc[~itemm, ["key", "id_a", "id_b", "side"]]
        if items_df.empty or reqs.empty:
            out = g.iloc[0:0]
            return out[["id_a", "id_b", "side", "val"]]
        m = reqs.merge(items_df, on="key", how="inner")
        return m[["id_a", "id_b", "side", "val"]]

    return bucketed_group_apply(unioned, ["key"], attach, n_buckets)


def pc_cast_keep(col, typ):
    """Identity when types already match (avoids list-type cast quirks)."""
    import pyarrow.compute as pcc
    if col.type == typ:
        return col
    return pcc.cast(col, typ)


# row side markers for the label-propagation rounds
_CC_EDGE, _CC_LABEL, _CC_MSG = 0, 1, 2


def _cc_round(g: pd.DataFrame) -> pd.DataFrame:
    """One min-label-propagation round over one shuffle bucket.

    Input rows (key, other, label, side): side 0 = directed edge
    (other = neighbor, label = filler), side 1 = the key's current label,
    side 2 = a label candidate messaged from a neighbor. Fillers equal the
    row's own key so no column is ever null (schema-stable, no float
    coercion of int ids).
    Output: one side-1 row per key (its new label + changed flag) and one
    side-2 message per incident edge carrying the new label to `other`.
    """
    grp = g.groupby("key", sort=False)
    min_lab = grp["label"].min()
    min_oth = grp["other"].min()     # neighbor ids = their initial labels
    keys = min_lab.index.to_series(index=min_lab.index)
    m = pd.concat([min_lab, min_oth, keys], axis=1).min(axis=1)
    prev = g[g["side"] == _CC_LABEL].groupby("key", sort=False)["label"].min()
    prev = prev.reindex(m.index).fillna(keys)
    changed = (m < prev).to_numpy()
    lab = pd.DataFrame({"key": m.index.to_numpy(), "other": m.index.to_numpy(),
                        "label": m.to_numpy(),
                        "side": np.full(len(m), _CC_LABEL, np.int8),
                        "changed": changed})
    e = g[g["side"] == _CC_EDGE]
    msg = pd.DataFrame({"key": e["other"].to_numpy(),
                        "other": e["other"].to_numpy(),
                        "label": m.loc[e["key"]].to_numpy(),
                        "side": np.full(len(e), _CC_MSG, np.int8),
                        "changed": np.zeros(len(e), bool)})
    return pd.concat([lab, msg], ignore_index=True)


def _unionfind_labels(aa, bb) -> dict:
    """Exact union-find over an edge list; returns {id: component_min_id}
    for every incident id."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(aa, bb):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components_pairs(pairs, id_a: str = "id_a", id_b: str = "id_b",
                               max_iters: int = 64, n_buckets: int = 512,
                               single_task_cap: int = 5_000_000):
    """Connected components over a pair/edge Dataset → Dataset
    (id, label) for every id incident to a pair, where label is the
    component's minimum id. Nothing ever materializes on the driver
    (replaces the round-1 driver-side union-find — VERDICT.md r1 item 5).

    Two regimes:
    - pairs ≤ ``single_task_cap``: consolidate to one block and run exact
      union-find inside ONE Ray task (pairs are the rare dup edges — tiny
      next to the corpus — so this is the common case and costs no
      shuffle rounds).
    - beyond the cap: iterated min-label propagation — each round is ONE
      bucketed hash shuffle over (static edges ∪ labels ∪ messages),
      stopping when no label decreases (≤ graph diameter rounds;
      near-dup clusters are shallow cliques, so 2-3 rounds typical).
      ``max_iters`` is a hard safety valve, NOT a silent truncation: a
      graph whose diameter exceeds it (e.g. a long near-dup drift chain)
      raises instead of returning wrong labels (round-2 ADVICE fix).
    """
    from ..util import bucketed_group_apply

    pairs = pairs.materialize()
    if pairs.count() <= single_task_cap:
        def local_cc(b: pa.Table) -> pa.Table:
            lab = _unionfind_labels(b[id_a].to_pylist(), b[id_b].to_pylist())
            ids = sorted(lab)
            # type the output from the INPUT id column — python-inferred
            # pa.array() would promote a mixed int/float dict-key set
            # (hash(123.0)==hash(123)) to double, insertion-order-racily
            typ = b[id_a].type
            return pa.table({"id": pa.array(ids, typ),
                             "label": pa.array([lab[i] for i in ids], typ)})
        return pairs.repartition(1).map_batches(
            local_cc, batch_format="pyarrow", batch_size=None)

    def explode(b: pa.Table) -> pa.Table:
        a, bb = b[id_a].combine_chunks(), b[id_b].combine_chunks()
        key = pa.concat_arrays([a, bb])
        oth = pa.concat_arrays([bb, a])
        n = len(key)
        return pa.table({"key": key, "other": oth, "label": key,
                         "side": pa.array(np.zeros(n, np.int8)),
                         "changed": pa.array(np.zeros(n, bool))})

    edges = pairs.map_batches(explode, batch_format="pyarrow").materialize()
    labels, converged = None, False
    for it in range(max_iters):
        inp = edges if labels is None else edges.union(labels)
        labels = bucketed_group_apply(inp, ["key"], _cc_round,
                                      n_buckets).materialize()
        if it == 0:
            continue    # round 1 always changes labels; skip the count

        def count_changed(b: pd.DataFrame) -> pd.DataFrame:
            n = int((b["changed"] & (b["side"] == _CC_LABEL)).sum())
            return pd.DataFrame({"n": [n]})

        n_changed = int(labels.map_batches(
            count_changed, batch_format="pandas").to_pandas()["n"].sum())
        if n_changed == 0:
            converged = True
            break
    if not converged:
        # never return silently-wrong labels: a graph with diameter >
        # max_iters (long drift chain) would keep/drop the wrong dedup rows
        raise RuntimeError(
            f"connected_components_pairs: label propagation did not "
            f"converge within max_iters={max_iters} rounds (graph diameter "
            f"exceeds it); raise max_iters")

    def final(b: pa.Table) -> pa.Table:
        f = b.filter(pa.compute.equal(b["side"], _CC_LABEL))
        return pa.table({"id": f["key"], "label": f["label"]})

    return labels.map_batches(final, batch_format="pyarrow")


def near_dedup_minhash(ds, id_col: str, text_col: str, tau: float = 0.8,
                       broadcast_cap: int = 2_000_000, **kw):
    """End-to-end near-dedup: docs → verified pairs → DISTRIBUTED
    connected components → drop rows whose component label isn't their own
    id (keeps the min-id representative of each dup cluster).

    The drop set is applied with a broadcast ``pc.is_in`` (one ray.put,
    vectorized per batch) while it fits ``broadcast_cap``; beyond that it
    falls back to a bucketed distributed anti-join so nothing ever
    materializes on the driver.
    """
    import pyarrow.compute as pcc
    import ray

    from ..util import anti_semi_join

    pairs = minhash_verified_pairs(ds, id_col, text_col, tau, **kw) \
        .select_columns(["id_a", "id_b"]).materialize()
    if pairs.count() == 0:
        return ds
    labels = connected_components_pairs(pairs)

    def non_rep(b: pa.Table) -> pa.Table:
        keep = pcc.invert(pcc.equal(b["id"], b["label"]))
        return pa.table({"id": b["id"].filter(keep)})

    drops = labels.map_batches(non_rep, batch_format="pyarrow")

    # ONE streamed pull of the narrow drop ids, aborted to the distributed
    # anti-join if they outgrow the broadcast budget (bounded driver memory)
    chunks, n_drops, overflow = [], 0, False
    for b in drops.iter_batches(batch_format="pyarrow"):
        chunks.append(b["id"])
        n_drops += len(b)
        if n_drops > broadcast_cap:
            overflow = True
            break
    if overflow:
        return anti_semi_join(ds, drops, on=id_col, keys_on="id")
    if n_drops == 0:
        return ds
    drop_arr = pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
         for c in chunks])
    ref = ray.put(drop_arr)

    def filt(batch: pa.Table) -> pa.Table:
        mask = pcc.invert(pcc.is_in(batch[id_col], value_set=ray.get(ref)))
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
    return band_hamming_pairs(sigs, "doc_id", "simhash", max_hamming)


def band_hamming_pairs(ds, id_col: str, sig_col: str, max_hamming: int = 3,
                       concurrency: int = 4):
    """Generic banded Hamming near-dup over any (id, int64 signature)
    table — 4×16-bit bands (pigeonhole: any pair within Hamming distance
    3 agrees on at least one band exactly), bucketed candidate detection,
    exact popcount verify. Used for text SimHash AND image phash
    (``image_phash_near_dup``)."""

    def explode(batch: pa.Table) -> pa.Table:
        sh = batch[sig_col].to_numpy().astype(np.uint64)
        ids = batch[id_col].to_pylist()
        out_id, out_band, out_hash, out_sig = [], [], [], []
        for b in range(4):
            chunk = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out_id.extend(ids)
            out_band.extend([b] * len(ids))
            out_hash.extend(chunk.tolist())
            out_sig.extend(sh.astype(np.int64).tolist())
        return pa.table({"_id": pa.array(out_id),
                         "band_id": pa.array(out_band, pa.int32()),
                         "band_hash": pa.array(out_hash, pa.int64()),
                         "_sig": pa.array(out_sig, pa.int64())})

    bucketed = ds.map_batches(explode, batch_format="pyarrow")

    from ..util import bucketed_group_apply

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_hash", "_id"], kind="mergesort")
        bid = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g["_id"].to_numpy()
        sh = g["_sig"].to_numpy().astype(np.uint64)
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


class _HyperplaneBands:
    """Multi-band random-hyperplane LSH for embedding vectors: one plane
    matrix (dim × bands·bits), each band of ``band_bits`` sign bits packed
    into a band hash — any pair agreeing on ANY band becomes a candidate.

    Recall at τ=0.98 (p_bit = 1 − θ/π ≈ 0.936): one 12-bit band matches
    with p ≈ 0.45, so 16 bands miss with (1−0.45)^16 ≈ 7e-5 — versus the
    round-1 single 12-bit signature that missed >half of true pairs
    (ADVICE.md r1). Planes drawn once per worker from a fixed seed."""

    def __init__(self, id_col: str, vec_col: str, n_bands: int = 16,
                 band_bits: int = 12, seed: int = 42):
        self.id_col, self.vec_col = id_col, vec_col
        self.n_bands, self.band_bits, self.seed = n_bands, band_bits, seed
        self.planes = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch[self.vec_col].to_pylist(), dtype=np.float64)
        n = len(vecs)
        if self.planes is None:
            rng = np.random.default_rng(self.seed)
            self.planes = rng.standard_normal(
                (vecs.shape[1], self.n_bands * self.band_bits))
        bits = (vecs @ self.planes) > 0
        w = (np.uint64(1) << np.arange(self.band_bits, dtype=np.uint64))
        hashes = (bits.reshape(n, self.n_bands, self.band_bits)
                  .astype(np.uint64) * w).sum(axis=2)       # (n, bands)
        # salt each band's hash with the band id so identical bit patterns
        # in different bands never collide in the shared bucket space
        hashes = hashes + (np.arange(self.n_bands, dtype=np.uint64)
                           << np.uint64(48))
        ids = batch[self.id_col].combine_chunks()
        idx = pa.array(np.repeat(np.arange(n), self.n_bands))
        return pa.table({
            self.id_col: ids.take(idx),
            "band_id": pa.array(np.tile(np.arange(self.n_bands, dtype=np.int32), n),
                                pa.int32()),
            "band_hash": pa.array(hashes.reshape(-1).astype(np.int64), pa.int64()),
        })


def embedding_dup_pairs(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                        tau: float = 0.95, n_bands: int = 16,
                        band_bits: int = 12, concurrency: int = 4,
                        small_cap: int = 50_000):
    """Embedding-cosine near-dup: multi-band hyperplane LSH → candidate
    pairs (narrow (id, band, hash) rows only through the shuffle) → exact
    cosine verify. Same two verify regimes as ``minhash_verified_pairs``:
    a capped driver-side judge over broadcast-gathered vectors when pairs
    are few (the common case), else vectors gathered reduce-side to their
    pairs (``_attach_pair_col`` — vectors move once per referenced pair
    side, never broadcast, never all-pairs)."""
    sigs = ds.map_batches(
        _HyperplaneBands, fn_constructor_args=(id_col, vec_col, n_bands, band_bits),
        batch_format="pyarrow", batch_size=4096,
        concurrency=pool_spec(concurrency), num_cpus=1)
    pairs = _pairs_from_buckets(sigs, id_col=id_col)
    vecs_ds = ds.select_columns([id_col, vec_col])

    if small_cap > 0:
        pairs = pairs.materialize()   # see minhash_verified_pairs
    pairs_df = _pairs_df_capped(pairs, small_cap) if small_cap > 0 else None
    if pairs_df is not None:
        import ray.data as rd
        pairs_df = pairs_df.drop_duplicates(["id_a", "id_b"])
        vecs = (_gather_vals(vecs_ds, id_col, vec_col,
                             np.concatenate([pairs_df["id_a"].to_numpy(),
                                             pairs_df["id_b"].to_numpy()]))
                if len(pairs_df) else {})
        out_a, out_b, out_c = [], [], []
        for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
            if a not in vecs or b not in vecs:
                continue
            va = np.asarray(vecs[a], dtype=np.float64)
            vb = np.asarray(vecs[b], dtype=np.float64)
            na, nb = np.linalg.norm(va), np.linalg.norm(vb)
            if na > 1e-12 and nb > 1e-12:
                cos = float(va @ vb / (na * nb))
                if cos >= tau:
                    out_a.append(a)
                    out_b.append(b)
                    out_c.append(cos)
        return rd.from_pandas(pd.DataFrame({
            "id_a": pd.Series(out_a, dtype=pairs_df["id_a"].dtype),
            "id_b": pd.Series(out_b, dtype=pairs_df["id_b"].dtype),
            "cosine": pd.Series(out_c, dtype=np.float64),
        }))

    sided = _attach_pair_col(pairs, vecs_ds, id_col, vec_col)

    # bucketed judging, one Ray group per BUCKET not per pair (see
    # minhash_verified_pairs)
    from ..util import bucketed_group_apply

    def judge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_c = [], [], []
        for (a, b), grp in g.groupby(["id_a", "id_b"], sort=False):
            side = grp["side"].to_numpy()
            vals = dict(zip(side, grp["val"]))
            if 0 not in vals or 1 not in vals:
                continue
            va = np.asarray(vals[0], dtype=np.float64)
            vb = np.asarray(vals[1], dtype=np.float64)
            na, nb = np.linalg.norm(va), np.linalg.norm(vb)
            if na > 1e-12 and nb > 1e-12:
                cos = float(va @ vb / (na * nb))
                if cos >= tau:
                    out_a.append(a)
                    out_b.append(b)
                    out_c.append(cos)
        return pd.DataFrame({
            "id_a": pd.Series(out_a, dtype=g["id_a"].dtype),
            "id_b": pd.Series(out_b, dtype=g["id_b"].dtype),
            "cosine": pd.Series(out_c, dtype=np.float64),
        })

    return bucketed_group_apply(sided, ["id_a", "id_b"], judge_bucket,
                                n_buckets=256)


def prefix_filtered_pairs(ds, id_col: str, text_col: str, tau: float = 0.7,
                          shingle_n: int = 3,
                          rank_broadcast_cap: int = 4_000_000,
                          n_buckets: int = 256):
    """EXACT set-similarity join via prefix filtering (the
    AllPairs/PPJoin family — Bayardo et al. WWW'07, Xiao et al.
    WWW'08): any pair with shingle Jaccard ≥ tau must share a shingle
    inside BOTH docs' prefixes — the first ``|s| − ceil(tau·|s|) + 1``
    shingles under one GLOBAL rarest-first order — so grouping by
    prefix shingle and verifying inside groups is exhaustive by
    construction (deterministic; no LSH miss probability), while the
    fan-out is driven by RARE shingles only.

    Distributed shape: one map pass builds shingle-hash sets
    (materialized, reused); a combiner-pre-aggregated groupby computes
    global shingle frequencies, broadcast once as a rank LUT under
    ``rank_broadcast_cap`` (the LUT is vocabulary-sized — past the cap
    use ``minhash_verified_pairs``, the probabilistic scale path; this
    operator's contract is exactness where the vocabulary fits);
    prefix rows (one per prefix shingle, carrying the doc's set) meet
    one bucketed shuffle; verification and the pair-dedup are bucketed
    group applies. Shuffle volume is Σ_d ℓ_d·|s_d| — the known cost of
    exact ssjoin, paid only on the prefix fraction (≈ 1−tau of rows).
    """
    import math

    import pyarrow.compute as pc
    import ray

    from ..util import _bcast_get, bucketed_group_apply

    def mk_sets(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        sets = [_shingle_hashes(WS_RE.findall(t.lower()), shingle_n)
                for t in b[text_col].to_pylist()]
        return pa.table({id_col: ids,
                         "s": pa.array([s for s in sets],
                                       pa.list_(pa.uint64()))})

    sets = ds.map_batches(mk_sets, batch_format="pyarrow").materialize()

    def df_partial(b: pa.Table) -> pa.Table:
        # int64 bit-view: Ray's groupby pickles uint64 keys
        flat = pc.list_flatten(b["s"]).to_numpy(zero_copy_only=False) \
                 .view(np.int64)
        vals, cnts = np.unique(flat, return_counts=True)
        return pa.table({"sh": pa.array(vals, pa.int64()),
                         "cnt": pa.array(cnts.astype(np.int64))})

    from ..util import bucketed_sum
    vocab = bucketed_sum(sets.map_batches(df_partial,
                                          batch_format="pyarrow"),
                         ["sh"], {"cnt": "cnt"}).materialize()
    if vocab.count() > rank_broadcast_cap:
        raise ValueError(
            "shingle vocabulary exceeds rank_broadcast_cap — use "
            "minhash_verified_pairs (LSH) at this scale")
    vt = pa.concat_tables(
        [t for t in ray.get(vocab.to_arrow_refs())
         if t.num_rows and t.num_columns]).combine_chunks()
    sh = vt["sh"].to_numpy(zero_copy_only=False)
    cnt = vt["cnt"].to_numpy(zero_copy_only=False)
    o = np.argsort(sh, kind="stable")
    sh_sorted, cnt_sorted = sh[o], cnt[o]
    # rank: rarest first, shingle value as the tie-break (total order)
    rank_sorted = np.empty(len(sh_sorted), np.int64)
    rank_sorted[np.lexsort((sh_sorted, cnt_sorted))] = \
        np.arange(len(sh_sorted))
    lut_ref = ray.put((sh_sorted, rank_sorted))

    def prefix_rows(b: pa.Table, _lut=lut_ref) -> pa.Table:
        sh_s, rk = _bcast_get(_lut)
        ids_out, psh_out, set_out = [], [], []
        for did, s in zip(b[id_col].to_pylist(), b["s"].to_pylist()):
            s = np.asarray(s, np.uint64)
            r = rk[np.searchsorted(sh_s, s.view(np.int64))]
            ell = len(s) - math.ceil(tau * len(s)) + 1
            pref = s[np.argsort(r, kind="stable")[:ell]]
            ids_out.extend([did] * len(pref))
            psh_out.extend(pref.tolist())
            set_out.extend([s] * len(pref))
        return pa.table({"psh": pa.array(psh_out, pa.uint64()),
                         id_col: pa.array(ids_out),
                         "s": pa.array(set_out, pa.list_(pa.uint64()))})

    prefixed = sets.map_batches(prefix_rows, batch_format="pyarrow")

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for _, grp in g.groupby("psh", sort=False):
            if len(grp) < 2:
                continue
            ids = grp[id_col].to_numpy()
            ss = grp["s"].to_numpy()
            o = np.argsort(ids, kind="stable")
            ids, ss = ids[o], ss[o]
            for i in range(len(ids)):
                a = np.asarray(ss[i], np.uint64)
                for j in range(i + 1, len(ids)):
                    if ids[i] == ids[j]:
                        continue
                    bset = np.asarray(ss[j], np.uint64)
                    inter = np.intersect1d(a, bset,
                                           assume_unique=True).size
                    union = a.size + bset.size - inter
                    jac = inter / union if union else 1.0
                    if jac >= tau:
                        out_a.append(ids[i])
                        out_b.append(ids[j])
                        out_j.append(jac)
        return pd.DataFrame({
            "id_a": pd.Series(out_a, dtype=g[id_col].dtype),
            "id_b": pd.Series(out_b, dtype=g[id_col].dtype),
            "jaccard": pd.Series(out_j, dtype=np.float64)})

    pairs = bucketed_group_apply(prefixed, ["psh"], verify_bucket,
                                 n_buckets)

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"]).drop(columns=["_bucket"])

    return bucketed_group_apply(pairs, ["id_a", "id_b"], dedup_pairs,
                                n_buckets)


def _ed_le1(a: str, b: str) -> bool:
    """Exact edit-distance ≤ 1 check (two-pointer, no DP table)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def ed1_pairs(ds, col: str, n_buckets: int = 128):
    """Fuzzy string-match join: all UNORDERED pairs of distinct values
    of ``col`` with edit distance ≤ 1 (the data-cleaning primitive
    behind near-duplicate street spellings / typo clustering).

    Candidate generation is the deletion-neighborhood signature scheme
    (FastSS / SymSpell): sig(s) = {s} ∪ {s minus one char}; ed(a,b) ≤ 1
    guarantees a shared signature (substitution: delete the differing
    position from both; insertion: the shorter string IS a deletion of
    the longer), so grouping by signature hash is EXHAUSTIVE — hash
    collisions only add candidates, and every candidate is verified
    with the exact two-pointer check. Per-string fan-out is |s|+1
    signature rows carrying only the string itself; groups are
    near-duplicate neighborhoods, naturally tiny. For k > 1 the same
    shuffle shape takes Pass-Join-style segment signatures.
    """
    from ..functions.hashing import hash64_str
    from ..util import bucketed_group_apply

    def sigs(b: pa.Table) -> pa.Table:
        hs, names = [], []
        for s in b[col].to_pylist():
            variants = [s] + [s[:i] + s[i + 1:] for i in range(len(s))]
            hs.extend(np.uint64(hash64_str(v)).astype(np.int64)
                      for v in variants)
            names.extend([s] * len(variants))
        return pa.table({"sig": pa.array(hs, pa.int64()),
                         "name": pa.array(names, pa.string())})

    sig_rows = ds.map_batches(sigs, batch_format="pyarrow")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("sig", sort=False):
            names = sorted(set(grp["name"]))
            for i in range(len(names)):
                for j in range(i + 1, len(names)):
                    if _ed_le1(names[i], names[j]):
                        out_a.append(names[i])
                        out_b.append(names[j])
        return pd.DataFrame({"name_a": pd.Series(out_a, dtype=object),
                             "name_b": pd.Series(out_b, dtype=object)})

    pairs = bucketed_group_apply(sig_rows, ["sig"], verify, n_buckets)

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["name_a", "name_b"]) \
                .drop(columns=["_bucket"])

    return bucketed_group_apply(pairs, ["name_a", "name_b"], dedup_pairs,
                                n_buckets)
