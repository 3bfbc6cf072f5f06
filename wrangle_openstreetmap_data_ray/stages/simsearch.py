"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk`` — the exact baseline: broadcast the (small) query
  matrix ONCE with ``ray.put``; every batch computes a vectorized
  (batch × queries) cosine matmul and emits only its per-batch top-k
  partials; a final per-query re-reduce keeps the global top-k. The full
  corpus is never materialized anywhere — the shuffle carries at most
  ``k × num_queries × num_blocks`` narrow rows.
- ``ivf_topk`` — the scale path: deterministic k-means (few Lloyd rounds on
  a driver-side sample), assign each vector to its nearest centroid in
  ``map_batches``, then search only the ``nprobe`` closest centroid
  partitions per query. Recall measured against brute force in tests.

Graft ops (task brief "Similarity search"); no reference analogue.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import pool_spec


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True).clip(1e-12)


class _BatchTopK:
    """Actor-pool stage: per-batch cosine top-k against the broadcast
    query matrix (fetched once per actor, not per batch)."""

    def __init__(self, queries_ref, id_col: str, vec_col: str, k: int):
        import ray
        q = ray.get(queries_ref) if hasattr(queries_ref, "hex") else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))   # (Q, D)
        self.id_col, self.vec_col, self.k = id_col, vec_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist())
        v = _normalize(np.asarray(batch[self.vec_col].to_pylist(), dtype=np.float64))
        sim = v @ self.q.T                                     # (B, Q)
        k = min(self.k, len(ids))
        # per-query partial top-k (argpartition = O(B) per query)
        part = np.argpartition(-sim, k - 1, axis=0)[:k]        # (k, Q)
        qn = self.q.shape[0]
        qid = np.repeat(np.arange(qn), k)
        rows = part.T.ravel()
        return pa.table({
            "query_id": pa.array(qid, pa.int64()),
            "vec_id": pa.array(ids[rows]),
            "score": pa.array(sim[rows, qid], pa.float64()),
        })


def _final_topk(k: int):
    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["score", "vec_id"], ascending=[False, True],
                             kind="mergesort").head(k)
    return reduce_group


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     concurrency: int = 4, query_chunk: int = 4096):
    """Exact cosine top-k per query row of ``queries`` (Q × D).

    A query table larger than ``query_chunk`` is partitioned across
    passes: each chunk is broadcast once and scanned in one pass (bounded
    (batch × chunk) sim matrix per worker), results union with query_id
    offsets — the large-query-table plan from the round-2 review. For a
    truly huge query SIDE (queries ≈ corpus), use the kNN-join style
    co-partitioning instead (this is top-k against a query LIST)."""
    import ray
    q = np.asarray(queries, dtype=np.float64)
    if len(q) > query_chunk:
        import pyarrow.compute as pcc
        parts = []
        for s in range(0, len(q), query_chunk):
            sub = brute_force_topk(ds, q[s:s + query_chunk], k, id_col,
                                   vec_col, concurrency, query_chunk)
            if s:
                def shift(b: pa.Table, off=s) -> pa.Table:
                    return b.set_column(
                        b.schema.get_field_index("query_id"), "query_id",
                        pcc.add(b["query_id"], off))
                sub = sub.map_batches(shift, batch_format="pyarrow")
            parts.append(sub)
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out
    qref = ray.put(q)
    partials = ds.map_batches(
        _BatchTopK, fn_constructor_args=(qref, id_col, vec_col, k),
        batch_format="pyarrow", batch_size=4096, concurrency=pool_spec(concurrency),
        num_cpus=1)
    return partials.groupby("query_id").map_groups(_final_topk(k),
                                                   batch_format="pandas")


# ----------------------------------------------------------------- IVF path

def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 5,
                    seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (normalized)."""
    s = _normalize(np.asarray(sample, dtype=np.float64))
    rng = np.random.default_rng(seed)
    cent = s[rng.choice(len(s), size=min(n_centroids, len(s)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(s @ cent.T, axis=1)
        for c in range(len(cent)):
            members = s[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


class _IVFAssignTopK:
    """Assign batch vectors to centroids; keep only vectors whose centroid
    is probed by ≥1 query, then partial top-k as in brute force."""

    def __init__(self, queries_ref, cent_ref, id_col, vec_col, k, nprobe):
        import ray
        self.q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))
        self.cent = np.asarray(ray.get(cent_ref), dtype=np.float64)
        self.id_col, self.vec_col, self.k = id_col, vec_col, k
        # probe membership as a dense (Q, C) boolean LUT, computed once per
        # actor — the per-batch kernel is then ONE matmul + ONE masked
        # argpartition across ALL queries (round-2 review: the per-query
        # Python loop + np.isin didn't scale to a large query table; for
        # query tables too big for one matmul, partition the queries across
        # several brute_force/IVF calls — each stays one pass over the data)
        sims = self.q @ self.cent.T                            # (Q, C)
        order = np.argsort(-sims, axis=1)[:, :nprobe]          # (Q, nprobe)
        self.probe_lut = np.zeros((len(self.q), len(self.cent)), dtype=bool)
        np.put_along_axis(self.probe_lut, order, True, axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].to_pylist())
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        v = _normalize(np.asarray(batch[self.vec_col].to_pylist(), dtype=np.float64))
        cassign = np.argmax(v @ self.cent.T, axis=1)           # (B,)
        sim = v @ self.q.T                                     # (B, Q)
        probed = self.probe_lut[:, cassign].T                  # (B, Q)
        sim = np.where(probed, sim, -np.inf)
        qn = len(self.q)
        k = min(self.k, len(ids))
        part = np.argpartition(-sim, k - 1, axis=0)[:k]        # (k, Q)
        qid = np.repeat(np.arange(qn), k)
        rows = part.T.ravel()
        score = sim[rows, qid]
        keep = np.isfinite(score)                              # drop unprobed
        return pa.table({"query_id": pa.array(qid[keep], pa.int64()),
                         "vec_id": pa.array(ids[rows[keep]]),
                         "score": pa.array(score[keep], pa.float64())})


def ivf_topk(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
             sample_rows: int = 2000, concurrency: int = 4):
    """Approximate cosine top-k: IVF with ``nprobe`` probed lists per query."""
    import ray
    sample = np.asarray(
        [r[vec_col] for r in ds.limit(sample_rows).take_all()], dtype=np.float64)
    cent = train_centroids(sample, n_centroids)
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    cref = ray.put(cent)
    partials = ds.map_batches(
        _IVFAssignTopK, fn_constructor_args=(qref, cref, id_col, vec_col, k, nprobe),
        batch_format="pyarrow", batch_size=4096, concurrency=pool_spec(concurrency),
        num_cpus=1)
    return partials.groupby("query_id").map_groups(_final_topk(k),
                                                   batch_format="pandas")


def kmeans_fit(ds, vec_col: str, id_col: str, k: int, n_iters: int = 2,
               broadcast_cap_bytes: int = 64 << 20):
    """Distributed Lloyd k-means over an embedding column — the standard
    scalable shape: centroids (k × d doubles, broadcast ``ray.put`` once
    per round) never outgrow ``broadcast_cap_bytes``; each round is ONE
    map-only pass where every block emits its (≤ k)-row partial
    (cluster, count, per-dim sums) and the k-sized partials are merged
    driver-side (the mergeable-partial pattern — no shuffle anywhere).

    Deterministic: init centroids are the vectors of the ``k`` smallest
    ids (distributed_topk — no data-order dependence); assignment ties
    break to the lowest cluster index (np.argmin). Raises on an empty
    cluster rather than silently diverging from the SQL twin. All math
    in float64 with the same expressions as the twin (explicit
    Σ(x_j − c_j)²); callers fix-point the output.

    Returns ``(centroids (k, d) float64, counts (k,) int64)`` of the
    FINAL assignment round (the means ARE that round's assignment).
    """
    import ray

    from ..util import _bcast_get, distributed_topk

    ds = ds.materialize()   # iterated over n_iters+1 times — read once
    seeds = distributed_topk(ds, k, [(id_col, "ascending")])
    C = np.stack([np.asarray(v, dtype=np.float64)
                  for v in seeds[vec_col]])
    if C.nbytes > broadcast_cap_bytes:
        raise ValueError("k × d centroid matrix exceeds broadcast cap")

    counts = None
    for _ in range(n_iters):
        c_ref = ray.put(C)

        def partial(b: pa.Table, _c=c_ref):
            cen = _bcast_get(_c)                       # (k, d)
            x = np.stack(b[vec_col].to_numpy(zero_copy_only=False)) \
                  .astype(np.float64)                  # (n, d)
            d2 = ((x[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)                  # ties -> lowest c
            kk = cen.shape[0]
            sums = np.zeros_like(cen)
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            keep = cnt > 0
            return pa.table({
                "c": pa.array(np.nonzero(keep)[0].astype(np.int64)),
                "cnt": pa.array(cnt[keep]),
                "sums": pa.array(list(sums[keep]),
                                 pa.list_(pa.float64()))})

        parts = [t for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow")
              .to_arrow_refs()) if t.num_rows and t.num_columns]
        sums = np.zeros_like(C)
        counts = np.zeros(len(C), np.int64)
        for t in parts:   # k-sized per block, merged in block order
            cs = t["c"].to_numpy(zero_copy_only=False)
            counts[cs] += t["cnt"].to_numpy(zero_copy_only=False)
            sums[cs] += np.stack(t["sums"].to_numpy(zero_copy_only=False))
        if (counts == 0).any():
            raise ValueError(f"empty cluster(s) {np.nonzero(counts == 0)[0]}"
                             " — choose a different k/init")
        C = sums / counts[:, None]
    return C, counts


def grouped_vector_mean(ds, vec_col: str, key_col: str,
                        key_cap: int = 100_000):
    """Per-key mean of an embedding column (class prototypes): each
    block emits a ≤distinct-keys-per-block partial (key, count, per-dim
    sums) and the key-sized partials merge driver-side — one map-only
    pass, no shuffle (keys must be a label-like column with ≤
    ``key_cap`` distinct values; raises loudly otherwise).

    Returns ``(keys (k,) sorted ascending, means (k, d) float64,
    counts (k,) int64)``.
    """
    import ray

    def partial(b: pa.Table) -> pa.Table:
        x = np.stack(b[vec_col].to_numpy(zero_copy_only=False)) \
              .astype(np.float64)
        k = b[key_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(k, return_inverse=True)
        sums = np.zeros((len(uniq), x.shape[1]))
        np.add.at(sums, inv, x)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({"k": pa.array(uniq),
                         "cnt": pa.array(cnt),
                         "sums": pa.array(list(sums),
                                          pa.list_(pa.float64()))})

    parts = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows and t.num_columns]
    acc: dict = {}
    for t in parts:   # key-sized per block, merged in block order
        ks = t["k"].to_numpy(zero_copy_only=False)
        cs = t["cnt"].to_numpy(zero_copy_only=False)
        ss = t["sums"].to_numpy(zero_copy_only=False)
        for k, c, s in zip(ks, cs, ss):
            if k in acc:
                acc[k][0] += c
                acc[k][1] += np.asarray(s)
            else:
                acc[k] = [int(c), np.asarray(s, np.float64).copy()]
            if len(acc) > key_cap:
                raise ValueError(f"more than {key_cap} distinct "
                                 f"{key_col!r} values — not a label-like "
                                 "column; shuffle-aggregate instead")
    keys = np.array(sorted(acc))
    counts = np.array([acc[k][0] for k in keys], np.int64)
    means = np.stack([acc[k][1] / acc[k][0] for k in keys])
    return keys, means, counts


def nearest_class_mean_confusion(ds, vec_col: str, label_col: str):
    """Nearest-class-mean evaluation (embedding-quality check): class
    prototypes from ``grouped_vector_mean`` are broadcast once and every
    vector is assigned to its nearest prototype (explicit Σ(x_j−c_j)²,
    ties to the lowest label) in a second map-only pass; the (label,
    pred) confusion counts reduce through one tiny groupby. Returns a
    Dataset ``(label, pred, n)``.
    """
    import ray

    from ..util import _bcast_get

    keys, means, _ = grouped_vector_mean(ds, vec_col, label_col)
    ref = ray.put((keys, means))

    def assign(b: pa.Table, _r=ref) -> pa.Table:
        ks, cen = _bcast_get(_r)
        x = np.stack(b[vec_col].to_numpy(zero_copy_only=False)) \
              .astype(np.float64)
        d2 = ((x[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
        pred = ks[np.argmin(d2, axis=1)]
        return pa.table({"label": b[label_col],
                         "pred": pa.array(pred)})

    from ..util import grouped_agg_vec
    return grouped_agg_vec(ds.map_batches(assign, batch_format="pyarrow"),
                           ["label", "pred"], [(None, "count", "n")])


def _dim_minmax(ds, vec_col: str):
    """Global per-dimension (min, max) as float64 — per-block partials
    (two dim-length rows each) merged on the driver; one narrow pass."""
    def partial(b: pa.Table) -> pa.Table:
        m = np.stack(b[vec_col].to_numpy(zero_copy_only=False)) \
              .astype(np.float64)
        return pa.table({"mn": pa.array(m.min(axis=0)),
                         "mx": pa.array(m.max(axis=0)),
                         "j": pa.array(np.arange(m.shape[1], dtype=np.int64))})

    mn, mx = None, None
    for batch in ds.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        j = batch["j"].to_numpy()
        bmn, bmx = batch["mn"].to_numpy(), batch["mx"].to_numpy()
        d = int(j.max()) + 1
        if mn is None:
            mn = np.full(d, np.inf)
            mx = np.full(d, -np.inf)
        np.minimum.at(mn, j, bmn)
        np.maximum.at(mx, j, bmx)
    return mn, mx


def sq8_quantize(ds, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Scalar 8-bit quantization (the SQ8 of ANN indexes): per-dimension
    global [min, max] → 255 uniform steps; each vector becomes a
    dim-length uint8 code payload plus its max absolute reconstruction
    error (e6 fixed-point). Two passes: a dim-sized min/max exchange
    (driver-merged partials, the HLL pattern) + one broadcast map —
    vectors never cross a shuffle. Constant dimensions (max == min)
    quantize to code 0 with zero error on both engines."""
    import ray

    from ..util import _bcast_get
    mn, mx = _dim_minmax(ds, vec_col)
    if mn is None:
        raise ValueError("sq8_quantize: empty input dataset — nothing to "
                         "fit the per-dimension [min, max] on")
    sc = (mx - mn) / 255.0
    ref = ray.put((mn, sc))

    def quant(b: pa.Table) -> pa.Table:
        gmn, gsc = _bcast_get(ref)
        m = np.stack(b[vec_col].to_numpy(zero_copy_only=False)) \
              .astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            raw = np.floor((m - gmn) / gsc + 0.5)
        code = np.clip(np.where(gsc == 0.0, 0.0, raw), 0, 255)
        recon = gmn + code * gsc
        err = np.abs(m - recon).max(axis=1)
        return pa.table({
            id_col: b[id_col],
            "code": pa.array([c.tobytes() for c in
                              code.astype(np.uint8)], pa.binary()),
            "max_err_e6": pa.array(
                np.floor(err * 1e6 + 0.5).astype(np.int64)),
        })

    return ds.map_batches(quant, batch_format="pyarrow")


# ------------------------------------------------------------ product quant

def pq_train(ds, vec_col: str, id_col: str, m: int = 4, k: int = 16,
             n_iters: int = 2):
    """Product-quantization codebooks (Jégou et al., PQ for ANN): the
    d-dim embedding splits into ``m`` contiguous subspaces and each
    subspace learns its own ``k``-centroid Lloyd codebook — ALL m
    codebooks train in one map-only pass per round (each block emits a
    ≤ m·k-row partial of per-subdim sums; the m·k·d/m float state
    broadcasts once per round). Deterministic: init = subvectors of the
    k smallest ids, argmin ties break to the lowest code.

    Returns ``C (m, k, d//m) float64``. Same mergeable-partial shape as
    ``kmeans_fit`` — zero shuffles, bounded driver state."""
    import ray

    from ..util import _bcast_get, distributed_topk

    ds = ds.materialize()
    seeds = distributed_topk(ds, k, [(id_col, "ascending")])
    S = np.stack([np.asarray(v, dtype=np.float64) for v in seeds[vec_col]])
    d = S.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    C = S.reshape(k, m, dsub).transpose(1, 0, 2).copy()   # (m, k, dsub)

    for _ in range(n_iters):
        c_ref = ray.put(C)

        def partial(b: pa.Table, _c=c_ref):
            cen = _bcast_get(_c)                           # (m, k, dsub)
            if b.num_rows == 0:    # np.stack raises on zero-row blocks
                return pa.table({"s": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64()),
                                 "sums": pa.array([], pa.list_(pa.float64()))})
            x = np.stack(b[vec_col].to_numpy(zero_copy_only=False)) \
                  .astype(np.float64).reshape(-1, m, dsub)  # (n, m, dsub)
            sums = np.zeros_like(cen)
            cnts = np.zeros((m, k), np.int64)
            for s in range(m):
                d2 = ((x[:, s, None, :] - cen[s][None, :, :]) ** 2).sum(axis=2)
                a = np.argmin(d2, axis=1)
                np.add.at(sums[s], a, x[:, s, :])
                cnts[s] += np.bincount(a, minlength=k)
            si, ci = np.nonzero(cnts)
            return pa.table({
                "s": pa.array(si.astype(np.int64)),
                "c": pa.array(ci.astype(np.int64)),
                "cnt": pa.array(cnts[si, ci]),
                "sums": pa.array(list(sums[si, ci]), pa.list_(pa.float64()))})

        parts = [t for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
            if t.num_rows and t.num_columns]
        sums = np.zeros_like(C)
        cnts = np.zeros((m, k), np.int64)
        for t in parts:
            si = t["s"].to_numpy(zero_copy_only=False)
            ci = t["c"].to_numpy(zero_copy_only=False)
            cnts[si, ci] += t["cnt"].to_numpy(zero_copy_only=False)
            sums[si, ci] += np.stack(t["sums"].to_numpy(zero_copy_only=False))
        # empty clusters keep their previous centroid (standard Lloyd
        # practice; deterministic) — with id-ordered init the k seed
        # subvectors can be near-identical and round 1 may drain codes
        empty = cnts == 0
        cnts_safe = np.where(empty, 1, cnts)
        C = np.where(empty[..., None], C, sums / cnts_safe[..., None])
    return C


def pq_encode(ds, C: np.ndarray, vec_col: str = "embedding",
              id_col: str = "vec_id"):
    """Vectors → PQ codes: per row, the argmin centroid per subspace
    (ties → lowest code). Map-only; output (id, codes list<int64> of
    length m) — a d-dim float row compresses to m small ints, the 8-32×
    footprint cut that makes billion-scale ANN shippable."""
    import ray

    from ..util import _bcast_get
    m, k, dsub = C.shape
    c_ref = ray.put(C)

    def fn(b: pa.Table) -> pa.Table:
        cen = _bcast_get(c_ref)
        x = np.stack(b[vec_col].to_numpy(zero_copy_only=False)) \
              .astype(np.float64).reshape(-1, m, dsub) if b.num_rows else \
            np.empty((0, m, dsub))
        codes = np.empty((x.shape[0], m), np.int64)
        for s in range(m):
            d2 = ((x[:, s, None, :] - cen[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1)
        return pa.table({"vec_id": b[id_col],
                         "codes": pa.array(list(codes),
                                           pa.list_(pa.int64()))})
    return ds.map_batches(fn, batch_format="pyarrow")


def pq_adc_topk(ds, C: np.ndarray, queries: np.ndarray, k_top: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id"):
    """Asymmetric-distance (ADC) top-k over PQ codes: each batch encodes
    once, each QUERY precomputes its (m, k) subdistance LUT, and the
    approximate distance is one gather-sum over codes — no float matmul
    against the corpus. Per-block top-k partials reduce through
    ``util.grouped_topk`` (one bounded shuffle on query_id). Returns
    (query_id, vec_id, d2e6) — approximate by construction; recall is
    pinned by pytest against brute force."""
    import ray

    from ..util import _bcast_get, grouped_topk
    m, kc, dsub = C.shape
    q = np.asarray(queries, dtype=np.float64).reshape(len(queries), m, dsub)
    # (Q, m, k) LUT of squared subdistances
    lut = ((q[:, :, None, :] - C[None, :, :, :]) ** 2).sum(axis=3)
    ref = ray.put((C, lut))

    def fn(b: pa.Table) -> pa.Table:
        cen, L = _bcast_get(ref)
        n = b.num_rows
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": b[id_col],
                             "d2e6": pa.array([], pa.int64())})
        x = np.stack(b[vec_col].to_numpy(zero_copy_only=False)) \
              .astype(np.float64).reshape(n, m, dsub)
        codes = np.empty((n, m), np.int64)
        for s in range(m):
            d2 = ((x[:, s, None, :] - cen[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1)
        # approx distance: Σ_s LUT[q, s, codes[i, s]] → (Q, n)
        d = np.zeros((L.shape[0], n))
        for s in range(m):
            d += L[:, s, :][:, codes[:, s]]
        # block-local selection uses the SAME total order as the final
        # grouped_topk — (rounded d2e6, vec_id) — so the local cut can
        # never drop a row the global order would keep (review finding:
        # raw-float argpartition made ties at the k-th boundary
        # partition-dependent)
        d2e6_all = np.floor(d * 1e6 + 0.5).astype(np.int64)
        top = min(k_top, n)
        ids_np = np.asarray(b[id_col].to_pylist())
        qi_out, vi_out = [], []
        for qidx in range(L.shape[0]):
            row = pd.DataFrame({"d": d2e6_all[qidx], "v": ids_np})
            sel = row.sort_values(["d", "v"], kind="mergesort").index[:top]
            qi_out.append(np.full(top, qidx, np.int64))
            vi_out.append(np.asarray(sel, np.int64))
        qi = np.concatenate(qi_out)
        vi = np.concatenate(vi_out)
        ids = b[id_col].take(pa.array(vi, pa.int64()))
        return pa.table({"query_id": pa.array(qi, pa.int64()),
                         "vec_id": ids,
                         "d2e6": pa.array(d2e6_all[qi, vi], pa.int64())})

    parts = ds.map_batches(fn, batch_format="pyarrow")
    return grouped_topk(parts, ["query_id"], k_top,
                        [("d2e6", "asc"), ("vec_id", "asc")])


def ivfpq_topk(ds, queries: np.ndarray, k_top: int = 10,
               n_centroids: int = 8, nprobe: int = 2, m: int = 4,
               kc: int = 16, vec_col: str = "embedding",
               id_col: str = "vec_id", n_iters: int = 2):
    """IVF-PQ approximate top-k (the Jégou et al. 2011 billion-scale
    composition): coarse L2 centroids partition the corpus into inverted
    lists; PQ codebooks train on the RESIDUALS (x − centroid), so codes
    spend their bits on within-list variation; each query probes only
    its ``nprobe`` nearest lists with a per-(query, list) LUT built from
    the query residual. Everything is map-only over the corpus — coarse
    training is the zero-shuffle mergeable-partial k-means, PQ training
    reuses ``pq_train`` on the residual column, and the scan emits
    block-local top-k partials in the SAME (d2e6, vec_id) total order
    the final ``grouped_topk`` uses. Approximate by construction —
    recall vs brute force is the pytest contract."""
    import ray

    from ..util import _bcast_get, grouped_topk
    cent, _counts = kmeans_fit(ds, vec_col, id_col, n_centroids,
                               n_iters=n_iters)
    cref = ray.put(cent)

    def resid(b: pa.Table) -> pa.Table:
        cc = _bcast_get(cref)
        if b.num_rows == 0:
            return pa.table({id_col: b[id_col],
                             "ivf_list": pa.array([], pa.int64()),
                             "residual": pa.array([],
                                                  pa.list_(pa.float64()))})
        x = np.stack(b[vec_col].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        d2 = ((x[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
        li = np.argmin(d2, axis=1)
        r = x - cc[li]
        return pa.table({id_col: b[id_col],
                         "ivf_list": pa.array(li, pa.int64()),
                         "residual": pa.array(list(r),
                                              pa.list_(pa.float64()))})

    rds = ds.map_batches(resid, batch_format="pyarrow")
    C = pq_train(rds, "residual", id_col, m=m, k=kc, n_iters=n_iters)
    mm, kcc, dsub = C.shape
    q = np.asarray(queries, dtype=np.float64)
    qd2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = np.argsort(qd2, axis=1, kind="stable")[:, :nprobe]   # (Q, P)
    qr = q[:, None, :] - cent[probes]                             # (Q, P, d)
    qrs = qr.reshape(len(q), nprobe, mm, dsub)
    lut = ((qrs[:, :, :, None, :] - C[None, None, :, :, :]) ** 2) \
        .sum(axis=4)                                              # (Q,P,m,k)
    ref = ray.put((cent, C, probes, lut))

    def scan(b: pa.Table) -> pa.Table:
        cc, cen, prb, L = _bcast_get(ref)
        n = b.num_rows
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": b[id_col],
                             "d2e6": pa.array([], pa.int64())})
        x = np.stack(b[vec_col].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        d2c = ((x[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
        li = np.argmin(d2c, axis=1)
        r = (x - cc[li]).reshape(n, mm, dsub)
        codes = np.empty((n, mm), np.int64)
        for s in range(mm):
            dd = ((r[:, s, None, :] - cen[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(dd, axis=1)
        ids_np = np.asarray(b[id_col].to_pylist())
        qi_out, vi_out, de_out = [], [], []
        for qidx in range(len(prb)):
            for p in range(prb.shape[1]):
                rows = np.nonzero(li == prb[qidx, p])[0]
                if not len(rows):
                    continue
                d = np.zeros(len(rows))
                for s in range(mm):
                    d += L[qidx, p, s][codes[rows, s]]
                de = np.floor(d * 1e6 + 0.5).astype(np.int64)
                row = pd.DataFrame({"d": de, "v": ids_np[rows],
                                    "i": rows})
                sel = row.sort_values(["d", "v"], kind="mergesort") \
                    .head(min(k_top, len(rows)))
                qi_out.append(np.full(len(sel), qidx, np.int64))
                vi_out.append(sel["i"].to_numpy())
                de_out.append(sel["d"].to_numpy())
        if not qi_out:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": b[id_col].slice(0, 0),
                             "d2e6": pa.array([], pa.int64())})
        qi = np.concatenate(qi_out)
        vi = np.concatenate(vi_out).astype(np.int64)
        de = np.concatenate(de_out)
        return pa.table({"query_id": pa.array(qi, pa.int64()),
                         "vec_id": b[id_col].take(pa.array(vi)),
                         "d2e6": pa.array(de, pa.int64())})

    parts = ds.map_batches(scan, batch_format="pyarrow")
    return grouped_topk(parts, ["query_id"], k_top,
                        [("d2e6", "asc"), ("vec_id", "asc")],
                        n_buckets=64)


def kcenter_select(ds, id_col: str, vec_col: str, k: int) -> pd.DataFrame:
    """Greedy farthest-first traversal (Gonzalez 1985 2-approximate
    k-center) — the DIVERSE-SUBSET selection primitive for training-data
    curation: seed with the smallest id, then k−1 rounds each add the
    point maximizing its distance to the chosen set. Every round is one
    streaming pass (centers broadcast, ≤ m×D ints) whose blocks emit a
    single top-1 partial, so only O(blocks) rows ever reach the driver;
    total cost k passes, no shuffle. Distances are EXACT integer
    squared-L2 over the caller's fixed-point ``vec_col`` (list<int64>) —
    deterministic under any partitioning and reproducible in SQL.
    Callers must size the fixed point so D·span² fits int64.

    Returns pandas (rank 1..k, id, d2_sel) where d2_sel is the selected
    point's distance-to-set at selection time (0 for the seed) — the
    coverage-radius curve a curator reads off."""
    import ray

    from ..util import _bcast_get, distributed_topk

    ds = ds.materialize()           # k passes over the projected input
    seed = distributed_topk(ds, 1, [(id_col, "ascending")])
    ids = [seed[id_col].iloc[0]]
    centers = [np.asarray(seed[vec_col].iloc[0], dtype=np.int64)]
    d2s = [0]
    for _ in range(1, k):
        ref = ray.put(np.stack(centers))

        def dmin(b: pa.Table, _r=ref) -> pa.Table:
            if not b.num_rows:   # np.stack raises on an empty block
                return pa.table({id_col: b[id_col],
                                 vec_col: b[vec_col],
                                 "d2": pa.array([], pa.int64())})
            C = _bcast_get(_r)                       # (m, D) int64
            X = np.stack(b[vec_col].to_numpy(zero_copy_only=False)) \
                .astype(np.int64)
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2) \
                .min(axis=1)
            return pa.table({id_col: b[id_col],
                             vec_col: b[vec_col],
                             "d2": pa.array(d2, pa.int64())})

        top = distributed_topk(
            ds.map_batches(dmin, batch_format="pyarrow"), 1,
            [("d2", "descending"), (id_col, "ascending")])
        ids.append(top[id_col].iloc[0])
        centers.append(np.asarray(top[vec_col].iloc[0], dtype=np.int64))
        d2s.append(int(top["d2"].iloc[0]))
    return pd.DataFrame({"rank": np.arange(1, k + 1, dtype=np.int64),
                         id_col: ids,
                         "d2_sel": np.asarray(d2s, np.int64)})
