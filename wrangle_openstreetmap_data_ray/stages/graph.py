"""Iterative graph analytics over an edge Dataset — PageRank power
iteration as the template for any fixed-point computation whose state is
a node-keyed table.

Two regimes, gated by the node count (same rule as
``util.broadcast_inner_join``):

- **Broadcast regime** (nodes ≤ ``broadcast_cap``): the node state
  (ids, 1/out-degree, ranks) is ``ray.put`` once per iteration and each
  iteration is ONE map-only pass over the materialized edge table —
  every block emits a pre-reduced ``(node, partial)`` table bounded by
  nodes-per-block, and the node-sized partials are merged on the driver
  (the HLL / heavy-hitters mergeable-partial pattern). Zero shuffles
  for the whole computation.
- **Distributed regime** (nodes > cap): per iteration the rank table is
  attached with a hash join and contributions reduced with one
  ``groupby(dst).sum`` shuffle — the real-cluster path when the node
  table outgrows a worker heap.

Both regimes compute the same floats up to summation order (pinned to
e6 fixed-point by callers; a regime-equality test compares rounded
values). Edges are treated as a MULTIGRAPH — parallel edges contribute
once each; the SQL twin matches by not deduplicating.

Float discipline: ranks iterate at full double precision with the same
expressions the SQL twin uses (``w = 1.0/deg`` precomputed;
``(1.0-d) + d*Σ w·r``); only the final output is rounded by callers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import _bcast_get, join_kwargs


def pagerank(edges, src: str = "src", dst: str = "dst", d: float = 0.85,
             n_iters: int = 3, broadcast_cap: int = 2_000_000):
    """PageRank with ``n_iters`` power iterations over directed edges.

    Assumes every node has at least one out-edge and one in-edge (true
    for symmetrized graphs — the caller's job otherwise); ranks start
    at 1.0 so the stationary sum equals node count. Returns a Dataset
    ``(node, r)`` with full-precision doubles.
    """
    edges = edges.materialize()   # touched once per iteration

    # out-degree: per-block partial counts, merged driver-side iff the
    # node table fits the broadcast cap (counted from the partials
    # themselves, never materializing more than node-sized data)
    def deg_partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.value_counts(b[src])
        return pa.table({src: vc.field("values"),
                         "deg_p": pc.cast(vc.field("counts"), pa.int64())})

    deg_parts = edges.map_batches(deg_partial, batch_format="pyarrow") \
                     .materialize()
    if deg_parts.count() <= broadcast_cap:
        return _pagerank_broadcast(edges, deg_parts, src, dst, d, n_iters)
    return _pagerank_distributed(edges, src, dst, d, n_iters, broadcast_cap)


def _pagerank_broadcast(edges, deg_parts, src, dst, d, n_iters):
    import ray

    tabs = [t for t in ray.get(deg_parts.to_arrow_refs())
            if t.num_rows and t.num_columns]
    dp = pa.concat_tables(tabs)
    ids_raw = dp[src].to_numpy(zero_copy_only=False)
    order = np.argsort(ids_raw, kind="stable")
    node_ids, starts = np.unique(ids_raw[order], return_index=True)
    deg = np.add.reduceat(
        dp["deg_p"].to_numpy(zero_copy_only=False)[order], starts)
    w = 1.0 / deg.astype(np.float64)
    n = len(node_ids)
    ids_ref = ray.put(node_ids)
    w_ref = ray.put(w)

    ranks = np.ones(n, np.float64)
    for _ in range(n_iters):
        r_ref = ray.put(ranks)

        def partial(b: pa.Table, _ids=ids_ref, _w=w_ref, _r=r_ref):
            ids = _bcast_get(_ids)
            si = np.searchsorted(ids, b[src].to_numpy(zero_copy_only=False))
            c = _bcast_get(_w)[si] * _bcast_get(_r)[si]
            di = np.searchsorted(ids, b[dst].to_numpy(zero_copy_only=False))
            uniq, inv = np.unique(di, return_inverse=True)
            sums = np.zeros(len(uniq), np.float64)
            np.add.at(sums, inv, c)
            return pa.table({"i": pa.array(uniq, pa.int64()),
                             "c": pa.array(sums, pa.float64())})

        parts = [t for t in ray.get(
            edges.map_batches(partial, batch_format="pyarrow")
                 .to_arrow_refs()) if t.num_rows and t.num_columns]
        sums = np.zeros(n, np.float64)
        for t in parts:   # node-sized per block; summed in block order
            np.add.at(sums, t["i"].to_numpy(zero_copy_only=False),
                      t["c"].to_numpy(zero_copy_only=False))
        ranks = (1.0 - d) + d * sums

    import ray.data as rd
    return rd.from_arrow(pa.table({
        "node": pa.array(node_ids, pa.int64()),
        "r": pa.array(ranks, pa.float64())}))


def _pagerank_distributed(edges, src, dst, d, n_iters, broadcast_cap):
    deg = edges.groupby(src).count().rename_columns({"count()": "deg"}) \
               .materialize()

    def weigh(b: pa.Table) -> pa.Table:
        w = 1.0 / b["deg"].to_numpy(zero_copy_only=False).astype(np.float64)
        return b.drop_columns(["deg"]).append_column(
            "w", pa.array(w, pa.float64()))

    edges_w = edges.join(deg, on=(src,), join_type="inner",
                         **join_kwargs()) \
        .map_batches(weigh, batch_format="pyarrow").materialize()

    def init_ranks(b: pa.Table) -> pa.Table:
        return pa.table({src: b[src],
                         "r": pa.array(np.ones(b.num_rows), pa.float64())})

    ranks = deg.map_batches(init_ranks, batch_format="pyarrow").materialize()

    for _ in range(n_iters):
        contrib_in = ranks.join(edges_w, on=(src,), join_type="inner",
                                **join_kwargs())

        def contrib(b: pa.Table) -> pa.Table:
            c = b["w"].to_numpy(zero_copy_only=False) \
                * b["r"].to_numpy(zero_copy_only=False)
            return pa.table({src: b[dst], "c": pa.array(c, pa.float64())})

        def update(b: pa.Table) -> pa.Table:
            s = b["sum(c)"].to_numpy(zero_copy_only=False)
            return pa.table({src: b[src],
                             "r": pa.array((1.0 - d) + d * s, pa.float64())})

        ranks = contrib_in.map_batches(contrib, batch_format="pyarrow") \
            .groupby(src).sum("c") \
            .map_batches(update, batch_format="pyarrow").materialize()

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"node": b[src], "r": b["r"]})

    return ranks.map_batches(finish, batch_format="pyarrow")
