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
import pandas as pd
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
    from ..util import grouped_agg_vec
    # vectorized map-side combiner — a plain groupby().count() row-walks
    # the edge volume in Python (NOTES_r4)
    deg = grouped_agg_vec(edges, [src], [(None, "count", "deg")]) \
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
            s = b["c"].to_numpy(zero_copy_only=False)
            return pa.table({src: b[src],
                             "r": pa.array((1.0 - d) + d * s, pa.float64())})

        # block-partial float sums change the summation tree vs the
        # row-ordered ray Sum; callers pin ranks to e6 fixed-point and
        # the regime-equality test compares rounded values
        ranks = grouped_agg_vec(
            contrib_in.map_batches(contrib, batch_format="pyarrow"),
            [src], [("c", "sum", "c")]) \
            .map_batches(update, batch_format="pyarrow").materialize()

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"node": b[src], "r": b["r"]})

    return ranks.map_batches(finish, batch_format="pyarrow")


def triangle_count(edges, a: str = "a", b: str = "b",
                   n_buckets: int = 256) -> int:
    """EXACT triangle count of an undirected simple graph (edges given as
    canonical ``a < b`` pairs; duplicates deduped here).

    Degree-ordered node-iterator (the MapReduce classic, Cohen 2009 /
    Suri-Vassilvitskii 2011): every edge is assigned to its endpoint
    that is EARLIER in (degree, id) order, each node emits the wedges
    among its owned higher-order neighbors, and a wedge is a triangle
    iff its closing pair is an edge. The degree ordering bounds per-node
    wedge fan-out by O(sqrt(|E|)) per edge even on skewed graphs — a hub
    of degree d owns only edges to even-higher-order nodes, so no
    degree² blowup at hot nodes.

    Shape: degree computation (one combiner groupby) + wedge generation
    and closure check in ONE bucketed cogroup on the candidate pair key
    — wedges and edges meet where they hash; nothing quadratic
    materializes globally. Degrees broadcast (node-count table; for a
    node table beyond worker heap, swap the broadcast for a hash-join
    attach — same wedge pass)."""
    import ray
    from ray.data.aggregate import Sum

    from ..util import _bcast_get, bucketed_group_apply

    def canon(batch: pa.Table) -> pa.Table:
        x = batch[a].to_numpy(zero_copy_only=False)
        y = batch[b].to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(x, y), np.maximum(x, y)
        m = lo != hi                       # drop self-loops
        t = pa.table({"a": pa.array(lo[m]), "b": pa.array(hi[m])})
        return t.group_by(["a", "b"]).aggregate([])   # block-level dedup

    ce = edges.map_batches(canon, batch_format="pyarrow")

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    ce = bucketed_group_apply(ce, ["a", "b"], dedup,
                              n_buckets=n_buckets).materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        ids = np.concatenate([batch["a"].to_numpy(zero_copy_only=False),
                              batch["b"].to_numpy(zero_copy_only=False)])
        u, c = np.unique(ids, return_counts=True)
        return pa.table({"node": pa.array(u), "deg": pa.array(c, pa.int64())})

    deg = ce.map_batches(deg_partial, batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("deg", alias_name="deg")) \
            .to_pandas()
    order = deg.sort_values(["deg", "node"], kind="mergesort")
    # broadcast (sorted node array, rank array) — vectorized searchsorted
    # lookups, no per-edge Python dict access (review finding)
    nodes_sorted = np.sort(order["node"].to_numpy())
    rank_of = np.empty(len(nodes_sorted), np.int64)
    rank_of[np.searchsorted(nodes_sorted, order["node"].to_numpy())] = \
        np.arange(len(nodes_sorted))
    ref = ray.put((nodes_sorted, rank_of))

    def orient(batch: pa.Table) -> pa.Table:
        """Each edge goes to its (degree, id)-earlier endpoint."""
        ns, ro = _bcast_get(ref)
        x = batch["a"].to_numpy(zero_copy_only=False)
        y = batch["b"].to_numpy(zero_copy_only=False)
        rx = ro[np.searchsorted(ns, x)]
        ry = ro[np.searchsorted(ns, y)]
        own = np.where(rx < ry, x, y)       # lower-order endpoint owns
        oth = np.where(rx < ry, y, x)
        return pa.table({"own": pa.array(own), "oth": pa.array(oth)})

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        """All owned edges of a node are co-located here (bucketed on
        owner) — emit every wedge among its higher-order neighbors."""
        w1, w2 = [], []
        for _, grp in g.groupby("own", sort=False):
            nb = np.sort(grp["oth"].to_numpy())
            m = len(nb)
            if m >= 2:
                iu, ju = np.triu_indices(m, 1)
                w1.append(nb[iu])
                w2.append(nb[ju])
        if not w1:
            from ..util import typed_empty_series
            e = typed_empty_series(g["own"].to_numpy())  # string node ids:
            return pd.DataFrame({"k1": e, "k2": e,       # object [:0] drifts
                                 "is_edge": np.empty(0, np.int8)})
        k1 = np.concatenate(w1)
        return pd.DataFrame({"k1": k1, "k2": np.concatenate(w2),
                             "is_edge": np.zeros(len(k1), np.int8)})

    oriented = ce.map_batches(orient, batch_format="pyarrow")
    wedge_rows = bucketed_group_apply(oriented, ["own"], wedges,
                                      n_buckets=n_buckets)

    def edge_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"k1": batch["a"], "k2": batch["b"],
                         "is_edge": pa.array(
                             np.ones(batch.num_rows, np.int8))})

    both = wedge_rows.union(ce.map_batches(edge_rows,
                                           batch_format="pyarrow"))

    def close(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(["k1", "k2"], sort=False)["is_edge"] \
              .agg(["max", "size"])
        tri = int(((gg["size"] - gg["max"]) * gg["max"]).sum())
        return pd.DataFrame({"n": [tri]})

    parts = bucketed_group_apply(both, ["k1", "k2"], close,
                                 n_buckets=n_buckets)
    agg = parts.aggregate(Sum("n")) or {}
    return int(agg.get("sum(n)") or 0)


def bfs_hops(edges, seeds, node: str = "node", src: str = "src",
             dst: str = "dst", max_rounds: int = 128,
             broadcast_cap: int = 2_000_000,
             single_task_cap: int = 5_000_000, n_buckets: int = 512):
    """Multi-source BFS hop distance over a directed edge Dataset →
    ``(node, hops)`` for every node reachable from ``seeds`` (hops = 0
    at a seed; unreachable nodes emit no row — the SQL-twin recursive
    CTE matches by construction).

    Two regimes (the ``connected_components_pairs`` rule):
    - edges ≤ ``single_task_cap``: consolidate edges ∪ seeds to one
      block and run a vectorized (factorize + CSR offsets + masked
      frontier) BFS inside ONE Ray task. Grid/cell graphs are already
      pre-aggregated — bounded by distinct cells, not points — so this
      is the common case and avoids paying one full distributed round
      per hop of eccentricity (a maze-like grid has diameter ~√cells).
    - beyond the cap: textbook distributed frontier expansion — each
      round semi-joins the static edge table against the (tiny)
      frontier via the capped broadcast (hash-join fallback past
      ``broadcast_cap``), drops already-visited targets with the
      distributed anti-join, and dedups the new frontier with one hash
      agg — so a round's exchanges are bounded by the frontier's
      out-edges, never the graph. Rounds = seed-set eccentricity;
      exceeding ``max_rounds`` raises instead of returning
      silently-short distances (the connected-components convergence
      rule)."""
    from ..util import anti_semi_join, broadcast_inner_join, cluster_cpus

    edges = edges.materialize()
    if edges.count() <= single_task_cap:
        # tag seeds as self-edges with is_seed=True so ONE dataset
        # carries both through the repartition(1)
        def seed_rows(b: pa.Table) -> pa.Table:
            return pa.table({src: b[node], dst: b[node],
                             "is_seed": pa.array(
                                 np.ones(b.num_rows, bool))})

        def edge_rows(b: pa.Table) -> pa.Table:
            return pa.table({src: b[src], dst: b[dst],
                             "is_seed": pa.array(
                                 np.zeros(b.num_rows, bool))})

        both = edges.map_batches(edge_rows, batch_format="pyarrow") \
            .union(seeds.map_batches(seed_rows, batch_format="pyarrow"))

        def local_bfs(b: pa.Table) -> pa.Table:
            is_seed = b["is_seed"].to_numpy(zero_copy_only=False)
            s = b[src].to_numpy(zero_copy_only=False)
            d = b[dst].to_numpy(zero_copy_only=False)
            codes, uniq = pd.factorize(np.concatenate([s, d]))
            nn = len(uniq)
            sc, dc = codes[:len(s)], codes[len(s):]
            seed_codes = np.unique(sc[is_seed])
            em = ~is_seed
            es, ed = sc[em], dc[em]
            order = np.argsort(es, kind="stable")
            es, ed = es[order], ed[order]
            starts = np.searchsorted(es, np.arange(nn))
            ends = np.searchsorted(es, np.arange(nn) + 1)
            hops = np.full(nn, -1, np.int64)
            hops[seed_codes] = 0
            frontier = seed_codes
            r = 0
            while len(frontier):
                r += 1
                if r > max_rounds:
                    raise RuntimeError(
                        f"bfs_hops: frontier still non-empty after "
                        f"max_rounds={max_rounds}; raise max_rounds")
                # gather all out-neighbors of the frontier (vectorized
                # ragged-span gather: repeat each span start, add the
                # within-span offset)
                cnt = ends[frontier] - starts[frontier]
                total = int(cnt.sum())
                if total:
                    within = np.arange(total) - np.repeat(
                        np.cumsum(cnt) - cnt, cnt)
                    cand = np.unique(
                        ed[np.repeat(starts[frontier], cnt) + within])
                else:
                    cand = np.empty(0, np.int64)
                frontier = cand[hops[cand] < 0]
                hops[frontier] = r
            m = hops >= 0
            if m.any():
                out_nodes = pa.array(uniq[m])
            else:   # empty object arrays infer Arrow null — type it
                from ..util import typed_empty_series
                out_nodes = pa.Array.from_pandas(typed_empty_series(uniq))
            return pa.table({node: out_nodes,
                             "hops": pa.array(hops[m], pa.int64())})

        return both.repartition(1).map_batches(
            local_bfs, batch_format="pyarrow", batch_size=None)

    def tag(dist):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                node: b[node],
                "hops": pa.array(np.full(b.num_rows, dist, np.int64))})
        return fn

    # round-state block counts MUST be pinned: labels is a union chain
    # and without the repartition each round's block count (and with it
    # per-round task-launch cost) compounds — measured 1 s → 64 s/round
    # by round 7 on an 80-node toy graph; flat 1.3 s/round pinned
    nparts = max(2, cluster_cpus() // 2)
    frontier = seeds.groupby(node).count().select_columns([node]) \
        .map_batches(tag(0), batch_format="pyarrow") \
        .repartition(nparts).materialize()
    labels = frontier
    for r in range(1, max_rounds + 1):
        f_keys = frontier.map_batches(
            lambda b: pa.table({src: b[node]}), batch_format="pyarrow")
        cand = broadcast_inner_join(edges, f_keys, on=src,
                                    max_rows=broadcast_cap)
        nxt = cand.map_batches(lambda b: pa.table({node: b[dst]}),
                               batch_format="pyarrow")
        nxt = anti_semi_join(nxt, labels, on=node, n_buckets=n_buckets)
        frontier = nxt.groupby(node).count().select_columns([node]) \
            .map_batches(tag(r), batch_format="pyarrow") \
            .repartition(nparts).materialize()
        if frontier.count() == 0:
            return labels
        labels = labels.union(frontier).repartition(nparts).materialize()
    raise RuntimeError(
        f"bfs_hops: frontier still non-empty after max_rounds="
        f"{max_rounds} (seed eccentricity exceeds it); raise max_rounds")


def sssp_costs(edges, seeds, node: str = "node", src: str = "src",
               dst: str = "dst", w: str = "w", budget: int | None = None,
               max_rounds: int = 256, broadcast_cap: int = 2_000_000,
               single_task_cap: int = 5_000_000, n_buckets: int = 512,
               init_cost: str | None = None):
    """Single/multi-source shortest-path COST over a weighted directed
    edge Dataset → ``(node, cost)`` for every node whose min path cost
    from ``seeds`` is ≤ ``budget`` (cost 0 at a seed — or the seed's
    ``init_cost`` column when given, which turns this into generalized
    label correction: e.g. grid Voronoi allocation encodes (hops, seed)
    lexicographically as hops·SHIFT + seed_key and seeds start at their
    own key; unreachable / over-budget nodes emit no row). Weights must
    be POSITIVE integers — exact in float64 and the round bound below
    depends on it.

    Two regimes (the ``bfs_hops`` rule):
    - edges ≤ ``single_task_cap``: one-task vectorized Bellman-Ford —
      per round ONE ``np.minimum.at`` scatter over all edges; budget
      pruning clamps over-budget partials to +inf so rounds ≤ budget
      (min weight 1) rather than diameter × weight-spread.
    - beyond the cap: frontier-relaxation rounds — improved labels join
      the static edge table (capped broadcast, hash-join fallback),
      messages min-reduce per target, and ONE bucketed pass merges
      candidates into the label table while emitting the improved rows
      as the next frontier. Exchanges are bounded by the frontier's
      out-edges; round state is repartition-pinned (see bfs_hops).
    Exceeding ``max_rounds`` raises (never silently-short costs)."""
    from ..util import (bucketed_group_apply, broadcast_inner_join,
                        cluster_cpus, typed_empty_series)

    edges = edges.materialize()
    hi = np.iinfo(np.int64).max if budget is None else int(budget)

    if edges.count() <= single_task_cap:
        def seed_rows(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            c0 = (pa.array(np.zeros(b.num_rows, np.int64))
                  if init_cost is None
                  else pc.cast(b[init_cost], pa.int64()))
            return pa.table({src: b[node], dst: b[node], w: c0,
                             "is_seed": pa.array(np.ones(b.num_rows,
                                                         bool))})

        def edge_rows(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({src: b[src], dst: b[dst],
                             w: pc.cast(b[w], pa.int64()),
                             "is_seed": pa.array(np.zeros(b.num_rows,
                                                          bool))})

        both = edges.map_batches(edge_rows, batch_format="pyarrow") \
            .union(seeds.map_batches(seed_rows, batch_format="pyarrow"))

        def local_bf(b: pa.Table) -> pa.Table:
            is_seed = b["is_seed"].to_numpy(zero_copy_only=False)
            s = b[src].to_numpy(zero_copy_only=False)
            d = b[dst].to_numpy(zero_copy_only=False)
            ww = b[w].to_numpy(zero_copy_only=False).astype(np.float64)
            codes, uniq = pd.factorize(np.concatenate([s, d]))
            nn = len(uniq)
            sc, dc = codes[:len(s)], codes[len(s):]
            em = ~is_seed
            es, ed, ew = sc[em], dc[em], ww[em]
            dist = np.full(nn, np.inf)
            # seed init = its w column (0 default / init_cost); min
            # handles duplicate seed rows
            np.minimum.at(dist, sc[is_seed], ww[is_seed])
            for _ in range(max_rounds):
                nd = dist[es] + ew
                nd[nd > hi] = np.inf      # budget prune
                new = dist.copy()
                np.minimum.at(new, ed, nd)
                if np.array_equal(new, dist):
                    break
                dist = new
            else:
                raise RuntimeError(
                    f"sssp_costs: not converged after max_rounds="
                    f"{max_rounds}; raise max_rounds or set a budget")
            m = np.isfinite(dist)
            if m.any():
                out_nodes = pa.array(uniq[m])
            else:
                out_nodes = pa.Array.from_pandas(typed_empty_series(uniq))
            return pa.table({node: out_nodes,
                             "cost": pa.array(dist[m].astype(np.int64),
                                              pa.int64())})

        return both.repartition(1).map_batches(
            local_bf, batch_format="pyarrow", batch_size=None)

    # ---- distributed frontier relaxation
    nparts = max(2, cluster_cpus() // 2)

    def tag0(b: pa.Table) -> pa.Table:
        return pa.table({node: b[node],
                         "cost": pa.array(np.zeros(b.num_rows, np.int64))})

    if init_cost is None:
        frontier = seeds.groupby(node).count().select_columns([node]) \
            .map_batches(tag0, batch_format="pyarrow") \
            .repartition(nparts).materialize()
    else:
        from ..util import grouped_agg_vec

        def retag(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({node: b[node],
                             "cost": pc.cast(b["cost"], pa.int64())})

        frontier = grouped_agg_vec(seeds, [node],
                                   [(init_cost, "min", "cost")]) \
            .map_batches(retag, batch_format="pyarrow") \
            .repartition(nparts).materialize()
    labels = frontier
    for _ in range(max_rounds):
        f_keys = frontier.map_batches(
            lambda b: pa.table({src: b[node], "_d": b["cost"]}),
            batch_format="pyarrow")
        cand = broadcast_inner_join(edges, f_keys, on=src,
                                    max_rows=broadcast_cap)

        def relax(b: pa.Table) -> pa.Table:
            nd = b["_d"].to_numpy(zero_copy_only=False) \
                + b[w].to_numpy(zero_copy_only=False)
            keep = nd <= hi
            return pa.table({
                node: b[dst].filter(pa.array(keep)),
                "cost": pa.array(nd[keep].astype(np.int64), pa.int64()),
                "_new": pa.array(np.ones(int(keep.sum()), bool))})

        msgs = cand.map_batches(relax, batch_format="pyarrow")

        def mark_old(b: pa.Table) -> pa.Table:
            return pa.table({node: b[node], "cost": b["cost"],
                             "_new": pa.array(np.zeros(b.num_rows, bool))})

        both_lab = labels.map_batches(mark_old, batch_format="pyarrow") \
            .union(msgs)

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            gg = g.groupby(g[node], sort=False)
            best = gg["cost"].min()
            # old best per node (inf when first seen this round)
            old = g[~g["_new"]].groupby(g.loc[~g["_new"], node])["cost"] \
                .min().reindex(best.index)
            improved = old.isna() | (best < old)
            return pd.DataFrame({node: best.index.to_numpy(),
                                 "cost": best.to_numpy(),
                                 "_new": improved.to_numpy()})

        merged = bucketed_group_apply(both_lab, [node], merge,
                                      n_buckets=n_buckets) \
            .repartition(nparts).materialize()
        def keep_new(b: pa.Table) -> pa.Table:
            m = b["_new"]
            return pa.table({node: b[node].filter(m),
                             "cost": b["cost"].filter(m)})

        frontier = merged.map_batches(keep_new, batch_format="pyarrow") \
            .repartition(nparts).materialize()
        labels = merged.map_batches(
            lambda b: pa.table({node: b[node], "cost": b["cost"]}),
            batch_format="pyarrow").repartition(nparts).materialize()
        if frontier.count() == 0:
            return labels
    raise RuntimeError(
        f"sssp_costs: frontier still non-empty after max_rounds="
        f"{max_rounds}; raise max_rounds or set a budget")


def k_core(edges, k: int, src: str = "src", dst: str = "dst",
           max_rounds: int = 12, nparts: int | None = None,
           low_broadcast_cap: int = 2_000_000):
    """Iterative k-core peel: repeatedly drop nodes of degree < k until
    a fixpoint, over a DIRECTED-SYMMETRIC edge Dataset (both directions
    present, no self-loops, distinct pairs — what ``radius_join``
    emits). Returns (src, deg) rows for the surviving core.

    Scale shape per round: one vectorized grouped count over the edge
    volume (arrow C++ map combiner); then the low-degree node set —
    bounded by the NODE count, which the peel only shrinks — is
    broadcast once and edges drop it in a single map-only pass (zero
    shuffles). Past ``low_broadcast_cap`` (a first round on a sparse
    10^12-edge graph can shed most nodes) the round falls back to TWO
    distributed anti-joins instead. Edge state re-pins to ``nparts``
    blocks each round (NOTES_r4: unpinned iterative chains compound
    per-round cost). Raises if the peel has not converged after
    ``max_rounds`` rounds — the SQL twin unrolls exactly that many
    peels, and peeling is idempotent once converged, so the contract
    only holds for converged runs."""
    import pyarrow.compute as pc
    import ray

    from ..util import anti_semi_join, cluster_cpus, grouped_count

    nparts = nparts or max(2, cluster_cpus() // 4)
    edges = edges.select_columns([src, dst]) \
                 .repartition(nparts).materialize()
    for i in range(max_rounds + 1):
        deg = grouped_count(edges, src, out="deg")
        low = deg.filter(expr=f"deg < {k}").materialize()
        n_low = low.count()
        if n_low == 0:
            return deg
        if i == max_rounds:
            raise RuntimeError(
                f"k_core did not converge within {max_rounds} rounds; "
                f"raise max_rounds (and unroll the oracle to match)")
        if n_low <= low_broadcast_cap:
            # per-block select AFTER the fetch: zero-row blocks of a
            # filtered dataset can keep the pre-select schema and break
            # a straight concat (same class as NOTES_r4 to_pandas drops)
            tabs = [t.select([src]) for t in ray.get(low.to_arrow_refs())
                    if t.num_rows]
            ids = pa.concat_tables(tabs)[src].combine_chunks()
            lref = ray.put(ids)

            def drop(b: pa.Table, _l=lref) -> pa.Table:
                ks = _bcast_get(_l)
                keep = pc.and_(pc.invert(pc.is_in(b[src], ks)),
                               pc.invert(pc.is_in(b[dst], ks)))
                return b.filter(keep)

            edges = edges.map_batches(drop, batch_format="pyarrow")
        else:
            edges = anti_semi_join(edges, low, on=src, keys_on=src)
            edges = anti_semi_join(edges, low, on=dst, keys_on=src)
        edges = edges.repartition(nparts).materialize()
