"""Interval overlap join — all (a, b) pairs whose [start, end] integer
intervals intersect, via temporal bucketing (the time-axis analogue of the
spatial cell join in ``stages/knn.py``).

Algorithm (ONE bounded-bucket hash shuffle, no dedup pass):
1. ``map_batches`` each side: replicate every interval into each
   ``bucket_us``-wide time bucket it touches, tagged with its side.
2. ``util.bucketed_group_apply`` on the time bucket: per bucket, a
   vectorized (A-chunk × B) overlap mask.
3. A pair may co-occur in several buckets; it is emitted ONLY from the
   canonical bucket containing ``max(a.start, b.start)`` — each pair
   appears in exactly one group's output, so no dedup shuffle is needed.

Scale shape: pick ``bucket_us`` near the typical interval length so the
replication factor stays O(1); narrow columns (id + two int64) cross the
shuffle; group count is bounded by ``n_buckets`` regardless of the time
span, so near-unique time buckets never pay per-group Python overhead.
Output size is Θ(overlapping pairs) — bound interval lengths accordingly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import bucketed_group_apply

_MAX_BUCKETS_PER_INTERVAL = 4096


def _explode_side(id_col: str, start_col: str, end_col: str, side: int,
                  bucket_us: int):
    def fn(batch: pa.Table) -> pa.Table:
        s = batch[start_col].to_numpy().astype(np.int64)
        e = batch[end_col].to_numpy().astype(np.int64)
        # keep the Arrow column (typed even at zero rows — np.asarray of an
        # empty pylist infers float64 and drifts the block schema)
        id_arr = batch[id_col].combine_chunks() \
            if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col]
        if np.any(e < s):
            raise ValueError("interval end < start")
        tb0, tb1 = s // bucket_us, e // bucket_us
        reps = (tb1 - tb0 + 1)
        if reps.size and int(reps.max()) > _MAX_BUCKETS_PER_INTERVAL:
            raise ValueError(
                f"an interval spans {int(reps.max())} buckets "
                f"(> {_MAX_BUCKETS_PER_INTERVAL}); raise bucket_us toward "
                f"the typical interval length")
        idx = np.repeat(np.arange(len(s)), reps)
        # bucket index within each interval: global position − run start
        off = np.arange(len(idx)) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        tb = tb0[idx] + off
        return pa.table({
            "tb": pa.array(tb, pa.int64()),
            "iid": id_arr.take(pa.array(idx, pa.int64())),
            "s": pa.array(s[idx], pa.int64()),
            "e": pa.array(e[idx], pa.int64()),
            "side": pa.array(np.full(len(idx), side, np.int8)),
        })
    return fn


def _bucket_overlap(bucket_us: int, out_a: str, out_b: str, chunk: int = 512):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("tb", kind="mergesort")
        tb = g["tb"].to_numpy()
        side = g["side"].to_numpy()
        s = g["s"].to_numpy()
        e = g["e"].to_numpy()
        ids = g["iid"].to_numpy()
        out_i, out_j = [], []
        new = np.empty(len(g), bool)
        if len(g):
            new[0] = True
            new[1:] = tb[1:] != tb[:-1]
        starts = np.append(np.nonzero(new)[0], len(g))
        for r in range(len(starts) - 1):
            lo, hi = starts[r], starts[r + 1]
            am = side[lo:hi] == 0
            bm = ~am
            if not am.any() or not bm.any():
                continue
            t = tb[lo]
            a_s, a_e, a_id = s[lo:hi][am], e[lo:hi][am], ids[lo:hi][am]
            b_s, b_e, b_id = s[lo:hi][bm], e[lo:hi][bm], ids[lo:hi][bm]
            for c in range(0, len(a_id), chunk):
                cs, ce, cid = a_s[c:c + chunk], a_e[c:c + chunk], a_id[c:c + chunk]
                m = ((cs[:, None] <= b_e[None, :])
                     & (b_s[None, :] <= ce[:, None])
                     & (np.maximum(cs[:, None], b_s[None, :]) // bucket_us == t))
                rows, cols = np.nonzero(m)
                if len(rows):
                    out_i.append(cid[rows])
                    out_j.append(b_id[cols])
        if not out_i:
            from ..util import typed_empty_series
            return pd.DataFrame({out_a: typed_empty_series(ids),
                                 out_b: typed_empty_series(ids)})
        return pd.DataFrame({out_a: np.concatenate(out_i),
                             out_b: np.concatenate(out_j)})
    return fn


def interval_overlap_join(ds_a, ds_b, bucket_us: int,
                          a_id: str = "a_id", b_id: str = "b_id",
                          a_start: str = "s", a_end: str = "e",
                          b_start: str = "s", b_end: str = "e",
                          out_a: str | None = None, out_b: str | None = None,
                          n_buckets: int = 1024):
    """All (a, b) id pairs whose integer [start, end] intervals overlap
    (closed ends: ``a.s <= b.e AND b.s <= a.e``) → Dataset of two id
    columns (named ``out_a``/``out_b``, defaulting to the input id column
    names). Exact; each pair emitted once."""
    out_a = out_a or a_id
    out_b = out_b or b_id
    ea = ds_a.map_batches(_explode_side(a_id, a_start, a_end, 0, bucket_us),
                          batch_format="pyarrow")
    eb = ds_b.map_batches(_explode_side(b_id, b_start, b_end, 1, bucket_us),
                          batch_format="pyarrow")
    return bucketed_group_apply(ea.union(eb), ["tb"],
                                _bucket_overlap(bucket_us, out_a, out_b),
                                n_buckets=n_buckets)
