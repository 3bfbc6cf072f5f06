"""As-of join — for each left row, the most recent right row with the same
key and right_ts <= left_ts (backward search, inclusive).

Ray Data has no native as-of join (task brief: implement as a composition
when semantics allow). Composition used here: tag both sides, union, ONE
bucketed hash shuffle on the key, then a vectorized per-bucket sweep —
sort by (key, ts, side) with right rows ordered before left rows at equal
timestamps, take a per-key running max over right timestamps, and read the
value off at each left row. Only the key, timestamps and the kept left
columns cross the shuffle.

Partitioning assumption: all rows of one key land in one shuffle bucket
(the same assumption as any per-key reduce).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import bucketed_group_apply

_NEG = np.iinfo(np.int64).min


def asof_join_last(left, right, key_col: str, left_ts: str, right_ts: str,
                   left_keep: list[str], out_col: str = "asof_ts",
                   n_buckets: int = 256):
    """left rows + ``out_col`` = max(right_ts | same key, right_ts <=
    left_ts) as nullable int64 epoch-µs (null when no right row precedes).

    Both inputs must already expose the join key as ``key_col``. The
    internal union columns are reserved names (``_aj_k/_aj_t/_aj_s``) so a
    ``left_keep`` entry named ``key``/``ts``/``side`` can never clobber the
    right side's timestamps (bug found in round-3 verify)."""
    if any(c.startswith("_aj_") for c in left_keep):
        raise ValueError("left_keep column names may not start with _aj_")
    # null-pad the right side with the LEFT schema's actual types (never a
    # hardcoded int64 — a string event id must survive the union)
    lsch = left.schema()
    ltypes = {n: (t if isinstance(t, pa.DataType) else pa.string())
              for n, t in zip(lsch.names, lsch.types)}

    def left_rows(b: pa.Table) -> pa.Table:
        cols = {"_aj_k": b[key_col],
                "_aj_t": pc.cast(b[left_ts], pa.int64()),
                "_aj_s": pa.array(np.ones(len(b), np.int8))}
        for c in left_keep:
            cols[c] = b[c]
        return pa.table(cols)

    def right_rows(b: pa.Table) -> pa.Table:
        cols = {"_aj_k": b[key_col],
                "_aj_t": pc.cast(b[right_ts], pa.int64()),
                "_aj_s": pa.array(np.zeros(len(b), np.int8))}
        for c in left_keep:
            cols[c] = pa.nulls(len(b), ltypes[c])
        return pa.table(cols)

    l = left.map_batches(left_rows, batch_format="pyarrow")
    r = right.map_batches(right_rows, batch_format="pyarrow")

    # the null-padded right rows upcast int64 left_keep columns to
    # float64 inside the pandas bucket frames; surviving (left) rows are
    # all non-null, so restore the source dtypes (same class as the
    # anti_semi_join / grid_dbscan driver-hash root cause)
    _pd_fix = {}
    for c in left_keep:
        t = ltypes[c]
        if pa.types.is_integer(t):
            _pd_fix[c] = t.to_pandas_dtype()
        elif pa.types.is_boolean(t):
            _pd_fix[c] = bool

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        # right rows first at equal (key, ts): backward-inclusive semantics
        g = g.sort_values(["_aj_k", "_aj_t", "_aj_s"], kind="mergesort")
        key = g["_aj_k"].to_numpy()
        ts = g["_aj_t"].to_numpy()
        side = g["_aj_s"].to_numpy()
        rts = np.where(side == 0, ts, _NEG)
        new_key = np.empty(len(g), bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        # segment-reset running max, fully vectorized (cython cummax)
        seg = np.cumsum(new_key) - 1
        run_max = pd.Series(rts).groupby(seg).cummax().to_numpy()
        lmask = side == 1
        out = g.loc[lmask, left_keep].copy()
        fix = {c: t for c, t in _pd_fix.items() if out[c].dtype != t}
        if fix:
            out = out.astype(fix)
        vals = run_max[lmask]
        col = pd.array(np.where(vals == _NEG, 0, vals), dtype="Int64")
        col[vals == _NEG] = pd.NA
        out[out_col] = col
        return out

    return bucketed_group_apply(l.union(r), ["_aj_k"], sweep, n_buckets)


def asof_join_next(left, right, key_col: str, left_ts: str, right_ts: str,
                   left_keep: list[str], out_col: str = "asof_ts",
                   n_buckets: int = 256):
    """Forward as-of join: for each left row, the EARLIEST right row with
    the same key and right_ts >= left_ts (inclusive). Expressed through
    the backward sweep on negated timestamps (min over a future window ==
    max over the negated past window) — same single-shuffle plan."""

    def negate(ts_col):
        def f(b: pa.Table) -> pa.Table:
            return b.set_column(
                b.schema.get_field_index(ts_col), ts_col,
                pc.negate_checked(pc.cast(b[ts_col], pa.int64())))
        return f

    l2 = left.map_batches(negate(left_ts), batch_format="pyarrow")
    r2 = right.map_batches(negate(right_ts), batch_format="pyarrow")
    out = asof_join_last(l2, r2, key_col, left_ts, right_ts, left_keep,
                         out_col, n_buckets)

    def unnegate(b: pd.DataFrame) -> pd.DataFrame:
        col = pd.array(b[out_col], dtype="Int64")   # may arrive as object
        b[out_col] = -col                           # nulls propagate
        if left_ts in left_keep:
            # the negated left timestamp rode through left_keep — restore it
            # (as int64 epoch-µs; the pre-negate cast already dropped the
            # original timestamp type)
            b[left_ts] = -b[left_ts].astype("int64")
        return b

    return out.map_batches(unnegate, batch_format="pandas")


def rolling_window_sum(ds, key_col: str, order_cols: list[str],
                       value_col: str, window: int,
                       out_col: str = "roll_sum", n_buckets: int = 512):
    """Per-key moving-window SUM over the last ``window`` rows — the SQL
    ``SUM(v) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW)`` shape, distributed: one bounded bucketed
    shuffle on the key co-locates each key's rows, then a vectorized
    pandas sort + grouped rolling sum per bucket. ``order_cols`` must be
    a TOTAL order within each key (add a unique id) or frame contents at
    ties are undefined. Use an integer-scaled value column for exact
    cross-engine comparison (a ≤window-term float sum is association-
    sensitive; an int64 sum is not)."""
    import pandas as pd

    from ..util import bucketed_group_apply

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order_cols, kind="mergesort")
        # rolling returns float64; int64-safe below 2^53 — assert cheap
        r = (g.groupby(key_col, sort=False, dropna=False)[value_col]
              .rolling(window, min_periods=1).sum()
              .reset_index(drop=True))
        vals = r.to_numpy()
        if np.any(np.abs(vals) >= 2.0 ** 53):
            raise ValueError("rolling sum exceeds exact float53 range; "
                             "rescale value_col")
        g = g.drop(columns=["_bucket"])
        g[out_col] = vals.astype(np.int64)
        return g

    return bucketed_group_apply(ds, [key_col], fn, n_buckets)
