"""Small execution-sizing helpers shared by stages.

Ray Data's hash-shuffle ``Dataset.join`` schedules roughly one
CPU-holding aggregator actor per output partition; asking for more
partitions than the cluster has CPUs deadlocks the streaming executor
(observed in this sandbox: num_partitions=8 on a 4-CPU session never
completes). Size partitions from the live cluster instead of a constant.
"""

from __future__ import annotations


def cluster_cpus(default: int = 4) -> int:
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def join_partitions(requested: int | None = None) -> int:
    """Partition count for hash joins: capped at half the cluster CPUs so
    the join aggregator pool never starves the upstream map stages, and
    floored at CPUs/8 — a size-derived request of 2 serializes the whole
    join through two aggregator actors (measured 11 s vs 3 s at 4
    partitions for the 40 MB images⋈geo attach at 32 CPUs)."""
    cap = max(2, cluster_cpus() // 2)
    floor = max(2, min(cluster_cpus() // 8, cap))
    if requested is None:
        return cap
    return max(floor, min(requested, cap))


# Hash-join aggregator actors default to 1 whole CPU each; on a small
# cluster the eager map_batches actor pools + two chained joins then
# deadlock waiting on CPUs that are never released. Fractional CPUs keep
# the aggregators schedulable everywhere (they are I/O+concat bound).
JOIN_AGG_REMOTE_ARGS = {"num_cpus": 0.25}


def join_kwargs(requested: int | None = None) -> dict:
    return {
        "num_partitions": join_partitions(requested),
        "aggregator_ray_remote_args": dict(JOIN_AGG_REMOTE_ARGS),
    }


def pool_size(requested: int, reserve: int = 2) -> int:
    """Actor-pool concurrency that always leaves ``reserve`` CPUs free for
    downstream shuffle/aggregator actors."""
    return max(1, min(requested, cluster_cpus() - reserve))


def stable_bucket(values, n_buckets: int):
    """Deterministic bucket id per value (vectorized, process-stable) —
    NEVER Python ``hash`` (salted per process; breaks shuffles/resume)."""
    import numpy as np
    import pandas as pd

    s = pd.Series(values)
    h = pd.util.hash_pandas_object(s, index=False).to_numpy()  # uint64, stable
    return (h % np.uint64(n_buckets)).astype(np.int32)


def bucketed_group_apply(ds, key_cols: list[str], bucket_fn,
                         n_buckets: int = 1024,
                         batch_format: str = "pandas"):
    """groupby-shuffle with a BOUNDED number of groups.

    ``groupby(keys).map_groups(fn)`` pays per-distinct-key Python overhead
    (one fn call + frame construction per group) — ruinous when keys are
    near-unique (LSH buckets, dedup keys). Instead: shuffle on
    ``hash(keys) % n_buckets`` and hand ``bucket_fn`` the WHOLE bucket,
    which processes all its key-groups vectorized (pandas groupby /
    numpy run detection). All rows of a key land in one bucket, so
    semantics match per-key grouping. Scale ``n_buckets`` with data volume
    (target ~64-256 MB per bucket at cluster scale).
    """
    import pandas as pd
    import pyarrow as pa

    def add_bucket(batch: pa.Table) -> pa.Table:
        if len(key_cols) == 1:
            vals = batch[key_cols[0]].to_pandas()
        else:
            vals = pd.Series(list(zip(*[batch[c].to_pylist() for c in key_cols])))
        return batch.append_column(
            "_bucket", pa.array(stable_bucket(vals, n_buckets)))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    # batch_format="pyarrow" hands the bucket to ``bucket_fn`` as a
    # pa.Table — use it when rows carry binary payloads (image bytes)
    # that a pandas conversion would copy into object arrays
    return bucketed.groupby("_bucket").map_groups(bucket_fn,
                                                  batch_format=batch_format)


def arrow_retype(ds):
    """Re-type a Dataset's blocks through pyarrow (identity map). Use at
    a query boundary when the tail stage emits PANDAS blocks (e.g. any
    ``bucketed_group_apply``): pandas 'string'-dtype columns otherwise
    survive ``Dataset.to_pandas()`` as the extension dtype while the
    DuckDB oracle's ``.df()`` yields object — a needless engine-vs-
    oracle dtype skew in the driver's comparator (round-5 dtype audit)."""
    import pyarrow as pa

    def ident(b: pa.Table) -> pa.Table:
        # drop the pandas-metadata the pandas→arrow conversion stashes in
        # the schema — Table.to_pandas honors it and would resurrect the
        # extension dtype
        return b.replace_schema_metadata(None)

    return ds.map_batches(ident, batch_format="pyarrow")


def checked_union(first, *rest, strict: bool = True):
    """``Dataset.union`` with schema validation (round-5 root cause of
    NOTES_r4's null-group-key anomaly). Ray 2.49's ``union`` performs NO
    schema check: unioning branches whose column-name sets differ
    *silently null-fills* the missing columns at execution (arrow field
    promotion inside the block bundler) while ``Dataset.schema()``
    reports just ONE branch's schema — whichever block answers first,
    which varies with block layout/parallelism. A name mismatch between
    branches therefore surfaces as layout-dependent NULL group keys in a
    downstream groupby — failing at the driver's parallelism but not in
    isolated repros. Pinned by test_union_schema_divergence_nullfills.

    Validates that every branch exposes the same column-name set before
    unioning. ``strict=True`` fetches schemas (may execute each branch's
    first block — fine at build time for correctness-critical unions);
    ``strict=False`` only checks the schemas already known."""
    sets = []
    for ds in (first, *rest):
        sch = ds.schema(fetch_if_missing=strict)
        sets.append(None if sch is None else (ds, set(sch.names)))
    known = [s for s in sets if s is not None]
    if known:
        base = known[0][1]
        for _, names in known[1:]:
            if names != base:
                raise ValueError(
                    "checked_union: branch schemas diverge — "
                    f"{sorted(base)} vs {sorted(names)}; Ray union would "
                    "silently null-fill the difference")
    out = first
    for ds in rest:
        out = out.union(ds)
    return out


def typed_empty_series(sample):
    """Zero-row pandas Series typed from a sample array/Series. An empty
    OBJECT column infers Arrow null type and drifts the unified block
    schema (NOTES_r3's recurring lesson) — string-ish samples become an
    explicit 'string' dtype; numeric dtypes are preserved. Use this for
    every bucketed-kernel early-return that can produce zero rows."""
    import numpy as np
    import pandas as pd
    a = np.asarray(sample)
    return (pd.Series([], dtype="string") if a.dtype == object
            else pd.Series(a[:0]))


def grouped_count_distinct(ds, group_cols: list[str], value_col: str,
                           out_col: str = "n_distinct",
                           n_buckets: int = 512):
    """EXACT ``COUNT(DISTINCT value)`` per group. Map-side combiner: each
    block is deduped to its unique (group, value) tuples BEFORE the
    shuffle (an Arrow group_by — repeated values never cross the wire);
    one bounded-bucket hash shuffle on the group key; per bucket, a
    vectorized pandas drop_duplicates + group size. Per-group value sets
    are never materialized on the driver — at any group cardinality the
    exchange carries at most the globally-unique tuple set.

    NULL values are excluded (SQL ``COUNT(DISTINCT)`` semantics); a group
    whose values are ALL null is therefore omitted from the output (the
    SQL row would read 0) — filter such groups upstream if they matter.
    NULL GROUP KEYS are kept (``dropna=False``), matching SQL GROUP BY's
    NULL group and the map-side Arrow ``group_by`` (round-3 ADVICE)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = list(group_cols) + [value_col]

    def pre(b: pa.Table) -> pa.Table:
        t = b.select(cols).filter(pc.is_valid(b[value_col]))
        return t.group_by(cols).aggregate([])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(cols)
        return (d.groupby(list(group_cols), sort=False, dropna=False)
                 .size().reset_index(name=out_col))

    deduped = ds.map_batches(pre, batch_format="pyarrow")
    return bucketed_group_apply(deduped, list(group_cols), per_bucket,
                                n_buckets=n_buckets)


def anti_semi_join(ds, keys, on: str, keys_on: str | None = None,
                   semi: bool = False, n_buckets: int = 512):
    """Distributed anti- (default) or semi-join: rows of ``ds`` whose
    ``on`` value does NOT (anti) / DOES (semi) appear in ``keys``.

    One bucketed hash shuffle; ``ds`` rows cross it once, ``keys`` ships
    only its key column (null-padded to ``ds``'s schema, types derived
    from the schema — never hardcoded). Null keys in ``ds`` are dropped
    (match SQL ``IN``/``NOT IN`` three-valued logic on non-null probes).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    keys_on = keys_on or on
    sch = ds.schema()
    # Ray's Schema.types: pyarrow DataTypes for arrow blocks, raw numpy /
    # `object` for pandas blocks — map the latter (pandas object == str here)
    fields = [(n, t if isinstance(t, pa.DataType) else pa.string())
              for n, t in zip(sch.names, sch.types)]

    def left_rows(b: pa.Table) -> pa.Table:
        return b.append_column("_aj", pa.array(np.zeros(len(b), np.int8)))

    def key_rows(b: pa.Table) -> pa.Table:
        arrs = {}
        for name, typ in fields:
            if name == on:
                arrs[name] = pc.cast(b[keys_on], typ)
            else:
                arrs[name] = pa.nulls(len(b), typ)
        return pa.table(arrs).append_column(
            "_aj", pa.array(np.ones(len(b), np.int8)))

    u = ds.map_batches(left_rows, batch_format="pyarrow").union(
        keys.map_batches(key_rows, batch_format="pyarrow"))

    # The null-padded key rows force pandas to upcast int64 columns to
    # float64 (int-with-NaN) inside the bucket frames; surviving rows are
    # all non-null ``ds`` rows, so cast each column back to its source
    # dtype — without this the join output silently carries float64 ids
    # downstream (the grid_dbscan_clusters driver-hash root cause: the
    # value 211247191 printed as 211247191.0 at the driver only).
    _pd_dtype = {}
    for name, typ in fields:
        if pa.types.is_integer(typ):
            _pd_dtype[name] = typ.to_pandas_dtype()
        elif pa.types.is_boolean(typ):
            _pd_dtype[name] = bool

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        has_key = g.groupby(on, sort=False)["_aj"].transform("max") == 1
        # pandas groupby drops NaN keys → transform yields NaN → ~(NaN==1)
        # is True, which would KEEP null-key probe rows in the anti-join;
        # drop them explicitly (SQL NOT IN three-valued logic)
        m = (has_key if semi else ~has_key) & (g["_aj"] == 0) & g[on].notna()
        out = g[m].drop(columns=["_aj", "_bucket"])
        fix = {c: t for c, t in _pd_dtype.items()
               if c in out.columns and out[c].dtype != t}
        return out.astype(fix) if fix else out

    return bucketed_group_apply(u, [on], fn, n_buckets)


# per-worker-process memo for broadcast state (join sides, bloom
# bitmaps), keyed by object-ref hex; bounded to a few entries (cleared
# when full) so long-lived workers serving many pipelines never
# accumulate dead tables (round-2 ADVICE on the analogous PIP cache)
_BCAST_JOIN_CACHE: dict = {}
_BCAST_CACHE_CAP = 4


def _bcast_get(ref):
    import ray
    key = ref.hex()
    v = _BCAST_JOIN_CACHE.get(key)
    if v is None:
        if len(_BCAST_JOIN_CACHE) >= _BCAST_CACHE_CAP:
            _BCAST_JOIN_CACHE.clear()
        v = _BCAST_JOIN_CACHE[key] = ray.get(ref)
    return v


def _broadcast_join(ds, small_ds, on: str, inner: bool, max_rows: int,
                    fallback_partitions: int | None = None):
    """Shared engine of ``broadcast_inner_join``/``broadcast_left_join``
    (round-3 VERDICT hygiene item — one implementation, two thin fronts).

    The small side is fetched once, ``ray.put`` once, and attached
    map-side via ``pc.index_in`` — the big side never crosses a shuffle.
    Falls back to the hash join when the small side exceeds ``max_rows``
    (count comes from parquet metadata — no scan), so the caller's
    pipeline stays correct when the "dimension" side grows.

    Requirements (checked): ``on`` must be unique in ``small_ds`` — with
    duplicates ``index_in`` would silently keep only the first match,
    which is a different join. Non-key column names must not collide."""
    import ray
    import pyarrow as pa
    import pyarrow.compute as pc

    name = "broadcast_inner_join" if inner else "broadcast_left_join"
    if small_ds.count() > max_rows:
        return ds.join(small_ds, on=(on,),
                       join_type="inner" if inner else "left_outer",
                       **join_kwargs(fallback_partitions))
    # groupby/sum outputs can contain zero-column empty blocks whose
    # schema differs from the data blocks — drop them before concat.
    # to_arrow_refs() hands back PANDAS blocks unconverted when a block
    # is empty (Ray skips empty blocks in map_batches, so an upstream
    # pandas stage's zero-row frames survive a pyarrow re-type) — seen
    # live via anti_semi_join-fed frontiers; convert or drop them here.
    tabs = []
    for t in ray.get(small_ds.to_arrow_refs()):
        if not isinstance(t, pa.Table):
            if len(t) == 0:
                continue
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows and t.num_columns:
            tabs.append(t)
    if not tabs:   # empty small side: keep schema, match zero rows
        sch = small_ds.schema()
        tabs = [pa.table({n: pa.array([], t)
                          for n, t in zip(sch.names, sch.types)})]
    small = pa.concat_tables(tabs).combine_chunks()
    if small.num_rows and \
            pc.count_distinct(small[on]).as_py() != small.num_rows:
        raise ValueError(f"{name}: key {on!r} is not unique in the small "
                         "side; use a hash join")
    overlap = (set(small.column_names) - {on}) & set(ds.schema().names)
    if overlap:
        raise ValueError(f"{name}: column collision {overlap}")
    ref = ray.put(small)

    def attach(b: pa.Table) -> pa.Table:
        t = _bcast_get(ref)
        idx = pc.index_in(b[on], t[on])
        if inner:
            mask = pc.is_valid(idx)
            b = b.filter(mask)
            idx = idx.filter(mask)
        rows = t.take(idx)   # left-outer: null idx → null small-side cols
        for col in t.column_names:
            if col != on:
                b = b.append_column(col, rows[col])
        return b

    return ds.map_batches(attach, batch_format="pyarrow")


def broadcast_inner_join(ds, small_ds, on: str, max_rows: int = 2_000_000,
                         fallback_partitions: int | None = None):
    """Inner join where the right side is a SMALL, unique-keyed dimension
    table — the scale rule "broadcast small sides instead of a shuffle
    join" made first-class: for the images⋈geo attach the byte-heavy
    image rows otherwise pay a full hash-shuffle exchange (measured 4.3 s
    for 40 MB at 32 CPUs vs ~0.3 s map-side) AND a second exchange at the
    next groupby. See ``_broadcast_join`` for the cap/uniqueness rules."""
    return _broadcast_join(ds, small_ds, on, inner=True, max_rows=max_rows,
                           fallback_partitions=fallback_partitions)


def broadcast_left_join(ds, small_ds, on: str, max_rows: int = 2_000_000):
    """LEFT-outer variant: every ``ds`` row survives; small-side columns
    are null where the key has no match (``pa.Table.take`` with null
    indices). The canonical use is attaching an aggregate back to its
    dimension table where "no rows aggregated" must surface as null/0
    rather than dropping the row (e.g. order counts per customer
    including zero-order customers)."""
    return _broadcast_join(ds, small_ds, on, inner=False, max_rows=max_rows)


def bloom_semi_filter(ds, keys_ds, on: str, keys_on: str | None = None,
                      n_bits: int = 1 << 23, n_hashes: int = 4):
    """Bloom-filter pre-filter for big⋈big joins with low key overlap.

    The keys side crosses the cluster ONCE as fixed-size per-block
    bitmaps (``n_bits/8`` bytes each, OR-merged on the driver while
    holding a single bitmap, then broadcast once); ``ds`` is filtered
    map-side before any shuffle. The filter has NO false negatives, so
    ``bloom_semi_filter(big, keys) ⋈ keys`` returns exactly the plain
    join's rows — only the (mostly matching) survivors pay the exchange.
    False-positive rate ≈ ``(1 − e^{−n_hashes·m/n_bits})^n_hashes`` for
    ``m`` distinct keys (~2.4% at the 8M-bit default with 1M keys);
    false positives cost shuffle bytes, never correctness. At larger key
    cardinalities scale ``n_bits`` (bitmap cost is fixed per block and
    tiny next to the shuffle it avoids).
    """
    import numpy as np
    import pyarrow as pa
    import ray

    from .functions.hashing import hash64_ints, hash64_str_array

    keys_on = keys_on or on
    words = n_bits // 64
    nb = np.uint64(n_bits)

    def col_hashes(col) -> np.ndarray:
        if pa.types.is_integer(col.type):
            return hash64_ints(col.to_numpy(zero_copy_only=False))
        return hash64_str_array([str(x) for x in col.to_pylist()])

    def positions(h: np.ndarray, i: int) -> np.ndarray:
        # double hashing: idx_i = (h1 + i·h2) mod n_bits, h2 odd
        h1 = h % nb
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        with np.errstate(over="ignore"):
            return (h1 + np.uint64(i) * h2) % nb

    def block_bitmap(b: pa.Table) -> pa.Table:
        bm = np.zeros(words, np.uint64)
        h = col_hashes(b[keys_on])
        for i in range(n_hashes):
            idx = positions(h, i)
            np.bitwise_or.at(bm, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    parts = keys_ds.map_batches(block_bitmap, batch_format="pyarrow")
    bm = np.zeros(words, np.uint64)
    for tref in parts.to_arrow_refs():        # stream the OR-merge
        for buf in ray.get(tref)["bm"].to_pylist():
            bm |= np.frombuffer(buf, np.uint64)
    ref = ray.put(bm)

    def probe(b: pa.Table) -> pa.Table:
        filt = _bcast_get(ref)
        h = col_hashes(b[on])
        keep = np.ones(len(h), bool)
        for i in range(n_hashes):
            idx = positions(h, i)
            word = filt[(idx >> np.uint64(6)).astype(np.int64)]
            keep &= ((word >> (idx & np.uint64(63)))
                     & np.uint64(1)).astype(bool)
        return b.filter(pa.array(keep))

    return ds.map_batches(probe, batch_format="pyarrow")


#: 1‰ of the uint64 hash space — the sampling unit shared with the SQL
#: twin (thresholds are permille × this, exact integers on both sides)
_SAMPLE_UNIT = (1 << 64) // 1000


def hash_stratified_sample(ds, key_col: str, rates_permille,
                           strata_col: str | None = None, seed: int = 0):
    """Deterministic Bernoulli-by-key sampling: keep a row iff
    ``splitmix64(key ^ seed) < permille × (2^64 // 1000)``.

    Unlike ``random_sample(frac, seed)`` (whose outcome depends on block
    layout and is not reproducible outside the engine), the decision is
    a pure function of the KEY, so it is: stable across parallelism /
    resume / re-runs; join-consistent (sample two tables by the same
    foreign key and the FK relation survives sampling); and exactly
    reproducible in SQL (splitmix64 reimplemented with HUGEINT modular
    arithmetic — see the paired oracle), which turns sampling from a
    rows-only check into a value-pinned one.

    ``rates_permille``: int (uniform) or dict strata→permille with
    ``strata_col`` (e.g. downsample frequent event types, keep rare
    ones). Rates are permille (0..1000); keys must be non-negative
    (SQL ``CAST(x AS UBIGINT)`` rejects negatives).
    """
    import numpy as np
    import pyarrow as pa

    from .functions.hashing import hash64_ints

    if isinstance(rates_permille, dict):
        if strata_col is None:
            raise ValueError("dict rates need strata_col")
        thr = {k: np.uint64(v * _SAMPLE_UNIT)
               for k, v in rates_permille.items()}
    else:
        thr = np.uint64(int(rates_permille) * _SAMPLE_UNIT)

    def fn(b: pa.Table) -> pa.Table:
        h = hash64_ints(b[key_col].to_numpy(zero_copy_only=False),
                        seed=seed)
        if isinstance(thr, dict):
            import pandas as pd
            t = pd.Series(b[strata_col].to_pandas()) \
                  .map(lambda s: thr.get(s, np.uint64(0))) \
                  .to_numpy(dtype=np.uint64)
        else:
            t = thr
        return b.filter(pa.array(h < t))

    return ds.map_batches(fn, batch_format="pyarrow")


def grouped_topk(ds, group_cols: list[str], k: int,
                 sort_keys: list[tuple[str, str]], n_buckets: int = 512):
    """Top-k rows PER GROUP — the SQL ``QUALIFY row_number() OVER
    (PARTITION BY g ORDER BY ...) <= k`` shape, distributed: a per-block
    pre-reduce keeps at most k rows per (group, block) so the shuffle
    carries O(groups × k) per block, then one bounded bucketed hash
    shuffle on the group key and a final per-group head(k). ``sort_keys``
    = [(col, "asc"|"desc"), ...]; make them total (add a unique tie
    column) or the row choice at rank boundaries is undefined."""
    import pandas as pd

    cols = [c for c, _ in sort_keys]
    asc = [d == "asc" for _, d in sort_keys]

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(cols, ascending=asc, kind="mergesort")
        return b.groupby(list(group_cols), sort=False, dropna=False).head(k)

    pre = ds.map_batches(local_topk, batch_format="pandas")

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(cols, ascending=asc, kind="mergesort")
        return (g.groupby(list(group_cols), sort=False, dropna=False).head(k)
                 .drop(columns=["_bucket"]))

    return bucketed_group_apply(pre, list(group_cols), bucket_topk, n_buckets)


def distributed_topk(ds, k: int, sort_keys: list[tuple[str, str]]):
    """Global top-k WITHOUT materializing the input on the driver.

    Each block emits its own top-k (``pc.select_k_unstable``); only the
    tiny partials (≤ k rows × n_blocks) reach the driver for one final
    merge. This is the scale-safe replacement for
    ``groupby().count().to_pandas().sort_values().head(k)`` — at 100 TB the
    distinct-key table (users/cells) can be billions of rows; here at most
    k rows per block ever leave the cluster. ``sort_keys`` must impose a
    total order (include tie-break columns). Returns a pandas DataFrame.
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    def block_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        return b.take(pc.select_k_unstable(b, k=k, sort_keys=sort_keys))

    parts = ds.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    cols = [c for c, _ in sort_keys]
    asc = [o == "ascending" for _, o in sort_keys]
    return parts.sort_values(cols, ascending=asc, kind="mergesort") \
                .head(k).reset_index(drop=True)


def pool_spec(requested: int, reserve: int = 2) -> tuple[int, int]:
    """Autoscaling actor-pool (min, max) for ``map_batches(Cls, ...)``.

    A FIXED pool of size == cluster CPUs deadlocks the streaming executor:
    the pool's actors are created eagerly and hold every CPU, so upstream
    task-based ops (read/repartition) can never produce the pool's input
    (observed in this sandbox at num_cpus=4, concurrency=4). min=1 +
    a reserve-capped max keeps every topology live while still scaling out.
    """
    return (1, pool_size(requested, reserve))


def default_pool() -> tuple[int, int]:
    """Cluster-sized autoscaling actor pool: min 1 (never deadlocks), max =
    CPUs minus reserve (fills the node when the stage is the bottleneck).
    A hardcoded (2, 8) cap silently limits every stage to 8 cores — the
    single biggest scaling bug found in this sandbox."""
    return (1, max(2, cluster_cpus() - 2))


def skyline(ds, min_cols: list[str], max_cols: list[str],
            batch_size: int = 2048, final_cap: int = 1_000_000):
    """Distributed skyline (Pareto frontier): rows not dominated by any
    other row (dominator ≤ on every ``min_cols``, ≥ on every
    ``max_cols``, strict somewhere).

    Classic two-phase shape: each block drops its locally-dominated
    rows (vectorized pairwise dominance — the global skyline is always
    a subset of the union of local skylines, since dominance survives
    restriction to any subset containing the dominator), then ONE final
    exact pass over the (typically tiny) union of survivors. The union
    is pulled driver-side under ``final_cap`` — past it the data is
    pathological (near-antichain) and the caller should pre-bucket by a
    dominance-compatible grid; we raise loudly rather than OOM.
    No arithmetic is performed on the values — comparisons only, so the
    result is engine-exact with no float discipline needed.
    """
    import numpy as np
    import pandas as pd

    def _survivors(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n <= 1:
            return df
        ok = np.ones((n, n), bool)
        for c in min_cols:
            v = df[c].to_numpy()
            ok &= v[:, None] <= v[None, :]       # ok[j,i]: j ≤ i on c
        for c in max_cols:
            v = df[c].to_numpy()
            ok &= v[:, None] >= v[None, :]
        strict = np.zeros((n, n), bool)
        for c in min_cols:
            v = df[c].to_numpy()
            strict |= v[:, None] < v[None, :]
        for c in max_cols:
            v = df[c].to_numpy()
            strict |= v[:, None] > v[None, :]
        dominated = (ok & strict).any(axis=0)
        return df[~dominated]

    local = ds.map_batches(_survivors, batch_format="pandas",
                           batch_size=batch_size)
    chunks, total = [], 0
    for b in local.iter_batches(batch_format="pandas"):
        chunks.append(b)
        total += len(b)
        if total > final_cap:
            raise ValueError("skyline union exceeds final_cap — "
                             "near-antichain data; pre-bucket first")
    if not chunks:
        return pd.DataFrame(columns=list(ds.schema().names))
    u = pd.concat(chunks, ignore_index=True)
    return _survivors(u).reset_index(drop=True)


def grouped_agg_vec(ds, keys: list[str], specs: list[tuple]):
    """Grouped aggregation with a VECTORIZED map-side combiner.

    ``ray.data.Dataset.groupby(...).aggregate(...)``'s sort-agg map side
    walks rows in Python (``TableBlock._aggregate`` → ``iter_rows``,
    ~10-30k rows/s/core regardless of block format — NOTES_r4) — fine
    when the input is already distinct-key-bounded, ruinous over data
    volume. This helper pre-reduces each block with pyarrow's C++
    ``Table.group_by`` and feeds ONLY the per-block partials (≤ distinct
    keys × blocks rows) into the ray groupby merge.

    ``specs``: (col, fn, alias) tuples with fn ∈ {sum, count, min, max};
    count ignores col. Semantics match the ray aggregates it replaces:
    sum/min/max skip nulls, count counts rows. Float sums change their
    summation tree (block partials first), so only use where the caller
    rounds (the repo's float-discipline) or sums are exact ints.
    """
    import pyarrow as pa
    from ray.data.aggregate import Max, Min, Sum

    pa_aggs, ren, merge = [], {}, []
    for col, fn, alias in specs:
        if fn == "count":
            pa_aggs.append(([], "count_all"))
            ren["count_all"] = alias
        else:
            pa_aggs.append((col, fn))
            ren[f"{col}_{fn}"] = alias
        merge.append({"sum": Sum, "count": Sum, "min": Min,
                      "max": Max}[fn](alias, alias_name=alias))

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(keys).aggregate(pa_aggs)
        # rename agg outputs BY NAME (column order — keys first vs last
        # — varies by pyarrow version; a positional rename mislabeled
        # the key column as the first agg alias)
        return g.rename_columns([ren.get(c, c) for c in g.column_names])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(keys if len(keys) > 1 else keys[0]).aggregate(*merge)


def grouped_count(ds, key: str, out: str = "cnt"):
    """``groupby(key).count()`` with the vectorized map-side combiner —
    see ``grouped_agg_vec`` (plain ray groupby-count row-walks the input
    volume in Python; this ships only per-block distinct-key partials)."""
    return grouped_agg_vec(ds, [key], [(None, "count", out)])


def bucketed_sum(ds, keys: list[str], sum_cols: dict, n_buckets: int = 512):
    """Exact per-key SUM via one bounded-bucket shuffle + a VECTORIZED
    pandas groupby. For merging per-block partials that are already
    distinct-keyed (vocab/df tables): ``grouped_agg_vec``'s map combiner
    can't shrink them further and ray's sort-agg would row-walk them in
    Python (NOTES_r4) — this path stays vectorized end-to-end.
    ``sum_cols``: {input_col: output_col}. Integer sums only (exact
    under any partitioning); float sums would change their tree."""
    def fn(g):
        agg = g.groupby(keys, sort=False, dropna=False)[list(sum_cols)] \
               .sum().reset_index()
        return agg.rename(columns=sum_cols)
    return bucketed_group_apply(ds, keys, fn, n_buckets)


def global_row_number(ds, sort_keys: list[tuple[str, str]],
                      out_col: str = "rn"):
    """Distributed ROW_NUMBER() OVER (ORDER BY ...) — 1-based global
    rank under a TOTAL order (include a unique tiebreak column or block
    boundaries make ranks ambiguous). Two passes, no driver data pull:
    a global sort range-partitions the rows; each sorted block ships
    ONE typed metadata row (its first key tuple + row count); the
    driver orders those O(blocks) partials under the same key order,
    prefix-sums the offsets, and broadcasts a first-key → offset map
    that the final map-only pass adds to each block's local 0..n-1
    index. Exactness relies on the total order: every block's first
    key tuple is globally unique, so the lookup is unambiguous.
    """
    import pandas as pd
    import pyarrow as pa

    import ray

    cols = [c for c, _ in sort_keys]
    asc = [d in ("asc", "ascending") for _, d in sort_keys]
    ordered = ds.sort(cols, descending=[not a for a in asc]) \
        .materialize()

    def block_meta(b: pa.Table) -> pa.Table:
        out = {c: b[c].slice(0, min(1, b.num_rows)) for c in cols}
        out["_n"] = pa.array([b.num_rows] if b.num_rows else [],
                             pa.int64())
        return pa.table(out)

    meta = ordered.map_batches(block_meta, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    meta = meta.sort_values(cols, ascending=asc, kind="mergesort")                .reset_index(drop=True)
    offs = meta["_n"].cumsum().shift(fill_value=0).astype("int64")
    omap = {tuple(r): int(o) for r, o in
            zip(meta[cols].itertuples(index=False, name=None), offs)}
    ref = ray.put(omap)

    def assign(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return b.append_column(out_col, pa.array([], pa.int64()))
        om = _bcast_get(ref)
        first = tuple(b[c][0].as_py() for c in cols)
        base = om[first]
        import numpy as np
        return b.append_column(
            out_col, pa.array(base + 1 + np.arange(b.num_rows,
                                                   dtype=np.int64),
                              pa.int64()))

    return ordered.map_batches(assign, batch_format="pyarrow",
                               batch_size=None)
