"""Text-analysis stages over a documents table (task brief: language-ID,
quality scoring, token counting, fingerprinting) — actor-pool
``map_batches`` wrappers around ``functions/text.py`` kernels (regexes
compiled once per actor at import; state is the compiled patterns)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import text as tx


class TextAnalyze:
    """One-pass per-batch text analysis: token counts, quality features,
    language ID, content fingerprint. Emits narrow feature columns (the
    text itself is dropped unless keep_text=True)."""

    def __init__(self, text_col: str = "text", keep_text: bool = False):
        self.text_col = text_col
        self.keep_text = keep_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        feats = tx.quality_features(texts)
        out = batch if self.keep_text else batch.drop_columns([self.text_col])
        out = out.append_column("n_tokens_ws",
                                pa.array(tx.token_count_ws(texts), pa.int64()))
        out = out.append_column("n_tokens_bpe",
                                pa.array(tx.token_count_bpe(texts), pa.int64()))
        for name in ("mean_token_len", "punct_ratio", "upper_ratio",
                     "stopword_ratio", "quality_score"):
            out = out.append_column(name, pa.array(feats[name], pa.float64()))
        out = out.append_column("lang_pred", pa.array(tx.langid(texts)))
        out = out.append_column(
            "fingerprint",
            pa.array(tx.fingerprint64(texts).astype(np.int64), pa.int64()))
        return out


def analyze_text(ds, text_col: str = "text", keep_text: bool = False,
                 concurrency=None, batch_size: int = 1024):
    if concurrency is not None:
        return ds.map_batches(TextAnalyze,
                              fn_constructor_args=(text_col, keep_text),
                              batch_format="pyarrow", batch_size=batch_size,
                              concurrency=concurrency, num_cpus=1)

    def task(batch):
        return TextAnalyze(text_col, keep_text)(batch)
    return ds.map_batches(task, batch_format="pyarrow", batch_size=batch_size)


def tfidf_top_terms(ds, n_docs: int, doc_col: str = "doc_id",
                    text_col: str = "text", k: int = 3,
                    vocab_broadcast_cap: int = 2_000_000,
                    n_buckets: int = 256):
    """Corpus TF-IDF: per-document top-``k`` terms by ``tf · ln(N/df)``.

    Distributed shape (the two corpus-wide statistics never meet a
    row-level shuffle of the text):
    1. **tf pass** (map-only): tokenize each doc (whitespace tokens — the
       SQL twin's ``regexp_extract_all(text,'\\S+')``) and emit one
       ``(doc, token, tf)`` row per DISTINCT doc-term — materialized once
       (narrow: int, dict-encodable str, int) so the df branch and the
       score branch don't re-tokenize.
    2. **df pass**: per-batch partial distinct-doc counts per token
       (map-side combiner), then one ``groupby(token).sum`` shuffle whose
       rows are bounded by vocab-per-batch, not token occurrences.
    3. **attach**: df is a sub-linear "dimension" side → broadcast
       map-side under ``vocab_broadcast_cap`` (hash-join fallback past
       it, same rule as ``util.broadcast_inner_join``).
    4. **score + top-k**: fixed-point ``floor(tf·ln(N/df)·1e4 + 0.5)``
       (float discipline — ordering uses the ROUNDED integer on both
       sides so engine ulps can't reorder ties), per-doc top-k via
       ``bucketed_group_apply`` (bounded group overhead at corpus scale).

    ``n_docs`` is passed in (metadata-only count at the call site) so
    this stage adds no extra pass over the corpus.
    """
    import pyarrow.compute as pc

    from ..util import broadcast_inner_join, bucketed_group_apply

    def tf_rows(batch: pa.Table) -> pa.Table:
        from collections import Counter
        docs, toks, tfs = [], [], []
        ids = batch[doc_col].to_pylist()
        for did, t in zip(ids, batch[text_col].to_pylist()):
            c = Counter(tx.WS_RE.findall(t))
            docs.extend([did] * len(c))
            toks.extend(c.keys())
            tfs.extend(c.values())
        return pa.table({doc_col: pa.array(docs, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "tf": pa.array(tfs, pa.int64())})

    tf = ds.map_batches(tf_rows, batch_format="pyarrow").materialize()

    def df_partial(batch: pa.Table) -> pa.Table:
        # rows are distinct (doc, token) pairs → count per token IS the
        # per-batch distinct-doc partial
        vc = pc.value_counts(batch["token"])
        return pa.table({"token": vc.field("values"),
                         "df_part": pc.cast(vc.field("counts"), pa.int64())})

    from ..util import bucketed_sum
    df = bucketed_sum(tf.map_batches(df_partial, batch_format="pyarrow"),
                      ["token"], {"df_part": "df"}).materialize()

    scored_in = broadcast_inner_join(tf, df, on="token",
                                     max_rows=vocab_broadcast_cap)

    def score(batch: pa.Table) -> pa.Table:
        tf_v = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_v = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.floor(tf_v * (np.log(float(n_docs)) - np.log(df_v))
                     * 1e4 + 0.5).astype(np.int64)
        return batch.drop_columns(["tf", "df"]).append_column(
            "score_e4", pa.array(s, pa.int64()))

    scored = scored_in.map_batches(score, batch_format="pyarrow")

    def topk(g):
        g = g.sort_values([doc_col, "score_e4", "token"],
                          ascending=[True, False, True], kind="mergesort")
        return g.groupby(doc_col, sort=False).head(k) \
                .drop(columns=["_bucket"])

    return bucketed_group_apply(scored, [doc_col], topk, n_buckets)


def collect_shingle_hashes(ds, text_col: str = "text", shingle_n: int = 3,
                           cap: int = 5_000_000) -> np.ndarray:
    """Distinct word-``shingle_n``-gram hashes of a (small) benchmark
    dataset: per-block distinct partials stream to the driver and merge
    under a hard ``cap`` (benchmark/eval sets are small by definition —
    exceeding the cap means the wrong side was passed). Returns a SORTED
    int64 array ready for ``np.searchsorted`` membership tests.

    Docs with fewer than ``shingle_n`` tokens yield NO shingles (matching
    SQL n-gram semantics — no padding)."""
    def part(b: pa.Table) -> pa.Table:
        out = []
        for t in b[text_col].to_pylist():
            toks = tx.WS_RE.findall(t or "")
            if len(toks) >= shingle_n:
                out.append(tx._shingle_hashes(toks, shingle_n))
        h = (np.unique(np.concatenate(out)) if out
             else np.empty(0, np.uint64))
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    seen = np.empty(0, np.int64)
    blocks = ds.map_batches(part, batch_format="pyarrow")
    for batch in blocks.iter_batches(batch_format="pyarrow"):
        seen = np.union1d(seen, batch["h"].to_numpy())
        if len(seen) > cap:
            raise ValueError(
                f"benchmark shingle set exceeds cap={cap}; decontaminate "
                f"expects a small held-out set on the bench side")
    return seen


def decontaminate(corpus, bench, text_col: str = "text",
                  id_col: str = "doc_id", shingle_n: int = 3,
                  bench_cap: int = 5_000_000, keep_clean: bool = False):
    """Benchmark decontamination: flag every corpus doc sharing at least
    one word ``shingle_n``-gram with the ``bench`` dataset (the held-out
    eval set whose contents must not leak into training data).

    Scale shape: the bench shingle set is collected once (bounded by
    ``bench_cap``), ``ray.put`` once, and membership-tested map-side with
    a vectorized ``searchsorted`` per doc — the corpus streams through in
    ONE pass with ZERO shuffles. Returns (id, n_hits) for contaminated
    docs by default (n_hits = distinct shared shingles), or the clean
    corpus rows unchanged when ``keep_clean=True``."""
    import ray

    from ..util import _bcast_get
    ref = ray.put(collect_shingle_hashes(bench, text_col, shingle_n,
                                         bench_cap))

    def flag(b: pa.Table) -> pa.Table:
        hs = _bcast_get(ref)
        hits = np.zeros(len(b), np.int64)
        for i, t in enumerate(b[text_col].to_pylist()):
            toks = tx.WS_RE.findall(t or "")
            if len(toks) < shingle_n or not len(hs):
                continue
            own = tx._shingle_hashes(toks, shingle_n).view(np.int64)
            pos = np.searchsorted(hs, own)
            pos[pos == len(hs)] = 0
            hits[i] = int(np.count_nonzero(hs[pos] == own)) if len(hs) else 0
        if keep_clean:
            return b.filter(pa.array(hits == 0))
        m = hits > 0
        return pa.table({id_col: b[id_col].filter(pa.array(m)),
                         "n_hits": pa.array(hits[m], pa.int64())})

    return corpus.map_batches(flag, batch_format="pyarrow")


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Repetition-based quality signals (the Gopher-rules family) per doc:
    ``distinct_token_ratio`` (distinct/total tokens) and
    ``top_bigram_frac`` (occurrences of the modal word bigram / all bigram
    occurrences; 0 for docs with < 2 tokens). ONE map pass, zero shuffles;
    token hashes are memoized per worker and counted with ``np.unique`` —
    no Python loop over tokens. Ratios are fixed-point e6 (half away from
    zero) so the distributed result hash-matches the SQL twin."""
    def stats(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        n_tok = np.zeros(len(b), np.int64)
        dratio = np.zeros(len(b), np.float64)
        bfrac = np.zeros(len(b), np.float64)
        for i, t in enumerate(b[text_col].to_pylist()):
            toks = tx.WS_RE.findall(t or "")
            n = len(toks)
            n_tok[i] = n
            if n == 0:
                continue        # ratio is NULL (SQL 0/0) — masked below
            th = tx._token_hashes(toks)
            dratio[i] = len(np.unique(th)) / n
            if n >= 2:
                with np.errstate(over="ignore"):
                    bg = th[:-1] * np.uint64(0x9E3779B97F4A7C15) + th[1:]
                _, counts = np.unique(bg, return_counts=True)
                bfrac[i] = counts.max() / (n - 1)
        p = 1e6
        return pa.table({
            id_col: ids,
            "n_tokens": pa.array(n_tok, pa.int64()),
            # zero-token docs: SQL's x*1.0/0 over ints is NULL — mask to
            # null, not a fabricated 1.0 (review finding)
            "distinct_token_ratio": pa.array(np.floor(dratio * p + 0.5) / p,
                                             mask=n_tok == 0),
            "top_bigram_frac": pa.array(np.floor(bfrac * p + 0.5) / p),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def chunk_documents(ds, size: int = 64, stride: int = 48,
                    id_col: str = "doc_id", text_col: str = "text",
                    batch_size: int = 512):
    """RAG-style document chunking: overlapping ``size``-token windows
    every ``stride`` tokens (``\\S+`` tokenization, single-space
    rejoin), ONE OUTPUT ROW PER (doc, chunk). Chunk k covers tokens
    [k·stride, k·stride+size) and k ranges over 0 .. ceil(n/stride)−1,
    so every token is covered and the last window may be short; empty /
    whitespace-only docs produce no chunks.

    Fully vectorized: Arrow ``utf8_split_whitespace`` tokenizes the
    whole batch (empty boundary tokens filtered so the token sets match
    ``\\S+`` — the repo-wide tokenizer contract), the clean list column
    is rebuilt zero-copy-ish from filtered values + recomputed offsets,
    and each chunk index is one ``list_slice`` + ``binary_join`` C++
    pass over the docs that still have that chunk. Map-only — chunking
    never shuffles; fan-out is bounded by ceil(tokens/stride)."""
    import pyarrow.compute as pcc

    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def chunks(b: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.string()),
                          "chunk_no": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "chunk_text": pa.array([], pa.string())})
        if not b.num_rows:
            return empty
        lists = pcc.utf8_split_whitespace(b[text_col])
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        lens0 = np.diff(lists.offsets.to_numpy())
        keep = pcc.greater(pcc.utf8_length(lists.values), 0)
        flat = lists.values.filter(keep)
        parent0 = np.repeat(np.arange(b.num_rows), lens0)
        lens = np.bincount(parent0[keep.to_numpy(zero_copy_only=False)],
                           minlength=b.num_rows)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        clean = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), flat)
        ids = b[id_col].combine_chunks() \
            if isinstance(b[id_col], pa.ChunkedArray) else b[id_col]
        n_chunks = (lens + stride - 1) // stride
        parts = []
        for k in range(int(n_chunks.max()) if len(n_chunks) else 0):
            sel = np.nonzero(n_chunks > k)[0]
            idx = pa.array(sel, pa.int64())
            sl = pcc.list_slice(clean.take(idx), start=k * stride,
                                stop=k * stride + size)
            txt = pcc.binary_join(sl, " ")
            ntok = np.minimum(size, lens[sel] - k * stride)
            parts.append(pa.table({
                id_col: ids.take(idx),
                "chunk_no": pa.array(np.full(len(sel), k, np.int64)),
                "n_tokens": pa.array(ntok.astype(np.int64), pa.int64()),
                "chunk_text": txt}))
        return pa.concat_tables(parts) if parts else empty

    return ds.select_columns([id_col, text_col]) \
             .map_batches(chunks, batch_format="pyarrow",
                          batch_size=batch_size)


def scrub_pii(ds, text_col: str = "text", out_col: str = "clean_text"):
    """PII redaction over a documents table: emails, IPv4 addresses and
    phone-shaped numbers are replaced with typed placeholder tokens and
    counted per row (counts taken on the ORIGINAL text, so they are
    independent of replacement order). Entirely Arrow C++ RE2 kernels
    (``count_substring_regex`` / ``replace_substring_regex``) — no
    Python per-row work, streams at data volume. The pattern strings
    (``functions.text.PII_PATTERNS``) are shared verbatim with the
    DuckDB oracle twin, which is also RE2."""
    import pyarrow.compute as pcc

    def fn(b: pa.Table) -> pa.Table:
        t = b[text_col]
        cols = {c: b[c] for c in b.column_names if c != text_col}
        cleaned = t
        for name, pat, repl in tx.PII_PATTERNS:
            cols[f"n_{name}"] = pcc.cast(
                pcc.count_substring_regex(t, pat), pa.int64())
            cleaned = pcc.replace_substring_regex(cleaned, pat, repl)
        cols[out_col] = cleaned
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
