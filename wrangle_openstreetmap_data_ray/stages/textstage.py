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
