"""Multimodal column stages (task brief): decode / feature-extract /
resize / frame-sample as actor-pool ``map_batches`` stages over opaque
``binary`` columns with typed metadata.

Image decode is REAL (in-repo codecs, S6). Audio decode and video
frame-sampling are STUBBED — the container ships no audio/video libraries —
behind ``NotImplementedError`` with a deterministic fake
(``deterministic_fake=True``) so the Ray-side plumbing (schema, batch size,
actor signature, output layout) is real and tested.

Decoded pixels explode the batch ~10-50× vs encoded bytes, so these stages
default to SMALL batch_size and the decoded form never crosses a shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs
from ..functions.hashing import hash64_bytes


class DecodeImageFeatures:
    """Actor-pool stage: decode bytes per ``fmt``, emit per-image features
    (mean RGB, brightness, recomputed phash). Verifies the pixel-integrity
    invariant (BASELINE.json: decoded-pixel fidelity) when ``verify=True``."""

    def __init__(self, verify_phash: bool = False, seed: int = 42):
        self.verify = verify_phash
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        mean_r = np.empty(n); mean_g = np.empty(n); mean_b = np.empty(n)
        brightness = np.empty(n)
        phash = np.empty(n, dtype=np.int64)
        blobs = batch["bytes"]
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        for i in range(n):
            img = codecs.decode(blobs[i].as_py(), fmts[i], int(ws[i]), int(hs[i]))
            m = img.reshape(-1, 3).mean(axis=0)
            mean_r[i], mean_g[i], mean_b[i] = m
            brightness[i] = m.mean()
            phash[i] = np.int64(np.uint64(hash64_bytes(img.tobytes(), self.seed)))
        out = batch.drop_columns(["bytes"])
        for name, col in (("mean_r", mean_r), ("mean_g", mean_g),
                          ("mean_b", mean_b), ("brightness", brightness)):
            out = out.append_column(name, pa.array(col, pa.float64()))
        out = out.append_column("phash_check", pa.array(phash, pa.int64()))
        if self.verify and "phash" in batch.column_names:
            stored = batch["phash"].to_numpy()
            out = out.append_column("phash_ok", pa.array(stored == phash))
        return out


def decode_features(ds, verify_phash: bool = True, concurrency=None,
                    batch_size: int = 256):
    """Stateless decode kernel → TASK-based by default (scales up instantly;
    autoscaling actor pools ramp too slowly — see pip_join). Pass
    ``concurrency`` to force an actor pool."""
    if concurrency is not None:
        return ds.map_batches(DecodeImageFeatures,
                              fn_constructor_kwargs={"verify_phash": verify_phash},
                              batch_format="pyarrow", batch_size=batch_size,
                              concurrency=concurrency, num_cpus=1)

    def task(batch):
        return DecodeImageFeatures(verify_phash=verify_phash)(batch)
    return ds.map_batches(task, batch_format="pyarrow", batch_size=batch_size)


class ResizeImages:
    """Actor-pool stage: decode → nearest-neighbor resize → re-encode.
    Output keeps the images schema (bytes/w/h/fmt updated)."""

    def __init__(self, out_w: int, out_h: int, out_fmt: str = "png"):
        self.out_w, self.out_h, self.out_fmt = out_w, out_h, out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"]
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        out_bytes = []
        for i in range(batch.num_rows):
            img = codecs.decode(blobs[i].as_py(), fmts[i], int(ws[i]), int(hs[i]))
            small = codecs.resize_nearest(img, self.out_w, self.out_h)
            out_bytes.append(codecs.encode(small, self.out_fmt))
        n = batch.num_rows
        return (batch.set_column(batch.column_names.index("bytes"), "bytes",
                                 pa.array(out_bytes, pa.binary()))
                .set_column(batch.column_names.index("w"), "w",
                            pa.array([self.out_w] * n, pa.int32()))
                .set_column(batch.column_names.index("h"), "h",
                            pa.array([self.out_h] * n, pa.int32()))
                .set_column(batch.column_names.index("fmt"), "fmt",
                            pa.array([self.out_fmt] * n)))


def resize_images(ds, out_w: int, out_h: int, out_fmt: str = "png",
                  concurrency=None, batch_size: int = 256):
    if concurrency is not None:
        return ds.map_batches(ResizeImages,
                              fn_constructor_args=(out_w, out_h, out_fmt),
                              batch_format="pyarrow", batch_size=batch_size,
                              concurrency=concurrency, num_cpus=1)

    def task(batch):
        return ResizeImages(out_w, out_h, out_fmt)(batch)
    return ds.map_batches(task, batch_format="pyarrow", batch_size=batch_size)


class AudioFeatures:
    """STUB (no audio libs in this container — task brief sanctions a
    deterministic fake). Real plumbing: binary column in, fixed-width
    feature columns out, actor-pool stage, small batches."""

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "audio decode requires an audio library; none ships in this "
                "container — construct with deterministic_fake=True")
        n = batch.num_rows
        blobs = batch["bytes"]
        dur = np.empty(n); rms = np.empty(n)
        for i in range(n):
            b = blobs[i].as_py()
            h = hash64_bytes(b)
            dur[i] = (h % 30_000) / 1000.0          # fake seconds
            rms[i] = ((h >> 16) % 1000) / 1000.0    # fake loudness
        return (batch.drop_columns(["bytes"])
                .append_column("duration_s", pa.array(dur, pa.float64()))
                .append_column("rms", pa.array(rms, pa.float64())))


class VideoFrameSample:
    """STUB frame sampler: emits ``n_frames`` rows per video row with a
    deterministic fake frame payload (raw8 thumbnails)."""

    def __init__(self, n_frames: int = 4, frame_px: int = 16,
                 deterministic_fake: bool = False):
        self.n_frames, self.frame_px, self.fake = n_frames, frame_px, deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video decode requires a video library; none ships in this "
                "container — construct with deterministic_fake=True")
        ids, frames, idxs = [], [], []
        blobs = batch["bytes"]
        vids = batch[batch.column_names[0]].to_pylist()
        for i in range(batch.num_rows):
            seed = hash64_bytes(blobs[i].as_py())
            for f in range(self.n_frames):
                from ..functions.hashing import splitmix64
                with np.errstate(over="ignore"):
                    vals = splitmix64(np.uint64(seed) + np.uint64(f * 1_000_003)
                                      + np.arange(self.frame_px ** 2 * 3, dtype=np.uint64))
                frame = (vals & np.uint64(0xFF)).astype(np.uint8)
                ids.append(vids[i])
                idxs.append(f)
                frames.append(frame.tobytes())
        return pa.table({"video_id": pa.array(ids), "frame_idx": pa.array(idxs, pa.int32()),
                         "frame_bytes": pa.array(frames, pa.binary())})
