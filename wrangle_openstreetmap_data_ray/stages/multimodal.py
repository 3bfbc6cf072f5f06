"""Multimodal column stages (task brief): decode / feature-extract /
resize / frame-sample as actor-pool ``map_batches`` stages over opaque
``binary`` columns with typed metadata.

ALL THREE modalities are REAL: images via the in-repo codecs (S6), audio
via a pure-numpy RIFF/WAVE PCM16 parser, video via the documented rawvid
raw-frame container — no external media libraries needed, every decoder
verified against the synthesis functions in tests and (audio/video)
against redundant metadata columns by the DuckDB oracle.

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
    """REAL audio decode + feature extraction: RIFF/WAVE PCM16 parsed with
    the in-repo pure-numpy decoder (``codecs.decode_wav``); per-clip
    duration (from the DECODED sample count — the oracle cross-checks it
    against the stored metadata), RMS amplitude and zero-crossing rate.
    Binary column in, fixed-width feature columns out, small batches
    (decoded samples ≈ payload; no blowup, but keep it bounded)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        n_dec = np.empty(n, np.int64)
        dur_us = np.empty(n, np.int64)
        rms = np.empty(n)
        zcr = np.empty(n)
        blobs = batch["bytes"]
        for i in range(n):
            samples, sr = codecs.decode_wav(blobs[i].as_py())
            x = samples.astype(np.float64) / 32768.0
            n_dec[i] = len(x)
            # exact integer µs — float-rounding-free for the oracle compare
            dur_us[i] = len(x) * 1_000_000 // sr
            rms[i] = float(np.sqrt((x * x).mean())) if len(x) else 0.0
            zcr[i] = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) \
                if len(x) > 1 else 0.0
        return (batch.drop_columns(["bytes"])
                .append_column("n_samples_dec", pa.array(n_dec, pa.int64()))
                .append_column("duration_us", pa.array(dur_us, pa.int64()))
                .append_column("rms", pa.array(rms, pa.float64()))
                .append_column("zcr", pa.array(zcr, pa.float64())))


def audio_features(ds, batch_size: int = 512):
    def task(batch):
        return AudioFeatures()(batch)
    return ds.map_batches(task, batch_format="pyarrow", batch_size=batch_size)


class VideoFrameSample:
    """REAL frame sampler: parse the rawvid container
    (``codecs.decode_rawvid``), emit every ``stride``-th frame as its own
    row (frame index, raw24 bytes, mean brightness). Decoded frames
    explode the row count — small batches, frames re-encoded raw8-style
    (already raw24) so downstream shuffles move bytes, not arrays."""

    def __init__(self, stride: int = 2):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, fbytes, bright = [], [], [], []
        blobs = batch["bytes"]
        vids = batch["video_id"].to_pylist()
        for i in range(batch.num_rows):
            frames, _fps = codecs.decode_rawvid(blobs[i].as_py())
            for f in range(0, frames.shape[0], self.stride):
                ids.append(vids[i])
                idxs.append(f)
                fbytes.append(frames[f].tobytes())
                bright.append(float(frames[f].mean()))
        return pa.table({
            "video_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "frame_bytes": pa.array(fbytes, pa.binary()),
            "brightness": pa.array(bright, pa.float64()),
        })


def video_frame_sample(ds, stride: int = 2, batch_size: int = 128):
    return ds.map_batches(VideoFrameSample, fn_constructor_args=(stride,),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=(1, 4), num_cpus=1)


class VideoSceneScore:
    """Shot-boundary scoring: decode the rawvid container once per video,
    compute the mean absolute pixel difference across every consecutive
    frame pair, and emit the strongest boundary (argmax; earliest frame
    wins ties) with its score in e4 fixed-point. One row out per video —
    the decoded frames never leave the actor."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bidx, score = [], [], []
        blobs = batch["bytes"]
        vids = batch["video_id"].to_pylist()
        for i in range(batch.num_rows):
            frames, _fps = codecs.decode_rawvid(blobs[i].as_py())
            if frames.shape[0] < 2:
                # keep the one-row-per-video contract: no boundary exists
                ids.append(vids[i])
                bidx.append(0)
                score.append(0)
                continue
            a = frames[:-1].astype(np.int16)
            b = frames[1:].astype(np.int16)
            d = np.abs(a - b).mean(axis=(1, 2, 3))      # (n-1,) boundary scores
            j = int(np.argmax(d))                        # earliest max
            ids.append(vids[i])
            bidx.append(j + 1)                           # boundary BEFORE frame j+1
            score.append(int(np.floor(d[j] * 1e4 + 0.5)))
        return pa.table({
            "video_id": pa.array(ids, pa.string()),
            "boundary_frame": pa.array(bidx, pa.int64()),
            "diff_e4": pa.array(score, pa.int64()),
        })


def video_scene_scores(ds, batch_size: int = 128):
    """Actor-pool stage over the videos table → (video_id,
    boundary_frame, diff_e4). Deterministic (pure pixel arithmetic)."""
    return ds.map_batches(VideoSceneScore, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=(1, 4),
                          num_cpus=1)


AUG_OPS = ("hflip", "rot90", "crop75")


def _augment_one(img: np.ndarray, op: str) -> np.ndarray:
    """Deterministic geometric augmentations over an (h, w, 3) uint8
    image. crop75 center-crops to (3w//4, 3h//4) — integer floor dims,
    so the SQL twin can pin the output geometry exactly."""
    if op == "hflip":
        return img[:, ::-1]
    if op == "rot90":           # CCW quarter turn: (h, w) -> (w, h)
        return np.rot90(img)
    if op == "crop75":
        h, w, _ = img.shape
        nw, nh = (w * 3) // 4, (h * 3) // 4
        x0, y0 = (w - nw) // 2, (h - nh) // 2
        return img[y0:y0 + nh, x0:x0 + nw]
    raise ValueError(f"unknown augmentation op {op!r}")


class AugmentImages:
    """Actor-pool stage: decode → deterministic geometric augmentations
    (hflip / rot90 / crop75) → re-encode; ONE OUTPUT ROW PER (image, op)
    with the images schema plus an ``aug`` column. The phash is
    recomputed over the augmented pixels (same content-hash as the
    ingest path) so downstream exact dedup treats each variant as its
    own content. Decoded pixels never leave the task — only re-encoded
    bytes cross the boundary, like every other multimodal stage."""

    def __init__(self, ops=AUG_OPS, out_fmt: str | None = None,
                 seed: int = 42):
        self.ops = tuple(ops)
        self.out_fmt = out_fmt
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"]
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_numpy()
        hs = batch["h"].to_numpy()
        ids = batch["image_id"].to_pylist()
        caps = (batch["caption"].to_pylist()
                if "caption" in batch.column_names
                else [""] * batch.num_rows)
        o_id, o_aug, o_bytes, o_w, o_h = [], [], [], [], []
        o_fmt, o_cap, o_ph = [], [], []
        for i in range(batch.num_rows):
            img = codecs.decode(blobs[i].as_py(), fmts[i],
                                int(ws[i]), int(hs[i]))
            fmt = self.out_fmt or fmts[i]
            for op in self.ops:
                a = np.ascontiguousarray(_augment_one(img, op))
                o_id.append(ids[i])
                o_aug.append(op)
                o_bytes.append(codecs.encode(a, fmt))
                o_h.append(a.shape[0])
                o_w.append(a.shape[1])
                o_fmt.append(fmt)
                o_cap.append(caps[i])
                o_ph.append(np.int64(np.uint64(
                    hash64_bytes(a.tobytes(), self.seed))))
        return pa.table({
            "image_id": pa.array(o_id, pa.string()),
            "aug": pa.array(o_aug, pa.string()),
            "bytes": pa.array(o_bytes, pa.binary()),
            "w": pa.array(o_w, pa.int32()),
            "h": pa.array(o_h, pa.int32()),
            "fmt": pa.array(o_fmt, pa.string()),
            "caption": pa.array(o_cap, pa.string()),
            "phash": pa.array(np.asarray(o_ph, np.int64), pa.int64()),
        })


def augment_images(ds, ops=AUG_OPS, out_fmt: str | None = None,
                   concurrency=None, batch_size: int = 128):
    """Augmentation fan-out (rows ×= len(ops)): task-based by default,
    actor pool via ``concurrency`` for model-adjacent setups."""
    if concurrency is not None:
        return ds.map_batches(AugmentImages,
                              fn_constructor_kwargs={"ops": ops,
                                                     "out_fmt": out_fmt},
                              batch_format="pyarrow", batch_size=batch_size,
                              concurrency=concurrency, num_cpus=1)

    def task(batch):
        return AugmentImages(ops=ops, out_fmt=out_fmt)(batch)
    return ds.map_batches(task, batch_format="pyarrow",
                          batch_size=batch_size)
