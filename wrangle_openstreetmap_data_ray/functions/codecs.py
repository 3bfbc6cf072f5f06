"""In-repo image codecs (no PIL/opencv in this environment — SURVEY.md §0).

Four formats for the ``images.bytes`` binary column (``fmt`` column selects):

- ``raw8``   — raw interleaved RGB, ``h*w*3`` bytes, lossless.
- ``ppm``    — binary PPM (P6) with ASCII header, lossless.
- ``png``    — real PNG (RFC 2083): 8-bit RGB, stdlib ``zlib``. Encoder emits
  filter 0 (None) rows; decoder handles all five filter types (0..4),
  so any spec-conforming 8-bit RGB non-interlaced PNG decodes. Lossless.
- ``lossy8`` — simple lossy codec: per-channel uniform quantization to 6 bits
  (step 4) + zlib. Worst-case RMSE = 4/sqrt(12) ≈ 1.15 → PSNR ≈ 46.9 dB,
  comfortably over the PSNR ≥ 40 dB gate in BASELINE.json:input_hint.

All functions are numpy-vectorized per image; batch loops are over images,
not pixels. Mirrors the reference's role of "bytes in, structured record out"
(reference: XML attrs → floats; here: encoded bytes → HxWx3 uint8).
Reconstructed-reference cite: [R:data.py::shape_element] per SURVEY.md §2 S6.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw8", "ppm", "png", "lossy8")
LOSSLESS = ("raw8", "ppm", "png")

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------- raw8 / ppm

def encode_raw8(img: np.ndarray) -> bytes:
    return np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_raw8(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8, count=h * w * 3).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + encode_raw8(img)


def decode_ppm(data: bytes, w: int | None = None, h: int | None = None) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval — whitespace separated
    parts, idx, tok = [], 2, b""
    while len(parts) < 3:
        c = data[idx:idx + 1]
        idx += 1
        if c in b" \t\r\n":
            if tok:
                parts.append(int(tok))
                tok = b""
        elif c == b"#":  # comment to end of line
            while data[idx:idx + 1] not in (b"\n", b""):
                idx += 1
        else:
            tok += c
    pw, ph, maxval = parts
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    return np.frombuffer(data, dtype=np.uint8, count=ph * pw * 3, offset=idx).reshape(ph, pw, 3)


# ----------------------------------------------------------------------- png

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """8-bit RGB, color type 2, no interlace; every scanline filter 0."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # prepend the filter byte (0) to each row in one vectorized hstack
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int = 3) -> np.ndarray:
    """Undo PNG per-scanline filters 0..4. Row loop only (h iterations);
    within a row, filters 0/2 are fully vectorized; 1/3/4 have a sequential
    dependency along x handled per-pixel-column in C-speed numpy slices."""
    stride = w * bpp
    rows = raw.reshape(h, 1 + stride)
    # fast path: every scanline filter 0 (what encode_png emits) — the
    # payload IS the pixels; skip the per-row reconstruction loop
    if not rows[:, 0].any():
        return np.ascontiguousarray(rows[:, 1:])
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes, w: int | None = None, h: int | None = None) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    idx, idat, pw, ph = 8, [], None, None
    while idx < len(data):
        (length,) = struct.unpack_from(">I", data, idx)
        tag = data[idx + 4:idx + 8]
        payload = data[idx + 8:idx + 8 + length]
        idx += 12 + length
        if tag == b"IHDR":
            pw, ph, bitd, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", payload)
            if bitd != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only 8-bit RGB non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    return _unfilter(raw, ph, pw).reshape(ph, pw, 3)


# -------------------------------------------------------------------- lossy8

_Q_STEP = 4  # 6 significant bits/channel → PSNR ≈ 46.9 dB worst case


def encode_lossy8(img: np.ndarray, level: int = 6) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    q = (img.astype(np.uint16) // _Q_STEP).astype(np.uint8)  # 0..63
    return zlib.compress(q.tobytes(), level)


def decode_lossy8(data: bytes, w: int, h: int) -> np.ndarray:
    q = np.frombuffer(zlib.decompress(data), dtype=np.uint8, count=h * w * 3)
    # midpoint reconstruction: q*4 + 1 stays within uint8 (max 63*4+1=253)
    return (q.astype(np.uint16) * _Q_STEP + _Q_STEP // 2).clip(0, 255).astype(np.uint8).reshape(h, w, 3)


# ----------------------------------------------------------------- dispatch

def encode(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw8":
        return encode_raw8(img)
    if fmt == "ppm":
        return encode_ppm(img)
    if fmt == "png":
        return encode_png(img)
    if fmt == "lossy8":
        return encode_lossy8(img)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw8":
        return decode_raw8(data, w, h)
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "lossy8":
        return decode_lossy8(data, w, h)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(d * d))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (used by thumbnailing / tile paste)."""
    h, w, _ = img.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


# ------------------------------------------------------------- audio (WAV)
# Canonical RIFF/WAVE PCM16 mono — the container ships no audio libraries,
# but WAV is a trivial public format (44-byte header + little-endian PCM),
# so the decoder is REAL, not a stub.

def encode_wav(samples: np.ndarray, sr: int) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes."""
    import struct
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    n = len(pcm)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + n, b"WAVE", b"fmt ", 16,
        1, 1, sr, sr * 2, 2, 16, b"data", n)
    return hdr + pcm


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono bytes → (int16 samples, sample_rate).
    Walks the chunk list (tolerates extra chunks), validates PCM16 mono."""
    import struct
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, sr, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt_code, ch, sr, _, _, bits = struct.unpack_from("<HHIIHH", body)
            if fmt_code != 1 or ch != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size & 1)
    if sr is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return np.frombuffer(pcm, dtype="<i2"), sr


# ------------------------------------------------------- video (rawvid v1)
# Minimal public container for this engine's tests: 20-byte header
# (magic, w, h, n_frames, fps_milli) followed by n_frames raw24 frames.

_RAWVID_MAGIC = b"RVID"


def encode_rawvid(frames: np.ndarray, fps: float) -> bytes:
    """(n, h, w, 3) uint8 frames → rawvid bytes."""
    import struct
    n, h, w, c = frames.shape
    if c != 3:
        raise ValueError("rawvid frames must be HxWx3")
    hdr = struct.pack("<4sIIII", _RAWVID_MAGIC, w, h, n, int(fps * 1000))
    return hdr + np.ascontiguousarray(frames, dtype=np.uint8).tobytes()


def decode_rawvid(data: bytes) -> tuple[np.ndarray, float]:
    """rawvid bytes → ((n, h, w, 3) uint8 frames, fps)."""
    import struct
    magic, w, h, n, fps_m = struct.unpack_from("<4sIIII", data)
    if magic != _RAWVID_MAGIC:
        raise ValueError("not a rawvid stream")
    body = np.frombuffer(data, dtype=np.uint8, offset=20)
    if len(body) != n * h * w * 3:
        raise ValueError("rawvid length mismatch")
    return body.reshape(n, h, w, 3), fps_m / 1000.0
