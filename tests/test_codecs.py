"""Codec round-trip + PSNR gates (BASELINE.json: pixel allclose lossless,
PSNR >= 40 dB lossy)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from wrangle_openstreetmap_data_ray.functions import codecs


def _img(seed, h=24, w=17):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", codecs.LOSSLESS)
def test_lossless_roundtrip_exact(fmt):
    img = _img(1)
    out = codecs.decode(codecs.encode(img, fmt), fmt, 17, 24)
    np.testing.assert_array_equal(out, img)


def test_lossy8_psnr_gate():
    img = _img(2, 64, 64)
    out = codecs.decode(codecs.encode(img, "lossy8"), "lossy8", 64, 64)
    assert codecs.psnr(img, out) >= 40.0
    assert np.allclose(img, out, atol=codecs._Q_STEP)


def test_png_all_filters_decode():
    """Decoder must handle filter types 0..4 (encoder only emits 0)."""
    import struct
    import zlib
    img = _img(3, 6, 5)
    h, w, _ = img.shape
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.int32)
    for y in range(h):
        ftype = y % 5
        line = img[y].reshape(-1).astype(np.int32)
        if ftype == 0:
            enc = line
        elif ftype == 1:  # Sub
            enc = line.copy()
            enc[3:] = (line[3:] - line[:-3]) % 256
        elif ftype == 2:  # Up
            enc = (line - prev) % 256
        elif ftype == 3:  # Average
            left = np.concatenate([np.zeros(3, np.int32), line[:-3]])
            enc = (line - ((left + prev) >> 1)) % 256
        else:  # Paeth
            enc = np.empty_like(line)
            for x in range(w * 3):
                a = line[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                enc[x] = (line[x] - pr) % 256
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (codecs._PNG_SIG + codecs._chunk(b"IHDR", ihdr)
            + codecs._chunk(b"IDAT", zlib.compress(bytes(raw)))
            + codecs._chunk(b"IEND", b""))
    np.testing.assert_array_equal(codecs.decode_png(data), img)


@given(st.integers(0, 10_000), st.integers(1, 40), st.integers(1, 40))
@settings(max_examples=25, deadline=None)
def test_roundtrip_property(seed, h, w):
    img = _img(seed, h, w)
    for fmt in codecs.LOSSLESS:
        np.testing.assert_array_equal(
            codecs.decode(codecs.encode(img, fmt), fmt, w, h), img)
    lossy = codecs.decode(codecs.encode(img, "lossy8"), "lossy8", w, h)
    assert codecs.psnr(img, lossy) >= 40.0 or (img == lossy).all()


def test_resize_nearest():
    img = _img(4, 32, 32)
    small = codecs.resize_nearest(img, 8, 8)
    assert small.shape == (8, 8, 3)
    np.testing.assert_array_equal(small[0, 0], img[0, 0])
