"""Stable 64-bit hashing (vectorized) — used for dedup keys, sampling,
salting and value fingerprints.

Python's builtin ``hash`` is salted per process; all keys that cross task
boundaries must use these stable hashes instead so that shuffles, resumes
and re-runs agree byte-for-byte.
"""

from __future__ import annotations

import hashlib

import numpy as np

# splitmix64 constants — public-domain mixer (Steele et al., "Fast splittable
# pseudorandom number generators", OOPSLA'14).
_SM64_1 = np.uint64(0x9E3779B97F4A7C15)
_SM64_2 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _SM64_1
        z = (z ^ (z >> np.uint64(30))) * _SM64_2
        z = (z ^ (z >> np.uint64(27))) * _SM64_3
        z = z ^ (z >> np.uint64(31))
    return z


def hash64_ints(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Stable 64-bit hash of an integer array (any int dtype)."""
    v = x.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        return splitmix64(v ^ np.uint64(seed))


def hash64_bytes(b: bytes, seed: int = 0) -> int:
    """Stable 64-bit hash of a bytes payload (blake2b, 8-byte digest)."""
    h = hashlib.blake2b(b, digest_size=8, key=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def hash64_str(s: str, seed: int = 0) -> int:
    return hash64_bytes(s.encode("utf-8"), seed)


def hash64_str_array(strs, seed: int = 0) -> np.ndarray:
    """Stable 64-bit hash per string; accepts any iterable of str.

    Row-at-a-time blake2b: used only for ID-like short strings (dedup keys,
    salting), never over document bodies in a hot path — those use the
    rolling-hash fingerprints in ``functions/text.py``.
    """
    key = seed.to_bytes(8, "little")
    out = np.empty(len(strs), dtype=np.uint64)
    for i, s in enumerate(strs):
        h = hashlib.blake2b(s.encode("utf-8"), digest_size=8, key=key)
        out[i] = int.from_bytes(h.digest(), "little")
    return out
