"""Perceptual hash (64-bit DCT sign hash) — pure numpy, deterministic.

Standard pHash construction: grayscale → 32×32 downsample → 2-D DCT →
top-left 8×8 low-frequency block (skipping DC) → median threshold →
64-bit integer. Hamming distance between phashes approximates visual
distance; near-duplicate detection joins on band keys and filters by
``bit_count(x ^ y) <= t`` (pqc/constraints/near_dup.py).

North-star replacement for the reference's pictogram/icon membership
detection (SURVEY §2.8 I11).
"""

from __future__ import annotations

import numpy as np

from pqc.image.codec import _dct_matrix

_D32 = _dct_matrix(32)
PHASH_BITS = 64


def _resample_32(gray: np.ndarray) -> np.ndarray:
    """Deterministic 32×32 nearest-index downsample (any input size)."""
    h, w = gray.shape
    yi = np.minimum((np.arange(32) * h) // 32, h - 1)
    xi = np.minimum((np.arange(32) * w) // 32, w - 1)
    return gray[np.ix_(yi, xi)]


def phash64(arr: np.ndarray) -> int:
    """Compute the 64-bit perceptual hash of an (h, w, 3) uint8 array.

    Returned as a Python int in [0, 2^63) — the top bit is dropped so
    the value always fits a Spark LongType without sign games (63 of
    the 64 DCT sign bits; collision behaviour is unaffected for
    near-dup banding).
    """
    gray = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _resample_32(gray)
    dct = _D32 @ small @ _D32.T
    block = dct[:8, :8].copy()
    flat = np.concatenate([block.flatten()[1:]])  # skip DC term
    med = np.median(flat)
    bits = flat > med
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    return val & ((1 << 63) - 1)


def hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
