"""Image codecs — pure numpy + stdlib, fully deterministic.

The sandbox has no PIL/libjpeg, so the engine ships pure-numpy codecs:

- a real PNG codec (lossless; spec-conformant enough to round-trip any
  8-bit RGB image and decode filter types 0-4) — the "png" format;
- a deterministic lossy block-DCT codec ("lsy"): 8×8 DCT, JPEG-style
  quantization at a quality setting, zlib entropy stage. At quality 95
  it reconstructs the noisy fixture images at ~42 dB PSNR — clearing
  the north-star integrity gate (PSNR ≥ 40 dB for lossy formats). This
  is the fixture's fast lossy format (fully vectorized).
- a real baseline JPEG codec (pqc/image/jpeg.py): ITU-T T.81 baseline
  sequential, YCbCr 4:4:4, standard JFIF container with transmitted
  DQT/DHT tables — replaced the round-1 NotImplementedError stub.

Reference analogue: decode + crop I1 (`app.py:842`,
`artwork_processing_common.py:234-238`); two-pass consistency gate I5
(`artwork_processing.py:1722-1725`).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
LSY_MAGIC = b"LSY1"

# ---------------------------------------------------------------------------
# PNG (lossless, 8-bit RGB)
# ---------------------------------------------------------------------------


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a PNG (filter 0 scanlines)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("png_encode expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 1:] = arr.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4).

    Fast path: an all-filter-0 image (what our encoder emits) is a
    single vectorized copy; the general per-type scan only runs for
    foreign PNGs.
    """
    if not raw[:, 0].any():
        return raw[:, 1:].copy()
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            out[y] = line.astype(np.uint8)
        elif ftype == 2:  # Up
            out[y] = ((line + prev) & 0xFF).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-neighbour scan
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    val = line[x] + a
                elif ftype == 3:
                    val = line[x] + ((a + b) >> 1)
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    val = line[x] + pred
                cur[x] = val & 0xFF
            out[y] = cur.astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter type {ftype}")
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit RGB PNG into an (h, w, 3) uint8 array."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, None, None, b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        crc_expect = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc_expect:
            raise ValueError("PNG CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = w * 3
    raw = raw.reshape(h, stride + 1)
    return _unfilter(raw, h, stride, 3).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# LSY (deterministic lossy block-DCT codec — the sandbox's "jpeg")
# ---------------------------------------------------------------------------

# JPEG Annex K luminance quantization table
_QBASE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)


def _qtable(quality: int) -> np.ndarray:
    q = max(1, min(100, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    t = np.floor((_QBASE * scale + 50) / 100)
    return np.clip(t, 1, 255)


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos((2 * i + 1) * k * np.pi / (2 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


_D8 = _dct_matrix(8)


def lsy_encode(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode (h, w, 3) uint8 → lossy LSY bytes (deterministic).

    Block layout: (channel, block_row, block_col, 8, 8) int16. The DCT
    runs as one broadcast matmul over all blocks of all channels —
    ~3× the throughput of a per-channel einsum.
    """
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("lsy_encode expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    ph, pw = -h % 8, -w % 8
    padded = np.pad(arr, ((0, ph), (0, pw), (0, 0)), mode="edge").astype(np.float64) - 128.0
    hh, ww = padded.shape[:2]
    qt = _qtable(quality)
    blocks = (
        padded.transpose(2, 0, 1)
        .reshape(3, hh // 8, 8, ww // 8, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(3, -1, 8, 8)
    )
    dct = _D8 @ blocks @ _D8.T
    payload = np.round(dct / qt).astype(np.int16).tobytes()
    header = LSY_MAGIC + struct.pack(">IIB", w, h, quality)
    return header + zlib.compress(payload, 6)


def lsy_requantize(arr: np.ndarray, quality: int = 90) -> np.ndarray:
    """Generation-loss simulation: DCT → quantize → dequantize → IDCT.

    Bit-identical to ``lsy_decode(lsy_encode(arr, q))`` — the entropy
    stage (zlib + int16 serialization) is lossless, so skipping it
    yields the same pixels at a fraction of the cost. Used by the
    regen-PSNR integrity gate (equality with the full roundtrip is
    asserted in tests)."""
    h, w = arr.shape[:2]
    ph, pw = -h % 8, -w % 8
    padded = np.pad(arr, ((0, ph), (0, pw), (0, 0)), mode="edge").astype(np.float64) - 128.0
    hh, ww = padded.shape[:2]
    qt = _qtable(quality)
    blocks = (
        padded.transpose(2, 0, 1)
        .reshape(3, hh // 8, 8, ww // 8, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(3, -1, 8, 8)
    )
    coeffs = np.round((_D8 @ blocks @ _D8.T) / qt).astype(np.int16).astype(np.float64)
    idct = _D8.T @ (coeffs * qt) @ _D8
    out = (
        idct.reshape(3, hh // 8, ww // 8, 8, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(3, hh, ww)
        .transpose(1, 2, 0)
    )
    return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)[:h, :w]


def lsy_decode(data: bytes) -> np.ndarray:
    if data[:4] != LSY_MAGIC:
        raise ValueError("not an LSY payload")
    w, h, quality = struct.unpack(">IIB", data[4:13])
    hh, ww = h + (-h % 8), w + (-w % 8)
    raw = np.frombuffer(zlib.decompress(data[13:]), dtype=np.int16)
    coeffs = raw.reshape(3, -1, 8, 8).astype(np.float64)
    qt = _qtable(quality)
    idct = _D8.T @ (coeffs * qt) @ _D8
    out = (
        idct.reshape(3, hh // 8, ww // 8, 8, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(3, hh, ww)
        .transpose(1, 2, 0)
    )
    return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)[:h, :w]


# ---------------------------------------------------------------------------
# Dispatch + PSNR
# ---------------------------------------------------------------------------

LOSSLESS_FORMATS = frozenset({"png"})
LOSSY_FORMATS = frozenset({"lsy", "jpeg"})
SUPPORTED_FORMATS = LOSSLESS_FORMATS | LOSSY_FORMATS


def encode(arr: np.ndarray, fmt: str, quality: int = 90) -> bytes:
    if fmt == "png":
        return png_encode(arr)
    if fmt == "lsy":
        return lsy_encode(arr, quality)
    if fmt == "jpeg":
        from pqc.image.jpeg import jpeg_encode

        return jpeg_encode(arr, quality)
    raise ValueError(f"unknown format {fmt!r}")


def decode(data: bytes, fmt: str) -> np.ndarray:
    """Decode bytes → (h, w, 3) uint8. Raises on corrupt payloads."""
    if fmt == "png":
        return png_decode(data)
    if fmt == "lsy":
        return lsy_decode(data)
    if fmt == "jpeg":
        from pqc.image.jpeg import jpeg_decode

        return jpeg_decode(data)
    raise ValueError(f"unknown format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
