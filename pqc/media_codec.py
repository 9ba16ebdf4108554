"""Minimal real media codecs (pure numpy, same discipline as
pqc/image/jpeg.py): a canonical RIFF/WAVE 16-bit PCM parser and a raw
grayscale-frame video container. These replace the r2 seeded-PRNG
decode stubs — the decode island (pqc/media.py) now computes RMS/ZCR
and frame lumas from REAL payload bytes, with strict structural
validation so corrupt payloads surface as decode errors instead of
garbage features.

WAV (encode + decode):
    RIFF little-endian, single 'fmt ' chunk (PCM format tag 1,
    16 bits/sample) + one 'data' chunk. The parser walks the chunk
    list (tolerating extra chunks like 'LIST'), validates sizes
    against the actual byte count, and returns samples as an
    (n, channels) int16 array via a zero-copy ``np.frombuffer``.

RVID (encode + decode):
    A deliberately trivial container for fixed-size grayscale frames:
    magic 'RVID' + (w, h, n_frames, fps_milli) big-endian header, then
    n_frames × (h·w) uint8 luma planes. ``rvid_frame`` slices ONE
    frame out of the buffer without touching the rest — the random
    access a frame-sampling decode fleet needs (read K frames of N,
    not the whole file).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV — RIFF/WAVE canonical 16-bit PCM
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 array (n,) or (n, channels) → canonical WAV bytes."""
    if samples.dtype != np.int16:
        raise ValueError(f"samples must be int16, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block_align = ch * 2
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, block_align, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, (n, channels) int16 array).

    Strict: RIFF/WAVE magics, PCM(1)/16-bit only, chunk sizes checked
    against the real byte count — a truncated payload raises rather
    than yielding a silently short clip."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos, end = 12, 8 + riff_size
    sample_rate = channels = None
    pcm: bytes | None = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        if body_start + csize > end:
            raise ValueError(f"chunk {cid!r} overruns payload")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("fmt chunk too short")
            tag, ch, sr, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, body_start
            )
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (tag={tag}, bits={bits})")
            sample_rate, channels = sr, ch
        elif cid == b"data":
            pcm = data[body_start : body_start + csize]
        pos = body_start + csize + (csize & 1)  # chunks are word-aligned
    if sample_rate is None or channels is None:
        raise ValueError("missing fmt chunk")
    if pcm is None:
        raise ValueError("missing data chunk")
    if len(pcm) % (2 * channels):
        raise ValueError("PCM byte count not frame-aligned")
    arr = np.frombuffer(pcm, dtype="<i2").reshape(-1, channels)
    return sample_rate, arr


# ---------------------------------------------------------------------------
# RVID — raw grayscale-frame video container
# ---------------------------------------------------------------------------

RVID_MAGIC = b"RVID"
_RVID_HDR = ">IIIH"  # w, h, n_frames, fps in millihertz/1000 → ushort fps*10


def rvid_encode(frames: np.ndarray, fps: float) -> bytes:
    """(n_frames, h, w) uint8 luma planes → RVID bytes."""
    if frames.dtype != np.uint8 or frames.ndim != 3:
        raise ValueError("frames must be (n, h, w) uint8")
    n, h, w = frames.shape
    hdr = RVID_MAGIC + struct.pack(_RVID_HDR, w, h, n, int(round(fps * 10)))
    return hdr + frames.tobytes()


def rvid_header(data: bytes) -> tuple[int, int, int, float]:
    """RVID bytes → (w, h, n_frames, fps); validates the payload length
    so a truncated file fails HERE, before any frame read."""
    hdr_len = 4 + struct.calcsize(_RVID_HDR)
    if len(data) < hdr_len or data[:4] != RVID_MAGIC:
        raise ValueError("not an RVID payload")
    w, h, n, fps10 = struct.unpack_from(_RVID_HDR, data, 4)
    if len(data) != hdr_len + n * h * w:
        raise ValueError(
            f"RVID length mismatch: header says {n}×{h}×{w}, "
            f"payload has {len(data) - hdr_len} frame bytes"
        )
    return w, h, n, fps10 / 10.0


def rvid_frame(data: bytes, idx: int) -> np.ndarray:
    """Random-access read of ONE (h, w) uint8 frame — O(frame size),
    independent of n_frames (the frame-sampling access pattern)."""
    w, h, n, _fps = rvid_header(data)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} out of range [0, {n})")
    hdr_len = 4 + struct.calcsize(_RVID_HDR)
    off = hdr_len + idx * h * w
    return np.frombuffer(data, dtype=np.uint8, count=h * w, offset=off).reshape(h, w)
