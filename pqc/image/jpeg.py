"""Baseline JPEG (ITU-T T.81) codec — pure numpy + stdlib.

Replaces the former NotImplementedError stub (the sandbox has no
PIL/libjpeg): a from-spec implementation of baseline sequential DCT,
YCbCr 4:4:4 (no chroma subsampling), one scan, standard JFIF container.
Encoded files are structurally conformant (SOI/APP0/DQT/SOF0/DHT/SOS/
EOI, byte-stuffed entropy data, tables transmitted in DQT/DHT) — any
external decoder can read them; the decoder likewise reads the tables
from the stream, so it also accepts foreign baseline 4:4:4 files.

Not supported (raises with a clear message): progressive (SOF2),
chroma subsampling, restart intervals, arithmetic coding, 12-bit.

Entropy coding is table-driven, not per-bit: the decoder unstuffs the
scan vectorized, builds a 16-bit-peek LUT per Huffman table (canonical
codes are prefix-free, so every 16-bit window resolves to exactly one
(symbol, length)), and walks the bitstream with O(1) Python int ops
per SYMBOL; dequantization + IDCT then run batched over all blocks.
The encoder emits (code, length) tokens per block and assembles the
bitstream in one vectorized pass (bit matrix → boolean mask →
packbits → stuffing). ~30-50× faster than the r2 per-bit loops —
the decode island runs this on every jpeg row, so it matters.
"""

from __future__ import annotations

import struct

import numpy as np

from pqc.image.codec import _D8, _qtable

# chrominance quantization base table (Annex K)
_QCHROMA_BASE = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)


def _qtable_chroma(quality: int) -> np.ndarray:
    q = max(1, min(100, quality))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    return np.clip(np.floor((_QCHROMA_BASE * scale + 50) / 100), 1, 255)


def _zigzag() -> np.ndarray:
    """The 64-entry zigzag scan order, generated from its definition."""
    idx = sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda t: (t[0] + t[1], t[0] if (t[0] + t[1]) % 2 else t[1]),
    )
    return np.array([i * 8 + j for i, j in idx], dtype=np.int64)


_ZZ = _zigzag()
_UNZZ = np.argsort(_ZZ)

# standard Huffman tables (Annex K): (bits[1..16], huffval)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _pack_tokens(codes: np.ndarray, lens: np.ndarray) -> bytes:
    """Vectorized bitstream assembly: concatenate variable-length codes
    (MSB-first), pad the tail with 1-bits, byte-stuff 0xFF → 0xFF 0x00.

    codes[i]'s low lens[i] bits are emitted in order. The (n, 32) bit
    matrix indexed by a per-row length mask yields the concatenated
    bit sequence in row-major order — no Python bit loop."""
    codes = codes.astype(np.uint64)
    lens = lens.astype(np.int64)
    bm = (codes[:, None] >> np.arange(31, -1, -1, dtype=np.uint64)[None, :]) & 1
    mask = np.arange(32)[None, :] >= (32 - lens)[:, None]
    bits = bm[mask].astype(np.uint8)
    pad = (-len(bits)) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])
    packed = np.packbits(bits)
    stuff_at = np.where(packed == 0xFF)[0]
    if len(stuff_at):
        packed = np.insert(packed, stuff_at + 1, 0)
    return packed.tobytes()


def _unstuff_scan(data: bytes, pos: int) -> np.ndarray:
    """Vectorized scan extraction from *pos*: drop stuffed 0x00 after
    0xFF, stop at the first real marker (must be EOI). Returns the
    unstuffed entropy bytes."""
    buf = np.frombuffer(data, dtype=np.uint8)[pos:]
    if len(buf) < 2:
        raise ValueError("truncated JPEG scan")
    ff = np.where(buf[:-1] == 0xFF)[0]
    nxt = buf[ff + 1]
    # 0xFF 0x00 is a stuffed data byte; 0xFF 0xFF is a spec-legal fill
    # byte padding up to a marker (T.81 B.1.1.2) — skip both when
    # looking for the first real marker (own encoder emits no fills,
    # but foreign baseline JPEGs may)
    real = ff[(nxt != 0x00) & (nxt != 0xFF)]
    if len(real) == 0:
        raise ValueError("truncated JPEG scan (no trailing marker)")
    end = int(real[0])
    if int(buf[end + 1]) != 0xD9:
        raise ValueError(f"unexpected marker 0xFF{int(buf[end + 1]):02X} in scan")
    # per T.81 the scan ends at the FIRST 0xFF of the maximal fill run
    # before the marker (a data 0xFF is always followed by a stuffed
    # 0x00, so any 0xFF directly followed by 0xFF is necessarily fill);
    # keeping run-internal fills as data would bit-unstuff them as
    # 1-bits and could mis-decode a stream whose bit budget is not yet
    # exhausted at the fill (r4 advice)
    while end > 0 and buf[end - 1] == 0xFF:
        end -= 1
    stuffed = ff[(nxt == 0x00) & (ff < end)]
    return np.delete(buf[:end], stuffed + 1)


def _extend(v: int, size: int) -> int:
    return v if size == 0 or v >= (1 << (size - 1)) else v - (1 << size) + 1


def _sizes_of(v: np.ndarray) -> np.ndarray:
    """Vectorized JPEG magnitude category: 0 for 0, bit_length(|v|).
    ceil(log2(|v|+1)) is exact at the boundaries: |v|+1 = 2^k is a
    representable power of two, so log2 returns exactly k."""
    return np.ceil(np.log2(np.abs(v.astype(np.float64)) + 1.0)).astype(np.int64)


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = arr[..., 0].astype(np.float64), arr[..., 1].astype(np.float64), arr[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(arr: np.ndarray) -> np.ndarray:
    y, cb, cr = arr[..., 0], arr[..., 1] - 128.0, arr[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _blocks_of(chan: np.ndarray) -> np.ndarray:
    """(n_blocks, 8, 8) row-major blocks of an edge-padded channel."""
    h, w = chan.shape
    return (
        chan.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def jpeg_encode(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode (h, w, 3) uint8 RGB → baseline JFIF JPEG bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("jpeg_encode expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    qt_l, qt_c = _qtable(quality), _qtable_chroma(quality)
    ycc = _rgb_to_ycbcr(arr)
    ph, pw = -h % 8, -w % 8
    ycc = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")

    # quantized zigzag coefficients per component
    comps = []
    for ci in range(3):
        qt = qt_l if ci == 0 else qt_c
        blocks = _blocks_of(ycc[..., ci] - 128.0)
        coeffs = np.round((_D8 @ blocks @ _D8.T) / qt).astype(np.int32)
        comps.append(coeffs.reshape(-1, 64)[:, _ZZ])

    # --- entropy coding: vectorized precompute, light per-block loop ---
    # Huffman code/length lookup arrays per table (index = symbol)
    def _code_arrays(spec) -> tuple[list[int], list[int]]:
        codes = _canonical_codes(*spec)
        c = [0] * 256
        ln = [0] * 256
        for sym, (code, length) in codes.items():
            c[sym] = code
            ln[sym] = length
        return c, ln

    dc_arr = [_code_arrays(_DC_LUMA), _code_arrays(_DC_CHROMA)]
    ac_arr = [_code_arrays(_AC_LUMA), _code_arrays(_AC_CHROMA)]
    n_blocks = comps[0].shape[0]

    # per component: DC tokens (huffman code ‖ magnitude bits combined
    # into ONE ≤27-bit token) and the per-block nonzero-AC layout —
    # all magnitude categories/amplitudes computed vectorized
    comp_tok = []
    for ci in range(3):
        tsel = 0 if ci == 0 else 1
        zz = comps[ci].astype(np.int64)
        diff = np.diff(zz[:, 0], prepend=np.int64(0))
        dsz = _sizes_of(diff)
        dbits = np.where(diff >= 0, diff, diff + (np.int64(1) << dsz) - 1)
        hc = np.array(dc_arr[tsel][0], dtype=np.int64)
        hl = np.array(dc_arr[tsel][1], dtype=np.int64)
        dtok_c = (hc[dsz] << dsz) | dbits
        dtok_l = hl[dsz] + dsz
        ac = zz[:, 1:]
        nzb, nzk = np.nonzero(ac)
        vals = ac[nzb, nzk]
        asz = _sizes_of(vals)
        abits = np.where(vals >= 0, vals, vals + (np.int64(1) << asz) - 1)
        edges = np.searchsorted(nzb, np.arange(n_blocks + 1))
        comp_tok.append(
            (
                dtok_c.tolist(), dtok_l.tolist(), nzk.tolist(),
                asz.tolist(), abits.tolist(), edges.tolist(),
                ac_arr[tsel][0], ac_arr[tsel][1],
            )
        )

    tcodes: list[int] = []
    tlens: list[int] = []
    for bi in range(n_blocks):  # MCU = one block of each component (4:4:4)
        for ci in range(3):
            dtc, dtl, nzk, asz, abits, edges, ahc, ahl = comp_tok[ci]
            tcodes.append(dtc[bi])
            tlens.append(dtl[bi])
            prevzz = 0  # last written zigzag position
            for j in range(edges[bi], edges[bi + 1]):
                k = nzk[j]  # 0-based in the AC slice → zigzag pos k+1
                run = k - prevzz
                while run >= 16:
                    tcodes.append(ahc[0xF0])  # ZRL
                    tlens.append(ahl[0xF0])
                    run -= 16
                s = asz[j]
                sym = run * 16 + s
                tcodes.append((ahc[sym] << s) | abits[j])
                tlens.append(ahl[sym] + s)
                prevzz = k + 1
            if edges[bi] == edges[bi + 1] or nzk[edges[bi + 1] - 1] != 62:
                tcodes.append(ahc[0x00])  # EOB
                tlens.append(ahl[0x00])
    scan_bytes = _pack_tokens(
        np.array(tcodes, dtype=np.uint64), np.array(tlens, dtype=np.int64)
    )

    def dqt(tid: int, qt: np.ndarray) -> bytes:
        return _seg(0xFFDB, bytes([tid]) + qt.astype(np.uint8).reshape(64)[_ZZ].tobytes())

    def dht(tclass: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return _seg(0xFFC4, bytes([tclass * 16 + tid]) + bytes(bits) + bytes(vals))

    sof = _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"".join(struct.pack(">BBB", cid + 1, 0x11, 0 if cid == 0 else 1) for cid in range(3)),
    )
    sos = _seg(
        0xFFDA,
        bytes([3])
        + b"".join(bytes([cid + 1, 0x00 if cid == 0 else 0x11]) for cid in range(3))
        + bytes([0, 63, 0]),
    )
    app0 = _seg(0xFFE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, qt_l)
        + dqt(1, qt_c)
        + sof
        + dht(0, 0, _DC_LUMA)
        + dht(1, 0, _AC_LUMA)
        + dht(0, 1, _DC_CHROMA)
        + dht(1, 1, _AC_CHROMA)
        + sos
        + scan_bytes
        + b"\xff\xd9"
    )


_LUT_CACHE: dict[bytes, list[int]] = {}


def _lut16(inv: dict[tuple[int, int], int], raw_key: bytes) -> list[int]:
    """Packed (code-length << 8 | symbol) lookup table indexed by a
    16-bit peek. Canonical Huffman codes are prefix-free, so every
    16-bit window whose prefix is a valid code maps to exactly one
    entry; windows with no valid prefix keep 0 (→ entry < 256 →
    decode error). One list index per symbol in the hot loop instead
    of two (r5 — measured neutral at 128²: the loop is bound by the
    peek arithmetic, not the lookup count; kept for the simpler cache
    story). Memoized on the raw DHT segment bytes — the island decodes
    thousands of images that all transmit the standard Annex-K tables,
    and the bytes key avoids re-sorting the code dict per decode."""
    hit = _LUT_CACHE.get(raw_key)
    if hit is not None:
        return hit
    packed = np.zeros(65536, dtype=np.int64)
    for (length, code), s in inv.items():
        lo = code << (16 - length)
        packed[lo : lo + (1 << (16 - length))] = (length << 8) | s
    out = packed.tolist()
    if len(_LUT_CACHE) < 64:  # bound: foreign files with exotic tables
        _LUT_CACHE[raw_key] = out
    return out


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline 4:4:4 JPEG into (h, w, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    comps: list[tuple[int, int, int]] = []  # (cid, qsel, sampling)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker == 0xFFD9:
            raise ValueError("EOI before SOS")
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + ln]
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                pq, tid = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                zzvals = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8).astype(np.float64)
                qtabs[tid] = zzvals[_UNZZ].reshape(8, 8)
                p += 65
        elif marker == 0xFFC4:
            p = 0
            while p < len(payload):
                tclass, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                inv: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        inv[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                htabs[(tclass, tid)] = (inv, bytes(payload[p : p + 17 + nv]))
                p += 17 + nv
        elif marker == 0xFFC0:
            prec, fh, fw, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or nc != 3:
                raise ValueError("only 8-bit 3-component baseline supported")
            for c in range(nc):
                cid, samp, qsel = payload[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("chroma subsampling not supported (4:4:4 only)")
                comps.append((cid, qsel, samp))
            frame = (fh, fw)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xFFDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xFFDA:
            ns = payload[0]
            if ns != 3:
                raise ValueError("single interleaved 3-component scan required")
            # bind scan components to FRAME components by id (T.81 allows
            # the SOS order to differ from SOF; plane/table selection must
            # follow the ids, not the position)
            cid_to_frame = {cid: idx for idx, (cid, _q, _s) in enumerate(comps)}
            scan_sel = []  # (frame_idx, dc_tid, ac_tid, qsel)
            for c in range(ns):
                cid, tsel = payload[1 + 2 * c : 3 + 2 * c]
                if cid not in cid_to_frame:
                    raise ValueError(f"SOS references unknown component id {cid}")
                fidx = cid_to_frame[cid]
                scan_sel.append((fidx, tsel >> 4, tsel & 0xF, comps[fidx][1]))
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    else:
        raise ValueError("no SOS found")
    if frame is None:
        raise ValueError("no SOF before SOS")

    fh, fw = frame
    bh, bw_ = (fh + 7) // 8, (fw + 7) // 8
    n_blocks = bh * bw_

    # --- entropy decode: LUT-driven over a 32-bit sliding-word view ---
    unst = _unstuff_scan(data, pos)
    total_bits = len(unst) * 8
    # padding must cover the worst case a single MCU can overrun before
    # the per-MCU truncation check fires: 3 comps × (DC ≤ 27 bits +
    # 63 AC × ≤ 27 bits) ≈ 5.2 kbit ≈ 650 bytes. All-ones padding hits
    # an invalid-prefix LUT entry (canonical tables never assign the
    # all-ones max-length code), so overruns fail as ValueError, not
    # an IndexError escaping the codec's error contract.
    padded = np.concatenate([unst, np.full(1024, 0xFF, dtype=np.uint8)])
    w32 = (
        (padded[:-3].astype(np.uint32) << 24)
        | (padded[1:-2].astype(np.uint32) << 16)
        | (padded[2:-1].astype(np.uint32) << 8)
        | padded[3:].astype(np.uint32)
    ).tolist()
    luts = {key: _lut16(inv, raw) for key, (inv, raw) in htabs.items()}

    # coefficients land in two flat lists: a linear index into the
    # (3, n_blocks, 64) tensor (base precomputed per block-component)
    # and the value — the entropy loop is the hot path, so each
    # coefficient costs exactly two list appends
    out_idx: list[int] = []
    out_v: list[int] = []
    pred = [0, 0, 0]
    bp = 0  # bit position
    for blk in range(n_blocks):
        if bp > total_bits:
            raise ValueError("truncated JPEG scan")
        for fidx, dc_tid, ac_tid, _qsel in scan_sel:
            dlut = luts[(0, dc_tid)]
            alut = luts[(1, ac_tid)]
            base = (fidx * n_blocks + blk) << 6
            byte = bp >> 3
            sh = bp & 7
            peek = (w32[byte] >> (16 - sh)) & 0xFFFF
            e = dlut[peek]
            if e < 256:
                raise ValueError("invalid Huffman code in scan")
            size = e & 255
            bp += e >> 8
            if size:
                byte = bp >> 3
                sh = bp & 7
                v = (w32[byte] >> (32 - sh - size)) & ((1 << size) - 1)
                bp += size
                diff = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
            else:
                diff = 0
            pred[fidx] += diff
            out_idx.append(base)
            out_v.append(pred[fidx])
            k = 1
            while k < 64:
                byte = bp >> 3
                sh = bp & 7
                peek = (w32[byte] >> (16 - sh)) & 0xFFFF
                e = alut[peek]
                if e < 256:
                    raise ValueError("invalid Huffman code in scan")
                sym = e & 255
                bp += e >> 8
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0xF
                if size == 0:
                    if run != 15:
                        raise ValueError("invalid AC symbol")
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC run overflow")
                byte = bp >> 3
                sh = bp & 7
                v = (w32[byte] >> (32 - sh - size)) & ((1 << size) - 1)
                bp += size
                out_idx.append(base + k)
                out_v.append(v if v >= (1 << (size - 1)) else v - (1 << size) + 1)
                k += 1
    if bp > total_bits:
        raise ValueError("truncated JPEG scan")

    # --- batched dequantization + IDCT over all blocks per component ---
    coeffs = np.zeros((3, n_blocks, 64), dtype=np.float64)
    coeffs.reshape(-1)[np.array(out_idx, dtype=np.int64)] = out_v
    planes: list[np.ndarray | None] = [None] * 3
    for fidx, _dc_tid, _ac_tid, qsel in scan_sel:
        blocks = coeffs[fidx][:, _UNZZ].reshape(-1, 8, 8) * qtabs[qsel]
        pix = _D8.T @ blocks @ _D8 + 128.0
        planes[fidx] = (
            pix.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
    ycc = np.stack(planes, axis=-1)[:fh, :fw]
    return _ycbcr_to_rgb(ycc)


def jpeg_requantize(arr: np.ndarray, quality: int = 90) -> np.ndarray:
    """Fast regeneration-loss path: the pixels ``jpeg_decode(jpeg_encode
    (arr, quality))`` would produce, computed WITHOUT the entropy stage.

    Baseline JPEG's loss lives entirely in quantization — Huffman
    coding is lossless — so colorspace → DCT → quantize → dequantize →
    IDCT → colorspace reproduces the full roundtrip bit-for-bit (the
    float expressions below are copied verbatim from jpeg_encode /
    jpeg_decode so every rounding step matches; asserted equal in
    tests, the same contract as codec.lsy_requantize). The decode
    island's regen-PSNR gate uses this on its 128² crop: profiled
    ~62 ms/row for the full encode+decode roundtrip vs ~2 ms here —
    the entropy coder was 95% of the gate's cost and contributes
    nothing to the measured loss."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("jpeg_requantize expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    qt_l, qt_c = _qtable(quality), _qtable_chroma(quality)
    ycc = _rgb_to_ycbcr(arr)
    ph, pw = -h % 8, -w % 8
    ycc = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")
    bh, bw_ = (h + ph) // 8, (w + pw) // 8
    planes = []
    for ci in range(3):
        qt = qt_l if ci == 0 else qt_c
        blocks = _blocks_of(ycc[..., ci] - 128.0)
        # encode side (verbatim): forward DCT + quantize
        coeffs = np.round((_D8 @ blocks @ _D8.T) / qt).astype(np.int32)
        # decode side (verbatim): dequantize + IDCT + level shift
        pix = _D8.T @ (coeffs.astype(np.float64) * qt) @ _D8 + 128.0
        planes.append(
            pix.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
    ycc2 = np.stack(planes, axis=-1)[:h, :w]
    return _ycbcr_to_rgb(ycc2)
