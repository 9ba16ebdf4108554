"""Vectorized image-decode island: the engine's single pixel-touching
stage, run as ``mapInPandas`` over Arrow batches (never per-row Python).

Grafts the reference's artwork QA ladder into columns
(SURVEY §2.8):
- decode (I1, `artwork_processing_common.py:234-238`) with strict error
  capture (corrupt payloads → ``decode_ok=false`` + reason, the
  engine's IMAGE_UNREADABLE flag, `…_common.py:270-273`);
- two-pass agreement gate (I5, `artwork_processing.py:1722-1725`):
  decode twice, byte-identical pixels required;
- declared-vs-actual dimension cross-check (I6 analogue);
- generation-loss PSNR gate for lossy formats: re-encode the decoded
  pixels at the declared quality and re-decode; PSNR ≥ 40 dB required
  (north-star pixel-integrity invariant). Computed on a centred
  128×128 crop — quantization-table corruption is global, so a bounded
  crop detects it at fixed cost regardless of image size. Lossless
  formats must round-trip exactly (PSNR = inf);
- phash recompute + cross-check vs the table's phash column. The
  stored phash was computed from pre-encode pixels, so for lossy
  formats the recompute (from decoded pixels) legitimately differs by
  a few bits — the gate is Hamming ≤ 12 for lossy (measured roundtrip
  max ≈ 10 at the 40 dB quality point), exact (0) for lossless.

The output carries verdict columns only — `bytes` never crosses a
shuffle boundary (SURVEY §7.4).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from pqc.image.codec import (
    LOSSLESS_FORMATS,
    SUPPORTED_FORMATS,
    decode,
    encode,
    lsy_requantize,
    psnr,
)
from pqc.image.phash import phash64

PSNR_MIN_DB = 40.0
PHASH_TOL_LOSSY = 12  # measured max roundtrip drift ≈ 10 at PSNR ≈ 42 dB
PHASH_TOL_LOSSLESS = 0
REGEN_CROP = 128  # regen-PSNR crop side: fixed cost for any image size

INTEGRITY_SCHEMA = (
    "seq long, image_id string, part int, w int, h int, fmt string, "
    "caption string, phash long, "
    "decode_ok boolean, decode_error string, actual_w int, actual_h int, "
    "dims_match boolean, two_pass_ok boolean, psnr_regen double, "
    "psnr_ok boolean, phash_recomputed long, phash_hamming int, "
    "phash_match boolean, thumb array<double>, thumb_mean double"
)

THUMB_GRID = 4  # 4×4 block-mean luma thumbnail (row-major, 16 doubles)


def _thumb_features(arr: np.ndarray) -> tuple[list[float] | None, float | None]:
    """Resize-style feature extraction riding the decode island's
    single bytes scan (the multimodal 'decode / feature-extract /
    resize' axis): a THUMB_GRID² block-mean luma thumbnail plus its
    scalar mean, computed in float64 from the decoded pixels. Pure
    deterministic numpy — the fixture-time sidecar reruns this exact
    function, so the oracle checks the doubles bit-for-bit."""
    h, w = arr.shape[:2]
    if h < THUMB_GRID or w < THUMB_GRID:
        return None, None
    luma = (
        0.299 * arr[..., 0].astype(np.float64)
        + 0.587 * arr[..., 1].astype(np.float64)
        + 0.114 * arr[..., 2].astype(np.float64)
    )
    cells = []
    for i in range(THUMB_GRID):
        y0, y1 = i * h // THUMB_GRID, (i + 1) * h // THUMB_GRID
        for j in range(THUMB_GRID):
            x0, x1 = j * w // THUMB_GRID, (j + 1) * w // THUMB_GRID
            cells.append(float(luma[y0:y1, x0:x1].mean()))
    return cells, float(np.mean(cells))


def _check_one(data: bytes | None, fmt: str | None, w, h, phash_col) -> dict:
    out = {
        "decode_ok": False,
        "decode_error": None,
        "actual_w": None,
        "actual_h": None,
        "dims_match": False,
        "two_pass_ok": False,
        "psnr_regen": None,
        "psnr_ok": False,
        "phash_recomputed": None,
        "phash_hamming": None,
        "phash_match": False,
        "thumb": None,
        "thumb_mean": None,
    }
    if fmt is None or fmt not in SUPPORTED_FORMATS:
        out["decode_error"] = f"unsupported format {fmt!r}"
        return out
    if data is None:
        out["decode_error"] = "null payload"
        return out
    try:
        arr = decode(bytes(data), fmt)
        arr2 = decode(bytes(data), fmt)  # two-pass agreement (I5)
    except NotImplementedError as exc:  # jpeg stub path
        out["decode_error"] = f"stub: {exc}"
        return out
    except Exception as exc:
        out["decode_error"] = f"{type(exc).__name__}: {exc}"
        return out
    out["decode_ok"] = True
    out["two_pass_ok"] = bool(np.array_equal(arr, arr2))
    out["thumb"], out["thumb_mean"] = _thumb_features(arr)
    ah, aw = arr.shape[:2]
    out["actual_w"], out["actual_h"] = int(aw), int(ah)
    out["dims_match"] = (w is not None and h is not None) and (
        int(w) == aw and int(h) == ah
    )
    if fmt in LOSSLESS_FORMATS:
        out["psnr_regen"] = float("inf")
        out["psnr_ok"] = True
    else:
        quality = data[12] if fmt == "lsy" and len(data) > 12 else 95
        y0 = max(0, (ah - REGEN_CROP) // 2)
        x0 = max(0, (aw - REGEN_CROP) // 2)
        crop = np.ascontiguousarray(arr[y0 : y0 + REGEN_CROP, x0 : x0 + REGEN_CROP])
        if fmt == "lsy":
            # bit-identical to encode→decode, minus the lossless
            # entropy stage (asserted equal in tests)
            regen = lsy_requantize(crop, int(quality))
        else:  # jpeg: same requantize shortcut (the T.81 entropy stage
            # is lossless and was ~95% of this gate's cost — asserted
            # bit-identical to the full roundtrip in tests)
            from pqc.image.jpeg import jpeg_requantize

            regen = jpeg_requantize(crop, int(quality))
        out["psnr_regen"] = psnr(crop, regen)
        out["psnr_ok"] = out["psnr_regen"] >= PSNR_MIN_DB
    rec = phash64(arr)
    out["phash_recomputed"] = rec
    if phash_col is not None:
        ham = bin(int(phash_col) ^ rec).count("1")
        tol = PHASH_TOL_LOSSLESS if fmt in LOSSLESS_FORMATS else PHASH_TOL_LOSSY
        out["phash_hamming"] = ham
        out["phash_match"] = ham <= tol
    return out


def decode_integrity(images: DataFrame) -> DataFrame:
    """images (north-star schema + seq/part) → integrity verdict table.

    One mapInPandas pass; Arrow batch size is capped session-wide
    (pqc/session.py) so image batches stay memory-bounded.
    """

    # Integer verdict columns must be materialized as NULLABLE Int64,
    # not inferred: pd.DataFrame over dicts mixing None (failed rows)
    # with ints infers float64, which silently rounds 60-bit phashes
    # (2^62-magnitude ints lose their low ~10 bits) BEFORE Arrow casts
    # back to long — caught by the r5 known-answer sidecar.
    _DTYPES = {
        "decode_ok": "bool",
        "decode_error": "object",
        "actual_w": "Int32",
        "actual_h": "Int32",
        "dims_match": "bool",
        "two_pass_ok": "bool",
        "psnr_regen": "float64",
        "psnr_ok": "bool",
        "phash_recomputed": "Int64",
        "phash_hamming": "Int32",
        "phash_match": "bool",
        "thumb": "object",  # list<double> / None
        "thumb_mean": "float64",
    }

    # degenerate-parallelism guard: a LIMITed or single-split input
    # otherwise runs the whole decode pass — and the per-task Python
    # worker/codegen warmup — on ONE task (guide §2.5: unsplittable
    # input; fix = repartition right after the read). Real corpus scans
    # arrive in ≥ cores splits and never shuffle a byte; only inputs
    # already collapsed to fewer splits than cores (e.g. a LIMIT) pay
    # one bounded shuffle of that small input. This also makes a
    # LIMIT-warmup pass reach every worker instead of one.
    spark = images.sparkSession
    par = spark.sparkContext.defaultParallelism
    if images.rdd.getNumPartitions() < par:
        images = images.repartition(par)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            checks = [
                _check_one(b, f, w, h, p)
                for b, f, w, h, p in zip(
                    pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"], pdf["phash"]
                )
            ]
            res = pd.DataFrame(
                {
                    k: pd.array([c[k] for c in checks], dtype=dt)
                    for k, dt in _DTYPES.items()
                }
            )
            base = pdf[
                ["seq", "image_id", "part", "w", "h", "fmt", "caption", "phash"]
            ].reset_index(drop=True)
            yield pd.concat([base, res], axis=1)

    return images.mapInPandas(run, schema=INTEGRITY_SCHEMA)
