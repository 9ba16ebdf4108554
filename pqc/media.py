"""Multimodal (audio/video) column plumbing — opaque ``bytes`` +
typed metadata, processed through Arrow-batched ``mapInPandas``.

The sandbox has no audio/video codecs, so DECODE IS A DETERMINISTIC
FAKE (clearly marked below): payload bytes seed a PRNG that stands in
for PCM samples / frame lumas. Everything around the stub is the real
engine surface a production codec would drop into: the single
bytes-reading scan, the Arrow batch shape, per-task BLAS pinning
(pqc/session.py), the metadata-only frame-sampling plan, and the
feature schema. Swap ``_fake_pcm`` / ``_fake_frame`` for libsndfile /
pyav calls and nothing else changes.

Queries:
- ``media_frame_sample_plan`` (DuckDB-oracled): which frame indices a
  uniform-K sampler reads per video — pure metadata arithmetic, no
  bytes touched, so the scan prunes the payload column entirely.
- ``media_decode_features`` (rows-only): the decode island — audio
  RMS / zero-crossing / duration, video sampled-frame mean luma, all
  computed batch-vectorized in numpy.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pqc.registry import register

N_MEDIA_ROWS = 240
N_FRAME_SAMPLES = 8
MEDIA_SEED = 1337

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # 'audio' | 'video'
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),  # audio
        T.StructField("n_samples", T.LongType(), True),  # audio
        T.StructField("fps", T.DoubleType(), True),  # video
        T.StructField("n_frames", T.IntegerType(), True),  # video
        T.StructField("part", T.IntegerType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("part", T.IntegerType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),  # audio
        T.StructField("zero_crossing_rate", T.DoubleType(), True),  # audio
        T.StructField("n_frames_sampled", T.IntegerType(), True),  # video
        T.StructField("mean_luma", T.DoubleType(), True),  # video
    ]
)


def _media_row(i: int) -> dict:
    rng = np.random.default_rng(MEDIA_SEED + i)
    kind = "audio" if i % 2 == 0 else "video"
    payload = rng.bytes(256) if i % 40 != 17 else b""  # 17-residue: corrupt
    row = {
        "media_id": f"med_{i:08d}",
        "kind": kind,
        "bytes": payload,
        "sample_rate": None,
        "n_samples": None,
        "fps": None,
        "n_frames": None,
        "part": i % 8,
    }
    if kind == "audio":
        row["sample_rate"] = int((16000, 22050, 44100)[i % 3])
        row["n_samples"] = int(row["sample_rate"] * (1 + (i % 7)))
    else:
        row["fps"] = float((24.0, 30.0)[i % 2])
        row["n_frames"] = int(24 * (2 + (i % 9)))
    return row


def media_table(spark: SparkSession, n_rows: int = N_MEDIA_ROWS) -> DataFrame:
    """Deterministic synthetic media table, generated distributively
    (every row a pure function of its index, same pattern as
    pqc/fixtures.generate_images)."""
    from pqc.session import _ship_package

    _ship_package(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([_media_row(int(i)) for i in pdf["id"]])

    return spark.range(0, n_rows, numPartitions=8).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


# --- DETERMINISTIC FAKE DECODERS (environment stub; see module doc) ---


def _payload_seed(data: bytes) -> int:
    return int(hashlib.md5(data).hexdigest()[:12], 16)


def _fake_pcm(data: bytes, n: int) -> np.ndarray:
    """STUB for a real PCM decode: seeded uniform noise in [-1, 1]."""
    rng = np.random.default_rng(_payload_seed(data))
    return rng.uniform(-1.0, 1.0, size=min(n, 65536))


def _fake_frame_lumas(data: bytes, frame_indices: np.ndarray) -> np.ndarray:
    """STUB for frame decode: one deterministic mean-luma per frame."""
    rng = np.random.default_rng(_payload_seed(data) ^ 0xF5A3)
    lumas = rng.uniform(16.0, 235.0, size=4096)
    return lumas[frame_indices % len(lumas)]


def uniform_frame_indices(n_frames: int, k: int = N_FRAME_SAMPLES) -> np.ndarray:
    """Uniform-K sampling plan: floor(j * n_frames / k) for j in [0, k).
    Pure metadata arithmetic — mirrored exactly by the DuckDB oracle."""
    k = min(k, n_frames)
    return (np.arange(k) * n_frames // k).astype("int64")


def _media_parquet_path() -> str:
    return f"/tmp/pqc_fixtures/media_n{N_MEDIA_ROWS}"


def cached_media_table(spark: SparkSession) -> DataFrame:
    """The media table persisted as partitioned parquet (once), so
    metadata-only consumers get REAL column pruning of the payload and
    the decode island gets a real bytes scan — same layout discipline
    as the images fixture."""
    import os

    from pqc.session import _ship_package

    _ship_package(spark)  # decode island needs pqc on workers even warm-cached
    path = _media_parquet_path()
    if not os.path.exists(path + "/_SUCCESS"):
        media_table(spark).write.mode("overwrite").partitionBy("part").parquet(path)
    return spark.read.parquet(path)


_FRAME_PLAN_ORACLE = f"""
WITH v AS (
  SELECT media_id, n_frames
  FROM read_parquet('{_media_parquet_path()}/*/*.parquet')
  WHERE kind = 'video'
)
SELECT media_id,
       CAST((j * n_frames) // {N_FRAME_SAMPLES} AS BIGINT) AS frame_idx
FROM v, UNNEST(generate_series(0, {N_FRAME_SAMPLES - 1})) AS g(j)
WHERE n_frames >= {N_FRAME_SAMPLES}
UNION ALL
SELECT media_id, CAST(j AS BIGINT) AS frame_idx
FROM v, UNNEST(generate_series(0, {N_FRAME_SAMPLES - 1})) AS g(j)
WHERE n_frames < {N_FRAME_SAMPLES} AND j < n_frames
"""


@register("media_frame_sample_plan", oracle=_FRAME_PLAN_ORACLE)
def media_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan (metadata only — the parquet scan prunes the
    ``bytes`` column, asserted by plan test): uniform-K indices
    floor(j·n_frames/K) per video. At corpus scale this is the manifest
    a decode fleet consumes; keeping it payload-free means planning
    runs at parquet-footer speed."""
    v = cached_media_table(spark).filter(F.col("kind") == "video").select(
        "media_id", "n_frames"
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(N_FRAME_SAMPLES - 1))).alias("j")
    return (
        v.select("media_id", "n_frames", j)
        .filter(
            (F.col("n_frames") >= N_FRAME_SAMPLES)
            | (F.col("j") < F.col("n_frames"))
        )
        .select(
            "media_id",
            F.when(
                F.col("n_frames") >= N_FRAME_SAMPLES,
                F.expr(f"(j * n_frames) DIV {N_FRAME_SAMPLES}"),
            )
            .otherwise(F.col("j"))
            .cast("bigint")
            .alias("frame_idx"),
        )
    )


def decode_features(media: DataFrame) -> DataFrame:
    """The multimodal decode island: ONE bytes-reading scan, Arrow
    batches, numpy-vectorized features, fake decode clearly stubbed."""

    def island(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                data = r.bytes
                ok = data is not None and len(data) > 0
                row = {
                    "media_id": r.media_id,
                    "kind": r.kind,
                    "part": int(r.part),
                    "decode_ok": bool(ok),
                    "duration_sec": None,
                    "rms": None,
                    "zero_crossing_rate": None,
                    "n_frames_sampled": None,
                    "mean_luma": None,
                }
                if ok and r.kind == "audio":
                    pcm = _fake_pcm(data, int(r.n_samples))
                    row["duration_sec"] = float(r.n_samples) / float(r.sample_rate)
                    row["rms"] = float(np.sqrt(np.mean(pcm * pcm)))
                    row["zero_crossing_rate"] = float(
                        np.mean(np.abs(np.diff(np.signbit(pcm).astype(np.int8))))
                    )
                elif ok and r.kind == "video":
                    idx = uniform_frame_indices(int(r.n_frames))
                    lumas = _fake_frame_lumas(data, idx)
                    row["duration_sec"] = float(r.n_frames) / float(r.fps)
                    row["n_frames_sampled"] = int(len(idx))
                    row["mean_luma"] = float(np.mean(lumas))
                out.append(row)
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(island, schema=FEATURE_SCHEMA)


@register("media_decode_features")
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-island features per media row (audio rms/zcr/duration,
    video sampled-luma) — rows-only at the driver (the stubbed decode is
    Python-side); determinism + schema + corrupt-payload handling are
    pytest-gated (tests/test_media.py)."""
    return decode_features(cached_media_table(spark)).orderBy("media_id")
