"""Multimodal (audio/video) plumbing tests: schema, determinism,
corrupt-payload handling, sampling-plan arithmetic, and the
payload-free plan invariant."""

from __future__ import annotations

import re

import numpy as np

from pqc.media import (
    FEATURE_SCHEMA,
    N_FRAME_SAMPLES,
    decode_features,
    media_table,
    uniform_frame_indices,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_media_features_schema_and_determinism(spark):
    feats = decode_features(media_table(spark))
    assert feats.schema == FEATURE_SCHEMA
    a = {r["media_id"]: r for r in feats.collect()}
    b = {r["media_id"]: r for r in decode_features(media_table(spark)).collect()}
    assert len(a) == 240
    for k in a:
        assert a[k] == b[k]


def test_media_kinds_populate_their_feature_columns(spark):
    rows = decode_features(media_table(spark)).collect()
    for r in rows:
        if not r["decode_ok"]:
            continue
        if r["kind"] == "audio":
            # two sines + gaussian noise, peak-normalized by 1/1.2:
            # analytic rms ≈ 0.32
            assert r["rms"] is not None and 0.1 < r["rms"] < 0.6
            assert r["zero_crossing_rate"] is not None
            assert r["n_frames_sampled"] is None
        else:
            assert r["n_frames_sampled"] == N_FRAME_SAMPLES
            assert r["mean_luma"] is not None and 16 <= r["mean_luma"] <= 235
            assert r["rms"] is None


def test_media_corrupt_payload_flagged_not_crashed(spark):
    rows = decode_features(media_table(spark)).collect()
    bad = [r for r in rows if not r["decode_ok"]]
    assert len(bad) == 2 * (240 // 40)  # residues 17 (video) + 18 (audio)
    assert {r["kind"] for r in bad} == {"audio", "video"}  # both parsers
    assert all(r["duration_sec"] is None for r in bad)


def test_uniform_frame_indices_arithmetic():
    assert uniform_frame_indices(48).tolist() == [0, 6, 12, 18, 24, 30, 36, 42]
    assert uniform_frame_indices(5).tolist() == [0, 1, 2, 3, 4]  # k capped
    assert (np.diff(uniform_frame_indices(217)) > 0).all()


def test_frame_plan_never_reads_bytes(spark):
    from pqc.registry import REGISTRY, all_queries

    all_queries()
    df = REGISTRY["media_frame_sample_plan"].fn(spark, "")
    plan = _plan(df)
    assert not re.search(r"ReadSchema: struct<[^>]*bytes", plan), plan[:2000]


# ---------------------------------------------------------------------------
# Real codecs (pqc/media_codec.py): exact roundtrips + strictness
# ---------------------------------------------------------------------------


def test_wav_roundtrip_exact():
    import pytest

    from pqc.media_codec import wav_decode, wav_encode

    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32767, size=1000, dtype=np.int16)
    sr, out = wav_decode(wav_encode(mono, 22050))
    assert sr == 22050 and out.shape == (1000, 1)
    assert np.array_equal(out[:, 0], mono)

    stereo = rng.integers(-32768, 32767, size=(500, 2), dtype=np.int16)
    sr, out = wav_decode(wav_encode(stereo, 44100))
    assert sr == 44100 and np.array_equal(out, stereo)

    data = wav_encode(mono, 16000)
    with pytest.raises(ValueError):
        wav_decode(data[: len(data) // 2])  # truncated
    with pytest.raises(ValueError):
        wav_decode(b"RIFFjunkWAVEnope")


def test_rvid_roundtrip_and_random_access():
    import pytest

    from pqc.media_codec import rvid_encode, rvid_frame, rvid_header

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, size=(24, 12, 16), dtype=np.uint8)
    data = rvid_encode(frames, 24.0)
    assert rvid_header(data) == (16, 12, 24, 24.0)
    for j in (0, 7, 23):
        assert np.array_equal(rvid_frame(data, j), frames[j])
    with pytest.raises(ValueError):
        rvid_header(data[:-10])  # truncated
    with pytest.raises(IndexError):
        rvid_frame(data, 24)


def test_media_metadata_mismatch_fails_decode(spark):
    """A payload whose header disagrees with the table's declared
    metadata must fail decode_ok — the audio/video twin of the images
    dims cross-check."""
    import pandas as pd

    from pqc.media import MEDIA_SCHEMA, audio_samples_for, decode_features
    from pqc.media_codec import wav_encode

    good = wav_encode(audio_samples_for(0, 4000), 16000)
    rows = pd.DataFrame(
        [
            ("ok", "audio", good, 16000, 4000, None, None, 0),
            ("bad_sr", "audio", good, 22050, 4000, None, None, 0),
            ("bad_n", "audio", good, 16000, 9999, None, None, 0),
        ],
        columns=[f.name for f in MEDIA_SCHEMA.fields],
    )
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {r["media_id"]: r["decode_ok"] for r in decode_features(df).collect()}
    assert got == {"ok": True, "bad_sr": False, "bad_n": False}
