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
            assert r["rms"] is not None and 0.4 < r["rms"] < 0.7  # uniform noise
            assert r["zero_crossing_rate"] is not None
            assert r["n_frames_sampled"] is None
        else:
            assert r["n_frames_sampled"] == N_FRAME_SAMPLES
            assert r["mean_luma"] is not None and 16 <= r["mean_luma"] <= 235
            assert r["rms"] is None


def test_media_corrupt_payload_flagged_not_crashed(spark):
    rows = decode_features(media_table(spark)).collect()
    bad = [r for r in rows if not r["decode_ok"]]
    assert len(bad) == 240 // 40  # the i%40==17 residue
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
