"""Audio/video payload plumbing: deterministic fake codec, Arrow-batched
decode / feature-extract / frame-sample / resize (crawlspark.media)."""

from __future__ import annotations

import zlib

import numpy as np
from pyspark.sql import functions as F

from crawlspark import media

from .conftest import SF_DIR


def test_generate_audio_deterministic_and_lossless(spark):
    a1 = media.generate_audio(spark, SF_DIR).orderBy("audio_id").limit(5).collect()
    a2 = media.generate_audio(spark, SF_DIR).orderBy("audio_id").limit(5).collect()
    assert [r["bytes"] for r in a1] == [r["bytes"] for r in a2]
    r = a1[0]
    doc_id = int(r["audio_id"].split("-")[1])
    assert r["sample_rate"] == media.audio_rate_for(doc_id)
    decoded = media._decode_audio(r["bytes"])
    assert len(decoded) == r["n_samples"]
    assert np.array_equal(
        decoded, media._audio_samples(doc_id, media.audio_len_for(doc_id))
    )


def test_audio_features_match_numpy(spark):
    audio = media.generate_audio(spark, SF_DIR)
    feats = {
        r["audio_id"]: r
        for r in media.audio_features(audio).filter(
            F.col("audio_id").isin("aud-0", "aud-7", "aud-100")
        ).collect()
    }
    for doc_id in (0, 7, 100):
        n = media.audio_len_for(doc_id)
        s = media._audio_samples(doc_id, n).astype(np.float64)
        r = feats[f"aud-{doc_id}"]
        assert r["roundtrip_ok"]
        assert r["duration_ms"] == n * 1000 // media.audio_rate_for(doc_id)
        assert r["rms_milli"] == int(round(float(np.sqrt((s * s).mean())) * 1000))
        zc = int((np.signbit(s[1:]) != np.signbit(s[:-1])).sum())
        assert r["zcr_milli"] == zc * 1000 // (n - 1)


def test_sample_frames_indices_and_pixels(spark):
    video = media.generate_video(spark, SF_DIR)
    frames = media.sample_frames(video, every=2).filter(
        F.col("video_id") == "vid-3"
    ).orderBy("frame_idx").collect()
    nf = media.video_frames_for(3)
    assert [r["frame_idx"] for r in frames] == list(range(0, nf, 2))
    w, h = media.video_dims_for(3)
    ref = media._video_frames(3, nf, w, h)
    for r in frames:
        got = np.frombuffer(zlib.decompress(r["bytes"]), dtype=np.uint8).reshape(
            h, w, 3
        )
        assert np.array_equal(got, ref[r["frame_idx"]])


def test_resize_frames_block_mean(spark):
    video = media.generate_video(spark, SF_DIR)
    frames = media.sample_frames(video, every=4)
    small = media.resize_frames(frames, factor=2).filter(
        F.col("video_id") == "vid-3"
    ).collect()
    w, h = media.video_dims_for(3)
    ref = media._video_frames(3, media.video_frames_for(3), w, h)
    for r in small:
        assert (r["w"], r["h"]) == (w // 2, h // 2)
        got = np.frombuffer(zlib.decompress(r["bytes"]), dtype=np.uint8).reshape(
            r["h"], r["w"], 3
        )
        f = ref[r["frame_idx"]][: r["h"] * 2, : r["w"] * 2]
        expect = (
            f.reshape(r["h"], 2, r["w"], 2, 3).mean(axis=(1, 3)).astype(np.uint8)
        )
        assert np.array_equal(got, expect)


def test_no_per_row_python_in_plans(spark):
    """Every media stage must be ONE Arrow-batched python node (MapInPandas),
    never a row-at-a-time BatchEvalPython."""
    video = media.generate_video(spark, SF_DIR)
    plan = media.resize_frames(media.sample_frames(video)).filter(
        F.col("video_id") == "vid-1"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
