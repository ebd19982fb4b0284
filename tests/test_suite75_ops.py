"""Edge-case tests for suite75 ops: CRLF playlists, audio-only
variants, overlapping cues, syncsafe maximum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.media import id3_sniff, m3u8_variants, vtt_cues, wav_sniff


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_m3u8_crlf_and_audio_only(spark):
    body = ("#EXTM3U\r\n"
            "#EXT-X-STREAM-INF:BANDWIDTH=96000,CODECS=\"mp4a\"\r\n"
            "audio.m3u8\r\n")
    df = spark.createDataFrame([(body,)], "body string")
    r = m3u8_variants(df).collect()[0]
    assert len(r.m3u8_variants) == 1
    v = r.m3u8_variants[0]
    assert v.bandwidth == 96000
    assert v.width is None and v.height is None  # audio-only, no RES
    assert v.uri == "audio.m3u8"


def test_wav_nonstandard_chunk_order_nulls(spark):
    # LIST chunk before fmt -> canonical-offset sniff must NOT misread
    body = (b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE"
            + b"LIST" + b"\x10\x00\x00\x00" + b"\x00" * 16)
    df = spark.createDataFrame([(1, body)], "id long, bytes binary")
    r = wav_sniff(df).collect()[0]
    assert r.wav_channels is None and r.wav_sample_rate is None


def test_vtt_overlapping_cues_sum_exceeds_span(spark):
    body = ("WEBVTT\n\n"
            "00:00:00.000 --> 00:00:10.000\na\n\n"
            "00:00:05.000 --> 00:00:15.000\nb\n")
    df = spark.createDataFrame([(body,)], "body string")
    r = vtt_cues(df).collect()[0]
    assert r.vtt_n_cues == 2
    assert r.vtt_captioned_ms == 20_000   # naive sum (overlap counted)
    assert r.vtt_span_ms == 15_000


def test_id3_syncsafe_maximum(spark):
    b = b"ID3" + bytes([4, 0, 0, 0x7F, 0x7F, 0x7F, 0x7F]) + b"\x00"
    df = spark.createDataFrame([(1, b)], "id long, bytes binary")
    r = id3_sniff(df).collect()[0]
    assert r.id3_tag_bytes == (1 << 28) - 1
    assert r.id3_unsynchronized == 0
