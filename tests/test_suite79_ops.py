"""Edge-case tests for suite79 ops: largesize boxes, mvhd v1, free
bitrate index, empty ladders."""

from __future__ import annotations

import struct

import pytest

from crawlspark.media import mp3_frame_sniff, mp4_faststart


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def _box(t, payload):
    return struct.pack(">I", 8 + len(payload)) + t + payload


def test_mp4_mvhd_v1_and_largesize(spark):
    mvhd_v1 = _box(b"mvhd", bytes([1, 0, 0, 0]) + b"\x00" * 16
                   + struct.pack(">I", 90000)
                   + struct.pack(">Q", 45_000) + b"\x00" * 4)
    moov = _box(b"moov", mvhd_v1)
    # mdat with 64-bit largesize
    mdat = (struct.pack(">I", 1) + b"mdat"
            + struct.pack(">Q", 24) + b"\x00" * 8)
    body = _box(b"ftyp", b"isom\x00\x00\x00\x00") + moov + mdat
    df = spark.createDataFrame([(1, body)], "id long, bytes binary")
    r = mp4_faststart(df).collect()[0]
    assert r.mp4_faststart == 1
    assert r.mp4_duration_ms == 500      # 45000 / 90000 ticks
    assert r.mp4_n_boxes == 3


def test_mp3_free_bitrate_index_null(spark):
    # idx 0 = 'free' bitrate: sync valid but bitrate unknown
    df = spark.createDataFrame(
        [(1, bytes.fromhex("fffb0000"))], "id long, bytes binary")
    r = mp3_frame_sniff(df).collect()[0]
    assert r.mp3_valid_sync == 1
    assert r.mp3_bitrate_kbps is None
    assert r.mp3_sample_rate == 44100
