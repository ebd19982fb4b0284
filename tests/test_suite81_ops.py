"""Edge-case tests for suite81 ops: FLAC >32-bit totals, Ogg non-BOS,
inventory truncation, SVG handler false positives."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from crawlspark.extract import svg_security_audit
from crawlspark.images import png_chunk_inventory
from crawlspark.media import flac_streaminfo, ogg_page_sniff


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_flac_36bit_total_samples(spark):
    # total needs the high nibble: 5 * 2^32 samples
    total = 5 << 32
    rate = 48000
    b21 = ((rate % 16) << 4) | (0 << 1) | 0
    b22 = (15 << 4) | ((total >> 32) & 0x0F)
    packed = (bytes([rate >> 12 & 0xFF, (rate >> 4) & 0xFF, b21, b22])
              + struct.pack(">I", total & 0xFFFFFFFF))
    si = bytes(10) + packed + bytes(16)
    body = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si
    df = spark.createDataFrame([(1, body)], "id long, bytes binary")
    r = flac_streaminfo(df).collect()[0]
    assert r.flac_total_samples == total
    assert r.flac_bits == 16


def test_ogg_non_bos_page(spark):
    hdr = (b"OggS" + bytes([0, 0]) + bytes(8)
           + struct.pack("<II", 42, 7) + bytes(4) + bytes([1, 4])
           + b"data")
    df = spark.createDataFrame([(1, hdr)], "id long, bytes binary")
    r = ogg_page_sniff(df).collect()[0]
    assert r.ogg_bos == 0 and r.ogg_page_seq == 7
    assert r.ogg_codec == "unknown"


def test_png_inventory_stops_on_truncation(spark):
    sig = bytes.fromhex("89504e470d0a1a0a")
    # IHDR declares 13 bytes but payload cut short
    body = sig + struct.pack(">I", 13) + b"IHDR" + bytes(5)
    df = spark.createDataFrame([(1, body)], "id long, bytes binary")
    r = png_chunk_inventory(df).collect()[0]
    assert len(r.png_chunks) == 1
    assert r.png_chunks[0]["ctype"] == "IHDR"


def test_svg_handler_needs_assignment(spark):
    body = '<svg><text>季節 online donation</text></svg>'
    df = spark.createDataFrame([(body,)], "body string")
    r = df.select(svg_security_audit(F.col("body")).alias("s")) \
        .collect()[0].s
    # the word 'online'/'donation' must not count as on* handlers
    assert r.n_event_handlers == 0 and r.passive
