"""Edge-case tests for suite64 ops: surprisal bounds, scan walk over
stuffed bytes/RSTs, tEXt cap, alt-coverage attribute forms."""

from __future__ import annotations

import pytest

from crawlspark.images import jpeg_scan_structure, png_text_chunks
from crawlspark.mmcurate import host_alt_coverage
from crawlspark.textops.quality import unigram_surprisal


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_surprisal_common_below_rare(spark):
    docs = spark.createDataFrame(
        [(i, "common words common words") for i in range(9)]
        + [(9, "xylophone quartz")],
        "doc_id long, text string")
    got = {r.id: r for r in unigram_surprisal(docs).collect()}
    assert got[0].mean_surprisal_milli < got[9].mean_surprisal_milli
    assert got[0].n_tokens == 4


def test_jpeg_scan_rst_and_stuffing_not_markers(spark):
    # entropy stream full of RSTs and stuffed FFs must not end the scan
    hexs = ("ffd8"
            + "ffc0" + "000b" + "08" + "0010" + "0010" + "01" + "011100"
            + "ffda" + "0008" + "01" + "0100" + "003f00"
            + "ff00" * 5 + "ffd0ffd1ffd2" + "ab" * 4
            + "ffd9")
    df = spark.createDataFrame([(1, bytes.fromhex(hexs))],
                               "id long, bytes binary")
    r = jpeg_scan_structure(df).collect()[0]
    assert r.jpeg_n_scans == 1 and r.jpeg_has_eoi == 1
    assert r.jpeg_restart_interval is None


def test_png_text_chunk_cap(spark):
    import struct
    import zlib

    def chunk(k, v):
        data = k.encode() + b"\x00" + v.encode()
        return (struct.pack(">I", len(data)) + b"tEXt" + data
                + struct.pack(">I", zlib.crc32(b"tEXt" + data)))

    hdr = bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452"
        "0000001000000010080200000000000000")
    body = hdr + b"".join(chunk(f"k{i}", "v") for i in range(20))
    df = spark.createDataFrame([(1, body)], "id long, bytes binary")
    r = png_text_chunks(df, max_chunks=16).collect()[0]
    assert len(r.png_texts) == 16
    assert r.png_texts[0]["key"] == "k0"


def test_alt_coverage_attribute_forms(spark):
    pages = spark.createDataFrame([
        ("h.com", "<IMG ALT=\"shout\" src=x><img\nsrc=y alt = \"s p\">"
                  "<img alt=\"\" src=z><imgine not a tag>"),
    ], "host string, body string")
    r = host_alt_coverage(pages).collect()[0]
    assert r.n_imgs == 3          # <imgine is not an img tag
    assert r.n_with_alt == 2      # empty alt does not count
    assert r.alt_permille == 666
