"""Edge-case tests for suite60 ops: Merkle order-invariance and
sensitivity, watermark lateness hand-case, script-mix ties, PNG CRC
walk past a bad middle chunk."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from crawlspark.checkpoint import merkle_root
from crawlspark.images import png_crc_check
from crawlspark.streaming import watermark_lateness
from crawlspark.textops.quality import script_mix


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_merkle_order_invariant_and_sensitive(spark):
    a = spark.createDataFrame([(i,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i,) for i in reversed(range(100))],
                              "k long").repartition(7)
    ra = merkle_root(a, "k", levels=4).collect()[0]
    rb = merkle_root(b, "k", levels=4).collect()[0]
    assert ra.root == rb.root and ra.n_rows == 100
    # one changed key must change the root
    c = spark.createDataFrame(
        [(i,) for i in range(99)] + [(1000,)], "k long")
    rc = merkle_root(c, "k", levels=4).collect()[0]
    assert rc.root != ra.root


def test_watermark_lateness_hand_case(spark):
    # arrival order: ts 100, 50 (late vs wm=100-30=70), 200, 180 (on time,
    # wm=200-30=170 <= 180)
    rows = [("p", 100, 1), ("p", 50, 2), ("p", 200, 3), ("p", 180, 4)]
    df = spark.createDataFrame(rows, "part string, ts_us long, arrival long")
    r = watermark_lateness(df, delay_us=30).collect()[0]
    assert r.n_events == 4 and r.n_late == 1
    assert r.max_lateness_us == 20  # wm 70 - ts 50
    assert r.late_permille == 250


def test_script_mix_ties_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, "ab Пр"),      # latin 2, cyrillic 2 -> tie, latin listed first
         (2, ""),            # no letters -> NULL dominant
         (3, "你好 hi 123")],
        "doc_id long, text string")
    got = {r.id: r for r in script_mix(docs).collect()}
    assert got[1].dominant_script == "latin" and got[1].mixed
    assert got[2].dominant_script is None and not got[2].mixed
    assert got[3].n_han == 2 and got[3].n_digit == 3
    assert got[3].dominant_script == "latin"  # tie latin 2 vs han 2


def _chunk(typ: bytes, data: bytes, corrupt: bool = False) -> bytes:
    crc = zlib.crc32(typ + data) & 0xFFFFFFFF
    if corrupt:
        crc ^= 1
    return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", crc)


def test_png_crc_walk_continues_past_bad_chunk(spark):
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    payload = (sig + _chunk(b"IHDR", ihdr)
               + _chunk(b"tEXt", b"k\x00v", corrupt=True)
               + _chunk(b"IDAT", b"\x00" * 4, corrupt=True)
               + _chunk(b"IEND", b""))
    df = spark.createDataFrame([(1, payload)], "id long, bytes binary")
    r = png_crc_check(df).collect()[0]
    assert r.png_n_chunks == 4
    assert r.png_n_bad_crc == 2
    assert r.png_first_bad_type == "tEXt"
    assert r.png_has_iend == 1 and r.png_truncated == 0
