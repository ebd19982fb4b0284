"""Round-3 part-4 operators: header dimension sniffing, IDN host folding,
transfer-integrity accounting."""

import struct
import zlib

import pytest
from pyspark.sql import functions as F


def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00")


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00"


def _bmp(w, h):
    return (b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
            + struct.pack("<ii", w, h) + b"\x01\x00")


def test_sniff_header_dims_real_bytes(spark):
    from crawlspark.images import sniff_header_dims

    rows = [
        ("png", _png(640, 480), 640, 480),
        ("gif", _gif(13, 7), 13, 7),
        ("bmp", _bmp(800, 600), 800, 600),
        ("bmp_td", _bmp(320, -240), 320, 240),     # top-down negative height
        ("trunc_bm", b"BM\x00\x00", 1, 1),         # too short -> unknown
        ("zlib", zlib.compress(b"xx"), 1, 1),      # fake-codec payload
    ]
    df = spark.createDataFrame(
        [(n, b, w, h) for n, b, w, h in rows],
        "image_id string, bytes binary, w long, h long",
    )
    got = {r["image_id"]: r for r in sniff_header_dims(df).collect()}
    assert (got["png"]["sniff_fmt"], got["png"]["sniff_w"],
            got["png"]["sniff_h"]) == ("png", 640, 480)
    assert (got["gif"]["sniff_fmt"], got["gif"]["sniff_w"],
            got["gif"]["sniff_h"]) == ("gif", 13, 7)
    assert (got["bmp"]["sniff_fmt"], got["bmp"]["sniff_w"],
            got["bmp"]["sniff_h"]) == ("bmp", 800, 600)
    td = got["bmp_td"]
    assert (td["sniff_h"], td["bmp_topdown"]) == (240, True)
    for k in ("trunc_bm", "zlib"):
        assert got[k]["sniff_fmt"] is None and got[k]["sniff_w"] is None
    # dim agreement: png row declared 640x480 -> no lie; gif declared matches
    assert got["png"]["dim_lie"] is False and got["png"]["bomb"] is False
    assert got["zlib"]["dim_lie"] is None


def test_sniff_bomb_gate(spark):
    from crawlspark.images import sniff_header_dims

    df = spark.createDataFrame(
        [("b", _gif(30000, 30000), 30000, 30000),
         ("ok", _gif(100, 100), 100, 100)],
        "image_id string, bytes binary, w long, h long",
    )
    got = {r["image_id"]: r["bomb"] for r in sniff_header_dims(df).collect()}
    assert got == {"b": True, "ok": False}


def test_idn_fold_edge_cases(spark):
    from crawlspark.canon import idn_fold_hosts

    bad = "ü" * 64 + ".de"  # label too long -> codec error -> keep lowered
    rows = [
        ("mixed", "a.münchen.b.de"),
        ("bad", bad),
        ("empty", ""),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "k string, host string")
    got = {r["k"]: r for r in idn_fold_hosts(df).collect()}
    assert got["mixed"]["host_ace"] == "a.xn--mnchen-3ya.b.de"
    assert got["mixed"]["was_unicode"] is True
    assert got["bad"]["host_ace"] == bad
    assert got["bad"]["was_unicode"] is False
    assert got["empty"]["host_ace"] == "" and got["empty"]["was_unicode"] is False


def test_transfer_accounting_hand(spark):
    from crawlspark.fetch import transfer_accounting

    rows = [
        ("h", 100, 100),   # clean
        ("h", 100, 60),    # truncated
        ("h", 100, 110),   # over-read
        ("h", None, 55),   # undeclared
    ]
    df = spark.createDataFrame(
        rows, "host string, content_length long, body_bytes long"
    )
    r = transfer_accounting(df).collect()[0]
    assert (r["n_responses"], r["n_truncated"], r["n_overread"],
            r["n_undeclared"]) == (4, 1, 1, 1)
    assert (r["declared_bytes"], r["actual_bytes"]) == (300, 325)


def test_sniff_bomb_overflow_header_does_not_crash(spark):
    """A crafted 4294967295x4294967295 PNG header overflows BIGINT in
    w*h; under Spark's ANSI mode the gate must flag it as a bomb, not
    die with ARITHMETIC_OVERFLOW."""
    from crawlspark.images import sniff_header_dims

    df = spark.createDataFrame(
        [("evil", _png(0xFFFFFFFF, 0xFFFFFFFF), 1, 1)],
        "image_id string, bytes binary, w long, h long",
    )
    r = sniff_header_dims(df).collect()[0]
    assert r["bomb"] is True and r["sniff_w"] == 4294967295
