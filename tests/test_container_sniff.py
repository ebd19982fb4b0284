"""gif_animation block walk + isobmff_meta box walk against handcrafted
byte streams (spec-edge layouts the constructed gate families don't hit:
local color tables, unknown boxes, largesize, to-EOF boxes, garbage)."""

from __future__ import annotations

import struct

from crawlspark.images import gif_animation, isobmff_meta

GIF_LSD = b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0, 0, 0])


def _frame(lct_bits: int | None = None) -> bytes:
    """Image descriptor + optional local color table + LZW stub."""
    packed = 0x80 | (lct_bits - 1) if lct_bits else 0
    body = b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + bytes([packed])
    if lct_bits:
        body += b"\x00" * (3 * (1 << lct_bits))
    return body + b"\x02" + b"\x02\x4c\x01" + b"\x00"


def _gce(delay: int) -> bytes:
    return b"\x21\xf9\x04\x00" + struct.pack("<H", delay) + b"\x00\x00"


def _gif(spark, payloads):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "id long, bytes binary")
    return {r["id"]: r for r in gif_animation(df).collect()}


def test_gif_walk_edges(spark):
    gct = b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x80 | 1, 0, 0]) \
        + b"\x00" * (3 * 4)  # global color table, 2-bit -> 4 entries
    rows = _gif(spark, [
        GIF_LSD + _frame() + b"\x3b",                     # 0 static
        gct + _gce(7) + _frame(lct_bits=2) + _gce(3) + _frame() + b"\x3b",
        GIF_LSD + _frame(),                               # 2 no trailer
        b"NOTAGIF" + b"\x00" * 20,                        # 3 non-GIF
        GIF_LSD[:10],                                     # 4 truncated header
        GIF_LSD + _gce(5) + _frame()[:4],                 # 5 cut mid-frame
    ])
    assert (rows[0]["gif_frames"], rows[0]["gif_animated"],
            rows[0]["gif_complete"]) == (1, 0, 1)
    # GCT + LCT skipped correctly; delays collected per frame
    assert rows[1]["gif_frames"] == 2
    assert rows[1]["gif_min_delay_cs"] == 3
    assert rows[1]["gif_total_delay_cs"] == 10
    assert rows[1]["gif_loop_count"] is None
    assert rows[2]["gif_complete"] == 0 and rows[2]["gif_frames"] == 1
    assert rows[3]["gif_kind"] is None and rows[3]["gif_frames"] is None
    assert rows[4]["gif_kind"] is None
    assert rows[5]["gif_frames"] == 0 and rows[5]["gif_complete"] == 0


def _box(typ: bytes, body: bytes, largesize: bool = False,
         to_eof: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I", 1) + typ \
            + struct.pack(">Q", 16 + len(body)) + body
    if to_eof:
        return struct.pack(">I", 0) + typ + body
    return struct.pack(">I", 8 + len(body)) + typ + body


def _ispe(w: int, h: int) -> bytes:
    return _box(b"ispe", b"\x00" * 4 + struct.pack(">II", w, h))


def _avif(w: int, h: int, extra_ipco: bytes = b"", **meta_kw) -> bytes:
    ftyp = _box(b"ftyp", b"avif" + b"\x00" * 4 + b"avifmif1")
    ipco = _box(b"ipco", extra_ipco + _ispe(w, h))
    iprp = _box(b"iprp", ipco)
    return ftyp + _box(b"meta", b"\x00" * 4 + iprp, **meta_kw)


def _bmff(spark, payloads):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "id long, bytes binary")
    return {r["id"]: r for r in isobmff_meta(df).collect()}


def test_bmff_walk_edges(spark):
    unknown = _box(b"free", b"\xde\xad\xbe\xef" * 3)
    pixi = _box(b"pixi", b"\x00" * 4 + bytes([2, 10, 10]))
    good = _avif(640, 480, extra_ipco=unknown + pixi)
    rows = _bmff(spark, [
        good,                                        # 0 unknown box skipped
        _avif(12, 34, **{"largesize": True}),        # 1 size==1 meta
        _avif(7, 9, **{"to_eof": True}),             # 2 size==0 meta
        good[: len(good) - 6],                       # 3 truncated inside meta
        b"\x00" * 24,                                # 4 not BMFF
        good[:20],                                   # 5 cut inside ftyp body
    ])
    assert (rows[0]["bmff_brand"], rows[0]["bmff_w"], rows[0]["bmff_h"],
            rows[0]["bmff_channels"], rows[0]["bmff_bit_depth"]) \
        == ("avif", 640, 480, 2, 10)
    assert (rows[1]["bmff_w"], rows[1]["bmff_h"]) == (12, 34)
    assert (rows[2]["bmff_w"], rows[2]["bmff_h"]) == (7, 9)
    # declared meta size overruns the cut payload: brand survives, dims NULL
    assert rows[3]["bmff_brand"] == "avif" and rows[3]["bmff_w"] is None
    assert rows[4]["bmff_brand"] is None
    assert rows[5]["bmff_brand"] is None and rows[5]["bmff_w"] is None
