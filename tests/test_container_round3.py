"""Round-3 container walks against handcrafted byte streams: animated
WebP (VP8X/ANIM/ANMF), APNG (acTL/fcTL placement rules), TIFF IFD in
both byte orders, SVG text sniffing, JPEG APPn color-management walk."""

from __future__ import annotations

import struct

from crawlspark.images import (
    apng_animation,
    jpeg_app_segments,
    svg_dims,
    tiff_dims,
    webp_animation,
)


def _rows(spark, fn, payloads):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "id long, bytes binary")
    return {r["id"]: r for r in fn(df).collect()}


# --------------------------------------------------------------------------
# animated WebP
# --------------------------------------------------------------------------

def _chunk(cc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return cc + struct.pack("<I", len(payload)) + payload + pad


def _vp8x(flags: int, w: int = 4, h: int = 4) -> bytes:
    return _chunk(
        b"VP8X",
        bytes([flags, 0, 0, 0])
        + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))


def _anmf(dur_ms: int) -> bytes:
    head = (b"\x00" * 12) + dur_ms.to_bytes(3, "little") + b"\x00"
    return _chunk(b"ANMF", head)


def _webp(*chunks: bytes) -> bytes:
    body = b"WEBP" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_webp_animation(spark):
    anim = _webp(
        _vp8x(0x12),  # alpha + animation
        _chunk(b"ANIM", b"\x00\x00\x00\x00" + struct.pack("<H", 3)),
        _anmf(40), _anmf(100), _anmf(7))
    static_x = _webp(_vp8x(0x20))  # ICC, no animation flag
    lossy = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12
    # ANMF size overruns the buffer -> truncated
    trunc = _webp(
        _vp8x(0x02),
        _chunk(b"ANIM", b"\x00\x00\x00\x00\x00\x00"),
        b"ANMF" + struct.pack("<I", 999) + b"\x00" * 4)
    out = _rows(spark, webp_animation,
                [anim, static_x, lossy, trunc, b"JUNKJUNKJUNKJUNK"])
    a = out[0]
    assert (a.webp_animated, a.webp_frames, a.webp_loop_count) == (1, 3, 3)
    assert (a.webp_min_dur_ms, a.webp_total_dur_ms) == (7, 147)
    assert (a.webp_has_alpha, a.webp_has_icc, a.webp_complete) == (1, 0, 1)
    s = out[1]
    assert (s.webp_animated, s.webp_frames, s.webp_has_icc) == (0, 1, 1)
    assert (out[2].webp_animated, out[2].webp_frames) == (0, 1)
    t = out[3]
    assert (t.webp_complete, t.webp_frames) == (0, 0)
    assert out[4].webp_animated is None


# --------------------------------------------------------------------------
# APNG
# --------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + typ + data + b"\x00\x00\x00\x00"


def _ihdr() -> bytes:
    return _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0))


def _fctl(num: int, den: int) -> bytes:
    return _png_chunk(
        b"fcTL", struct.pack(">IIIII", 0, 4, 4, 0, 0)
        + struct.pack(">HHBB", num, den, 0, 0))


def test_apng_animation(spark):
    apng = (PNG_SIG + _ihdr()
            + _png_chunk(b"acTL", struct.pack(">II", 2, 0))
            + _fctl(1, 10) + _png_chunk(b"IDAT", b"x")
            + _fctl(1, 0)  # den 0 -> 100 -> 10 ms
            + _png_chunk(b"IEND", b""))
    plain = PNG_SIG + _ihdr() + _png_chunk(b"IDAT", b"x") \
        + _png_chunk(b"IEND", b"")
    late = (PNG_SIG + _ihdr() + _png_chunk(b"IDAT", b"x")
            + _png_chunk(b"acTL", struct.pack(">II", 5, 1))
            + _png_chunk(b"IEND", b""))
    cut = PNG_SIG + _ihdr() + _png_chunk(b"IDAT", b"x" * 50)[:20]
    out = _rows(spark, apng_animation, [apng, plain, late, cut, b"GIF89a??"])
    a = out[0]
    assert (a.apng, a.apng_frames, a.apng_plays) == (1, 2, 0)
    assert a.apng_total_delay_ms == 100 + 10
    assert a.png_complete == 1
    assert (out[1].apng, out[1].png_complete) == (0, 1)
    assert out[2].apng == 0  # acTL after IDAT ignored per spec
    assert (out[3].apng, out[3].png_complete) == (0, 0)
    assert out[4].apng is None


# --------------------------------------------------------------------------
# TIFF
# --------------------------------------------------------------------------

def _tiff(little: bool, entries: list[tuple[int, int, int]]) -> bytes:
    e = "<" if little else ">"
    head = (b"II" if little else b"MM") + struct.pack(e + "H", 42) \
        + struct.pack(e + "I", 8)
    body = struct.pack(e + "H", len(entries))
    for tag, typ, val in entries:
        if typ == 3:  # SHORT: left-justified in the 4-byte slot
            valb = struct.pack(e + "H", val) + b"\x00\x00"
        else:
            valb = struct.pack(e + "I", val)
        body += struct.pack(e + "HHI", tag, typ, 1) + valb
    return head + body + struct.pack(e + "I", 0)


def test_tiff_dims(spark):
    ii = _tiff(True, [(256, 3, 640), (257, 4, 480), (274, 3, 6)])
    mm = _tiff(False, [(256, 4, 1920), (257, 3, 1080)])
    badmagic = b"II" + struct.pack("<H", 43) + struct.pack("<I", 8)
    out = _rows(spark, tiff_dims, [ii, mm, badmagic, b"\x89PNG\r\n\x1a\n"])
    a = out[0]
    assert (a.tiff_endian, a.sniff_w, a.sniff_h, a.tiff_orientation) == \
        ("II", 640, 480, 6)
    b = out[1]
    assert (b.tiff_endian, b.sniff_w, b.sniff_h, b.tiff_orientation) == \
        ("MM", 1920, 1080, None)
    assert out[2].tiff_endian is None
    assert out[3].sniff_w is None


# --------------------------------------------------------------------------
# SVG
# --------------------------------------------------------------------------

def test_svg_dims(spark):
    plain = b'<svg width="300" height="150" xmlns="x"></svg>'
    decl = (b'<?xml version="1.0"?>\n<!-- logo -->\n'
            b'<svg viewBox="0 0 24 16"><path/></svg>')
    rel = b'<svg width="10em" height="4em"/>'
    px = b"<svg width='64px' height='32px'/>"
    html = b"<!DOCTYPE html><html><body>hi</body></html>"
    out = _rows(spark, svg_dims, [plain, decl, rel, px, html])
    assert (out[0].is_svg, out[0].sniff_w, out[0].sniff_h) == (1, 300, 150)
    assert (out[1].is_svg, out[1].sniff_w, out[1].sniff_h) == (1, 24, 16)
    r = out[2]
    assert (r.is_svg, r.sniff_w, r.svg_relative_units) == (1, None, 1)
    assert (out[3].sniff_w, out[3].sniff_h) == (64, 32)
    assert (out[4].is_svg, out[4].svg_relative_units) == (0, None)


# --------------------------------------------------------------------------
# JPEG APPn
# --------------------------------------------------------------------------

def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _sof(ncomp: int) -> bytes:
    body = struct.pack(">BHHB", 8, 10, 20, ncomp) + b"\x00" * (3 * ncomp)
    return _seg(0xC0, body)


def test_jpeg_app_segments(spark):
    ycck = (b"\xff\xd8"
            + _seg(0xE1, b"Exif\x00\x00" + b"\x00" * 8)
            + _seg(0xE2, b"ICC_PROFILE\x00\x01\x01" + b"\x00" * 16)
            + _seg(0xE2, b"ICC_PROFILE\x00\x02\x02" + b"\x00" * 16)
            + _seg(0xEE, b"Adobe" + b"\x00" * 6 + bytes([2]))
            + _sof(4) + b"\xff\xd9")
    cmyk = b"\xff\xd8" + _sof(4) + b"\xff\xd9"
    rgb = (b"\xff\xd8" + _seg(0xEE, b"Adobe" + b"\x00" * 6 + bytes([0]))
           + _sof(3) + b"\xff\xd9")
    gray = b"\xff\xd8" + _sof(1) + b"\xff\xd9"
    plain = b"\xff\xd8" + _sof(3) + b"\xff\xd9"
    out = _rows(spark, jpeg_app_segments,
                [ycck, cmyk, rgb, gray, plain, b"RIFFxxxxWEBP"])
    y = out[0]
    assert (y.jpeg_has_exif, y.jpeg_has_icc, y.jpeg_icc_chunks) == (1, 1, 2)
    assert (y.jpeg_adobe_transform, y.jpeg_ncomp) == (2, 4)
    assert y.jpeg_color_mode == "ycck"
    assert out[1].jpeg_color_mode == "cmyk"
    assert out[2].jpeg_color_mode == "rgb"
    assert out[3].jpeg_color_mode == "gray"
    assert out[4].jpeg_color_mode == "ycbcr"
    assert out[5].jpeg_color_mode is None
