"""Edge cases for the round-3 EXIF/interlace/collocation operators
beyond the constructed gate families."""

from __future__ import annotations

import math
import struct

from crawlspark.images import ADAM7_PASSES, adam7_plan, exif_thumbnail_scan
from crawlspark.mmcurate import caption_edit_pairs
from crawlspark.textops.quality import pmi_collocations


def test_adam7_pass_grid_conserves_pixels():
    # every pixel belongs to exactly one pass at every size — the
    # invariant the PNG spec grid guarantees and a wrong grid breaks
    for w in (1, 2, 3, 7, 8, 9, 16, 33):
        for h in (1, 2, 5, 8, 13, 32):
            total = 0
            for (x0, y0, dx, dy) in ADAM7_PASSES:
                cols = (w - x0 + dx - 1) // dx if w > x0 else 0
                rows = (h - y0 + dy - 1) // dy if h > y0 else 0
                total += cols * rows
            assert total == w * h, (w, h)


def test_adam7_plan_known_values(spark):
    df = spark.createDataFrame(
        [(0, 1, 1), (1, 8, 8)], "doc_id long, w long, h long")
    out = {r.doc_id: r for r in adam7_plan(df).collect()}
    # 1x1: only pass 1 has the pixel; same stream size as plain
    assert out[0].nonempty_passes == 1
    assert out[0].interlaced_bytes == 4 and out[0].plain_bytes == 4
    assert out[0].overhead_permille == 0
    # 8x8 RGB: 207 interlaced vs 200 plain (per-pass filter bytes)
    assert out[1].nonempty_passes == 7
    assert out[1].interlaced_bytes == 207
    assert out[1].plain_bytes == 200
    assert out[1].overhead_permille == 35


def _tiff(le: bool, n0_entries: int, ifd1_tags: list[tuple[int, int, int]],
          trunc_at: int | None = None) -> bytes:
    e = "<" if le else ">"
    b = (b"II" if le else b"MM") + struct.pack(e + "H", 42)
    b += struct.pack(e + "I", 8)
    b += struct.pack(e + "H", n0_entries)
    for _ in range(n0_entries):
        b += struct.pack(e + "HHI", 0x0112, 3, 1) + \
            struct.pack(e + "H", 1) + b"\x00\x00"
    ifd1_off = len(b) + 4 if ifd1_tags else 0
    b += struct.pack(e + "I", ifd1_off)
    if ifd1_tags:
        b += struct.pack(e + "H", len(ifd1_tags))
        for tag, typ, val in ifd1_tags:
            b += struct.pack(e + "HH", tag, typ)
            b += struct.pack(e + "I", 1)
            if typ == 3:
                b += struct.pack(e + "H", val) + b"\x00\x00"
            else:
                b += struct.pack(e + "I", val)
        b += struct.pack(e + "I", 0)
    return b[:trunc_at] if trunc_at else b


def test_exif_thumbnail_scan_edges(spark):
    # offset tag without a length tag -> NOT a usable thumbnail;
    # IFD1 entry table truncated mid-walk -> graceful has=0
    no_len = _tiff(True, 1, [(0x0201, 4, 60)])
    trunc = _tiff(False, 1, [(0x0201, 4, 60), (0x0202, 4, 4)])
    trunc = trunc[:34]  # cut inside IFD1's first entry
    df = spark.createDataFrame(
        [(0, bytearray(no_len)), (1, bytearray(trunc))],
        "doc_id long, bytes binary")
    out = {r.doc_id: r for r in exif_thumbnail_scan(df).collect()}
    assert out[0].has_thumbnail == 0
    assert out[0].thumb_offset == 60 and out[0].thumb_len is None
    assert out[1].has_thumbnail == 0
    assert out[1].thumb_in_bounds is None


def test_pmi_collocations_short_docs_and_counts(spark):
    # 0- and 1-token docs contribute no bigrams (and no phantom
    # null pairs); pmi arithmetic checked against the closed form
    rows = [("new york",)] * 5 + [("",), ("word",), ("new car",)]
    df = spark.createDataFrame(rows, "text string")
    out = pmi_collocations(df, min_count=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.w1, r.w2, r.c12) == ("new", "york", 5)
    assert (r.c1, r.c2) == (6, 5)
    n_tok, n_bi = 13, 6
    pmi = math.log2((5 * n_tok * n_tok) / (n_bi * 6 * 5))
    assert r.pmi_micro == round(pmi * 1e6)


def test_caption_edit_pairs_blocking_and_threshold(spark):
    imgs = spark.createDataFrame(
        [(1, 7, "red fox"), (2, 7, "red foxx"), (3, 7, "blue whale"),
         (4, 8, "red fox")],  # other bucket: never paired with g=7
        "image_id long, phash long, caption string")
    rows = caption_edit_pairs(imgs, max_dist=2).collect()
    got = {(r.id_a, r.id_b): r for r in rows}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert got[(1, 2)].edit_dist == 1 and got[(1, 2)].within
    assert got[(1, 3)].edit_dist > 2 and not got[(1, 3)].within
