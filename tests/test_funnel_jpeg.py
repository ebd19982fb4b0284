"""event_funnel ordering semantics + jpeg_sof_dims against real
marker-segment layouts."""

from __future__ import annotations

import struct
from datetime import datetime

from crawlspark.images import jpeg_sof_dims
from crawlspark.suite import event_funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2024, 1, 1, 0, 0, s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp_ntz",
    )


def test_funnel_order_matters(spark):
    rows = [
        # u1 converts in order
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
        # u2 purchased BEFORE viewing: purchase must not count
        (2, "purchase", 1), (2, "view", 2), (2, "click", 3),
        # u3 view+click same direction but click precedes view
        (3, "click", 1), (3, "view", 2),
        # u4 only noise
        (4, "error", 1),
    ]
    got = {r["user_id"]: r for r in
           event_funnel(_ev(spark, rows),
                        ["view", "click", "purchase"]).collect()}
    assert got[1]["steps_completed"] == 3
    assert got[2]["steps_completed"] == 2  # view->click ok, purchase was before
    assert got[2]["t3_us"] is None
    assert got[3]["steps_completed"] == 1
    assert got[4]["steps_completed"] == 0
    assert got[4]["t1_us"] is None


def test_funnel_strictly_after(spark):
    # click at the SAME microsecond as view does not count (strict >)
    rows = [(1, "view", 5), (1, "click", 5)]
    got = event_funnel(_ev(spark, rows), ["view", "click"]).first()
    assert got["steps_completed"] == 1


def _jpeg(w, h, marker=b"\xc0", extra_segments=0):
    b = b"\xff\xd8"
    b += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    for _ in range(extra_segments):
        b += b"\xff\xfe" + struct.pack(">H", 10) + b"comment!"
    b += b"\xff" + marker + struct.pack(">H", 17) + b"\x08"
    b += struct.pack(">HH", h, w) + b"\x03" + b"\x01\x11\x00" * 3
    return b


def test_jpeg_sof_dims(spark):
    cases = [
        (0, _jpeg(640, 480), "baseline", 640, 480),
        (1, _jpeg(33, 17, marker=b"\xc2"), "progressive", 33, 17),
        (2, _jpeg(1, 1, extra_segments=5), "baseline", 1, 1),
        (3, b"\xff\xd8\xff\xd9", None, None, None),          # no SOF
        (4, b"\x89PNG\r\n\x1a\n", None, None, None),         # not a JPEG
        (5, _jpeg(9, 9)[:12], None, None, None),             # truncated
        # fill bytes (0xFF padding) before a marker are spec-legal
        (7, b"\xff\xd8" + b"\xff\xff\xff" + b"\xff\xc0"
            + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 11, 22)
            + b"\x03" + b"\x01\x11\x00" * 3, "baseline", 22, 11),
        # DHT (C4) must NOT be mistaken for a SOF marker
        (6, b"\xff\xd8" + b"\xff\xc4" + struct.pack(">H", 6)
            + b"\x00\x01\x02\x03"
            + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", 7, 8) + b"\x03" + b"\x01\x11\x00" * 3,
            "baseline", 8, 7),
    ]
    df = spark.createDataFrame([(i, b) for i, b, *_ in cases],
                               ["i", "bytes"])
    got = {r["i"]: (r["jpeg_kind"], r["sniff_w"], r["sniff_h"])
           for r in jpeg_sof_dims(df).collect()}
    for i, _, kind, w, h in cases:
        assert got[i] == (kind, w, h), (i, got[i])
