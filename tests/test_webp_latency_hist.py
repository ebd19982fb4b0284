"""sniff_webp_dims against spec-built headers; latency_histogram bound
brackets the exact order statistic."""

from __future__ import annotations

import struct

import pyspark.sql.functions as F

from crawlspark.images import sniff_webp_dims
from crawlspark.politeness import latency_histogram


def _vp8(w, h):
    payload = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
    return b"RIFF" + struct.pack("<I", 12 + len(payload)) + b"WEBP" \
        + b"VP8 " + struct.pack("<I", len(payload)) + payload


def _vp8l(w, h):
    v = (w - 1) | ((h - 1) << 14)
    payload = b"\x2f" + struct.pack("<I", v)
    return b"RIFF" + struct.pack("<I", 12 + len(payload)) + b"WEBP" \
        + b"VP8L" + struct.pack("<I", len(payload)) + payload


def _vp8x(w, h):
    def u24(v):
        return struct.pack("<I", v)[:3]

    payload = b"\x00" + b"\x00\x00\x00" + u24(w - 1) + u24(h - 1)
    return b"RIFF" + struct.pack("<I", 12 + len(payload)) + b"WEBP" \
        + b"VP8X" + struct.pack("<I", len(payload)) + payload


def test_webp_sniff_spec_built_headers(spark):
    cases = [
        (0, _vp8(640, 480), "vp8", 640, 480),
        (1, _vp8l(1, 1), "vp8l", 1, 1),            # minimum dims
        (2, _vp8l(16383, 1024), "vp8l", 16383, 1024),  # 14-bit max width
        (3, _vp8x(100000, 2), "vp8x", 100000, 2),  # >16383 canvas ok
        (4, b"RIFF\x00\x00\x00\x00WAVEdata", None, None, None),  # not webp
        (5, _vp8(640, 480)[:20], None, None, None),  # truncated
        (6, b"RIFF\x10\x00\x00\x00WEBPVP8 \x08\x00\x00\x00"
            b"\x00\x00\x00\xff\xff\xff\x80\x02\xe0\x01",
            None, None, None),  # bad sync code
    ]
    df = spark.createDataFrame(
        [(i, b) for i, b, *_ in cases], ["i", "bytes"]
    )
    got = {r["i"]: (r["webp_variant"], r["sniff_w"], r["sniff_h"])
           for r in sniff_webp_dims(df).collect()}
    for i, _, var, w, h in cases:
        assert got[i] == (var, w, h), (i, got[i])


def test_latency_histogram_brackets_exact_quantile(spark):
    df = spark.createDataFrame(
        [("h0", 1 + (i * 37) % 977) for i in range(200)]
        + [("h1", v) for v in (1, 5, 9, 10, 99, 100, 999, 1000, 3000, 3000)],
        ["host", "latency_ms"],
    )
    got = {r["host"]: r for r in latency_histogram(df).collect()}
    # exact p95 per host (rank ceil(0.95 n))
    import math

    data = {"h0": sorted(1 + (i * 37) % 977 for i in range(200)),
            "h1": sorted((1, 5, 9, 10, 99, 100, 999, 1000, 3000, 3000))}
    for host, vals in data.items():
        rank = max(1, math.ceil(95 * len(vals) / 100))
        exact = vals[rank - 1]
        r = got[host]
        assert r["q_lb_ms"] <= exact <= r["q_ub_ms"], (host, exact, r)
        assert r["n_samples"] == len(vals)


def test_latency_histogram_merge_by_addition(spark):
    # two day-slices BUCKETED INDEPENDENTLY, bucket counts merged by
    # plain addition, must give the same quantile bound as one pass
    import pyspark.sql.functions as F

    from crawlspark.politeness import latency_buckets, latency_quantile_bounds

    all_rows = [("h", 1 + (i * 13) % 500) for i in range(300)]
    whole = spark.createDataFrame(all_rows, ["host", "latency_ms"])
    day1 = spark.createDataFrame(all_rows[:150], ["host", "latency_ms"])
    day2 = spark.createDataFrame(all_rows[150:], ["host", "latency_ms"])
    merged = (
        latency_buckets(day1).unionByName(latency_buckets(day2))
        .groupBy("host", "lb", "ub")
        .agg(F.sum("cnt").alias("cnt"))
    )
    got_merged = latency_quantile_bounds(merged).first()
    got_whole = latency_histogram(whole).first()
    assert got_whole == got_merged
