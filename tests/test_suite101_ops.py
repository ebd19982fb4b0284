"""Tests for RateLimit pacing and Link header parsing."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_ratelimit_pacing_math(spark):
    from crawlspark.fetch import ratelimit_headers_info

    cases = [
        # 30s window, 7 left -> ceil(30000/7) = 4286 ms
        (600, 7, 30, False, 4286),
        # exact division: 10 left over 10s -> 1000 ms
        (100, 10, 10, False, 1000),
        (100, 0, 45, True, 45000),
        # negative remaining (server bug) treated as exhausted
        (100, -3, 45, True, 45000),
        (None, None, None, False, None),
    ]
    df = spark.createDataFrame(
        [Row(i=i, l=l, r=r, s=s) for i, (l, r, s, *_) in
         enumerate(cases)],
        "i int, l long, r long, s long")
    out = {r.i: r for r in df.select("i", ratelimit_headers_info(
        F.col("l"), F.col("r"), F.col("s")).alias("x")).select(
        "i", "x.*").collect()}
    for i, (l, r, s, ex, ms) in enumerate(cases):
        assert out[i].exhausted == ex, (i,)
        assert out[i].suggested_delay_ms == ms, (i, out[i])


def test_link_header_edges(spark):
    from crawlspark.fetch import parse_link_header

    cases = [
        # unquoted rel token
        ("<https://n.test/2>; rel=next", [("https://n.test/2", "next")]),
        # params before rel + uppercase REL + other params after
        ('<https://c.test/x.pdf>; type="application/pdf"; '
         'REL="canonical"; title="x"',
         [("https://c.test/x.pdf", "canonical")]),
        # comma inside a quoted param must not split members
        ('<https://a.test/1>; title="one, two"; rel="next", '
         '<https://a.test/2>; rel="prev"',
         [("https://a.test/1", "next"), ("https://a.test/2", "prev")]),
        (None, []),
    ]
    df = spark.createDataFrame(
        [Row(i=i, v=v) for i, (v, _) in enumerate(cases)],
        "i int, v string")
    rows = df.select("i", F.explode_outer(
        parse_link_header(F.col("v"))).alias("e")).collect()
    got = {}
    for r in rows:
        got.setdefault(r.i, []).append(
            (r.e.url, r.e.rel) if r.e is not None else None)
    for i, (v, expect) in enumerate(cases):
        val = [x for x in got[i] if x is not None]
        assert val == expect, (i, v, val)
