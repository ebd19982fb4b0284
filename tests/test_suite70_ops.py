"""Edge-case tests for suite70 ops: token-bucket differential vs pure
Python, percent-normalize idempotency, cross-host case folding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.canon import percent_normalize_expr
from crawlspark.politeness import token_bucket_admission
from crawlspark.robots import sitemap_cross_host_audit


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def _py_bucket(times, capacity=5, refill_per_s=1):
    cap_m = capacity * 1000
    toks, last, out = cap_m, None, []
    for t in sorted(times):
        if last is not None:
            toks = min(cap_m, toks + refill_per_s * (t - last))
        last = t
        if toks >= 1000:
            toks -= 1000
            out.append((t, True, toks))
        else:
            out.append((t, False, toks))
    return out


def test_token_bucket_differential(spark):
    import random

    rng = random.Random(3)
    rows = []
    expect = {}
    for h in range(5):
        times = sorted(rng.sample(range(0, 20_000), 40))
        rows += [(f"h{h}", t) for t in times]
        expect[f"h{h}"] = _py_bucket(times)
    df = spark.createDataFrame(rows, "host string, ts_ms long")
    got = {}
    for r in token_bucket_admission(df).collect():
        got.setdefault(r.host, []).append(
            (r.ts_ms, r.admitted, r.tokens_after_milli))
    for h in expect:
        assert sorted(got[h]) == expect[h], h


def test_token_bucket_burst_then_starve(spark):
    # 7 instant requests, capacity 5: first 5 admitted, 2 rejected
    df = spark.createDataFrame([("h", 0)] * 7, "host string, ts_ms long")
    rs = token_bucket_admission(df).collect()
    assert sum(r.admitted for r in rs) == 5


def test_percent_normalize_idempotent_and_preserving(spark):
    urls = ["http://h/%7e%7E%2f%2F%zz%", "http://h/plain",
            "http://h/%41%42%61"]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(percent_normalize_expr(F.col("u")).alias("n"))
    vals = [r.n for r in once.collect()]
    assert vals == ["http://h/~~%2F%2F%zz%", "http://h/plain",
                    "http://h/ABa"]
    twice = once.select(percent_normalize_expr(F.col("n")).alias("n2"))
    assert [r.n2 for r in twice.collect()] == vals


def test_cross_host_case_insensitive(spark):
    robots = spark.createDataFrame(
        [("A.com", ["https://a.COM/s.xml", "http://b.net/s.xml"])],
        "host string, sitemaps array<string>")
    got = {r.sitemap_url: r.cross_host
           for r in sitemap_cross_host_audit(robots).collect()}
    assert got["https://a.COM/s.xml"] is False
    assert got["http://b.net/s.xml"] is True
