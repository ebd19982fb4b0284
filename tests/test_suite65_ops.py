"""Edge-case tests for suite65 ops: wildcard SAN depth rules, weak
etag on range resume, robots cap newline backoff, shard straddle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.fetch import h2_connection_coalescing
from crawlspark.robots import parse_robots_txt, truncate_robots_body
from crawlspark.sinks import etag_strength_decisions, webdataset_shard_plan


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_h2_wildcard_one_label_only(spark):
    hosts = spark.createDataFrame(
        [("a.x.com", "1.1.1.1"), ("b.a.x.com", "1.1.1.1"),
         ("x.com", "1.1.1.1"), ("a.x.com", "2.2.2.2")],
        "host string, ip string")
    certs = spark.createDataFrame(
        [("1.1.1.1", "*.x.com")], "ip string, san string")
    got = {(r.host, r.ip): r for r in
           h2_connection_coalescing(hosts, certs).collect()}
    assert got[("a.x.com", "1.1.1.1")].coalesced
    assert not got[("b.a.x.com", "1.1.1.1")].coalesced  # two labels
    assert not got[("x.com", "1.1.1.1")].coalesced      # apex not covered
    assert not got[("a.x.com", "2.2.2.2")].coalesced    # wrong ip


def test_etag_weak_rejected_for_range(spark):
    df = spark.createDataFrame(
        [('W/"x"', "if_range"), ('W/"x"', "if_none_match"),
         ('"x"', "if_range")], "etag string, use string")
    got = {(r.etag, r.use): r.usable
           for r in etag_strength_decisions(df).collect()}
    assert not got[('W/"x"', "if_range")]
    assert got[('W/"x"', "if_none_match")]
    assert got[('"x"', "if_range")]


def test_robots_cap_drops_partial_line_and_parse(spark):
    body = "User-agent: *\nDisallow: /a\nDisallow: /private-stuff\n"
    cap = len("User-agent: *\nDisallow: /a\nDisallow: /p")
    df = spark.createDataFrame([("h.com", body)], "host string, body string")
    t = truncate_robots_body(df, cap=cap)
    r = t.collect()[0]
    # the partial 'Disallow: /p' must NOT survive as a directive
    assert r.body_capped == "User-agent: *\nDisallow: /a\n"
    rules = parse_robots_txt(
        t.select("host", F.col("body_capped").alias("body"))).collect()[0]
    assert rules.disallow_prefixes == ["/a"]


def test_webdataset_shard_straddle(spark):
    samples = spark.createDataFrame(
        [("a", 50), ("b", 30), ("c", 40), ("d", 10)],
        "image_id string, n_bytes long")
    got = {r.image_id: r for r in
           webdataset_shard_plan(samples, target_bytes=64).collect()}
    assert got["a"].shard_id == 0 and got["a"].offset_in_shard == 0
    # b starts at 50 < 64 -> shard 0, straddling the boundary
    assert got["b"].shard_id == 0 and got["b"].offset_in_shard == 50
    assert got["c"].shard_id == 1   # starts at 80
    assert got["d"].shard_id == 1   # starts at 120
