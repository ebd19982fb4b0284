"""Tests for tracker-id extraction and CMS fingerprints."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_tracker_ids_kinds_and_dedup(spark):
    from crawlspark.extract import tracker_ids

    html = (
        "ga('create','UA-12345-1'); gtag('config','G-AB12CD34');"
        "GTM-WXYZ99 and ca-pub-1234567890123456 twice: "
        "UA-12345-1 pub-1234567890123456"
    )
    df = spark.createDataFrame([Row(i=0, h=html)])
    rows = df.select(F.explode(tracker_ids(F.col("h"))).alias("t")) \
        .select("t.kind", "t.id").collect()
    got = {(r.kind, r.id) for r in rows}
    assert ("ga", "UA-12345-1") in got
    assert ("ga4", "G-AB12CD34") in got
    assert ("gtm", "GTM-WXYZ99") in got
    assert ("adsense", "pub-1234567890123456") in got
    # duplicates collapsed: UA id and pub id each appear once
    assert len(rows) == 4


def test_tracker_ids_no_false_positives(spark):
    from crawlspark.extract import tracker_ids

    df = spark.createDataFrame([
        Row(i=0, h="UA-1-1 is too short, G-abc lowercase, publix store"),
        Row(i=1, h=None),
    ])
    out = df.select(F.size(tracker_ids(F.col("h"))).alias("n")).collect()
    assert [r.n for r in out] == [0, 0]


def test_cms_fingerprint_priority_and_unknown(spark):
    from crawlspark.extract import cms_fingerprint

    cases = [
        ('<meta name="generator" content="Drupal 10">', "drupal"),
        ('<link href="/sites/default/files/x.css">', "drupal"),
        ('<script src="https://static.wixstatic.com/x.js">', "wix"),
        ('<meta name="generator" content="Ghost 5.0">', "ghost"),
        ("plain", "unknown"),
        (None, "unknown"),
    ]
    df = spark.createDataFrame(
        [Row(i=i, h=h) for i, (h, _) in enumerate(cases)],
        "i int, h string")
    out = {r.i: r.cms for r in df.select(
        "i", cms_fingerprint(F.col("h")).alias("cms")).collect()}
    for i, (h, cms) in enumerate(cases):
        assert out[i] == cms, (i, h, out[i])
