"""Round-2 part-7 operators: feed discovery/parse, AMP fold, CAS store."""

from pyspark.sql import functions as F

from crawlspark.extract import amp_canonical_fold, discover_feeds, feed_items
from crawlspark.sinks import content_store_stats


def test_discover_feeds_kinds_and_attr_order(spark):
    body = ('<link type="application/atom+xml" rel="alternate" '
            'href="http://x/a.xml">'
            '<link rel="alternate" href="http://x/r.xml" '
            'type="application/rss+xml">'
            '<link rel="stylesheet" type="text/css" href="/s.css">')
    got = (spark.range(1)
           .select(F.explode(discover_feeds(F.lit(body))).alias("f"))
           .select("f.*").collect())
    assert sorted((r.feed_url, r.kind) for r in got) == [
        ("http://x/a.xml", "atom"), ("http://x/r.xml", "rss")]


def test_feed_items_mixed_dialects_aligned(spark):
    body = ("<rss><item><link>http://x/1</link><title>one</title>"
            "<pubDate>d1</pubDate></item>"
            "<item><link>http://x/2</link><title>two</title>"
            "<pubDate>d2</pubDate></item></rss>"
            '<feed><entry><link href="http://x/3"/><title>three</title>'
            "<updated>u3</updated></entry></feed>")
    got = (spark.range(1)
           .select(F.explode(feed_items(F.lit(body))).alias("i"))
           .select("i.*").collect())
    assert sorted((r.url, r.title, r.published) for r in got) == [
        ("http://x/1", "one", "d1"), ("http://x/2", "two", "d2"),
        ("http://x/3", "three", "u3")]


def test_amp_fold_cases(spark):
    pages = spark.createDataFrame(
        [("http://w/amp/p1",
          '<link rel="canonical" href="http://w/p1">'),
         ("http://w/p2", '<link rel="canonical" href="http://w/p2">'),
         ("http://w/p3", "<html></html>")],
        "url STRING, body STRING")
    out = {r.url: r for r in amp_canonical_fold(pages).collect()}
    assert out["http://w/amp/p1"].fold_url == "http://w/p1"
    assert out["http://w/amp/p1"].is_alternate is True
    assert out["http://w/p2"].fold_url == "http://w/p2"
    assert out["http://w/p2"].is_alternate is False
    assert out["http://w/p3"].fold_url == "http://w/p3"


def test_content_store_stats(spark):
    pages = spark.createDataFrame(
        [("h1", 100), ("h1", 100), ("h1", 100), ("h2", 50)],
        "content_hash STRING, n_bytes LONG")
    out = {r.content_hash: r for r in content_store_stats(pages).collect()}
    assert out["h1"].n_refs == 3
    assert out["h1"].bytes_stored == 100 and out["h1"].bytes_saved == 200
    assert out["h2"].n_refs == 1 and out["h2"].bytes_saved == 0
