"""Tests for JSON Feed and Twitter Card parsing edges."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_json_feed_edges(spark):
    from crawlspark.extract import json_feed_summary

    cases = [
        # items present but first has no url field
        ('{"version":"https://jsonfeed.org/version/1.1","title":"t",'
         '"items":[{"id":"1"},{"url":"/u2"}]}', True, "t", 2, None),
        # null body
        (None, False, None, 0, None),
        # version field missing entirely
        ('{"title":"x","items":[{"url":"/a"}]}', False, "x", 1, "/a"),
    ]
    df = spark.createDataFrame(
        [Row(i=i, b=b) for i, (b, *_) in enumerate(cases)],
        "i int, b string")
    out = {r.i: r for r in df.select(
        "i", json_feed_summary(F.col("b")).alias("f")).select(
        "i", "f.*").collect()}
    for i, (b, ok, title, n, first) in enumerate(cases):
        r = out[i]
        assert (r.version_ok, r.feed_title, r.n_items,
                r.first_item_url) == (ok, title, n, first), (i, b, r)


def test_twitter_card_attr_order_and_quotes(spark):
    from crawlspark.extract import twitter_card_summary

    cases = [
        # single quotes + content before name is NOT matched (content
        # must follow the name attr in this regex-level parse — the
        # dominant real-world order)
        ("<meta name='twitter:card' content='summary'>", "summary"),
        # uppercase tag + extra attrs between
        ('<META NAME="twitter:card" data-x="1" CONTENT="player">',
         "player"),
        # empty content -> null card
        ('<meta name="twitter:card" content="">', None),
    ]
    df = spark.createDataFrame(
        [Row(i=i, h=h) for i, (h, _) in enumerate(cases)],
        "i int, h string")
    out = {r.i: r.c["card_type"] for r in df.select(
        "i", twitter_card_summary(F.col("h")).alias("c")).collect()}
    for i, (h, card) in enumerate(cases):
        assert out[i] == card, (i, h, out[i])
