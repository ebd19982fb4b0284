"""Tests for security.txt and OPML parsing edges."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_security_txt_expiry_boundary_and_case(spark):
    from crawlspark.robots import parse_security_txt

    df = spark.createDataFrame([
        # exactly now -> NOT expired (strict <)
        Row(host="a", body="Contact: mailto:x@a\n"
                           "Expires: 2026-08-21T00:00:00Z\n"),
        # lowercase field names accepted ((?i) line regexes)
        Row(host="b", body="contact: mailto:y@b\n"
                           "expires: 2030-01-01T00:00:00Z\n"
                           "policy: https://b/p\n"),
        # indented / trailing-space lines still anchored per line
        Row(host="c", body="Contact: mailto:z@c   \n"),
    ])
    out = {r.host: r for r in parse_security_txt(
        df, now_iso="2026-08-21T00:00:00Z").collect()}
    assert out["a"].expired is False
    assert out["b"].n_contacts == 1 and out["b"].has_policy is True
    assert out["c"].first_contact == "mailto:z@c"
    assert out["c"].expires is None and out["c"].expired is False


def test_opml_attr_order_and_self_closing(spark):
    from crawlspark.extract import opml_feed_urls

    xml = (
        '<outline xmlUrl="https://x/f" title="X"></outline>'
        '<outline text="no feed here"/>'
        '<outline text="T2" xmlUrl="https://y/f"/>'
    )
    df = spark.createDataFrame([Row(i=0, x=xml)])
    rows = df.select(F.explode(opml_feed_urls(F.col("x"))).alias("o")) \
        .select("o.*").collect()
    got = [(r.title, r.xml_url, r.html_url) for r in rows]
    assert got == [("X", "https://x/f", None), ("T2", "https://y/f", None)]
