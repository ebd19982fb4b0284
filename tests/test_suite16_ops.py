"""Round-2 part-14 operators: url lang hints, meta refresh, page kinds."""

from pyspark.sql import functions as F

from crawlspark.canon import url_lang_hint
from crawlspark.extract import meta_refresh


def test_url_lang_hint_priority(spark):
    cases = [
        ("http://site.test/de/p/1", "de"),      # path segment
        ("http://fr.site.test/p/1", "fr"),      # subdomain
        ("http://de.site.test/fr/p/1", "fr"),   # path beats subdomain
        ("http://shop.example.jp/p/1", "ja"),   # ccTLD mapping
        ("http://site.de/xx/p/1", "de"),        # non-lang segment -> ccTLD
        ("http://plain.test/p/1", "und"),
        ("http://site.test/dead/p/1", "und"),   # 2-letter prefix of longer seg
    ]
    df = spark.createDataFrame(cases, "u STRING, exp STRING")
    for r in df.select("exp", url_lang_hint(F.col("u")).alias("got")).collect():
        assert r.got == r.exp, r


def test_meta_refresh_shapes(spark):
    df = spark.createDataFrame(
        [('<meta http-equiv="refresh" content="0;url=/next">',),
         ('<meta content="5; URL=\'http://x/y\'" http-equiv="REFRESH">',),
         ('<meta http-equiv="refresh" content="30">',),
         ("<html></html>",)],
        "body STRING")
    rows = df.select(meta_refresh(F.col("body")).alias("m")).collect()
    assert rows[0].m.delay_s == 0 and rows[0].m.url == "/next"
    assert rows[1].m.delay_s == 5 and rows[1].m.url == "http://x/y"
    assert rows[2].m.delay_s == 30 and rows[2].m.url is None
    assert rows[3].m is None
