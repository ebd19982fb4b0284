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


def test_full_canonical_collapses_alias_family(spark):
    from crawlspark.canon import full_canonical
    aliases = [
        "http://site.test/a/b/p1",
        "HTTP://SITE.test:80/a/b/p1",
        "http://site.test/a/./b/p1",
        "http://site.test/a/x/../b/p1",
        "http://site.test/a/b/p1?utm_source=x&fbclid=f",
        "http://site.test/a/b/%701",
        "http://site.test/a/b/p1#frag",
    ]
    df = spark.createDataFrame([(u,) for u in aliases], "u STRING")
    got = {r.c for r in
           df.select(full_canonical(F.col("u")).alias("c")).collect()}
    # the whole alias family is ONE seen-set entry
    assert got == {"http://site.test/a/b/p1"}


def test_full_canonical_keeps_content_query_sorted(spark):
    from crawlspark.canon import full_canonical
    df = spark.createDataFrame(
        [("http://s.test/p?z=2&a=1&utm_medium=m",)], "u STRING")
    assert (df.select(full_canonical(F.col("u")).alias("c")).head().c
            == "http://s.test/p?a=1&z=2")


def test_freshness_histogram_buckets(spark):
    from crawlspark.scheduler import freshness_histogram
    corpus = spark.createDataFrame(
        [(1000 - a,) for a in [1, 3, 3, 9, 1025]], "last_fetch_ts LONG")
    out = {r.age_bucket: r for r in
           freshness_histogram(corpus, now_ts=1000).collect()}
    assert out[0].n_pages == 1       # age 1
    assert out[1].n_pages == 2       # ages 3
    assert out[3].n_pages == 1       # age 9
    assert out[10].n_pages == 1      # age 1025
    assert out[1].share_permille == 400
