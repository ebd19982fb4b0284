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


def test_site_icons_selection(spark):
    from crawlspark.extract import site_icons
    page = "http://h.test/deep/p.html"
    cases = [
        # smallest FITTING beats bigger fitting and smaller non-fitting
        ('<link rel="icon" sizes="32x32" href="/s.png">'
         '<link rel="apple-touch-icon" sizes="192x192" href="/m.png">'
         '<link rel="icon" sizes="512x512" href="/l.png">',
         "http://h.test/m.png", 192, "link"),
        # none fit -> largest
        ('<link rel="icon" sizes="16x16" href="/a.png">'
         '<link rel="icon" sizes="64x64" href="/b.png">',
         "http://h.test/b.png", 64, "link"),
        # unsized only -> that link, relative resolves against page dir
        ('<link rel="icon" href="rel.svg">',
         "http://h.test/deep/rel.svg", None, "link"),
        # nothing declared -> the /favicon.ico convention
        ("<html></html>", "http://h.test/favicon.ico", None, "default"),
    ]
    df = spark.createDataFrame([(b,) for b, *_ in cases], "body STRING")
    rows = df.select(
        site_icons(F.col("body"), F.lit(page), target_px=180).alias("i")
    ).select("i.*").collect()
    for r, (_, url, px, src) in zip(rows, cases):
        assert (r.icon_url, r.declared_px, r.source) == (url, px, src)


def test_host_change_rates_tiers(spark):
    from crawlspark.politeness import host_change_rates
    rows = ([("hot", "modified")] * 6 + [("hot", "unchanged")] * 4
            + [("weekly", "modified")] * 1 + [("weekly", "unchanged")] * 9
            + [("static", "unchanged")] * 20)
    df = spark.createDataFrame(rows, "host STRING, change STRING")
    out = {r.host: r for r in host_change_rates(df).collect()}
    assert out["hot"].suggested_interval_s == 21_600
    assert out["weekly"].modified_permille == 100
    assert out["weekly"].suggested_interval_s == 604_800
    assert out["static"].suggested_interval_s == 2_592_000
