"""Tests for sitemap hreflang and noai meta signals."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_sitemap_hreflang_multiblock(spark):
    from crawlspark.extract import sitemap_hreflang_links

    xml = (
        "<urlset>"
        "<url><loc>https://a/1</loc>"
        '<xhtml:link rel="alternate" hreflang="fr" href="https://a/fr/1"/>'
        "</url>"
        "<url><loc>https://a/2</loc>"
        '<xhtml:link rel="alternate" hreflang="es" href="https://a/es/2"/>'
        '<xhtml:link rel="stylesheet" href="https://a/x.css"/>'
        "</url></urlset>"
    )
    df = spark.createDataFrame([Row(i=0, x=xml)])
    rows = df.select(F.explode(
        sitemap_hreflang_links(F.col("x"))).alias("l")).collect()
    got = {(r.l.loc, r.l.hreflang, r.l.href) for r in rows}
    assert got == {
        ("https://a/1", "fr", "https://a/fr/1"),
        ("https://a/2", "es", "https://a/es/2"),
    }


def test_noai_token_boundaries(spark):
    from crawlspark.extract import noai_meta_signals

    cases = [
        # 'noai' inside 'noair' must not match; 'NOAI' case-insensitive
        ('<meta name="robots" content="noair">', None, False, False),
        ('<meta name="robots" content="NOAI">', None, True, False),
        # named-bot robots meta also counts (name contains 'robots'?
        # no — GPTBot meta uses name="GPTBot"; only *robots* names
        # are scanned, so this one is ignored by design)
        ('<meta name="GPTBot" content="noai">', None, False, False),
        (None, "noai, noimageai", True, True),
    ]
    df = spark.createDataFrame(
        [Row(i=i, h=h, xr=xr) for i, (h, xr, *_) in enumerate(cases)],
        "i int, h string, xr string")
    out = {r.i: r for r in df.select(
        "i", noai_meta_signals(F.col("h"), F.col("xr")).alias("s"))
        .select("i", "s.*").collect()}
    for i, (h, xr, noai, noimg) in enumerate(cases):
        assert out[i].noai == noai, (i, h, xr)
        assert out[i].noimageai == noimg, (i, h, xr)
