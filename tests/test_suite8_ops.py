"""Round-2 part-6 operators: image+caption harvest, OG hero images."""

from pyspark.sql import functions as F

from crawlspark.extract import image_caption_pairs, og_image_meta


def _pairs(spark, body, page="http://h.test/d/page.html"):
    return (
        spark.range(1)
        .select(F.explode(
            image_caption_pairs(F.lit(body), F.lit(page))).alias("p"))
        .select("p.*").collect()
    )


def test_caption_figcaption_beats_alt_and_no_double_count(spark):
    body = ('<figure><img src="/f.jpg" alt="the alt">'
            "<figcaption> the caption </figcaption></figure>"
            '<img src="/bare.png" alt="bare alt">')
    rows = {r.image_url: r for r in _pairs(spark, body)}
    f = rows["http://h.test/f.jpg"]
    # figcaption wins over alt, is trimmed, and the figure's img does NOT
    # also appear as a bare pair
    assert f.caption == "the caption" and f.source == "figcaption"
    assert len(rows) == 2
    assert rows["http://h.test/bare.png"].caption == "bare alt"


def test_caption_figure_alt_fallback_and_dropped_uncaptioned(spark):
    body = ('<figure><img src="g.jpg" alt="g alt"></figure>'
            '<img src="/nocap.png">')
    rows = _pairs(spark, body)
    assert len(rows) == 1
    assert rows[0].image_url == "http://h.test/d/g.jpg"
    assert rows[0].caption == "g alt" and rows[0].source == "alt"


def test_og_image_priority_and_nulls(spark):
    df = spark.createDataFrame(
        [('<meta property="og:image" content="http://c/o.jpg">'
          '<meta name="twitter:image" content="http://c/t.png">',),
         ('<meta name="twitter:image" content="http://c/t2.png">',),
         ("<html></html>",)],
        "body STRING")
    rows = df.select(og_image_meta(F.col("body")).alias("m")).select(
        "m.*").collect()
    # og:image beats twitter:image
    assert rows[0].image_url == "http://c/o.jpg"
    assert rows[1].image_url == "http://c/t2.png"
    assert rows[2].image_url is None
    assert rows[1].width is None and rows[1].title is None
