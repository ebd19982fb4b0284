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


def test_bandwidth_throttle_hand_computed(spark):
    from crawlspark.politeness import bandwidth_throttle_schedule
    wave = spark.createDataFrame(
        [("h1", 1, 2_000_000), ("h1", 2, 2_000), ("h1", 3, 500_000),
         ("h2", 1, 10_000)],
        "host STRING, seq LONG, est_bytes LONG")
    out = {(r.host, r.seq): r for r in bandwidth_throttle_schedule(
        wave, rate_bytes_per_s=1_000_000, min_gap_ms=100).collect()}
    # first fetch: no gap, transfer 2000 ms
    assert out[("h1", 1)].gap_ms == 0
    assert out[("h1", 1)].fetch_start_ms == 0
    assert out[("h1", 1)].fetch_end_ms == 2000
    # 2 MB predecessor at 1 MB/s -> 2000 ms pause; tiny transfer 2 ms
    assert out[("h1", 2)].gap_ms == 2000
    assert out[("h1", 2)].fetch_end_ms == 2000 + 2000 + 2
    # tiny predecessor -> floor gap 100 ms
    assert out[("h1", 3)].gap_ms == 100
    assert out[("h1", 3)].fetch_end_ms == 4002 + 100 + 500
    # hosts are independent
    assert out[("h2", 1)].gap_ms == 0 and out[("h2", 1)].fetch_end_ms == 10


def test_prefer_https_dedup(spark):
    from crawlspark.canon import prefer_https_dedup
    urls = spark.createDataFrame(
        [("http://a.test/p",), ("https://a.test/p",), ("http://b.test/q",)],
        "url STRING")
    out = {r.schemeless_key: r for r in prefer_https_dedup(urls).collect()}
    assert out["//a.test/p"].url == "https://a.test/p"
    assert out["//a.test/p"].n_variants == 2
    assert out["//b.test/q"].url == "http://b.test/q"
    assert out["//b.test/q"].n_variants == 1
