"""Round-2 part-5 operators: byte-budget wave, hreflang clusters,
URL blocklist."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from crawlspark.canon import url_category
from crawlspark.extract import extract_hreflang
from crawlspark.scheduler import select_wave_by_bytes


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows, "host STRING, url STRING, priority LONG, crawl_ts LONG,"
              " est_bytes LONG"
    )


def test_wave_bytes_host_budget_cut(spark):
    rows = [
        ("h1", "u1", 100, 0, 4000),
        ("h1", "u2", 90, 0, 4000),
        ("h1", "u3", 80, 0, 4000),   # 12000 > 10000 -> dropped
        ("h2", "u4", 50, 0, 2000),
    ]
    out = {r.url: r for r in select_wave_by_bytes(
        _frontier(spark, rows), host_byte_budget=10_000).collect()}
    assert set(out) == {"u1", "u2", "u4"}
    assert out["u1"].host_bytes_before == 0
    assert out["u2"].host_bytes_before == 4000


def test_wave_bytes_first_row_always_admitted(spark):
    # one object bigger than the whole budget IS the host's wave
    rows = [("h1", "huge", 100, 0, 99_999), ("h1", "next", 90, 0, 10)]
    out = {r.url for r in select_wave_by_bytes(
        _frontier(spark, rows), host_byte_budget=1_000).collect()}
    assert out == {"huge"}


def test_wave_bytes_global_cut_and_order(spark):
    # priority order decides who fits the global budget
    rows = [
        ("h1", "a", 100, 0, 500),
        ("h2", "b", 90, 0, 500),
        ("h3", "c", 80, 0, 500),   # 1500 > 1200 -> dropped
    ]
    out = select_wave_by_bytes(
        _frontier(spark, rows), host_byte_budget=10_000,
        global_byte_budget=1_200,
    ).collect()
    assert sorted(r.url for r in out) == ["a", "b"]
    got = {r.url: r.wave_bytes_before for r in out}
    assert got == {"a": 0, "b": 500}


def test_wave_bytes_skewed_hot_host_exact(spark):
    # 300 rows on one hot host + 10 cold: per-host cut must match the
    # brute-force sequential computation exactly
    rows = [("hot", f"u{i:04d}", (i * 7) % 50, i % 13, 900 + (i * 31) % 500)
            for i in range(300)]
    rows += [("cold", f"c{i}", 5, 0, 100) for i in range(10)]
    out = select_wave_by_bytes(
        _frontier(spark, rows), host_byte_budget=20_000).collect()
    # brute force
    import itertools
    exp = set()
    for host, grp in itertools.groupby(
            sorted(rows, key=lambda r: r[0]), key=lambda r: r[0]):
        g = sorted(grp, key=lambda r: (-r[2], r[3], r[1]))
        cum = 0
        for i, r in enumerate(g):
            if i == 0 or cum + r[4] <= 20_000:
                exp.add(r[1])
            cum += r[4] if (i == 0 or cum + r[4] <= 20_000) else 0
    assert {r.url for r in out} == exp


def test_hreflang_extraction_order_tolerant(spark):
    body = ('<link hreflang="en" rel="alternate" href="http://x/en">'
            '<link rel="alternate" href="http://x/de" hreflang="de">'
            '<link rel="stylesheet" href="/s.css">')
    rows = (
        spark.range(1)
        .select(F.explode(extract_hreflang(F.lit(body))).alias("a"))
        .select("a.*").collect()
    )
    assert sorted((r.hreflang, r.url) for r in rows) == [
        ("de", "http://x/de"), ("en", "http://x/en")
    ]


def test_url_category_precedence(spark):
    doms = {"example.com": "ads"}
    kws = {"casino": "gambling"}
    df = spark.createDataFrame([
        Row(url="http://ads.example.com/casino/1"),   # domain wins
        Row(url="http://clean.test/casino/2"),
        Row(url="http://deep.sub.example.com/x"),     # registrable-domain match
        Row(url="http://clean.test/fine"),
        Row(url="http://notexample.com/x"),           # no substring match
    ])
    rows = {r.url: r.cat for r in df.select(
        "url", url_category(F.col("url"), doms, kws).alias("cat")).collect()}
    assert rows["http://ads.example.com/casino/1"] == "ads"
    assert rows["http://clean.test/casino/2"] == "gambling"
    assert rows["http://deep.sub.example.com/x"] == "ads"
    assert rows["http://clean.test/fine"] == "ok"
    assert rows["http://notexample.com/x"] == "ok"


def test_robots_meta_specific_overrides_generic(spark):
    from crawlspark.robots import robots_meta_directives
    body = ('<meta name="crawlspark" content="nofollow">'
            '<meta name="robots" content="noindex, noarchive">')
    r = (spark.range(1)
         .select(robots_meta_directives(F.lit(body)).alias("d"))
         .select("d.*").head())
    # the bot-specific tag REPLACES the generic one: nofollow only
    assert (r.noindex, r.nofollow, r.noarchive) == (False, True, False)


def test_robots_meta_header_additive_and_none(spark):
    from crawlspark.robots import robots_meta_directives
    df = spark.createDataFrame(
        [('<meta name="robots" content="none">', None),
         ("<html></html>", "noindex, noarchive")],
        "body STRING, hdr STRING")
    rows = df.select(
        robots_meta_directives(F.col("body"), F.col("hdr")).alias("d")
    ).select("d.*").collect()
    assert (rows[0].noindex, rows[0].nofollow) == (True, True)   # none
    assert (rows[1].noindex, rows[1].noarchive) == (True, True)  # header
    assert rows[1].nofollow is False


def test_nofollow_outlinks(spark):
    from crawlspark.robots import nofollow_outlinks
    body = ('<a href="/a">1</a>'
            '<a rel="nofollow" href="/b">2</a>'
            '<a href="/c" rel="ugc nofollow">3</a>'
            '<a rel="noopener" href="/d">4</a>')
    got = (spark.range(1)
           .select(nofollow_outlinks(F.lit(body)).alias("u")).head().u)
    assert sorted(got) == ["/b", "/c"]


def test_phash_incremental_lossless_decomposition(spark):
    """old-archive pairs ∪ incremental(new batch) == full-batch pairs."""
    from crawlspark.images import (
        near_dup_images_by_phash,
        phash_band_index,
        phash_incremental_pairs,
    )
    base = 0x0123456789ABCDE0
    old = spark.createDataFrame(
        [(f"o{i}", base ^ (i << 40)) for i in range(6)],
        "image_id STRING, phash LONG")
    new = spark.createDataFrame(
        [("n0", base ^ 1), ("n1", base ^ (1 << 40) ^ 2), ("n2", base ^ 3)],
        "image_id STRING, phash LONG")
    full = {(r.id_a, r.id_b, r.hamming) for r in
            near_dup_images_by_phash(old.unionByName(new),
                                     max_dist=6).collect()}
    old_only = {(r.id_a, r.id_b, r.hamming) for r in
                near_dup_images_by_phash(old, max_dist=6).collect()}
    inc = {(r.id_a, r.id_b, r.hamming) for r in
           phash_incremental_pairs(phash_band_index(old, max_dist=6), new,
                                   max_dist=6).collect()}
    assert old_only | inc == full
    # incremental emits ONLY pairs touching the new batch
    assert all(a.startswith("n") or b.startswith("n") for a, b, _ in inc)
    # and new-vs-new pairs are found too
    assert any(a.startswith("n") and b.startswith("n") for a, b, _ in inc)


def test_frontier_health_hand_computed(spark):
    from crawlspark.scheduler import frontier_health
    f = spark.createDataFrame(
        [("h1", 100, 10), ("h1", 500, 30), ("h2", 99_000, 7)],
        "host STRING, enqueued_ts LONG, priority LONG")
    out = {r.host: r for r in
           frontier_health(f, now_ts=100_000,
                           starvation_age_s=90_000).collect()}
    assert out["h1"].backlog == 2
    assert out["h1"].oldest_age_s == 99_900
    assert out["h1"].mean_priority == 20
    assert out["h1"].starved is True
    assert out["h2"].oldest_age_s == 1_000 and out["h2"].starved is False


def test_robots_fetch_policy_cases(spark):
    from crawlspark.robots import robots_fetch_policy
    df = spark.createDataFrame(
        [(200, None), (307, None), (404, None), (403, None),
         (503, 100), (503, 9_000_000), (503, None), (0, 50)],
        "status INT, age LONG")
    rows = df.select(
        "status", "age",
        robots_fetch_policy(F.col("status"), F.col("age")).alias("p")
    ).collect()
    got = [(r.status, r.age, r.p) for r in rows]
    assert got == [
        (200, None, "parse"), (307, None, "follow_redirect"),
        (404, None, "allow_all"), (403, None, "allow_all"),
        (503, 100, "use_cached"), (503, 9_000_000, "disallow_all"),
        (503, None, "disallow_all"), (0, 50, "use_cached"),
    ]
