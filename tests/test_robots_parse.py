"""robots.txt text parser + Crawl-delay politeness integration."""

from pyspark.sql import functions as F

from crawlspark.politeness import PolitenessConfig, throttle_schedule
from crawlspark.robots import crawl_delay_for, parse_robots_txt, with_robots_allowed

ROBOTS = """\
# a comment
Disallow: /stray-before-any-group

User-agent: *
Disallow: /private/
Allow: /private/ok   # trailing comment
Crawl-delay: 2.5
Sitemap: http://h.example.com/sitemap.xml

user-AGENT: googlebot
User-agent: mybot
DISALLOW: /g1
Disallow:
Disallow: /g2

Sitemap: http://h.example.com/sitemap2.xml
"""


def _parsed(spark, body=ROBOTS, host="h.example.com"):
    df = spark.createDataFrame([(host, body)], "host string, body string")
    return parse_robots_txt(df)


def test_parse_groups_rules_and_sitemaps(spark):
    rows = {r["user_agent"]: r for r in _parsed(spark).collect()}
    assert set(rows) == {"*", "googlebot", "mybot"}
    star = rows["*"]
    assert star["disallow_prefixes"] == ["/private/"]
    assert star["allow_prefixes"] == ["/private/ok"]
    assert star["crawl_delay"] == 2.5
    # consecutive UA lines share ONE header; empty Disallow skipped
    for ua in ("googlebot", "mybot"):
        assert rows[ua]["disallow_prefixes"] == ["/g1", "/g2"]
        assert rows[ua]["allow_prefixes"] == []
        assert rows[ua]["crawl_delay"] is None
    # sitemaps are host-global, in file order, on every row
    for r in rows.values():
        assert r["sitemaps"] == [
            "http://h.example.com/sitemap.xml",
            "http://h.example.com/sitemap2.xml",
        ]


def test_parse_feeds_the_allow_gate(spark):
    rules = _parsed(spark)
    frontier = spark.createDataFrame(
        [("h.example.com", "/private/x"), ("h.example.com", "/private/ok/x"),
         ("h.example.com", "/stray-before-any-group"), ("h.example.com", "/g2/a")],
        "host string, path string",
    )
    got = {
        r["path"]: r["robots_allowed"]
        for r in with_robots_allowed(
            frontier, rules, user_agent="my Crawler (googlebot)"
        ).collect()
    }
    # googlebot group wins over '*': /private untouched, /g1,/g2 blocked
    assert got == {
        "/private/x": True,      # star group's rule not applied to googlebot
        "/private/ok/x": True,
        "/stray-before-any-group": True,  # pre-group rule was dropped
        "/g2/a": False,
    }


def test_crlf_and_windows_line_endings(spark):
    body = "User-agent: *\r\nDisallow: /a\r\nCrawl-delay: 1\r\n"
    r = _parsed(spark, body=body).collect()[0]
    assert r["disallow_prefixes"] == ["/a"]
    assert r["crawl_delay"] == 1.0


def test_crawl_delay_for_selects_the_ua_group(spark):
    body = (
        "User-agent: *\nCrawl-delay: 10\n\n"
        "User-agent: mybot\nCrawl-delay: 3\n"
    )
    rules = _parsed(spark, body=body)
    star = crawl_delay_for(rules, "other").collect()[0]
    assert star["crawl_delay_ms"] == 10_000
    mine = crawl_delay_for(rules, "the mybot crawler").collect()[0]
    assert mine["crawl_delay_ms"] == 3_000


def test_crawl_site_with_corpus_parsed_robots_matches_rules_table(spark):
    """End-to-end: a corpus carrying its own /robots.txt page crawls
    identically to one gated by the hand-built rules table."""
    from crawlspark import fixture
    from crawlspark.engine import crawl_site
    from crawlspark.robots import robots_from_corpus

    pages = fixture.pages_df(spark)
    robots_page = spark.createDataFrame(
        [(f"http://{fixture.HOST}/robots.txt", 200, None, "text/plain",
          "User-agent: *\nDisallow: /not-allowed\n")],
        pages.schema,
    )
    corpus = pages.union(robots_page)
    seed = f"{fixture.B}/crawling/main"
    via_text = crawl_site(
        spark, corpus, seed, robots=robots_from_corpus(corpus, body_col="body")
    )
    via_table = crawl_site(spark, corpus, seed, robots=fixture.robots_df(spark))
    cols = ["url", "depth", "ord", "loaded", "yielded"]
    assert sorted(map(tuple, via_text.select(*cols).collect())) == sorted(
        map(tuple, via_table.select(*cols).collect())
    )


def test_throttle_schedule_honors_crawl_delay_floor(spark):
    frontier = spark.createDataFrame(
        [("a", 1, 100, 5000), ("a", 2, 100, 5000), ("a", 3, 100, 5000),
         ("b", 1, 100, None), ("b", 2, 100, None)],
        "host string, ord int, latency_ms int, crawl_delay_ms long",
    )
    out = throttle_schedule(
        frontier, cfg=PolitenessConfig(max_wait_ms=1000), delay_col="crawl_delay_ms"
    )
    waits = {(r["host"], r["seq"]): r["wait_ms"] for r in out.collect()}
    assert waits[("a", 1)] == 0          # first fetch never waits
    assert waits[("a", 2)] == 5000       # directive beats throttler AND cap
    assert waits[("a", 3)] == 5000
    assert waits[("b", 2)] == 250        # no directive: min-wait clamp
