"""Golden end-to-end crawl tests, ported 1:1 from the reference's
tests/_Integration/Http/CrawlingTest.php over the Crawling.php fixture site."""

import pytest
from pyspark.sql import functions as F

from crawlspark import fixture
from crawlspark.engine import SiteCrawlConfig, crawl_site

B = fixture.B
MAIN = f"{B}/crawling/main"
SITEMAP = f"{B}/crawling/sitemap.xml"


@pytest.fixture(scope="module")
def pages(spark):
    return fixture.pages_df(spark).persist()


@pytest.fixture(scope="module")
def robots(spark):
    return fixture.robots_df(spark)


def run(spark, pages, robots, seed, **kw):
    df = crawl_site(spark, pages, seed, SiteCrawlConfig(**kw), robots=robots)
    rows = sorted(df.collect(), key=lambda r: r.ord)
    attempted = [r.url for r in rows]
    loaded = [r.url for r in rows if r.loaded]
    yielded = [r.effective_url for r in rows if r.yielded]
    return attempted, loaded, yielded


def test_stays_on_same_host_by_default(spark, pages, robots):
    _, loaded, _ = run(spark, pages, robots, MAIN)
    assert f"http://foo.example.com/crawling/main-on-subdomain" not in loaded
    assert sorted(loaded) == sorted([
        MAIN, f"{B}/crawling/sub1", f"{B}/crawling/sub1/sub1",
        f"{B}/crawling/sub2", f"{B}/crawling/sub2/sub1",
        f"{B}/crawling/sub2/sub1/sub1",
    ])  # CrawlingTest: 'crawls every page of a website that is linked somewhere'


def test_same_domain(spark, pages, robots):
    _, loaded, _ = run(spark, pages, robots, MAIN, same_host=False, same_domain=True)
    assert "http://foo.example.com/crawling/main-on-subdomain" in loaded
    assert "https://www.crwlr.software/packages/crawler" not in loaded


def test_depth(spark, pages, robots):
    _, loaded1, _ = run(spark, pages, robots, MAIN, max_depth=1)
    assert len(loaded1) == 3
    _, loaded2, _ = run(spark, pages, robots, MAIN, max_depth=2)
    assert len(loaded2) == 5


def test_sitemap_input(spark, pages, robots):
    _, loaded, _ = run(spark, pages, robots, SITEMAP, input_is_sitemap=True)
    assert len(loaded) == 7
    _, loaded_no, _ = run(spark, pages, robots, SITEMAP)
    assert len(loaded_no) == 1


def test_sitemap2_with_attributes(spark, pages, robots):
    _, loaded, _ = run(
        spark, pages, robots, f"{B}/crawling/sitemap2.xml", input_is_sitemap=True
    )
    assert len(loaded) == 7


def test_path_starts_with(spark, pages, robots):
    _, loaded, _ = run(
        spark, pages, robots, SITEMAP,
        input_is_sitemap=True, path_starts_with="/crawling/sub1",
    )
    assert sorted(loaded) == sorted(
        [SITEMAP, f"{B}/crawling/sub1", f"{B}/crawling/sub1/sub1"]
    )


def test_path_matches(spark, pages, robots):
    _, loaded, _ = run(
        spark, pages, robots, SITEMAP,
        input_is_sitemap=True, path_matches=r"^/crawling/sub[12]$",
    )
    assert len(loaded) == 3


def test_custom_filter_on_url(spark, pages, robots):
    keep_paths = ["/crawling/main", "/crawling/sub1/sub1", "/crawling/sub2/sub1/sub1"]

    def flt(url, text):
        return F.parse_url(url, F.lit("PATH")).isin(keep_paths)

    _, loaded, _ = run(
        spark, pages, robots, SITEMAP, input_is_sitemap=True, custom_filter=flt
    )
    assert len(loaded) == 4
    for p in keep_paths:
        assert f"{B}{p}" in loaded


def test_custom_filter_on_link_text(spark, pages, robots):
    def flt(url, text):
        return F.coalesce(text.contains("Subpage 2"), F.lit(False))

    _, loaded, _ = run(spark, pages, robots, MAIN, custom_filter=flt)
    assert len(loaded) == 4
    for u in [MAIN, f"{B}/crawling/sub2", f"{B}/crawling/sub2/sub1",
              f"{B}/crawling/sub2/sub1/sub1"]:
        assert u in loaded


def test_load_all_but_yield_only_matching_path(spark, pages, robots):
    _, loaded, yielded = run(
        spark, pages, robots, SITEMAP,
        input_is_sitemap=True, path_starts_with="/crawling/sub2",
        load_all_but_yield_only_matching=True,
    )
    assert len(loaded) == 7
    assert len(yielded) == 3


def test_load_all_but_yield_only_matching_regex(spark, pages, robots):
    _, loaded, yielded = run(
        spark, pages, robots, SITEMAP,
        input_is_sitemap=True, path_matches=r"^/crawling/sub[12]$",
        load_all_but_yield_only_matching=True,
    )
    assert len(loaded) == 7
    assert len(yielded) == 2


def test_load_all_but_yield_only_matching_custom(spark, pages, robots):
    keep_paths = ["/crawling/main", "/crawling/sub1/sub1", "/crawling/sub2/sub1/sub1"]

    def flt(url, text):
        return F.parse_url(url, F.lit("PATH")).isin(keep_paths)

    _, loaded, yielded = run(
        spark, pages, robots, SITEMAP,
        input_is_sitemap=True, custom_filter=flt,
        load_all_but_yield_only_matching=True,
    )
    assert len(loaded) == 7
    assert len(yielded) == 3


def test_keep_url_fragment(spark, pages, robots):
    _, _, yielded = run(spark, pages, robots, MAIN, keep_url_fragment=True)
    assert len(yielded) == 8
    assert f"{B}/crawling/sub2" in yielded
    assert f"{B}/crawling/sub2#fragment1" in yielded
    assert f"{B}/crawling/sub2#fragment2" in yielded


def test_max_outputs(spark, pages, robots):
    attempted, loaded, yielded = run(
        spark, pages, robots, MAIN, keep_url_fragment=True, max_outputs=4
    )
    assert len(yielded) == 4
    assert len(loaded) == 4


def test_use_canonical_links_exact_order(spark, pages, robots):
    _, loaded, yielded = run(spark, pages, robots, MAIN, use_canonical_links=True)
    assert yielded == [
        MAIN,
        f"{B}/crawling/sub1/sub1",
        f"{B}/crawling/sub2",
        f"{B}/crawling/sub2/sub1/sub1",
    ]
    assert loaded == [
        MAIN,
        f"{B}/crawling/sub1",
        f"{B}/crawling/sub2",
        f"{B}/crawling/sub2/sub1",
        f"{B}/crawling/sub2/sub1/sub1",
    ]


def test_redirect_to_already_loaded_page(spark, pages, robots):
    _, _, yielded = run(spark, pages, robots, f"{B}/crawling/redirect")
    assert MAIN in yielded
    assert f"{B}/crawling/redirect" not in yielded
    assert len(yielded) == len(set(yielded)), "no page yielded twice"


def test_robots_denied_seed(spark, pages, robots):
    attempted, loaded, yielded = run(spark, pages, robots, f"{B}/not-allowed")
    assert yielded == []
    assert loaded == []
    assert attempted == [f"{B}/not-allowed"]


def test_yield_error_responses(spark, pages, robots):
    """Reference Http step suppresses >=400 responses unless
    yieldErrorResponses() (HttpBase.php:260-277). Add a 404 page linked from
    main and check both modes."""
    from pyspark.sql import functions as F

    extra = spark.createDataFrame(
        [(f"{B}/crawling/missing", 404, None, "text/html",
          "<html><body>gone</body></html>")],
        "url STRING, status INT, redirect_to STRING, content_type STRING, body STRING",
    )
    main_with_dead_link = pages.withColumn(
        "body",
        F.when(
            F.col("url") == MAIN,
            F.concat(F.col("body"), F.lit('<a href="/crawling/missing">dead</a>')),
        ).otherwise(F.col("body")),
    ).unionByName(extra)

    _, loaded, yielded = run_pages(spark, main_with_dead_link, robots, MAIN)
    assert f"{B}/crawling/missing" in loaded
    assert f"{B}/crawling/missing" not in yielded

    _, loaded2, yielded2 = run_pages(
        spark, main_with_dead_link, robots, MAIN, yield_error_responses=True
    )
    assert f"{B}/crawling/missing" in yielded2


def run_pages(spark, pages_df, robots, seed, **kw):
    df = crawl_site(spark, pages_df, seed, SiteCrawlConfig(**kw), robots=robots)
    rows = sorted(df.collect(), key=lambda r: r.ord)
    attempted = [r.url for r in rows]
    loaded = [r.url for r in rows if r.loaded]
    yielded = [r.effective_url for r in rows if r.yielded]
    return attempted, loaded, yielded


def test_multi_seed_equals_sequential_per_seed(spark):
    """Differential invariant: crawl_site with a seed LIST (one frontier)
    must reproduce exactly what per-seed sequential crawls produce, for
    disjoint-host seeds (the reference's sameHost pinning regime)."""
    from pyspark.sql import functions as F

    from crawlspark.engine import SiteCrawlConfig, crawl_site

    rows = []
    for h in range(6):
        base = f"http://s{h}.diff.test"
        n = 2 + h % 3
        for p in range(n):
            links = "".join(
                f'<a href="/p{q}">x</a>' for q in range(p + 1, min(p + 3, n))
            )
            rows.append((f"{base}/p{p}", 200, None, "text/html",
                         f"<html><body>{links}</body></html>"))
    pages = spark.createDataFrame(
        rows,
        "url STRING, status INT, redirect_to STRING, content_type STRING, body STRING",
    )
    seeds = [f"http://s{h}.diff.test/p0" for h in range(6)]
    cfg = SiteCrawlConfig(max_depth=4)

    multi = {
        (r["seed_id"], r["url"], r["depth"], r["ord"], r["loaded"], r["yielded"])
        for r in crawl_site(spark, pages, seeds, cfg).collect()
    }
    sequential = set()
    for i, s in enumerate(seeds):
        for r in crawl_site(spark, pages, s, SiteCrawlConfig(max_depth=4)).collect():
            sequential.add(
                (i, r["url"], r["depth"], r["ord"], r["loaded"], r["yielded"])
            )
    assert multi == sequential


def test_crawl_site_with_politeness_schedule(spark):
    """with_politeness: every level carries the per-host FIFO fetch schedule
    (Throttler.php:49-55 min-wait floor); consecutive fetches of one host
    within a level are spaced by >= max(min_wait, prev latency)."""
    from pyspark.sql import functions as F

    from crawlspark.engine import SiteCrawlConfig, crawl_site
    from crawlspark.politeness import MIN_WAIT_MS

    rows = []
    n = 8
    for p in range(n):
        links = "".join(f'<a href="/p{q}">x</a>' for q in range(n))
        rows.append((f"http://pol.test/p{p}", 200, None, "text/html",
                     f"<html><body>{links}</body></html>", 100 + 10 * p))
    pages = spark.createDataFrame(
        rows,
        "url STRING, status INT, redirect_to STRING, content_type STRING, "
        "body STRING, latency_ms LONG",
    )
    out = crawl_site(
        spark, pages, "http://pol.test/p0",
        SiteCrawlConfig(max_depth=2, with_politeness=True),
    ).collect()
    assert all(r["fetch_start_ms"] is not None for r in out if r["loaded"])
    by_level: dict = {}
    for r in out:
        by_level.setdefault(r["depth"], []).append(r)
    lvl1 = sorted(by_level[1], key=lambda r: r["seq"])
    assert [r["seq"] for r in lvl1] == list(range(1, len(lvl1) + 1))
    for a, b in zip(lvl1, lvl1[1:]):
        gap = b["fetch_start_ms"] - a["fetch_start_ms"]
        assert gap >= a["fetch_end_ms"] - a["fetch_start_ms"] + MIN_WAIT_MS - 1
