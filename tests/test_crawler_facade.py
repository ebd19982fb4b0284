"""Fluent Crawler facade: the reference's user API as a DataFrame plan.

Mirrors the canonical usage from the reference README/tests:
input -> Http::get -> Html::getLinks -> filters/refiners/keep -> run."""

from pyspark.sql import functions as F

from crawlspark import fixture
from crawlspark.crawler import (
    Crawler, GetLinks, HttpGet, Keep, Refine, Title, Where,
)

B = fixture.B


def test_fetch_extract_filter_keep_chain(spark):
    pages = fixture.pages_df(spark)
    out = (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(Keep("seed"))
        .add_step(HttpGet(pages))
        .add_step(GetLinks())
        .add_step(Where(lambda v: v.contains("sub")))
        .run()
        .orderBy("ord")
        .collect()
    )
    # document order, one output per <a> (GetLinks.php:16-33); the reference
    # KEEPS url fragments by default (GetLink.php:36 withFragment=true) —
    # withoutFragment() opts out
    assert [r.value for r in out] == [
        f"{B}/crawling/sub1", f"{B}/crawling/sub2",
        f"{B}/crawling/sub2#fragment1", f"{B}/crawling/sub2#fragment2",
    ]
    assert {r.seed for r in out} == {f"{B}/crawling/main"}
    assert [r.ord for r in out] == [1, 2, 3, 4]


def test_multi_seed_order_and_title(spark):
    pages = fixture.pages_df(spark)
    out = (
        Crawler(spark)
        .inputs([f"{B}/crawling/sub1", f"{B}/crawling/sub2"])
        .add_step(HttpGet(pages))
        .add_step(Title())
        .run()
        .orderBy("ord")
        .collect()
    )
    # seed order preserved (reference runs seeds in list order)
    assert len(out) == 2
    assert out[0].ord == 1 and out[1].ord == 2


def test_error_responses_suppressed_unless_opted_in(spark):
    pages = spark.createDataFrame(
        [("http://e.test/ok", 200, None, "text/html", "<html></html>"),
         ("http://e.test/gone", 404, None, "text/html", "")],
        "url STRING, status INT, redirect_to STRING, content_type STRING, body STRING",
    )
    base = Crawler(spark).inputs(["http://e.test/ok", "http://e.test/gone"])
    suppressed = base.add_step(HttpGet(pages)).run().collect()
    assert [r.value.url for r in suppressed] == ["http://e.test/ok"]
    yielded = (
        Crawler(spark)
        .inputs(["http://e.test/ok", "http://e.test/gone"])
        .add_step(HttpGet(pages, yield_error_responses=True))
        .run()
        .collect()
    )
    assert len(yielded) == 2  # HttpBase.php:260-277 yieldErrorResponses


def test_refine_unique_max_outputs(spark):
    pages = fixture.pages_df(spark)
    out = (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(HttpGet(pages))
        .add_step(GetLinks().unique_outputs().max_outputs(2))
        .add_step(Refine(lambda v: F.upper(v)))
        .run()
        .orderBy("ord")
        .collect()
    )
    assert len(out) == 2
    assert all(r.value == r.value.upper() for r in out)


def test_get_link_first_only(spark):
    pages = fixture.pages_df(spark)
    from crawlspark.crawler import GetLink

    out = (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(HttpGet(pages))
        .add_step(GetLink())
        .run()
        .collect()
    )
    assert [r.value for r in out] == [f"{B}/crawling/sub1"]


def test_metadata_struct(spark):
    pages = fixture.pages_df(spark)
    from crawlspark.crawler import MetaData

    out = (
        Crawler(spark)
        .input(f"{B}/crawling/sub1")
        .add_step(HttpGet(pages))
        .add_step(MetaData())
        .run()
        .collect()
    )
    assert out[0].value.title == "foo"


def test_group_zips_substeps(spark):
    pages = fixture.pages_df(spark)
    from crawlspark.crawler import GetLink, Group, Title

    out = (
        Crawler(spark)
        .input(f"{B}/crawling/sub1")
        .add_step(HttpGet(pages))
        .add_step(Group(title=Title(), first_link=GetLink()))
        .run()
        .collect()
    )
    assert out[0].value.title == "foo"
    # base href /crawling/ resolves 'sub1/sub1' (GetLink.php base handling)
    assert out[0].value.first_link == f"{B}/crawling/sub1/sub1"


def test_http_crawl_step_exact_order(spark):
    pages = fixture.pages_df(spark)
    from crawlspark.crawler import HttpCrawl

    out = (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(Keep("seed"))
        .add_step(HttpCrawl(pages, max_depth=1))
        .run()
        .orderBy("ord")
        .collect()
    )
    # depth(1): seed + its links (reference CrawlingTest depth semantics)
    urls = [r.value.url for r in out]
    assert urls[0] == f"{B}/crawling/main"
    assert set(urls) == {
        f"{B}/crawling/main", f"{B}/crawling/sub1", f"{B}/crawling/sub2",
    }
    assert {r.seed for r in out} == {f"{B}/crawling/main"}


def test_json_get_and_each(spark):
    from crawlspark.crawler import JsonEach, JsonGet

    crawler = Crawler(spark).inputs(
        ['{"items": ["a", "b"], "meta": {"n": 2}}']
    )
    out = (
        crawler.add_step(JsonEach("items")).run().orderBy("ord").collect()
    )
    assert [r.value for r in out] == ["a", "b"]

    out2 = (
        Crawler(spark)
        .input('{"meta": {"n": 2}, "name": "x"}')
        .add_step(JsonGet(count="meta.n", name="name"))
        .run()
        .collect()
    )
    assert out2[0].value["count"] == "2" and out2[0].value["name"] == "x"


def test_csv_positional_mapping(spark):
    from crawlspark.crawler import Csv

    out = (
        Crawler(spark)
        .input("id,name,age\n1,ann,30\n2,bob,41")
        .add_step(Csv({0: "id", 2: "age"}, skip_first_line=True))
        .run()
        .orderBy("ord")
        .collect()
    )
    assert [(r.value.id, r.value.age) for r in out] == [("1", "30"), ("2", "41")]


def test_group_zips_unequal_branch_lengths(spark):
    # branch with fewer outputs pads with null per ordinal (Group zip)
    pages = fixture.pages_df(spark)
    from crawlspark.crawler import GetLinks, Group, Title

    out = (
        Crawler(spark)
        .input(f"{B}/crawling/sub1")
        .add_step(HttpGet(pages))
        .add_step(Group(title=Title(), link=GetLinks()))
        .run()
        .orderBy("ord")
        .collect()
    )
    # sub1 has 3 links; title yields once -> 3 records, title on the first
    assert len(out) == 3
    assert out[0].value.title == "foo"
    assert out[1].value.title is None and out[2].value.title is None
    assert out[0].value.link == f"{B}/crawling/sub1/sub1"


def test_http_crawl_100_seeds_single_frontier(spark):
    """Multi-seed crawl: 100 seeds advance in ONE engine frontier (no
    per-seed driver loop), per-seed ordering preserved and scoping pinned
    per seed host (reference setHostOrDomain per input)."""
    from pyspark.sql import functions as F

    from crawlspark.crawler import HttpCrawl

    n_seeds, chain = 100, 3
    rows = []
    for h in range(n_seeds):
        base = f"http://h{h}.multi.test"
        for p in range(chain):
            nxt = (
                f'<a href="/p{p + 1}">next</a>' if p + 1 < chain else ""
            )
            # also a cross-host link that per-seed sameHost scoping must drop
            leak = f'<a href="http://h{(h + 1) % n_seeds}.multi.test/p0">x</a>'
            rows.append(
                (f"{base}/p{p}", 200, None, "text/html",
                 f"<html><body>{nxt}{leak}</body></html>")
            )
    pages = spark.createDataFrame(
        rows,
        "url STRING, status INT, redirect_to STRING, content_type STRING, body STRING",
    )
    seeds = [f"http://h{h}.multi.test/p0" for h in range(n_seeds)]
    out = (
        Crawler(spark)
        .inputs(seeds)
        .add_step(HttpCrawl(pages, max_depth=5))
        .run()
        .orderBy("ord")
        .collect()
    )
    assert len(out) == n_seeds * chain
    by_seed = {}
    for r in out:
        host = r.value.url.split("/")[2]
        by_seed.setdefault(host, []).append(r.value.url)
    assert len(by_seed) == n_seeds
    for h in range(n_seeds):
        urls = by_seed[f"h{h}.multi.test"]
        # per-seed crawl order: p0, p1, p2 — no cross-host leakage
        assert urls == [f"http://h{h}.multi.test/p{p}" for p in range(chain)]


def test_http_crawl_empty_input_returns_empty(spark):
    """All seeds filtered out upstream -> empty result, not IndexError."""
    from pyspark.sql import functions as F

    from crawlspark.crawler import HttpCrawl, Where

    pages = fixture.pages_df(spark)
    out = (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(Where(lambda v: v.contains("no-such-seed")))
        .add_step(HttpCrawl(pages, max_depth=1))
        .run()
    )
    assert out.count() == 0


def test_get_links_options(spark):
    """GetLink(s) option surface (GetLink.php:102-163): host/domain scoping
    relative to the page, allow-lists, withoutFragment, CSS selector."""
    from crawlspark.crawler import GetLink, GetLinks

    body = (
        '<a href="/local#sec">L</a>'
        '<a href="http://sub.site.test/s">S</a>'
        '<a href="http://other.test/o">O</a>'
        '<a class="next" href="http://site.test/next">N</a>'
        '<div class="wrap"><a href="/inwrap">W</a></div>'
    )
    pages = spark.createDataFrame(
        [("http://site.test/page", 200, body)], "url STRING, status INT, body STRING"
    )

    def run(step):
        return [
            r.value
            for r in Crawler(spark)
            .input("http://site.test/page")
            .add_step(HttpGet(pages))
            .add_step(step)
            .run()
            .orderBy("ord")
            .collect()
        ]

    assert run(GetLinks()) == [
        "http://site.test/local#sec", "http://sub.site.test/s",
        "http://other.test/o", "http://site.test/next",
        "http://site.test/inwrap",
    ]
    assert run(GetLinks().without_fragment())[0] == "http://site.test/local"
    assert run(GetLinks().on_same_host()) == [
        "http://site.test/local#sec", "http://site.test/next",
        "http://site.test/inwrap",
    ]
    assert run(GetLinks().not_on_same_host()) == [
        "http://sub.site.test/s", "http://other.test/o",
    ]
    # sub.site.test shares the registrable domain site.test with the page
    assert run(GetLinks().on_same_domain()) == [
        "http://site.test/local#sec", "http://sub.site.test/s",
        "http://site.test/next", "http://site.test/inwrap",
    ]
    assert run(GetLinks().not_on_same_domain()) == ["http://other.test/o"]
    assert run(GetLinks().on_host("other.test")) == ["http://other.test/o"]
    assert run(GetLinks().on_domain(["other.test"])) == ["http://other.test/o"]
    # CSS selector: matched element must BE the <a> (non-anchor .wrap ignored)
    assert run(GetLinks(".next")) == ["http://site.test/next"]
    assert run(GetLink(".wrap")) == []  # div matched, not an anchor -> no link
    assert run(GetLink()) == ["http://site.test/local#sec"]


def test_dom_step_each_extract(spark):
    """Dom::each(selector)->extract(mapping) (src/Steps/Dom.php:44-160):
    one record per matched node, text/attribute/html targets."""
    from crawlspark.crawler import Dom

    body = (
        '<div class="product"><h2 class="t">Widget  A</h2>'
        '<a class="buy" href="/buy/1">buy</a></div>'
        '<div class="product"><h2 class="t">Widget <b>B</b></h2>'
        '<a class="buy" href="/buy/2">buy</a></div>'
    )
    pages = spark.createDataFrame(
        [("http://shop.test/", 200, body)], "url STRING, status INT, body STRING"
    )
    out = (
        Crawler(spark)
        .input("http://shop.test/")
        .add_step(HttpGet(pages))
        .add_step(
            Dom(each=".product").extract(
                {"title": ".t", "href": ".buy @href", "raw": ".t @html"}
            )
        )
        .run()
        .orderBy("ord")
        .collect()
    )
    assert [(r.value.title, r.value.href) for r in out] == [
        ("Widget A", "/buy/1"), ("Widget B", "/buy/2"),
    ]
    assert out[1].value.raw == "Widget <b>B</b>"


def test_dom_step_first_last_and_validation(spark):
    from crawlspark.crawler import Dom, PreRunValidationError
    import pytest

    body = '<p class="x">one</p><p class="x">two</p>'
    pages = spark.createDataFrame(
        [("http://t.test/", 200, body)], "url STRING, status INT, body STRING"
    )

    def vals(step):
        return [
            r.value.v
            for r in Crawler(spark)
            .input("http://t.test/")
            .add_step(HttpGet(pages))
            .add_step(step)
            .run()
            .collect()
        ]

    assert vals(Dom(first=".x").extract({"v": ""})) == ["one"]
    assert vals(Dom(last=".x").extract({"v": ""})) == ["two"]
    # Dom needs a response input: pre-run validation rejects a raw string
    with pytest.raises(PreRunValidationError):
        Crawler(spark).input("x").add_step(Dom(each=".x")).run()


def test_paginate_step_yields_response_per_page(spark):
    """Http::get()->paginate('.pagination') as a chainable step: one
    response per visited page per input chain, downstream steps compose."""
    from crawlspark.crawler import Paginate, Title

    rows = []
    for c in range(3):
        n = 2 + c  # chain c has 2+c pages
        for p in range(n):
            nxt = (
                f'<div class="pagination"><a href="/c{c}?p={p + 1}">n</a></div>'
                if p + 1 < n else ""
            )
            rows.append(
                (f"http://pg.test/c{c}?p={p}", 200,
                 f"<html><head><title>c{c}p{p}</title></head><body>{nxt}</body></html>")
            )
    pages = spark.createDataFrame(rows, "url STRING, status INT, body STRING")
    out = (
        Crawler(spark)
        .inputs([f"http://pg.test/c{c}?p=0" for c in range(3)])
        .add_step(Paginate(pages, ".pagination"))
        .add_step(Title())
        .run()
        .orderBy("ord")
        .collect()
    )
    assert [r.value for r in out] == [
        "c0p0", "c0p1", "c1p0", "c1p1", "c1p2", "c2p0", "c2p1", "c2p2", "c2p3",
    ]


def test_set_store_writes_results_and_still_returns_them(spark, tmp_path):
    """Crawler::setStore (Crawler.php:303-306): every Result row goes to the
    store AND run() still returns it; the CSV store spreads record fields
    and joins arrays with ' | ' like the reference."""
    import json as jsonlib
    import glob

    from crawlspark.crawler import JsonFileStore, JsonGet, SimpleCsvFileStore

    pages = fixture.pages_df(spark)
    jdir = str(tmp_path / "jstore")
    out = (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(Keep("seed"))
        .add_step(HttpGet(pages))
        .add_step(GetLinks())
        .set_store(JsonFileStore(jdir))
        .run()
    )
    n = out.count()
    stored = []
    for f in glob.glob(f"{jdir}/part-*"):
        with open(f) as fh:
            stored += [jsonlib.loads(l) for l in fh if l.strip()]
    assert len(stored) == n and n > 0
    assert {r["seed"] for r in stored} == {f"{B}/crawling/main"}

    cdir = str(tmp_path / "cstore")
    (
        Crawler(spark)
        .input('{"title": "Widget", "price": "9.99"}')
        .add_step(JsonGet(title="title", price="price"))
        .set_store(SimpleCsvFileStore(cdir))
        .run()
    ).count()
    csv_lines = []
    for f in glob.glob(f"{cdir}/part-*.csv"):
        with open(f) as fh:
            csv_lines += fh.read().splitlines()
    assert any("title" in l for l in csv_lines[:1])  # fields spread flat
    assert any("Widget" in l for l in csv_lines)


def test_http_crawler_builder_and_user_agents(spark):
    """HttpCrawler::make + user agents (src/HttpCrawler.php,
    src/UserAgents/*.php): bound step factories; robots rules bind for
    BotUserAgent but NOT for a non-bot UserAgent
    (RobotsTxtHandler.php:43-52)."""
    from crawlspark.crawler import BotUserAgent, HttpCrawler, UserAgent

    pages = fixture.pages_df(spark)
    robots = fixture.robots_df(spark)
    seed = f"{B}/not-allowed"

    bot = (
        HttpCrawler.make(spark, pages, robots=robots,
                         user_agent=BotUserAgent("MyBot", version="1.0"))
        .input(seed)
        .add_step_crawl(max_depth=0)
        .run()
    )
    assert bot.count() == 0  # /not-allowed blocked for the bot

    human = (
        HttpCrawler.make(spark, pages, robots=robots,
                         user_agent=UserAgent("Mozilla/5.0 (X11; Linux)"))
        .input(seed)
        .add_step_crawl(max_depth=0)
        .run()
    )
    assert human.count() == 1  # non-bot agents ignore robots rules
    assert str(BotUserAgent("MyBot", "https://b.test", "2")) == (
        "Mozilla/5.0 (compatible; MyBot/2; +https://b.test)"
    )


def test_sub_crawler_for_field(spark):
    """subCrawlerFor (BaseStep.php:316-390): each record's 'link' property
    is crawled by a sub-chain and replaced with the ordered sub-results;
    records whose sub-crawl yields nothing get null."""
    from crawlspark.crawler import GetLinks, Group, SubCrawler, Title

    pages = fixture.pages_df(spark)
    out = (
        Crawler(spark)
        .input(f"{B}/crawling/sub1")
        .add_step(HttpGet(pages))
        .add_step(Group(title=Title(), link=GetLinks().on_same_host()))
        .add_step(SubCrawler("link", HttpGet(pages), Title()))
        .run()
        .orderBy("ord")
        .collect()
    )
    # sub1's same-host links: sub1/sub1 (record 1); its sub-crawl fetches
    # the page and titles it — SUB1_SUB1 has no <title> so Title yields null
    by_title = {r.value.title: r.value.link for r in out}
    assert "foo" in by_title
    linked = by_title["foo"]
    assert linked is not None and len(linked) == 1


def test_paginate_step_query_params_mode(spark):
    """Http::get()->paginate(Paginator::queryParams()->inUrl()
    ->increase('page')) as a chainable step: the QueryParamsPaginator walks
    ?page=N until the page is missing or a stop rule fires."""
    from crawlspark.crawler import Paginate, Title
    from crawlspark.paginate import ContainsRule, increase

    rows = []
    for c in range(2):
        n = 2 + c
        for p in range(1, n + 1):
            body = "LAST" if p == n else "more"
            rows.append(
                (f"http://qp.test/c{c}?page={p}", 200,
                 f"<html><head><title>c{c}p{p}</title></head>"
                 f"<body>{body}</body></html>")
            )
    pages = spark.createDataFrame(rows, "url STRING, status INT, body STRING")
    out = (
        Crawler(spark)
        .inputs([f"http://qp.test/c{c}?page=1" for c in range(2)])
        .add_step(Paginate(pages, query_params=[increase("page")],
                           stop_rule=ContainsRule("LAST")))
        .add_step(Title())
        .run()
        .orderBy("ord")
        .collect()
    )
    assert [r.value for r in out] == ["c0p1", "c0p2", "c1p1", "c1p2", "c1p3"]


def test_http_crawl_multi_output_upstream_seeds_stay_scoped(spark):
    """A multi-output upstream step (GetLinks) emits several seed rows per
    input; each must crawl as its OWN sub-crawl with its own sameHost scope
    — collapsing them onto one seed id leaked cross-host links (regression:
    seed_id was _input_id, not per-row)."""
    from crawlspark.crawler import GetLinks, HttpCrawl, HttpGet

    pages = spark.createDataFrame([
        ("http://hub.test/", 200,
         '<a href="http://a.test/p0">a</a><a href="http://b.test/p0">b</a>'),
        ("http://a.test/p0", 200,
         '<a href="http://b.test/leak">x</a><a href="/p1">y</a>'),
        ("http://a.test/p1", 200, "end"),
        ("http://b.test/p0", 200, '<a href="/q1">z</a>'),
        ("http://b.test/q1", 200, "end"),
        ("http://b.test/leak", 200, "LEAKED"),
    ], "url STRING, status INT, body STRING")
    out = (
        Crawler(spark).input("http://hub.test/")
        .add_step(HttpGet(pages)).add_step(GetLinks())
        .add_step(HttpCrawl(pages, max_depth=3))
        .run().orderBy("ord").collect()
    )
    urls = [r.value.url for r in out]
    assert "http://b.test/leak" not in urls
    # per-seed blocks in upstream link order
    assert urls == ["http://a.test/p0", "http://a.test/p1",
                    "http://b.test/p0", "http://b.test/q1"]


def test_paginate_multi_output_upstream_chains_and_keeps(spark):
    """Several chain rows per input (GetLinks upstream) must paginate as
    separate chains, and kept columns must re-attach per chain row without
    row multiplication (regression: chain_id was _input_id)."""
    from crawlspark.crawler import GetLinks, HttpGet, Keep, Paginate, Title

    pages = spark.createDataFrame([
        ("http://hub.test/", 200,
         '<a href="http://x.test/l?p=0">x</a><a href="http://y.test/l?p=0">y</a>'),
        ("http://x.test/l?p=0", 200,
         '<html><head><title>x0</title></head><body>'
         '<div class="pagination"><a href="/l?p=1">n</a></div></body></html>'),
        ("http://x.test/l?p=1", 200,
         "<html><head><title>x1</title></head><body></body></html>"),
        ("http://y.test/l?p=0", 200,
         "<html><head><title>y0</title></head><body></body></html>"),
    ], "url STRING, status INT, body STRING")
    out = (
        Crawler(spark).input("http://hub.test/")
        .add_step(HttpGet(pages)).add_step(GetLinks()).add_step(Keep("link"))
        .add_step(Paginate(pages, ".pagination"))
        .add_step(Title())
        .run().orderBy("ord").collect()
    )
    assert [r.value for r in out] == ["x0", "x1", "y0"]
    assert [r.link for r in out] == [
        "http://x.test/l?p=0", "http://x.test/l?p=0", "http://y.test/l?p=0",
    ]
