"""Paginator stop-rule family + SimpleWebsitePaginator.

Mirrors reference tests: StopRules/*.php semantics and
SimpleWebsitePaginatorTest.php (FIFO discovery order, per-chain dedup,
selector-matches-the-link-itself vs wrapper-element, maxPages cap).
"""

import pytest
from pyspark.sql import functions as F

from crawlspark import cssq
from crawlspark.paginate import (
    ContainsRule,
    IsEmptyInHtmlRule,
    IsEmptyInJsonRule,
    IsEmptyInXmlRule,
    IsEmptyResponseRule,
    NotContainsRule,
    paginate_query_params,
    website_paginate,
)


# ---- cssq engine (no spark) ----------------------------------------------

def test_cssq_class_selector_wrapper_and_self():
    body = (
        '<div class="pagination"><a href="/p2">Next</a> <a href="/p3">x</a></div>'
        '<a class="nextPageLink" href="/p9">Self</a>'
    )
    assert cssq.pagination_link_hrefs(body, ".pagination") == ["/p2", "/p3"]
    # selector matching the link itself (SimpleWebsitePaginatorTest.php:124-133)
    assert cssq.pagination_link_hrefs(body, ".nextPageLink") == ["/p9"]


def test_cssq_descendant_id_and_tag():
    body = '<nav id="pg"><span><a href="/a">1</a></span></nav><a href="/b">2</a>'
    assert cssq.pagination_link_hrefs(body, "#pg") == ["/a"]
    assert cssq.pagination_link_hrefs(body, "nav a") == ["/a"]
    assert [i.strip() for i in cssq.inner_htmls(body, "span")] == ['<a href="/a">1</a>']


def test_cssq_fragment_hrefs_skipped():
    body = '<div class="pagination"><a href="#top">t</a><a href="/p2">n</a></div>'
    assert cssq.pagination_link_hrefs(body, ".pagination") == ["/p2"]


def test_cssq_nested_same_tag_inner():
    body = "<div class='o'><div>in</div>tail</div>"
    assert cssq.inner_htmls(body, ".o") == ["<div>in</div>tail"]


def test_cssq_rejects_unsupported_selector():
    # child combinator IS supported now (test_xpath.py); siblings and
    # pseudo-classes remain outside the subset
    assert [s.child for s in cssq.parse_selector("a > b")] == [False, True]
    with pytest.raises(ValueError):
        cssq.parse_selector("a ~ b")
    with pytest.raises(ValueError):
        cssq.parse_selector("li:nth-child(2)")


# ---- stop rules over columns ---------------------------------------------

def _stops(spark, rule, bodies):
    df = spark.createDataFrame([(b,) for b in bodies], "body STRING")
    return [r["s"] for r in df.select(rule.stop_col(F.col("body")).alias("s")).collect()]


def test_stop_rule_family(spark):
    assert _stops(spark, ContainsRule("END"), ["has END here", "nope"]) == [True, False]
    assert _stops(spark, NotContainsRule("more"), ["more...", "done"]) == [False, True]
    assert _stops(spark, IsEmptyResponseRule(), ["  ", "[]", "{}", '{"a":1}']) == [
        True, True, True, False,
    ]
    assert _stops(
        spark,
        IsEmptyInJsonRule("data.items"),
        [
            '{"data": {"items": [1]}}',
            '{"data": {"items": []}}',
            '{"data": {}}',
            '{"data": {"items": 0}}',
        ],
    ) == [False, True, True, True]
    assert _stops(
        spark,
        IsEmptyInHtmlRule(".listing"),
        [
            '<div class="listing"><p>x</p></div>',
            '<div class="listing">   </div>',
            "<div>no listing</div>",
        ],
    ) == [False, True, True]
    assert _stops(
        spark,
        IsEmptyInXmlRule("items"),
        ["<r><items><i>1</i></items></r>", "<r><items></items></r>"],
    ) == [False, True]


def test_query_params_paginator_is_empty_in_json_stop(spark):
    # JSON API: pages 0..3 have items, page 4 returns empty items
    pages = spark.range(0, 6).select(
        F.concat(F.lit("https://api.ex.com/list?page="), F.col("id")).alias("url"),
        F.when(F.col("id") < 4, F.lit('{"items": [1,2]}'))
        .otherwise(F.lit('{"items": []}'))
        .alias("body"),
    )
    out = paginate_query_params(
        spark, pages, ["https://api.ex.com/list?page=0"],
        param="page", stop_rule=IsEmptyInJsonRule("items"),
    )
    urls = [r["url"] for r in out.orderBy("page_ord").collect()]
    # the empty page IS still requested (stop AFTER processing), then ends
    assert urls == [f"https://api.ex.com/list?page={i}" for i in range(5)]


# ---- SimpleWebsitePaginator ----------------------------------------------

def _listing_corpus(spark, n, links_per_page=2):
    """page i's pagination block links to i+1..i+links_per_page (clamped) —
    FIFO discovery from page 0 visits pages in numeric order."""
    i = F.col("id")
    links = F.concat_ws(
        "",
        *[
            F.when(
                i + k < n,
                F.concat(
                    F.lit('<a href="/listing?page='), (i + k).cast("string"),
                    F.lit('">p</a>'),
                ),
            ).otherwise(F.lit(""))
            for k in range(1, links_per_page + 1)
        ],
    )
    body = F.concat(
        F.lit('<html><body><div class="pagination">'), links,
        F.lit("</div></body></html>"),
    )
    return spark.range(n).select(
        F.concat(F.lit("https://www.example.com/listing?page="), i.cast("string"))
        .alias("url"),
        body.alias("body"),
    )


def test_website_paginator_fifo_dedup_order(spark):
    pages = _listing_corpus(spark, 8)
    out = website_paginate(
        spark, pages, ["https://www.example.com/listing?page=0"], ".pagination"
    ).orderBy("page_ord").collect()
    urls = [r["url"] for r in out]
    assert urls == [
        f"https://www.example.com/listing?page={i}" for i in range(8)
    ], "FIFO discovery order with dedup must visit each page exactly once"
    # parent-request provenance: page 2 was first found on page 0 (links 1,2)
    found_on = {r["url"]: r["found_on"] for r in out}
    assert found_on["https://www.example.com/listing?page=2"].endswith("page=0")
    assert found_on["https://www.example.com/listing?page=3"].endswith("page=1")


def test_website_paginator_max_pages(spark):
    pages = _listing_corpus(spark, 20)
    out = website_paginate(
        spark, pages, ["https://www.example.com/listing?page=0"], ".pagination",
        max_pages=3,
    )
    assert out.count() == 3  # maxPages cap (Paginator.php:12)


def test_website_paginator_no_links_finishes(spark):
    pages = spark.createDataFrame(
        [("https://www.example.com/listing", '<div class="listing"></div>')],
        "url STRING, body STRING",
    )
    out = website_paginate(
        spark, pages, ["https://www.example.com/listing"], ".pagination"
    )
    assert out.count() == 1  # initial page only


def test_website_paginator_multi_chain_batch(spark):
    pages = _listing_corpus(spark, 6)
    starts = [
        "https://www.example.com/listing?page=0",
        "https://www.example.com/listing?page=3",
    ]
    out = website_paginate(spark, pages, starts, ".pagination")
    per_chain = {
        r["chain_id"]: r["cnt"]
        for r in out.groupBy("chain_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_chain == {0: 6, 1: 3}  # chain 1 starts at page 3 -> visits 3,4,5


# ---- QueryParamsPaginator manipulators (QueryParams/Incrementor.php:22-38,
# Decrementor.php:22-38, QueryParamsPaginator.php:40-113) ------------------


def test_query_param_missing_is_added_with_fallback_zero(spark):
    """PHP (int)null == 0 and Query::set ADDS a missing param — the chain
    continues with ?page=1 instead of dying (AbstractQueryParamManipulator
    getCurrentValue fallback + Incrementor.php:34-37)."""
    pages = spark.createDataFrame(
        [("http://a.test/x", "d"), ("http://a.test/x?page=1", "d")],
        "url STRING, body STRING",
    )
    out = paginate_query_params(
        spark, pages, ["http://a.test/x"], param="page", by=1, max_pages=3
    )
    urls = [r["url"] for r in out.orderBy("page_ord").collect()]
    assert urls == [
        "http://a.test/x",
        "http://a.test/x?page=1",
        "http://a.test/x?page=2",  # requested, missing -> chain ends
    ]


def test_query_param_non_numeric_reads_as_php_int_cast(spark):
    """(int)'abc' == 0, (int)'7abc' == 7 — set() replaces the raw value."""
    pages = spark.createDataFrame(
        [("http://a.test/x?page=abc", "d"), ("http://a.test/x?page=1", "d")],
        "url STRING, body STRING",
    )
    out = paginate_query_params(
        spark, pages, ["http://a.test/x?page=abc"], param="page", by=1,
        max_pages=2,
    )
    urls = [r["url"] for r in out.orderBy("page_ord").collect()]
    assert urls == ["http://a.test/x?page=abc", "http://a.test/x?page=1"]


def test_query_params_multiple_manipulators_in_order(spark):
    """QueryParamsPaginator chains manipulators: increase('page') +
    decrease('offset', 10) both run per getNextRequest."""
    from crawlspark.paginate import decrease, increase

    pages = spark.createDataFrame(
        [
            ("http://a.test/l?page=1&offset=30", "d"),
            ("http://a.test/l?page=2&offset=20", "d"),
        ],
        "url STRING, body STRING",
    )
    out = paginate_query_params(
        spark, pages, ["http://a.test/l?page=1&offset=30"],
        ops=[increase("page"), decrease("offset", 10)], max_pages=5,
    )
    urls = [r["url"] for r in out.orderBy("page_ord").collect()]
    assert urls == [
        "http://a.test/l?page=1&offset=30",
        "http://a.test/l?page=2&offset=20",
        "http://a.test/l?page=3&offset=10",  # requested, missing -> ends
    ]


def test_query_params_in_body_dot_notation(spark):
    """paramsInBody + dot notation: request identity is url+body, the
    nested key renders bracketed (page.number -> page[number]=)."""
    from crawlspark.paginate import increase

    pages = spark.createDataFrame(
        [
            ("http://a.test/s", f"page[number]={p}", "d")
            for p in (1, 2)
        ],
        "url STRING, req_body STRING, body STRING",
    )
    out = paginate_query_params(
        spark, pages, ["http://a.test/s"],
        ops=[increase("page.number", dot=True)],
        params_in_body=True, start_bodies=["page[number]=1"], max_pages=4,
    )
    rows = out.orderBy("page_ord").collect()
    assert [r["req_body"] for r in rows] == [
        "page[number]=1", "page[number]=2", "page[number]=3",
    ]
    assert all(r["url"] == "http://a.test/s" for r in rows)


def test_query_param_name_never_matches_inside_longer_name(spark):
    """increase('page') must not touch 'perpage' (anchored + escaped)."""
    pages = spark.createDataFrame(
        [("http://a.test/l?perpage=10&page=1", "d")], "url STRING, body STRING"
    )
    out = paginate_query_params(
        spark, pages, ["http://a.test/l?perpage=10&page=1"], param="page",
        by=1, max_pages=3,
    )
    urls = [r["url"] for r in out.orderBy("page_ord").collect()]
    assert urls == [
        "http://a.test/l?perpage=10&page=1",
        "http://a.test/l?perpage=10&page=2",
    ]


# ---- regression: cssq attribute/descendant fixes + IsEmptyInJson typing --


def test_cssq_attr_name_anchored():
    # 'href' must not match inside 'data-href' / 'xhref'
    assert cssq._attr(' data-href="#wrong" href="/real"', "href") == "/real"
    assert cssq._attr(' xhref="/no"', "href") is None
    assert cssq._attr(' data-class="item"', "class") is None


def test_cssq_descendant_no_duplicates_and_document_order():
    # nested matching ancestors must yield the element ONCE (CSS semantics)
    els = cssq.find_elements('<div><div><p class="x">t</p></div></div>', "div p")
    assert [i for _t, _a, i in els] == ["t"]
    src = '<div><p>a</p><div><p>b</p></div></div><div><p>c</p></div>'
    assert [i for _t, _a, i in cssq.find_elements(src, "div p")] == ["a", "b", "c"]


def test_is_empty_in_json_string_vs_typed(spark):
    """PHP empty(): typed false/null/0/[] stop, but the STRINGS "false" /
    "null" / "0.1" are non-empty and must continue (variant round-trip
    disambiguates what get_json_object cannot)."""
    from crawlspark.paginate import IsEmptyInJsonRule

    rule = IsEmptyInJsonRule("items")
    rows = [
        ('{"items": false}', True), ('{"items": null}', True),
        ('{"items": 0}', True), ('{"items": "0"}', True),
        ('{"items": []}', True), ('{"items": {}}', True),
        ('{"items": ""}', True), ('{"x": 1}', True),
        ('{"items": "false"}', False), ('{"items": "null"}', False),
        ('{"items": [0]}', False), ('{"items": "ok"}', False),
        ('{"items": 5}', False),
    ]
    df = spark.createDataFrame([(b,) for b, _ in rows], "body STRING")
    got = [
        bool(r.s) for r in df.select(
            rule.stop_col(F.col("body")).alias("s")).collect()
    ]
    assert got == [e for _, e in rows]
