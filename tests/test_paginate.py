"""Http::paginate follow-next-link chains (SimpleWebsitePaginator)."""

from crawlspark.paginate import paginate_site


def _page(url, next_url=None):
    nxt = f'<a rel="next" href="{next_url}">next</a>' if next_url else ""
    return (url, 200, None, "text/html", f"<html><body>content {nxt}</body></html>")


def test_paginate_follows_next_until_end(spark):
    b = "http://s.test"
    rows = [
        _page(f"{b}/list?p=1", f"{b}/list?p=2"),
        _page(f"{b}/list?p=2", f"{b}/list?p=3"),
        _page(f"{b}/list?p=3", None),
        _page(f"{b}/other?p=1", f"{b}/other?p=2"),
        _page(f"{b}/other?p=2", None),
    ]
    pages = spark.createDataFrame(
        rows, "url STRING, status INT, redirect_to STRING, content_type STRING, body STRING"
    )
    out = paginate_site(spark, pages, [f"{b}/list?p=1", f"{b}/other?p=1"])
    got = sorted((r.chain_id, r.page_ord, r.url) for r in out.collect())
    assert got == [
        (0, 0, f"{b}/list?p=1"), (0, 1, f"{b}/list?p=2"), (0, 2, f"{b}/list?p=3"),
        (1, 0, f"{b}/other?p=1"), (1, 1, f"{b}/other?p=2"),
    ]


def test_paginate_max_pages_cap(spark):
    b = "http://s.test"
    # a cycle: p1 -> p2 -> p1 ... maxPages must stop it
    rows = [_page(f"{b}/a", f"{b}/b"), _page(f"{b}/b", f"{b}/a")]
    pages = spark.createDataFrame(
        rows, "url STRING, status INT, redirect_to STRING, content_type STRING, body STRING"
    )
    out = paginate_site(spark, pages, [f"{b}/a"], max_pages=5)
    assert out.count() == 5
