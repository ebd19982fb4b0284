"""Round-2 part-8 operators: soft-404, link farms, caption-aware
image representative selection."""

from pyspark.sql import functions as F

from crawlspark.textops.quality import link_farm_signals, soft404_signals


def test_soft404_matrix(spark):
    rows = [
        (1, 200, "<html><body>Page not found</body></html>", True),
        (2, 404, "<html><body>Page not found</body></html>", False),
        (3, 200, "<html><body>a real short page</body></html>", False),
        (4, 200, "<html><title>Oops 404</title><body>"
                 + "x " * 400 + "page not found</body></html>", True),
        (5, 200, "<html><body>" + "x " * 400 + "fine</body></html>", False),
    ]
    df = spark.createDataFrame(
        [(i, s, b) for i, s, b, _ in rows],
        "doc_id LONG, status INT, body STRING")
    out = {r.doc_id: r.soft404 for r in soft404_signals(df).collect()}
    for i, _, _, exp in rows:
        assert out[i] is exp, i


def test_link_farm_requires_all_three(spark):
    df = spark.createDataFrame(
        # (links, hosts, chars): farm needs >=50 links, <=10% diversity,
        # <20 chars/link
        [(1, 100, 5, 500),    # all three -> farm
         (2, 100, 50, 500),   # diverse hub -> clean
         (3, 100, 5, 5000),   # rich text -> clean
         (4, 10, 1, 0)],      # few links -> clean
        "doc_id LONG, n_links LONG, n_link_hosts LONG, n_chars LONG")
    out = {r.doc_id: r for r in link_farm_signals(df).collect()}
    assert out[1].is_link_farm is True
    assert out[2].is_link_farm is False
    assert out[3].is_link_farm is False
    assert out[4].is_link_farm is False
    assert out[1].host_diversity_permille == 50
    assert out[1].chars_per_link == 5


def test_percent_normalize_rfc_cases(spark):
    from crawlspark.canon import normalize_percent_encoding
    cases = [
        ("http://h/%41%7e?q=%3f", "http://h/A~?q=%3F"),
        ("http://h/%zz%4", "http://h/%zz%4"),       # malformed untouched
        ("plain", "plain"),
        ("http://h/a%2Fb%2d", "http://h/a%2Fb-"),   # reserved kept, - decodes
        ("%2500", "%2500"),  # %25 is reserved ('%') -> stays; '00' literal
    ]
    df = spark.createDataFrame(cases, "u STRING, exp STRING")
    rows = df.select(
        "exp", normalize_percent_encoding(F.col("u")).alias("got")
    ).collect()
    for r in rows:
        assert r.got == r.exp, r


def test_remove_dot_segments_rfc_cases(spark):
    from crawlspark.canon import remove_dot_segments
    cases = [
        ("/a/./b/../c", "/a/c"), ("/../a", "/a"), ("/a/b/../../c", "/c"),
        ("/a/b/c/..", "/a/b/"), ("/./x", "/x"), ("/a/../../b", "/b"),
        ("/", "/"), ("/a/..", "/"),
    ]
    df = spark.createDataFrame(cases, "p STRING, exp STRING")
    rows = df.select(
        "exp", remove_dot_segments(F.col("p")).alias("got")
    ).collect()
    for r in rows:
        assert r.got == r.exp, r
