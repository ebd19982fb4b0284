"""Robots wildcard rules (* spans, $ anchors) + ignoreWildcardRules mode.

Reference: RobotsTxtHandler.php:26-57 (ignoreWildcardRules) and the
Google-robots pattern semantics of the underlying parser."""

from pyspark.sql import functions as F

from crawlspark import robots


def _gate(spark, rules, paths, **kw):
    frontier = spark.createDataFrame(
        [("h.test", p) for p in paths], "host STRING, path STRING"
    )
    rules_df = spark.createDataFrame(
        [("h.test", "bot", rules["disallow"], rules.get("allow", []), [])],
        robots.ROBOTS_SCHEMA,
    )
    out = robots.with_robots_allowed(frontier, rules_df, **kw)
    return {r.path: r.robots_allowed for r in out.collect()}

def test_star_spans_segments(spark):
    got = _gate(
        spark, {"disallow": ["/private/*/data"]},
        ["/private/a/data", "/private/a/b/data", "/private/data", "/public/a/data"],
    )
    assert got == {
        "/private/a/data": False,
        "/private/a/b/data": False,
        # '*' spans the empty string, but the '/data' segment still needs
        # its own '/' — '/private/data' leaves only 'data' after the prefix
        "/private/data": True,
        "/public/a/data": True,
    }


def test_dollar_anchors_end(spark):
    got = _gate(
        spark, {"disallow": ["/*.pdf$"]},
        ["/docs/report.pdf", "/docs/report.pdf?dl=1", "/docs/report.pdfx"],
    )
    assert got == {
        "/docs/report.pdf": False,
        "/docs/report.pdf?dl=1": True,
        "/docs/report.pdfx": True,
    }


def test_longest_match_with_wildcards(spark):
    # Allow is longer (more specific) than the wildcard disallow
    got = _gate(
        spark,
        {"disallow": ["/shop/*"], "allow": ["/shop/public/catalog"]},
        ["/shop/secret", "/shop/public/catalog"],
    )
    assert got == {"/shop/secret": False, "/shop/public/catalog": True}


def test_ignore_wildcard_rules_mode(spark):
    got = _gate(
        spark, {"disallow": ["/a/*", "/b"]},
        ["/a/x", "/b/x"],
        ignore_wildcard_rules=True,
    )
    # the wildcard rule is skipped entirely; the plain prefix still applies
    assert got == {"/a/x": True, "/b/x": False}


def test_dollar_without_star_is_exact_match(spark):
    # Google semantics: 'Disallow: /a$' matches ONLY the exact path '/a' —
    # the old startswith+endswith heuristic wrongly blocked '/ab/a'
    got = _gate(
        spark, {"disallow": ["/a$"]},
        ["/a", "/ab/a", "/a/b", "/xa"],
    )
    assert got == {"/a": False, "/ab/a": True, "/a/b": True, "/xa": True}


def test_dollar_with_star_anchors_last_occurrence(spark):
    # '/a*b$' on '/axbyb': the '*' must span to the FINAL 'b' — a
    # leftmost-greedy fold of the last segment would miss this match
    got = _gate(
        spark, {"disallow": ["/a*b$"]},
        ["/axbyb", "/axb/c", "/ab"],
    )
    assert got == {"/axbyb": False, "/axb/c": True, "/ab": False}


def test_dollar_segments_must_fit_before_anchor(spark):
    # '/ab*b$' needs a 'b' at the end AFTER the '/ab' prefix — '/ab' alone
    # cannot satisfy both (overlap is not allowed)
    got = _gate(spark, {"disallow": ["/ab*b$"]}, ["/ab", "/abxb", "/abb"])
    assert got == {"/ab": True, "/abxb": False, "/abb": False}


def test_plain_prefixes_unchanged(spark):
    got = _gate(
        spark, {"disallow": ["/private"], "allow": ["/private/ok"]},
        ["/private/x", "/private/ok/y", "/robots.txt"],
    )
    assert got == {
        "/private/x": False,
        "/private/ok/y": True,
        "/robots.txt": True,  # always allowed
    }


def test_multi_user_agent_groups_no_row_duplication(spark):
    """A host with several user-agent groups must produce ONE verdict per
    frontier row (regression: the host-only join duplicated every row) and
    the applicable group must be the crawler's (longest token, '*'
    fallback)."""
    frontier = spark.createDataFrame(
        [("h.test", "/a"), ("h.test", "/x")], "host STRING, path STRING"
    )
    rules = spark.createDataFrame(
        [
            ("h.test", "*", ["/x"], [], []),
            ("h.test", "mybot", ["/a"], [], []),
        ],
        robots.ROBOTS_SCHEMA,
    )
    # crawler UA contains 'mybot' -> the named group applies, not '*'
    out = robots.with_robots_allowed(
        frontier, rules, user_agent="Mozilla/5.0 (compatible; MyBot/1.0)"
    )
    got = {r.path: r.robots_allowed for r in out.collect()}
    assert out.count() == 2  # no duplication
    assert got == {"/a": False, "/x": True}
    # UA with no named match -> '*' group
    out2 = robots.with_robots_allowed(frontier, rules, user_agent="OtherBot")
    got2 = {r.path: r.robots_allowed for r in out2.collect()}
    assert out2.count() == 2
    assert got2 == {"/a": True, "/x": False}
    # user_agent=None merges all groups, still one row per frontier row
    out3 = robots.with_robots_allowed(frontier, rules)
    assert out3.count() == 2
    assert {r.path: r.robots_allowed for r in out3.collect()} == {
        "/a": False, "/x": False,
    }


def test_consecutive_stars_do_not_reset_position(spark):
    """'/abc**a' must NOT match '/abc' (regression: an empty '*'-segment
    reset the fold to position 1 and refound earlier text)."""
    got = _gate(
        spark, {"disallow": ["/abc**a"]}, ["/abc", "/abcza", "/zabc"]
    )
    assert got == {"/abc": True, "/abcza": False, "/zabc": True}


def test_robots_txt_always_allowed_even_with_query(spark):
    """'/robots.txt' stays reachable under 'Disallow: /' even when the
    path column carries a query string (crawl_site feeds path+query for
    Google-style matching; regression: the exact-equality clause missed)."""
    got = _gate(
        spark, {"disallow": ["/"]},
        ["/robots.txt", "/robots.txt?token=1", "/page"],
    )
    assert got == {
        "/robots.txt": True,
        "/robots.txt?token=1": True,
        "/page": False,
    }


def test_query_string_participates_in_matching(spark):
    """Google robots semantics match against path+query: a frontier whose
    path column carries '?query' must hit 'Disallow: /*?sessionid=' rules."""
    got = _gate(
        spark, {"disallow": ["/*?sessionid="]},
        ["/p?sessionid=1", "/p", "/p?other=1"],
    )
    assert got == {"/p?sessionid=1": False, "/p": True, "/p?other=1": True}
