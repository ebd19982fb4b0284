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
