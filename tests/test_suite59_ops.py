"""Edge-case tests for suite59 ops: Clean-param positions/escaping,
Flesch floors, assortativity degenerate cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.linkgraph import degree_assortativity
from crawlspark.robots import apply_clean_params, parse_clean_params
from crawlspark.textops.quality import flesch_reading_ease


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_clean_param_positions_escape_fragment(spark):
    robots = spark.createDataFrame(
        [("h.com", "Clean-param: sid&ids[] /\nclean-param: ref /x/\n")],
        "host string, body string")
    d = parse_clean_params(robots)
    rows = {(r.param, r.path_prefix) for r in d.collect()}
    assert rows == {("sid", "/"), ("ids[]", "/"), ("ref", "/x/")}

    urls = spark.createDataFrame([
        ("http://h.com/a?sid=1",),                 # lone -> '?' dropped
        ("http://h.com/a?sid=1#frag",),            # lone before fragment
        ("http://h.com/a?sid=1&b=2",),             # first of several
        ("http://h.com/a?b=2&sid=1&c=3",),         # middle
        ("http://h.com/a?ids[]=4&b=2",),           # regex-hostile name
        ("http://h.com/a?sid=1&ids[]=4&b=2",),     # two params stripped
        ("http://h.com/y?ref=9",),                 # prefix /x/ mismatch
        ("http://h.com/x/y?ref=9",),               # prefix /x/ match
    ], "url string")
    got = {r.url: r for r in apply_clean_params(urls, d).collect()}
    exp = {
        "http://h.com/a?sid=1": ("http://h.com/a", 1),
        "http://h.com/a?sid=1#frag": ("http://h.com/a#frag", 1),
        "http://h.com/a?sid=1&b=2": ("http://h.com/a?b=2", 1),
        "http://h.com/a?b=2&sid=1&c=3": ("http://h.com/a?b=2&c=3", 1),
        "http://h.com/a?ids[]=4&b=2": ("http://h.com/a?b=2", 1),
        "http://h.com/a?sid=1&ids[]=4&b=2": ("http://h.com/a?b=2", 2),
        "http://h.com/y?ref=9": ("http://h.com/y?ref=9", 0),
        "http://h.com/x/y?ref=9": ("http://h.com/x/y", 1),
    }
    for u, (want_url, want_n) in exp.items():
        assert got[u].cleaned_url == want_url, u
        assert got[u].n_stripped == want_n, u


def test_flesch_floors_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, "Dry crypt myth"),      # zero-vowel words floor to 1 syllable
         (2, "no terminal punctuation here"),   # sentence floor 1
         (3, "1234 --- !!!"),        # no words -> NULL score
         (4, "")],
        "doc_id long, text string")
    got = {r.id: r for r in flesch_reading_ease(docs).collect()}
    assert got[1].n_syllables == 3 and got[1].n_sentences == 1
    assert got[2].n_sentences == 1
    assert got[3].n_words == 0 and got[3].fre_milli is None
    assert got[4].fre_milli is None


def test_assortativity_star_and_constant(spark):
    # star: hub -> leaves; every edge pairs out-degree k with in-degree 1
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long")
    r = degree_assortativity(star).collect()[0]
    # constant x (=5) and constant y (=1): zero variance -> NULL
    assert r.r_milli is None and r.m == 5

    # mixed graph has nonzero variance and |r| <= 1
    mixed = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (3, 2)],
        "src long, dst long")
    r2 = degree_assortativity(mixed).collect()[0]
    assert r2.r_milli is not None and -1000 <= r2.r_milli <= 1000
