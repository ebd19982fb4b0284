"""Edge-case tests for suite67 ops: render triage on styles, NXDOMAIN
TTL expiry + recovery, robots-meta first-tag-wins, filename querystring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.browser import render_budget_classifier
from crawlspark.mmcurate import caption_filename_agreement
from crawlspark.politeness import nxdomain_cache_plan
from crawlspark.robots import robots_meta_image_policy


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_render_style_contents_not_text(spark):
    body = ("<style>body { color: red; font: whatever; }</style>"
            "<p>hi</p>")
    r = render_budget_classifier(
        spark.createDataFrame([(body,)], "body string")).collect()[0]
    # style contents must not count as visible text
    assert r.text_permille < 100
    assert not r.needs_render  # no scripts, no empty mount


def test_nxdomain_ttl_expiry_and_recovery(spark):
    rows = [
        ("h", 0, "nxdomain"),
        ("h", 100, "noerror"),    # suppressed (within 300)
        ("h", 500, "noerror"),    # TTL expired -> wire
        ("h", 501, "nxdomain"),   # fresh negative
        ("h", 600, "noerror"),    # suppressed again
    ]
    df = spark.createDataFrame(rows, "host string, ts long, rcode string")
    r = nxdomain_cache_plan(df, neg_ttl=300).collect()[0]
    assert r.n_lookups == 5 and r.n_nxdomain == 2
    assert r.n_suppressed == 2


def test_robots_meta_first_tag_wins(spark):
    body = ('<meta name="robots" content="noindex">'
            '<meta name="robots" content="max-image-preview:large">')
    r = robots_meta_image_policy(
        spark.createDataFrame([(body,)], "body string")).collect()[0]
    assert r.noindex and r.max_image_preview is None
    assert not r.image_usable


def test_caption_filename_query_and_fragment(spark):
    df = spark.createDataFrame(
        [("http://h/a/red-fox.jpg?w=300#frag", "red fox")],
        "image_url string, caption string")
    r = caption_filename_agreement(df).collect()[0]
    assert r.n_file_tokens == 2 and r.n_overlap == 2
    assert r.overlap_permille == 1000
