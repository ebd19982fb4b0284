"""Edge-case tests for suite72 ops: budget boundary, abstention-only
images, tolerance band, unseen templates."""

from __future__ import annotations

import pytest

from crawlspark.images import declared_dims_mismatch
from crawlspark.mmcurate import clip_caption_budget, image_inbound_alt_consensus
from crawlspark.scheduler import template_cost_estimate


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_clip_budget_boundary(spark):
    caps = [("one two three",), ("a b c d e",), ("",)]
    df = spark.createDataFrame(caps, "caption string")
    got = {r.caption: r for r in
           clip_caption_budget(df, budget=5).collect()}
    assert not got["one two three"].truncated
    assert got["a b c d e"].n_tokens == 5
    assert not got["a b c d e"].truncated     # exactly at budget
    assert got[""].n_tokens == 0 and got[""].kept_text == ""


def test_inbound_alt_all_abstain(spark):
    refs = spark.createDataFrame(
        [("i.jpg", ""), ("i.jpg", None), ("i.jpg", "")],
        "image_url string, alt string")
    r = image_inbound_alt_consensus(refs).collect()[0]
    assert r.n_refs == 3 and r.n_alts == 0
    assert r.top_alt is None and r.top_alt_share_permille is None


def test_dims_tolerance_band(spark):
    df = spark.createDataFrame(
        [(1, 800, 600, 801, 600), (2, 800, 600, 810, 600)],
        "id long, attr_w long, attr_h long, sniff_w long, sniff_h long")
    exact = {r.id: r.dims_verdict
             for r in declared_dims_mismatch(df).collect()}
    assert exact[1] == "mismatch"     # default is exact equality
    tol = {r.id: r.dims_verdict
           for r in declared_dims_mismatch(
               df, tolerance_permille=5).collect()}
    assert tol[1] == "match"          # 1px inside the 0.5% band
    assert tol[2] == "mismatch"       # 10px outside it


def test_template_cost_default_for_unseen(spark):
    hist = spark.createDataFrame(
        [("h.com", "http://h.com/a/1", 100),
         ("h.com", "http://h.com/a/2", 300)],
        "host string, url string, n_bytes long")
    frontier = spark.createDataFrame(
        [("h.com", "http://h.com/a/99"), ("h.com", "http://h.com/b/1"),
         ("x.com", "http://x.com/a/1")],
        "host string, url string")
    got = {r.url: r for r in
           template_cost_estimate(frontier, hist,
                                  default_bytes=7).collect()}
    assert got["http://h.com/a/99"].est_bytes == 200
    assert got["http://h.com/a/99"].from_history
    assert got["http://h.com/b/1"].est_bytes == 7
    # same template, different host: history must NOT leak across hosts
    assert got["http://x.com/a/1"].est_bytes == 7
