"""Edge-case tests for suite63 ops: hopping-window boundary rows,
decay clamps, prefix-rollup cap, novelty set semantics."""

from __future__ import annotations

import pytest

from crawlspark.canon import url_prefix_rollup
from crawlspark.scheduler import halflife_decay_scores
from crawlspark.streaming import hopping_window_counts
from crawlspark.textops.quality import gram_novelty


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_hopping_window_boundaries(spark):
    # len 300 hop 60: event at t=300 covers starts 60..300, NOT 0
    df = spark.createDataFrame([("k", 300)], "host string, ts long")
    got = sorted(r.window_start for r in
                 hopping_window_counts(df, window_len=300, hop=60)
                 .collect())
    assert got == [60, 120, 180, 240, 300]
    # event at a window start lands in exactly len/hop windows
    df2 = spark.createDataFrame([("k", 0)], "host string, ts long")
    got2 = sorted(r.window_start for r in
                  hopping_window_counts(df2, window_len=300, hop=60)
                  .collect())
    assert got2 == [-240, -180, -120, -60, 0]


def test_decay_clamps(spark):
    rows = [("h", 0), ("h", -100 * 86400 * 100)]  # ancient -> weight 0
    df = spark.createDataFrame(rows, "host string, ts long")
    r = halflife_decay_scores(df, now_ts=63 * 86400 + 1,
                              halflife=86400).collect()[0]
    # ts=0 -> n=63 -> beyond 62 half-lives -> 0; ancient -> 0
    assert r.score_micro == 0 and r.n_events == 2


def test_prefix_rollup_depth_cap_and_root(spark):
    urls = spark.createDataFrame(
        [("http://x.com/a/b/c/d/e",), ("http://x.com/",),
         ("http://x.com",)], "url string")
    got = {(r.prefix, r.depth): r.n_urls
           for r in url_prefix_rollup(urls, max_depth=3).collect()}
    assert got[("/", 0)] == 3            # root covers every URL
    assert got[("/a/b/c", 3)] == 1       # capped at depth 3
    assert ("/a/b/c/d", 4) not in got


def test_gram_novelty_repeat_within_doc(spark):
    # doc 1 repeats its own phrase: set semantics keep it novel
    docs = spark.createDataFrame(
        [(1, "x y z x y z"), (2, "p q r s")],
        "doc_id long, text string")
    got = {r.id: r for r in gram_novelty(docs, n=3).collect()}
    assert got[1].n_grams == 3           # distinct grams: xyz, yzx, zxy
    assert got[1].n_novel == 3
    assert got[1].novelty_permille == 1000
    assert got[2].novelty_permille == 1000
