"""Edge-case tests for suite83 ops: multiple barriers at once, rel
token word-boundaries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.extract import access_barriers, link_rel_rollup


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_barriers_stack(spark):
    body = ('<div class="cf-turnstile"></div>'
            '<script src="https://cdn.cookielaw.org/otSDKStub.js">'
            "</script>")
    df = spark.createDataFrame([(body,)], "body string")
    r = df.select(access_barriers(F.col("body")).alias("b")) \
        .collect()[0].b
    assert r.challenge and r.consent_cmp and not r.clean


def test_rel_token_boundaries(spark):
    # 'nofollower' must not count as nofollow
    body = ('<a rel="nofollower" href="/a">x</a>'
            '<a rel="external nofollow" href="/b">y</a>')
    df = spark.createDataFrame([(body,)], "body string")
    r = df.select(link_rel_rollup(F.col("body")).alias("r")) \
        .collect()[0].r
    assert r.n_links == 2 and r.n_nofollow == 1
    assert r.followed_permille == 500
