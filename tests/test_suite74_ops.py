"""Edge-case tests for suite74 ops: sourceless picture, srcless
iframes, unknown policy tokens."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.extract import (iframe_audit, picture_sources,
                                referrer_policy_audit)


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_picture_fallback_only(spark):
    body = '<picture><img src="/only.jpg"></picture>'
    df = spark.createDataFrame([(body,)], "body string")
    rows = df.select(F.explode(picture_sources(F.col("body")))
                     .alias("s")).select("s.*").collect()
    assert len(rows) == 1
    assert rows[0].mime == "fallback" and rows[0].url == "/only.jpg"
    assert rows[0].source_ord == 0


def test_iframe_srcless_not_third_party(spark):
    body = ("<iframe></iframe>"
            '<iframe src="/relative"></iframe>'
            '<iframe SRC="HTTPS://Other.NET/x"></iframe>')
    df = spark.createDataFrame([(body, "me.com")],
                               "body string, host string")
    r = df.select(iframe_audit(F.col("body"), F.col("host"))
                  .alias("a")).collect()[0].a
    assert r.n_iframes == 3
    assert r.n_third_party == 1   # relative/srcless are first-party-ish


def test_referrer_unknown_token_not_leaky(spark):
    df = spark.createDataFrame(
        [('<meta name="referrer" content="origin, unsafe-url">',)],
        "body string")
    r = df.select(referrer_policy_audit(F.col("body")).alias("r")) \
        .collect()[0].r
    # a multi-token value is not a single known policy; never leaky
    assert r.known is False and r.leaky is False
