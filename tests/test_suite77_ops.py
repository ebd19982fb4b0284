"""Edge-case tests for suite77 ops: ads.txt field trimming, manifest
without icons, TTR window boundary, llms.txt Optional-at-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.extract import webmanifest_icons
from crawlspark.robots import parse_ads_txt, parse_llms_txt
from crawlspark.textops.quality import ttr_windowed


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_ads_txt_trim_and_inline_comment(spark):
    body = "  google.com ,  pub-1 , DIRECT  # main partner\n"
    df = spark.createDataFrame([("h", body)], "host string, body string")
    r = parse_ads_txt(df).collect()[0]
    assert (r.ad_system, r.publisher_id, r.relationship) == \
        ("google.com", "pub-1", "DIRECT")
    assert not r.has_cert


def test_webmanifest_no_icons_key(spark):
    df = spark.createDataFrame([('{"name": "X"}',)], "m string")
    r = df.select(webmanifest_icons(F.col("m")).alias("w")).collect()[0].w
    assert r.name == "X" and r.n_icons == 0
    assert r.best_icon_src is None


def test_ttr_detects_repetition(spark):
    rep = " ".join(["loop word"] * 50)          # 100 tokens, 2 types
    # letters-only tokens (digits are stripped by the tokenizer)
    div = " ".join(chr(97 + i // 26) + chr(97 + i % 26)
                   for i in range(100))
    df = spark.createDataFrame([(1, rep), (2, div)],
                               "doc_id long, text string")
    got = {r.id: r for r in ttr_windowed(df, window=50).collect()}
    assert got[1].mattr_permille == 40    # 2/50
    assert got[2].mattr_permille == 1000
    assert got[1].n_windows == 2


def test_llms_txt_optional_last_section(spark):
    body = ("# T\n## A\n[x](u)\n## Optional\n[y](v)\n[z](w)\n")
    df = spark.createDataFrame([("h", body)], "host string, body string")
    r = parse_llms_txt(df).collect()[0]
    assert r.n_sections == 2 and r.n_links == 3
    assert r.n_optional_links == 2
