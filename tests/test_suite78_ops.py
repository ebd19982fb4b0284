"""Edge-case tests for suite78 ops: text-vs-binary heuristic, title
LCP safety on single page, emoji on pure-ASCII."""

from __future__ import annotations

import pytest

from crawlspark.extract import title_template_suffix
from crawlspark.media import web_asset_sniff
from crawlspark.textops.quality import emoji_density


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_asset_text_requires_printable_start(spark):
    rows = [(1, b"body { x }"), (2, b"\x00body"), (3, b"a\tb\nc")]
    df = spark.createDataFrame(rows, "id long, bytes binary")
    got = {r.id: r.asset_kind for r in web_asset_sniff(df).collect()}
    assert got[1] == "text" and got[3] == "text"
    assert got[2] == "binary"


def test_title_template_identical_titles(spark):
    # all pages share the WHOLE title: suffix = the title itself
    df = spark.createDataFrame(
        [("h", "Same Title")] * 4, "host string, title string")
    r = title_template_suffix(df).collect()[0]
    assert r.template_suffix == "Same Title"
    assert r.suffix_len == 10


def test_emoji_ascii_zero(spark):
    df = spark.createDataFrame([(1, "plain ascii text only")],
                               "doc_id long, text string")
    r = emoji_density(df).collect()[0]
    assert r.n_emoji == 0 and r.emoji_permille == 0
