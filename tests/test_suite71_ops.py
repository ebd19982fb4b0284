"""Edge-case tests for suite71 ops: canonical cap/dangling, PDF edge
markers, ZIP comment bounds, lint leniency parity."""

from __future__ import annotations

import struct

import pytest

from crawlspark.linkgraph import canonical_chain_resolve
from crawlspark.media import pdf_sniff, zip_eocd_sniff
from crawlspark.robots import robots_lint


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_canonical_dangling_and_cap(spark):
    pages = spark.createDataFrame([
        ("a", "b"),                 # b has no row -> terminal after 1 hop
        ("c1", "c2"), ("c2", "c3"), ("c3", "c4"), ("c4", "c5"),
        ("c5", "c6"),               # 5-deep chain, cap 4 -> dangling_cap
    ], "url string, canonical string")
    got = {r.url: r for r in
           canonical_chain_resolve(pages, max_hops=4).collect()}
    assert got["a"].status == "direct" and got["a"].final_url == "b"
    assert got["c1"].status == "dangling_cap" and got["c1"].hops == 4
    # c2 reaches c6 in exactly max_hops hops: the walk cannot know c6
    # is terminal without one more probe -> honest dangling_cap
    assert got["c2"].status == "dangling_cap"
    assert got["c2"].final_url == "c6" and got["c2"].hops == 4
    # c3 resolves in 3 hops with a spare iteration to confirm terminal
    assert got["c3"].status == "chain" and got["c3"].final_url == "c6"
    assert got["c3"].hops == 3


def test_pdf_eof_only_near_end(spark):
    # %%EOF buried early then 3 KB of junk -> NOT in the tail window
    body = b"%PDF-1.5\n%%EOF\n" + b"x" * 3000
    df = spark.createDataFrame([(1, body)], "id long, bytes binary")
    r = pdf_sniff(df).collect()[0]
    assert r.pdf_version == "1.5" and r.pdf_has_eof == 0


def test_zip_eocd_not_in_last_kb(spark):
    eocd = (b"PK\x05\x06" + b"\x00" * 4
            + struct.pack("<HHIIH", 2, 2, 10, 20, 0))
    body = b"PK\x03\x04" + eocd + b"\x00" * 2048  # EOCD pushed out
    df = spark.createDataFrame([(1, body)], "id long, bytes binary")
    r = zip_eocd_sniff(df).collect()[0]
    assert r.zip_eocd_found == 0 and r.zip_n_entries is None


def test_robots_lint_comments_not_directives(spark):
    robots = spark.createDataFrame(
        [("h", "# just a comment\nUser-agent: *\nDisallow: /a # tail\n")],
        "host string, body string")
    r = robots_lint(robots).collect()[0]
    assert r.n_directives == 2 and r.n_unknown == 0
    assert r.n_rules_before_group == 0
