"""Edge-case tests for suite61 ops: ragged/nested-ish tables, n-gram
span islands with duplicate grams, Host directive validity, IHDR
legality table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.extract import html_tables
from crawlspark.images import png_ihdr_validity
from crawlspark.robots import parse_host_directive
from crawlspark.textops.dedup import ngram_span_overlap


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_html_tables_ragged_and_attrs(spark):
    body = ("<TABLE border=1><tr><td>a</td><td>b</td><td>c</td></tr>"
            "<tr><td>d</td></tr></table>"
            "<table><tr><th colspan=2>h</th></tr></table>")
    df = spark.createDataFrame([(body,)], "body string")
    rows = df.select(F.explode(html_tables(F.col("body"))).alias("c")) \
        .select("c.*").collect()
    got = {(r.table_ord, r.row_ord, r.col_ord): r.cell for r in rows}
    assert got[(0, 0, 0)] == "a" and got[(0, 0, 2)] == "c"
    assert got[(0, 1, 0)] == "d"
    assert got[(1, 0, 0)] == "h"
    assert len(rows) == 5


def test_ngram_span_duplicate_grams(spark):
    # doc 1 repeats the same 3 words twice; doc 2 contains them once ->
    # two diagonals, each a run of 1; distinct grams 1, matches 2
    docs = spark.createDataFrame(
        [(1, "p q r p q r"), (2, "z p q r z")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = ngram_span_overlap(docs, pairs, n=3).collect()[0]
    assert r.n_distinct_grams == 1
    assert r.n_matches == 2
    assert r.longest_run == 1
    # a pair with nothing shared reports zeros
    pairs0 = spark.createDataFrame([(2, 1)], "id_a long, id_b long")
    docs0 = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string")
    r0 = ngram_span_overlap(docs0, pairs0, n=3).collect()[0]
    assert (r0.n_matches, r0.longest_run) == (0, 0)


def test_host_directive_validity(spark):
    robots = spark.createDataFrame([
        ("a.com", "Host: ok.example\n"),
        ("b.com", "Host: two words\nHost: later.example\n"),  # 2nd wins
        ("c.com", "# Host: commented.example\n"),
        ("d.com", "HOST: HTTP://UP.EXAMPLE:80\n"),
    ], "host string, body string")
    got = {r.host: r.canonical_host
           for r in parse_host_directive(robots).collect()}
    assert got == {"a.com": "ok.example", "b.com": "later.example",
                   "d.com": "up.example"}


def test_png_ihdr_legal_table(spark):
    import struct

    def png(depth, color):
        return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + struct.pack(">IIBBBBB", 1, 1, depth, color, 0, 0, 0)
                + b"\0\0\0\0")

    rows = [(f"{d}-{c}", png(d, c))
            for d in (1, 2, 4, 8, 16) for c in (0, 2, 3, 4, 6)]
    df = spark.createDataFrame(rows, "id string, bytes binary")
    got = {r.id: r.ihdr_valid for r in png_ihdr_validity(df).collect()}
    legal = {0: {1, 2, 4, 8, 16}, 2: {8, 16}, 3: {1, 2, 4, 8},
             4: {8, 16}, 6: {8, 16}}
    for d in (1, 2, 4, 8, 16):
        for c in (0, 2, 3, 4, 6):
            assert got[f"{d}-{c}"] == (d in legal[c]), (d, c)
