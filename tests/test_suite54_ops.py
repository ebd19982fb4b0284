"""Edge cases for the round-3 extraction/maintenance operators beyond
the constructed gate families."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.checkpoint import snapshot_expiry
from crawlspark.extract import css_background_images
from crawlspark.fetch import parse_link_headers
from crawlspark.mmcurate import caption_consensus


def test_css_bg_images_edges(spark):
    pages = spark.createDataFrame(
        [
            (0, "<html><body>no styles at all</body></html>"),
            (1, '<style>.x{background:url(/a.png)}</style>'
                '<style>.y{background-image: url( "/b.png" )}</style>'),
            (2, '<div style="background: url(data:image/png;base64,AAA)">'
                "</div>"),
        ],
        "doc_id long, body string")
    rows = css_background_images(pages).collect()
    got = {(r.doc_id, r.css_url, r.css_source) for r in rows}
    assert got == {
        (1, "/a.png", "style_block"),
        (1, "/b.png", "style_block"),
    }  # imageless page yields nothing; data: URI dropped


def test_parse_link_headers_quoted_comma_and_empty(spark):
    hdr = ('</a>; rel=prev; title="one, two", '
           "<https://h/b.avif>; as=image; rel=preload")
    df = spark.createDataFrame(
        [(0, hdr), (1, "")], "doc_id long, link_header string")
    rows = parse_link_headers(df).collect()
    by = {(r.doc_id, r.ord): r for r in rows}
    assert set(by) == {(0, 0), (0, 1)}  # empty header -> no rows
    assert by[(0, 0)].link_rel == "prev"
    assert by[(0, 0)].link_url == "/a"  # comma inside quoted title kept
    assert (by[(0, 1)].link_rel, by[(0, 1)].link_as) == ("preload", "image")


def test_caption_consensus_tie_lexicographic(spark):
    imgs = spark.createDataFrame(
        [(1, 7, "zebra"), (2, 7, "zebra"), (3, 7, "apple"), (4, 7, "apple"),
         (5, 8, "only")],
        "image_id long, phash long, caption string")
    out = {r.phash: r for r in caption_consensus(imgs).collect()}
    assert out[7].consensus_caption == "apple"  # 2-2 tie -> lexicographic
    assert out[7].conflict and out[7].support_permille == 500
    assert out[8].consensus_caption == "only"
    assert not out[8].conflict and out[8].support_permille == 1000


def test_snapshot_expiry_keep_last_overrides_horizon(spark):
    # ALL snapshots are older than the horizon, but keep_last=2 keeps
    # the two newest alive: files referenced only by them must survive
    snaps = spark.createDataFrame(
        [(s, 10 * s) for s in range(4)], "snapshot_id long, commit_ts long")
    files = spark.createDataFrame(
        [("old", 0), ("old", 1), ("new", 3), ("mixed", 0), ("mixed", 2)],
        "file_id string, snapshot_id long")
    out = {r.file_id: r for r in snapshot_expiry(
        snaps, files, horizon_ts=1000, keep_last=2).collect()}
    assert out["old"].orphaned and out["old"].n_live_refs == 0
    assert not out["new"].orphaned
    assert not out["mixed"].orphaned and out["mixed"].n_live_refs == 1
