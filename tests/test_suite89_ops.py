"""Tests for WAT records and the decode-bomb admission gate."""

import json

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_to_wat_escaping_and_empty(spark):
    from crawlspark.warc import to_wat

    df = spark.createDataFrame([
        Row(url="u1", body='<title>He said "hi" & left</title>'),
        Row(url="u2", body="<p>no title no links</p>"),
        Row(url="u3", body=None),
        Row(url="u4",
            body='<TITLE>UPPER</TITLE><a id="k" href="/x">l</a>'),
    ])
    out = {r.url: r for r in to_wat(df).collect()}
    # real JSON escaping via to_json: the quoted title round-trips
    env = json.loads(out["u1"].wat_json)
    assert env["Title"] == 'He said "hi" & left'
    assert env["Links"] == []
    assert out["u2"].title == "" and out["u2"].n_links == 0
    assert json.loads(out["u2"].wat_json)["Title"] == ""
    assert out["u3"].n_links == 0
    # case-insensitive title tag, attr-carrying anchor
    assert out["u4"].title == "UPPER"
    assert json.loads(out["u4"].wat_json)["Links"] == ["/x"]


def test_decode_admission_boundaries(spark):
    from crawlspark.images import decode_admission

    rows = [
        # exactly max_expansion (1000x): 3000 bytes decoded from 3 -> admit
        Row(i=0, w=100, h=10, n_bytes=3),
        # one byte less encoded -> strictly above 1000x -> reject
        Row(i=1, w=100, h=10, n_bytes=2),
        # exactly 50 MP -> admit (strictly-greater rule)
        Row(i=2, w=10_000, h=5_000, n_bytes=100_000_000),
        Row(i=3, w=10_001, h=5_000, n_bytes=100_000_000),
        # zero-byte payload: greatest() guard avoids div-by-zero shapes
        Row(i=4, w=100, h=100, n_bytes=0),
    ]
    out = {r.i: r for r in decode_admission(
        spark.createDataFrame(rows), nbytes_col="n_bytes").collect()}
    assert out[0].admission == "admit"
    assert out[1].admission == "reject_expansion"
    assert out[2].admission == "admit"
    assert out[3].admission == "reject_too_large"
    assert out[4].admission == "reject_expansion"
    assert out[4].suspicious_ratio is True
