"""Edge-case tests for suite80 ops: chunk extensions and CRLF
violations, double-compression sniff, date clamping."""

from __future__ import annotations

import pytest

from crawlspark.fetch import (chunked_framing_check,
                              encoding_mismatch_audit,
                              retry_after_parse)


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_chunked_missing_crlf_after_data(spark):
    bad = b"3\r\nabcXX0\r\n\r\n"   # data not followed by CRLF
    df = spark.createDataFrame([(1, bad)], "id long, bytes binary")
    r = chunked_framing_check(df).collect()[0]
    assert r.chunked_malformed == 1
    assert r.chunked_complete == 0


def test_encoding_zstd_declared_match(spark):
    df = spark.createDataFrame(
        [(1, "zstd", bytes.fromhex("28b52ffd2400"))],
        "id long, content_encoding string, bytes binary")
    r = encoding_mismatch_audit(df).collect()[0]
    assert r.encoding_verdict == "match"


def test_retry_after_null_header(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "  15  ")],
        "id long, retry_after string")
    got = {r.id: r for r in retry_after_parse(df, now_ts=0).collect()}
    assert got[1].retry_after_s is None
    assert got[1].retry_after_form is None
    assert got[2].retry_after_s == 15   # whitespace-trimmed seconds
