"""WARC record parsing + SURT/CDX semantics on hand-built archives."""

from pyspark.sql import functions as F

from crawlspark import warc

CR = "\r\n"
CR2 = "\r\n\r\n"


def _archive() -> str:
    info = (
        "WARC/1.0" + CR + "WARC-Type: warcinfo" + CR
        + "WARC-Date: 2026-08-18T00:00:00Z" + CR2
        + "software: crawlspark" + CR2
    )
    req = (
        "WARC/1.0" + CR + "WARC-Type: request" + CR
        + "WARC-Target-URI: https://www.Example.COM/A/B?q=1" + CR2
        + "GET /A/B?q=1 HTTP/1.1" + CR + "Host: www.example.com" + CR2
    )
    resp = (
        "WARC/1.0" + CR + "WARC-Type: response" + CR
        + "WARC-Target-URI: https://www.Example.COM/A/B?q=1" + CR
        + "WARC-Date: 2026-08-18T00:00:01Z" + CR + "Content-Length: 22" + CR2
        + "HTTP/1.1 301 Moved" + CR + "Content-Type: text/html" + CR2
        + "part one" + CR2 + "part two" + CR2  # body with embedded CRLF2
    )
    return info + req + resp


def test_parse_warc_three_record_kinds(spark):
    df = spark.createDataFrame([(1, _archive())], "file_id long, warc string")
    rows = {r["rec_pos"]: r for r in warc.parse_warc(df).collect()}
    assert len(rows) == 3
    info = rows[1]
    assert info["warc_type"] == "warcinfo"
    assert info["target_uri"] is None and info["http_status"] is None
    assert info["body"] == "software: crawlspark"  # raw payload, no HTTP peel
    req = rows[2]
    assert req["warc_type"] == "request"
    assert req["target_uri"] == "https://www.Example.COM/A/B?q=1"
    assert req["http_status"] is None  # request line is not a status line
    assert req["body"].startswith("GET /A/B")
    resp = rows[3]
    assert resp["http_status"] == 301
    assert resp["content_type"] == "text/html"
    assert resp["content_length"] == 22
    # embedded CRLF2 stays in the body; only the record terminator strips
    assert resp["body"] == "part one" + CR2 + "part two"


def test_surt_key_reverses_host_and_lowercases(spark):
    df = spark.createDataFrame(
        [
            ("https://www.Example.COM/A/B?q=1",),
            ("https://example.com",),
            ("http://a.b.co.uk/Path",),
        ],
        "u string",
    )
    got = [r[0] for r in df.select(warc.surt_key(F.col("u"))).collect()]
    assert got == [
        "com,example,www)/a/b",  # query dropped, path lowercased
        "com,example)/",         # empty path -> /
        "uk,co,b,a)/path",
    ]


def test_cdx_index_digests_responses_only(spark):
    df = spark.createDataFrame([(7, _archive())], "file_id long, warc string")
    cdx = warc.cdx_index(warc.parse_warc(df)).collect()
    assert len(cdx) == 1
    r = cdx[0]
    assert r["surt"] == "com,example,www)/a/b"
    assert r["file_id"] == 7 and r["rec_pos"] == 3
    assert r["length"] == len("part one" + CR2 + "part two")
    assert r["digest"] is not None


def test_parse_warc_is_narrow_no_shuffle(spark):
    df = spark.createDataFrame([(1, _archive())], "file_id long, warc string")
    plan = warc.parse_warc(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # parse fuses into the scan
