"""HttpBase option surface on the facade HttpGet
(src/Steps/Loading/HttpBase.php:66-221 + HttpLoader cache modes) and
ResponseCache compression (FileCache::useCompression)."""

import json

import pytest
from pyspark.sql import functions as F

from crawlspark import fixture
from crawlspark.crawler import (
    Crawler, HttpGet, JsonGet, Keep, LoadingError, PreRunValidationError,
)
from crawlspark.sinks import ResponseCache

B = fixture.B


def _api_pages(spark):
    rows = [
        (f"{B}/api/item/1", 200, None, "application/json", '{"name": "one"}'),
        (f"{B}/api/item/2", 200, None, "application/json", '{"name": "two"}'),
        (f"{B}/api/broken", 500, None, "text/html", "boom"),
    ]
    return spark.createDataFrame(
        rows, "url STRING, status INT, redirect_to STRING, content_type STRING, body STRING"
    )


def _record_input(spark, pages, http):
    """Chain producing record inputs for http: JsonGet -> record."""
    return (
        Crawler(spark)
        .input(json.dumps({"link": f"{B}/api/item/1", "tok": "abc", "num": "2"}))
        .add_step(JsonGet(link="link", tok="tok", num="num"))
        .add_step(http)
    )


def test_use_input_key_as_url(spark):
    pages = _api_pages(spark)
    out = _record_input(
        spark, pages, HttpGet(pages).use_input_key_as_url("link")
    ).run().collect()
    assert len(out) == 1
    assert out[0].value.url == f"{B}/api/item/1"
    assert out[0].value.body == '{"name": "one"}'


def test_record_url_field_used_automatically(spark):
    # getUrlFromArrayInput (HttpBase.php:349-356): an array input with a
    # 'url' key is used without any option
    pages = _api_pages(spark)
    out = (
        Crawler(spark)
        .input(json.dumps({"url": f"{B}/api/item/2"}))
        .add_step(JsonGet(url="url"))
        .add_step(HttpGet(pages))
        .run()
        .collect()
    )
    assert out[0].value.url == f"{B}/api/item/2"


def test_static_url_template(spark):
    # staticUrl('...[crwl:key]...') resolved per row (HttpBase.php:194-198,
    # TemplateString.php:12-31); unknown vars -> ''
    pages = _api_pages(spark)
    out = _record_input(
        spark, pages,
        HttpGet(pages).static_url(f"{B}/api/item/[crwl:num][crwl:missing]"),
    ).run().collect()
    assert out[0].value.url == f"{B}/api/item/2"
    assert out[0].value.body == '{"name": "two"}'


def test_use_input_key_as_body_and_headers(spark):
    pages = _api_pages(spark)
    http = (
        HttpGet(pages, headers={"Accept": "application/json",
                                "X-Tok": "pre-[crwl:tok]"})
        .use_input_key_as_url("link")
        .use_input_key_as_body("tok")
        .use_input_key_as_header("num", "X-Num")
    )
    out = _record_input(spark, pages, http).run().collect()
    v = out[0].value
    assert v.req_body == "abc"
    assert v.req_headers["Accept"] == "application/json"
    assert v.req_headers["X-Tok"] == "pre-abc"  # template in header value
    assert v.req_headers["X-Num"] == "2"


def test_constructor_body_template(spark):
    pages = _api_pages(spark)
    http = (
        HttpGet(pages, method="POST", body='{"q": "[crwl:tok]"}')
        .use_input_key_as_url("link")
    )
    out = _record_input(spark, pages, http).run().collect()
    assert out[0].value.req_body == '{"q": "abc"}'


def test_use_input_key_missing_is_prerun_error(spark):
    pages = _api_pages(spark)
    c = _record_input(
        spark, pages, HttpGet(pages).use_input_key_as_url("nope")
    )
    with pytest.raises(PreRunValidationError, match="nope"):
        c.run()


def test_stop_on_error_response(spark):
    # loadOrFail: any error response fails the whole run
    pages = _api_pages(spark)
    c = (
        Crawler(spark)
        .inputs([f"{B}/api/item/1", f"{B}/api/broken"])
        .add_step(HttpGet(pages).stop_on_error_response())
    )
    with pytest.raises(LoadingError, match="broken.*status 500"):
        c.run()


def test_cache_probe_and_upsert(spark, tmp_path):
    """Second run served from the cache: the corpus join sees only misses
    (HttpLoader cache probe), and the upsert wrote the first run's rows."""
    pages = _api_pages(spark)
    cache = ResponseCache(spark, str(tmp_path / "rc"))
    c1 = (
        Crawler(spark)
        .input(f"{B}/api/item/1")
        .add_step(HttpGet(pages, cache=cache))
    )
    out1 = c1.run().collect()
    assert out1[0].value.body == '{"name": "one"}'
    cached = cache.read().collect()
    assert len(cached) == 1 and cached[0]["url"] == f"{B}/api/item/1"

    # corpus now answers differently -> a cache hit must return the OLD body
    pages2 = spark.createDataFrame(
        [(f"{B}/api/item/1", 200, None, "application/json", '{"name": "CHANGED"}')],
        "url STRING, status INT, redirect_to STRING, content_type STRING, body STRING",
    )
    out2 = (
        Crawler(spark)
        .input(f"{B}/api/item/1")
        .add_step(HttpGet(pages2, cache=cache))
        .run()
        .collect()
    )
    assert out2[0].value.body == '{"name": "one"}'  # served from cache

    # skip_cache(): bypasses the probe, loads fresh (HttpBase.php:171-176)
    out3 = (
        Crawler(spark)
        .input(f"{B}/api/item/1")
        .add_step(HttpGet(pages2, cache=cache).skip_cache())
        .run()
        .collect()
    )
    assert out3[0].value.body == '{"name": "CHANGED"}'


def test_write_only_cache_and_url_filter(spark, tmp_path):
    pages = _api_pages(spark)
    cache = ResponseCache(spark, str(tmp_path / "rc2"))
    # url filter: only item/2 is cached (cacheOnlyWhereUrl)
    (
        Crawler(spark)
        .inputs([f"{B}/api/item/1", f"{B}/api/item/2"])
        .add_step(HttpGet(
            pages, cache=cache, write_only_cache=True,
            cache_url_filter=F.col("url").endswith("/2"),
        ))
        .run()
        .collect()
    )
    cached = [r["url"] for r in cache.read().collect()]
    assert cached == [f"{B}/api/item/2"]


def test_cache_compression_roundtrip(spark, tmp_path):
    """FileCache::useCompression: bodies gzip'd at rest, transparent on
    read; a pre-existing uncompressed row still reads (magic sniff)."""
    plain = ResponseCache(spark, str(tmp_path / "rc3"))
    df1 = spark.createDataFrame(
        [(1, "http://c.test/a", 200, b"plain-body", 10_000_000_000)],
        "request_key LONG, url STRING, status INT, body BINARY, stored_at LONG",
    )
    plain.merge(df1)
    gz = ResponseCache(spark, str(tmp_path / "rc3"), compress=True)
    df2 = spark.createDataFrame(
        [(2, "http://c.test/b", 200, b"zipped-body", 10_000_000_000)],
        "request_key LONG, url STRING, status INT, body BINARY, stored_at LONG",
    )
    gz.merge(df2)
    # at rest: row 2 is gzip'd (magic bytes), row 1 untouched
    raw = {r["request_key"]: bytes(r["body"])
           for r in spark.read.parquet(str(tmp_path / "rc3")).collect()}
    assert raw[1] == b"plain-body"
    assert raw[2][:2] == b"\x1f\x8b"
    # through read(): both transparent
    got = {r["request_key"]: bytes(r["body"]) for r in gz.read(now_s=10_000_000_001).collect()}
    assert got == {1: b"plain-body", 2: b"zipped-body"}
