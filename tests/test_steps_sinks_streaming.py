"""steps helpers, response cache, stores, streaming ingest."""

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from crawlspark import sinks, steps


def test_template_resolve(spark):
    df = spark.createDataFrame([("example.com", 7)], "host STRING, id LONG")
    out = df.select(
        steps.template_resolve(
            "https://[crwl:host]/d/[crwl:id]?x=1",
            host=F.col("host"), id=F.col("id"),
        ).alias("u")
    ).collect()[0].u
    assert out == "https://example.com/d/7?x=1"


def test_strip_bom(spark):
    df = spark.createDataFrame([("﻿hello",), ("plain",)], "t STRING")
    got = [r.s for r in df.select(steps.strip_bom(F.col("t")).alias("s")).collect()]
    assert got == ["hello", "plain"]


def test_dom_select(spark):
    df = spark.createDataFrame([(["a", "b", "c", "d", "e"],)], "m ARRAY<STRING>")
    row = df.select(
        steps.dom_select(F.col("m"), "first").alias("f"),
        steps.dom_select(F.col("m"), "last").alias("l"),
        steps.dom_select(F.col("m"), "nth", 2).alias("n2"),
        steps.dom_select(F.col("m"), "even").alias("ev"),
        steps.dom_select(F.col("m"), "odd").alias("od"),
    ).collect()[0]
    assert (row.f, row.l, row.n2) == ("a", "e", "b")
    assert row.ev == ["b", "d"] and row.od == ["a", "c", "e"]


def test_ldjson_extract(spark):
    body = (
        '<html><head><script type="application/ld+json">'
        '{"@type": "Product", "name": "Thing"}</script>'
        '<script type="application/ld+json">{"@type": "Offer"}</script>'
        "</head></html>"
    )
    df = spark.createDataFrame([(body,)], "b STRING")
    blocks = df.select(steps.extract_ldjson_udf(F.col("b")).alias("j")).collect()[0].j
    assert len(blocks) == 2
    assert json.loads(blocks[0])["@type"] == "Product"


def test_retry_schedule(spark):
    df = spark.createDataFrame(
        [(200, None), (429, None), (503, 30), (503, 120)],
        "status INT, retry_after INT",
    )
    rows = df.select(
        "status", "retry_after",
        *steps.retry_schedule_cols(F.col("status"), F.col("retry_after")),
    ).collect()
    by = {(r.status, r.retry_after): r for r in rows}
    assert by[(200, None)].retry_wait1_ms == 0
    assert by[(429, None)].retry_wait1_ms == 10_000
    assert by[(429, None)].retry_wait2_ms == 60_000
    assert by[(503, 30)].retry_wait1_ms == 30_000  # Retry-After honored
    assert by[(503, 120)].retry_wait1_ms == 60_000  # capped at 60 s
    assert by[(503, 30)].aborts_after_retries is True


def test_gzip_roundtrip(spark):
    df = spark.createDataFrame([(b"hello world",), (b"raw",)], "b BINARY")
    enc = df.select(steps.gzip_encode_udf(F.col("b")).alias("e"))
    dec = enc.select(steps.gzip_decode_udf(F.col("e")).alias("d")).collect()
    assert bytes(dec[0].d) == b"hello world"
    # sniff: non-gzip passes through
    raw = df.select(steps.gzip_decode_udf(F.col("b")).alias("d")).collect()
    assert bytes(raw[1].d) == b"raw"


def test_response_cache_probe_and_merge(spark):
    d = tempfile.mkdtemp(prefix="cache-")
    try:
        cache = sinks.ResponseCache(spark, f"{d}/cache", ttl_s=3600)
        resp = spark.createDataFrame(
            [(1, "http://a", 200, bytearray(b"A"), 1000),
             (2, "http://b", 200, bytearray(b"B"), 1000)],
            sinks.CACHE_SCHEMA,
        )
        cache.merge(resp)
        frontier = spark.createDataFrame(
            [(1,), (3,)], "request_key LONG"
        )
        hits, misses = cache.probe(frontier, now_s=2000)
        assert [r.request_key for r in hits.collect()] == [1]
        assert [r.request_key for r in misses.collect()] == [3]
        # TTL expiry: far future -> everything is a miss
        hits2, misses2 = cache.probe(frontier, now_s=1000 + 3600 + 1)
        assert hits2.count() == 0 and misses2.count() == 2
        # upsert: newer row wins
        resp2 = spark.createDataFrame(
            [(1, "http://a", 304, bytearray(b"A2"), 5000)], sinks.CACHE_SCHEMA
        )
        cache.merge(resp2)
        live = cache.read(now_s=5000)
        assert live.filter("request_key = 1").collect()[0].status == 304
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_csv_store_array_join(spark):
    d = tempfile.mkdtemp(prefix="store-")
    try:
        df = spark.createDataFrame([(1, ["x", "y"])], "id LONG, tags ARRAY<STRING>")
        sinks.write_csv_store(df, f"{d}/out", mode="overwrite")
        back = spark.read.option("header", "true").csv(f"{d}/out").collect()[0]
        assert back.tags == "x | y"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_frontier_ingest(spark):
    from crawlspark import streaming

    d = tempfile.mkdtemp(prefix="stream-")
    try:
        src, sink, ckpt = f"{d}/src", f"{d}/sink", f"{d}/ckpt"
        import os

        os.makedirs(src)
        with open(f"{src}/batch1.json", "w") as f:
            for u, ts in [
                ("HTTP://A.test:80/p?b=1&a=2", "2024-01-01T00:00:00"),
                ("http://a.test/p?a=2&b=1", "2024-01-01T00:00:30"),  # same canon
                ("http://b.test/q", "2024-01-01T00:01:00"),
            ]:
                f.write(json.dumps({"url": u, "discovered_at": ts}) + "\n")
        streaming.run_ingest_once(spark, src, sink, ckpt)
        out = spark.read.parquet(sink)
        rows = out.select("url_norm").collect()
        norms = sorted(r.url_norm for r in rows)
        # canonical dedup within the watermark: 3 inputs -> 2 distinct
        assert norms == ["http://a.test/p?a=2&b=1", "http://b.test/q"]
        assert {"url_hash", "host", "host_bucket"} <= set(out.columns)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_stateful_admission(spark, tmp_path):
    """applyInPandasWithState politeness budget: per-host admission state
    carries across micro-batches (maxFilesPerTrigger=1 forces one batch per
    input file)."""
    import json as _json
    import os

    from crawlspark import streaming

    src = str(tmp_path / "links")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    # batch 1: h0 gets 3 urls, h1 gets 1; batch 2: h0 gets 2 more, h1 one
    batches = [
        [("h0", f"http://h0.test/{i}", i) for i in range(3)]
        + [("h1", "http://h1.test/0", 0)],
        [("h0", f"http://h0.test/{i}", i) for i in (3, 4)]
        + [("h1", "http://h1.test/1", 1)],
    ]
    for bi, rows in enumerate(batches):
        with open(f"{src}/b{bi}.json", "w") as f:
            for host, url, ord_ in rows:
                f.write(_json.dumps({"host": host, "url": url, "ord": ord_}) + "\n")
        # the file source orders batches by modification time; same-second
        # mtimes make batch order arbitrary -> pin them apart
        os.utime(f"{src}/b{bi}.json", (1_700_000_000 + bi * 60,) * 2)

    links = (
        spark.readStream.schema("host STRING, url STRING, ord LONG")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    out = streaming.politeness_admission_stream(links, budget_per_host=4)
    q = (
        out.writeStream.format("memory")
        .queryName("admissions")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM admissions").collect()
    assert len(rows) == 7
    h0 = sorted((r for r in rows if r.host == "h0"), key=lambda r: r.ord)
    # host_seq is continuous across the two micro-batches: 1..5
    assert [r.host_seq for r in h0] == [1, 2, 3, 4, 5]
    # budget 4: the 5th h0 URL is deferred
    assert [r.admitted for r in h0] == [True, True, True, True, False]
    h1 = sorted((r for r in rows if r.host == "h1"), key=lambda r: r.ord)
    assert [(r.host_seq, r.admitted) for r in h1] == [(1, True), (2, True)]


def test_streaming_crawl_rate_late_data(spark, tmp_path):
    """Event-time windowed crawl-rate metrics: watermark finalizes windows
    (append mode emits each exactly once) and drops TOO-late rows, while
    late-but-in-watermark rows still count."""
    from crawlspark import streaming

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(src)

    def write_batch(name, rows):
        with open(f"{src}/{name}.json", "w") as f:
            for host, h, ts in rows:
                f.write(json.dumps(
                    {"host": host, "url_hash": h, "discovered_at": ts}
                ) + "\n")

    def drain():
        links = spark.readStream.schema(
            "host STRING, url_hash LONG, discovered_at TIMESTAMP"
        ).json(src)
        q = (
            streaming.crawl_rate_stream(
                links, window="1 minute", watermark="2 minutes")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()

    # batch 1: window [00:00,01:00) for hosts a (2 urls, 1 dup hash) and b;
    # a row at 00:05:00 pushes the watermark to 03:00 -> first window emits
    write_batch("b1", [
        ("a.test", 1, "2024-01-01T00:00:10"),
        ("a.test", 1, "2024-01-01T00:00:20"),  # duplicate url_hash
        ("a.test", 2, "2024-01-01T00:00:40"),
        ("b.test", 3, "2024-01-01T00:00:50"),
        ("c.test", 9, "2024-01-01T00:05:00"),  # watermark pusher
    ])
    drain()

    # batch 2: a TOO-late row for the finalized [00:00,01:00) window
    # (watermark 03:00 > event time -> dropped), an in-watermark row for
    # the still-open [00:04,00:05) window... plus a pusher at 00:08 that
    # finalizes every window through 00:06.
    write_batch("b2", [
        ("a.test", 4, "2024-01-01T00:00:55"),   # too late: dropped
        ("d.test", 5, "2024-01-01T00:04:30"),   # in watermark: counted
        ("c.test", 6, "2024-01-01T00:08:00"),   # pusher
    ])
    drain()

    out = {(r.host, str(r.win_start)): (r.n_urls, r.n_unique_est)
           for r in spark.read.parquet(sink).collect()}
    # first window finalized WITHOUT the too-late url_hash=4 row
    assert out[("a.test", "2024-01-01 00:00:00")] == (3, 2)
    assert out[("b.test", "2024-01-01 00:00:00")] == (1, 1)
    # late-but-in-watermark row landed in its own window
    assert out[("d.test", "2024-01-01 00:04:00")] == (1, 1)
    # the first pusher's window finalized once the second pusher advanced
    # the watermark past 00:06
    assert out[("c.test", "2024-01-01 00:05:00")] == (1, 1)
