"""Tests for WARC emit offsets and DOM depth stats."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_warc_emit_offsets_tile_shards(spark):
    """Within every shard, offsets must tile exactly: each record
    starts where the previous one ended, in URL order."""
    from crawlspark.warc import warc_emit

    df = spark.createDataFrame(
        [Row(url=f"https://h/p{i:02d}", body="x" * (i % 7)) for i in
         range(40)])
    rows = warc_emit(df, n_shards=3).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) >= 2
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.url)
        pos = 0
        for r in rs:
            assert r.offset == pos, (shard, r.url)
            assert r.record_len == len(r.record)
            pos += r.record_len
    # framing: outer Content-Length matches the inner http block
    r = rows[0]
    outer = int(r.record.split("Content-Length: ")[1].split("\r\n")[0])
    http_start = r.record.index("\r\n\r\n") + 4
    assert len(r.record) - http_start - 4 == outer  # minus trailing CRLF2


def test_warc_emit_determinism_under_repartition(spark):
    from crawlspark.warc import warc_emit

    df = spark.createDataFrame(
        [Row(url=f"u{i}", body=f"b{i}") for i in range(30)])
    a = sorted(map(tuple, warc_emit(df, n_shards=4)
                   .select("shard", "url", "offset").collect()))
    b = sorted(map(tuple, warc_emit(df.repartition(7), n_shards=4)
                   .select("shard", "url", "offset").collect()))
    assert a == b


def test_dom_depth_self_closing_and_case(spark):
    from crawlspark.extract import dom_depth_stats

    cases = [
        ("<svg/><div><p>x</p></div>", 5, 2, False),      # XML self-close
        ("<DIV><P>x</P></DIV>", 4, 2, False),            # case-insensitive
        ("<ul><li>a<li>b</ul>", 4, 3, True),             # HTML implied close:
        # regex scan counts both <li> as nested and ends at depth 2
        # (disclosed limit of the no-parser discipline)
        ("<div>" * 40 + "</div>" * 40, 80, 40, False),   # deep pyramid
        ("<div><div>", 2, 2, True),                      # unbalanced
    ]
    df = spark.createDataFrame(
        [Row(i=i, h=h) for i, (h, *_) in enumerate(cases)],
        "i int, h string")
    out = {r.i: r for r in df.select(
        "i", dom_depth_stats(F.col("h")).alias("s")).select(
        "i", "s.*").collect()}
    for i, (h, n_tags, depth, unbal) in enumerate(cases):
        assert out[i].n_tags == n_tags, (i, h, out[i].n_tags)
        assert out[i].max_depth == depth, (i, h, out[i].max_depth)
        assert out[i].unbalanced == unbal, (i, h)
