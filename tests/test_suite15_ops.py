"""Round-2 part-13 operators: range plans, rendezvous, UCB."""

from pyspark.sql import functions as F

from crawlspark.fetch import range_fetch_plan, rendezvous_assign


def test_range_plan_shapes(spark):
    objs = spark.createDataFrame(
        [("small", 500), ("exact", 1000), ("two", 1001), ("big", 10_500)],
        "url STRING, est_bytes LONG")
    out = {}
    for r in range_fetch_plan(objs, chunk_bytes=1000).collect():
        out.setdefault(r.url, []).append(r)
    # <= one chunk: single plain-GET part, null range
    assert len(out["small"]) == 1
    assert out["small"][0].range_start is None
    assert out["small"][0].part_bytes == 500
    assert len(out["exact"]) == 1
    # 1001 bytes -> 2 parts of ceil(1001/2)=501 and 500
    two = sorted(out["two"], key=lambda r: r.part)
    assert [(r.range_start, r.range_end) for r in two] == [(0, 500),
                                                           (501, 1000)]
    assert sum(r.part_bytes for r in two) == 1001
    big = sorted(out["big"], key=lambda r: r.part)
    assert len(big) == 11
    assert big[0].range_start == 0 and big[-1].range_end == 10_499
    # parts tile the object exactly: contiguous, non-overlapping
    for a, b in zip(big, big[1:]):
        assert b.range_start == a.range_end + 1
    assert sum(r.part_bytes for r in big) == 10_500


def test_range_plan_max_parts_cap(spark):
    objs = spark.createDataFrame([("giant", 1_000_000)],
                                 "url STRING, est_bytes LONG")
    rows = range_fetch_plan(objs, chunk_bytes=1000, max_parts=8).collect()
    assert len(rows) == 8
    assert sum(r.part_bytes for r in rows) == 1_000_000


def test_rendezvous_minimal_remap(spark):
    urls = spark.createDataFrame(
        [(f"http://h/{i}",) for i in range(300)], "url STRING")
    before = {r.url: r.fetcher for r in
              rendezvous_assign(urls, ["a", "b", "c", "d"]).collect()}
    after = {r.url: r.fetcher for r in
             rendezvous_assign(urls, ["a", "b", "c"]).collect()}
    moved = [u for u in before if before[u] != after[u]]
    # ONLY the departed node's urls remap (the rendezvous property)
    assert all(before[u] == "d" for u in moved)
    assert set(moved) == {u for u, f in before.items() if f == "d"}
    # and the fleet actually shares the load
    assert len(set(before.values())) == 4
