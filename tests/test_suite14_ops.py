"""Round-2 part-12 operators: shard manifests, priority aging."""

import hashlib

from pyspark.sql import functions as F

from crawlspark.scheduler import priority_aging
from crawlspark.sinks import shard_manifest


def test_shard_manifest_checksum_is_order_insensitive_and_sensitive(spark):
    a = spark.createDataFrame(
        [("s1", "b", 10), ("s1", "a", 20), ("s2", "c", 5)],
        "shard_id STRING, image_id STRING, nbytes LONG")
    out = {r.shard_id: r for r in shard_manifest(a).collect()}
    assert out["s1"].n_rows == 2 and out["s1"].total_bytes == 30
    # checksum over SORTED ids, independent of ingestion order
    assert out["s1"].checksum == hashlib.md5(b"a|b").hexdigest()
    # any membership change flips it
    b = spark.createDataFrame(
        [("s1", "b", 10), ("s1", "a2", 20)],
        "shard_id STRING, image_id STRING, nbytes LONG")
    out2 = {r.shard_id: r for r in shard_manifest(b).collect()}
    assert out2["s1"].checksum != out["s1"].checksum


def test_priority_aging_boost_and_cap(spark):
    f = spark.createDataFrame(
        [("u1", 100, 10_000 - 0),        # fresh: no boost
         ("u2", 100, 10_000 - 7_200),    # 2 steps
         ("u3", 100, 10_000 - 10_000_000)],  # ancient: capped at 200
        "url STRING, priority LONG, enqueued_ts LONG")
    out = {r.url: r for r in priority_aging(f, now_ts=10_000).collect()}
    assert out["u1"].age_boost == 0 and out["u1"].aged_priority == 100
    assert out["u2"].age_boost == 2 and out["u2"].aged_priority == 102
    assert out["u3"].age_boost == 200 and out["u3"].aged_priority == 300


def test_priority_aging_lets_starved_rows_win(spark):
    # same host: an old priority-50 row must eventually outrank a fresh
    # priority-120 row (boost 200 > gap 70)
    f = spark.createDataFrame(
        [("h", "old", 50, 0), ("h", "fresh", 120, 999_000)],
        "host STRING, url STRING, priority LONG, enqueued_ts LONG")
    aged = priority_aging(f, now_ts=1_000_000)
    top = (aged.orderBy(F.desc("aged_priority")).head())
    assert top.url == "old"
