"""Seen-set: bloom-prefiltered anti-join exactness + cuckoo filter behavior."""

import numpy as np
from pyspark.sql import functions as F

from crawlspark.seen import CuckooFilter, bloom_prefiltered_antijoin


def test_bloom_prefiltered_antijoin_exact(spark):
    frontier = spark.range(0, 5000).select(F.col("id").alias("k"))
    seen = spark.range(0, 5000, 3).select(F.col("id").alias("k"))
    got = sorted(
        r.k for r in bloom_prefiltered_antijoin(frontier, seen, "k").collect()
    )
    expected = sorted(i for i in range(5000) if i % 3 != 0)
    assert got == expected  # bloom may send extra rows to the anti-join,
    # but the result must be exact


def test_cuckoo_insert_contains():
    cf = CuckooFilter(capacity=10_000)
    keys = np.arange(1, 5001, dtype=np.uint64) * 2654435761 % (1 << 63)
    assert cf.insert_batch(keys) == len(keys)
    assert cf.contains_batch(keys).all(), "no false negatives"
    probe = np.arange(10_001, 20_001, dtype=np.uint64) * 99991 % (1 << 63)
    fp_rate = cf.contains_batch(probe).mean()
    assert fp_rate < 0.05, f"false-positive rate too high: {fp_rate}"


def test_cuckoo_delete():
    cf = CuckooFilter(capacity=1000)
    keys = np.arange(100, dtype=np.uint64) * 7919
    cf.insert_batch(keys)
    cf.delete_batch(keys[:50])
    assert not cf.contains_batch(keys[:50]).any() or (
        cf.contains_batch(keys[:50]).mean() < 0.1
    )  # deletions may leave fp collisions from remaining keys
    assert cf.contains_batch(keys[50:]).all()


def test_cuckoo_serialize_roundtrip():
    cf = CuckooFilter(capacity=1000)
    keys = np.arange(500, dtype=np.uint64) * 31337
    cf.insert_batch(keys)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.num_buckets == cf.num_buckets
    assert cf2.contains_batch(keys).all()
    assert np.array_equal(cf.table, cf2.table)


def test_partitioned_cuckoo_prefiltered_antijoin(spark):
    from pyspark.sql import functions as F

    from crawlspark.seen import cuckoo_prefiltered_antijoin

    frontier = spark.range(0, 8000).select(
        F.col("id").alias("k"), (F.col("id") % 16).cast("int").alias("bucket")
    )
    seen = spark.range(0, 8000, 3).select(
        F.col("id").alias("k"), (F.col("id") % 16).cast("int").alias("bucket")
    )
    got = sorted(
        r.k for r in cuckoo_prefiltered_antijoin(frontier, seen, "k", "bucket").collect()
    )
    assert got == sorted(i for i in range(8000) if i % 3 != 0)
