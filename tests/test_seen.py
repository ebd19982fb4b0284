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


def test_build_partitioned_cuckoo_saturation_stays_exact(spark):
    """A bucket whose keys overflow capacity_per_bucket must mark saturated
    and fall back to the exact anti-join — never emit a seen key as new
    (regression: overflow was silently ignored -> false negatives)."""
    from crawlspark.seen import build_partitioned_cuckoo, cuckoo_prefiltered_antijoin

    seen = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("bucket")
    )
    states = {
        r["bucket"]: r for r in build_partitioned_cuckoo(
            seen, "k", "bucket", capacity_per_bucket=1 << 10
        ).collect()
    }
    assert all(r["saturated"] for r in states.values())  # 2500 keys >> 1024
    frontier = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("bucket")
    )
    got = sorted(
        r.k for r in cuckoo_prefiltered_antijoin(
            frontier, seen, "k", "bucket"
        ).collect()
    )
    assert got == list(range(5000, 10000))  # exact despite saturation


def test_flag_maybe_preserves_caller_bucket_column(spark):
    """A frontier already carrying a 'bucket' column must pass through the
    probe intact (regression: the working column shadowed and dropped it)."""
    from crawlspark.seen import PartitionedSeenFilter

    f = PartitionedSeenFilter(spark, num_buckets=4, capacity_per_bucket=1 << 12)
    f.update(spark.range(0, 100).select(F.col("id").alias("k")), "k")
    frontier = spark.range(50, 150).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("bucket")
    )
    out = f.flag_maybe(frontier, "k")
    assert "bucket" in out.columns
    rows = {r["k"]: (r["bucket"], r["__maybe"]) for r in out.collect()}
    assert all(rows[k][0] == k % 7 for k in range(50, 150))  # intact values
    assert all(rows[k][1] for k in range(50, 100))  # seen -> maybe


def test_prefiltered_antijoin_narrow_probe_and_broadcast_backstop(spark):
    """All four (probe, backstop) combinations agree with the plain
    left_anti — including under saturated buckets (cap 1024 forces
    overflow) and hash-free exact keys."""
    from crawlspark.seen import PartitionedSeenFilter

    seen_keys = list(range(0, 6000))
    seen = spark.createDataFrame([(k,) for k in seen_keys], "k LONG")
    frontier = spark.range(3000, 9000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
    )
    expected = set(range(6000, 9000))

    f = PartitionedSeenFilter(spark, num_buckets=4,
                              capacity_per_bucket=1 << 10)  # saturates
    f.update(seen, "k")
    for probe in ("wide", "narrow"):
        for backstop in ("antijoin", "broadcast_probe"):
            got = {
                r.k for r in f.prefiltered_antijoin(
                    frontier, seen, "k", probe=probe, backstop=backstop
                ).collect()
            }
            assert got == expected, (probe, backstop)


def test_maybe_keys_is_narrow_and_superset_of_seen(spark):
    from crawlspark.seen import PartitionedSeenFilter

    f = PartitionedSeenFilter(spark, num_buckets=4,
                              capacity_per_bucket=1 << 12)
    f.update(spark.range(0, 500).select(F.col("id").alias("k")), "k")
    frontier = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit("payload").alias("p"))
    mk = f.maybe_keys(frontier, "k")
    assert mk.columns == ["k"]  # only the key rides the probe
    keys = {r.k for r in mk.collect()}
    assert set(range(0, 500)) <= keys  # no false negatives
    # fp rate sane: well under half of the unseen half flagged
    assert len(keys) < 900


def test_seen_module_has_no_driver_byte_collect():
    """VERDICT r4 item 6: the bloom build must OR-combine executor-side
    (treeReduce), never collect per-partition filter blobs on the driver."""
    import inspect

    import crawlspark.seen as seen_mod

    src = inspect.getsource(seen_mod)
    assert ".collect()" not in src
    assert "treeReduce" in inspect.getsource(seen_mod.build_bloom)
