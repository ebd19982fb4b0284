"""Iceberg-spec conformance for the emulated snapshot/MERGE layer
(VERDICT r3 item 8: no catalog jar ships in this container, so assert
the emulation matches Iceberg's DOCUMENTED behaviors — the spec's
metadata-pointer-swap commit, snapshot time travel, rollback_to_snapshot,
expireSnapshots(olderThan, retainLast), and MERGE INTO upsert semantics —
so a real catalog can replace checkpoint.py/sinks.py without callers
noticing).  Spec references: the Apache Iceberg table spec ("Writers ...
commit by swapping the table's metadata file pointer", snapshot log,
expire-snapshots retention) and the Spark MERGE INTO docs (cardinality
check on multiple matches)."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from crawlspark.checkpoint import CrawlCheckpoint, snapshot_expiry


def _mk(spark, root, level, vals, meta=None):
    df = spark.createDataFrame([(v,) for v in vals], "doc LONG")
    ck = CrawlCheckpoint(root)
    ck.save_level(
        level,
        df.withColumn("ord", F.col("doc")),
        df,
        df.withColumn("depth", F.lit(level).cast("long")),
        meta or {"base_ord": len(vals), "seeds": 1},
    )
    return ck


def test_commit_is_atomic_pointer_swap(spark):
    """Spec: a snapshot only exists once the metadata pointer swaps; data
    files written before the swap are invisible to readers of the current
    table state."""
    root = tempfile.mkdtemp(prefix="ice-")
    try:
        ck = _mk(spark, root, 0, [1, 2, 3])
        committed = json.load(open(f"{root}/meta.json"))
        # torn commit: level-1 data lands but the pointer swap never runs
        spark.createDataFrame([(9,)], "doc LONG").withColumn(
            "depth", F.lit(1).cast("long")
        ).write.mode("overwrite").parquet(f"{root}/results/level=1")
        assert ck.latest() == committed          # reader still sees level 0
        assert ck.latest()["level"] == 0
        # retrying the commit (Iceberg writers retry on conflict) overwrites
        # the torn data cleanly and swaps the pointer exactly once
        _mk(spark, root, 1, [4, 5])
        assert ck.latest()["level"] == 1
        rows = {r.doc for r in ck.load_results(spark, 1).collect()}
        assert rows == {1, 2, 3, 4, 5}           # no phantom doc 9
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_time_travel_reads_exact_snapshot(spark):
    """Spec: reading snapshot k returns the table exactly as of k."""
    root = tempfile.mkdtemp(prefix="ice-")
    try:
        ck = _mk(spark, root, 0, [1])
        _mk(spark, root, 1, [2, 3])
        _mk(spark, root, 2, [4])
        as_of = {
            k: {r.doc for r in ck.load_results(spark, k).collect()}
            for k in (0, 1, 2)
        }
        assert as_of == {0: {1}, 1: {1, 2, 3}, 2: {1, 2, 3, 4}}
        snaps = ck.snapshots()
        assert [s["level"] for s in snaps] == [0, 1, 2]
        assert [s["is_current"] for s in snaps] == [False, False, True]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_rollback_to_snapshot_semantics(spark):
    """Spec: rollback makes an ancestor snapshot current; state (here:
    the meta counters a resume binds to) is restored exactly; rolling
    back to an unknown snapshot fails."""
    root = tempfile.mkdtemp(prefix="ice-")
    try:
        ck = _mk(spark, root, 0, [1], meta={"base_ord": 1, "seeds": 1})
        _mk(spark, root, 1, [2], meta={"base_ord": 2, "seeds": 1})
        _mk(spark, root, 2, [3], meta={"base_ord": 3, "seeds": 1})
        ck.rollback(1)
        assert ck.latest() == {"level": 1, "base_ord": 2, "seeds": 1}
        assert [s["level"] for s in ck.snapshots()] == [0, 1]
        assert not os.path.exists(f"{root}/results/level=2")
        # a new commit after rollback diverges from the expired history
        _mk(spark, root, 2, [7], meta={"base_ord": 3, "seeds": 1})
        assert {r.doc for r in ck.load_results(spark, 2).collect()} == \
            {1, 2, 7}
        with pytest.raises(ValueError, match="no snapshot"):
            ck.rollback(9)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_expire_snapshots_retention_invariants(spark):
    """Spec expireSnapshots(olderThan, retainLast): never expire the
    retained-last window regardless of age; a data file is removable only
    when NO live snapshot references it."""
    snaps = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300), (4, 400)],
        "snapshot_id LONG, commit_ts LONG")
    files = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1), ("c", 3), ("c", 4), ("d", 4)],
        "file_id STRING, snapshot_id LONG")
    out = {r.file_id: r for r in snapshot_expiry(
        snaps, files, horizon_ts=1000, keep_last=2).collect()}
    # horizon after everything, but snapshots 3,4 are retained-last ->
    # files they reference must stay
    assert not out["c"].orphaned and not out["d"].orphaned
    # file b referenced only by expirable snapshot 1 -> orphan
    assert out["b"].orphaned
    # file a referenced by expirable 1 AND expirable 2 -> orphan; but with
    # keep_last=3 snapshot 2 is retained and a must stay
    out3 = {r.file_id: r for r in snapshot_expiry(
        snaps, files, horizon_ts=1000, keep_last=3).collect()}
    assert out["a"].orphaned and not out3["a"].orphaned
    # nothing is expirable when horizon predates all commits
    out_early = {r.file_id: r for r in snapshot_expiry(
        snaps, files, horizon_ts=0, keep_last=0).collect()}
    assert not any(r.orphaned for r in out_early.values())


def test_merge_into_upsert_semantics(spark):
    """MERGE INTO: matched -> update, not matched -> insert, key stays
    unique.  Documented divergence: Iceberg raises on one target row
    matched by multiple source rows (merge cardinality check); this
    stand-in resolves deterministically (latest stored_at, then body-hash
    tiebreak) — asserted stable across re-runs."""
    from crawlspark.sinks import ResponseCache

    root = tempfile.mkdtemp(prefix="ice-")
    try:
        c = ResponseCache(spark, f"{root}/cache", ttl_s=10**9)

        def batch(rows):
            return spark.createDataFrame(
                rows, "request_key LONG, url STRING, status INT, "
                      "body BINARY, stored_at LONG")

        c.merge(batch([(1, "u1", 200, b"one", 10),
                       (2, "u2", 200, b"two", 10)]))
        c.merge(batch([(2, "u2", 200, b"two-v2", 20),     # matched: update
                       (3, "u3", 404, b"three", 20)]))    # not matched: insert
        got = {r.request_key: bytes(r.body)
               for r in spark.read.parquet(f"{root}/cache").collect()}
        assert got == {1: b"one", 2: b"two-v2", 3: b"three"}

        # multi-match batch: deterministic winner, stable on re-merge
        dup = [(4, "u4", 200, b"A", 30), (4, "u4", 200, b"B", 30)]
        c.merge(batch(dup))
        first = bytes(spark.read.parquet(f"{root}/cache")
                      .filter("request_key = 4").collect()[0].body)
        c.merge(batch(list(reversed(dup))))
        second = bytes(spark.read.parquet(f"{root}/cache")
                       .filter("request_key = 4").collect()[0].body)
        assert first == second
        # key uniqueness invariant after arbitrary merges
        cnt = (spark.read.parquet(f"{root}/cache")
               .groupBy("request_key").count()
               .agg(F.max("count")).collect()[0][0])
        assert cnt == 1
    finally:
        shutil.rmtree(root, ignore_errors=True)
