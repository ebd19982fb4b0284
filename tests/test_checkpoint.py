"""Kill-and-resume: a crawl resumed from its per-level checkpoint must
reproduce the identical final seen-set and ordering (north_rule)."""

import shutil
import tempfile

import pytest

from crawlspark.frontier import CrawlConfig, crawl_bfs

from .conftest import SF_DIR


def rows_of(df):
    return sorted([(r.url, r.depth, r.ord) for r in df.collect()], key=lambda t: t[2])


def test_kill_and_resume_reproduces_crawl(spark):
    full = rows_of(crawl_bfs(spark, SF_DIR, CrawlConfig(max_depth=5)))

    d = tempfile.mkdtemp(prefix="ckpt-")
    try:
        # phase 1: run only to depth 2, checkpointing ("the kill")
        partial = rows_of(
            crawl_bfs(spark, SF_DIR, CrawlConfig(max_depth=2, checkpoint_dir=d))
        )
        assert partial == [r for r in full if r[1] <= 2]
        # phase 2: resume to depth 5
        resumed = rows_of(
            crawl_bfs(
                spark, SF_DIR, CrawlConfig(max_depth=5, checkpoint_dir=d, resume=True)
            )
        )
        assert resumed == full
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_resume_is_idempotent(spark):
    d = tempfile.mkdtemp(prefix="ckpt-")
    try:
        first = rows_of(
            crawl_bfs(spark, SF_DIR, CrawlConfig(max_depth=3, checkpoint_dir=d))
        )
        again = rows_of(
            crawl_bfs(
                spark, SF_DIR, CrawlConfig(max_depth=3, checkpoint_dir=d, resume=True)
            )
        )
        assert again == first
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_lineage_written(spark):
    import os

    d = tempfile.mkdtemp(prefix="ckpt-")
    try:
        crawl_bfs(spark, SF_DIR, CrawlConfig(max_depth=2, checkpoint_dir=d)).count()
        assert os.path.exists(f"{d}/meta.json")
        lineage = spark.read.parquet(f"{d}/lineage/level=1")
        cols = set(lineage.columns)
        assert {"host_bucket", "rows", "min_ord", "max_ord"} <= cols
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_resume_rehydrates_seen_filter_state(spark, monkeypatch):
    """north_rule lineage: the checkpoint carries the partitioned
    seen-filter state, and resume REHYDRATES it (no O(|seen|) rebuild) —
    while the crawl output stays identical to an uninterrupted run."""
    import os

    from crawlspark.seen import PartitionedSeenFilter

    pf = dict(prefilter_min_seen=1, prefilter_min_ratio=0.0,
              prefilter_buckets=4, prefilter_capacity=1 << 16)
    full = rows_of(crawl_bfs(spark, SF_DIR, CrawlConfig(max_depth=5, **pf)))

    d = tempfile.mkdtemp(prefix="ckpt-pf-")
    try:
        rows_of(
            crawl_bfs(
                spark, SF_DIR,
                CrawlConfig(max_depth=2, checkpoint_dir=d, **pf),
            )
        )
        assert os.path.exists(f"{d}/seen_filter/level=2"), (
            "checkpoint must snapshot the per-bucket filter states"
        )

        # rehydration must go through from_states (once), after which the
        # only update() calls are the incremental per-level frontiers —
        # never a re-seed from the full seen set
        hydrations = []
        orig_from_states = PartitionedSeenFilter.from_states.__func__

        def counting_from_states(cls, spark_, states, **kw):
            hydrations.append(1)
            return orig_from_states(cls, spark_, states, **kw)

        monkeypatch.setattr(
            PartitionedSeenFilter, "from_states",
            classmethod(counting_from_states),
        )
        updates = []
        orig_update = PartitionedSeenFilter.update

        def counting_update(self, keys_df, key):
            updates.append(keys_df.count())
            return orig_update(self, keys_df, key)

        monkeypatch.setattr(PartitionedSeenFilter, "update", counting_update)
        resumed = rows_of(
            crawl_bfs(
                spark, SF_DIR,
                CrawlConfig(max_depth=5, checkpoint_dir=d, resume=True, **pf),
            )
        )
        assert resumed == full
        assert hydrations == [1], "resume must rehydrate the filter from states"
        # one incremental update per resumed level (3,4,5), each the size of
        # that level's frontier — equal to full's per-depth row counts
        per_depth = {}
        for _u, dep, _o in full:
            per_depth[dep] = per_depth.get(dep, 0) + 1
        assert updates == [per_depth[3], per_depth[4], per_depth[5]], updates
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_resume_drains_deferred_backlog(spark):
    """With max_per_host_per_level, the per-host backlog pending at the
    kill point must survive the checkpoint: resume == uninterrupted run
    (regression: deferred rows existed only in memory and were dropped)."""
    cfg_kw = dict(max_per_host_per_level=3, num_seeds=4)
    full = rows_of(
        crawl_bfs(spark, SF_DIR, CrawlConfig(max_depth=5, **cfg_kw))
    )
    d = tempfile.mkdtemp(prefix="ckpt-")
    try:
        rows_of(
            crawl_bfs(
                spark, SF_DIR,
                CrawlConfig(max_depth=2, checkpoint_dir=d, **cfg_kw),
            )
        )
        resumed = rows_of(
            crawl_bfs(
                spark, SF_DIR,
                CrawlConfig(max_depth=5, checkpoint_dir=d, resume=True, **cfg_kw),
            )
        )
        assert resumed == full
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_snapshots_rollback_and_time_travel(spark):
    """Iceberg-semantics on the checkpoint: snapshot listing shows every
    committed level, load_results(upto) time-travels, and rollback +
    resume reproduces the uninterrupted crawl exactly."""
    import tempfile

    from crawlspark.checkpoint import CrawlCheckpoint

    full = rows_of(crawl_bfs(spark, SF_DIR, CrawlConfig(max_depth=5)))
    with tempfile.TemporaryDirectory() as d:
        rows_of(crawl_bfs(spark, SF_DIR, CrawlConfig(max_depth=4, checkpoint_dir=d)))
        cp = CrawlCheckpoint(d)
        snaps = cp.snapshots()
        assert [s["level"] for s in snaps] == list(range(len(snaps)))
        assert snaps[-1]["is_current"] and not snaps[0]["is_current"]
        # time-travel: results as of level 2 == the depth<=2 slice of full
        # (checkpoint results are (doc, ord, depth); ord is unique, so the
        # (depth, ord) set identifies the slice exactly)
        as_of = {
            (r["depth"], r["ord"])
            for r in cp.load_results(spark, 2).select("depth", "ord").collect()
        }
        expect = {(dep, o) for (_u, dep, o) in full if dep <= 2}
        assert as_of == expect
        # rollback to level 2, then resume to depth 5: identical crawl
        cp.rollback(2)
        assert cp.latest()["level"] == 2
        assert [s["level"] for s in cp.snapshots()] == [0, 1, 2]
        resumed = rows_of(
            crawl_bfs(
                spark, SF_DIR, CrawlConfig(max_depth=5, checkpoint_dir=d, resume=True)
            )
        )
        assert resumed == full
        # rollback to a non-existent snapshot is rejected
        import pytest as _pytest

        with _pytest.raises(ValueError):
            cp.rollback(99)
