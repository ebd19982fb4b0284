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
