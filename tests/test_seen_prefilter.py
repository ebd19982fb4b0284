"""PartitionedSeenFilter: the threshold-gated cuckoo prefilter in the BFS
anti-join hot path (north_rule primary seen structure).

Covers: vectorized bulk insert (correctness + >=10x perf vs the per-key
loop), cogroup-maintained bucket states (no driver materialization),
exactness of the prefiltered anti-join including saturated buckets, and the
engagement of the prefilter inside frontier._crawl / engine.crawl_site past
the threshold.
"""

import time

import numpy as np
from pyspark.sql import functions as F

from crawlspark.seen import CuckooFilter, PartitionedSeenFilter


def test_vectorized_insert_matches_per_key():
    rng = np.random.default_rng(7)
    keys = rng.integers(1, 1 << 62, size=50_000, dtype=np.uint64)
    vec = CuckooFilter(capacity=100_000)
    assert vec.insert_batch(keys) == len(np.unique(keys))
    assert vec.contains_batch(keys).all(), "no false negatives"
    absent = rng.integers(1 << 62, 1 << 63, size=20_000, dtype=np.uint64)
    assert vec.contains_batch(absent).mean() < 0.05


def test_vectorized_insert_10x_faster_than_per_key_loop():
    """Best-of-3 on each side: a single reading swings ~3x with ambient
    load on this shared box (measured — the same comparison reads 30x quiet
    and <10x while a 32-core Spark suite runs), and min-of-reps is the
    same noise filter bench.py uses."""
    rng = np.random.default_rng(11)
    n_loop = 100_000
    loop_keys = rng.integers(1, 1 << 62, size=n_loop, dtype=np.uint64)
    vec_keys = rng.integers(1, 1 << 62, size=1_000_000, dtype=np.uint64)

    t_loop = t_vec = float("inf")
    for _ in range(3):
        per_key = CuckooFilter(capacity=2_000_000)
        t0 = time.perf_counter()
        for k in loop_keys:  # the old insert_batch shape
            per_key._insert_one(int(k))
        t_loop = min(t_loop, time.perf_counter() - t0)

        vec = CuckooFilter(capacity=2_000_000)
        t0 = time.perf_counter()
        vec.insert_batch(vec_keys)
        t_vec = min(t_vec, time.perf_counter() - t0)
        assert vec.contains_batch(vec_keys).all()

    # per-key rate extrapolated to the same 1M keys must be >=10x slower
    projected_loop_1m = t_loop * (1_000_000 / n_loop)
    assert t_vec * 10 < projected_loop_1m, (
        f"vectorized build not >=10x faster: vec={t_vec:.3f}s on 1M, "
        f"per-key projected={projected_loop_1m:.3f}s"
    )


def test_prefiltered_antijoin_exact(spark):
    f = PartitionedSeenFilter(spark, num_buckets=8, capacity_per_bucket=65536)
    seen = spark.range(0, 9000, 3).select(F.col("id").alias("k"))
    f.update(seen, "k")
    assert f.states.count() == 8  # all buckets hold state, none on the driver
    frontier = spark.range(0, 9000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("payload")
    )
    got = {
        (r["k"], r["payload"])
        for r in f.prefiltered_antijoin(frontier, seen, "k").collect()
    }
    expected = {(i, i * 7) for i in range(9000) if i % 3 != 0}
    assert got == expected


def test_prefiltered_antijoin_incremental_update(spark):
    f = PartitionedSeenFilter(spark, num_buckets=4, capacity_per_bucket=65536)
    s1 = spark.range(0, 1000).select(F.col("id").alias("k"))
    s2 = spark.range(1000, 2000).select(F.col("id").alias("k"))
    f.update(s1, "k")
    f.update(s2, "k")
    seen = s1.unionByName(s2)
    frontier = spark.range(0, 3000).select(F.col("id").alias("k"))
    got = sorted(r["k"] for r in f.prefiltered_antijoin(frontier, seen, "k").collect())
    assert got == list(range(2000, 3000))


def test_saturated_bucket_stays_exact(spark):
    # capacity 256 but 1000 keys per bucket -> every bucket saturates; the
    # layer must degrade to the exact anti-join, never drop or leak a row
    f = PartitionedSeenFilter(spark, num_buckets=2, capacity_per_bucket=256)
    seen = spark.range(0, 2000).select(F.col("id").alias("k"))
    f.update(seen, "k")
    sat = {r["bucket"]: r["saturated"] for r in f.states.collect()}
    assert all(sat.values()), "buckets past capacity must be marked saturated"
    frontier = spark.range(0, 4000).select(F.col("id").alias("k"))
    got = sorted(r["k"] for r in f.prefiltered_antijoin(frontier, seen, "k").collect())
    assert got == list(range(2000, 4000))


def test_exact_key_backstop_on_string_identity(spark):
    # probe on xxhash64(url), backstop anti-join on the url string
    f = PartitionedSeenFilter(spark, num_buckets=4, capacity_per_bucket=65536)
    urls = spark.range(0, 600).select(
        F.concat(F.lit("https://ex.com/p"), F.col("id")).alias("url")
    )
    seen = urls.filter(F.col("url").rlike("p[0-2][0-9][0-9]$"))  # p000-p299
    f.update(seen.select(F.xxhash64("url").alias("kh")), "kh")
    frontier = urls.withColumn("kh", F.xxhash64("url"))
    got = sorted(
        r["url"]
        for r in f.prefiltered_antijoin(frontier, seen, "kh", exact_key="url")
        .collect()
    )
    expected = sorted(f"https://ex.com/p{i}" for i in range(600) if not 100 <= i <= 299)
    assert got == expected


def test_prefilter_plan_shape(spark):
    """The prefiltered path must show the cogroup probe stage and route only
    the maybe rows into the anti-join exchange."""
    f = PartitionedSeenFilter(spark, num_buckets=4, capacity_per_bucket=65536)
    seen = spark.range(0, 1000, 2).select(F.col("id").alias("k"))
    f.update(seen, "k")
    frontier = spark.range(0, 1000).select(F.col("id").alias("k"))
    probe_plan = f.flag_maybe(frontier, "k")._jdf.queryExecution().toString()
    assert (
        "FlatMapCoGroupsInArrow" in probe_plan
        or "FlatMapCoGroupsInPandas" in probe_plan
    ), probe_plan[:2000]
    # the full anti-join materializes the probe once (localCheckpoint), so
    # its own plan shows the exact backstop over the flagged relation
    out_plan = (
        f.prefiltered_antijoin(frontier, seen, "k")
        ._jdf.queryExecution().toString()
    )
    assert "LeftAnti" in out_plan


def test_crawl_engages_prefilter_past_threshold(spark):
    from crawlspark.frontier import CrawlConfig, crawl_bfs_virtual

    base = crawl_bfs_virtual(
        spark, 50_000, CrawlConfig(max_depth=5, prefilter_min_seen=None)
    ).orderBy("ord").collect()
    before = PartitionedSeenFilter.engagements
    pref = crawl_bfs_virtual(
        spark,
        50_000,
        CrawlConfig(
            max_depth=5, prefilter_min_seen=1, prefilter_min_ratio=0.0,
            prefilter_buckets=4, prefilter_capacity=1 << 17,
        ),
    ).orderBy("ord").collect()
    assert PartitionedSeenFilter.engagements > before, (
        "BFS loop never engaged the prefilter despite seen >= threshold"
    )
    assert [tuple(r) for r in pref] == [tuple(r) for r in base]


def _synth_corpus(spark, n):
    """n-page single-host corpus with a formulaic link graph."""
    link = lambda e: F.concat(  # noqa: E731
        F.lit('<a href="/p'), e.cast("string"), F.lit('">x</a>')
    )
    i = F.col("id")
    body = F.concat(
        F.lit("<html><body>"),
        link((i * 2 + 1) % n), link((i * 3 + 2) % n), link((i + 7) % n),
        F.lit("</body></html>"),
    )
    return spark.range(n).select(
        F.concat(F.lit("https://site.example.com/p"), i.cast("string")).alias("url"),
        F.lit(200).alias("status"),
        F.lit(None).cast("string").alias("redirect_to"),
        F.lit("text/html").alias("content_type"),
        body.alias("body"),
    )


def test_crawl_site_engages_prefilter(spark):
    from crawlspark.engine import SiteCrawlConfig, crawl_site

    pages = _synth_corpus(spark, 300)
    seed = "https://site.example.com/p0"
    base = crawl_site(
        spark, pages, seed, SiteCrawlConfig(max_depth=4, prefilter_min_seen=None)
    ).orderBy("ord").collect()
    before = PartitionedSeenFilter.engagements
    pref = crawl_site(
        spark, pages, seed,
        SiteCrawlConfig(
            max_depth=4, prefilter_min_seen=1, prefilter_min_ratio=0.0,
            prefilter_buckets=2, prefilter_capacity=1 << 16,
        ),
    ).orderBy("ord").collect()
    assert PartitionedSeenFilter.engagements > before
    assert [tuple(r) for r in pref] == [tuple(r) for r in base]


def test_prefilter_adaptive_disengage_keeps_exactness(spark):
    """Round-5 safeguard: an engaged filter whose prune rate stays under
    prefilter_min_prune for `patience` waves is dropped mid-run (the
    saturation regime pays probe+update for nothing).  With an absurdly
    high floor every engaged wave is 'low prune', so the veto fires after
    exactly `patience` engaged waves — and the output stays exact."""
    from crawlspark import frontier as fmod
    from crawlspark.frontier import CrawlConfig, crawl_bfs_virtual

    base = crawl_bfs_virtual(
        spark, 50_000, CrawlConfig(max_depth=6, prefilter_min_seen=None)
    ).orderBy("ord").collect()
    out = crawl_bfs_virtual(
        spark, 50_000,
        CrawlConfig(
            max_depth=6, prefilter_min_seen=1, prefilter_min_ratio=0.0,
            prefilter_buckets=4, prefilter_capacity=1 << 17,
            prefilter_min_prune=1.01,  # every wave counts as low-prune
            prefilter_prune_patience=2,
        ),
    ).orderBy("ord").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in base]
    ms = fmod.LAST_CRAWL_LEVEL_METRICS
    engaged = [m for m in ms if m["prefilter_engaged"]]
    vetoed = [m for m in ms if m["prefilter_vetoed"]]
    assert len(engaged) == 2, ms      # exactly `patience` engaged waves
    assert vetoed, ms
    # the wave the veto FIRED on ran engaged and records its prune rate
    assert vetoed[0]["prune_rate"] is not None, ms
    # all post-veto waves run plain
    after = ms[ms.index(vetoed[0]) + 1:]
    assert all(not m["prefilter_engaged"] for m in after), ms


def test_prefilter_stays_engaged_when_pruning_well(spark):
    """Healthy prune rates must NOT trip the veto (growing crawl:
    candidates are mostly fresh, prune rate is high)."""
    from crawlspark import frontier as fmod
    from crawlspark.frontier import CrawlConfig, crawl_bfs_virtual

    crawl_bfs_virtual(
        spark, 50_000,
        CrawlConfig(
            max_depth=6, prefilter_min_seen=1, prefilter_min_ratio=0.0,
            prefilter_buckets=4, prefilter_capacity=1 << 17,
            prefilter_min_prune=0.05, prefilter_prune_patience=2,
        ),
    ).count()
    ms = fmod.LAST_CRAWL_LEVEL_METRICS
    assert not any(m["prefilter_vetoed"] for m in ms), ms
    assert sum(m["prefilter_engaged"] for m in ms) >= 4, ms


def test_crawl_site_prune_veto_keeps_exactness(spark):
    """engine.crawl_site mirrors the frontier veto: with an absurd prune
    floor the filter disengages after `patience` waves mid-crawl and the
    output still matches the unfiltered run."""
    from crawlspark.engine import SiteCrawlConfig, crawl_site

    pages = _synth_corpus(spark, 300)
    seed = "https://site.example.com/p0"
    base = crawl_site(
        spark, pages, seed, SiteCrawlConfig(max_depth=4, prefilter_min_seen=None)
    ).orderBy("ord").collect()
    before = PartitionedSeenFilter.engagements
    out = crawl_site(
        spark, pages, seed,
        SiteCrawlConfig(
            max_depth=4, prefilter_min_seen=1, prefilter_min_ratio=0.0,
            prefilter_buckets=2, prefilter_capacity=1 << 16,
            prefilter_min_prune=1.01, prefilter_prune_patience=1,
        ),
    ).orderBy("ord").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in base]
    # engaged at least once, then vetoed: strictly fewer engagements than
    # a full prefiltered run of the same depth would record
    assert PartitionedSeenFilter.engagements > before


def test_veto_survives_checkpoint_resume(spark):
    """A vetoed filter must STAY vetoed across kill-and-resume: the veto
    rides the checkpoint level metadata, so the resumed run neither
    re-pays the O(|seen|) filter build nor re-probes for `patience` more
    waves."""
    import shutil
    import tempfile

    from crawlspark.frontier import CrawlConfig, crawl_bfs_virtual

    pf = dict(
        prefilter_min_seen=1, prefilter_min_ratio=0.0,
        prefilter_buckets=4, prefilter_capacity=1 << 17,
        prefilter_min_prune=1.01, prefilter_prune_patience=1,
    )
    base = crawl_bfs_virtual(
        spark, 50_000, CrawlConfig(max_depth=5, prefilter_min_seen=None)
    ).orderBy("ord").collect()
    d = tempfile.mkdtemp(prefix="ckpt-veto-")
    try:
        crawl_bfs_virtual(
            spark, 50_000, CrawlConfig(max_depth=3, checkpoint_dir=d, **pf)
        ).count()  # veto fires at depth 2 (patience=1)
        before = PartitionedSeenFilter.engagements
        out = crawl_bfs_virtual(
            spark, 50_000,
            CrawlConfig(max_depth=5, checkpoint_dir=d, resume=True, **pf),
        ).orderBy("ord").collect()
        assert PartitionedSeenFilter.engagements == before, (
            "resume re-engaged a vetoed filter"
        )
        assert [tuple(r) for r in out] == [tuple(r) for r in base]
    finally:
        shutil.rmtree(d, ignore_errors=True)
