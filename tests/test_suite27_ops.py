"""Round-3 part-7 operators: count-min sketch, path-prefix rollup."""

import numpy as np
from pyspark.sql import functions as F


def test_cms_never_undercounts_and_exact_when_sparse(spark):
    from crawlspark.sketch import cms_build, cms_estimate

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 50, size=2000).tolist()
    df = spark.createDataFrame([(int(k),) for k in keys], "k long")
    cms = cms_build(df, "k", depth=4, width=512)
    probes = spark.createDataFrame([(k,) for k in range(50)], "k long")
    est = {r["k"]: r["est"] for r in
           cms_estimate(cms, probes, "k", depth=4, width=512).collect()}
    import collections
    truth = collections.Counter(keys)
    for k in range(50):
        assert est[k] >= truth[k], k          # one-sided guarantee
    # 50 keys in 4x512 cells: collisions are unlikely -> mostly exact
    exact = sum(1 for k in range(50) if est[k] == truth[k])
    assert exact >= 45


def test_cms_absent_key_is_zero_when_no_collision(spark):
    from crawlspark.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    cms = cms_build(df, "k", depth=4, width=1024)
    probes = spark.createDataFrame([(999,)], "k long")
    est = cms_estimate(cms, probes, "k", depth=4, width=1024).collect()[0]
    assert est["est"] == 0  # 3 keys in 4096 cells: no collision


def test_cms_merge_equals_single_build(spark):
    """Build over two halves + cellwise add == build over the whole —
    the mergeability that makes the sketch distributable."""
    from crawlspark.sketch import cms_build

    rows = [(i % 13,) for i in range(400)]
    df = spark.createDataFrame(rows, "k long")
    whole = cms_build(df, "k", depth=3, width=64)
    h1 = cms_build(spark.createDataFrame(rows[:200], "k long"), "k",
                   depth=3, width=64)
    h2 = cms_build(spark.createDataFrame(rows[200:], "k long"), "k",
                   depth=3, width=64)
    merged = (
        h1.unionByName(h2).groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    a = {(r["row"], r["bucket"]): r["cnt"] for r in whole.collect()}
    b = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert a == b


def test_path_prefix_rollup_depth_cap_and_root(spark):
    from crawlspark.canon import path_prefix_rollup

    urls = [
        ("https://x.test/a/b/c/d/e.html", 10),
        ("https://x.test/a/b/z.html", 5),
        ("https://x.test/", 99),          # no segments -> no rows
        ("https://x.test/a/", 7),
    ]
    df = spark.createDataFrame(urls, "url string, nbytes long")
    got = {
        (r["host"], r["prefix"]): (r["n_urls"], r["total_bytes"], r["depth"])
        for r in path_prefix_rollup(df, bytes_col="nbytes",
                                    max_depth=2).collect()
    }
    assert got[("x.test", "/a/")] == (3, 22, 1)
    assert got[("x.test", "/a/b/")] == (2, 15, 2)
    # depth capped at 2: no /a/b/c/ row
    assert ("x.test", "/a/b/c/") not in got
    # the bare-root URL contributed nothing anywhere
    assert sum(v[0] for v in got.values()) == 5
