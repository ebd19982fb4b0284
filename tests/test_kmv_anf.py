"""KMV distinct sketch + ANF neighbourhood function properties:
merge associativity, below-saturation exactness, estimator accuracy,
and ANF == exact BFS ball sizes while balls stay under k."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crawlspark.linkgraph import anf_counters, harmonic_centrality_from_anf
from crawlspark.sketch import kmv_build, kmv_estimates, kmv_merge


def _keys(spark, n, mod, grp_mod=4):
    return spark.range(n).select(
        (F.col("id") % grp_mod).alias("g"),
        ((F.col("id") * 2654435761) % mod).alias("k"),
    )


def test_kmv_exact_below_saturation(spark):
    # 4 groups, <= 5 distinct keys each, k=8 -> estimates are exact counts
    df = _keys(spark, 200, 5)
    est = kmv_estimates(kmv_build(df, "g", "k", k=8), k=8).collect()
    truth = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
    }
    assert {r["grp"]: r["est"] for r in est} == truth
    assert all(r["n_kept"] == truth[r["grp"]] for r in est)


def test_kmv_merge_equals_whole(spark):
    whole = _keys(spark, 400, 97)
    # split by key parity: merge of the halves' sketches == whole's sketch
    lo = whole.filter(F.col("k") % 2 == 0)
    hi = whole.filter(F.col("k") % 2 == 1)
    merged = kmv_merge(
        kmv_build(lo, "g", "k", k=8), kmv_build(hi, "g", "k", k=8), k=8
    )
    direct = kmv_build(whole, "g", "k", k=8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_kmv_estimator_accuracy(spark):
    # one group, ~3000 distinct keys, k=64: estimate within 35% of truth
    df = spark.range(3000).select(
        F.lit(0).alias("g"), ((F.col("id") * 48271) % 100003).alias("k")
    )
    truth = df.select(F.countDistinct("k")).first()[0]
    est = kmv_estimates(kmv_build(df, "g", "k", k=64), k=64).first()["est"]
    assert truth * 0.65 <= est <= truth * 1.35


def _ring_graph(spark, n):
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = nodes.select(
        F.col("node").alias("src"), ((F.col("node") + 1) % n).alias("dst")
    )
    return nodes, edges


def test_anf_exact_on_ring_below_k(spark):
    # directed ring: ball(v, r) has exactly r+1 nodes; with k=8 > 3+1
    # every counter stays below saturation -> estimates are EXACT
    nodes, edges = _ring_graph(spark, 12)
    anf = anf_counters(nodes, edges, iters=3, k=8).collect()
    for row in anf:
        assert row["est"] == row["r"] + 1
        assert row["n_kept"] == row["r"] + 1


def test_anf_monotone_nondecreasing(spark):
    nodes, edges = _ring_graph(spark, 12)
    extra = nodes.select(
        F.col("node").alias("src"), ((F.col("node") * 5 + 2) % 12).alias("dst")
    )
    anf = anf_counters(nodes, edges.union(extra), iters=3, k=4)
    rows = {(r["node"], r["r"]): r["est"] for r in anf.collect()}
    for v in range(12):
        for r in range(1, 4):
            assert rows[(v, r)] >= rows[(v, r - 1)]


def test_harmonic_centrality_exact_on_ring(spark):
    # ring, exact balls: HC(v) = sum_{r=1..3} 1/r in micro-units
    nodes, edges = _ring_graph(spark, 12)
    hc = harmonic_centrality_from_anf(
        anf_counters(nodes, edges, iters=3, k=8), iters=3
    ).collect()
    expect = 1_000_000 + 1_000_000 // 2 + 1_000_000 // 3
    assert all(r["hc_micros"] == expect for r in hc)
