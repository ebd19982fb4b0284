#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., plus urls_per_sec and the N vs 4N scaling evidence}.

The north-star metric (BASELINE.json) is frontier URLs processed/sec; the
scaling criterion (>=0.8 efficiency from N to 4N executors) is evidenced by
running the same frontier wave at local[8] and local[32] (no real cluster in
this sandbox).  Set SPARK_GRAFT_SCALING=0 to skip the scaling runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
VIRTUAL_N = int(os.environ.get("SPARK_GRAFT_VIRTUAL_N", "2000000"))
# sizes chosen so per-job fixed overhead (~4 s) is <5% of the 8-core time;
# smaller jobs understate efficiency (measured: 32M wave -> 0.36, 64M -> 0.91)
SCALING_N = int(os.environ.get("SPARK_GRAFT_SCALING_N", "64000000"))
IMG_SCALING_N = int(os.environ.get("SPARK_GRAFT_IMG_SCALING_N", "200000"))


def _sf() -> float:
    try:
        return float(SF_DIR.rstrip("/").rsplit("sf", 1)[1])
    except Exception:
        return -1.0


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


WAVE_HOSTS = 65536  # realistic host cardinality so per-host windows parallelize


def frontier_wave(spark, n: int) -> int:
    """One politeness-ordered frontier wave over n virtual URLs — the
    engine's per-level hot path: canonicalize -> fingerprint -> robots gate
    -> seen anti-join -> host-bucket queue + throttle schedule."""
    from crawlspark import graph, politeness
    from crawlspark.canon import canonicalize_expr, host_bucket, url_hash

    docs = graph.virtual_docs(spark, n)
    doc = F.col("src")
    urls = docs.select(
        doc.alias("doc"),
        graph.url_col(doc).alias("url"),
        F.concat(F.lit("h"), (doc % WAVE_HOSTS).cast("string"),
                 F.lit("." + graph.DOMAIN)).alias("host"),
        graph.latency_ms_col(doc).alias("latency_ms"),
    )
    urls = urls.withColumn("url_norm", canonicalize_expr(F.col("url")))
    urls = urls.withColumn("url_hash", url_hash(F.col("url_norm")))
    urls = urls.filter(~graph.blocked_col(F.col("doc")))  # robots gate
    seen = graph.virtual_docs(spark, n).filter(F.col("src") % 5 == 0).select(
        url_hash(canonicalize_expr(graph.url_col(F.col("src")))).alias("url_hash")
    )
    fresh = urls.join(seen, "url_hash", "left_anti")
    # JVM window schedule: measured 2.5x faster than the mapInPandas
    # in-task variant when no Python fetch is involved (Arrow transfer of
    # the whole wave dominates); the in-task shape is for the real fetch
    # stage where rows must cross into Python anyway.
    sched = politeness.throttle_schedule(
        fresh.withColumn("ord", F.col("doc")),
        host_col="host", ord_col="ord", latency_col="latency_ms",
    )
    return sched.select(F.count("*"), F.sum("fetch_end_ms")).collect()[0][0]


def run_headline(spark) -> dict[str, float]:
    from crawlspark import ann, images
    from crawlspark import suite
    from crawlspark.frontier import CrawlConfig, crawl_bfs, crawl_bfs_virtual
    from crawlspark.textops import dedup

    qs: dict[str, float] = {}

    t, _ = timed(lambda: crawl_bfs(spark, SF_DIR, CrawlConfig(max_depth=12)).count())
    qs["crawl_bfs_depth12"] = t

    # seed-list expansion (the north-star shape): 10k seeds, frontier covers
    # most of the space within a few levels
    t, nrows = timed(
        lambda: crawl_bfs_virtual(
            spark, VIRTUAL_N, CrawlConfig(max_depth=6, num_seeds=10_000)
        ).count()
    )
    qs["crawl_virtual_seeded"] = t
    qs["_crawl_virtual_rows"] = float(nrows)

    t, nf = timed(lambda: frontier_wave(spark, VIRTUAL_N))
    qs["frontier_wave_2m"] = t
    qs["_frontier_wave_rows"] = float(nf)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t, _ = timed(
        lambda: dedup.minhash_lsh_pairs(docs, k=16, bands=4, jaccard_threshold=0.5).count()
    )
    qs["dedup_minhash_lsh"] = t

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    t, _ = timed(lambda: ann.brute_topk(emb, n_queries=50, k=10).count())
    qs["ann_brute_topk"] = t

    t, _ = timed(lambda: images.validate_images(images.generate_images(spark, SF_DIR)).count())
    qs["images_generate_validate"] = t

    t, _ = timed(lambda: suite.q_sessionize(spark, SF_DIR).count())
    qs["sessionize"] = t
    t, _ = timed(lambda: suite.q_keep_collect(spark, SF_DIR).count())
    qs["keep_collect"] = t
    return qs


def image_codec_job(spark, n: int) -> int:
    """Compute-bound engine stage: image encode+decode+phash+PSNR validation
    in Arrow-batched Python workers (process-parallel, GIL-free)."""
    from crawlspark import images

    return images.validate_images(images.generate_images_virtual(spark, n)).count()


def run_at_cores(cores: int, jobs: dict) -> dict:
    """Fresh session at the given parallelism; job time only (session
    startup excluded; small warm-up first)."""
    from crawlspark.session import get_spark

    spark = get_spark(app_name=f"bench-{cores}", cores=cores,
                      shuffle_partitions=2 * cores)
    out = {}
    try:
        frontier_wave(spark, 50_000)  # warm-up (codegen, arrow init)
        image_codec_job(spark, 2_000)
        for name, (fn, n) in jobs.items():
            t, _ = timed(lambda: fn(spark, n))
            out[name] = t
        return out
    finally:
        spark.stop()


def main() -> None:
    from crawlspark.session import get_spark

    result: dict = {"sf": _sf()}
    spark = get_spark(app_name="bench", cores=CPUS)
    qs = run_headline(spark)
    spark.stop()

    extras = {k: v for k, v in qs.items() if k.startswith("_")}
    queries = {k: round(v, 3) for k, v in qs.items() if not k.startswith("_")}
    total = sum(queries.values())
    urls_per_sec = extras["_frontier_wave_rows"] / qs["frontier_wave_2m"]
    crawl_urls_per_sec = extras["_crawl_virtual_rows"] / qs["crawl_virtual_seeded"]

    scaling = None
    if SCALING:
        jobs = {
            f"frontier_wave_{SCALING_N}": (frontier_wave, SCALING_N),
            f"image_codec_{IMG_SCALING_N}": (image_codec_job, IMG_SCALING_N),
        }
        t_n = run_at_cores(8, jobs)
        t_4n = run_at_cores(32, jobs)
        scaling = {
            "cores_n": 8,
            "cores_4n": 32,
            "jobs": {
                name: {
                    "t_n_sec": round(t_n[name], 3),
                    "t_4n_sec": round(t_4n[name], 3),
                    "speedup": round(t_n[name] / t_4n[name], 3),
                    "efficiency": round(t_n[name] / (4 * t_4n[name]), 3),
                }
                for name in jobs
            },
        }

    result.update(
        {
            "metric": "headline_suite_seconds",
            "value": round(total, 3),
            "unit": "sec",
            "queries": queries,
            "frontier_urls_per_sec": round(urls_per_sec, 1),
            "crawl_urls_per_sec": round(crawl_urls_per_sec, 1),
            "crawl_virtual_rows": int(extras["_crawl_virtual_rows"]),
        }
    )
    if scaling:
        result["scaling"] = scaling
    print(json.dumps(result))


if __name__ == "__main__":
    main()
