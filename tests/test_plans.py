"""Physical-plan assertions — the at-scale properties BENCH.md claims,
checked mechanically so they can't silently regress:

- parquet scans get predicate pushdown + column pruning;
- the seen-set anti-join broadcasts when small and shuffles when broadcast
  is impossible (the 10^10-row regime);
- the politeness schedule's two window passes share ONE Exchange;
- JVM hot paths (canonicalize, fingerprint, minhash, politeness) contain
  zero Python evaluation nodes;
- the ANN query block is broadcast, never the corpus.
"""

from pyspark.sql import functions as F

from crawlspark import ann, politeness
from crawlspark.canon import canonicalize_expr, url_hash
from crawlspark.textops import dedup

SF_DIR = "/root/testdata/sf0.001"

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_scan_pushdown_and_pruning(spark):
    d = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") > 100)
        .select("doc_id", "lang")
    )
    p = plan_of(d)
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]" in p
    # column pruning: only the 2 projected columns reach the scan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in p


def test_seen_antijoin_broadcasts_when_small(spark):
    urls = spark.read.parquet(f"{SF}/documents.parquet").select(
        url_hash(canonicalize_expr(F.concat(F.lit("http://x.test/"),
                                            F.col("doc_id")))).alias("url_hash")
    )
    seen = spark.range(100).select(url_hash(F.concat(
        F.lit("http://x.test/"), F.col("id"))).alias("url_hash"))
    j = urls.join(seen, "url_hash", "left_anti")
    assert "BroadcastHashJoin" in plan_of(j)


def test_seen_antijoin_shuffles_when_broadcast_impossible(spark):
    # the 10^10-row seen set can never broadcast; with the threshold off the
    # plan must fall back to a shuffled anti-join, not fail or collect
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        urls = spark.range(1000).select(F.col("id").alias("url_hash"))
        seen = spark.range(500).select(F.col("id").alias("url_hash"))
        p = plan_of(urls.join(seen, "url_hash", "left_anti"))
        assert "BroadcastHashJoin" not in p
        assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_politeness_schedule_single_exchange(spark):
    pages = spark.range(10_000).select(
        F.concat(F.lit("http://h"), (F.col("id") % 50).cast("string"),
                 F.lit(".test/p")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 50).cast("string")).alias("host"),
        (F.col("id") % 900 + 100).alias("latency_ms"),
        F.col("id").alias("ord"),
    )
    sched = politeness.throttle_schedule(
        pages, host_col="host", ord_col="ord", latency_col="latency_ms"
    )
    p = plan_of(sched)
    # both window passes (seq/wait and the running sums) must reuse one
    # hash-partitioning by host — a second Exchange would double the shuffle
    # at every BFS level ("(n) Exchange" = one physical node's detail header)
    import re

    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p


def test_jvm_hot_paths_have_no_python_nodes(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    jobs = {
        "canon+hash": docs.select(
            url_hash(canonicalize_expr(F.concat(F.lit("HTTP://A.Test:80/x?b=2&a=1#f"),
                                                F.col("doc_id")))).alias("h")
        ),
        "minhash": dedup.minhash_signature(docs, k=8),
        "simhash": dedup.simhash16(docs),
    }
    for name, df in jobs.items():
        p = plan_of(df)
        for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert bad not in p, f"{name} plan contains {bad}"


def test_ann_broadcasts_queries_not_corpus(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan_of(ann.brute_topk(emb, n_queries=10, k=5))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    # the corpus filter (vec_id >= 10) must be pushed to its scan
    assert "GreaterThanOrEqual(vec_id,10)" in p


def test_wave_whole_stage_codegen(spark):
    from crawlspark import graph

    docs = graph.virtual_docs(spark, 10_000)
    wave = docs.select(
        canonicalize_expr(graph.url_col(F.col("src"))).alias("url_norm")
    ).withColumn("url_hash", url_hash(F.col("url_norm")))
    # formatted mode marks whole-stage-codegen stages with "[codegen id : n]"
    assert "codegen id :" in plan_of(wave)


def test_global_prefix_sum_correct_and_distributed(spark):
    """engine.py's maxOutputs cut: exclusive prefix sum via the two-phase
    pattern — values match the single-partition window, and the at-scale
    path has no single-partition Exchange."""
    from crawlspark.ranks import SMALL_LEVEL_ROWS, global_prefix_sum

    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("ord"), (F.col("id") % 3 == 0).alias("yield_flag")
    )
    # force the large-path plan despite the small input
    big = global_prefix_sum(
        df, ["ord"], "yield_flag", out="p", num_rows=SMALL_LEVEL_ROWS + 1
    )
    got = {r["ord"]: r["p"] for r in big.collect()}
    expected, acc = {}, 0
    for i in range(n):
        expected[i] = acc
        acc += 1 if i % 3 == 0 else 0
    assert got == expected

    small = global_prefix_sum(df, ["ord"], "yield_flag", out="p", num_rows=n)
    assert {r["ord"]: r["p"] for r in small.collect()} == expected


def test_global_prefix_sum_plan_no_single_partition(spark):
    from crawlspark.ranks import SMALL_LEVEL_ROWS, global_prefix_sum

    df = spark.range(1000).select(
        F.col("id").alias("ord"), (F.col("id") % 2 == 0).alias("yield_flag")
    )
    out = global_prefix_sum(
        df, ["ord"], "yield_flag", out="p", num_rows=SMALL_LEVEL_ROWS + 1
    )
    # the result is localCheckpointed; assert on the plan it was built from:
    # re-derive the same shape and check no SinglePartition exchange
    from pyspark.sql import Window

    ranged = df.repartitionByRange(8, F.col("ord"))
    w = Window.partitionBy("__pid").orderBy("ord")
    shaped = (
        ranged.withColumn("__pid", F.spark_partition_id())
        .withColumn("p", F.sum(F.col("yield_flag").cast("long")).over(w))
    )
    p = plan_of(shaped)
    assert "SinglePartition" not in p
    assert out.count() == 1000


def test_mmcurate_filter_is_narrow_scan_fused(spark):
    """caption_pair_filter must be a pure narrow projection: no Exchange,
    no Python/Arrow nodes — at 100 TB it fuses into the parquet scan."""
    from crawlspark import mmcurate

    imgs = spark.createDataFrame(
        [("a", 50, 50, "one two three")], "image_id string, w int, h int, caption string"
    )
    p = plan_of(mmcurate.caption_pair_filter(imgs))
    assert "Exchange" not in p
    for bad in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert bad not in p


def test_mmcurate_bucket_stats_single_aggregate_exchange(spark):
    """aspect_bucket_stats: exactly one shuffle (the partial->final agg on
    the 3-value bucket key), map-side combined."""
    import re

    from crawlspark import mmcurate

    imgs = spark.createDataFrame(
        [("a", 50, 50, "one two three")], "image_id string, w int, h int, caption string"
    )
    p = plan_of(mmcurate.aspect_bucket_stats(imgs))
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert p.count("HashAggregate") >= 2  # partial + final


def test_phash_banding_plan_no_cartesian(spark):
    """The banded near-dup pair join must be an equi-join on the exploded
    (band_idx, band_val) key — never a cartesian/nested-loop product."""
    from crawlspark import images as _images

    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "image_id string, phash long"
    )
    p = plan_of(_images.near_dup_images_by_phash(df, max_dist=6))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or ("BroadcastHashJoin" in p)


def test_paragraph_dedup_plan_broadcast_antijoin_no_global_window(spark):
    """The frequent-paragraph removal must be a BROADCAST anti-join (heavy
    hitters are few) and reassembly must not use an unpartitioned window."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    p = plan_of(dedup.paragraph_dedup(docs, min_docs=3))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "Window" not in p  # order restored via sort_array, not a window
    assert "partial_count" in p  # map-side combine on the freq agg


def test_semdedup_plan_codebook_broadcast_partitioned_windows_only(spark):
    """The codebook broadcasts (assignment is a narrow pass); every window
    is partitioned (no single-partition collapse); the intra-cluster pair
    join keys on cent_id."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan_of(ann.semdedup(emb, n_centroids=4, eps_permille=800))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    # every window is partitioned (no single-partition collapse): the
    # per-vector assignment argmin partitions by vid, the max_cluster_size
    # comparator cap by cent_id
    import re
    specs = re.findall(r"windowspecdefinition\((\w*)", p)
    assert specs and all(
        s.startswith("vid") or s.startswith("cent_id") for s in specs
    ), specs


def test_decontaminate_plan_bench_side_broadcast(spark):
    from crawlspark.textops.curate import decontaminate

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    bench = docs.filter("doc_id % 17 = 0")
    p = plan_of(decontaminate(docs, bench, n=8))
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    assert "partial_count" in p  # per-doc count map-side combined


def test_strip_tracking_and_bpe_encode_narrow_jvm(spark):
    """Both new string ops must be pure narrow Column maps: no Exchange,
    no Python eval nodes — they fuse into the parquet scan."""
    from crawlspark.canon import strip_tracking_params
    from crawlspark.suite5 import FROZEN_MERGES
    from crawlspark.textops.bpe import bpe_encode_col

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stripped = docs.select(
        strip_tracking_params(
            F.concat(F.lit("http://h.test/p?a=1&utm_x="), F.col("doc_id"))
        ).alias("u")
    )
    p = plan_of(stripped)
    assert "Exchange" not in p
    assert "Python" not in p

    enc = docs.select(
        bpe_encode_col(F.col("text"), FROZEN_MERGES, rounds=2).alias("t")
    )
    p2 = plan_of(enc)
    assert "Exchange" not in p2
    assert "Python" not in p2


def test_temperature_sample_broadcasts_rate_table(spark):
    """The derived rate table (O(#sources) rows) must reach the corpus via
    a broadcast join — the corpus itself never shuffles."""
    from crawlspark.textops.curate import temperature_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source"
    )
    out = temperature_sample(docs)
    p = plan_of(out)
    assert "BroadcastHashJoin" in p
    # no shuffle of the big side: the only Exchanges feed the tiny
    # count/max aggregates and the broadcast, never partition the corpus
    # by source for a sort-merge join
    assert "SortMergeJoin" not in p


def test_ip_group_admission_window_is_partitioned(spark):
    from crawlspark.politeness import ip_group_admission

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id"),
        F.concat(F.lit("v"), (F.col("doc_id") % 40).cast("string")).alias(
            "host"
        ),
        F.col("doc_id").alias("ord"),
    )
    out = ip_group_admission(docs, budget=5, n_groups=8)
    p = plan_of(out)
    assert "hashpartitioning(ip_group" in p
    assert "SinglePartition" not in p


def test_chunk_tokens_is_narrow_no_exchange(spark):
    """Overlapping chunking must stay a pure narrow fan-out fused into
    the scan: no Exchange, no Python eval node at any corpus size."""
    from crawlspark.textops.curate import chunk_tokens

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    p = plan_of(chunk_tokens(df))
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_img_srcset_extraction_is_narrow(spark):
    """srcset parse + candidate pick: regexp/HOF projection only."""
    from pyspark.sql import functions as F

    from crawlspark.extract import img_srcset_candidates

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("text").alias("body"),
        F.lit("http://h.test/p/x.html").alias("page_url"),
    )
    p = plan_of(df.select(
        img_srcset_candidates(F.col("body"), F.col("page_url")).alias("c")
    ))
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_wave_by_bytes_single_host_exchange(spark):
    """Per-host byte cut: ONE hash exchange on host (seq + running sum
    share the window partitioning), nothing unpartitioned."""
    import re as _re

    from pyspark.sql import functions as F

    from crawlspark.scheduler import select_wave_by_bytes

    doc = F.col("id")
    frontier = spark.range(10_000).select(
        F.concat(F.lit("h"), (doc % 50).cast("string")).alias("host"),
        F.concat(F.lit("u"), doc.cast("string")).alias("url"),
        (doc % 97).cast("long").alias("priority"),
        (doc % 13).cast("long").alias("crawl_ts"),
        (F.lit(1000) + doc % 5000).cast("long").alias("est_bytes"),
    )
    p = plan_of(select_wave_by_bytes(frontier, host_byte_budget=100_000))
    assert len(_re.findall(r"\(\d+\) Exchange", p)) == 1, p
    assert "SinglePartition" not in p, p


def test_full_canonical_is_narrow(spark):
    """The composed identity chain stays a pure projection: no Exchange,
    no Python nodes — it runs fused into the 10^10-row frontier scan."""
    from crawlspark.canon import full_canonical

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.concat(F.lit("http://h.test/a/./b/p"),
                 F.col("doc_id").cast("string"),
                 F.lit("?utm_source=x&z=1")).alias("url")
    )
    p = plan_of(df.select(full_canonical(F.col("url")).alias("c")))
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_caption_and_feed_extractors_are_narrow(spark):
    """Caption-pair mining and feed parsing: regexp/HOF projections only."""
    from crawlspark.extract import feed_items, image_caption_pairs

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("text").alias("body"),
        F.lit("http://h.test/p/x.html").alias("page_url"),
    )
    p1 = plan_of(df.select(image_caption_pairs(
        F.col("body"), F.col("page_url")).alias("c")))
    p2 = plan_of(df.select(feed_items(F.col("body")).alias("i")))
    for p in (p1, p2):
        assert "Exchange" not in p, p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
