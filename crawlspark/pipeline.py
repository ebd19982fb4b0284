"""End-to-end crawl -> image+caption table (the north-rule artifact).

Composes the existing stages into the full flow a production run executes:

  BFS crawl (exact ordering, seen-set)           frontier.crawl_bfs
    -> map crawled URL back to its document       JVM regexp (no Python)
    -> fetch + decode the page's image payload    images mapInPandas batch
    -> validate: PSNR >= 40 dB vs reference       images.validate_images
       pixels, caption exact equality
    -> append to the results table in the         sinks (parquet stand-in
       BASELINE input_hint schema                 for Iceberg)
       (image_id, bytes, w, h, fmt, caption, phash) + crawl provenance

Reference parity: the reference stores each yielded response as a Result
row (src/Crawler.php:282-307); ours lands the image+caption payload of
each yielded page with its (depth, ord) crawl provenance — the BASELINE
per-row invariant (decoded-pixel allclose, caption equality) is asserted
by the validation columns, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import images
from .frontier import CrawlConfig, crawl_bfs

RESULT_SCHEMA_COLS = [
    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
    "url", "depth", "ord",
]


def crawl_to_image_table(
    spark: SparkSession,
    sf_dir: str,
    cfg: CrawlConfig | None = None,
) -> DataFrame:
    """Run the BFS crawl, then fetch+validate each crawled page's image
    payload; returns the input_hint-schema table with crawl provenance and
    validation columns (valid, caption_ok, psnr_mdb).

    The crawl result is joined to the payload generator on doc_id — an
    equi-join Catalyst plans as broadcast or shuffled hash depending on
    level size; the payload generation/validation is one Arrow-batched
    stage per partition (no per-row Python)."""
    cfg = cfg or CrawlConfig()
    crawled = crawl_bfs(spark, sf_dir, cfg)
    # crawled URL ends in its document id (graph.url_col): /d/<doc> or /x/<doc>
    crawled = crawled.withColumn(
        "doc_id", F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
    )
    # generate payloads ONLY for crawled documents (left-semi before the
    # codec stage): a shallow crawl over a huge corpus must not pay the
    # encode/decode/phash work for rows the final inner join would discard
    all_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    crawled_docs = all_docs.join(
        crawled.select("doc_id"), "doc_id", "left_semi"
    )
    payload = images.generate_images(spark, sf_dir, docs=crawled_docs)
    checks = images.validate_images(payload).select(
        "image_id", "psnr_mdb", "lossless_ok", "phash_match"
    )
    validated = payload.join(checks, "image_id").withColumn(
        "doc_id", F.regexp_extract("image_id", r"(\d+)$", 1).cast("long")
    )
    # BASELINE invariant: PSNR >= 40 dB for lossy, exact pixels for
    # lossless, phash equality
    valid = (
        (F.col("psnr_mdb") >= 40_000)
        & F.col("lossless_ok")
        & F.col("phash_match")
    )
    # caption invariant: exact equality vs the reference derivation
    # (first CAPTION_WORDS whitespace-normalized words of the document)
    docs = all_docs.select(
        "doc_id", images.ref_caption_col(F.col("text")).alias("ref_caption")
    )
    joined = crawled.join(validated, "doc_id").join(docs, "doc_id")
    # NULL-safe: a NULL text makes ref_caption NULL and '' == NULL is NULL
    # under three-valued logic — such a row must land in the quarantine
    # bucket, not vanish from both filters
    caption_ok = F.coalesce(F.col("caption") == F.col("ref_caption"), F.lit(False))
    return joined.select(
        *RESULT_SCHEMA_COLS,
        F.coalesce(valid, F.lit(False)).alias("valid"),
        caption_ok.alias("caption_ok"),
        "psnr_mdb",
    )


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    cfg: CrawlConfig | None = None,
) -> dict:
    """Execute the pipeline, append to the results table, return metrics.

    Refuses to land invalid payloads (PSNR gate or caption mismatch) — they
    go to a quarantine table instead, like the reference suppresses
    non-matching responses rather than yielding them."""
    result = crawl_to_image_table(spark, sf_dir, cfg).cache()
    ok = result.filter(F.col("valid") & F.col("caption_ok"))
    bad = result.filter(~(F.col("valid") & F.col("caption_ok")))
    ok.select(*RESULT_SCHEMA_COLS).write.mode("append").parquet(f"{out_dir}/results")
    n_bad = bad.count()
    if n_bad:
        bad.select(*RESULT_SCHEMA_COLS).write.mode("append").parquet(
            f"{out_dir}/quarantine"
        )
    metrics = {
        "crawled": result.count(),
        "landed": ok.count(),
        "quarantined": n_bad,
    }
    result.unpersist()
    return metrics


def training_set(
    spark: SparkSession,
    sf_dir: str,
    cfg: CrawlConfig | None = None,
) -> DataFrame:
    """The complete crawl -> training-data flow, every stage engaged:

      crawl_to_image_table (BFS + payload fetch + PSNR/caption validation)
        -> multimodal pair curation      mmcurate.keep_expr (narrow, JVM)
        -> phash near-dup pairs          images.near_dup_images_by_phash
           (pigeonhole-banded, exact recall at max_dist=6)
        -> dedup grouping                textops.dedup.connected_components
        -> keep one row per group        component representative (min id)
        -> aspect bucket assignment      mmcurate.aspect_bucket_col

    Returns (image_id, depth, bucket): the canonical training rows with
    crawl provenance and their batch bucket.  The dedup stages run on the
    (image_id, phash) projection only — the payload bytes never enter the
    pair join — and the curation filter runs before pair generation, so
    dropped rows never pay the banding shuffle.
    """
    from . import mmcurate
    from .textops.dedup import connected_components

    t = crawl_to_image_table(spark, sf_dir, cfg)
    ok = t.filter(F.col("valid") & F.col("caption_ok"))
    kept = ok.filter(mmcurate.keep_expr())
    pairs = images.near_dup_images_by_phash(
        kept.select("image_id", "phash"), max_dist=6
    )
    comp = connected_components(pairs, src="id_a", dst="id_b").withColumnRenamed(
        "node", "image_id"
    )
    canon = (
        kept.join(comp, "image_id", "left")
        .withColumn("group_rep", F.coalesce("component", "image_id"))
        .filter(F.col("group_rep") == F.col("image_id"))
    )
    return canon.select(
        "image_id",
        "depth",
        mmcurate.aspect_bucket_col(
            F.col("w").cast("long"), F.col("h").cast("long")
        ).alias("bucket"),
    )
