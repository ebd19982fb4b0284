"""End-to-end pipeline: BFS crawl -> image+caption payloads -> validated
input_hint-schema results table (the north-rule artifact).

BASELINE per-row invariants asserted, not assumed: PSNR >= 40 dB for lossy
formats, exact pixels for lossless, phash equality, exact caption match."""

import numpy as np

from crawlspark import images, pipeline
from crawlspark.frontier import CrawlConfig

SF = "/root/testdata/sf0.001"


def test_pipeline_lands_validated_payloads(spark, tmp_path):
    out = str(tmp_path / "sink")
    m = pipeline.run_pipeline(spark, SF, out, CrawlConfig(max_depth=4))
    assert m["crawled"] > 0
    # the deterministic codec round-trips every payload within the gates
    assert m["landed"] == m["crawled"]
    assert m["quarantined"] == 0

    landed = spark.read.parquet(f"{out}/results")
    assert landed.count() == m["landed"]
    # exact input_hint schema + provenance
    assert [f.name for f in landed.schema.fields] == pipeline.RESULT_SCHEMA_COLS

    # spot-check one row's pixel/caption invariants independently
    r = landed.orderBy("ord").first()
    doc_id = int(r.image_id.split("-", 1)[1])
    ref = images._pixels(doc_id, r.w, r.h)
    got = images._decode(bytes(r.bytes), r.w, r.h)
    if r.fmt == "png":
        assert (got == ref).all()
    else:
        mse = float(((got.astype(np.float64) - ref.astype(np.float64)) ** 2).mean())
        assert 10 * np.log10(255.0 ** 2 / mse) >= 40.0
    assert images._phash64(got) == r.phash


def test_pipeline_provenance_matches_crawl(spark, tmp_path):
    cfg = CrawlConfig(max_depth=3)
    table = pipeline.crawl_to_image_table(spark, SF, cfg)
    from crawlspark.frontier import crawl_bfs

    crawled = {(r.url, r.depth, r.ord) for r in crawl_bfs(spark, SF, cfg).collect()}
    got = {(r.url, r.depth, r.ord) for r in table.collect()}
    assert got == crawled  # one payload row per crawled page, same provenance


def test_pipeline_null_text_quarantined_not_dropped(spark, tmp_path):
    """NULL document text makes ref_caption NULL; under three-valued logic
    '' == NULL is NULL and the row used to vanish from BOTH the landed and
    quarantine filters (regression).  It must quarantine, and the metric
    counts must sum."""
    from pyspark.sql import functions as F

    from crawlspark.pipeline import run_pipeline

    docs = spark.range(0, 30).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("word "), F.col("id").cast("string")))
        .alias("text"),
    )
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    m = run_pipeline(spark, sf, str(tmp_path / "out"), CrawlConfig(max_depth=3))
    assert m["crawled"] == m["landed"] + m["quarantined"]
    assert m["quarantined"] > 0  # the NULL-text docs
