"""Streaming image-payload validation: north-rule invariants per
micro-batch, two-sink landed/quarantine split, batch provenance."""

from pyspark.sql import functions as F

from crawlspark import images, streaming

SF_DIR = "/root/testdata/sf0.001"


def test_image_validation_stream_two_batches(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    imgs = images.generate_images(spark, SF_DIR, docs=docs)
    did = F.regexp_extract("image_id", r"(\d+)$", 1).cast("long")
    # corrupt the caption on doc_id % 7 == 0 rows -> must be quarantined
    broken = imgs.withColumn(
        "caption",
        F.when(did % 7 == 0, F.lit("WRONG caption")).otherwise(F.col("caption")),
    ).localCheckpoint(eager=True)

    src = str(tmp_path / "src")
    # two source files => two micro-batches at maxFilesPerTrigger=1
    broken.filter(did % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    broken.filter(did % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    ref = docs.select(
        F.concat(F.lit("img-"), F.col("doc_id").cast("string")).alias(
            "image_id"
        ),
        images.ref_caption_col(F.col("text")).alias("ref_caption"),
    )
    out = str(tmp_path / "out")
    streaming.image_validation_stream(
        spark, src, out, str(tmp_path / "ckpt"), ref
    )

    landed = spark.read.parquet(f"{out}/results")
    quar = spark.read.parquet(f"{out}/quarantine")
    total = landed.count() + quar.count()
    assert total == broken.count()

    # exactly the corrupted rows are quarantined, every other row lands
    bad_ids = {
        r["image_id"]
        for r in broken.filter(did % 7 == 0).select("image_id").collect()
    }
    got_bad = {r["image_id"] for r in quar.select("image_id").collect()}
    assert got_bad == bad_ids
    assert quar.filter(F.col("caption_ok")).count() == 0
    assert landed.filter(~(F.col("valid") & F.col("caption_ok"))).count() == 0

    # two micro-batches, provenance recorded
    assert landed.select("batch_id").distinct().count() == 2


def test_image_validation_stream_replay_idempotent(spark, tmp_path):
    """Replaying a batch (crash between write and checkpoint commit,
    simulated with a fresh checkpoint dir over the same out_dir) must
    REPLACE its batch_id partition, not append duplicates (ADVICE r2)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    imgs = images.generate_images(spark, SF_DIR, docs=docs).localCheckpoint(
        eager=True
    )
    src = str(tmp_path / "src")
    imgs.coalesce(1).write.mode("append").parquet(src)
    ref = docs.select(
        F.concat(F.lit("img-"), F.col("doc_id").cast("string")).alias(
            "image_id"
        ),
        images.ref_caption_col(F.col("text")).alias("ref_caption"),
    )
    out = str(tmp_path / "out")
    streaming.image_validation_stream(
        spark, src, out, str(tmp_path / "ckpt1"), ref
    )
    n_first = spark.read.parquet(f"{out}/results").count()
    streaming.image_validation_stream(
        spark, src, out, str(tmp_path / "ckpt2"), ref
    )
    landed = spark.read.parquet(f"{out}/results")
    assert landed.count() == n_first
    assert landed.select("image_id").distinct().count() == n_first
