"""Tests for round-3 part-2 ops: image variant folding, boilerplate
captions, fixed-size bucket batches."""

from pyspark.sql import functions as F

from crawlspark.extract import fold_image_variants
from crawlspark.mmcurate import bucket_batches, caption_boilerplate


def test_variant_fold_dpr_beats_original(spark):
    urls = spark.createDataFrame(
        [("https://c.ex/a.jpg",), ("https://c.ex/a@2x.jpg",),
         ("https://c.ex/a-300x200.jpg",)],
        "url STRING",
    )
    row = fold_image_variants(urls).collect()[0]
    assert row["stem"] == "https://c.ex/a.jpg"
    assert row["n_variants"] == 3
    assert row["chosen_url"] == "https://c.ex/a@2x.jpg"


def test_variant_fold_original_beats_downscales(spark):
    urls = spark.createDataFrame(
        [("https://c.ex/b.png",), ("https://c.ex/b_640w.png",),
         ("https://c.ex/b_1280w.png",)],
        "url STRING",
    )
    row = fold_image_variants(urls).collect()[0]
    assert row["chosen_url"] == "https://c.ex/b.png"
    assert row["n_variants"] == 3


def test_variant_fold_largest_downscale_without_original(spark):
    urls = spark.createDataFrame(
        [("https://c.ex/c-300x200.webp",), ("https://c.ex/c-600x400.webp",)],
        "url STRING",
    )
    row = fold_image_variants(urls).collect()[0]
    assert row["chosen_url"] == "https://c.ex/c-600x400.webp"
    assert row["chosen_rank"] == 600


def test_variant_fold_yearlike_suffix_is_not_a_variant(spark):
    # 'report-2024.jpg' has no WxH / _Nw / @kx shape -> its own stem
    urls = spark.createDataFrame(
        [("https://c.ex/report-2024.jpg",), ("https://c.ex/report.jpg",)],
        "url STRING",
    )
    out = {r["stem"] for r in fold_image_variants(urls).collect()}
    assert out == {"https://c.ex/report-2024.jpg", "https://c.ex/report.jpg"}


def test_caption_boilerplate_normalization_and_flag(spark):
    pairs = spark.createDataFrame(
        [("  Stock Photo ", 1), ("stock photo", 2), ("STOCK PHOTO", 3),
         ("mona lisa", 7), ("mona lisa", 7), ("mona lisa", 7)],
        "caption STRING, phash LONG",
    )
    rows = {r["caption_norm"]: r for r in
            caption_boilerplate(pairs, min_distinct_images=3).collect()}
    sp = rows["stock photo"]
    assert sp["n_pairs"] == 3 and sp["n_distinct_images"] == 3
    assert sp["is_boilerplate"]
    # one image reposted many times is NOT boilerplate alt-text
    ml = rows["mona lisa"]
    assert ml["n_pairs"] == 3 and ml["n_distinct_images"] == 1
    assert not ml["is_boilerplate"]


def test_bucket_batches_shape(spark):
    # 10 tall + 17 wide, batch=4 -> tall: 2 full batches + 2 dropped;
    # wide: 4 full + 1 dropped; batch_uid contiguous over buckets
    rows = [(f"t{i:02d}", "tall") for i in range(10)]
    rows += [(f"w{i:02d}", "wide") for i in range(17)]
    imgs = spark.createDataFrame(rows, "image_id STRING, bucket STRING")
    out = bucket_batches(imgs, batch_size=4).collect()

    kept = [r for r in out if r["kept"]]
    dropped = [r for r in out if not r["kept"]]
    assert len(dropped) == (10 % 4) + (17 % 4)
    assert all(r["batch_uid"] is None for r in dropped)

    by_batch = {}
    for r in kept:
        by_batch.setdefault(r["batch_uid"], []).append(r)
    assert sorted(by_batch) == list(range(2 + 4))  # contiguous global ids
    for members in by_batch.values():
        assert len(members) == 4
        assert sorted(m["slot"] for m in members) == [0, 1, 2, 3]
        assert len({m["bucket"] for m in members}) == 1  # never mixed


def test_bucket_batches_exact_multiple_drops_nothing(spark):
    imgs = spark.createDataFrame(
        [(f"x{i}", "square") for i in range(8)],
        "image_id STRING, bucket STRING",
    )
    out = bucket_batches(imgs, batch_size=4).collect()
    assert all(r["kept"] for r in out)
    assert {r["batch_uid"] for r in out} == {0, 1}
