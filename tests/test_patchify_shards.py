"""ViT patch extraction and WebDataset shard packing."""

import numpy as np
from pyspark.sql import functions as F

from crawlspark import images, mmcurate


def test_patchify_known_pixels(spark):
    # 16x8 image: top 8x8 patch all 10s, bottom 8x8 patch all 200s
    px = np.empty((16, 8, 3), dtype=np.uint8)
    px[:8] = 10
    px[8:] = 200
    enc = images._encode(px, "png")  # png is lossless in the fake codec
    df = spark.createDataFrame(
        [("img-t", bytearray(enc), 8, 16)],
        "image_id string, bytes binary, w int, h int",
    )
    rows = sorted(images.patchify(df, patch=8).collect(), key=lambda r: r["py"])
    assert len(rows) == 2
    top, bot = rows
    assert (top["py"], top["px"]) == (0, 0)
    assert (top["mean_r_milli"], top["mean_g_milli"], top["mean_b_milli"]) == (
        10_000, 10_000, 10_000,
    )
    assert (bot["py"], bot["px"]) == (1, 0)
    assert bot["mean_r_milli"] == 200_000
    # raw patch bytes round-trip to the original pixel block
    got = np.frombuffer(bytes(top["patch"]), dtype=np.uint8).reshape(8, 8, 3)
    assert (got == 10).all()


def test_patchify_drops_partial_edges(spark):
    px = np.zeros((10, 17, 3), dtype=np.uint8)  # 1x2 full 8px patches
    df = spark.createDataFrame(
        [("img-e", bytearray(images._encode(px, "png")), 17, 10)],
        "image_id string, bytes binary, w int, h int",
    )
    assert images.patchify(df, patch=8).count() == 2


def test_shard_assign_offsets_and_global_ids(spark):
    df = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 100), (3, "a", 100), (4, "a", 100),
         (5, "b", 300), (6, "b", 10)],
        "image_id long, bucket string, nbytes long",
    )
    rows = {r["image_id"]: r for r in mmcurate.shard_assign(
        df, target_bytes=250).collect()}
    assert [rows[i]["shard_ix"] for i in (1, 2, 3, 4)] == [0, 0, 0, 1]
    assert [rows[i]["offset_in_shard"] for i in (1, 2, 3, 4)] == [0, 100, 200, 50]
    # bucket a has 2 shards -> bucket b's global ids start at 2
    assert [rows[i]["shard_uid"] for i in (5, 6)] == [2, 3]
    assert rows[6]["offset_in_shard"] == 50


def test_shard_assign_data_window_is_partitioned(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "image_id long, bucket string, nbytes long"
    )
    plan = (
        mmcurate.shard_assign(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the per-row cumulative sum is partitioned by bucket; only the tiny
    # bucket->base numbering (one row per bucket) is a global window
    assert "windowspecdefinition(bucket" in plan
    assert "BroadcastHashJoin" in plan  # bases join is broadcast
