"""Quadrant-crop detection invariants + makespan bound arithmetic."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawlspark.images import (
    crop_to_quadrant,
    detect_quadrant_crops,
    generate_images,
    quadrant_phashes,
)
from crawlspark.scheduler import wave_makespan

SF = "/root/testdata/sf0.001"


def test_all_four_quadrants_detected(spark):
    imgs = generate_images(spark, SF).select("image_id", "bytes", "w", "h")
    d = F.regexp_extract(F.col("image_id"), r"img-(\d+)", 1).cast("long")
    some = imgs.filter(d % 25 == 0)
    both = imgs
    for q in ("tl", "tr", "bl", "br"):
        both = both.unionByName(
            crop_to_quadrant(some, quadrant=q, id_prefix=f"{q}-")
        )
    pairs = detect_quadrant_crops(quadrant_phashes(both)).collect()
    got = {(r["crop_id"], r["parent_id"]): r["quadrant"] for r in pairs}
    parents = [r["image_id"] for r in some.select("image_id").collect()]
    assert parents
    for p in parents:
        for q in ("tl", "tr", "bl", "br"):
            assert got[(f"{q}-{p}", p)] == q
    # nothing beyond the planted pairs
    assert len(got) == 4 * len(parents)


def test_supernode_cap_drops_flat_hash(spark):
    # plant one image whose tl-quadrant hash repeats on MANY parents:
    # with a low cap those pairs must vanish, real pairs survive
    imgs = generate_images(spark, SF).select("image_id", "bytes", "w", "h")
    d = F.regexp_extract(F.col("image_id"), r"img-(\d+)", 1).cast("long")
    some = imgs.filter(d % 25 == 0)
    both = imgs.unionByName(crop_to_quadrant(some, quadrant="tl"))
    qp = quadrant_phashes(both)
    # forge: give every parent the SAME tl hash as one planted crop's whole
    crop_hash = qp.filter(F.col("image_id").startswith("crop-")).first()[
        "phash_whole"
    ]
    forged = qp.withColumn(
        "phash_tl",
        F.when(F.col("image_id").startswith("img-"), F.lit(crop_hash))
        .otherwise(F.col("phash_tl")),
    )
    pairs = detect_quadrant_crops(forged, supernode_cap=5)
    # the forged hash appears on ~50 parents > cap -> all its pairs dropped
    assert pairs.filter(F.col("quadrant") == "tl").count() == 0


def test_wave_makespan_bounds(spark):
    backlog = spark.createDataFrame(
        [("a", 10, 100), ("b", 2, 100), ("c", 1, 100)],
        ["host", "n_urls", "delay_ms"],
    )
    r = wave_makespan(backlog, n_fetchers=2).first()
    # work: a=1000, b=200, c=100; volume = ceil(1300/2) = 650 < 1000
    assert r["critical_host"] == "a"
    assert r["critical_ms"] == 1000
    assert r["volume_ms"] == 650
    assert r["makespan_lb_ms"] == 1000
    assert r["bound"] == "critical_host"
    r2 = wave_makespan(backlog, n_fetchers=1).first()
    assert r2["volume_ms"] == 1300 and r2["bound"] == "volume"
