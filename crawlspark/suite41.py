"""Round-3 queries, part 12: image quality gates for training-data
curation — blur (Laplacian energy), information content (byte-histogram
entropy), and solid-colour detection (dominant 512-bucket share).

The planted families make every metric a closed form the oracle can
state exactly (see images._quality_pixels): flat banner, linear ramp,
checkerboard, 1-px stripes at fixed 64x32.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .images import (
    QUALITY_FAMILIES,
    image_quality_stats,
    planted_quality_images,
)


def q_image_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.planted_quality_images -> image_quality_stats: one fused
    Arrow stage computes Laplacian sharpness energy, channel-0 byte
    entropy (milli-bits) and the dominant 3-bit-RGB bucket share per
    image; is_junk = solid colour OR zero entropy OR zero Laplacian
    (flat + ramp junk, checker + stripes keep).  Family is rederived
    from the id so the plan stays linear — no self-join.  The oracle
    states each family's closed form (interior = 62*30 = 1860,
    checker |L| = 800, stripes |L| = 192, ramp entropy = log2(64))."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    stats = image_quality_stats(planted_quality_images(docs))
    doc = F.element_at(F.split("image_id", "-"), 2).cast("long")
    fam = F.element_at(
        F.array(*[F.lit(f) for f in QUALITY_FAMILIES]), (doc % 4 + 1).cast("int")
    )
    return (
        stats.select(
            doc.alias("doc_id"),
            fam.alias("family"),
            "sharp_energy",
            "interior",
            "entropy_mbits",
            "top_bucket",
            "top_share_permille",
            (
                (F.col("top_share_permille") == 1000)
                | (F.col("entropy_mbits") == 0)
                | (F.col("sharp_energy") == 0)
            ).alias("is_junk"),
        )
        .orderBy("doc_id")
    )


ORACLE_IMAGE_QUALITY = """
SELECT doc_id,
       CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 'flat' WHEN 1 THEN 'ramp'
         WHEN 2 THEN 'checker' ELSE 'stripes' END AS family,
       CAST(CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 2 THEN 800 * 1860 WHEN 3 THEN 192 * 1860
         ELSE 0 END AS BIGINT) AS sharp_energy,
       CAST(1860 AS BIGINT) AS interior,
       CAST(CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 0 WHEN 1 THEN 6000 ELSE 1000 END AS BIGINT)
         AS entropy_mbits,
       CAST(CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 146 ELSE 0 END AS BIGINT) AS top_bucket,
       CAST(CASE CAST(doc_id % 4 AS INTEGER)
         WHEN 0 THEN 1000 ELSE 500 END AS BIGINT) AS top_share_permille,
       CAST(doc_id % 4 AS INTEGER) IN (0, 1) AS is_junk
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "image_quality": q_image_quality,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "image_quality": ORACLE_IMAGE_QUALITY,
    }
