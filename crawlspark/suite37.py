"""Round-3 queries, part 8: quadrant-crop repost detection and
politeness-constrained wave makespan bounds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MS_FETCHERS = 8


# --------------------------------------------------------------------------
# quadrant_crops
# --------------------------------------------------------------------------

def q_quadrant_crops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.quadrant_phashes + detect_quadrant_crops: every doc%6==0
    image gets a planted top-left-quadrant crop (lossless re-encode of
    the decoded quadrant, so the crop's whole-image phash equals the
    parent's tl quadrant hash BIT-FOR-BIT); the detector must return
    exactly the planted (crop, parent, 'tl') pairs — original mean
    hashes of independent random pixels never collide at 64 bits."""
    from .images import (
        crop_to_quadrant,
        detect_quadrant_crops,
        generate_images,
        quadrant_phashes,
    )

    imgs = generate_images(spark, sf_dir).select(
        "image_id", "bytes", "w", "h"
    )
    d = F.regexp_extract(F.col("image_id"), r"img-(\d+)", 1).cast("long")
    crops = crop_to_quadrant(imgs.filter(d % 6 == 0), quadrant="tl")
    both = imgs.unionByName(crops)
    return detect_quadrant_crops(quadrant_phashes(both)).orderBy("crop_id")


ORACLE_QUADRANT_CROPS = """
SELECT 'crop-img-' || CAST(doc_id AS VARCHAR) AS crop_id,
       'img-' || CAST(doc_id AS VARCHAR) AS parent_id,
       'tl' AS quadrant
FROM documents
WHERE doc_id % 6 = 0
ORDER BY crop_id
"""


# --------------------------------------------------------------------------
# wave_makespan
# --------------------------------------------------------------------------

def q_wave_makespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheduler.wave_makespan over 30 hosts (one planted critical host
    with a 200 s serial chain) at 8 fetchers: the P||Cmax lower bounds —
    max per-host serial time vs ceil(total/F) — and which side binds;
    the oracle replays both aggregates."""
    from .scheduler import wave_makespan

    i = F.col("id")
    backlog = spark.range(30).select(
        F.concat(F.lit("h"), i.cast("string")).alias("host"),
        F.when(i == 17, F.lit(1000)).otherwise(10 + (i * 13) % 90)
        .cast("long").alias("n_urls"),
        F.when(i == 17, F.lit(200)).otherwise(50 + (i % 7) * 25)
        .cast("long").alias("delay_ms"),
    )
    return wave_makespan(backlog, n_fetchers=MS_FETCHERS)


ORACLE_WAVE_MAKESPAN = f"""
WITH b AS (
  SELECT 'h' || CAST(range AS VARCHAR) AS host,
         CAST(CASE WHEN range = 17 THEN 1000
                   ELSE 10 + (range * 13) % 90 END AS BIGINT) AS n_urls,
         CAST(CASE WHEN range = 17 THEN 200
                   ELSE 50 + (range % 7) * 25 END AS BIGINT) AS delay_ms
  FROM range(30)
),
w AS (SELECT host, n_urls * delay_ms AS w_ms FROM b),
a AS (
  SELECT arg_max(host, w_ms) AS critical_host,
         MAX(w_ms) AS critical_ms,
         CAST((SUM(w_ms) + {MS_FETCHERS} - 1) // {MS_FETCHERS}
              AS BIGINT) AS volume_ms
  FROM w
)
SELECT critical_host, critical_ms, volume_ms,
       greatest(critical_ms, volume_ms) AS makespan_lb_ms,
       CASE WHEN critical_ms >= volume_ms THEN 'critical_host'
            ELSE 'volume' END AS bound
FROM a
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "quadrant_crops": q_quadrant_crops,
        "wave_makespan": q_wave_makespan,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "quadrant_crops": ORACLE_QUADRANT_CROPS,
        "wave_makespan": ORACLE_WAVE_MAKESPAN,
    }
