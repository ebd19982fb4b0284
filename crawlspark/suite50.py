"""Round-3 queries, part 21: frame-padding and tiled-texture gates.

- letterbox: planted black letterbox/pillarbox bars detected by the
  real pixel-scan path (uniform edge rows/cols); content crop dims.
- sprite_detect: planted 8x8 sprite sheets detected by distinct-tile
  counting over the real decode path.

Both oracles state the PLANTED ground truth from doc_id arithmetic
(same discipline as image_near_dup): the Spark side runs the actual
Arrow-batched decode + detect, the oracle knows what was planted.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .images import (detect_letterbox, detect_sprite_sheets,
                     generate_images, plant_letterbox,
                     plant_sprite_sheets)


def q_letterbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.detect_letterbox over generate_images with planted bars
    (doc%4==0: top 2+doc%3 / bottom 1+doc%2 rows; doc%4==1: left
    1+doc%3 / right 1+doc%2 cols).  Detection scans REAL decoded
    pixels; the oracle predicts the plant and the content crop."""
    imgs = plant_letterbox(generate_images(spark, sf_dir))
    return detect_letterbox(imgs).orderBy("image_id")


ORACLE_LETTERBOX = """
WITH d AS (
  SELECT doc_id,
         CAST(32 + doc_id % 32 AS BIGINT) AS w,
         CAST(32 + doc_id % 24 AS BIGINT) AS h,
         CAST(CASE WHEN doc_id % 4 = 0 THEN 2 + doc_id % 3 ELSE 0 END
              AS BIGINT) AS bt,
         CAST(CASE WHEN doc_id % 4 = 0 THEN 1 + doc_id % 2 ELSE 0 END
              AS BIGINT) AS bb,
         CAST(CASE WHEN doc_id % 4 = 1 THEN 1 + doc_id % 3 ELSE 0 END
              AS BIGINT) AS bl,
         CAST(CASE WHEN doc_id % 4 = 1 THEN 1 + doc_id % 2 ELSE 0 END
              AS BIGINT) AS br
  FROM documents
)
SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
       bt AS bar_top, bb AS bar_bottom, bl AS bar_left, br AS bar_right,
       w - bl - br AS content_w, h - bt - bb AS content_h
FROM d ORDER BY image_id
"""


def q_sprite_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.detect_sprite_sheets over generate_images with planted
    sprite sheets (doc%7==3 becomes one 8x8 tile repeated over the
    frame).  Distinct-tile counting runs on real decoded pixels; the
    oracle predicts tile-grid size from dims_for and the plant."""
    imgs = plant_sprite_sheets(generate_images(spark, sf_dir))
    return detect_sprite_sheets(imgs).orderBy("image_id")


ORACLE_SPRITE = """
WITH d AS (
  SELECT doc_id,
         ((32 + doc_id % 24) // 8) * ((32 + doc_id % 32) // 8) AS nt
  FROM documents
)
SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
       CAST(nt AS BIGINT) AS n_tiles,
       CAST(CASE WHEN doc_id % 7 = 3 THEN 1 ELSE nt END AS BIGINT)
         AS n_distinct_tiles,
       doc_id % 7 = 3 AS is_tiled
FROM d ORDER BY image_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "letterbox": q_letterbox,
        "sprite_detect": q_sprite_detect,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "letterbox": ORACLE_LETTERBOX,
        "sprite_detect": ORACLE_SPRITE,
    }
