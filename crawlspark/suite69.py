"""Round-3 queries, part 19: late-event correction deltas,
k-connection politeness, GPU pad alignment, resolution-family folding.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# late_deltas
# --------------------------------------------------------------------------

def q_late_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.late_correction_deltas: finalized window counts for
    even windows only; late events hit both emitted and never-emitted
    windows; the oracle replays the grouped join."""
    from .streaming import late_correction_deltas

    doc = F.col("doc_id")
    finalized = _docs(spark, sf_dir).filter(doc % 2 == 0).select(
        F.concat(F.lit("k"), (doc % 10).cast("string")).alias("key"),
        (doc % 40).cast("long").alias("window_start"),
        (10 + doc % 40 % 7).cast("long").alias("n_events"),
    ).dropDuplicates(["key", "window_start"])
    late = _docs(spark, sf_dir).filter(doc % 3 == 0).select(
        F.concat(F.lit("k"), (doc % 10).cast("string")).alias("key"),
        (doc % 50).cast("long").alias("window_start"),
    )
    return late_correction_deltas(finalized, late).orderBy(
        "key", "window_start")


ORACLE_LATE_DELTAS = """
WITH fin AS (
  SELECT DISTINCT ON (key, window_start)
         'k' || (doc_id % 10) AS key,
         CAST(doc_id % 40 AS BIGINT) AS window_start,
         CAST(10 + doc_id % 40 % 7 AS BIGINT) AS old_n
  FROM documents WHERE doc_id % 2 = 0
  ORDER BY key, window_start, doc_id
),
lt AS (
  SELECT 'k' || (doc_id % 10) AS key,
         CAST(doc_id % 50 AS BIGINT) AS window_start,
         CAST(COUNT(*) AS BIGINT) AS delta
  FROM documents WHERE doc_id % 3 = 0
  GROUP BY 1, 2
)
SELECT lt.key, lt.window_start,
       COALESCE(fin.old_n, 0) AS old_n, lt.delta,
       COALESCE(fin.old_n, 0) + lt.delta AS new_n,
       fin.old_n IS NOT NULL AS was_emitted
FROM lt LEFT JOIN fin
  ON fin.key = lt.key AND fin.window_start = lt.window_start
ORDER BY lt.key, lt.window_start
"""


# --------------------------------------------------------------------------
# parallel_throttle
# --------------------------------------------------------------------------

def q_parallel_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """politeness.parallel_throttle_schedule with 3 lanes over 20
    hosts; the oracle replays the per-host row_number lane/time
    arithmetic."""
    from .politeness import parallel_throttle_schedule

    doc = F.col("doc_id")
    frontier = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 20).cast("string")).alias("host"),
        doc.cast("long").alias("ord"),
        (100 * (1 + doc % 20 % 3)).cast("long").alias("delay_ms"),
    )
    return parallel_throttle_schedule(
        frontier, connections=3).orderBy("host", "ord")


ORACLE_PARALLEL_THROTTLE = """
WITH f AS (
  SELECT 'h' || (doc_id % 20) AS host, doc_id AS ord,
         CAST(100 * (1 + doc_id % 20 % 3) AS BIGINT) AS delay_ms,
         ROW_NUMBER() OVER (PARTITION BY doc_id % 20 ORDER BY doc_id) - 1
           AS seq
  FROM documents
)
SELECT host, ord, delay_ms,
       CAST(seq % 3 AS INTEGER) AS lane,
       CAST((seq // 3) * delay_ms AS BIGINT) AS dispatch_ms
FROM f
ORDER BY host, ord
"""


# --------------------------------------------------------------------------
# pad_alignment
# --------------------------------------------------------------------------

def q_pad_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.pad_alignment_cost at align=64 over 17x13-derived dims
    (incl. exact multiples and a zero-area row); oracle replays the
    ceil arithmetic."""
    from .images import pad_alignment_cost

    doc = F.col("doc_id")
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.when(doc % 9 == 0, F.lit(0)).otherwise(17 * (1 + doc % 30))
        .cast("long").alias("w"),
        (13 * (1 + doc % 23)).cast("long").alias("h"),
    )
    return pad_alignment_cost(imgs).select(
        "doc_id", "w", "h", "pad_w", "pad_h", "px", "padded_px",
        "waste_permille",
    ).orderBy("doc_id")


ORACLE_PAD_ALIGNMENT = """
WITH d AS (
  SELECT doc_id,
         CAST(CASE WHEN doc_id % 9 = 0 THEN 0
              ELSE 17 * (1 + doc_id % 30) END AS BIGINT) AS w,
         CAST(13 * (1 + doc_id % 23) AS BIGINT) AS h
  FROM documents
),
p AS (
  SELECT doc_id, w, h,
         CAST(((w + 63) // 64) * 64 AS BIGINT) AS pad_w,
         CAST(((h + 63) // 64) * 64 AS BIGINT) AS pad_h
  FROM d
)
SELECT doc_id, w, h, pad_w, pad_h,
       w * h AS px, pad_w * pad_h AS padded_px,
       CASE WHEN w * h > 0
            THEN (1000 * (pad_w * pad_h - w * h)) // (w * h) END
         AS waste_permille
FROM p
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# resolution_family
# --------------------------------------------------------------------------

def q_resolution_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.resolution_family_fold over 50 families each published
    as -WxH, -Nw, @2x and bare variants; the oracle regroups the
    expected family keys and best widths."""
    from .images import resolution_family_fold

    doc = F.col("doc_id")
    fam = F.expr("doc_id div 4 % 50").cast("string")
    m = doc % 4
    url = (
        F.when(m == 0, F.concat(F.lit("http://c/p/hero"), fam,
                                F.lit("-1920x1080.jpg")))
        .when(m == 1, F.concat(F.lit("http://c/p/hero"), fam,
                               F.lit("-800w.jpg")))
        .when(m == 2, F.concat(F.lit("http://c/p/hero"), fam,
                               F.lit("@2x.jpg")))
        .otherwise(F.concat(F.lit("http://c/p/hero"), fam,
                            F.lit(".jpg")))
    )
    imgs = _docs(spark, sf_dir).select(url.alias("image_url")).distinct()
    return resolution_family_fold(imgs).orderBy("family_key")


ORACLE_RESOLUTION_FAMILY = """
SELECT 'http://c/p/hero' || f.fam AS family_key,
       CAST(4 AS BIGINT) AS n_variants,
       CAST(1920 AS BIGINT) AS best_w,
       'http://c/p/hero' || f.fam || '-1920x1080.jpg' AS best_url
FROM (SELECT DISTINCT doc_id // 4 % 50 AS fam FROM documents) f
ORDER BY family_key
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "late_deltas": q_late_deltas,
        "parallel_throttle": q_parallel_throttle,
        "pad_alignment": q_pad_alignment,
        "resolution_family": q_resolution_family,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "late_deltas": ORACLE_LATE_DELTAS,
        "parallel_throttle": ORACLE_PARALLEL_THROTTLE,
        "pad_alignment": ORACLE_PAD_ALIGNMENT,
        "resolution_family": ORACLE_RESOLUTION_FAMILY,
    }
