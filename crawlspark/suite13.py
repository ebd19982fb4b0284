"""Round-2 continuation queries, part 11: post-wave frontier
bookkeeping, MMC4-style text-image interleaving, reproducible
train/val/test splits.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .mmcurate import interleave_doc
from .scheduler import wave_completion
from .textops.curate import train_val_test_split


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# wave_completion — per-URL disposition after a fetch wave
# --------------------------------------------------------------------------

_WC_NOW = 1_000_000


def q_wave_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wave_completion over an 8-status outcome mix x attempt counts:
    2xx done, 3xx rewrite, 404/410 dead, 429/5xx retry with
    exponential backoff vs Retry-After (larger wins) until the attempt
    ceiling turns them dead, 418 dead."""
    doc = F.col("doc_id")
    status = (
        F.when(doc % 8 == 0, 200).when(doc % 8 == 1, 301)
        .when(doc % 8 == 2, 404).when(doc % 8 == 3, 410)
        .when(doc % 8 == 4, 429).when(doc % 8 == 5, 500)
        .when(doc % 8 == 6, 503).otherwise(418)
    ).cast("int")
    outcomes = _docs(spark, sf_dir).select(
        F.concat(F.lit("http://w.test/p/"), doc.cast("string")).alias("url"),
        status.alias("status"),
        (doc % 6).cast("long").alias("attempt"),
        F.when(doc % 3 == 0, (F.lit(120) + doc % 3000).cast("long"))
        .alias("retry_after_s"),
    )
    return wave_completion(outcomes, now_ts=_WC_NOW)


ORACLE_WAVE_COMPLETION = f"""
WITH o AS (
  SELECT doc_id,
         CAST(CASE CAST(doc_id % 8 AS INTEGER)
           WHEN 0 THEN 200 WHEN 1 THEN 301 WHEN 2 THEN 404
           WHEN 3 THEN 410 WHEN 4 THEN 429 WHEN 5 THEN 500
           WHEN 6 THEN 503 ELSE 418 END AS INTEGER) AS status,
         CAST(doc_id % 6 AS BIGINT) AS attempt,
         CASE WHEN doc_id % 3 = 0 THEN 120 + doc_id % 3000 END AS ra
  FROM documents
),
c AS (
  SELECT doc_id, status, attempt, ra,
         GREATEST(LEAST(3600, 60 * (1 << attempt)), COALESCE(ra, 0))
           AS wait,
         status = 429 OR (status >= 500 AND status < 600) AS retryable
  FROM o
),
d AS (
  SELECT *,
         CASE WHEN status >= 200 AND status < 300 THEN 'done'
              WHEN status >= 300 AND status < 400 THEN 'rewrite'
              WHEN status IN (404, 410) THEN 'dead'
              WHEN retryable AND attempt < 4 THEN 'retry'
              ELSE 'dead' END AS disposition
  FROM c
)
SELECT 'http://w.test/p/' || CAST(doc_id AS VARCHAR) AS url,
       status, attempt, disposition,
       CASE WHEN disposition = 'retry'
            THEN CAST({_WC_NOW} + wait AS BIGINT) END AS requeue_at,
       CASE WHEN disposition = 'retry' THEN attempt + 1 END AS next_attempt
FROM d
"""


# --------------------------------------------------------------------------
# interleave — MMC4-style multimodal document flattening
# --------------------------------------------------------------------------

def q_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """interleave_doc over 3 shapes on a fixed 6-token text: no images /
    one mid-text image / images at offset 0 AND mid-text (the leading
    empty text segment must drop and the seq numbering close the gap)."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    shape = doc % 3
    offsets = (
        F.when(shape == 0, F.array().cast("array<int>"))
        .when(shape == 1, F.array(F.lit(2)))
        .otherwise(F.array(F.lit(0), F.lit(4)))
    )
    image_ids = (
        F.when(shape == 0, F.array().cast("array<string>"))
        .when(shape == 1, F.array(F.concat(F.lit("i"), s, F.lit("a"))))
        .otherwise(F.array(F.concat(F.lit("i"), s, F.lit("a")),
                           F.concat(F.lit("i"), s, F.lit("b"))))
    )
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.lit("a b c d e f").alias("text"),
        offsets.alias("img_offsets"),
        image_ids.alias("image_ids"),
    )
    return interleave_doc(d)


ORACLE_INTERLEAVE = """
WITH d AS (SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS shape
           FROM documents)
SELECT doc_id, CAST(0 AS BIGINT) AS seq, 'text' AS kind,
       'a b c d e f' AS content
FROM d WHERE shape = 0
UNION ALL
SELECT doc_id, s.seq, s.kind,
       CASE s.seq WHEN 0 THEN 'a b'
                  WHEN 1 THEN 'i' || CAST(doc_id AS VARCHAR) || 'a'
                  ELSE 'c d e f' END
FROM d CROSS JOIN (VALUES (CAST(0 AS BIGINT), 'text'),
                          (CAST(1 AS BIGINT), 'image'),
                          (CAST(2 AS BIGINT), 'text')) AS s(seq, kind)
WHERE shape = 1
UNION ALL
SELECT doc_id, s.seq, s.kind,
       CASE s.seq WHEN 0 THEN 'i' || CAST(doc_id AS VARCHAR) || 'a'
                  WHEN 1 THEN 'a b c d'
                  WHEN 2 THEN 'i' || CAST(doc_id AS VARCHAR) || 'b'
                  ELSE 'e f' END
FROM d CROSS JOIN (VALUES (CAST(0 AS BIGINT), 'image'),
                          (CAST(1 AS BIGINT), 'text'),
                          (CAST(2 AS BIGINT), 'image'),
                          (CAST(3 AS BIGINT), 'text')) AS s(seq, kind)
WHERE shape = 2
"""


# --------------------------------------------------------------------------
# split — reproducible train/val/test assignment
# --------------------------------------------------------------------------

def q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """train_val_test_split over the corpus ids (900/50/50 permille) —
    assignment is a pure function of (salt, id), replayed by the
    md5-prefix hash."""
    return train_val_test_split(
        _docs(spark, sf_dir).select("doc_id")
    )


ORACLE_SPLIT = """
WITH b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('split1' || CAST(doc_id AS VARCHAR)),
                              1, 8)) AS BIGINT) % 1000 AS split_bucket
  FROM documents
)
SELECT doc_id, split_bucket,
       CASE WHEN split_bucket < 900 THEN 'train'
            WHEN split_bucket < 950 THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "wave_completion": q_wave_completion,
        "interleave": q_interleave,
        "split": q_split,
        "wave_fairness": q_wave_fairness,
        "thumb_pyramid": q_thumb_pyramid,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "wave_completion": ORACLE_WAVE_COMPLETION,
        "interleave": ORACLE_INTERLEAVE,
        "split": ORACLE_SPLIT,
        "wave_fairness": ORACLE_WAVE_FAIRNESS,
        "thumb_pyramid": ORACLE_THUMB_PYRAMID,
    }


# --------------------------------------------------------------------------
# wave_fairness — Jain's index over per-host wave allocation
# --------------------------------------------------------------------------

def q_wave_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wave_fairness over a deliberately skewed wave (half the slots on
    one hot host, the rest split across 10): the one-number politeness
    audit, replayed by the oracle's aggregate arithmetic."""
    from .scheduler import wave_fairness

    doc = F.col("doc_id")
    wave = _docs(spark, sf_dir).select(
        F.when(doc % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("h"), (doc % 10).cast("string")))
        .alias("host"),
    )
    return wave_fairness(wave)


ORACLE_WAVE_FAIRNESS = """
WITH w AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN 'hot'
              ELSE 'h' || CAST(doc_id % 10 AS VARCHAR) END AS host
  FROM documents
),
per AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS x FROM w GROUP BY host)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(SUM(x) AS BIGINT) AS n_slots,
       CAST((SUM(x) * SUM(x) * 1000) // (COUNT(*) * SUM(x * x)) AS BIGINT)
         AS fairness_scaled
FROM per
"""


# --------------------------------------------------------------------------
# thumb_pyramid — halving-level plan per image
# --------------------------------------------------------------------------

def q_thumb_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """thumbnail_pyramid_plan at min_side=16 over the input_hint dims
    (32..63 x 32..55): every image gets level 0 and level 1; a level 2
    (short edge >= 64 after one halving) never occurs at these dims —
    the oracle enumerates k and filters by the same integer shifts."""
    from .images import thumbnail_pyramid_plan

    doc = F.col("doc_id")
    dims = _docs(spark, sf_dir).select(
        F.concat(F.lit("img-"), doc.cast("string")).alias("image_id"),
        (F.lit(32) + doc % 32).cast("int").alias("w"),
        (F.lit(32) + doc % 24).cast("int").alias("h"),
    )
    return thumbnail_pyramid_plan(dims, min_side=16)


ORACLE_THUMB_PYRAMID = """
WITH d AS (
  SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
         32 + doc_id % 32 AS w, 32 + doc_id % 24 AS h
  FROM documents
)
SELECT image_id, CAST(k AS INTEGER) AS level,
       CAST(w // (1 << k) AS INTEGER) AS w,
       CAST(h // (1 << k) AS INTEGER) AS h,
       CAST((w // (1 << k)) * (h // (1 << k)) * 3 AS BIGINT) AS est_bytes
FROM d CROSS JOIN (VALUES (0), (1), (2), (3)) AS lv(k)
WHERE k = 0 OR LEAST(w, h) // (1 << k) >= 16
"""
