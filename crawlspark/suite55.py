"""Round-3 queries, part 5: JPEG encode-quality estimation from DQT
tables, MinHash-LSH banding planner, https mixed-content audit, and
Bloom sizing for cold seen-set partitions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# jpeg_quality
# --------------------------------------------------------------------------

def _qt_hex(scale) -> F.Column:
    """Hex of the 64 scaled std-luminance entries under the IJG formula
    S_i = max(1, (base_i*scale + 50) div 100) — the exact arithmetic
    jcparam.c jpeg_add_quant_table performs, restated by the oracle."""
    from .images import STD_LUMA_QT

    parts = []
    for base in STD_LUMA_QT:
        s_i = F.greatest(
            F.lit(1).cast("long"),
            ((F.lit(base) * scale + 50) / 100).cast("long"),
        )
        parts.append(F.lpad(F.hex(s_i), 2, "0"))
    return F.concat(*parts)


def _qt_hex_chroma(scale) -> F.Column:
    from .images import STD_CHROMA_QT

    parts = []
    for base in STD_CHROMA_QT:
        s_i = F.greatest(
            F.lit(1).cast("long"),
            ((F.lit(base) * scale + 50) / 100).cast("long"),
        )
        parts.append(F.lpad(F.hex(s_i), 2, "0"))
    return F.concat(*parts)


def q_jpeg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.jpeg_dqt_quality over constructed JPEGs: quality q =
    50 + doc%46 planted via the IJG scaling formula (scale = 200-2q),
    every third doc carries the chroma table too (2 tables in one DQT
    segment), every seventh doc has no DQT at all (NULL family); the
    oracle restates table sums and the integer estimator in closed
    form."""
    from .images import jpeg_dqt_quality

    doc = F.col("doc_id")
    q = (50 + doc % 46).cast("long")
    scale = (200 - 2 * q).cast("long")
    app0 = F.lit("FFE0" "0010" "4A46494600010100000100010000")
    dqt_one = F.concat(F.lit("FFDB" "0043" "00"), _qt_hex(scale))
    dqt_two = F.concat(
        F.lit("FFDB" "0084" "00"), _qt_hex(scale),
        F.lit("01"), _qt_hex_chroma(scale),
    )
    sof = F.lit("FFC0" "0011" "08" "0040" "0040"
                "03" "011100" "021101" "031101")
    hexstr = (
        F.when(doc % 7 == 0, F.concat(F.lit("FFD8"), app0, F.lit("FFD9")))
        .when(doc % 3 == 0, F.concat(F.lit("FFD8"), app0, dqt_two,
                                     sof, F.lit("FFD9")))
        .otherwise(F.concat(F.lit("FFD8"), app0, dqt_one,
                            sof, F.lit("FFD9")))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return jpeg_dqt_quality(imgs).select(
        "doc_id", "dqt_sum", "dqt_tables",
        "jpeg_scale_est", "jpeg_quality_est",
    ).orderBy("doc_id")


ORACLE_JPEG_QUALITY = """
WITH base(v) AS (
  SELECT UNNEST([16,11,10,16,24,40,51,61,
                 12,12,14,19,26,58,60,55,
                 14,13,16,24,40,57,69,56,
                 14,17,22,29,51,87,80,62,
                 18,22,37,56,68,109,103,77,
                 24,35,55,64,81,104,113,92,
                 49,64,78,87,103,121,120,101,
                 72,92,95,98,112,100,103,99])
),
d AS (
  SELECT doc_id, 200 - 2*(50 + doc_id % 46) AS scale FROM documents
),
sums AS (
  SELECT d.doc_id,
         CAST(SUM(GREATEST(1, (base.v * d.scale + 50) // 100))
              AS BIGINT) AS s
  FROM d CROSS JOIN base GROUP BY d.doc_id
),
est AS (
  SELECT doc_id, s, (100*s + 1844) // 3688 AS sc FROM sums
)
SELECT e.doc_id,
       CASE WHEN e.doc_id % 7 = 0 THEN NULL ELSE e.s END AS dqt_sum,
       CASE WHEN e.doc_id % 7 = 0 THEN NULL
            WHEN e.doc_id % 3 = 0 THEN 2 ELSE 1 END AS dqt_tables,
       CASE WHEN e.doc_id % 7 = 0 THEN NULL ELSE e.sc END
         AS jpeg_scale_est,
       CASE WHEN e.doc_id % 7 = 0 THEN NULL
            WHEN e.sc <= 100 THEN (200 - e.sc + 1) // 2
            ELSE (5000 + e.sc // 2) // e.sc END AS jpeg_quality_est
FROM est e
ORDER BY e.doc_id
"""


# --------------------------------------------------------------------------
# lsh_plan
# --------------------------------------------------------------------------

def q_lsh_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.dedup.lsh_band_plan for 17 target thresholds (100..900
    permille) over a 128-hash signature: per threshold the (bands,
    rows) split minimizing S-curve fp+fn mass at t +/- 100, score in
    micro units, ties to fewer bands; the oracle enumerates the same
    divisor pairs and replays the argmin."""
    from .textops.dedup import lsh_band_plan

    ts = _docs(spark, sf_dir).select(
        (100 + (F.col("doc_id") % 17) * 50).cast("long")
        .alias("t_permille")
    ).distinct()
    return lsh_band_plan(ts, n_hashes=128).orderBy("t_permille")


ORACLE_LSH_PLAN = """
WITH ts AS (
  SELECT DISTINCT 100 + (doc_id % 17) * 50 AS t_permille FROM documents
),
cand(b, r) AS (
  SELECT UNNEST([1,2,4,8,16,32,64,128]),
         UNNEST([128,64,32,16,8,4,2,1])
),
scored AS (
  SELECT t.t_permille, c.b, c.r,
         CAST(ROUND(1e6 * (
           (1 - POWER(1 - POWER(GREATEST(0.0, (t.t_permille - 100)/1000.0),
                                c.r), c.b))
           + POWER(1 - POWER(LEAST(1.0, (t.t_permille + 100)/1000.0),
                             c.r), c.b)
         )) AS BIGINT) AS score_micro
  FROM ts t CROSS JOIN cand c
)
SELECT t_permille, CAST(b AS BIGINT) AS bands,
       CAST(r AS BIGINT) AS rows_per_band, score_micro,
       CAST(ROUND(1000 * POWER(1.0/b, 1.0/r)) AS BIGINT)
         AS thr_est_permille
FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY t_permille
                           ORDER BY score_micro, b) = 1
ORDER BY t_permille
"""


# --------------------------------------------------------------------------
# mixed_content
# --------------------------------------------------------------------------

def q_mixed_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.mixed_content_audit over constructed pages: even docs
    are https (secure context) and carry one http script, one http img
    and one https img; every third doc adds an http stylesheet link;
    odd docs are plain http and must audit clean.  upgraded URLs
    joined with ' ' (array-free compare)."""
    from .extract import mixed_content_audit

    doc = F.col("doc_id")
    url = F.when(
        doc % 2 == 0,
        F.concat(F.lit("https://site"), doc.cast("string"),
                 F.lit(".example/p")),
    ).otherwise(
        F.concat(F.lit("http://site"), doc.cast("string"),
                 F.lit(".example/p")))
    sheet = F.when(
        doc % 3 == 0,
        F.lit('<link rel="stylesheet" href="http://cdn.example/a.css">'),
    ).otherwise(F.lit(""))
    body = F.concat(
        F.lit('<html><head><script src="http://js.example/x.js"></script>'),
        sheet,
        F.lit('</head><body><img src="http://img'),
        doc.cast("string"),
        F.lit('.example/pic.jpg"><img src="https://img.example/ok.png">'
              "</body></html>"),
    )
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), url.alias("url"), body.alias("body"))
    audited = mixed_content_audit(pages)
    return audited.select(
        "doc_id", "n_blockable", "n_upgradable",
        F.array_join("upgraded", " ").alias("upgraded_urls"),
    ).orderBy("doc_id")


ORACLE_MIXED_CONTENT = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 2 = 0
            THEN 1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
            ELSE 0 END AS BIGINT) AS n_blockable,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS n_upgradable,
       CASE WHEN doc_id % 2 = 0
            THEN 'https://img' || CAST(doc_id AS VARCHAR)
                 || '.example/pic.jpg'
            ELSE '' END AS upgraded_urls
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# bloom_plan
# --------------------------------------------------------------------------

def q_bloom_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """seen.bloom_partition_plan over 16 seen-set buckets (doc_id%16
    counts from documents) at 0.001 target fpp: optimal bits m, hash
    count k and achieved fpp per bucket; the oracle restates the
    Broder-Mitzenmacher formulas."""
    from .seen import bloom_partition_plan

    counts = _docs(spark, sf_dir).groupBy(
        (F.col("doc_id") % 16).cast("long").alias("bucket")
    ).agg(F.count("*").cast("long").alias("n_keys"))
    return bloom_partition_plan(counts, fpp_micro=1000).orderBy("bucket")


ORACLE_BLOOM_PLAN = """
WITH counts AS (
  SELECT doc_id % 16 AS bucket, COUNT(*) AS n_keys
  FROM documents GROUP BY doc_id % 16
),
plan AS (
  SELECT bucket, n_keys,
         CAST(CEIL(-n_keys * LN(0.001) / (LN(2) * LN(2))) AS BIGINT)
           AS m_bits
  FROM counts
),
withk AS (
  SELECT *,
         GREATEST(1, CAST(ROUND(CAST(m_bits AS DOUBLE) / n_keys * LN(2))
                          AS BIGINT)) AS k_hashes
  FROM plan
)
SELECT bucket, n_keys, m_bits,
       CAST(FLOOR((m_bits + 7) / 8.0) AS BIGINT) AS m_bytes,
       k_hashes,
       CAST(ROUND(1e6 * POWER(
           1 - EXP(-CAST(k_hashes AS DOUBLE) * n_keys / m_bits),
           CAST(k_hashes AS DOUBLE))) AS BIGINT) AS fpp_achieved_micro,
       CAST(ROUND(CAST(m_bits AS DOUBLE) / n_keys * 100) AS BIGINT)
         AS bits_per_key_centi
FROM withk
ORDER BY bucket
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "jpeg_quality": q_jpeg_quality,
        "lsh_plan": q_lsh_plan,
        "mixed_content": q_mixed_content,
        "bloom_plan": q_bloom_plan,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "jpeg_quality": ORACLE_JPEG_QUALITY,
        "lsh_plan": ORACLE_LSH_PLAN,
        "mixed_content": ORACLE_MIXED_CONTENT,
        "bloom_plan": ORACLE_BLOOM_PLAN,
    }
