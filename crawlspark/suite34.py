"""Round-3 queries, part 5: resumable-download interval merging and
Z-order (Morton) file layout planning.

- resume_ranges: interval-union per URL over partially downloaded byte
  ranges -> bytes on disk, gap count, next Range offset.  Fixture: 4
  overlapping parts per URL with one part deterministically missing for
  4 of every 5 URLs.
- zorder_layout: Morton-interleave sort + cut into fixed-row files,
  per-file bounding boxes in both pruning dimensions.  The oracle
  replays the bit interleave and the rank cut.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Z_BITS = 6
Z_ROWS_PER_FILE = 50


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# resume_ranges
# --------------------------------------------------------------------------

def q_resume_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.resume_ranges: URLs of 10000 bytes downloaded as 4
    overlapping parts [0,3000) [2500,5500) [5500,8000) [7500,10000);
    part p of url u is missing when (u+p)%5 == 0, so every fifth URL is
    complete (u%5==1) and the rest exhibit a leading gap, an internal
    gap, or a truncated tail; the oracle replays the running-max
    interval union."""
    from .fetch import resume_ranges

    doc = F.col("doc_id")
    u = F.expr("doc_id div 4")
    p = doc % 4
    parts = _docs(spark, sf_dir).select(
        F.concat(F.lit("u"), u.cast("string")).alias("url"),
        u.alias("u"), p.alias("p"),
        F.element_at(
            F.array(F.lit(0), F.lit(2500), F.lit(5500), F.lit(7500)),
            (p + 1).cast("int"),
        ).cast("long").alias("start"),
        F.element_at(
            F.array(F.lit(3000), F.lit(5500), F.lit(8000), F.lit(10000)),
            (p + 1).cast("int"),
        ).cast("long").alias("end"),
        F.lit(10000).cast("long").alias("total_size"),
    ).filter((F.col("u") + F.col("p")) % 5 != 0)
    return resume_ranges(parts).orderBy("url")


ORACLE_RESUME_RANGES = """
WITH base AS (
  SELECT 'u' || CAST(doc_id // 4 AS VARCHAR) AS url,
         doc_id // 4 AS u, doc_id % 4 AS p,
         CAST([0, 2500, 5500, 7500][CAST(doc_id % 4 AS INTEGER) + 1]
              AS BIGINT) AS s,
         CAST([3000, 5500, 8000, 10000][CAST(doc_id % 4 AS INTEGER) + 1]
              AS BIGINT) AS e,
         CAST(10000 AS BIGINT) AS total_size
  FROM documents
  WHERE (doc_id // 4 + doc_id % 4) % 5 <> 0
),
w AS (
  SELECT url, total_size, s, e,
         COALESCE(MAX(e) OVER (PARTITION BY url ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS pme
  FROM base
),
r AS (
  SELECT url, total_size,
         greatest(0, e - greatest(s, pme)) AS inc,
         CASE WHEN s > pme THEN 1 ELSE 0 END AS is_gap,
         CASE WHEN s > pme THEN pme END AS gap_at,
         e
  FROM w
),
a AS (
  SELECT url, total_size,
         CAST(SUM(inc) AS BIGINT) AS bytes_have,
         CAST(SUM(is_gap) AS BIGINT) AS n_gaps,
         MIN(gap_at) AS first_gap,
         MAX(e) AS max_end
  FROM r GROUP BY url, total_size
)
SELECT url, total_size, bytes_have, n_gaps,
       CAST(CASE WHEN n_gaps = 0 AND max_end >= total_size THEN NULL
                 ELSE COALESCE(first_gap,
                               CASE WHEN max_end < total_size
                                    THEN max_end END)
            END AS BIGINT) AS next_missing_start,
       CAST(CASE WHEN n_gaps = 0 AND max_end >= total_size THEN 1 ELSE 0
            END AS INTEGER) AS complete
FROM a
ORDER BY url
"""


# --------------------------------------------------------------------------
# zorder_layout
# --------------------------------------------------------------------------

def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sinks.zorder_layout over a (doc%64, doc div 64 % 64) grid —
    host-bucket x time-bucket — cut into 50-row files: every file's
    bounding box stays tight in BOTH dimensions (the multi-dimensional
    pruning a plain x-sort cannot give); the oracle replays the 6-bit
    Morton interleave, the rank cut, and the per-file boxes."""
    from .sinks import zorder_layout

    doc = F.col("doc_id")
    pts = _docs(spark, sf_dir).select(
        (doc % 64).alias("xb"),
        (F.expr("doc_id div 64") % 64).alias("yb"),
    )
    return zorder_layout(
        pts, "xb", "yb", rows_per_file=Z_ROWS_PER_FILE, bits=Z_BITS
    ).orderBy("file_id")


def _z_sql(x: str, y: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


ORACLE_ZORDER = f"""
WITH pts AS (
  SELECT CAST(doc_id % 64 AS BIGINT) AS x,
         CAST((doc_id // 64) % 64 AS BIGINT) AS y
  FROM documents
),
z AS (
  SELECT x, y, CAST({_z_sql('x', 'y', Z_BITS)} AS BIGINT) AS zv FROM pts
),
rk AS (
  SELECT x, y,
         (ROW_NUMBER() OVER (ORDER BY zv, x, y) - 1)
           // {Z_ROWS_PER_FILE} AS file_id
  FROM z
)
SELECT CAST(file_id AS BIGINT) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max,
       CAST((MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS BIGINT)
         AS bbox_area
FROM rk GROUP BY file_id
ORDER BY file_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "resume_ranges": q_resume_ranges,
        "zorder_layout": q_zorder_layout,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "resume_ranges": ORACLE_RESUME_RANGES,
        "zorder_layout": ORACLE_ZORDER,
    }
