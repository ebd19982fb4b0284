"""Round-3 queries, part 8: content-evidence host-alias folding, JPEG
chroma-subsampling classification, Finagle-style per-host retry
budgets, and the Hill tail-index of the host-size distribution.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# host_alias_fold
# --------------------------------------------------------------------------

def q_host_alias_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canon.host_alias_folding over 5 apex sites with www. and m.
    variants: www rows always agree with the apex content hash, m.
    rows only on even paths — so www folds and m. (at 50% agreement
    under the 900-permille gate) does not; the oracle replays the
    (apex, path) equi-join and the permille vote."""
    from .canon import host_alias_folding

    doc = F.col("doc_id")
    apex = F.concat(F.lit("site"), (doc % 5).cast("string"),
                    F.lit(".com"))
    m = F.expr("doc_id div 5") % 3
    pathidx = F.expr("doc_id div 15") % 8
    pages = _docs(spark, sf_dir).select(
        F.when(m == 0, apex)
        .when(m == 1, F.concat(F.lit("www."), apex))
        .otherwise(F.concat(F.lit("m."), apex)).alias("host"),
        F.concat(F.lit("/p"), pathidx.cast("string")).alias("path"),
        F.concat(
            F.lit("h"), (doc % 5).cast("string"), F.lit("-"),
            pathidx.cast("string"),
            F.when((m == 2) & (pathidx % 2 == 1), F.lit("X"))
            .otherwise(F.lit("")),
        ).alias("content_hash"),
    )
    return host_alias_folding(pages).orderBy("host")


ORACLE_HOST_ALIAS = """
WITH pages AS (
  SELECT CASE (doc_id // 5) % 3
           WHEN 0 THEN 'site' || (doc_id % 5) || '.com'
           WHEN 1 THEN 'www.site' || (doc_id % 5) || '.com'
           ELSE 'm.site' || (doc_id % 5) || '.com'
         END AS host,
         '/p' || ((doc_id // 15) % 8) AS path,
         'h' || (doc_id % 5) || '-' || ((doc_id // 15) % 8) ||
         CASE WHEN (doc_id // 5) % 3 = 2 AND ((doc_id // 15) % 8) % 2 = 1
              THEN 'X' ELSE '' END AS content_hash
  FROM documents
),
base AS (
  SELECT host, path, content_hash,
         regexp_replace(host, '^(www|m|amp)\\.', '') AS apex
  FROM pages
),
j AS (
  SELECT a.host, a.apex AS canonical_host,
         a.content_hash = p.content_hash AS agree
  FROM base a
  JOIN (SELECT apex, path, content_hash FROM base
        WHERE host = apex) p
    ON a.apex = p.apex AND a.path = p.path
  WHERE a.host <> a.apex
)
SELECT host, canonical_host,
       CAST(COUNT(*) AS BIGINT) AS n_common_paths,
       CAST(SUM(CASE WHEN agree THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
       SUM(CASE WHEN agree THEN 1 ELSE 0 END) * 1000
         >= 900 * COUNT(*) AS folded
FROM j
GROUP BY host, canonical_host
ORDER BY host
"""


# --------------------------------------------------------------------------
# jpeg_chroma
# --------------------------------------------------------------------------

def _sof_hex(marker: int, hv: tuple[int, ...], app0: bool = False) -> str:
    """FFD8 [+APP0] + SOF segment with the given per-component (H,V)
    nibbles; dims 256x256, ids 1..n, luma Tq 0, chroma Tq 1."""
    out = "ffd8"
    if app0:
        out += "ffe0" + "0010" + "4a46494600010100000100010000"
    n = len(hv) // 2
    out += f"ff{marker:02x}" + f"{8 + 3 * n:04x}" + "08" + "0100" + "0100"
    out += f"{n:02x}"
    for c in range(n):
        tq = 0 if c == 0 else 1
        out += f"{c + 1:02x}{hv[2 * c]:x}{hv[2 * c + 1]:x}{tq:02x}"
    return out


def q_jpeg_chroma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.jpeg_chroma_subsampling over constructed SOF headers: per
    doc%7 a non-JPEG, gray 1-component, 4:4:4, 4:2:0 behind an APP0,
    progressive 4:2:2 (SOF2), 4:1:1, and an 'other' layout with 2x1
    chroma; the oracle states the expected classification per case."""
    from .images import jpeg_chroma_subsampling

    doc = F.col("doc_id")
    m = doc % 7
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_sof_hex(0xC0, (1, 1))))
        .when(m == 2, F.lit(_sof_hex(0xC0, (1, 1, 1, 1, 1, 1))))
        .when(m == 3, F.lit(_sof_hex(0xC0, (2, 2, 1, 1, 1, 1), app0=True)))
        .when(m == 4, F.lit(_sof_hex(0xC2, (2, 1, 1, 1, 1, 1))))
        .when(m == 5, F.lit(_sof_hex(0xC0, (4, 1, 1, 1, 1, 1))))
        .otherwise(F.lit(_sof_hex(0xC0, (2, 2, 2, 1, 1, 1))))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return jpeg_chroma_subsampling(imgs).select(
        "doc_id", "jpeg_n_components", "jpeg_samp_h", "jpeg_samp_v",
        "jpeg_subsampling", "jpeg_progressive",
    ).orderBy("doc_id")


ORACLE_JPEG_CHROMA = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 7 = 0 THEN NULL
                 WHEN doc_id % 7 = 1 THEN 1 ELSE 3 END AS INTEGER)
         AS jpeg_n_components,
       CAST(CASE doc_id % 7 WHEN 0 THEN NULL WHEN 3 THEN 2 WHEN 4 THEN 2
                 WHEN 5 THEN 4 WHEN 6 THEN 2 ELSE 1 END AS INTEGER)
         AS jpeg_samp_h,
       CAST(CASE doc_id % 7 WHEN 0 THEN NULL WHEN 3 THEN 2 WHEN 6 THEN 2
                 ELSE 1 END AS INTEGER) AS jpeg_samp_v,
       CASE doc_id % 7 WHEN 0 THEN NULL WHEN 1 THEN 'gray'
            WHEN 2 THEN '4:4:4' WHEN 3 THEN '4:2:0' WHEN 4 THEN '4:2:2'
            WHEN 5 THEN '4:1:1' ELSE 'other' END AS jpeg_subsampling,
       CAST(CASE WHEN doc_id % 7 = 0 THEN NULL
                 WHEN doc_id % 7 = 4 THEN 1 ELSE 0 END AS INTEGER)
         AS jpeg_progressive
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# retry_budget
# --------------------------------------------------------------------------

def q_retry_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.retry_budget over a synthetic fetch log (20 hosts, 60 s
    buckets, every 3rd fetch fails); the oracle replays the bucketed
    counts and the min+permille budget arithmetic."""
    from .fetch import retry_budget

    doc = F.col("doc_id")
    log = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 20).cast("string")).alias("host"),
        doc.cast("long").alias("ts"),
        (doc % 3 != 0).alias("ok"),
    )
    return retry_budget(log).orderBy("host", "bucket")


ORACLE_RETRY_BUDGET = """
WITH agg AS (
  SELECT 'h' || (doc_id % 20) AS host, doc_id // 60 AS bucket,
         CAST(SUM(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ok,
         CAST(SUM(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_fail
  FROM documents GROUP BY 1, 2
)
SELECT host, bucket, n_ok, n_fail,
       2 + n_ok * 100 // 1000 AS budget,
       LEAST(n_fail, 2 + n_ok * 100 // 1000) AS granted,
       n_fail - LEAST(n_fail, 2 + n_ok * 100 // 1000) AS deferred
FROM agg
ORDER BY host, bucket
"""


# --------------------------------------------------------------------------
# hill_alpha
# --------------------------------------------------------------------------

def q_hill_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """capacity.hill_alpha with k=20 over a planted Zipf host-size
    table n_k = 1 + 10000/(k+1); per-row LN is micro-quantized before
    the sum so the oracle replays the estimator integer-exactly."""
    from .capacity import hill_alpha

    sizes = _docs(spark, sf_dir).filter(F.col("doc_id") < 50).select(
        (1 + F.expr("10000 div (doc_id + 1)")).cast("long").alias("n"))
    return hill_alpha(sizes, k=20)


ORACLE_HILL = """
WITH s AS (
  SELECT 1 + 10000 // (doc_id + 1) AS x
  FROM documents WHERE doc_id < 50
),
top AS (SELECT x FROM s ORDER BY x DESC LIMIT 21),
tail AS (SELECT MIN(x) AS x_tail FROM top),
j AS (SELECT top.x, tail.x_tail FROM top, tail WHERE top.x > tail.x_tail),
a AS (
  SELECT x_tail, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(ROUND(1e6 * LN(CAST(x AS DOUBLE) / x_tail))
                       AS BIGINT)) AS BIGINT) AS sum_ln_micro
  FROM j GROUP BY x_tail
)
SELECT k, CAST(x_tail AS BIGINT) AS x_tail, sum_ln_micro,
       CAST(ROUND(1e3 * CAST(k AS DOUBLE)
                  / (CAST(sum_ln_micro AS DOUBLE) / 1e6)) AS BIGINT)
         AS alpha_milli
FROM a
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "host_alias_fold": q_host_alias_fold,
        "jpeg_chroma": q_jpeg_chroma,
        "retry_budget": q_retry_budget,
        "hill_alpha": q_hill_alpha,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "host_alias_fold": ORACLE_HOST_ALIAS,
        "jpeg_chroma": ORACLE_JPEG_CHROMA,
        "retry_budget": ORACLE_RETRY_BUDGET,
        "hill_alpha": ORACLE_HILL,
    }
