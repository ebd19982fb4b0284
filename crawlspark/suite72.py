"""Round-3 queries, part 22: CLIP caption budget, inbound alt-text
consensus, declared-vs-sniffed dims audit, template cost estimates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# clip_budget
# --------------------------------------------------------------------------

def q_clip_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mmcurate.clip_caption_budget with budget 10 over captions of
    5..14 words; captions beyond the budget report the exact kept
    prefix and loss."""
    from .mmcurate import clip_caption_budget

    doc = F.col("doc_id")
    n = (5 + doc % 10)
    words = F.transform(
        F.sequence(F.lit(1), n.cast("int")),
        lambda i: F.concat(F.lit("w"), i.cast("string")),
    )
    imgs = _docs(spark, sf_dir).select(
        F.concat(doc.cast("string"), F.lit(": "),
                 F.array_join(words, " ")).alias("caption"))
    return clip_caption_budget(imgs, budget=10).orderBy("caption")


ORACLE_CLIP = """
WITH c AS (
  SELECT doc_id, 5 + doc_id % 10 AS n,
         CAST(doc_id AS VARCHAR) || ': ' ||
         list_aggregate(list_transform(range(1, 5 + doc_id % 10 + 1),
                                       i -> 'w' || i),
                        'string_agg', ' ') AS caption
  FROM documents
)
SELECT caption,
       CAST(n + 1 AS BIGINT) AS n_tokens,        -- 'doc:' prefix token
       n + 1 > 10 AS truncated,
       CASE WHEN n + 1 <= 10 THEN caption
            ELSE CAST(doc_id AS VARCHAR) || ': ' ||
                 list_aggregate(list_transform(range(1, 10),
                                               i -> 'w' || i),
                                'string_agg', ' ')
       END AS kept_text,
       CAST(GREATEST(n + 1 - 10, 0) AS BIGINT) AS lost_tokens
FROM c
ORDER BY caption
"""


# --------------------------------------------------------------------------
# inbound_alt
# --------------------------------------------------------------------------

def q_inbound_alt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mmcurate.image_inbound_alt_consensus: 50 images referenced by
    10 pages each — 6 'a cat', 3 'feline', 1 empty abstention; the
    oracle states the vote."""
    from .mmcurate import image_inbound_alt_consensus

    doc = F.col("doc_id")
    img = F.concat(F.lit("http://i/"), (doc % 50).cast("string"),
                   F.lit(".jpg"))
    m = F.expr("doc_id div 50")
    alt = (
        F.when(m % 10 < 6, F.lit("a cat"))
        .when(m % 10 < 9, F.lit("feline"))
        .otherwise(F.lit(""))
    )
    refs = _docs(spark, sf_dir).select(img.alias("image_url"),
                                       alt.alias("alt"))
    return image_inbound_alt_consensus(refs).orderBy("image_url")


# scale-generic oracle (round-5 fix: the original hard-coded the 500-doc
# fixture's counts — n_refs=10 — and broke at sf0.1 where each image gets
# 100 refs; now the vote is replayed from the data at any scale factor)
ORACLE_INBOUND_ALT = """
WITH refs AS (
  SELECT 'http://i/' || (doc_id % 50) || '.jpg' AS image_url,
         CASE WHEN (doc_id // 50) % 10 < 6 THEN 'a cat'
              WHEN (doc_id // 50) % 10 < 9 THEN 'feline'
              ELSE '' END AS alt
  FROM documents
),
totals AS (
  SELECT image_url, CAST(COUNT(*) AS BIGINT) AS n_refs
  FROM refs GROUP BY image_url
),
per_alt AS (
  SELECT image_url, alt, CAST(COUNT(*) AS BIGINT) AS c
  FROM refs WHERE alt <> '' GROUP BY image_url, alt
),
voted AS (
  SELECT image_url, CAST(SUM(c) AS BIGINT) AS n_alts,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_alts,
         CAST(MAX(c) AS BIGINT) AS top_c
  FROM per_alt GROUP BY image_url
),
top AS (
  SELECT image_url, alt AS top_alt,
         ROW_NUMBER() OVER (
           PARTITION BY image_url ORDER BY c DESC, alt DESC) AS rn
  FROM per_alt
)
SELECT t.image_url, t.n_refs, v.n_alts, v.n_distinct_alts, p.top_alt,
       CAST((1000 * v.top_c) // v.n_alts AS BIGINT)
         AS top_alt_share_permille
FROM totals t
JOIN voted v USING (image_url)
JOIN top p ON p.image_url = t.image_url AND p.rn = 1
ORDER BY t.image_url
"""


# --------------------------------------------------------------------------
# dims_mismatch
# --------------------------------------------------------------------------

def q_dims_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.declared_dims_mismatch over planted attribute/sniff
    pairs: exact match, 2x CDN downscale (scaled), a real mismatch,
    and a missing attribute (unverifiable)."""
    from .images import declared_dims_mismatch

    doc = F.col("doc_id")
    m = doc % 4
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.when(m == 3, F.lit(None)).otherwise(800).cast("long")
        .alias("attr_w"),
        F.lit(600).cast("long").alias("attr_h"),
        F.when(m == 0, 800).when(m == 1, 400).when(m == 2, 731)
        .otherwise(800).cast("long").alias("sniff_w"),
        F.when(m == 0, 600).when(m == 1, 300).when(m == 2, 600)
        .otherwise(600).cast("long").alias("sniff_h"),
    )
    return declared_dims_mismatch(imgs).select(
        "doc_id", "attr_w", "attr_h", "sniff_w", "sniff_h",
        "dims_verdict",
    ).orderBy("doc_id")


ORACLE_DIMS = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 4 = 3 THEN NULL ELSE 800 END AS BIGINT)
         AS attr_w,
       CAST(600 AS BIGINT) AS attr_h,
       CAST(CASE doc_id % 4 WHEN 1 THEN 400 WHEN 2 THEN 731
            ELSE 800 END AS BIGINT) AS sniff_w,
       CAST(CASE doc_id % 4 WHEN 1 THEN 300 ELSE 600 END AS BIGINT)
         AS sniff_h,
       CASE doc_id % 4 WHEN 0 THEN 'match' WHEN 1 THEN 'scaled'
            WHEN 2 THEN 'mismatch' ELSE 'unverifiable' END
         AS dims_verdict
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# template_cost
# --------------------------------------------------------------------------

def q_template_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheduler.template_cost_estimate: history covers the /item/<n>
    template with deterministic sizes; frontier URLs under /item/ get
    the historical mean, /fresh/ URLs the default."""
    from .scheduler import template_cost_estimate

    doc = F.col("doc_id")
    host = F.concat(F.lit("t"), (doc % 5).cast("string"), F.lit(".com"))
    history = _docs(spark, sf_dir).filter(doc % 2 == 0).select(
        host.alias("host"),
        F.concat(F.lit("http://t"), (doc % 5).cast("string"),
                 F.lit(".com/item/"), doc.cast("string")).alias("url"),
        (1000 + doc % 100).cast("long").alias("n_bytes"),
    )
    frontier = _docs(spark, sf_dir).filter(doc % 2 == 1).select(
        host.alias("host"),
        F.when(doc % 4 == 1,
               F.concat(F.lit("http://t"), (doc % 5).cast("string"),
                        F.lit(".com/item/"), doc.cast("string")))
        .otherwise(
            F.concat(F.lit("http://t"), (doc % 5).cast("string"),
                     F.lit(".com/fresh/"), doc.cast("string")))
        .alias("url"),
    )
    return template_cost_estimate(frontier, history).select(
        "url", "host", "template", "from_history", "est_bytes",
    ).orderBy("url")


ORACLE_TEMPLATE_COST = """
WITH hist AS (
  SELECT doc_id % 5 AS k,
         CAST(SUM(1000 + doc_id % 100)
              // COUNT(*) AS BIGINT) AS mean_b
  FROM documents WHERE doc_id % 2 = 0
  GROUP BY doc_id % 5
),
f AS (
  SELECT doc_id, doc_id % 5 AS k, doc_id % 4 AS m,
         CASE WHEN doc_id % 4 = 1
              THEN 'http://t' || (doc_id % 5) || '.com/item/' || doc_id
              ELSE 'http://t' || (doc_id % 5) || '.com/fresh/' || doc_id
         END AS url
  FROM documents WHERE doc_id % 2 = 1
)
SELECT f.url, 't' || f.k || '.com' AS host,
       CASE WHEN f.m = 1 THEN 'http://tN.com/item/N'
            ELSE 'http://tN.com/fresh/N' END AS template,
       f.m = 1 AS from_history,
       CASE WHEN f.m = 1 THEN h.mean_b ELSE CAST(65536 AS BIGINT) END
         AS est_bytes
FROM f LEFT JOIN hist h ON h.k = f.k
ORDER BY f.url
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "clip_budget": q_clip_budget,
        "inbound_alt": q_inbound_alt,
        "dims_mismatch": q_dims_mismatch,
        "template_cost": q_template_cost,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "clip_budget": ORACLE_CLIP,
        "inbound_alt": ORACLE_INBOUND_ALT,
        "dims_mismatch": ORACLE_DIMS,
        "template_cost": ORACLE_TEMPLATE_COST,
    }
