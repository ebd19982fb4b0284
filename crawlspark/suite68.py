"""Round-3 queries, part 18: host-size Gini coefficient, declared-vs-
detected language audit, corpus datasheet, canonicalization
idempotency self-audit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# gini_host_bytes
# --------------------------------------------------------------------------

def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """capacity.gini_coefficient over 40 hosts where every 8th holds a
    hot byte share; the oracle replays the ascending ranks and the
    integer Gini sums in window SQL."""
    from .capacity import gini_coefficient

    doc = F.col("doc_id")
    sizes = _docs(spark, sf_dir).filter(doc < 40).select(
        F.concat(F.lit("h"), F.lpad(doc.cast("string"), 3, "0"))
        .alias("host"),
        F.when(doc % 8 == 0, 10_000 + doc).otherwise(100 + doc)
        .cast("long").alias("n"),
    )
    return gini_coefficient(sizes)


ORACLE_GINI = """
WITH s AS (
  SELECT 'h' || lpad(CAST(doc_id AS VARCHAR), 3, '0') AS k,
         CAST(CASE WHEN doc_id % 8 = 0 THEN 10000 + doc_id
              ELSE 100 + doc_id END AS BIGINT) AS x
  FROM documents WHERE doc_id < 40
),
r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, k) AS i FROM s),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS total,
         CAST(SUM(i * x) AS BIGINT) AS s1
  FROM r
)
SELECT n, total,
       CAST(ROUND(1e3 * (2.0 * s1 - (n + 1.0) * total)
                  / (CAST(n AS DOUBLE) * total)) AS BIGINT) AS gini_milli
FROM a
"""


# --------------------------------------------------------------------------
# lang_attr
# --------------------------------------------------------------------------

def q_lang_attr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.quality.lang_attr_mismatch: bodies declare nothing /
    en / de-DE / EN-us while the text alternates confident English
    and German marker phrases; mismatch fires only when both sides
    are confident and disagree."""
    from .textops.quality import lang_attr_mismatch

    doc = F.col("doc_id")
    m = doc % 4
    body = (
        F.when(m == 0, F.lit("<html><body>x</body></html>"))
        .when(m == 1, F.lit('<html lang="en"><body>x</body></html>'))
        .when(m == 2, F.lit('<html lang="de-DE"><body>x</body></html>'))
        .otherwise(F.lit('<HTML LANG="EN-us"><body>x</body></html>'))
    )
    text = F.when(doc % 2 == 0, F.lit("the cat and the dog of note")) \
        .otherwise(F.lit("der hund und das tier"))
    pages = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), body.alias("body"), text.alias("text"))
    return lang_attr_mismatch(pages).orderBy("id")


ORACLE_LANG_ATTR = """
SELECT doc_id AS id,
       CASE doc_id % 4 WHEN 1 THEN 'en' WHEN 2 THEN 'de'
            WHEN 3 THEN 'en' END AS declared_lang,
       CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'de' END AS pred_lang,
       CASE doc_id % 4
         WHEN 0 THEN FALSE
         WHEN 1 THEN doc_id % 2 = 1
         WHEN 2 THEN doc_id % 2 = 0
         ELSE doc_id % 2 = 1
       END AS mismatch
FROM documents
ORDER BY id
"""


# --------------------------------------------------------------------------
# corpus_datasheet
# --------------------------------------------------------------------------

def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.curate.corpus_datasheet over documents with every 10th
    text replaced by one shared duplicate block; the oracle replays
    all five aggregates."""
    from .textops.curate import corpus_datasheet

    doc = F.col("doc_id")
    docs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.when(doc % 10 == 0, F.lit("duplicate text block"))
        .otherwise(F.col("text")).alias("text"),
    )
    return corpus_datasheet(docs)


ORACLE_DATASHEET = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN 'duplicate text block'
              ELSE text END AS text
  FROM documents
),
base AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x <> '') AS t
  FROM d
),
core AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(t)) AS BIGINT) AS n_tokens,
         CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct
  FROM base
),
v AS (
  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab_size
  FROM (SELECT UNNEST(t) AS w FROM base)
)
SELECT n_docs, n_tokens, vocab_size,
       CAST(ROUND(1e3 * CAST(n_tokens AS DOUBLE) / n_docs) AS BIGINT)
         AS mean_tokens_milli,
       n_docs - n_distinct AS n_exact_dup_docs,
       (1000 * (n_docs - n_distinct)) // n_docs AS dup_permille
FROM core CROSS JOIN v
"""


# --------------------------------------------------------------------------
# canon_idempotent
# --------------------------------------------------------------------------

def q_canon_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization idempotency self-audit over deliberately messy
    URLs (mixed-case scheme/host, default ports, unsorted query,
    fragments): canonicalize(canonicalize(u)) must equal
    canonicalize(u) for every row.  The oracle is the closed-form
    (n, 0) — any fixpoint violation in the operator breaks the row
    hash."""
    from .canon import canonicalize_expr

    doc = F.col("doc_id")
    ds = doc.cast("string")
    url = F.concat(
        F.lit("HTTP://WWW.Example"), (doc % 7).cast("string"),
        F.lit(".COM:80/Path/"), ds,
        F.lit("?z=9&a=1&m="), ds, F.lit("#frag"),
    )
    u = _docs(spark, sf_dir).select(url.alias("url"))
    once = canonicalize_expr(F.col("url"))
    c1 = u.select(once.alias("c1"))
    twice = canonicalize_expr(F.col("c1"))
    return c1.agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.sum(F.when(twice != F.col("c1"), 1).otherwise(0))
        .cast("long").alias("n_violations"),
    )


ORACLE_CANON_IDEMPOTENT = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(0 AS BIGINT) AS n_violations
FROM documents
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "gini_host_bytes": q_gini,
        "lang_attr": q_lang_attr,
        "corpus_datasheet": q_corpus_datasheet,
        "canon_idempotent": q_canon_idempotent,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "gini_host_bytes": ORACLE_GINI,
        "lang_attr": ORACLE_LANG_ATTR,
        "corpus_datasheet": ORACLE_DATASHEET,
        "canon_idempotent": ORACLE_CANON_IDEMPOTENT,
    }
