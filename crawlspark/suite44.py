"""Round-3 queries, part 15: inverted-index size planning.

- postings_gaps: per-term posting lists as d-gaps with LEB128/varint
  byte costs (Manning et al., IIR ch. 5) — the index-size forecast a
  crawl pipeline runs BEFORE building the index.
- docid_remap: Silvestri's doc-id assignment problem — reassign doc
  ids clustered by language and measure the varint postings size under
  original vs remapped ids; similar docs adjacent => small gaps =>
  small varints.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops.quality import (_varint_case_sql, docid_remap_savings,
                              postings_gap_stats)

_MIN_DF = 2


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_postings_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality.postings_gap_stats on documents: whitespace terms,
    doc_id as the posting id, min_df=2.  savings_permille vs fixed
    8-byte ids is the compression forecast; the oracle replays the
    exact lag/d-gap/varint arithmetic."""
    out = postings_gap_stats(
        _docs(spark, sf_dir), text_col="text", id_col="doc_id",
        min_df=_MIN_DF,
    )
    return out.select(
        "word", "df", "first_doc", "postings_bytes", "fixed_bytes",
        "savings_permille",
    ).orderBy("word")


ORACLE_POSTINGS = f"""
WITH dw AS (
  SELECT word, doc FROM (
    SELECT doc_id AS doc,
           unnest(regexp_split_to_array(text, '\\s+')) AS word
    FROM documents
  ) WHERE word <> '' GROUP BY word, doc
),
gaps AS (
  SELECT word,
         COALESCE(doc - lag(doc) OVER (PARTITION BY word ORDER BY doc),
                  doc) AS e
  FROM dw
),
per AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS df,
         CAST(SUM({_varint_case_sql('e')}) AS BIGINT) AS postings_bytes
  FROM gaps GROUP BY word
),
firsts AS (
  SELECT word, MIN(doc) AS first_doc FROM dw GROUP BY word
)
SELECT per.word, df, first_doc, postings_bytes,
       CAST(df * 8 AS BIGINT) AS fixed_bytes,
       (1000 * (df * 8 - postings_bytes)) // (df * 8) AS savings_permille
FROM per JOIN firsts ON per.word = firsts.word
WHERE df >= {_MIN_DF}
ORDER BY per.word
"""


def q_docid_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality.docid_remap_savings on documents ordered by (lang,
    doc_id): language-clustered ids make same-language posting runs
    dense.  One row: orig vs remapped varint postings bytes and the
    permille saved."""
    out = docid_remap_savings(
        _docs(spark, sf_dir), text_col="text", id_col="doc_id",
        order_cols=["lang"],
    )
    return out.select(
        "n_terms", "n_postings", "orig_bytes", "remap_bytes",
        "saved_bytes", "savings_permille",
    )


ORACLE_REMAP = f"""
WITH dw AS (
  SELECT word, doc FROM (
    SELECT doc_id AS doc,
           unnest(regexp_split_to_array(text, '\\s+')) AS word
    FROM documents
  ) WHERE word <> '' GROUP BY word, doc
),
remap AS (
  SELECT CAST(doc_id AS BIGINT) AS doc,
         CAST(row_number() OVER (ORDER BY lang, doc_id) AS BIGINT)
           AS new_doc
  FROM documents
),
schemes AS (
  SELECT 'orig' AS scheme, word, doc FROM dw
  UNION ALL
  SELECT 'remap' AS scheme, dw.word, remap.new_doc AS doc
  FROM dw JOIN remap ON dw.doc = remap.doc
),
gaps AS (
  SELECT scheme, word,
         COALESCE(doc - lag(doc) OVER (PARTITION BY scheme, word
                                       ORDER BY doc),
                  doc) AS e
  FROM schemes
),
tot AS (
  SELECT scheme,
         CAST(COUNT(*) AS BIGINT) AS n_postings,
         CAST(COUNT(DISTINCT word) AS BIGINT) AS n_terms,
         CAST(SUM({_varint_case_sql('e')}) AS BIGINT) AS bytes
  FROM gaps GROUP BY scheme
)
SELECT MAX(n_terms) AS n_terms,
       MAX(n_postings) AS n_postings,
       MAX(CASE WHEN scheme = 'orig' THEN bytes END) AS orig_bytes,
       MAX(CASE WHEN scheme = 'remap' THEN bytes END) AS remap_bytes,
       MAX(CASE WHEN scheme = 'orig' THEN bytes END)
         - MAX(CASE WHEN scheme = 'remap' THEN bytes END) AS saved_bytes,
       (1000 * (MAX(CASE WHEN scheme = 'orig' THEN bytes END)
                - MAX(CASE WHEN scheme = 'remap' THEN bytes END)))
         // MAX(CASE WHEN scheme = 'orig' THEN bytes END)
         AS savings_permille
FROM tot
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "postings_gaps": q_postings_gaps,
        "docid_remap": q_docid_remap,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "postings_gaps": ORACLE_POSTINGS,
        "docid_remap": ORACLE_REMAP,
    }
