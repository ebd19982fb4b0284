"""Round-3 queries, part 7: count-min-sketch host accounting and
path-prefix budget rollups.

House rules: deterministic fixtures, DuckDB oracles replaying the
identical integer arithmetic (the CMS hashes are multiply-shift over a
Mersenne prime precisely so SQL can replay them), no floats.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sketch import CMS_A, CMS_B, _P


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# cms_hot_hosts — sketch build + probe, est vs truth
# --------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 256


def q_cms_hot_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sketch.cms_build + cms_estimate over a skewed key stream (even
    docs hit 7 hot keys, odd docs a 200-key tail), probed at the 7 hot
    keys; output est vs exact count and the collision overestimate
    (never negative — the CMS one-sided guarantee).  The oracle replays
    the multiply-shift bucket arithmetic cell for cell."""
    from .sketch import cms_build, cms_estimate

    doc = F.col("doc_id")
    key = F.when(doc % 2 == 0, doc % 7).otherwise(100 + doc % 200)
    stream = _docs(spark, sf_dir).select(key.cast("long").alias("k"))
    cms = cms_build(stream, "k", depth=_CMS_D, width=_CMS_W)
    probes = spark.range(7).select(F.col("id").cast("long").alias("k"))
    est = cms_estimate(cms, probes, "k", depth=_CMS_D, width=_CMS_W)
    truth = stream.groupBy("k").agg(F.count(F.lit(1)).alias("true_cnt"))
    return (
        est.join(truth, "k", "left")
        .select(
            "k", "est",
            F.coalesce(F.col("true_cnt"), F.lit(0)).alias("true_cnt"),
            (F.col("est")
             - F.coalesce(F.col("true_cnt"), F.lit(0))).alias("overcount"),
        )
        .orderBy("k")
    )


def _oracle_cms() -> str:
    a_case = " ".join(f"WHEN {i} THEN {CMS_A[i]}" for i in range(_CMS_D))
    b_case = " ".join(f"WHEN {i} THEN {CMS_B[i]}" for i in range(_CMS_D))
    return f"""
WITH stream AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN doc_id % 7
              ELSE 100 + doc_id % 200 END AS k
  FROM documents
),
rows_i AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS i),
cells AS (
  SELECT i,
         ((CASE i {a_case} END) * k + (CASE i {b_case} END))
           % {_P} % {_CMS_W} AS bucket,
         COUNT(*) AS cnt
  FROM stream CROSS JOIN rows_i
  GROUP BY 1, 2
),
probes AS (SELECT unnest(generate_series(0, 6)) AS k),
probe_cells AS (
  SELECT k, i,
         ((CASE i {a_case} END) * k + (CASE i {b_case} END))
           % {_P} % {_CMS_W} AS bucket
  FROM probes CROSS JOIN rows_i
),
est AS (
  SELECT k, MIN(COALESCE(cnt, 0)) AS est
  FROM probe_cells LEFT JOIN cells USING (i, bucket)
  GROUP BY k
),
truth AS (SELECT k, COUNT(*) AS tc FROM stream GROUP BY k)
SELECT est.k, CAST(est AS BIGINT) AS est,
       CAST(COALESCE(tc, 0) AS BIGINT) AS true_cnt,
       CAST(est - COALESCE(tc, 0) AS BIGINT) AS overcount
FROM est LEFT JOIN truth USING (k)
ORDER BY est.k
"""


# --------------------------------------------------------------------------
# path_prefix_budget — subtree fetch/byte rollup
# --------------------------------------------------------------------------

def q_path_prefix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canon.path_prefix_rollup (max_depth=2) over constructed site
    trees /a{doc%2}/b{doc%5}/c{doc}.html on hosts h(doc%3), plus a
    bare-root URL on doc%11==0 that must contribute NO prefix rows;
    bytes 100+doc%900 roll up with the counts."""
    from .canon import path_prefix_rollup

    doc = F.col("doc_id")
    s = doc.cast("string")
    main = F.concat(
        F.lit("https://h"), (doc % 3).cast("string"), F.lit(".test/a"),
        (doc % 2).cast("string"), F.lit("/b"), (doc % 5).cast("string"),
        F.lit("/c"), s, F.lit(".html"),
    )
    root = F.when(
        doc % 11 == 0,
        F.concat(F.lit("https://h"), (doc % 3).cast("string"),
                 F.lit(".test/")),
    )
    urls = (
        _docs(spark, sf_dir)
        .select(
            F.explode(F.array(main, root)).alias("url"),
            (100 + doc % 900).cast("long").alias("nbytes"),
        )
        .filter(F.col("url").isNotNull())
    )
    return path_prefix_rollup(
        urls, bytes_col="nbytes", max_depth=2
    ).orderBy("host", "prefix")


ORACLE_PATH_PREFIX_BUDGET = """
WITH d AS (
  SELECT 'h' || (doc_id % 3) || '.test' AS host,
         '/a' || (doc_id % 2) || '/' AS p1,
         '/a' || (doc_id % 2) || '/b' || (doc_id % 5) || '/' AS p2,
         100 + doc_id % 900 AS b
  FROM documents
),
u AS (
  SELECT host, p1 AS prefix, b FROM d
  UNION ALL
  SELECT host, p2, b FROM d
)
SELECT host, prefix, COUNT(*) AS n_urls,
       CAST(SUM(b) AS BIGINT) AS total_bytes,
       CAST(length(prefix) - length(replace(prefix, '/', '')) - 1
            AS BIGINT) AS depth
FROM u GROUP BY host, prefix ORDER BY host, prefix
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cms_hot_hosts": q_cms_hot_hosts,
        "path_prefix_budget": q_path_prefix_budget,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cms_hot_hosts": _oracle_cms(),
        "path_prefix_budget": ORACLE_PATH_PREFIX_BUDGET,
    }
