"""Round-3 queries, part 20: budgeted selection and predictor audit.

- roi_knapsack: greedy budget-constrained host selection by
  value/cost ratio with a distributed prefix-sum cut.
- calibration: reliability bins of the beta-binomial host prior used
  as a page-level quality predictor (the ECE integrand per bin).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .scheduler import host_quality_shrinkage, roi_knapsack
from .textops.quality import calibration_bins

_GOOD_CHARS = 306
_PRIOR_M = 50
_BINS = 10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_roi_knapsack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheduler.roi_knapsack over per-host harvest items (galleries
    yield 3 pairs/doc, articles 1, hubs 0 — the harvest_roi fixture),
    cost = bytes (n_chars), budget = 40% of corpus bytes: hosts are
    taken in ROI order until the budget is spent.  The oracle replays
    the ratio, the running cost, and the cut."""
    docs = _docs(spark, sf_dir)
    doc = F.col("doc_id")
    items = docs.groupBy(
        F.concat(F.lit("h"), (doc % 12).cast("string")).alias("host")
    ).agg(
        F.sum(
            F.when(doc % 12 < 4, 3).when(doc % 12 < 8, 1).otherwise(0)
        ).cast("long").alias("value"),
        F.sum("n_chars").cast("long").alias("cost"),
    )
    budget = docs.agg(
        F.expr("(2 * sum(n_chars)) div 5").alias("b")
    ).collect()[0]["b"]
    out = roi_knapsack(items, budget=int(budget), id_col="host")
    return out.orderBy("id")


ORACLE_ROI_KNAPSACK = """
WITH it AS (
  SELECT 'h' || CAST(doc_id % 12 AS VARCHAR) AS id,
         CAST(SUM(CASE WHEN doc_id % 12 < 4 THEN 3
                       WHEN doc_id % 12 < 8 THEN 1 ELSE 0 END)
              AS BIGINT) AS value,
         CAST(SUM(n_chars) AS BIGINT) AS cost
  FROM documents GROUP BY 1
),
b AS (
  SELECT (2 * CAST(SUM(n_chars) AS BIGINT)) // 5 AS budget FROM documents
),
r AS (
  SELECT id, value, cost, (1000 * value) // cost AS ratio_permille
  FROM it
),
p AS (
  SELECT *, CAST(SUM(cost) OVER (
              ORDER BY -ratio_permille, id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix_cost
  FROM r
)
SELECT id, value, cost, ratio_permille, prefix_cost,
       prefix_cost <= (SELECT budget FROM b) AS selected
FROM p ORDER BY id
"""


def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality.calibration_bins on the host posterior as a PAGE-level
    predictor: each page inherits its source's shrunk quality rate
    (host_quality_shrinkage, M=50), label = n_chars >= 306.  Per decile
    bin: mean prediction vs empirical rate and the |gap| — the ECE
    integrand.  The oracle replays the posterior, the join, the
    binning, and all permille arithmetic."""
    pages = _docs(spark, sf_dir).select(
        F.col("source").alias("host"),
        (F.col("n_chars") >= _GOOD_CHARS).cast("long").alias("label"),
    )
    post = host_quality_shrinkage(
        pages.withColumn("is_good", F.col("label") == 1),
        prior_strength=_PRIOR_M,
    ).select("host", F.col("post_permille").alias("pred_permille"))
    preds = pages.join(post, "host")
    return calibration_bins(preds, "pred_permille", "label", n_bins=_BINS)


ORACLE_CALIBRATION = f"""
WITH pages AS (
  SELECT source AS host,
         CASE WHEN n_chars >= {_GOOD_CHARS} THEN 1 ELSE 0 END AS label
  FROM documents
),
per AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages,
         CAST(SUM(label) AS BIGINT) AS n_good
  FROM pages GROUP BY host
),
tot AS (
  SELECT CAST((1000 * SUM(label)) // COUNT(*) AS BIGINT) AS pg FROM pages
),
post AS (
  SELECT host,
         ({_PRIOR_M} * pg + 1000 * n_good) // ({_PRIOR_M} + n_pages)
           AS pred_permille
  FROM per, tot
),
preds AS (
  SELECT post.pred_permille AS p, pages.label AS y
  FROM pages JOIN post ON pages.host = post.host
),
binned AS (
  SELECT LEAST(CAST({_BINS - 1} AS BIGINT),
               CAST(p // {1000 // _BINS} AS BIGINT)) AS bin, p, y
  FROM preds
)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(p) AS BIGINT) // COUNT(*) AS mean_pred_permille,
       (1000 * CAST(SUM(y) AS BIGINT)) // COUNT(*) AS emp_permille,
       ABS(CAST(SUM(p) AS BIGINT) // COUNT(*)
           - (1000 * CAST(SUM(y) AS BIGINT)) // COUNT(*))
         AS abs_gap_permille
FROM binned GROUP BY bin ORDER BY bin
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "roi_knapsack": q_roi_knapsack,
        "calibration": q_calibration,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "roi_knapsack": ORACLE_ROI_KNAPSACK,
        "calibration": ORACLE_CALIBRATION,
    }
