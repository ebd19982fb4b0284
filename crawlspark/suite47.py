"""Round-3 queries, part 18: crawl-yield estimation and web structure.

- gt_yield: Good-Turing missing-mass per host — the probability the
  next extracted URL is new, i.e. the evidence-based stop signal for
  host depth budgets.
- bowtie: Broder bow-tie decomposition (CORE/IN/OUT/OTHER) of the link
  graph relative to a seed within a BFS horizon.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import graph
from .linkgraph import bowtie_classify
from .scheduler import good_turing_yield

_DEPTH = 3
_SEED = 0


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_gt_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheduler.good_turing_yield on a synthetic draw log: every doc
    contributes one URL draw (u = doc_id % 150), even docs a second
    (u = 3*doc_id % 150), and every 7th doc one never-repeated URL,
    host = doc_id % 10 — hosts differ in repeat
    structure, so f1 and the missing mass differ per host.  The oracle
    replays the two groupBys and the f1/N arithmetic."""
    docs = _docs(spark, sf_dir)
    one = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string"))
        .alias("host"),
        F.concat(F.lit("u"), (F.col("doc_id") % 150).cast("string"))
        .alias("url"),
    )
    uniq = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string"))
        .alias("host"),
        F.concat(F.lit("uniq"), F.col("doc_id").cast("string"))
        .alias("url"),
    )
    two = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string"))
        .alias("host"),
        F.concat(F.lit("u"), ((F.col("doc_id") * 3) % 150).cast("string"))
        .alias("url"),
    )
    out = good_turing_yield(one.unionAll(two).unionAll(uniq))
    return out.select(
        "host", "n_draws", "n_distinct", "f1", "missing_mass_permille"
    ).orderBy("host")


ORACLE_GT_YIELD = """
WITH draws AS (
  SELECT 'h' || CAST(doc_id % 10 AS VARCHAR) AS host,
         'u' || CAST(doc_id % 150 AS VARCHAR) AS url
  FROM documents
  UNION ALL
  SELECT 'h' || CAST(doc_id % 10 AS VARCHAR),
         'u' || CAST((doc_id * 3) % 150 AS VARCHAR)
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'h' || CAST(doc_id % 10 AS VARCHAR),
         'uniq' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 7 = 0
),
per_url AS (
  SELECT host, url, COUNT(*) AS c FROM draws GROUP BY host, url
)
SELECT host,
       CAST(SUM(c) AS BIGINT) AS n_draws,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       (1000 * CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT))
         // CAST(SUM(c) AS BIGINT) AS missing_mass_permille
FROM per_url GROUP BY host ORDER BY host
"""


def q_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linkgraph.bowtie_classify on the formula link graph, seed 0,
    horizon 3: forward and backward BFS sweeps then the
    CORE/IN/OUT/OTHER read-out per doc.  The oracle unrolls both sweeps
    as chained CTEs (same discipline as the crawl BFS oracle)."""
    docs = _docs(spark, sf_dir)
    n = docs.count()
    e = graph.edges(spark, sf_dir, n).select("src", "dst")
    out = bowtie_classify(
        e, docs.select("doc_id"), seed=_SEED, max_depth=_DEPTH,
        doc_col="doc_id",
    )
    return out.orderBy("doc")


def _oracle_bowtie() -> str:
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS c FROM documents),",
        "e AS (",
        "  SELECT d.doc_id AS src,",
        "         CASE p.pos",
        "           WHEN 0 THEN (2*d.doc_id + 1) % nn.c",
        "           WHEN 1 THEN (2*d.doc_id + 2) % nn.c",
        "           WHEN 2 THEN (5*d.doc_id + 3) % nn.c",
        "           ELSE (d.doc_id + 17) % nn.c",
        "         END AS dst",
        "  FROM documents d CROSS JOIN nn",
        "  CROSS JOIN (VALUES (0),(1),(2),(3)) AS p(pos)",
        "),",
    ]
    for tag, a, b in (("f", "src", "dst"), ("b", "dst", "src")):
        parts += [
            f"{tag}0 AS (SELECT CAST({_SEED} AS BIGINT) AS doc,"
            " CAST(0 AS BIGINT) AS dist),",
            f"{tag}s0 AS (SELECT doc FROM {tag}0),",
        ]
        for d in range(1, _DEPTH + 1):
            p = d - 1
            parts += [
                f"{tag}{d} AS (",
                f"  SELECT e.{b} AS doc, CAST({d} AS BIGINT) AS dist",
                f"  FROM e JOIN {tag}{p} l ON e.{a} = l.doc",
                f"  WHERE e.{b} NOT IN (SELECT doc FROM {tag}s{p})",
                f"  GROUP BY e.{b}",
                "),",
                f"{tag}s{d} AS (SELECT doc FROM {tag}s{p}"
                f" UNION ALL SELECT doc FROM {tag}{d}),",
            ]
        lv = " UNION ALL ".join(
            f"SELECT * FROM {tag}{d}" for d in range(_DEPTH + 1)
        )
        parts.append(f"{tag}all AS ({lv}),")
    parts += [
        "fin AS (",
        "  SELECT d.doc_id AS doc, fall.dist AS fwd_dist,",
        "         ball.dist AS bwd_dist",
        "  FROM documents d",
        "  LEFT JOIN fall ON fall.doc = d.doc_id",
        "  LEFT JOIN ball ON ball.doc = d.doc_id",
        ")",
        "SELECT doc, fwd_dist, bwd_dist,",
        "  CASE WHEN fwd_dist IS NOT NULL AND bwd_dist IS NOT NULL"
        " THEN 'core'",
        "       WHEN fwd_dist IS NOT NULL THEN 'out'",
        "       WHEN bwd_dist IS NOT NULL THEN 'in'",
        "       ELSE 'other' END AS cls",
        "FROM fin ORDER BY doc",
    ]
    return "\n".join(parts)


ORACLE_BOWTIE = _oracle_bowtie()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "gt_yield": q_gt_yield,
        "bowtie": q_bowtie,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "gt_yield": ORACLE_GT_YIELD,
        "bowtie": ORACLE_BOWTIE,
    }
