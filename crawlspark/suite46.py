"""Round-3 queries, part 17: shuffle-skew planning.

- salt_plan: proportional per-key salt factors for a skewed join key —
  the explicit-salting plan the north rule calls for on hot domains.
- edge_partition: 1D-vs-2D edge partitioning quality (load balance +
  vertex replication factor, PowerGraph's vertex-cut metric) on the
  link graph with a planted hub vertex.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import graph
from .joins import skew_salt_plan
from .linkgraph import edge_partition_quality
from .sketch import _P, KMV_A, KMV_B

_TARGET = 50
_MAX_SALT = 16
_PARTS = 16
_GRID = (4, 4)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


_KEY = (
    "CASE WHEN doc_id % 10 < 4 THEN 'hot'"
    " ELSE 'src' || CAST(doc_id % 5 AS VARCHAR) END"
)


def q_salt_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """joins.skew_salt_plan on a planted-skew key over documents: 40%
    of rows share key 'hot' (salt capped at 16), the rest spread over
    5 warm keys (salt 2 at the 500-doc gate size).  target_rows=50.  The oracle
    replays count -> ceil-div -> cap arithmetic."""
    keyed = _docs(spark, sf_dir).select(
        F.expr(_KEY.replace("CAST(doc_id % 5 AS VARCHAR)",
                            "cast(doc_id % 5 as string)")).alias("k")
    )
    out = skew_salt_plan(keyed, "k", target_rows=_TARGET, max_salt=_MAX_SALT)
    return out.select("key", "n_rows", "salt", "max_bucket_rows").orderBy(
        "key")


ORACLE_SALT_PLAN = f"""
WITH keyed AS (
  SELECT {_KEY} AS key FROM documents
),
counts AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS n_rows FROM keyed GROUP BY key
),
plan AS (
  SELECT key, n_rows,
         LEAST(CAST({_MAX_SALT} AS BIGINT),
               (n_rows + {_TARGET - 1}) // {_TARGET}) AS salt
  FROM counts
)
SELECT key, n_rows, salt, (n_rows + salt - 1) // salt AS max_bucket_rows
FROM plan WHERE salt > 1 ORDER BY key
"""


def q_edge_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linkgraph.edge_partition_quality over the formula link graph
    plus a planted hub (every doc also links to doc 0): 1D-by-dst puts
    every hub edge in one partition (balance collapses), the 2D grid
    spreads them over a grid column.  p=16, grid 4x4; the oracle
    replays the (A*x+B) mod P partition hash and both metrics."""
    docs = _docs(spark, sf_dir)
    n = docs.count()
    e = graph.edges(spark, sf_dir, n).select("src", "dst")
    hub = docs.select(
        F.col("doc_id").alias("src"),
        F.lit(0).cast("long").alias("dst"),
    )
    out = edge_partition_quality(
        e.unionAll(hub), p=_PARTS, grid=_GRID
    )
    return out.orderBy("scheme")


def _oracle_edge_partition() -> str:
    rows, cols = _GRID
    h = "(({a} * (({x}) % {p}) + {b}) % {p})"
    hs = h.format(a=KMV_A, b=KMV_B, p=_P, x="src")
    hd = h.format(a=KMV_A, b=KMV_B, p=_P, x="dst")
    scheme_part = {
        "1d_src": f"{hs} % {_PARTS}",
        "1d_dst": f"{hd} % {_PARTS}",
        "2d_grid": f"({hs} % {rows}) * {cols} + ({hd} % {cols})",
    }
    arms = []
    for name, part in scheme_part.items():
        arms.append(f"""
  SELECT '{name}' AS scheme,
         CAST({_PARTS} AS BIGINT) AS n_parts,
         (SELECT CAST(SUM(load) AS BIGINT) FROM (
            SELECT COUNT(*) AS load FROM tagged GROUP BY {part}))
           AS n_edges,
         (SELECT CAST(MAX(load) AS BIGINT) FROM (
            SELECT COUNT(*) AS load FROM tagged GROUP BY {part}))
           AS max_part_edges,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM (
            SELECT v FROM (
              SELECT DISTINCT src AS v, {part} AS part FROM tagged
              UNION
              SELECT DISTINCT dst AS v, {part} AS part FROM tagged
            ) GROUP BY v)) AS n_vertices,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM (
              SELECT DISTINCT src AS v, {part} AS part FROM tagged
              UNION
              SELECT DISTINCT dst AS v, {part} AS part FROM tagged
            )) AS sum_replicas""")
    body = "\nUNION ALL\n".join(arms)
    return f"""
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
e AS (
  SELECT d.doc_id AS src,
         CASE p.pos
           WHEN 0 THEN (2*d.doc_id + 1) % nn.c
           WHEN 1 THEN (2*d.doc_id + 2) % nn.c
           WHEN 2 THEN (5*d.doc_id + 3) % nn.c
           ELSE (d.doc_id + 17) % nn.c
         END AS dst
  FROM documents d CROSS JOIN nn
  CROSS JOIN (VALUES (0),(1),(2),(3)) AS p(pos)
  UNION ALL
  SELECT doc_id AS src, 0 AS dst FROM documents
),
tagged AS (SELECT src, dst FROM e),
raw AS (
{body}
)
SELECT scheme, n_parts, n_edges, max_part_edges,
       (1000 * n_edges) // ({_PARTS} * max_part_edges) AS balance_permille,
       n_vertices, sum_replicas,
       (1000 * sum_replicas) // n_vertices AS repl_factor_permille
FROM raw ORDER BY scheme
"""


ORACLE_EDGE_PARTITION = _oracle_edge_partition()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "salt_plan": q_salt_plan,
        "edge_partition": q_edge_partition,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "salt_plan": ORACLE_SALT_PLAN,
        "edge_partition": ORACLE_EDGE_PARTITION,
    }
