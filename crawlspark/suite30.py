"""Round-3 queries, part 1: bounded-memory distinct sketches and
sketch-driven graph analytics — KMV distinct counting, the ANF /
HyperBall-style neighbourhood function, harmonic centrality, and the
effective-diameter read-out.

House rules: deterministic fixtures, integer-exact estimators
((k-1)*P div (h_k+1), micro-unit harmonic terms — never a float), and
DuckDB oracles that replay the identical hash + rank arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sketch import _P  # the ONE authoritative KMV hash modulus

ANF_N = 48
ANF_ITERS = 3
ANF_K = 8
KMV_K = 8


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# kmv_distinct — per-group k-minimum-values distinct estimates
# --------------------------------------------------------------------------

def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sketch.kmv_build/kmv_estimates over 10 host-groups whose key
    cardinality grows with the group id (group g draws keys mod
    3 + 7g): low groups stay below k=8 and must come back EXACT,
    high groups saturate and exercise the (k-1)*P div (h_k+1)
    estimator; the oracle replays the hash, the per-group rank, and
    the integer estimator."""
    from .sketch import kmv_build, kmv_estimates

    doc = F.col("doc_id")
    d = _docs(spark, sf_dir).select(
        (doc % 10).alias("host_grp"),
        ((doc * 7919) % (3 + (doc % 10) * 7)).alias("url_key"),
    )
    sk = kmv_build(d, "host_grp", "url_key", k=KMV_K)
    return (
        kmv_estimates(sk, k=KMV_K)
        .withColumnRenamed("grp", "host_grp")
        .orderBy("host_grp")
    )


ORACLE_KMV_DISTINCT = f"""
WITH d AS (
  SELECT doc_id % 10 AS host_grp,
         (doc_id * 7919) % (3 + (doc_id % 10) * 7) AS url_key
  FROM documents
),
h AS (
  SELECT DISTINCT host_grp,
         (1103515245 * url_key + 12345) % {_P} AS h
  FROM d
),
r AS (
  SELECT host_grp, h,
         ROW_NUMBER() OVER (PARTITION BY host_grp ORDER BY h) AS rn
  FROM h
),
s AS (
  SELECT host_grp, COUNT(*) AS n_kept, MAX(h) AS kth
  FROM r WHERE rn <= {KMV_K} GROUP BY host_grp
)
SELECT CAST(host_grp AS BIGINT) AS host_grp,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(kth AS BIGINT) AS kth_hash,
       CAST(CASE WHEN n_kept < {KMV_K} THEN n_kept
                 ELSE ({(KMV_K - 1) * _P}::BIGINT) // (kth + 1)
            END AS BIGINT) AS est
FROM s
ORDER BY host_grp
"""


# --------------------------------------------------------------------------
# anf_neighborhood / harmonic_centrality / nf_effective_diameter
# --------------------------------------------------------------------------

def _anf_graph(spark: SparkSession):
    """Fixed 48-host graph (SF-independent): every host links to
    (2v+1)%48 and (5v+3)%48, every third host also to (11v+7)%48."""
    nodes = spark.range(ANF_N).select(F.col("id").alias("node"))
    v = F.col("node")
    e1 = nodes.select(v.alias("src"), ((v * 2 + 1) % ANF_N).alias("dst"))
    e2 = nodes.select(v.alias("src"), ((v * 5 + 3) % ANF_N).alias("dst"))
    e3 = nodes.filter(v % 3 == 0).select(
        v.alias("src"), ((v * 11 + 7) % ANF_N).alias("dst")
    )
    return nodes, e1.unionByName(e2).unionByName(e3)


def _anf(spark: SparkSession) -> DataFrame:
    from .linkgraph import anf_counters

    nodes, edges = _anf_graph(spark)
    return anf_counters(nodes, edges, iters=ANF_ITERS, k=ANF_K)


def q_anf_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linkgraph.anf_counters over the 48-host graph, 3 radii, k=8 KMV
    counters: per (node, r) the kept-hash count and the integer distinct
    estimate of the out-ball |N(v, r)|; the oracle unrolls the three
    union-merge-rank rounds as CTEs."""
    return _anf(spark).orderBy("node", "r")


_ANF_GRAPH_SQL = f"""
nodes AS (SELECT range AS v FROM range({ANF_N})),
edges AS (
  SELECT v AS src, (v * 2 + 1) % {ANF_N} AS dst FROM nodes
  UNION ALL
  SELECT v, (v * 5 + 3) % {ANF_N} FROM nodes
  UNION ALL
  SELECT v, (v * 11 + 7) % {ANF_N} FROM nodes WHERE v % 3 = 0
),
c0 AS (
  SELECT v AS node, (1103515245 * v + 12345) % {_P} AS h FROM nodes
)"""


def _anf_round_sql(i: int) -> str:
    return f"""
u{i} AS (
  SELECT node, h FROM c{i - 1}
  UNION
  SELECT e.src AS node, c.h FROM edges e JOIN c{i - 1} c ON c.node = e.dst
),
c{i} AS (
  SELECT node, h FROM (
    SELECT node, h,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY h) AS rn
    FROM u{i}
  ) WHERE rn <= {ANF_K}
)"""


_ANF_ESTS_SQL = (
    _ANF_GRAPH_SQL
    + ","
    + ",".join(_anf_round_sql(i) for i in range(1, ANF_ITERS + 1))
    + """,
ests AS (
"""
    + "\n  UNION ALL\n".join(
        f"  SELECT node, {r} AS r, COUNT(*) AS n_kept, MAX(h) AS kth"
        f" FROM c{r} GROUP BY node"
        for r in range(ANF_ITERS + 1)
    )
    + f"""
),
vals AS (
  SELECT node, r, n_kept,
         CASE WHEN n_kept < {ANF_K} THEN n_kept
              ELSE ({(ANF_K - 1) * _P}::BIGINT) // (kth + 1) END AS est
  FROM ests
)"""
)

ORACLE_ANF = f"""
WITH {_ANF_ESTS_SQL}
SELECT CAST(node AS BIGINT) AS node, CAST(r AS INTEGER) AS r,
       CAST(n_kept AS BIGINT) AS n_kept, CAST(est AS BIGINT) AS est
FROM vals
ORDER BY node, r
"""


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linkgraph.harmonic_centrality_from_anf over the same counters:
    HC(v) = sum_r (N(v,r) - N(v,r-1)) / r in integer micro-units — the
    Boldi-Vigna centrality a web-scale scheduler ranks hosts by without
    ever materialising a distance matrix."""
    from .linkgraph import harmonic_centrality_from_anf

    return harmonic_centrality_from_anf(
        _anf(spark), iters=ANF_ITERS
    ).orderBy("node")


ORACLE_HARMONIC = f"""
WITH {_ANF_ESTS_SQL},
wide AS (
  SELECT node,
         MAX(CASE WHEN r = 0 THEN est END) AS e0,
         MAX(CASE WHEN r = 1 THEN est END) AS e1,
         MAX(CASE WHEN r = 2 THEN est END) AS e2,
         MAX(CASE WHEN r = 3 THEN est END) AS e3
  FROM vals GROUP BY node
)
SELECT CAST(node AS BIGINT) AS node,
       CAST(((e1 - e0) * 1000000) // 1
          + ((e2 - e1) * 1000000) // 2
          + ((e3 - e2) * 1000000) // 3 AS BIGINT) AS hc_micros
FROM wide
ORDER BY node
"""


def q_nf_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global neighbourhood-function read-out: NF(r) = sum_v est(v, r)
    per radius, plus the 90%-effective-diameter flag (smallest r whose
    NF reaches 90% of NF(r_max) — the standard web-graph 'how far apart
    are pages' statistic, computed here without any BFS from every
    node).  reaches90 is 0/1 int (never a nullable boolean)."""
    anf = _anf(spark)
    nf = anf.groupBy("r").agg(F.sum("est").cast("long").alias("nf_total"))
    nf_max = nf.agg(F.max(
        F.when(F.col("r") == ANF_ITERS, F.col("nf_total"))
    ).alias("nf_rmax"))
    return (
        nf.crossJoin(F.broadcast(nf_max))
        .select(
            "r", "nf_total",
            (F.col("nf_total") * 10 >= F.col("nf_rmax") * 9)
            .cast("int").alias("reaches90"),
        )
        .orderBy("r")
    )


ORACLE_NF_DIAMETER = f"""
WITH {_ANF_ESTS_SQL},
nf AS (
  SELECT r, SUM(est) AS nf_total FROM vals GROUP BY r
),
m AS (SELECT nf_total AS nf_rmax FROM nf WHERE r = {ANF_ITERS})
SELECT CAST(r AS INTEGER) AS r, CAST(nf_total AS BIGINT) AS nf_total,
       CAST(CASE WHEN nf_total * 10 >= nf_rmax * 9 THEN 1 ELSE 0 END
            AS INTEGER) AS reaches90
FROM nf CROSS JOIN m
ORDER BY r
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kmv_distinct": q_kmv_distinct,
        "anf_neighborhood": q_anf_neighborhood,
        "harmonic_centrality": q_harmonic_centrality,
        "nf_effective_diameter": q_nf_effective_diameter,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kmv_distinct": ORACLE_KMV_DISTINCT,
        "anf_neighborhood": ORACLE_ANF,
        "harmonic_centrality": ORACLE_HARMONIC,
        "nf_effective_diameter": ORACLE_NF_DIAMETER,
    }
