"""Round-3 queries, part 2: host-graph structure operators — synchronous
label-propagation communities, degree-ordered triangle counting with
local clustering coefficients, and bounded k-core peeling.

One shared 56-node fixture graph (SF-independent): six 8-node dense
blocks (ring + chords — guaranteed triangles), single bridge edges
between block heads, and 8 degree-1 pendant nodes that the k-core sweep
must peel.  Communities ~ blocks, triangles concentrate in blocks,
pendants peel in sweep one.  Every oracle replays the exact synchronized
rounds as unrolled CTEs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GN = 56          # 48 block nodes + 8 pendants
LPA_ITERS = 3
KCORE_K = 3
KCORE_ROUNDS = 3


def _graph(spark: SparkSession):
    nodes = spark.range(GN).select(F.col("id").alias("node"))
    v = F.col("node")
    base = F.expr("node div 8") * 8
    bn = nodes.filter(v < 48)
    e = (
        bn.select(v.alias("src"), (base + (v + 1) % 8).alias("dst"))
        .unionByName(bn.select(v.alias("src"), (base + (v + 2) % 8).alias("dst")))
        .unionByName(
            bn.filter(v % 2 == 0)
            .select(v.alias("src"), (base + (v + 4) % 8).alias("dst"))
        )
        .unionByName(
            bn.filter(v % 8 == 0)
            .select(v.alias("src"), ((v + 8) % 48).alias("dst"))
        )
        .unionByName(
            nodes.filter(v >= 48)
            .select(v.alias("src"), ((v - 48) * 6).alias("dst"))
        )
    )
    return nodes, e


_GRAPH_SQL = f"""
nodes AS (SELECT range AS v FROM range({GN})),
bn AS (SELECT v FROM nodes WHERE v < 48),
raw AS (
  SELECT v AS src, (v // 8) * 8 + (v + 1) % 8 AS dst FROM bn
  UNION ALL SELECT v, (v // 8) * 8 + (v + 2) % 8 FROM bn
  UNION ALL SELECT v, (v // 8) * 8 + (v + 4) % 8 FROM bn WHERE v % 2 = 0
  UNION ALL SELECT v, (v + 8) % 48 FROM bn WHERE v % 8 = 0
  UNION ALL SELECT v, (v - 48) * 6 FROM nodes WHERE v >= 48
),
und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw UNION ALL SELECT dst AS src, src AS dst FROM raw
  ) WHERE src <> dst
)"""


# --------------------------------------------------------------------------
# lpa_communities
# --------------------------------------------------------------------------

def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linkgraph.label_propagation, 3 synchronized rounds, min-label
    tiebreak; the blocks should coalesce onto block-minimum labels while
    pendants adopt their anchor's label."""
    from .linkgraph import label_propagation

    nodes, edges = _graph(spark)
    return label_propagation(nodes, edges, iters=LPA_ITERS).orderBy("node")


def _lpa_round_sql(i: int) -> str:
    return f"""
n{i} AS (
  SELECT u.src AS node, l.community FROM und u
  JOIN l{i - 1} l ON l.node = u.dst
),
c{i} AS (
  SELECT node, community, COUNT(*) AS cnt FROM n{i} GROUP BY node, community
),
b{i} AS (
  SELECT node, community FROM (
    SELECT node, community,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY cnt DESC, community ASC) AS rn
    FROM c{i}
  ) WHERE rn = 1
),
l{i} AS (
  SELECT a.node, COALESCE(b.community, a.node) AS community
  FROM (SELECT node FROM l{i - 1}) a LEFT JOIN b{i} b ON b.node = a.node
)"""


ORACLE_LPA = (
    "WITH " + _GRAPH_SQL
    + ",\nl0 AS (SELECT v AS node, v AS community FROM nodes),"
    + ",".join(_lpa_round_sql(i) for i in range(1, LPA_ITERS + 1))
    + f"""
SELECT CAST(node AS BIGINT) AS node,
       CAST(community AS BIGINT) AS community
FROM l{LPA_ITERS} ORDER BY node
"""
)


# --------------------------------------------------------------------------
# triangle_clustering
# --------------------------------------------------------------------------

def q_triangle_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linkgraph.triangle_clustering — degree-ordered orientation, wedge
    join, closing-edge equi-join; per node (degree, triangles,
    lcc_permille); the oracle replays the identical orientation and
    joins."""
    from .linkgraph import triangle_clustering

    nodes, edges = _graph(spark)
    return triangle_clustering(nodes, edges).orderBy("node")


ORACLE_TRIANGLES = (
    "WITH " + _GRAPH_SQL
    + """,
deg AS (SELECT src AS node, COUNT(*) AS d FROM und GROUP BY src),
oe AS (
  SELECT u.src, u.dst FROM und u
  JOIN deg a ON a.node = u.src JOIN deg b ON b.node = u.dst
  WHERE a.d < b.d OR (a.d = b.d AND u.src < u.dst)
),
wg AS (
  SELECT a.src AS pv, a.dst AS va, b.dst AS wa
  FROM oe a JOIN oe b ON a.src = b.src
  JOIN deg dv ON dv.node = a.dst JOIN deg dw ON dw.node = b.dst
  WHERE dv.d < dw.d OR (dv.d = dw.d AND a.dst < b.dst)
),
tri AS (
  SELECT pv, va, wa FROM wg
  JOIN oe e ON e.src = wg.va AND e.dst = wg.wa
),
tn AS (
  SELECT pv AS node FROM tri
  UNION ALL SELECT va FROM tri
  UNION ALL SELECT wa FROM tri
),
tc AS (SELECT node, COUNT(*) AS t FROM tn GROUP BY node)
SELECT CAST(n.v AS BIGINT) AS node,
       CAST(COALESCE(deg.d, 0) AS BIGINT) AS degree,
       CAST(COALESCE(tc.t, 0) AS BIGINT) AS triangles,
       CAST(CASE WHEN COALESCE(deg.d, 0) < 2 THEN 0
                 ELSE (2000 * COALESCE(tc.t, 0)) // (deg.d * (deg.d - 1))
            END AS BIGINT) AS lcc_permille
FROM nodes n
LEFT JOIN deg ON deg.node = n.v
LEFT JOIN tc ON tc.node = n.v
ORDER BY node
"""
)


# --------------------------------------------------------------------------
# kcore_peel
# --------------------------------------------------------------------------

def q_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linkgraph.kcore_peel at k=3, 3 synchronized sweeps: pendants
    (degree 1) peel in sweep one, block nodes survive as the dense
    core; (node, status, final_degree)."""
    from .linkgraph import kcore_peel

    nodes, edges = _graph(spark)
    return kcore_peel(nodes, edges, k=KCORE_K, rounds=KCORE_ROUNDS).orderBy(
        "node"
    )


def _kcore_round_sql(i: int) -> str:
    return f"""
k{i} AS (
  SELECT src FROM a{i - 1} GROUP BY src HAVING COUNT(*) >= {KCORE_K}
),
a{i} AS (
  SELECT e.src, e.dst FROM a{i - 1} e
  JOIN k{i} s ON s.src = e.src
  JOIN k{i} t ON t.src = e.dst
)"""


ORACLE_KCORE = (
    "WITH " + _GRAPH_SQL
    + ",\na0 AS (SELECT src, dst FROM und),"
    + ",".join(_kcore_round_sql(i) for i in range(1, KCORE_ROUNDS + 1))
    + f""",
fd AS (SELECT src AS node, COUNT(*) AS fd FROM a{KCORE_ROUNDS} GROUP BY src)
SELECT CAST(n.v AS BIGINT) AS node,
       CASE WHEN fd.fd IS NOT NULL THEN 'core' ELSE 'peeled' END AS status,
       CAST(COALESCE(fd.fd, 0) AS BIGINT) AS final_degree
FROM nodes n LEFT JOIN fd ON fd.node = n.v
ORDER BY node
"""
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "lpa_communities": q_lpa_communities,
        "triangle_clustering": q_triangle_clustering,
        "kcore_peel": q_kcore_peel,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "lpa_communities": ORACLE_LPA,
        "triangle_clustering": ORACLE_TRIANGLES,
        "kcore_peel": ORACLE_KCORE,
    }
