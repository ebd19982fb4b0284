"""Round-3 queries, part 9: integer-exact modularity of the LPA host
communities — the quality read-out that says whether the clustering is
real structure (blocks) or noise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .suite31 import _GRAPH_SQL, _graph, _lpa_round_sql, LPA_ITERS


def q_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linkgraph.community_modularity over the suite31 block graph with
    its LPA labels: per community the node count, doubled internal edge
    count, total degree, and the (2m)^2-scaled modularity contribution
    (2m * 2e_c - d_c^2 — exact 64-bit, Q = sum / (2m)^2); the oracle
    replays the LPA rounds AND the modularity joins."""
    from .linkgraph import community_modularity, label_propagation

    nodes, edges = _graph(spark)
    labels = label_propagation(nodes, edges, iters=LPA_ITERS)
    return community_modularity(labels, edges).orderBy("community")


ORACLE_MODULARITY = (
    "WITH " + _GRAPH_SQL
    + ",\nl0 AS (SELECT v AS node, v AS community FROM nodes),"
    + ",".join(_lpa_round_sql(i) for i in range(1, LPA_ITERS + 1))
    + f""",
lab AS (SELECT node, community FROM l{LPA_ITERS}),
m2 AS (SELECT COUNT(*) AS m2 FROM und),
tagged AS (
  SELECT u.src, u.dst, a.community AS cs, b.community AS cd
  FROM und u JOIN lab a ON a.node = u.src JOIN lab b ON b.node = u.dst
),
i2 AS (
  SELECT cs AS community, COUNT(*) AS internal_edges2
  FROM tagged WHERE cs = cd GROUP BY cs
),
dg AS (
  SELECT cs AS community, COUNT(*) AS total_degree FROM tagged GROUP BY cs
),
sz AS (SELECT community, COUNT(*) AS n_nodes FROM lab GROUP BY community)
SELECT CAST(sz.community AS BIGINT) AS community,
       CAST(sz.n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(i2.internal_edges2, 0) AS BIGINT) AS internal_edges2,
       CAST(COALESCE(dg.total_degree, 0) AS BIGINT) AS total_degree,
       CAST(m2.m2 * COALESCE(i2.internal_edges2, 0)
            - COALESCE(dg.total_degree, 0) * COALESCE(dg.total_degree, 0)
            AS BIGINT) AS contrib_scaled
FROM sz
LEFT JOIN i2 ON i2.community = sz.community
LEFT JOIN dg ON dg.community = sz.community
CROSS JOIN m2
ORDER BY community
"""
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"community_modularity": q_community_modularity}


def oracle_sql() -> dict[str, str]:
    return {"community_modularity": ORACLE_MODULARITY}
