"""Label propagation / triangle counting / k-core: closed-form checks on
small named graphs plus a brute-force differential on the suite31
fixture graph."""

from __future__ import annotations

from itertools import combinations

import pyspark.sql.functions as F

from crawlspark.linkgraph import kcore_peel, label_propagation, triangle_clustering
from crawlspark.suite31 import _graph


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_lpa_two_triangles_converge(spark):
    # two disjoint triangles: everyone adopts the triangle's min label
    nodes = _df(spark, [(i,) for i in range(6)], ["node"])
    edges = _df(
        spark,
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)],
        ["src", "dst"],
    )
    got = {r["node"]: r["community"]
           for r in label_propagation(nodes, edges, iters=3).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_triangles_on_4_clique(spark):
    nodes = _df(spark, [(i,) for i in range(4)], ["node"])
    edges = _df(spark, list(combinations(range(4), 2)), ["src", "dst"])
    rows = triangle_clustering(nodes, edges).collect()
    for r in rows:
        assert r["degree"] == 3
        assert r["triangles"] == 3  # each node is in C(3,2) = 3 triangles
        assert r["lcc_permille"] == 1000


def test_triangles_differential_vs_bruteforce(spark):
    nodes, edges = _graph(spark)
    adj: dict[int, set[int]] = {}
    for r in edges.collect():
        a, b = int(r["src"]), int(r["dst"])
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for v in sorted(adj):
        for a, b in combinations(sorted(adj[v]), 2):
            if b in adj.get(a, ()):  # triangle v-a-b
                tri[v] += 1
    # each triangle counted once per vertex above -> per-node counts
    got = {r["node"]: (r["degree"], r["triangles"])
           for r in triangle_clustering(nodes, edges).collect()}
    for v, neigh in adj.items():
        assert got[v] == (len(neigh), tri[v]), v
    # nodes with no edges (none in this fixture) would be (0, 0)
    assert sum(t for _, t in got.values()) % 3 == 0


def test_kcore_peels_pendant_chain(spark):
    # 4-clique with a 2-node pendant chain: chain peels, clique survives
    nodes = _df(spark, [(i,) for i in range(6)], ["node"])
    edges = _df(
        spark,
        list(combinations(range(4), 2)) + [(3, 4), (4, 5)],
        ["src", "dst"],
    )
    got = {r["node"]: (r["status"], r["final_degree"])
           for r in kcore_peel(nodes, edges, k=3, rounds=3).collect()}
    assert got[5] == ("peeled", 0)
    assert got[4] == ("peeled", 0)
    for v in range(4):
        assert got[v] == ("core", 3)


def test_kcore_cascade_needs_second_round(spark):
    # path 0-1-2 attached to a 4-clique at 0: node 2 peels round 1,
    # node 1 only once its downstream support is gone (round 2)
    nodes = _df(spark, [(i,) for i in range(7)], ["node"])
    clique = list(combinations(range(3, 7), 2))
    edges = _df(spark, clique + [(3, 0), (0, 1), (1, 2)], ["src", "dst"])
    one = {r["node"]: r["status"]
           for r in kcore_peel(nodes, edges, k=2, rounds=1).collect()}
    two = {r["node"]: r["status"]
           for r in kcore_peel(nodes, edges, k=2, rounds=3).collect()}
    assert one[2] == "peeled" and one[1] == "core"  # not yet cascaded
    assert two[2] == "peeled" and two[1] == "peeled" and two[0] == "peeled"
    for v in range(3, 7):
        assert two[v] == "core"


def test_modularity_known_graph(spark):
    # two disjoint triangles with perfect labels: m=6, each community
    # e_c=3, d_c=6 -> contrib = 2m*2e - d^2 = 12*6 - 36 = 36; Q = 72/144 = 0.5
    from crawlspark.linkgraph import community_modularity

    nodes = _df(spark, [(i,) for i in range(6)], ["node"])
    edges = _df(
        spark,
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)],
        ["src", "dst"],
    )
    labels = _df(spark, [(i, 0 if i < 3 else 3) for i in range(6)],
                 ["node", "community"])
    rows = {r["community"]: r
            for r in community_modularity(labels, edges).collect()}
    for c in (0, 3):
        assert rows[c]["internal_edges2"] == 6
        assert rows[c]["total_degree"] == 6
        assert rows[c]["contrib_scaled"] == 36
    total = sum(r["contrib_scaled"] for r in rows.values())
    m2 = 12
    assert total / (m2 * m2) == 0.5  # the classic two-clique modularity


def test_modularity_single_community_is_zero(spark):
    # everything in ONE community: e_c = m, d_c = 2m -> contrib =
    # 2m*2m - (2m)^2 = 0 (Q of the trivial partition is always 0)
    from crawlspark.linkgraph import community_modularity

    nodes = _df(spark, [(i,) for i in range(5)], ["node"])
    edges = _df(spark, [(i, (i + 1) % 5) for i in range(5)], ["src", "dst"])
    labels = nodes.select("node", F.lit(0).alias("community"))
    rows = community_modularity(labels, edges).collect()
    assert len(rows) == 1 and rows[0]["contrib_scaled"] == 0
