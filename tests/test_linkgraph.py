"""Integer-exact PageRank on a hand-computed toy graph."""

from crawlspark.linkgraph import pagerank


def test_pagerank_one_iteration_exact(spark):
    # 0 -> {1,2}, 1 -> {2}, 2 -> {0}; node 3 has an out-link but no in-links
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0)], "src long, dst long"
    )
    scale = 1_000_000
    n = 4
    r0 = scale // n                     # 250000
    base = 150 * r0 // 1000             # 37500
    rows = {r["doc"]: r["rank_scaled"] for r in pagerank(
        spark, n, iters=1, edges_df=edges, scale=scale).collect()}
    # contribs: 0 gives 125000 to 1 and 2; 1 gives 250000 to 2;
    # 2 gives 250000 to 0; 3 gives 250000 to 0
    assert rows[0] == base + 850 * (250000 + 250000) // 1000
    assert rows[1] == base + 850 * 125000 // 1000
    assert rows[2] == base + 850 * (125000 + 250000) // 1000
    assert rows[3] == base  # teleport only


def test_pagerank_hub_skew_exact(spark):
    """Star graph: every node links to hub 0 — the worst-case reducer skew
    for the contribution sum.  The hub's rank must be the exact integer
    aggregate of all contributions."""
    n = 1000
    edges = spark.range(n).selectExpr("id AS src", "CAST(0 AS LONG) AS dst")
    scale = 10**9
    rows = {r["doc"]: r["rank_scaled"] for r in pagerank(
        spark, n, iters=1, edges_df=edges, scale=scale).collect()}
    r0 = scale // n
    base = 150 * r0 // 1000
    assert rows[0] == base + 850 * (n * r0) // 1000  # hub gets all mass
    assert all(rows[i] == base for i in range(1, n))


def test_anchor_texts_topk_by_count_then_lex(spark):
    from crawlspark.linkgraph import anchor_texts

    links = spark.createDataFrame(
        [(1, "read more")] * 3 + [(1, "click here")] * 3 + [(1, "details")]
        + [(2, "homepage")],
        "dst long, anchor string",
    )
    rows = {r["dst"]: r for r in anchor_texts(links, top_k=2).collect()}
    # tie at 3 -> lexicographic: 'click here' before 'read more'
    assert rows[1]["top_anchors"] == "click here | read more"
    assert rows[1]["n_anchor_variants"] == 3
    assert rows[2]["top_anchors"] == "homepage"


def test_pagerank_mass_roughly_conserved(spark):
    from crawlspark import graph

    n = 100
    docs = spark.range(n).selectExpr("id AS src")
    ranks = pagerank(spark, n, iters=3, edges_df=graph.edges_from(docs, n))
    total = ranks.groupBy().sum("rank_scaled").collect()[0][0]
    # floor divisions only lose mass, never create it
    assert 0.99 * 10**12 < total <= 10**12
