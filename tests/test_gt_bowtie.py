"""Round-3 part-18 operators: Good-Turing yield and bow-tie structure."""

from pyspark.sql import functions as F


def test_good_turing_all_unique_vs_all_repeat(spark):
    from crawlspark.scheduler import good_turing_yield

    # host 'fresh': 10 singleton URLs -> missing mass 1000 (everything
    # new); host 'mined': one URL drawn 10 times -> missing mass 0
    rows = [("fresh", f"u{i}") for i in range(10)]
    rows += [("mined", "same")] * 10
    df = spark.createDataFrame(rows, "host string, url string")
    got = {r["host"]: r for r in good_turing_yield(df).collect()}
    assert got["fresh"]["missing_mass_permille"] == 1000
    assert got["fresh"]["f1"] == 10 and got["fresh"]["n_distinct"] == 10
    assert got["mined"]["missing_mass_permille"] == 0
    assert got["mined"]["f1"] == 0 and got["mined"]["n_distinct"] == 1


def test_good_turing_mixed(spark):
    from crawlspark.scheduler import good_turing_yield

    # 4 singletons + one URL seen 3 times: N=7, f1=4 -> 571 permille
    rows = [("h", f"u{i}") for i in range(4)] + [("h", "rep")] * 3
    df = spark.createDataFrame(rows, "host string, url string")
    r = good_turing_yield(df).collect()[0]
    assert r["n_draws"] == 7 and r["n_distinct"] == 5 and r["f1"] == 4
    assert r["missing_mass_permille"] == (1000 * 4) // 7


def test_bowtie_line_graph(spark):
    from crawlspark.linkgraph import bowtie_classify

    # path 0->1->2->3->4 plus back-edge 2->0 and an isolated vertex 9:
    # seed 0, depth 4: fwd reaches 1..4; bwd (who reaches 0) = {2, 1}
    # via 1->2? no — bwd follows reversed edges from 0: 0<-2 (dist 1),
    # 2<-1 (dist 2).  core = {0,1,2}, out = {3,4}, other = {9}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (2, 0)], "src long, dst long"
    )
    universe = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 4, 9]], "doc long"
    )
    got = {r["doc"]: r for r in
           bowtie_classify(edges, universe, seed=0, max_depth=4).collect()}
    assert got[0]["cls"] == "core" and got[0]["fwd_dist"] == 0
    assert got[1]["cls"] == "core" and got[1]["bwd_dist"] == 2
    assert got[2]["cls"] == "core" and got[2]["bwd_dist"] == 1
    assert got[3]["cls"] == "out" and got[3]["fwd_dist"] == 3
    assert got[4]["cls"] == "out"
    assert got[9]["cls"] == "other"
    assert got[9]["fwd_dist"] is None and got[9]["bwd_dist"] is None


def test_bowtie_horizon_cuts(spark):
    from crawlspark.linkgraph import bowtie_classify

    # same path, depth 2: vertex 4 is beyond the forward horizon
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    universe = spark.createDataFrame([(i,) for i in range(5)], "doc long")
    got = {r["doc"]: r["cls"] for r in
           bowtie_classify(edges, universe, seed=0, max_depth=2).collect()}
    assert got[2] == "out" and got[3] == "other" and got[4] == "other"
