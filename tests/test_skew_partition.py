"""Round-3 part-17 operators: skew salt planning/joining and edge
partition quality."""

from pyspark.sql import functions as F


def _skewed(spark):
    # key 'hot' has 400 rows, 'a'..'d' have 25 each
    rows = [(i, "hot" if i < 400 else "abcd"[i % 4]) for i in range(500)]
    return spark.createDataFrame(rows, "rid long, k string")


def test_skew_salt_plan_arithmetic(spark):
    from crawlspark.joins import skew_salt_plan

    plan = {r["key"]: r for r in
            skew_salt_plan(_skewed(spark), "k", target_rows=50,
                           max_salt=6).collect()}
    # hot: ceil(400/50)=8 capped at 6; bucket = ceil(400/6)=67
    assert set(plan) == {"hot"}
    assert plan["hot"]["salt"] == 6
    assert plan["hot"]["max_bucket_rows"] == 67


def test_salted_join_equals_plain_join(spark):
    from crawlspark.joins import salted_join

    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", 1), ("hot", 2), ("a", 3), ("zzz", 4)], "k string, v int"
    )
    got = salted_join(big, small, "k", spread_col="rid",
                      target_rows=50, max_salt=8)
    want = big.join(small, "k")
    assert got.count() == want.count() == 400 * 2 + 25
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_salted_join_buckets_bounded(spark):
    from crawlspark.joins import salted_join, skew_salt_plan

    big = _skewed(spark)
    plan = {r["key"]: r for r in
            skew_salt_plan(big, "k", 50, 8).collect()}
    small = spark.createDataFrame([("hot", 1)], "k string, v int")
    got = salted_join(big, small, "k", spread_col="rid",
                      target_rows=50, max_salt=8)
    # rerun is bit-stable (hash spread, no rand)
    assert got.exceptAll(
        salted_join(big, small, "k", spread_col="rid",
                    target_rows=50, max_salt=8)
    ).count() == 0
    assert plan["hot"]["salt"] == 8


def test_edge_partition_quality_hub_graph(spark):
    from crawlspark.linkgraph import edge_partition_quality

    # star graph: every vertex 1..999 -> 0, plus a ring i -> i+1
    n = 1000
    v = spark.range(1, n)
    edges = v.select(F.col("id").alias("src"),
                     F.lit(0).cast("long").alias("dst")).unionAll(
        spark.range(0, n).select(
            F.col("id").alias("src"),
            ((F.col("id") + 1) % n).alias("dst"))
    )
    out = {r["scheme"]: r for r in
           edge_partition_quality(edges, p=16, grid=(4, 4)).collect()}
    assert set(out) == {"1d_src", "1d_dst", "2d_grid"}
    for r in out.values():
        assert r["n_edges"] == 999 + 1000
        assert r["n_vertices"] == n
        # replication factor is at least 1 (every vertex somewhere)
        assert r["repl_factor_permille"] >= 1000
    # the hub's 999 in-edges all land in ONE partition under 1d_dst but
    # spread over a 4-wide grid column under 2d_grid: the grid must be
    # strictly better balanced
    assert (out["2d_grid"]["max_part_edges"]
            < out["1d_dst"]["max_part_edges"])
    assert (out["2d_grid"]["balance_permille"]
            > out["1d_dst"]["balance_permille"])
    # 2D bounds per-vertex replication by row+col: repl factor <= 2*4-1
    assert out["2d_grid"]["repl_factor_permille"] <= 7000
