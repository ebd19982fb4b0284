"""Round-3 part-16 operators: KMV set algebra and kNN label eval."""

from pyspark.sql import functions as F


def test_kmv_overlap_exact_below_saturation(spark):
    from crawlspark.sketch import kmv_overlap

    # |A| = 40, |B| = 30, |A ∩ B| = 10, |A ∪ B| = 60 — all below k=64,
    # so every estimator is EXACT and the k-min Jaccard is the true one
    a = spark.range(0, 40).select(F.col("id").alias("key"))
    b = spark.range(30, 60).select(F.col("id").alias("key"))
    r = kmv_overlap(a, b, key_col="key", k=64).collect()[0]
    assert r["est_a"] == 40 and r["est_b"] == 30
    assert r["est_union"] == 60
    assert r["n_kmin"] == 60 and r["kmin_in_both"] == 10
    assert r["jaccard_permille"] == (1000 * 10) // 60
    assert r["est_intersection"] == (r["jaccard_permille"] * 60) // 1000


def test_kmv_overlap_saturated_estimates_reasonable(spark):
    from crawlspark.sketch import kmv_overlap

    # 10k vs 10k with 50% overlap, k=64: KMV error is O(1/sqrt(k));
    # accept a generous +-40% band and exact-integer self-consistency
    a = spark.range(0, 10_000).select(F.col("id").alias("key"))
    b = spark.range(5_000, 15_000).select(F.col("id").alias("key"))
    r = kmv_overlap(a, b, key_col="key", k=64).collect()[0]
    assert r["n_kmin"] == 64
    assert 6_000 < r["est_a"] < 14_000
    assert 6_000 < r["est_b"] < 14_000
    assert 9_000 < r["est_union"] < 21_000
    # true Jaccard = 5k/15k = 333 permille
    assert 100 < r["jaccard_permille"] < 600


def test_kmv_overlap_disjoint_and_identical(spark):
    from crawlspark.sketch import kmv_overlap

    a = spark.range(0, 50).select(F.col("id").alias("key"))
    b = spark.range(100, 150).select(F.col("id").alias("key"))
    r = kmv_overlap(a, b, key_col="key", k=64).collect()[0]
    assert r["kmin_in_both"] == 0 and r["jaccard_permille"] == 0
    assert r["est_intersection"] == 0

    r2 = kmv_overlap(a, a, key_col="key", k=64).collect()[0]
    assert r2["jaccard_permille"] == 1000
    assert r2["est_intersection"] == r2["est_union"] == 50


def test_knn_label_eval_separated_clusters(spark):
    from crawlspark.ann import knn_label_eval

    # two orthogonal label clusters with tiny within-cluster jitter on
    # a non-discriminative axis: every query's neighbors are its own
    # cluster first -> recall@k = 1000 and precision@k = 1000 for all k
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, [1.0, 0.0, 0.001 * (i % 7)], 0))
        else:
            rows.append((i, [0.0, 1.0, 0.001 * (i % 7)], 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["k"]: r for r in
           knn_label_eval(df, query_mod=10, ks=(1, 3)).collect()}
    # queries: vec_id 0,10,20,30 (all label 0); corpus has 16 label-0
    assert out[1]["n_queries"] == 4
    assert out[1]["recall_permille"] == 1000
    assert out[3]["recall_permille"] == 1000
    assert out[3]["precision_permille"] == 1000
    assert out[1]["n_matches"] == 4 and out[3]["n_matches"] == 12


def test_knn_label_eval_zero_recall(spark):
    from crawlspark.ann import knn_label_eval

    # queries carry a label nothing in the corpus has -> 0 everywhere
    rows = [(i, [float(i % 3 + 1), 1.0], 9 if i % 5 == 0 else i % 2)
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["k"]: r for r in
           knn_label_eval(df, query_mod=5, ks=(1, 5)).collect()}
    assert out[1]["recall_permille"] == 0
    assert out[5]["n_matches"] == 0
