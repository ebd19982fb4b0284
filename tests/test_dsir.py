"""DSIR importance weights: direction and plan shape."""

from pyspark.sql import functions as F

from crawlspark.textops.curate import dsir_weights


def test_dsir_targetlike_docs_score_higher(spark):
    # target-domain docs talk about cats; off-domain docs about rocks
    catty = [(i, "the cat sat with the cat and the cat purred") for i in range(4)]
    rocky = [(i, "a rock fell on a rock near a rock pile") for i in range(4, 8)]
    df = spark.createDataFrame(catty + rocky, "doc_id long, text string")
    target = df.filter(F.col("doc_id") < 2)  # cat docs define the target
    rows = {r["doc_id"]: r for r in dsir_weights(df, target).collect()}
    cat_w = rows[3]["logw_micro"]   # held-out cat doc
    rock_w = rows[5]["logw_micro"]
    assert cat_w > rock_w
    assert rows[3]["n_feats"] == 9  # 10 words -> 9 bigrams


def test_dsir_weight_table_broadcasts(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e")], "doc_id long, text string"
    )
    plan = (
        dsir_weights(df, df.filter(F.col("doc_id") == 1))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan  # per-bucket weights broadcast
