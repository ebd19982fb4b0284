"""Bucketed-table co-location: joins between same-bucketed tables must
plan WITHOUT any Exchange — the exchange-free property the frontier's
per-wave seen join relies on at 10^10 rows."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawlspark.sinks import write_bucketed_table


def test_bucketed_join_has_no_exchange(spark):
    left = spark.range(10_000).select(
        (F.col("id") % 500).alias("host"), F.col("id").alias("url_id")
    )
    right = spark.range(2_000).select(
        (F.col("id") % 500).alias("host"), F.col("id").alias("seen_id")
    )
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    write_bucketed_table(left, "bkt_left", bucket_col="host",
                         num_buckets=8, sort_cols=["host"])
    write_bucketed_table(right, "bkt_right", bucket_col="host",
                         num_buckets=8, sort_cols=["host"])
    a = spark.table("bkt_left")
    b = spark.table("bkt_right")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "host")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000 * (2_000 // 500)
        # anti-join (the seen-set shape) is exchange-free too
        anti = a.join(b, "host", "left_anti")
        plan2 = anti._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan2, plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
