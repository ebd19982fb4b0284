"""Entry script for spark-submit (north_rule: "runs via spark-submit
--py-files on multi-executor clusters").

Usage (see scripts/submit_demo.sh):
    spark-submit --master local[8] --py-files /tmp/crawlspark.zip \
        scripts/submit_job.py [sf_dir] [max_depth]

The crawlspark package arrives via --py-files (a zip on every executor's
PYTHONPATH), exactly as it would on a real cluster — no repo checkout
needed on workers.  Prints one JSON line with the crawl row count and an
order-sensitive checksum so two cluster sizes can be diffed for equality.
"""

import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    max_depth = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    spark = (
        SparkSession.builder.appName("crawlspark-submit")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    # import AFTER the session exists: on a cluster the zip from --py-files
    # is what makes this import work on executors
    from crawlspark.frontier import CrawlConfig, crawl_bfs

    result = crawl_bfs(spark, sf_dir, CrawlConfig(max_depth=max_depth))
    # order-sensitive checksum: hash of (ord, url) — equal across
    # cluster sizes iff the crawl order and seen-set match exactly
    agg = result.select(
        F.count("*").alias("rows"),
        F.sum(F.xxhash64(F.col("ord"), F.col("url")) / F.lit(1e9)).alias("checksum"),
    ).collect()[0]

    # end-to-end pipeline through the same --py-files deployment: crawl ->
    # image payload fetch -> PSNR/caption validation (pipeline.py)
    from crawlspark import pipeline

    t = pipeline.crawl_to_image_table(spark, sf_dir, CrawlConfig(max_depth=max_depth))
    p = t.select(
        F.count("*").alias("rows"),
        F.sum(F.when(F.col("valid") & F.col("caption_ok"), 1).otherwise(0)).alias("ok"),
        F.sum(F.xxhash64("image_id", "ord") / F.lit(1e9)).alias("checksum"),
    ).collect()[0]
    print(json.dumps({
        "rows": agg["rows"], "order_checksum": round(agg["checksum"], 3),
        "pipeline_rows": p["rows"], "pipeline_valid": p["ok"],
        "pipeline_checksum": round(p["checksum"], 3),
        "sf_dir": sf_dir, "max_depth": max_depth,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
