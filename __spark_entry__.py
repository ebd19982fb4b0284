"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship BFS crawl on sf0.001
queries()     -> one callable per implemented operator (SURVEY.md §2)
oracle_sql()  -> matching DuckDB SQL per query (the correctness gate)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawlspark import graph, suite, suite2, suite3, suite4, suite5, suite6, suite7, suite8, suite9, suite10, suite11, suite12, suite13, suite14, suite15, suite16, suite17, suite18, suite19, suite20, suite21, suite22, suite23, suite24, suite25, suite26, suite27, suite28, suite29, suite30, suite31, suite32, suite33, suite34, suite35, suite36, suite37, suite38, suite39, suite40, suite41, suite42, suite43, suite44, suite45, suite46, suite47, suite48, suite49, suite50, suite51, suite52, suite53, suite54, suite55, suite56, suite57, suite58, suite59, suite60, suite61, suite62, suite63, suite64, suite65, suite66, suite67, suite68, suite69, suite70, suite71, suite72, suite73, suite74, suite75, suite76, suite77, suite78, suite79, suite80, suite81, suite82, suite83, suite84, suite85, suite86, suite87, suite88, suite89, suite90, suite91, suite92, suite93, suite94, suite95, suite96, suite97, suite98, suite99, suite100, suite101, suite102, suite103, suite104, suite105, suite106, suite107, suite108, suite109, suite110, suite111, suite112
from crawlspark.frontier import CrawlConfig, crawl_bfs

FLAGSHIP_DEPTH = 6


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: level-synchronous BFS crawl with robots gate, URL-seen
    anti-join dedup, and exact first-discovery crawl ordering."""
    return crawl_bfs(spark, "/root/testdata/sf0.001", CrawlConfig(max_depth=FLAGSHIP_DEPTH))


def _q_crawl_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return crawl_bfs(spark, sf_dir, CrawlConfig(max_depth=FLAGSHIP_DEPTH))


def _q_crawl_bfs_max_outputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # maxOutputs budget honored mid-crawl (reference HttpCrawl.php:171-175)
    return crawl_bfs(
        spark, sf_dir, CrawlConfig(max_depth=FLAGSHIP_DEPTH, max_outputs=100)
    )


def _q_crawl_seen_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule observable #2: the final URL-seen set after the crawl
    (ordering is observable #1, crawl_bfs).  Reference: loadedUrls in
    HttpCrawl.php:45-53, golden-asserted in CrawlingTest.php:180-205."""
    from pyspark.sql import functions as F

    bfs = crawl_bfs(spark, sf_dir, CrawlConfig(max_depth=FLAGSHIP_DEPTH))
    return bfs.select("url").distinct().orderBy("url")


def _q_crawl_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-level crawl metrics (yieldedResponseCount per depth — reference
    HttpCrawl.php:55,162,226; ours also feeds the lineage table)."""
    from pyspark.sql import functions as F

    bfs = crawl_bfs(spark, sf_dir, CrawlConfig(max_depth=FLAGSHIP_DEPTH))
    return bfs.groupBy("depth").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("host").alias("n_hosts"),
        F.min("ord").alias("first_ord"),
        F.max("ord").alias("last_ord"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {
        "crawl_bfs": _q_crawl_bfs,
        "crawl_bfs_max_outputs": _q_crawl_bfs_max_outputs,
        "crawl_seen_set": _q_crawl_seen_set,
        "crawl_metrics": _q_crawl_metrics,
    }
    out.update(suite.queries())
    out.update(suite2.queries())
    out.update(suite3.queries())
    out.update(suite4.queries())
    out.update(suite5.queries())
    out.update(suite6.queries())
    out.update(suite7.queries())
    out.update(suite8.queries())
    out.update(suite9.queries())
    out.update(suite10.queries())
    out.update(suite11.queries())
    out.update(suite12.queries())
    out.update(suite13.queries())
    out.update(suite14.queries())
    out.update(suite15.queries())
    out.update(suite16.queries())
    out.update(suite17.queries())
    out.update(suite18.queries())
    out.update(suite19.queries())
    out.update(suite20.queries())
    out.update(suite21.queries())
    out.update(suite22.queries())
    out.update(suite23.queries())
    out.update(suite24.queries())
    out.update(suite25.queries())
    out.update(suite26.queries())
    out.update(suite27.queries())
    out.update(suite28.queries())
    out.update(suite29.queries())
    out.update(suite30.queries())
    out.update(suite31.queries())
    out.update(suite32.queries())
    out.update(suite33.queries())
    out.update(suite34.queries())
    out.update(suite35.queries())
    out.update(suite36.queries())
    out.update(suite37.queries())
    out.update(suite38.queries())
    out.update(suite39.queries())
    out.update(suite40.queries())
    out.update(suite41.queries())
    out.update(suite42.queries())
    out.update(suite43.queries())
    out.update(suite44.queries())
    out.update(suite45.queries())
    out.update(suite46.queries())
    out.update(suite47.queries())
    out.update(suite48.queries())
    out.update(suite49.queries())
    out.update(suite50.queries())
    out.update(suite51.queries())
    out.update(suite52.queries())
    out.update(suite53.queries())
    out.update(suite54.queries())
    out.update(suite55.queries())
    out.update(suite56.queries())
    out.update(suite57.queries())
    out.update(suite58.queries())
    out.update(suite59.queries())
    out.update(suite60.queries())
    out.update(suite61.queries())
    out.update(suite62.queries())
    out.update(suite63.queries())
    out.update(suite64.queries())
    out.update(suite65.queries())
    out.update(suite66.queries())
    out.update(suite67.queries())
    out.update(suite68.queries())
    out.update(suite69.queries())
    out.update(suite70.queries())
    out.update(suite71.queries())
    out.update(suite72.queries())
    out.update(suite73.queries())
    out.update(suite74.queries())
    out.update(suite75.queries())
    out.update(suite76.queries())
    out.update(suite77.queries())
    out.update(suite78.queries())
    out.update(suite79.queries())
    out.update(suite80.queries())
    out.update(suite81.queries())
    out.update(suite82.queries())
    out.update(suite83.queries())
    out.update(suite84.queries())
    out.update(suite85.queries())
    out.update(suite86.queries())
    out.update(suite87.queries())
    out.update(suite88.queries())
    out.update(suite89.queries())
    out.update(suite90.queries())
    out.update(suite91.queries())
    out.update(suite92.queries())
    out.update(suite93.queries())
    out.update(suite94.queries())
    out.update(suite95.queries())
    out.update(suite96.queries())
    out.update(suite97.queries())
    out.update(suite98.queries())
    out.update(suite99.queries())
    out.update(suite100.queries())
    out.update(suite101.queries())
    out.update(suite102.queries())
    out.update(suite103.queries())
    out.update(suite104.queries())
    out.update(suite105.queries())
    out.update(suite106.queries())
    out.update(suite107.queries())
    out.update(suite108.queries())
    out.update(suite109.queries())
    out.update(suite110.queries())
    out.update(suite111.queries())
    out.update(suite112.queries())
    return out


def oracle_sql() -> dict[str, str]:
    bfs = graph.bfs_oracle_sql(FLAGSHIP_DEPTH)
    out = {
        "crawl_bfs": bfs,
        "crawl_bfs_max_outputs": (
            "WITH full_bfs AS (\n" + bfs + "\n) SELECT * FROM full_bfs WHERE ord <= 100"
        ),
        "crawl_seen_set": (
            "WITH full_bfs AS (\n" + bfs
            + "\n) SELECT DISTINCT url FROM full_bfs ORDER BY url"
        ),
        "crawl_metrics": (
            "WITH full_bfs AS (\n" + bfs + "\n) "
            "SELECT depth, COUNT(*) AS n_urls, "
            "COUNT(DISTINCT host) AS n_hosts, "
            "MIN(ord) AS first_ord, MAX(ord) AS last_ord "
            "FROM full_bfs GROUP BY depth"
        ),
    }
    out.update(suite.oracle_sql())
    out.update(suite2.oracle_sql())
    out.update(suite3.oracle_sql())
    out.update(suite4.oracle_sql())
    out.update(suite5.oracle_sql())
    out.update(suite6.oracle_sql())
    out.update(suite7.oracle_sql())
    out.update(suite8.oracle_sql())
    out.update(suite9.oracle_sql())
    out.update(suite10.oracle_sql())
    out.update(suite11.oracle_sql())
    out.update(suite12.oracle_sql())
    out.update(suite13.oracle_sql())
    out.update(suite14.oracle_sql())
    out.update(suite15.oracle_sql())
    out.update(suite16.oracle_sql())
    out.update(suite17.oracle_sql())
    out.update(suite18.oracle_sql())
    out.update(suite19.oracle_sql())
    out.update(suite20.oracle_sql())
    out.update(suite21.oracle_sql())
    out.update(suite22.oracle_sql())
    out.update(suite23.oracle_sql())
    out.update(suite24.oracle_sql())
    out.update(suite25.oracle_sql())
    out.update(suite26.oracle_sql())
    out.update(suite27.oracle_sql())
    out.update(suite28.oracle_sql())
    out.update(suite29.oracle_sql())
    out.update(suite30.oracle_sql())
    out.update(suite31.oracle_sql())
    out.update(suite32.oracle_sql())
    out.update(suite33.oracle_sql())
    out.update(suite34.oracle_sql())
    out.update(suite35.oracle_sql())
    out.update(suite36.oracle_sql())
    out.update(suite37.oracle_sql())
    out.update(suite38.oracle_sql())
    out.update(suite39.oracle_sql())
    out.update(suite40.oracle_sql())
    out.update(suite41.oracle_sql())
    out.update(suite42.oracle_sql())
    out.update(suite43.oracle_sql())
    out.update(suite44.oracle_sql())
    out.update(suite45.oracle_sql())
    out.update(suite46.oracle_sql())
    out.update(suite47.oracle_sql())
    out.update(suite48.oracle_sql())
    out.update(suite49.oracle_sql())
    out.update(suite50.oracle_sql())
    out.update(suite51.oracle_sql())
    out.update(suite52.oracle_sql())
    out.update(suite53.oracle_sql())
    out.update(suite54.oracle_sql())
    out.update(suite55.oracle_sql())
    out.update(suite56.oracle_sql())
    out.update(suite57.oracle_sql())
    out.update(suite58.oracle_sql())
    out.update(suite59.oracle_sql())
    out.update(suite60.oracle_sql())
    out.update(suite61.oracle_sql())
    out.update(suite62.oracle_sql())
    out.update(suite63.oracle_sql())
    out.update(suite64.oracle_sql())
    out.update(suite65.oracle_sql())
    out.update(suite66.oracle_sql())
    out.update(suite67.oracle_sql())
    out.update(suite68.oracle_sql())
    out.update(suite69.oracle_sql())
    out.update(suite70.oracle_sql())
    out.update(suite71.oracle_sql())
    out.update(suite72.oracle_sql())
    out.update(suite73.oracle_sql())
    out.update(suite74.oracle_sql())
    out.update(suite75.oracle_sql())
    out.update(suite76.oracle_sql())
    out.update(suite77.oracle_sql())
    out.update(suite78.oracle_sql())
    out.update(suite79.oracle_sql())
    out.update(suite80.oracle_sql())
    out.update(suite81.oracle_sql())
    out.update(suite82.oracle_sql())
    out.update(suite83.oracle_sql())
    out.update(suite84.oracle_sql())
    out.update(suite85.oracle_sql())
    out.update(suite86.oracle_sql())
    out.update(suite87.oracle_sql())
    out.update(suite88.oracle_sql())
    out.update(suite89.oracle_sql())
    out.update(suite90.oracle_sql())
    out.update(suite91.oracle_sql())
    out.update(suite92.oracle_sql())
    out.update(suite93.oracle_sql())
    out.update(suite94.oracle_sql())
    out.update(suite95.oracle_sql())
    out.update(suite96.oracle_sql())
    out.update(suite97.oracle_sql())
    out.update(suite98.oracle_sql())
    out.update(suite99.oracle_sql())
    out.update(suite100.oracle_sql())
    out.update(suite101.oracle_sql())
    out.update(suite102.oracle_sql())
    out.update(suite103.oracle_sql())
    out.update(suite104.oracle_sql())
    out.update(suite105.oracle_sql())
    out.update(suite106.oracle_sql())
    out.update(suite107.oracle_sql())
    out.update(suite108.oracle_sql())
    out.update(suite109.oracle_sql())
    out.update(suite110.oracle_sql())
    out.update(suite111.oracle_sql())
    out.update(suite112.oracle_sql())
    return out
