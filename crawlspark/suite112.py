"""Round-5 queries, part 2: driver-gated row for the headless-browser
fetch stage (the one SURVEY §2 component previously verified by pytest
only — reference: src/Loader/Http/HttpLoader.php:305-311,413 browser
routing, Browser/BrowserAction.php:17-171 post-navigate hooks,
RespondedRequest.php:16-35 screenshots on the response).

The engine binary is absent in this container, so the stage runs the
deterministic FakeBrowserTransport — but everything the oracle replays is
the REAL distributed plumbing: politeness partitioning, per-task
transport construction, the action pipeline, and the response schema.
Screenshot BYTES are codec-derived (not SQL-expressible); their presence
and format are part of the compared row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q_browser_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents-derived frontier (7 hosts) through browser_fetch_stage
    with a wait + scroll + screenshot action list; returns the rendered
    response surface (url, status, body, actions_applied, screenshot
    presence + format)."""
    from .browser import BrowserAction, browser_fetch_stage
    from .politeness import PolitenessConfig

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    frontier = docs.select(
        F.concat(F.lit("http://h"), (i % 7).cast("string"),
                 F.lit(".test/d/"), i.cast("string")).alias("url"),
        F.concat(F.lit("h"), (i % 7).cast("string")).alias("host"),
        i.alias("ord"),
    )
    actions = [
        BrowserAction.wait_until_document_contains_element("#main"),
        BrowserAction.scroll_down(500),
        BrowserAction.screenshot(fmt="png"),
    ]
    out = browser_fetch_stage(
        frontier, actions,
        cfg=PolitenessConfig(min_wait_ms=0, num_buckets=4),
    )
    return out.select(
        "url",
        F.col("status").cast("int").alias("status"),
        F.decode(F.col("body"), "UTF-8").alias("body_str"),
        F.col("actions_applied").cast("int").alias("actions_applied"),
        F.col("screenshot").isNotNull().alias("has_screenshot"),
        "screenshot_fmt",
    ).orderBy("url")


ORACLE_BROWSER_FETCH = """
SELECT u.url,
       CAST(200 AS INTEGER) AS status,
       '<html><body>rendered ' || u.url || '</body></html>' AS body_str,
       CAST(3 AS INTEGER) AS actions_applied,
       TRUE AS has_screenshot,
       'png' AS screenshot_fmt
FROM (
  SELECT 'http://h' || (doc_id % 7) || '.test/d/' || doc_id AS url
  FROM documents
) u
ORDER BY u.url
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"browser_fetch": q_browser_fetch}


def oracle_sql() -> dict[str, str]:
    return {"browser_fetch": ORACLE_BROWSER_FETCH}
