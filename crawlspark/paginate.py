"""Http::paginate — follow "next page" links until a stop rule.

Reference: src/Steps/Loading/Http.php:107-118 with
SimpleWebsitePaginator (src/Steps/Loading/Http/Paginators/
SimpleWebsitePaginator.php:57-74,187-215): fetch a page, find the next-page
link (rel=next or a CSS-selected anchor), repeat until none or maxPages
(default 1000, Paginator.php:12).  The child request inherits the parent's
method/headers — here the parent-request struct rides along as columns.

Pagination is inherently sequential (page k+1's URL is only known after
fetching page k), so this is a driver loop of single-row lookups against
the corpus; many paginations run in parallel by unioning their frontiers
(each chain stays a driver loop over a BATCH of chains — one join per step
for all active chains at once).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

MAX_PAGES_DEFAULT = 1000  # reference Paginator.php:12

_NEXT_RE = re.compile(
    r"<(?:a|link)\s[^>]*?rel\s*=\s*[\"']next[\"'][^>]*?href\s*=\s*[\"']([^\"']*)[\"']"
    r"|<(?:a|link)\s[^>]*?href\s*=\s*[\"']([^\"']*)[\"'][^>]*?rel\s*=\s*[\"']next[\"']",
    re.IGNORECASE,
)


@pandas_udf(StringType())
def extract_next_href_udf(bodies: pd.Series) -> pd.Series:
    def one(b):
        if not b:
            return None
        m = _NEXT_RE.search(b)
        if not m:
            return None
        return m.group(1) if m.group(1) is not None else m.group(2)

    return bodies.map(one)


def paginate_site(
    spark: SparkSession,
    pages: DataFrame,
    start_urls: list[str],
    max_pages: int = MAX_PAGES_DEFAULT,
) -> DataFrame:
    """Follow next-links from each start URL; returns
    (chain_id long, page_ord long, url string) for every visited page.

    All active chains advance together: one corpus join per step.
    """
    # next link extracted from the raw body via the dedicated UDF; corpus
    # rows must carry 'body' for pagination
    nexts = pages.select(
        F.col("url").alias("p_url"),
        extract_next_href_udf(F.col("body").cast("string")).alias("next_href"),
    ).persist()

    cur = spark.createDataFrame(
        [(i, u) for i, u in enumerate(start_urls)], "chain_id LONG, url STRING"
    )
    visited = []
    for page_ord in range(max_pages):
        step = cur.withColumn("page_ord", F.lit(page_ord).cast("long"))
        visited.append(step.select("chain_id", "page_ord", "url"))
        nxt = (
            cur.join(nexts, cur["url"] == nexts["p_url"], "inner")
            .filter(F.col("next_href").isNotNull())
            .select(
                "chain_id",
                _resolve_next(F.col("url"), F.col("next_href")).alias("url"),
            )
        )
        rows = nxt.count()
        if rows == 0:
            break
        cur = nxt.localCheckpoint(eager=True)
    nexts.unpersist()
    out = visited[0]
    for v in visited[1:]:
        out = out.unionByName(v)
    return out


@pandas_udf(StringType())
def _resolve_next(base_urls: pd.Series, hrefs: pd.Series) -> pd.Series:
    from .extract import resolve_url

    return pd.Series(
        [resolve_url(b, None, h) for b, h in zip(base_urls, hrefs)]
    )


def paginate_query_params(
    spark: SparkSession,
    pages: DataFrame,
    start_urls: list[str],
    param: str = "page",
    by: int = 1,
    stop_contains: str | None = None,
    max_pages: int = MAX_PAGES_DEFAULT,
) -> DataFrame:
    """QueryParamsPaginator::paramsInUrl().increase(param, by) with a
    Contains stop rule.

    Reference: Paginators/QueryParamsPaginator.php:28-62 (Incrementor.php:
    22-38 sets ``param`` to current+by each step) and StopRules/Contains.php:
    17-25 (stop AFTER processing a page whose trimmed body contains the
    needle; a missing page also stops).  ``maxPages`` default 1000
    (Paginator.php:12).

    All chains advance together (one corpus join per step); the query-param
    rewrite is a JVM regexp on the URL, so the per-step plan is
    join -> filter -> regexp_replace with no Python.  Returns
    (chain_id, page_ord, url) for every page actually requested.
    """
    # anchor on [?&] and escape the param name so 'page' can never match
    # inside 'perpage' and names with regex metachars (items[]) stay literal;
    # the ${pfx} named-group backref is unambiguous when followed by digits
    pfx = r"[?&]" + re.escape(param) + "="
    rewrite_pat = "(?<pfx>" + pfx + r")\d+"
    extract_pat = "(" + pfx + r")(\d+)"
    bodies = pages.select(
        F.col("url").alias("p_url"), F.col("body").cast("string").alias("p_body")
    ).persist()
    cur = spark.createDataFrame(
        [(i, u) for i, u in enumerate(start_urls)], "chain_id LONG, url STRING"
    )
    visited = []
    for page_ord in range(max_pages):
        # cur is always materialized (createDataFrame / localCheckpoint), so
        # recording the visit from it costs nothing at final union time
        visited.append(
            cur.select(
                "chain_id", F.lit(page_ord).cast("long").alias("page_ord"), "url"
            )
        )
        alive = cur.join(bodies, cur["url"] == bodies["p_url"], "inner")
        if stop_contains is not None:
            alive = alive.filter(~F.trim(F.col("p_body")).contains(stop_contains))
        cur_num = F.regexp_extract(F.col("url"), extract_pat, 2).try_cast("long")
        nxt = alive.select(
            "chain_id",
            F.regexp_replace(
                F.col("url"),
                rewrite_pat,
                F.concat(F.lit("${pfx}"), (cur_num + by).cast("string")),
            ).alias("url"),
        ).filter(F.col("url").isNotNull())  # param missing/non-numeric -> chain ends
        cur = nxt.localCheckpoint(eager=True)
        if cur.count() == 0:
            break
    bodies.unpersist()
    out = visited[0]
    for v in visited[1:]:
        out = out.unionByName(v)
    return out
