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
from dataclasses import dataclass

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


def _make_pagination_links_udf(selector: str):
    """(page_url, body) -> absolute pagination-link URLs, document order.
    CSS-subset element match + <a href> collection (cssq), resolved against
    the document URL honoring <base href> — one Arrow batch per partition."""
    from pyspark.sql.types import ArrayType

    from . import cssq  # validate selector eagerly (InvalidDomQueryException)

    cssq.parse_selector(selector)

    @pandas_udf(ArrayType(StringType()))
    def links(urls: pd.Series, bodies: pd.Series) -> pd.Series:
        from . import cssq, extract

        def one(url, body):
            if body is None:
                return []
            bm = extract._BASE_RE.search(body)
            base = (
                (bm.group(2) if bm.group(2) is not None else bm.group(3))
                if bm else None
            )
            hrefs = cssq.pagination_link_hrefs(body, selector)
            out, seen_local = [], set()
            for h in hrefs:
                u = extract.resolve_url(url, base, h)
                if u is not None and u not in seen_local:
                    seen_local.add(u)
                    out.append(u)
            return out

        return pd.Series([one(u, b) for u, b in zip(urls, bodies)])

    return links


def website_paginate(
    spark: SparkSession,
    pages: DataFrame,
    start_urls: "list[str] | DataFrame",
    selector: str,
    max_pages: int = MAX_PAGES_DEFAULT,
    stop_rule: StopRule | None = None,
) -> DataFrame:
    """SimpleWebsitePaginator: follow CSS-selected pagination links in FIFO
    discovery order with per-chain URL dedup and parent-request inheritance
    (reference: SimpleWebsitePaginator.php:57-74,110-215 — getNextRequest
    builds the next request FROM the request of the page the link was found
    on; ``found_on`` carries that provenance so a live transport reuses the
    parent's method/headers).

    Returns (chain_id long, page_ord long, url string, found_on string) for
    every page requested; page_ord counts requests per chain (maxPages cap,
    Paginator.php:12).  All chains advance together: one corpus join + one
    Arrow link-extraction batch per step — the queue/loaded state lives in
    array columns, nothing on the driver.
    """
    links_udf = _make_pagination_links_udf(selector)
    bodies = pages.select(
        F.col("url").alias("p_url"), F.col("body").cast("string").alias("p_body")
    ).persist()
    q_type = "array<struct<url:string,found_on:string>>"
    if isinstance(start_urls, DataFrame):  # (chain_id, url) — no driver list
        starts = start_urls.select(F.col("chain_id").cast("long"), "url")
    else:
        starts = spark.createDataFrame(
            [(i, u) for i, u in enumerate(start_urls)], "chain_id LONG, url STRING"
        )
    cur = starts.select(
        "chain_id", "url", F.lit(None).cast("string").alias("found_on"),
        F.from_json(F.lit("[]"), q_type).alias("queue"),
        F.from_json(F.lit("[]"), "array<string>").alias("loaded"),
    )
    visited = []
    for page_ord in range(max_pages):
        visited.append(
            cur.select(
                "chain_id", F.lit(page_ord).cast("long").alias("page_ord"),
                "url", "found_on",
            )
        )
        st = cur.join(bodies, cur["url"] == bodies["p_url"], "left").drop("p_url")
        # processLoaded order (SimpleWebsitePaginator.php:79-98): mark the
        # requested URL loaded FIRST, then collect pagination links
        st = st.withColumn("loaded", F.array_union("loaded", F.array("url")))
        st = st.withColumn("_links", links_udf(F.col("url"), F.col("p_body")))
        known = F.array_union(
            F.col("loaded"), F.transform("queue", lambda q: q["url"])
        )
        fresh = F.array_distinct(
            F.filter("_links", lambda u: ~F.array_contains(known, u))
        )
        st = st.withColumn(
            "queue",
            F.concat(
                "queue",
                F.transform(
                    fresh,
                    lambda u: F.struct(
                        u.alias("url"), F.col("url").alias("found_on")
                    ),
                ),
            ),
        )
        if stop_rule is not None:
            # a page matching the rule (or a failed load) finishes the chain
            # AFTER being processed (StopRules/*.php: null response -> stop)
            st = st.filter(
                ~F.coalesce(stop_rule.stop_col(F.col("p_body")), F.lit(True))
            )
        head = F.element_at("queue", 1)
        nxt = (
            st.filter(F.size("queue") > 0)
            .select(
                "chain_id",
                head["url"].alias("url"),
                head["found_on"].alias("found_on"),
                F.slice("queue", 2, F.greatest(F.size("queue") - 1, F.lit(0)))
                .alias("queue"),
                "loaded",
            )
        )
        cur = nxt.localCheckpoint(eager=True)
        if cur.count() == 0:
            break
    bodies.unpersist()
    out = visited[0]
    for v in visited[1:]:
        out = out.unionByName(v)
    return out


# --------------------------------------------------------------------------
# Stop-rule family (reference: src/Steps/Loading/Http/Paginators/StopRules/*)
# Each rule compiles to `stop_col(body) -> boolean Column`: TRUE = finish the
# chain AFTER processing this page (the triggering page is still yielded,
# Contains.php:17-25).  A missing page always stops (StopRule.php: null
# respondedRequest -> shouldStop true) — the corpus inner-join encodes that.
# --------------------------------------------------------------------------


class StopRule:
    def stop_col(self, body):  # pragma: no cover - interface
        raise NotImplementedError


class ContainsRule(StopRule):
    """StopRules/Contains.php:17-25 — trimmed body contains the needle."""

    def __init__(self, needle: str):
        self.needle = needle

    def stop_col(self, body):
        return F.trim(body).contains(self.needle)


class NotContainsRule(StopRule):
    """StopRules/NotContains.php — trimmed body does NOT contain needle."""

    def __init__(self, needle: str):
        self.needle = needle

    def stop_col(self, body):
        return ~F.trim(body).contains(self.needle)


class IsEmptyResponseRule(StopRule):
    """StopRules/IsEmptyResponse.php — '' / '[]' / '{}' after trim."""

    def stop_col(self, body):
        t = F.trim(body)
        return body.isNull() | t.isin("", "[]", "{}")


class IsEmptyInJsonRule(StopRule):
    """StopRules/IsEmptyInJson.php — PHP empty() on the dot-notation key:
    missing, null, '', 0, '0', false, empty array/object all stop."""

    def __init__(self, dot_key: str):
        self.dot_key = dot_key

    def stop_col(self, body):
        # VARIANT round-trip (parse_json -> variant_get -> to_json)
        # disambiguates typed vs string values, which get_json_object can't:
        # {"items": false} re-renders as false (PHP-empty) while
        # {"items": "false"} re-renders as "false" — a non-empty string that
        # PHP empty() keeps (the reference continues paginating on it)
        sub = F.try_variant_get(
            F.try_parse_json(F.trim(body)), "$." + self.dot_key, "variant"
        )
        r = F.to_json(sub)
        return r.isNull() | r.isin(
            "null", "false", "0", "0.0", '"0"', '""', "[]", "{}"
        )


class _IsEmptyInDomRule(StopRule):
    """StopRules/IsEmptyInDom.php:24-56 — no element matches the selector,
    or every match has blank inner source.  Regex-backed CSS subset
    (crawlspark.cssq); Arrow-batched probe."""

    def __init__(self, selector: str):
        from . import cssq

        cssq.parse_selector(selector)  # validate eagerly, like the reference
        self.selector = selector

    def stop_col(self, body):
        from pyspark.sql.types import BooleanType

        sel = self.selector

        @pandas_udf(BooleanType())
        def empty_in_dom(bodies: pd.Series) -> pd.Series:
            from . import cssq

            def one(b):
                if b is None:
                    return True
                try:
                    inners = cssq.inner_htmls(b.strip(), sel)
                except Exception:
                    return True  # unparseable document stops (IsEmptyInDom.php:33-36)
                # inner now preserves comments (real-DOM innerHTML); the
                # emptiness test mirrors textContent, so blank them first
                return len(inners) == 0 or all(
                    not cssq._mask_soup(i).strip() for i in inners
                )

            return bodies.map(one)

        return empty_in_dom(body)


class IsEmptyInHtmlRule(_IsEmptyInDomRule):
    """StopRules/IsEmptyInHtml.php"""


class IsEmptyInXmlRule(_IsEmptyInDomRule):
    """StopRules/IsEmptyInXml.php"""


@dataclass(frozen=True)
class QueryParamOp:
    """One Incrementor/Decrementor (QueryParams/Incrementor.php:22-38,
    Decrementor.php:22-38): set ``param`` to (int)current + delta.  PHP
    semantics kept exactly: a missing param or non-numeric value reads as
    PHP's ``(int)`` cast (leading integer, else 0), and a missing param is
    ADDED by Query::set — the chain does NOT end.  ``dot=True`` addresses a
    nested query key ('page.number' -> ``page[number]=`` in the rendered
    string, Adbar\\Dot over Query::toArray)."""

    param: str
    delta: int = 1
    dot: bool = False

    def rendered_name(self) -> str:
        if not self.dot:
            return self.param
        head, *rest = self.param.split(".")
        return head + "".join(f"[{p}]" for p in rest)


def increase(param: str, by: int = 1, dot: bool = False) -> QueryParamOp:
    """QueryParamsPaginator::increase / increaseUsingDotNotation."""
    return QueryParamOp(param, by, dot)


def decrease(param: str, by: int = 1, dot: bool = False) -> QueryParamOp:
    """QueryParamsPaginator::decrease / decreaseUsingDotNotation."""
    return QueryParamOp(param, -by, dot)


def _apply_query_op(col, op: QueryParamOp, in_url: bool):
    """Apply one manipulator to a query-carrying string column (the URL for
    paramsInUrl, the form-encoded request body for paramsInBody) as pure JVM
    regexp expressions — no Python in the per-step plan.

    The anchor ([?&] in URLs, start-or-& in bodies) and re.escape keep
    'page' from matching inside 'perpage' and make bracketed dot-notation
    names ('page[number]') literal."""
    name = op.rendered_name()
    esc = re.escape(name)
    anchor = r"[?&]" if in_url else r"(?:^|&)"
    # PHP (int) on the current value: leading integer, else/missing 0
    cur = F.coalesce(
        F.regexp_extract(col, anchor + esc + r"=(-?\d+)", 1).try_cast("long"),
        F.lit(0),
    )
    new_val = (cur + op.delta).cast("string")
    present = col.rlike(anchor + esc + "=")
    rewrite_pat = "(?<pfx>" + anchor + esc + ")=[^&]*"
    replaced = F.regexp_replace(
        col, rewrite_pat, F.concat(F.lit("${pfx}="), new_val)
    )
    pair = F.concat(F.lit(name + "="), new_val)
    if in_url:
        appended = F.when(
            col.contains("?"), F.concat(col, F.lit("&"), pair)
        ).otherwise(F.concat(col, F.lit("?"), pair))
    else:
        appended = F.when(
            F.coalesce(F.length(col), F.lit(0)) > 0,
            F.concat(col, F.lit("&"), pair),
        ).otherwise(pair)
    return F.when(present, replaced).otherwise(appended)


def paginate_query_params(
    spark: SparkSession,
    pages: DataFrame,
    start_urls: list[str],
    param: str = "page",
    by: int = 1,
    stop_contains: str | None = None,
    stop_rule: StopRule | None = None,
    max_pages: int = MAX_PAGES_DEFAULT,
    ops: "list[QueryParamOp] | None" = None,
    params_in_body: bool = False,
    start_bodies: "list[str] | None" = None,
) -> DataFrame:
    """QueryParamsPaginator: paramsInUrl()/paramsInBody() with any chain of
    increase/decrease manipulators (incl. dot notation) and a stop rule.

    Reference: Paginators/QueryParamsPaginator.php:28-113 — getNextRequest
    rewrites the query string of the URL (paramsInUrl) or of the
    form-encoded request body (paramsInBody), applying every manipulator in
    order; Incrementor/Decrementor set ``param`` to (int)current ± by, and
    Query::set ADDS a missing param (current reads as 0).  Stop rules:
    StopRules/Contains.php:17-25 (stop AFTER processing a matching page);
    a missing page also stops.  ``maxPages`` default 1000 (Paginator.php:12).

    All chains advance together (one corpus join per step); the query-param
    rewrite is a JVM regexp, so the per-step plan is join -> filter ->
    regexp_replace with no Python.  Returns (chain_id, page_ord, url) —
    plus req_body when params_in_body — for every page actually requested.
    For paramsInBody the corpus must carry (url, req_body, body): the
    request identity is url+body, matching the reference where the paginated
    POST body selects the page.
    """
    if ops is None:
        ops = [QueryParamOp(param, by)]
    bodies_cols = [
        F.col("url").alias("p_url"),
        F.col("body").cast("string").alias("p_body"),
    ]
    if params_in_body:
        bodies_cols.insert(1, F.col("req_body").cast("string").alias("p_req"))
    bodies = pages.select(*bodies_cols).persist()
    if params_in_body:
        if isinstance(start_urls, DataFrame):  # (chain_id, url[, req_body])
            cur = start_urls
            if "req_body" not in cur.columns:
                cur = cur.withColumn("req_body", F.lit(""))
            cur = cur.select(
                F.col("chain_id").cast("long"), "url",
                F.coalesce(F.col("req_body").cast("string"), F.lit(""))
                .alias("req_body"),
            ).localCheckpoint(eager=True)
        else:
            sb = start_bodies or [""] * len(start_urls)
            cur = spark.createDataFrame(
                [(i, u, b) for i, (u, b) in enumerate(zip(start_urls, sb))],
                "chain_id LONG, url STRING, req_body STRING",
            )
        out_cols = ["chain_id", "url", "req_body"]
        join_cond = lambda c: (c["url"] == bodies["p_url"]) & (  # noqa: E731
            c["req_body"] == bodies["p_req"]
        )
        target = "req_body"
    else:
        if isinstance(start_urls, DataFrame):  # (chain_id, url) — no driver list
            cur = start_urls.select(
                F.col("chain_id").cast("long"), "url"
            ).localCheckpoint(eager=True)
        else:
            cur = spark.createDataFrame(
                [(i, u) for i, u in enumerate(start_urls)],
                "chain_id LONG, url STRING",
            )
        out_cols = ["chain_id", "url"]
        join_cond = lambda c: c["url"] == bodies["p_url"]  # noqa: E731
        target = "url"
    visited = []
    for page_ord in range(max_pages):
        # cur is always materialized (createDataFrame / localCheckpoint), so
        # recording the visit from it costs nothing at final union time
        visited.append(
            cur.select(
                "chain_id",
                F.lit(page_ord).cast("long").alias("page_ord"),
                *out_cols[1:],
            )
        )
        alive = cur.join(bodies, join_cond(cur), "inner")
        if stop_contains is not None:
            alive = alive.filter(~F.trim(F.col("p_body")).contains(stop_contains))
        if stop_rule is not None:
            alive = alive.filter(~stop_rule.stop_col(F.col("p_body")))
        q = F.col(target)
        for op in ops:
            q = _apply_query_op(q, op, in_url=not params_in_body)
        nxt = alive.select(
            "chain_id", *[c for c in out_cols[1:] if c != target],
            q.alias(target),
        ).filter(F.col(target).isNotNull())
        cur = nxt.select(*out_cols).localCheckpoint(eager=True)
        if cur.count() == 0:
            break
    bodies.unpersist()
    out = visited[0]
    for v in visited[1:]:
        out = out.unionByName(v)
    return out
