"""The site-crawl engine: URL-string frontier over a page corpus.

This is the general engine behind ``Http::crawl()`` semantics (reference:
src/Steps/Loading/HttpCrawl.php:19-180): level-synchronous BFS with

- first-discovery ordering (HttpCrawl.php:221,294-331),
- exact-string URL-seen set fed by requested + redirect-chain + effective
  (+ canonical) URIs (HttpCrawl.php:333-407),
- robots gate (RobotsTxtHandler.php:43-97),
- sameHost (default) / sameDomain scoping pinned from the seed
  (HttpCrawl.php:185-198),
- pathStartsWith / pathMatches / customFilter load criteria, with
  loadAllButYieldOnlyMatching (HttpCrawl.php:68-120),
- fragment drop by default, keepUrlFragment opt-out (HttpCrawl.php:122-127,
  466-473),
- useCanonicalLinks dedup (HttpCrawl.php:377-407),
- inputIsSitemap seeding (HttpCrawl.php:242-331),
- maxOutputs budget enforced mid-crawl (HttpCrawl.php:171-175,226-231),
- depth limit (HttpCrawl.php:62-67,409-412).

The fetch is an equi-join of the frontier against the page corpus (the
deterministic stand-in for network I/O, exactly how the reference's own
integration tests use a fixture server).  A live-fetch stage would swap the
join for a ``mapInPandas`` batch over the politeness-ordered frontier — the
surrounding plan (robots gate, seen anti-join, ordering) is unchanged.

Scale: per level this costs one corpus equi-join (hash join on url; at
10^10 scale the corpus and seen tables are bucketed by url_hash), one
explode + groupBy-min (map-side combine), one anti-join against seen, and a
distributed rank.  ``localCheckpoint`` per level keeps lineage O(1).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from . import extract
from .canon import registrable_domain
from .ranks import global_rank
from .robots import with_robots_allowed

MAX_REDIRECTS = 10  # reference: src/Loader/Http/HttpLoader.php:64


@dataclass
class SiteCrawlConfig:
    max_depth: int | None = None
    same_host: bool = True
    same_domain: bool = False
    path_starts_with: str | None = None
    path_matches: str | None = None
    # (url Column, link_text Column-or-null) -> boolean Column
    custom_filter: Callable[[Column, Column], Column] | None = None
    load_all_but_yield_only_matching: bool = False
    keep_url_fragment: bool = False
    use_canonical_links: bool = False
    input_is_sitemap: bool = False
    max_outputs: int | None = None
    user_agent_is_bot: bool = True
    # yield 4xx/5xx responses too (reference Http step suppresses >=400
    # unless yieldErrorResponses(), HttpBase.php:260-277)
    yield_error_responses: bool = False


@pandas_udf(StringType())
def _resolve_one_udf(bases: pd.Series, hrefs: pd.Series) -> pd.Series:
    return pd.Series(
        [
            extract.resolve_url(b, None, h) if h is not None else None
            for b, h in zip(bases, hrefs)
        ]
    )


def prepare_corpus(pages: DataFrame) -> DataFrame:
    """Normalize a page corpus to the engine's parsed shape.

    Input needs: url, status; optional: redirect_to, body, links, base_href,
    canonical_href, content_type, latency_ms.  Missing link metadata is
    extracted from ``body`` with the vectorized extractors.
    """
    cols = set(pages.columns)
    df = pages
    if "redirect_to" not in cols:
        df = df.withColumn("redirect_to", F.lit(None).cast("string"))
    has_body = "body" in cols
    body = F.col("body").cast("string") if has_body else F.lit(None).cast("string")
    if "links" not in cols:
        df = df.withColumn("links", extract.extract_links_udf(body))
    if "base_href" not in cols:
        df = df.withColumn("base_href", extract.extract_base_href_udf(body) if has_body else F.lit(None).cast("string"))
    if "canonical_href" not in cols:
        df = df.withColumn("canonical_href", extract.extract_canonical_udf(body) if has_body else F.lit(None).cast("string"))
    if "sitemap_locs" not in cols:
        if has_body:
            is_xml = (
                F.col("content_type").contains("xml")
                if "content_type" in cols
                else body.contains("<urlset")
            )
            df = df.withColumn(
                "sitemap_locs",
                F.when(is_xml, extract.extract_sitemap_locs_udf(body)).otherwise(
                    F.lit(None).cast("array<string>")
                ),
            )
        else:
            df = df.withColumn("sitemap_locs", F.lit(None).cast("array<string>"))
    if "latency_ms" not in cols:
        df = df.withColumn("latency_ms", F.lit(0).cast("long"))
    return df.select(
        "url", "status", "redirect_to", "links", "base_href", "canonical_href",
        "sitemap_locs", "latency_ms",
    )


def redirect_closure(parsed: DataFrame) -> DataFrame:
    """(fetch_url, chain array<string>) for every URL that redirects; chain
    holds each hop in order ending at the final URL.  Follows <= MAX_REDIRECTS
    hops, like the reference loader (HttpLoader.php:430-470)."""
    hops = parsed.filter(F.col("redirect_to").isNotNull()).select(
        F.col("url").alias("src"), F.col("redirect_to").alias("dst")
    )
    hops = hops.persist()
    closure = hops.select(
        F.col("src").alias("fetch_url"),
        F.array(F.col("dst")).alias("chain"),
        F.col("dst").alias("cur"),
    )
    hops2 = hops.select(F.col("src").alias("h_src"), F.col("dst").alias("h_dst"))
    for _ in range(MAX_REDIRECTS - 1):
        nxt = (
            closure.join(hops2, closure["cur"] == F.col("h_src"), "left")
            .select(
                "fetch_url",
                F.when(
                    F.col("h_dst").isNotNull(),
                    F.concat("chain", F.array(F.col("h_dst"))),
                ).otherwise(F.col("chain")).alias("chain"),
                F.col("h_dst").alias("cur"),
            )
        )
        # fixpoint check: any chain still extendable?
        if nxt.filter(F.col("cur").isNotNull()).count() == 0:
            closure = nxt
            break
        closure = nxt
    hops.unpersist()
    return closure.select("fetch_url", "chain")


def _strip_frag(c: Column) -> Column:
    return F.substring_index(c, "#", 1)


def _path_of(c: Column) -> Column:
    return F.coalesce(F.parse_url(c, F.lit("PATH")), F.lit("/"))


def _host_of(c: Column) -> Column:
    return F.lower(F.parse_url(c, F.lit("HOST")))


def crawl_site(
    spark: SparkSession,
    pages: DataFrame,
    seed_url: str,
    cfg: SiteCrawlConfig | None = None,
    robots: DataFrame | None = None,
) -> DataFrame:
    """Crawl the corpus from ``seed_url``.

    Returns one row per ATTEMPTED fetch, in crawl order:
    (url, effective_url, host, depth long, ord long, loaded bool, yielded bool).
    ``url`` is the requested URL (the reference TestLoader's loadedUrls
    observable); ``effective_url`` is post-redirect (and post-canonical when
    useCanonicalLinks) — the reference Result 'url' observable.
    """
    cfg = cfg or SiteCrawlConfig()

    parsed = prepare_corpus(pages).persist()
    closure = redirect_closure(parsed).persist()

    seed_parts = urlsplit(seed_url)
    seed_host = (seed_parts.hostname or "").lower()
    seed_domain_df = spark.createDataFrame([(seed_host,)], "h STRING").select(
        registrable_domain(F.col("h")).alias("d")
    )
    seed_domain = seed_domain_df.collect()[0]["d"]

    def matching_col(url: Column, text: Column) -> Column:
        conds = []
        path = _path_of(url)
        if cfg.path_starts_with:
            conds.append(path.startswith(cfg.path_starts_with))
        if cfg.path_matches:
            conds.append(path.rlike(cfg.path_matches))
        if cfg.custom_filter is not None:
            conds.append(cfg.custom_filter(url, text))
        if not conds:
            return F.lit(True)
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    def scope_col(url: Column) -> Column:
        host = _host_of(url)
        if cfg.same_domain and not cfg.same_host:
            return registrable_domain(host) == seed_domain
        return host == seed_host

    seed_req = seed_url if cfg.keep_url_fragment else seed_url.split("#", 1)[0]
    frontier = (
        spark.createDataFrame([(seed_req,)], "url STRING")
        .select(
            "url",
            _strip_frag(F.col("url")).alias("fetch_url"),
            _host_of(F.col("url")).alias("host"),
            _path_of(F.col("url")).alias("path"),
            F.lit(1).cast("long").alias("ord"),
            F.lit(0).cast("long").alias("depth"),
            (
                matching_col(F.col("url"), F.lit(None).cast("string"))
                & F.lit(not cfg.input_is_sitemap)
            ).alias("yield_flag"),
        )
        .localCheckpoint(eager=True)
    )

    seen = spark.createDataFrame([], "id STRING").localCheckpoint(eager=True)
    out_levels: list[DataFrame] = []
    base_ord = 1
    yielded_total = 0
    depth = 0

    while True:
        f = with_robots_allowed(
            frontier, robots, user_agent_is_bot=cfg.user_agent_is_bot
        )
        fetched = f.join(closure, "fetch_url", "left").withColumn(
            "final_fetch", F.coalesce(F.element_at("chain", -1), F.col("fetch_url"))
        )
        page_side = parsed.select(
            F.col("url").alias("final_fetch"),
            F.col("status").alias("p_status"),
            F.col("links").alias("p_links"),
            F.col("base_href").alias("p_base"),
            F.col("canonical_href").alias("p_canonical"),
            F.col("sitemap_locs").alias("p_locs"),
        )
        fetched = fetched.join(page_side, "final_fetch", "left")
        fetched = fetched.withColumn(
            "loaded", F.col("robots_allowed") & F.col("p_status").isNotNull()
        )
        canonical_abs = F.when(
            F.col("loaded") & F.col("p_canonical").isNotNull(),
            _resolve_one_udf(F.col("final_fetch"), F.col("p_canonical")),
        )
        fetched = fetched.withColumn("canonical_abs", canonical_abs)
        eff = F.when(
            F.col("chain").isNotNull(), F.col("final_fetch")
        ).otherwise(F.col("url"))
        if cfg.use_canonical_links:
            eff = F.coalesce(F.col("canonical_abs"), eff)
        fetched = fetched.withColumn("effective_url", eff)
        fetched = fetched.localCheckpoint(eager=True)

        # ---- staleness gate (reference wasAlreadyLoaded,
        # HttpCrawl.php:355-375): a response is already-loaded when ANY of
        # its URIs — requested, each redirect hop, final — is in the seen
        # set.  Canonical is NOT part of this check (it is recorded after,
        # HttpCrawl.php:212-216) and only suppresses the yield.
        fetched = fetched.withColumn(
            "load_eff",
            F.when(F.col("chain").isNotNull(), F.col("final_fetch")).otherwise(
                F.col("url")
            ),
        )
        ids = F.array_union(
            F.array(F.col("url"), F.col("final_fetch")),
            F.coalesce(F.col("chain"), F.array()),
        )
        stale_ords = (
            fetched.select("ord", F.explode(ids).alias("id"))
            .join(seen, "id")
            .select("ord")
            .distinct()
            .withColumn("__stale", F.lit(True))
        )
        w_load = Window.partitionBy("load_eff").orderBy("ord")
        w_eff = Window.partitionBy("effective_url").orderBy("ord")
        lvl = (
            fetched.join(stale_ords, "ord", "left")
            .join(
                seen.select(F.col("id").alias("effective_url")).withColumn(
                    "__eff_seen", F.lit(True)
                ),
                "effective_url",
                "left",
            )
            .withColumn("__rn_load", F.row_number().over(w_load))
            .withColumn("__rn_eff", F.row_number().over(w_eff))
            .withColumn(
                # "fresh" = response processed: yielded (maybe), seen-update,
                # link extraction (HttpCrawl.php:212 gate)
                "fresh",
                F.col("loaded")
                & F.col("__stale").isNull()
                & (F.col("__rn_load") == 1),
            )
            .withColumn(
                # canonical/effective dedup additionally gates the yield
                # (yieldResponse, HttpCrawl.php:388-395)
                "yielded",
                F.col("fresh")
                & F.col("yield_flag")
                & (
                    F.coalesce(F.col("p_status").isNotNull(), F.lit(False))
                    if cfg.yield_error_responses
                    else F.coalesce(F.col("p_status") < 400, F.lit(False))
                )
                & F.col("__eff_seen").isNull()
                & (F.col("__rn_eff") == 1),
            )
        )
        lvl = lvl.localCheckpoint(eager=True)
        out_levels.append(
            lvl.select(
                "url", "effective_url", "host", "depth", "ord", "loaded", "yielded"
            )
        )
        yielded_total += lvl.filter("yielded").count()

        # ---- seen update: requested + chain + effective + canonical ids
        # (addLoadedUrlsFromResponse runs only for fresh responses)
        new_ids = (
            lvl.filter("fresh")
            .select(
                F.array_union(
                    F.array_union(
                        F.array(F.col("url"), F.col("effective_url"), F.col("final_fetch")),
                        F.coalesce(F.col("chain"), F.array()),
                    ),
                    # canonical joins the seen-set only in useCanonicalLinks
                    # mode (reference setResponseCanonicalUrl records it as a
                    # redirect, HttpCrawl.php:400-407)
                    F.when(
                        F.lit(cfg.use_canonical_links)
                        & F.col("canonical_abs").isNotNull(),
                        F.array(F.col("canonical_abs")),
                    ).otherwise(F.array()),
                ).alias("ids")
            )
            .select(F.explode("ids").alias("id"))
            .distinct()
        )
        seen = seen.union(new_ids).distinct().localCheckpoint(eager=True)

        # ---- stop?
        if cfg.max_depth is not None and depth >= cfg.max_depth:
            break
        if cfg.max_outputs is not None and yielded_total >= cfg.max_outputs:
            break

        # ---- expand
        links_src = F.col("p_links")
        if cfg.input_is_sitemap and depth == 0:
            links_src = F.when(
                F.col("p_locs").isNotNull(),
                F.transform(
                    F.col("p_locs"),
                    lambda loc, i: F.struct(
                        loc.alias("href"),
                        F.lit(None).cast("string").alias("text"),
                        i.cast("int").alias("pos"),
                    ),
                ),
            ).otherwise(links_src)
        resolve_udf = extract.make_resolve_links_udf(cfg.keep_url_fragment)
        cand = (
            lvl.filter("fresh")
            .select(
                F.col("ord").alias("parent_ord"),
                resolve_udf(
                    F.col("final_fetch"), F.col("p_base"), links_src
                ).alias("resolved"),
            )
            .select("parent_ord", F.explode("resolved").alias("l"))
            .select(
                F.col("l.url").alias("url"),
                F.col("l.text").alias("text"),
                F.col("l.pos").alias("pos"),
                "parent_ord",
            )
        )
        cand = cand.filter(scope_col(F.col("url")))
        m = matching_col(F.col("url"), F.col("text"))
        cand = cand.withColumn("matching", m)
        if not cfg.load_all_but_yield_only_matching:
            cand = cand.filter("matching")
        cand = (
            cand.groupBy("url")
            .agg(
                F.min(F.struct("parent_ord", "pos")).alias("rk"),
                F.max("matching").alias("yield_flag"),
            )
            .join(seen.select(F.col("id").alias("url")), "url", "left_anti")
            # the reference also refuses to re-add URLs sitting in the
            # frontier currently being iterated (HttpCrawl.php:282)
            .join(frontier.select("url"), "url", "left_anti")
        )
        cnt = cand.count()
        if cnt == 0:
            break
        ranked = global_rank(cand, "rk", out="r", num_rows=cnt).select(
            "url",
            (F.lit(base_ord) + F.col("r")).alias("ord"),
            "yield_flag",
        )
        # maxOutputs mid-level cut: stop before the fetch whose predecessor
        # yields exhaust the budget (reference HttpCrawl.php:226-231)
        if cfg.max_outputs is not None:
            remaining = cfg.max_outputs - yielded_total
            wy = Window.orderBy("ord").rowsBetween(Window.unboundedPreceding, -1)
            ranked = ranked.withColumn(
                "__y_before",
                F.coalesce(F.sum(F.col("yield_flag").cast("long")).over(wy), F.lit(0)),
            )
            ranked = ranked.filter(F.col("__y_before") < remaining).drop("__y_before")
            cnt = ranked.count()
            if cnt == 0:
                break
        depth += 1
        frontier = ranked.select(
            "url",
            _strip_frag(F.col("url")).alias("fetch_url"),
            _host_of(F.col("url")).alias("host"),
            _path_of(F.col("url")).alias("path"),
            "ord",
            F.lit(depth).cast("long").alias("depth"),
            "yield_flag",
        ).localCheckpoint(eager=True)
        base_ord += cnt

    parsed.unpersist()
    closure.unpersist()
    out = out_levels[0]
    for lv in out_levels[1:]:
        out = out.unionByName(lv)
    return out
