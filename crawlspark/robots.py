"""robots.txt politeness gate.

Reference semantics (src/Loader/Http/Politeness/RobotsTxtHandler.php:43-97):
- rules enforced only for bot user agents,
- ``/robots.txt`` itself is always allowed,
- unparseable / missing robots ⇒ allow all,
- longest-match wins between Allow / Disallow prefixes.

Spark shape: rules are a tiny per-host table (one robots.txt per host —
at 10^10 URLs you still have only ~10^6 hosts), so the gate is a BROADCAST
join of the frontier against the rules table on ``host`` followed by pure
Column-expression prefix matching (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ROBOTS_SCHEMA = (
    "host STRING, user_agent STRING, disallow_prefixes ARRAY<STRING>, "
    "allow_prefixes ARRAY<STRING>, sitemaps ARRAY<STRING>"
)


def parse_robots_txt(
    texts: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Raw robots.txt text → per-(host, user_agent) rules table.

    The reference delegates this parse to the crwlr/robots-txt package
    (RobotsTxtHandler.php uses ``RobotsTxt::parse``); semantics follow
    RFC 9309 / the Google REP spec:

    - a ``#`` starts a comment (to end of line); lines are trimmed,
    - a directive is ``name: value`` — name case-insensitive, value may
      itself contain ``:`` (Sitemap URLs),
    - consecutive ``User-agent`` lines form ONE group header; the
      Allow/Disallow/Crawl-delay rules that follow attach to every agent
      named in the header (blank / unknown lines do not split a header),
    - rules before any ``User-agent`` line belong to no group → dropped,
    - empty Allow/Disallow values carry no rule (``Disallow:`` = allow
      all) and are skipped,
    - ``Sitemap`` is host-global (returned on every group row),
    - ``Crawl-delay`` (non-standard, widely honored) is per group, in
      seconds; the smallest value in a group wins.

    Spark shape: one robots.txt per host (~10^6 rows at 10^10 URLs), so a
    per-host ``posexplode`` of lines plus partitioned windows is cheap and
    fully JVM-side (no UDF).  Output columns: ROBOTS_SCHEMA +
    ``crawl_delay`` (double seconds, null when absent) — directly usable
    by :func:`with_robots_allowed` and
    :func:`crawlspark.politeness.throttle_schedule` (delay_col).
    """
    host = F.col(host_col)
    lines = texts.select(
        host.alias("host"),
        F.posexplode(F.split(F.col(body_col), "\r\n|\r|\n")).alias("pos", "__raw"),
    )
    line = F.trim(F.regexp_replace(F.col("__raw"), "#.*$", ""))
    name = F.lower(F.trim(F.substring_index(line, ":", 1)))
    value = F.when(
        line.contains(":"),
        F.trim(F.expr("substring(__line, locate(':', __line) + 1)")),
    )
    kind = (
        F.when(name == "user-agent", F.lit("ua"))
        .when(name == "allow", F.lit("allow"))
        .when(name == "disallow", F.lit("disallow"))
        .when(name == "crawl-delay", F.lit("delay"))
        .when(name == "sitemap", F.lit("sitemap"))
    )
    d = (
        lines.withColumn("__line", line)
        .withColumn("kind", kind)
        .withColumn("value", value)
        .filter(F.col("kind").isNotNull() & F.col("value").isNotNull())
    )
    w = Window.partitionBy("host").orderBy("pos")
    # a UA line opens a new group unless the previous directive line was
    # also a UA line (consecutive UA lines share one header)
    start = (F.col("kind") == "ua") & (
        F.coalesce(F.lag("kind").over(w) != "ua", F.lit(True))
    )
    d = d.withColumn(
        "grp",
        F.sum(start.cast("int")).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    agents = (
        d.filter((F.col("kind") == "ua") & (F.col("grp") > 0))
        .select("host", "grp", F.col("value").alias("user_agent"))
        .dropDuplicates(["host", "grp", "user_agent"])
    )

    def _ordered(kind_name: str) -> Column:
        pairs = F.collect_list(
            F.when(
                (F.col("kind") == kind_name) & (F.col("value") != ""),
                F.struct("pos", "value"),
            )
        )
        return F.transform(F.array_sort(pairs), lambda s: s["value"])

    rules = d.filter(F.col("grp") > 0).groupBy("host", "grp").agg(
        _ordered("disallow").alias("disallow_prefixes"),
        _ordered("allow").alias("allow_prefixes"),
        F.min(
            F.when(F.col("kind") == "delay", F.col("value").cast("double"))
        ).alias("crawl_delay"),
    )
    sitemaps = d.filter(F.col("kind") == "sitemap").groupBy("host").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "value"))),
            lambda s: s["value"],
        ).alias("sitemaps")
    )
    out = (
        agents.join(rules, ["host", "grp"])
        .join(sitemaps, "host", "left")
        .withColumn("sitemaps", F.coalesce("sitemaps", F.array()))
    )
    return out.select(
        "host", "user_agent", "disallow_prefixes", "allow_prefixes",
        "sitemaps", "crawl_delay",
    )


def robots_from_corpus(
    pages: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """Discover and parse the ``/robots.txt`` pages inside a fetched corpus.

    The reference lazily GETs ``scheme://host/robots.txt`` on the first
    touch of a host and parses it (RobotsTxtHandler.php:76-99,
    ``RobotsTxt::parse``); a batch engine does the robots wave up front —
    filter the corpus (or a dedicated robots fetch pass) down to
    ``/robots.txt`` responses, parse each body, and feed the rules table to
    :func:`with_robots_allowed` / ``engine.crawl_site(robots=...)``.
    Unparseable or missing robots simply yield no rules for the host —
    allow-all, matching RobotsTxtHandler.php:91-93.
    """
    u = F.col(url_col)
    texts = pages.filter(
        F.lower(F.parse_url(u, F.lit("PATH"))) == "/robots.txt"
    ).select(
        F.lower(F.parse_url(u, F.lit("HOST"))).alias("host"),
        F.col(body_col).alias("body"),
    )
    return parse_robots_txt(texts)


def crawl_delay_for(
    robots: DataFrame, user_agent: str | None = None
) -> DataFrame:
    """Per-host Crawl-delay for one crawler UA → ``(host, crawl_delay_ms)``.

    Group selection mirrors :func:`with_robots_allowed`: the group whose
    user-agent token appears in the UA string wins (longest token most
    specific), ``*`` is the fallback; hosts without a delay are omitted.
    Feed the result into ``throttle_schedule(..., delay_col=...)`` after a
    broadcast join — robots directives become the politeness floor.
    """
    r = robots.filter(F.col("crawl_delay").isNotNull())
    if user_agent is not None:
        ual = user_agent.lower()
        spec = F.when(F.col("user_agent") == "*", F.lit(0)).otherwise(
            F.when(
                F.lit(ual).contains(F.lower(F.col("user_agent"))),
                F.length("user_agent"),
            ).otherwise(F.lit(-1))
        )
        r = r.withColumn("__spec", spec).filter(F.col("__spec") >= 0)
        mx = r.groupBy("host").agg(F.max("__spec").alias("__mx"))
        r = r.join(mx, "host").filter(F.col("__spec") == F.col("__mx"))
    return r.groupBy("host").agg(
        (F.min("crawl_delay") * 1000).cast("long").alias("crawl_delay_ms")
    )


def _wildcard_matches(pattern: Column, path: Column) -> Column:
    """Google-robots pattern match: ``*`` spans anything, trailing ``$``
    anchors the end; otherwise a prefix match.  Pure Column expressions —
    leftmost-greedy fold over the ``*``-separated segments via aggregate."""
    anchored = pattern.endswith("$")
    body = F.regexp_replace(pattern, r"\$$", "")
    segs = F.split(body, r"\*", -1)
    first = F.element_at(segs, 1)
    init = F.when(path.startswith(first), F.length(first) + 1).otherwise(F.lit(-1))
    # fold the remaining segments: acc = 1-based position after the match so
    # far, -1 once any segment fails to appear in order
    def step(acc, seg):
        loc = F.call_function("locate", seg, path, acc)
        return F.when(acc < 0, F.lit(-1)).otherwise(
            F.when(loc > 0, loc + F.length(seg)).otherwise(F.lit(-1))
        )

    def _mid(arr):
        # drop EMPTY segments (consecutive '**', leading/trailing '*'):
        # '*' already spans anything, and locate('', path, acc) returns 1 in
        # Spark — an empty segment would RESET the fold position and make
        # '/abc**a' match '/abc'
        return F.filter(arr, lambda s: s != "")

    pos = F.aggregate(
        _mid(F.slice(segs, F.lit(2), F.greatest(F.size(segs) - 1, F.lit(0)))),
        init.cast("int"), step,
    )
    matched = pos > 0
    nseg = F.size(segs)
    last = F.element_at(segs, -1)
    # '$' anchor (exact Google semantics): a no-'*' pattern must equal the
    # whole path; with '*', the LAST segment must sit at the very end and the
    # preceding segments must fit leftmost-greedy BEFORE it (folding the last
    # segment too would reject e.g. '/a*b$' on '/axbyb', where only the
    # final 'b' occurrence anchors)
    pos_mid = F.aggregate(
        _mid(F.slice(segs, F.lit(2), F.greatest(nseg - 2, F.lit(0)))),
        init.cast("int"), step,
    )
    anchored_match = F.when(nseg == 1, path == body).otherwise(
        (pos_mid > 0)
        & path.endswith(last)
        & (pos_mid <= F.length(path) - F.length(last) + 1)
    )
    return F.when(anchored, anchored_match).otherwise(matched)


def _is_wildcard(p: Column) -> Column:
    return p.contains("*") | p.endswith("$")


def _longest_match_len(prefixes: Column, path: Column,
                       ignore_wildcard_rules: bool = False) -> Column:
    """Specificity (pattern length) of the best rule matching ``path``
    (0 if none).  Plain rules prefix-match; wildcard rules (``*``/``$``)
    use :func:`_wildcard_matches` unless ``ignore_wildcard_rules``
    (RobotsTxtHandler.php:26-57)."""
    rules = prefixes
    if ignore_wildcard_rules:
        rules = F.filter(rules, lambda p: ~_is_wildcard(p))
    matched = F.filter(
        rules,
        lambda p: F.when(_is_wildcard(p), _wildcard_matches(p, path))
        .otherwise(path.startswith(p)),
    )
    return F.coalesce(
        F.array_max(F.transform(matched, lambda p: F.length(p))), F.lit(0)
    )


def with_robots_allowed(
    frontier: DataFrame,
    robots: DataFrame | None,
    host_col: str = "host",
    path_col: str = "path",
    user_agent_is_bot: bool = True,
    ignore_wildcard_rules: bool = False,
    out: str = "robots_allowed",
    user_agent: str | None = None,
) -> DataFrame:
    """Add boolean ``robots_allowed``; broadcast-joins the rules table.
    ``ignore_wildcard_rules`` mirrors RobotsTxtHandler::ignoreWildcardRules
    (skip ``*``/``$`` rules entirely).

    ``user_agent`` selects the applicable rule GROUP per host (Google
    robots semantics): groups whose user-agent token appears in the
    crawler's UA string, most-specific (longest token) wins; '*' is the
    fallback.  With ``user_agent=None`` every group applies.  Either way
    the rules collapse to ONE row per host before the join — a host with
    several user-agent groups must not duplicate frontier rows."""
    if robots is None or not user_agent_is_bot:
        return frontier.withColumn(out, F.lit(True))
    r = robots
    if user_agent is not None:
        ual = user_agent.lower()
        spec = F.when(F.col("user_agent") == "*", F.lit(0)).otherwise(
            F.when(
                F.lit(ual).contains(F.lower(F.col("user_agent"))),
                F.length("user_agent"),
            ).otherwise(F.lit(-1))
        )
        r = r.withColumn("__spec", spec).filter(F.col("__spec") >= 0)
        mx = r.groupBy("host").agg(F.max("__spec").alias("__mx"))
        r = r.join(mx, "host").filter(F.col("__spec") == F.col("__mx"))
    rules = r.groupBy(F.col("host").alias("__r_host")).agg(
        F.flatten(F.collect_list("disallow_prefixes")).alias("__dis"),
        F.flatten(F.collect_list("allow_prefixes")).alias("__alw"),
    )
    joined = frontier.join(
        F.broadcast(rules), frontier[host_col] == F.col("__r_host"), "left"
    )
    path = F.col(path_col)
    dis = _longest_match_len(F.coalesce(F.col("__dis"), F.array()), path,
                             ignore_wildcard_rules)
    alw = _longest_match_len(F.coalesce(F.col("__alw"), F.array()), path,
                             ignore_wildcard_rules)
    allowed = (
        # always allowed — the path column may carry '?query' (crawl_site
        # feeds path+query for Google-style pattern matching), so compare
        # the pre-query part, not the whole string
        (F.split_part(path, F.lit("?"), F.lit(1)) == "/robots.txt")
        | F.col("__r_host").isNull()  # no rules for host => allow all
        | (dis == 0)
        | (alw >= dis)  # longest-match wins
    )
    return joined.withColumn(out, allowed).drop("__r_host", "__dis", "__alw")


def robots_meta_directives(
    body: "F.Column",
    x_robots_tag: "F.Column | None" = None,
    bot_name: str = "crawlspark",
) -> "F.Column":
    """Page-level robots directives — the in-page counterpart of
    robots.txt (Google robots-meta spec): ``<meta name="robots"
    content="noindex, nofollow">`` plus the ``X-Robots-Tag`` response
    header.  A bot-specific meta tag (``name="crawlspark"``) OVERRIDES
    the generic ``robots`` tag for that bot (per spec: the most specific
    applicable tag wins, directives are not merged across tags); the
    header is additive (a directive from either source applies).

    Crawl gating: ``noindex`` -> fetch but do not store/yield the page;
    ``nofollow`` -> do not expand its outlinks into the frontier;
    ``noarchive`` -> do not cache the response body.

    Pure JVM regexp over the scan (no UDF).  Returns
    struct<noindex:boolean, nofollow:boolean, noarchive:boolean>.
    """
    def content_of(name: str) -> "F.Column":
        pat = (r'(?i)<meta\s[^>]*name\s*=\s*"' + name
               + r'"[^>]*content\s*=\s*"([^"]*)"[^>]*>')
        return F.regexp_extract(body, pat, 1)

    specific = content_of(bot_name)
    generic = content_of("robots")
    meta = F.when(specific != "", specific).otherwise(generic)
    header = x_robots_tag if x_robots_tag is not None else F.lit("")
    combined = F.concat_ws(",", meta, F.coalesce(header, F.lit("")))
    toks = F.transform(
        F.split(F.lower(combined), ","), lambda t: F.trim(t)
    )

    def has(directive: str) -> "F.Column":
        return F.array_contains(toks, directive)

    none_all = has("none")  # "none" == noindex + nofollow (spec shorthand)
    return F.struct(
        (has("noindex") | none_all).alias("noindex"),
        (has("nofollow") | none_all).alias("nofollow"),
        has("noarchive").alias("noarchive"),
    )


def nofollow_outlinks(body: "F.Column") -> "F.Column":
    """Hrefs of anchors carrying ``rel="nofollow"`` (attribute-order
    tolerant within the tag) — subtract these from the frontier
    expansion set; with page-level nofollow from
    :func:`robots_meta_directives`, drop ALL outlinks instead.
    Returns array<string>.
    """
    tags = F.regexp_extract_all(
        body, F.lit(r'(?i)<a\s[^>]*rel\s*=\s*"[^"]*\bnofollow\b[^"]*"[^>]*>'), 0
    )
    return F.transform(
        tags, lambda t: F.regexp_extract(t, r'(?i)href\s*=\s*"([^"]*)"', 1)
    )


ROBOTS_CACHE_MAX_AGE_S = 30 * 86_400


def robots_fetch_policy(
    status: "F.Column",
    cache_age_s: "F.Column | None" = None,
) -> "F.Column":
    """Effective robots policy from the /robots.txt fetch outcome —
    RFC 9309 §2.3.1 (the part robots PARSERS usually skip): a 2xx body
    is parsed; 3xx is followed (the redirect target's body governs);
    "unavailable" 4xx means allow-all (no robots file == no restrictions);
    "unreachable" 5xx/network-error means treat the site as FULLY
    DISALLOWED — except that a previously cached copy may be used while
    it is younger than 30 days (RFC: "MAY use the cached copy for a
    reasonable amount of time"; Google documents 30 days).

    ``status``: HTTP status, 0 = network error.  Returns one of
    'parse' / 'follow_redirect' / 'allow_all' / 'use_cached' /
    'disallow_all'.  Pure Column CASE — fused into the per-host robots
    scan (~10^6 rows at 10^10 URLs).
    """
    unreachable = (status >= 500) | (status == 0)
    cached_ok = (
        cache_age_s.isNotNull() & (cache_age_s < ROBOTS_CACHE_MAX_AGE_S)
        if cache_age_s is not None else F.lit(False)
    )
    return (
        F.when((status >= 200) & (status < 300), F.lit("parse"))
        .when((status >= 300) & (status < 400), F.lit("follow_redirect"))
        .when((status >= 400) & (status < 500), F.lit("allow_all"))
        .when(unreachable & cached_ok, F.lit("use_cached"))
        .otherwise(F.lit("disallow_all"))
    )


def retry_after_seconds(
    header: "F.Column",
    now_ts: "F.Column | int",
) -> "F.Column":
    """Retry-After header parsing, BOTH forms (RFC 9110 §10.2.3): a
    delta in seconds (``"120"``) or an HTTP-date (``"Wed, 21 Oct 2026
    07:28:00 GMT"`` — the form proxies love and naive parsers drop,
    silently hammering a host that asked for backoff).  Returns the
    non-negative wait in seconds (null when absent/unparseable).
    Pure expressions: a digit-check + to_timestamp with the IMF-fixdate
    pattern.
    """
    now = F.lit(now_ts).cast("long") if isinstance(now_ts, int) else now_ts
    delta = F.when(header.rlike(r"^\d+$"), header.cast("long"))
    # Spark 3+'s parser rejects EEE/zzz in PARSE patterns — strip the
    # fixed weekday prefix and the GMT suffix (IMF-fixdate is always
    # GMT; the session runs UTC) and parse the middle
    date_part = F.regexp_extract(
        header,
        r"^[A-Za-z]{3}, (\d{2} [A-Za-z]{3} \d{4} \d{2}:\d{2}:\d{2}) GMT$",
        1,
    )
    ts = F.unix_timestamp(
        F.to_timestamp(
            F.when(date_part != "", date_part), "dd MMM yyyy HH:mm:ss"
        )
    )
    from_date = F.when(ts.isNotNull(), F.greatest(ts - now, F.lit(0)))
    return F.coalesce(delta, from_date).cast("long")


ROBOTS_PARSE_CAP_BYTES = 512 * 1024


def cap_robots_body(body: "F.Column",
                    cap_bytes: int = ROBOTS_PARSE_CAP_BYTES) -> "F.Column":
    """RFC 9309 §2.5 size handling: a parser must process at least
    500 KiB of robots.txt and MAY ignore the rest — unbounded files
    (misconfigured endpoints serving HTML, log dumps at /robots.txt)
    must not blow the per-host parse.  Truncate at the cap but never
    mid-line: cut back to the last newline inside the cap so a
    half-directive can't parse as a different rule (a truncated
    'Disallow: /admin-stuff' must not become 'Disallow: /adm').
    Compose in front of :func:`parse_robots_txt`.
    """
    head = F.substring(body, 1, int(cap_bytes))
    # position of the last newline in the capped prefix
    last_nl = F.length(head) - F.locate("\n", F.reverse(head)) + 1
    has_nl = F.locate("\n", F.reverse(head)) > 0
    truncated = F.length(body) > int(cap_bytes)
    return (
        F.when(~truncated, body)
        .when(has_nl, F.substring(head, 1, last_nl))
        .otherwise(F.lit(""))
    )


def cross_host_sitemap_admission(
    entries: DataFrame,
    robots_decls: DataFrame,
    sitemap_col: str = "sitemap_url",
    listed_col: str = "listed_url",
) -> DataFrame:
    """Cross-host sitemap URL admission (sitemaps.org "Sitemaps &
    Cross Submits"; the rule Google documents and the reference's
    sitemap step silently skips — GetUrlsFromSitemap.php:47-90 yields
    every <loc> regardless of host): a sitemap may list URLs for a
    DIFFERENT host only if that host's robots.txt declares the sitemap's
    location.  Without this gate any site can inject arbitrary hosts
    into the frontier through its own sitemap.

    ``entries``: (sitemap_col, listed_col) rows from sitemap parsing.
    ``robots_decls``: (robots_host, sitemap_col) — Sitemap: lines per
    host, i.e. the output of robots parsing.

    Plan: pure equi-joins — same-host admits need no join at all (one
    narrow comparison), the cross-host remainder left-joins the
    declarations relation on (sitemap_url, listed_host).  At 10^10
    entries the cross-host slice is a tiny fraction and the decls
    relation is O(hosts) — broadcast- or shuffle-joinable either way.
    """
    sm_host = F.lower(F.parse_url(F.col(sitemap_col), F.lit("HOST")))
    li_host = F.lower(F.parse_url(F.col(listed_col), F.lit("HOST")))
    e = entries.withColumn("sitemap_host", sm_host).withColumn(
        "listed_host", li_host
    )
    decls = robots_decls.select(
        F.lower(F.col("robots_host")).alias("__decl_host"),
        F.col(sitemap_col).alias("__decl_sitemap"),
    ).distinct()
    joined = e.join(
        decls,
        (F.col("listed_host") == F.col("__decl_host"))
        & (F.col(sitemap_col) == F.col("__decl_sitemap")),
        "left",
    )
    same = F.col("sitemap_host") == F.col("listed_host")
    declared = F.col("__decl_host").isNotNull()
    return joined.select(
        *entries.columns,
        "sitemap_host",
        "listed_host",
        (same | declared).alias("admitted"),
        F.when(same, F.lit("same_host"))
        .when(declared, F.lit("robots_declared"))
        .otherwise(F.lit("cross_host_undeclared"))
        .alias("reason"),
    )


def image_indexing_policy(
    body: "F.Column",
    x_robots_tag: "F.Column | None" = None,
    bot_name: str = "crawlspark",
) -> "F.Column":
    """Image-specific robots-meta policy (Google robots-meta spec) — the
    directives that gate an IMAGE+CAPTION pipeline rather than the page
    itself: ``noimageindex`` (images on this page must not enter the
    image index — for a training-data crawl that means the page's
    image/caption pairs are excluded at extraction, before any fetch of
    the image bytes) and ``max-image-preview:<none|standard|large>``
    (the largest preview surface the publisher allows; ``unset`` when
    absent = unrestricted).  Same most-specific-tag-wins + additive
    X-Robots-Tag semantics as :func:`robots_meta_directives`; same
    pure-JVM regexp discipline.  Returns
    struct<noimageindex:boolean, max_image_preview:string>.
    """
    def content_of(name: str) -> "F.Column":
        pat = (r'(?i)<meta\s[^>]*name\s*=\s*"' + name
               + r'"[^>]*content\s*=\s*"([^"]*)"[^>]*>')
        return F.regexp_extract(body, pat, 1)

    specific = content_of(bot_name)
    generic = content_of("robots")
    meta = F.when(specific != "", specific).otherwise(generic)
    header = x_robots_tag if x_robots_tag is not None else F.lit("")
    combined = F.concat_ws(",", meta, F.coalesce(header, F.lit("")))
    toks = F.transform(F.split(F.lower(combined), ","), lambda t: F.trim(t))
    preview_tok = F.filter(
        toks, lambda t: t.startswith("max-image-preview:")
    )
    preview = F.when(
        F.size(preview_tok) > 0,
        F.trim(F.substring_index(F.element_at(preview_tok, 1), ":", -1)),
    ).otherwise(F.lit("unset"))
    valid = preview.isin("none", "standard", "large")
    return F.struct(
        F.array_contains(toks, "noimageindex").alias("noimageindex"),
        F.when(valid, preview).otherwise(F.lit("unset"))
        .alias("max_image_preview"),
    )


def robots_policy_diff(
    frontier: DataFrame,
    robots_old: DataFrame,
    robots_new: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    user_agent: str | None = None,
) -> DataFrame:
    """Snapshot-to-snapshot robots policy audit: evaluate every frontier
    URL under BOTH rule snapshots (same longest-match semantics as
    ``with_robots_allowed``) and classify the transition —
    'newly_disallowed' (the purge/recrawl-stop list a compliant archive
    must act on when a site tightens its robots.txt),
    'newly_allowed' (rows to re-admit), 'still_allowed',
    'still_disallowed'.  Two broadcast rule joins over the frontier, no
    extra shuffle; O(hosts) rule relations.

    reference: the reference re-reads robots.txt per run but has no
    corpus-level diff (RobotsTxtHandler caches one snapshot per host,
    src/Loader/Http/Politeness/RobotsTxtHandler.php) — at archive scale
    the diff IS the compliance work-list.
    """
    both = with_robots_allowed(
        frontier, robots_old, host_col=host_col, path_col=path_col,
        out="old_allowed", user_agent=user_agent,
    )
    both = with_robots_allowed(
        both, robots_new, host_col=host_col, path_col=path_col,
        out="new_allowed", user_agent=user_agent,
    )
    transition = (
        F.when(F.col("old_allowed") & ~F.col("new_allowed"),
               F.lit("newly_disallowed"))
        .when(~F.col("old_allowed") & F.col("new_allowed"),
              F.lit("newly_allowed"))
        .when(F.col("old_allowed"), F.lit("still_allowed"))
        .otherwise(F.lit("still_disallowed"))
    )
    return both.withColumn("transition", transition)


def parse_clean_params(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Parse Yandex ``Clean-param:`` robots.txt directives — the
    DECLARED counterpart of the LEARNED tracking-param miner
    (:func:`crawlspark.canon.mine_droppable_params`): the site itself
    states which query parameters don't affect content (``Clean-param:
    sid&ref /forum/``), so the canonicalizer can strip them before
    fingerprinting and collapse alias families in the seen set with
    zero evidence-gathering.  Yandex spec: params separated by ``&``,
    optional path prefix (default the whole site).

    Pure JVM: one regexp_extract_all for the directive lines, two
    narrow explodes (lines, then params).  Returns (host, param,
    path_prefix) — one row per (param, prefix) pair.
    """
    lines = F.regexp_extract_all(
        F.col(body_col), F.lit(r"(?i)Clean-param:[ \t]*[^\r\n]*"), 0)
    exploded = robots.select(
        F.col(host_col).alias("host"), F.explode(lines).alias("__line"))
    spec = F.trim(F.regexp_replace(F.col("__line"),
                                   r"(?i)^Clean-param:[ \t]*", ""))
    params = F.split(F.regexp_extract(spec, r"^(\S+)", 1), "&")
    prefix = F.regexp_extract(spec, r"^\S+[ \t]+(\S+)", 1)
    return (
        exploded.select(
            "host",
            F.explode(params).alias("param"),
            F.when(prefix == "", F.lit("/")).otherwise(prefix)
            .alias("path_prefix"),
        )
        .filter(F.col("param") != "")
    )


def apply_clean_params(
    urls: DataFrame,
    directives: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Strip declared Clean-param query parameters from matching URLs.

    A URL matches a directive when its host equals the directive host
    and its path starts with the directive's prefix.  All matching
    params strip in ONE global regexp_replace per URL (alternation of
    the regex-escaped names — the same escape discipline as
    mine_droppable_params, so ``ids[]``-style names can't abort the
    job), then ``?&``/trailing-separator tidy-up.  The directive
    relation is per-host (small): broadcast equi-join on host, prefix
    check as a residual predicate.  Returns (url, cleaned_url,
    n_stripped) for EVERY input url (unmatched pass through).
    """
    host = F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/:?#]+)", 1)
    path = F.coalesce(
        F.nullif(F.regexp_extract(F.col(url_col),
                                  r"^[a-z]+://[^/?#]+([^?#]*)", 1),
                 F.lit("")),
        F.lit("/"),
    )
    tagged = urls.select(F.col(url_col).alias("url"),
                         host.alias("__host"), path.alias("__path"))
    d = directives.select(
        F.col("host").alias("__host"),
        F.col("param").alias("__param"),
        F.col("path_prefix").alias("__prefix"),
    )
    esc = F.regexp_replace(F.col("__param"), r"([^a-zA-Z0-9_])", r"\\$1")
    matched = (
        tagged.join(F.broadcast(d), "__host")
        .filter(F.col("__path").startswith(F.col("__prefix")))
        .groupBy("url")
        .agg(F.array_join(F.array_sort(F.collect_set(esc)), "|")
             .alias("__alts"))
    )
    pat = F.concat(F.lit("[?&](?:"), F.col("__alts"), F.lit(")=[^&#]*"))
    # three-pass strip keeps separators exact for first/middle/last
    # position: drop '&p=v' anywhere, then '?p=v&' -> '?', then a
    # lone '?p=v' at the end (before a fragment or EOL) drops with
    # its '?'
    mid = F.concat(F.lit("&(?:"), F.col("__alts"), F.lit(")=[^&#]*"))
    first = F.concat(F.lit("\\?(?:"), F.col("__alts"),
                     F.lit(")=[^&#]*&"))
    lone = F.concat(F.lit("\\?(?:"), F.col("__alts"),
                    F.lit(")=[^&#]*(#|$)"))
    cleaned = F.expr(
        "regexp_replace(regexp_replace(regexp_replace(url, __mid, ''),"
        " __first, '?'), __lone, '$1')")
    out = (
        tagged.join(matched, "url", "left")
        .withColumn("__pat", pat)
        .withColumn("__mid", mid)
        .withColumn("__first", first)
        .withColumn("__lone", lone)
    )
    return out.select(
        "url",
        F.when(F.col("__alts").isNotNull(), cleaned)
        .otherwise(F.col("url")).alias("cleaned_url"),
        F.coalesce(
            F.when(
                F.col("__alts").isNotNull(),
                F.size(F.regexp_extract_all(F.col("url"), F.col("__pat"), 0)),
            ),
            F.lit(0),
        ).cast("long").alias("n_stripped"),
    )


def parse_host_directive(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Parse the Yandex ``Host:`` robots.txt directive — the DECLARED
    canonical mirror (the site says "index me as example.com"), the
    third leg of the alias triangle next to content evidence
    (:func:`crawlspark.canon.host_alias_folding`) and 301 migration
    mining.  Yandex semantics: first valid occurrence wins, value is a
    hostname with optional https:// scheme and port; invalid values
    (spaces, multiple, empty) are ignored.

    Returns one row per input host that declares a valid directive:
    (host, canonical_host, differs) — differs marks hosts whose
    declared canonical is not themselves (the fold candidates).
    """
    lines = F.regexp_extract_all(
        F.col(body_col), F.lit(r"(?im)^[ \t]*Host:[ \t]*([^\r\n#]*)"), 1)
    first = F.get(
        F.filter(
            F.transform(lines, lambda v: F.trim(v)),
            lambda v: v.rlike(r"(?i)^(https?://)?[A-Za-z0-9.-]+(:\d+)?$"),
        ),
        0,
    )
    canon = F.lower(F.regexp_replace(
        F.regexp_replace(first, r"^(?i)https?://", ""), r":\d+$", ""))
    return (
        robots.select(F.col(host_col).alias("host"),
                      canon.alias("canonical_host"))
        .filter(F.col("canonical_host").isNotNull())
        .withColumn("differs", F.col("host") != F.col("canonical_host"))
    )


def parse_request_rate(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Parse the nonstandard ``Request-rate:`` and ``Visit-time:``
    robots.txt directives (old REP extension, still honored by polite
    crawlers): ``Request-rate: 1/5`` = one request per 5 seconds,
    optional ``Request-rate: 1/5 0600-0845`` window; ``Visit-time:
    0600-0845`` = only crawl in that UTC window.  They compose with
    Crawl-delay as politeness floors: the effective delay is the MAX
    of all declared floors (reference Throttler semantics honor only
    Crawl-delay; this widens the surface).

    First valid occurrence of each wins.  Returns one row per host
    that declares either: (host, rate_requests, rate_seconds,
    rate_delay_ms, visit_from_min, visit_to_min) — NULLs for the
    directive a host omits; times as minutes-since-midnight.
    """
    body = F.col(body_col)
    rr = F.get(F.regexp_extract_all(
        body, F.lit(r"(?im)^[ \t]*Request-rate:[ \t]*(\d+/\d+)"), 1), 0)
    rr_win = F.get(F.regexp_extract_all(
        body,
        F.lit(r"(?im)^[ \t]*Request-rate:[ \t]*\d+/\d+[ \t]+"
              r"(\d{4}-\d{4})"), 1), 0)
    vt = F.get(F.regexp_extract_all(
        body, F.lit(r"(?im)^[ \t]*Visit-time:[ \t]*(\d{4}-\d{4})"), 1), 0)
    win = F.coalesce(vt, rr_win)
    reqs = F.substring_index(rr, "/", 1).cast("long")
    secs = F.substring_index(rr, "/", -1).cast("long")
    to_min = lambda s: (
        F.substring(s, 1, 2).cast("long") * 60
        + F.substring(s, 3, 2).cast("long"))
    return (
        robots.select(
            F.col(host_col).alias("host"),
            reqs.alias("rate_requests"),
            secs.alias("rate_seconds"),
            F.when(
                (reqs > 0) & secs.isNotNull(),
                (secs * 1000) / reqs,
            ).cast("long").alias("rate_delay_ms"),
            to_min(F.substring_index(win, "-", 1)).alias("visit_from_min"),
            to_min(F.substring_index(win, "-", -1)).alias("visit_to_min"),
        )
        .filter(F.col("rate_requests").isNotNull()
                | F.col("visit_from_min").isNotNull())
    )


ROBOTS_BYTE_CAP = 500 * 1024


def truncate_robots_body(
    robots: DataFrame,
    body_col: str = "body",
    cap: int = ROBOTS_BYTE_CAP,
) -> DataFrame:
    """RFC 9309 §2.4 parse limit: a crawler MUST process at least 500
    KiB of robots.txt and MAY ignore the rest — the defense against
    pathological multi-megabyte robots files.  Truncation must not
    invent a directive: a cap landing mid-line drops the PARTIAL last
    line (its tail is unparsed, so 'Disallow: /private-stuff' cut to
    'Disallow: /p' would otherwise block the wrong subtree).

    BYTE cap, not characters (octet_length semantics); pure JVM
    string ops.  Adds (body_capped, robots_truncated, bytes_dropped)
    — feed body_capped into :func:`parse_robots_txt`.
    """
    b = F.col(body_col)
    blen = F.octet_length(b)
    over = blen > int(cap)
    # cut at the byte cap, then back off to the last newline so no
    # partial line survives (substr on binary keeps byte semantics;
    # robots bodies are ASCII-dominated, and a multibyte char split at
    # the cap is dropped with its line)
    prefix = F.expr(
        f"cast(substr(cast({body_col} as binary), 1, {int(cap)}) as string)")
    cut = F.substring_index(prefix, "\n", -1)
    capped_body = F.when(
        over,
        F.expr(
            f"substring(cast(substr(cast({body_col} as binary), 1, "
            f"{int(cap)}) as string), 1, "
            f"length(cast(substr(cast({body_col} as binary), 1, "
            f"{int(cap)}) as string)) - length("
            f"substring_index(cast(substr(cast({body_col} as binary), 1, "
            f"{int(cap)}) as string), '\\n', -1)))"
        ),
    ).otherwise(b)
    return (
        robots.withColumn("body_capped", capped_body)
        .withColumn("robots_truncated", over)
        .withColumn(
            "bytes_dropped",
            F.when(over, blen - F.octet_length(F.col("body_capped")))
            .otherwise(F.lit(0)).cast("long"),
        )
    )


def robots_meta_image_policy(
    pages: DataFrame,
    body_col: str = "body",
) -> DataFrame:
    """Robots-meta image usage policy — the page-level directives that
    decide whether a crawled image+caption pair may enter the corpus
    at all: ``noindex``/``noimageindex`` exclude it, ``max-image-
    preview:none`` forbids reproducing the image, ``noarchive``
    forbids keeping the page snapshot, ``max-snippet:N`` caps how much
    caption text may be reproduced (Google REP meta extensions; the
    reference parses no meta robots at all — it archives everything).

    One case-insensitive parse of the <meta name="robots"> content
    list (first such tag wins).  Adds (noindex, noimageindex,
    noarchive, max_image_preview in none/standard/large — NULL when
    undeclared, max_snippet — NULL when uncapped, image_usable).
    """
    b = F.col(body_col)
    content = F.lower(F.regexp_extract(
        b,
        r'(?is)<meta\s[^>]*name\s*=\s*["\']robots["\'][^>]*'
        r'content\s*=\s*["\']([^"\']*)["\']',
        1))
    has_tok = lambda t: content.rlike(r"(^|[,\s])" + t + r"($|[,\s])")
    preview = F.regexp_extract(
        content, r"max-image-preview\s*:\s*(none|standard|large)", 1)
    preview = F.when(preview != "", preview)
    snippet = F.regexp_extract(content, r"max-snippet\s*:\s*(-?\d+)", 1)
    snippet = F.when(snippet != "", snippet.cast("long"))
    noindex = has_tok("noindex") | has_tok("none")
    noimage = has_tok("noimageindex")
    usable = ~(
        noindex | noimage
        | (F.coalesce(preview, F.lit("")) == "none")
    )
    return (
        pages.withColumn("noindex", noindex)
        .withColumn("noimageindex", noimage)
        .withColumn("noarchive", has_tok("noarchive"))
        .withColumn("max_image_preview", preview)
        .withColumn("max_snippet", snippet)
        .withColumn("image_usable", usable)
    )


def sitemap_cross_host_audit(
    robots: DataFrame,
    host_col: str = "host",
    sitemaps_col: str = "sitemaps",
) -> DataFrame:
    """Cross-host sitemap declaration audit — RFC 9309 / sitemaps.org
    allow robots.txt to point at a sitemap on ANOTHER host (CDN-hosted
    sitemaps), but then the sitemap's URLs only count for hosts it is
    authorized for, and a crawler should fetch it under the DECLARING
    host's politeness budget while flagging the trust handoff.

    One explode of the parsed sitemaps array + host compare (scheme
    ignored; exact host match — subdomain delegation is NOT implied
    by the spec).  Returns one row per declared sitemap: (host,
    sitemap_url, sitemap_host, cross_host).
    """
    exploded = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.col(sitemaps_col)).alias("sitemap_url"),
    )
    sm_host = F.lower(F.regexp_extract(
        F.col("sitemap_url"), r"^[A-Za-z]+://([^/:?#]+)", 1))
    return exploded.select(
        "host", "sitemap_url",
        sm_host.alias("sitemap_host"),
        (sm_host != F.lower(F.col("host"))).alias("cross_host"),
    )


KNOWN_DIRECTIVES = (
    "user-agent", "allow", "disallow", "crawl-delay", "sitemap",
    "host", "clean-param", "request-rate", "visit-time",
)


def robots_lint(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """robots.txt lint — the parse-health taxonomy an operator
    dashboard tracks across a million hosts: unknown directives
    (typos like ``Dissallow`` silently allow everything), rules
    declared before any User-agent group (dropped per RFC 9309
    grouping), a UTF-8 BOM glued to the first directive name (breaks
    naive parsers), and CR-only line endings.  A lint hit doesn't
    block crawling — parse_robots_txt stays lenient — it flags hosts
    whose INTENT probably differs from what the parser extracted.

    One line explode, pure string classification, one rollup per
    host.  Returns (host, n_lines, n_directives, n_unknown,
    n_rules_before_group, has_bom, cr_only_eol).
    """
    body = F.col(body_col)
    has_bom = body.startswith("﻿")
    cr_only = body.contains("\r") & ~body.contains("\n")
    lines = F.split(F.regexp_replace(body, "^﻿", ""),
                    "\r\n|\r|\n")
    parsed = robots.select(
        F.col(host_col).alias("host"),
        has_bom.alias("has_bom"),
        cr_only.alias("cr_only_eol"),
        F.posexplode(lines).alias("pos", "__raw"),
    )
    line = F.trim(F.regexp_replace(F.col("__raw"), "#.*$", ""))
    name = F.lower(F.trim(F.substring_index(line, ":", 1)))
    is_directive = line.contains(":") & (name != "")
    known = name.isin(*KNOWN_DIRECTIVES)
    d = parsed.select(
        "host", "has_bom", "cr_only_eol", "pos",
        is_directive.alias("__dir"),
        (is_directive & ~known).alias("__unk"),
        (is_directive & known & (name != "user-agent"))
        .alias("__rule"),
        (is_directive & (name == "user-agent")).alias("__ua"),
    )
    w = (
        Window.partitionBy("host").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn(
        "__in_group", F.sum(F.col("__ua").cast("int")).over(w) > 0)
    return (
        d.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("__dir").cast("int")).cast("long")
            .alias("n_directives"),
            F.sum(F.col("__unk").cast("int")).cast("long")
            .alias("n_unknown"),
            F.sum((F.col("__rule") & ~F.col("__in_group")).cast("int"))
            .cast("long").alias("n_rules_before_group"),
            F.first("has_bom").alias("has_bom"),
            F.first("cr_only_eol").alias("cr_only_eol"),
        )
    )


def robots_failure_policy(
    fetches: DataFrame,
    host_col: str = "host",
    status_col: str = "status",
    hops_col: str = "n_redirect_hops",
    error_days_col: str = "days_since_first_error",
    unreachable_grace_days: int = 30,
) -> DataFrame:
    """Robots-unreachable policy table (RFC 9309 §2.3.1): what a
    crawler must ASSUME when /robots.txt itself misbehaves —
    4xx = "unavailable" -> crawl everything (allow_all); 5xx =
    "unreachable" -> treat as complete DISALLOW, but after a
    sustained outage (MUST NOT exceed a reasonable period; Google
    uses 30 days) the crawler MAY fall back to allow; >= 5 redirect
    hops = treat as unavailable; 200 parses normally.

    Pure CASE classification — the policy feed for
    :func:`with_robots_allowed`'s rules-absent branches.  Returns
    (host, status, policy in {'use_rules','allow_all',
    'disallow_all','allow_all_stale'}).
    """
    st = F.col(status_col).cast("long")
    hops = F.coalesce(F.col(hops_col).cast("long"), F.lit(0))
    ed = F.coalesce(F.col(error_days_col).cast("long"), F.lit(0))
    policy = (
        F.when(hops >= 5, F.lit("allow_all"))
        .when((st >= 200) & (st < 300), F.lit("use_rules"))
        .when((st >= 400) & (st < 500), F.lit("allow_all"))
        .when((st >= 500)
              & (ed > int(unreachable_grace_days)),
              F.lit("allow_all_stale"))
        .when(st >= 500, F.lit("disallow_all"))
        .otherwise(F.lit("disallow_all"))
    )
    return fetches.select(
        F.col(host_col).alias("host"), st.alias("status"),
        policy.alias("policy"),
    )


def parse_ads_txt(
    files: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """ads.txt / app-ads.txt parsing (IAB spec): each data line is
    ``ad-system-domain, publisher-id, DIRECT|RESELLER[, cert-hash]``
    — the monetization fingerprint of a host.  For corpus curation
    this is an operator-clustering signal (sites sharing publisher
    ids are one network — the made-for-advertising farms LLM filters
    drop share them heavily).

    Comment/variable lines (#, ``x=y``) skip; relationship folds
    case; malformed data lines count but don't emit.  One explode +
    regex split.  Returns one row per valid record: (host, ad_system,
    publisher_id, relationship, has_cert).
    """
    lines = F.split(F.col(body_col), "\r\n|\r|\n")
    d = files.select(
        F.col(host_col).alias("host"),
        F.explode(lines).alias("__l"),
    )
    line = F.trim(F.regexp_replace(F.col("__l"), "#.*$", ""))
    parts = F.transform(F.split(line, ","), lambda p: F.trim(p))
    rel = F.upper(F.get(parts, 2))
    valid = (
        (F.size(parts) >= 3) & ~line.contains("=")
        & (F.get(parts, 0) != "") & (F.get(parts, 1) != "")
        & rel.isin("DIRECT", "RESELLER")
    )
    return (
        d.withColumn("__p", parts)
        .filter(valid)
        .select(
            "host",
            F.lower(F.get("__p", 0)).alias("ad_system"),
            F.get("__p", 1).alias("publisher_id"),
            rel.alias("relationship"),
            (F.size("__p") >= 4).alias("has_cert"),
        )
    )


def parse_llms_txt(
    files: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """llms.txt parsing (the 2024 llmstxt.org convention): a
    markdown file at /llms.txt where a site hands LLM ingestion the
    curated view of itself — H1 title, a blockquote summary, H2
    sections of [name](url) links, and an 'Optional' section whose
    links may be skipped under budget.  For an LLM-data crawler this
    is robots.txt's constructive twin: not "keep out" but "start
    here", so the frontier seeds it ahead of sitemap discovery.

    Pure regex over the markdown.  Returns (host, title, has_summary,
    n_sections, n_links, n_optional_links, present) — present false
    (all else NULL) for bodies that don't start with an H1.
    """
    b = F.col(body_col)
    present = b.rlike(r"(?m)^# \S")
    title = F.regexp_extract(b, r"(?m)^# (.+)$", 1)
    has_summary = b.rlike(r"(?m)^> \S")
    sections = F.size(F.regexp_extract_all(b, F.lit(r"(?m)^## .+$"), 0))
    links = F.size(F.regexp_extract_all(
        b, F.lit(r"\[[^\]]*\]\([^)]+\)"), 0))
    optional_block = F.regexp_extract(
        b, r"(?s)(?:^|\n)## Optional\s*\n(.*?)(?:\n## |$)", 1)
    n_opt = F.size(F.regexp_extract_all(
        optional_block, F.lit(r"\[[^\]]*\]\([^)]+\)"), 0))
    return files.select(
        F.col(host_col).alias("host"),
        F.when(present, title).alias("title"),
        F.when(present, has_summary).alias("has_summary"),
        F.when(present, sections).cast("long").alias("n_sections"),
        F.when(present, links).cast("long").alias("n_links"),
        F.when(present, n_opt).cast("long").alias("n_optional_links"),
        present.alias("present"),
    )


AI_TRAINING_BOTS = ["GPTBot", "CCBot", "Google-Extended"]


def ai_agents_policy(
    robots_files: DataFrame,
    bots: list[str] | None = None,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """Per-host AI-training-agent policy matrix: for each of a
    caller-supplied list of training crawl agents (default GPTBot,
    CCBot, Google-Extended — all publicly documented robots tokens;
    pass ``bots=[...]`` to add others, e.g. Bytespider), evaluate the
    host's robots.txt verdict for the ROOT path and roll up to one row
    per host with per-bot booleans plus ``n_ai_blocked``.  This is the
    corpus-governance report a training-data pipeline publishes: which
    slice of the crawl has opted out of which trainers, and how that
    moves over time (feed it to quality_drift).

    Built entirely from the existing RFC 9309 machinery
    (:func:`parse_robots_txt` + :func:`with_robots_allowed`'s UA-group
    selection) — one broadcast-join pass per bot over the per-host rule
    table (~10^6 rows at 10^10 URLs), then a groupBy-pivot-free
    conditional aggregation.
    """
    bots = list(bots) if bots is not None else list(AI_TRAINING_BOTS)
    rules = parse_robots_txt(robots_files, host_col, body_col)
    hosts = robots_files.select(
        F.col(host_col).alias("host"), F.lit("/").alias("path")
    ).distinct()
    verdicts = None
    for b in bots:
        v = with_robots_allowed(
            hosts, rules, user_agent=b, out="allowed"
        ).select("host", F.lit(b).alias("bot"), "allowed")
        verdicts = v if verdicts is None else verdicts.unionByName(v)
    agg = [
        F.max(F.when(F.col("bot") == b, F.col("allowed")))
        .alias(b.lower().replace("-", "_") + "_allowed")
        for b in bots
    ]
    return (
        verdicts.groupBy("host")
        .agg(
            *agg,
            F.sum(F.when(~F.col("allowed"), 1).otherwise(0))
            .cast("long").alias("n_ai_blocked"),
        )
    )


def parse_security_txt(
    files: DataFrame, host_col: str = "host", body_col: str = "body",
    now_iso: str = "2026-08-21T00:00:00Z",
) -> DataFrame:
    """security.txt parse (RFC 9116, /.well-known/security.txt) — the
    last member of this repo's well-known-file family (robots / ads /
    llms / manifests): per host, the Contact links, the REQUIRED
    Expires stamp (a file past its Expires must be treated as absent),
    and policy/canonical presence.  Crawl relevance: a valid
    security.txt is an operator-quality signal, and its Contact
    channel is the abuse-report route a polite crawler records.

    ``now_iso`` is an explicit parameter (determinism: no wall-clock
    reads inside operators).  Pure line-regexp parse, one row per
    host: (host, n_contacts, first_contact, expires, expired,
    has_policy, has_canonical).
    """
    b = F.coalesce(F.col(body_col), F.lit(""))
    contacts = F.regexp_extract_all(
        b, F.lit(r"(?im)^Contact:\s*(\S+)\s*$"), 1)
    expires = F.nullif(F.regexp_extract(
        b, r"(?im)^Expires:\s*(\S+)\s*$", 1), F.lit(""))
    return files.select(
        F.col(host_col).alias("host"),
        F.size(contacts).cast("int").alias("n_contacts"),
        F.element_at(F.when(F.size(contacts) > 0, contacts), 1)
        .alias("first_contact"),
        expires.alias("expires"),
        # RFC 3339 stamps in Z form compare correctly as STRINGS
        F.coalesce(expires < F.lit(now_iso), F.lit(False))
        .alias("expired"),
        b.rlike(r"(?im)^Policy:").alias("has_policy"),
        b.rlike(r"(?im)^Canonical:").alias("has_canonical"),
    )
