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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROBOTS_SCHEMA = (
    "host STRING, user_agent STRING, disallow_prefixes ARRAY<STRING>, "
    "allow_prefixes ARRAY<STRING>, sitemaps ARRAY<STRING>"
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
