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


def _longest_match_len(prefixes: Column, path: Column) -> Column:
    """Length of the longest prefix in ``prefixes`` matching ``path`` (0 if none)."""
    matched = F.filter(prefixes, lambda p: path.startswith(p))
    return F.coalesce(
        F.array_max(F.transform(matched, lambda p: F.length(p))), F.lit(0)
    )


def with_robots_allowed(
    frontier: DataFrame,
    robots: DataFrame | None,
    host_col: str = "host",
    path_col: str = "path",
    user_agent_is_bot: bool = True,
    out: str = "robots_allowed",
) -> DataFrame:
    """Add boolean ``robots_allowed``; broadcast-joins the rules table."""
    if robots is None or not user_agent_is_bot:
        return frontier.withColumn(out, F.lit(True))
    rules = robots.select(
        F.col("host").alias("__r_host"),
        F.col("disallow_prefixes").alias("__dis"),
        F.col("allow_prefixes").alias("__alw"),
    )
    joined = frontier.join(
        F.broadcast(rules), frontier[host_col] == F.col("__r_host"), "left"
    )
    path = F.col(path_col)
    dis = _longest_match_len(F.coalesce(F.col("__dis"), F.array()), path)
    alw = _longest_match_len(F.coalesce(F.col("__alw"), F.array()), path)
    allowed = (
        (path == "/robots.txt")  # always allowed
        | F.col("__r_host").isNull()  # no rules for host => allow all
        | (dis == 0)
        | (alw >= dis)  # longest-match wins
    )
    return joined.withColumn(out, allowed).drop("__r_host", "__dis", "__alw")
