"""URL canonicalization + fingerprinting — the engine's identity layer.

north_rule prescribes: scheme/host lowercase, default-port strip, query sort,
fragment drop (reference drops fragments by default, src/Steps/Loading/
HttpCrawl.php:466-473, opt-out keepUrlFragment at HttpCrawl.php:122-127),
fingerprint = xxhash64(url_norm).

Two implementations with identical semantics:

- :func:`canonicalize_expr` — pure Column expressions (JVM-side, stays inside
  WholeStageCodegen; the hot path for 10^10-URL frontiers),
- :func:`canonicalize_udf` — Arrow pandas_udf (urllib-based; handles corner
  cases the expression version documents as out of scope: IDN hosts,
  percent-encoding normalization).

Both are exercised against each other in tests (hypothesis property test).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_expr(url: Column, keep_fragment: bool = False) -> Column:
    """Vectorized JVM-side canonicalization.

    scheme/host lowercase; default-port strip; query-param sort (split on
    '&', array_sort, rejoin); fragment drop unless keep_fragment; path ''
    -> '/'.
    """
    # strip fragment first so later parsing is simpler
    no_frag = F.substring_index(url, "#", 1)
    frag = F.when(
        F.instr(url, "#") > 0, F.concat(F.lit("#"), F.substring_index(url, "#", -1))
    ).otherwise(F.lit(""))
    base = no_frag

    scheme = F.lower(F.substring_index(base, "://", 1))
    # after scheme://
    rest = F.substring(base, F.length(scheme) + 4, F.lit(2147483647))
    # authority = up to first '/' or '?'
    authority = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    after_auth = F.substring(
        rest, F.length(authority) + 1, F.lit(2147483647)
    )  # starts with '/' or '?' or ''
    hostport = F.lower(authority)
    host = F.substring_index(hostport, ":", 1)
    port = F.when(
        F.instr(hostport, ":") > 0, F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    default_port = (
        (scheme == "http") & (port == "80") | (scheme == "https") & (port == "443")
    )
    norm_authority = F.when((port == "") | default_port, host).otherwise(
        F.concat(host, F.lit(":"), port)
    )
    # split path?query
    path = F.substring_index(after_auth, "?", 1)
    query = F.when(
        F.instr(after_auth, "?") > 0, F.substring_index(after_auth, "?", -1)
    ).otherwise(F.lit(""))
    norm_path = F.when(path == "", F.lit("/")).otherwise(path)
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    norm_query = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_query)
    )
    out = F.concat(scheme, F.lit("://"), norm_authority, norm_path, norm_query)
    if keep_fragment:
        out = F.concat(out, frag)
    return out


def url_hash(url_norm: Column) -> Column:
    """xxhash64 fingerprint of the canonical URL (north_rule)."""
    return F.xxhash64(url_norm)


def host_expr(url_norm: Column) -> Column:
    return F.parse_url(url_norm, F.lit("HOST"))


def host_bucket(host: Column, num_buckets: int) -> Column:
    """Stable host -> bucket assignment for politeness partitioning."""
    return F.pmod(F.xxhash64(host), F.lit(num_buckets)).cast("int")


def _canon_py(u: str, keep_fragment: bool) -> str:
    if u is None:
        return None
    from urllib.parse import urlsplit, urlunsplit

    try:
        parts = urlsplit(u)
    except ValueError:
        return u
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    netloc = host
    if port is not None and str(port) != DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    query = "&".join(sorted(parts.query.split("&"))) if parts.query else ""
    frag = parts.fragment if keep_fragment else ""
    return urlunsplit((scheme, netloc, path, query, frag))


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """Arrow-batched canonicalization (urllib); fragment always dropped."""
    return urls.map(lambda u: _canon_py(u, keep_fragment=False))


@pandas_udf(StringType())
def canonicalize_keep_fragment_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: _canon_py(u, keep_fragment=True))


def registrable_domain(host: Column) -> Column:
    """Registrable domain for sameDomain()/cookie scoping (reference keys
    cookies + sameDomain checks by registrable domain,
    src/Loader/Http/Cookies/CookieJar.php:95-130).

    Heuristic without a PSL dependency: last two labels, or last three when
    the 2nd-level label is a known short SLD (co/com/net/org/gov/ac/edu).
    """
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    sld = F.element_at(parts, -2)
    need3 = (n >= 3) & sld.isin("co", "com", "net", "org", "gov", "ac", "edu")
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return F.when(n <= 2, host).otherwise(F.when(need3, last3).otherwise(last2))
