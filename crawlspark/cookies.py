"""Full Set-Cookie semantics: parse, validation, and send-matching.

reference: src/Loader/Http/Cookies/Cookie.php:43-335 (attribute parse +
prefix/domain/secure validation + shouldBeSentTo), CookieJar.php:25-130
(registrable-domain-keyed jar, name-keyed last-wins, getFor), and
Date.php:18-35 (the two accepted Expires formats).

Two lockstep layers, same discipline as canon.py:

- **Column layer** — :func:`parse_set_cookie`, :func:`should_send_col`,
  :func:`jar_matches`: pure JVM expressions (regexp + substring_index
  trees; no UDF), so a 10^10-row response stream parses/filters inside
  whole-stage codegen and the jar join broadcasts.  Invalid cookies don't
  throw (this is a batch engine): they carry an ``invalid_reason`` column
  mirroring the reference's InvalidCookieException messages and are
  dropped by the jar builder — observable, not fatal.
- **Python twin** — :class:`PyCookie` / :class:`PyCookieJar` for the
  sequential in-task jar inside fetch.py's politeness loop (one jar per
  registrable domain per task, exactly the reference's loader jar).
  Differential-tested against the Column layer in tests/test_cookies.py.

Reference quirks mirrored on purpose (these are crwlr's semantics, not
RFC 6265): domain match is substring containment, not suffix match
(Cookie.php:73 ``str_contains($urlHost, $this->domain())``); the same
containment check validates a Domain attribute against the received-from
host (Cookie.php:273); a ``Secure``/``HttpOnly`` token with a value
(``Secure=x``) still sets the flag (parseAttribute switches on the name
only, Cookie.php:210-213); attribute names with whitespace before ``=``
are ignored (the PHP explode happens before any per-part trim).

Documented divergences (batch-friendly, affect only malformed headers):
unparseable Expires dates surface as ``invalid_reason='unparseable
expires date'`` at parse time instead of throwing lazily at send time
(Date.php:27 throws inside isExpired); timezone tokens other than
GMT/UTC are parsed as UTC (RFC 6265 requires GMT on the wire).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .canon import registrable_domain

# ---------------------------------------------------------------------------
# URL part extraction (substring_index tree — measured faster than
# parse_url, see BENCH.md canonicalization formulation race)
# ---------------------------------------------------------------------------


def url_scheme(url: Column) -> Column:
    return F.lower(F.substring_index(url, "://", 1))


def _after_authority(url: Column) -> Column:
    rest = F.substring_index(url, "://", -1)
    slash = F.locate("/", rest)
    return F.when(slash > 0, F.substring(rest, slash, 100000)).otherwise(F.lit(""))


def url_host(url: Column) -> Column:
    rest = F.substring_index(url, "://", -1)
    return F.lower(
        F.substring_index(F.substring_index(rest, "/", 1), ":", 1)
    )


def url_path(url: Column) -> Column:
    """Path only (no query/fragment); '' when the URL has no path —
    Cookie.php:325-327 uses ``$url->path() ?? ''``."""
    raw = _after_authority(url)
    return F.substring_index(F.substring_index(raw, "?", 1), "#", 1)


def for_domain(host: Column) -> Column:
    """CookieJar::getForDomainFromUrl (CookieJar.php:117-130): the jar
    key is the registrable domain, falling back to the bare host when
    there is none (IPs, single-label hosts like localhost)."""
    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    return F.when(is_ip | ~host.contains("."), host).otherwise(
        registrable_domain(host)
    )


# ---------------------------------------------------------------------------
# Set-Cookie parse (Cookie.php:172-318)
# ---------------------------------------------------------------------------

# Attribute value: reference splits on ';', trims each part, splits at the
# FIRST '=' — so the name must be immediately followed by '=' (PHP keeps
# trailing ws in the name otherwise and the lowercase compare fails), the
# value keeps interior/leading spaces but loses trailing ws (the trim ran
# on the whole part).  `;\s*name=([^;]*)` + rtrim reproduces that exactly.
def _attr_value(header: Column, name: str) -> Column:
    got = F.regexp_extract(header, rf"(?i);\s*{name}=([^;]*)", 1)
    blank = F.regexp_extract(header, rf"(?i);\s*{name}=", 0) == F.lit("")
    return F.when(blank, F.lit(None).cast("string")).otherwise(F.rtrim(got))


def _flag(header: Column, name: str) -> Column:
    # bare token (`; Secure`) or valued (`; Secure=x`) — both set the flag
    # (parseAttribute switches on the name only, Cookie.php:210-213)
    return header.rlike(rf"(?i);\s*{name}\s*(;|$)") | header.rlike(
        rf"(?i);\s*{name}="
    )


# Expires: DateTimeInterface::COOKIE 'l, d-M-Y H:i:s T' or the fallback
# 'l, d M Y H:i:s T' (Date.php:21-24; PHP parses full or abbreviated day
# names for both).  Normalize: drop the day name, dashes -> spaces in the
# date, strip the TZ token, parse as UTC.
_EXPIRES_FMT = "d MMM yyyy HH:mm:ss"


def _expires_ts(value: Column) -> Column:
    core = F.regexp_replace(value, r"^\s*[A-Za-z]+,\s*", "")
    core = F.regexp_replace(core, r"\s+[A-Za-z+\-0-9:]+\s*$", "")
    core = F.regexp_replace(core, r"^(\d{1,2})-([A-Za-z]{3})-(\d{4})", "$1 $2 $3")
    # explicit +0000 zone -> absolute epoch independent of the session tz
    # (the driver's oracle session may not be UTC); try_to_timestamp ->
    # null on garbage instead of an ANSI parse error
    return F.unix_timestamp(
        F.try_to_timestamp(
            F.concat(core, F.lit(" +0000")), F.lit(_EXPIRES_FMT + " Z")
        )
    )


def parse_set_cookie(
    df: DataFrame,
    url_col: str = "url",
    header_col: str = "set_cookie",
    received_at_col: str | Column | int | None = None,
) -> DataFrame:
    """Append parsed-cookie columns to a (received_from_url, header) frame.

    Output columns: cookie_name, cookie_value, cookie_domain,
    domain_via_attr, cookie_path, expires_ts, max_age, received_at,
    secure, http_only, same_site, invalid_reason (null = valid cookie;
    otherwise the reference's InvalidCookieException message family).
    """
    url, header = F.col(url_col), F.col(header_col)
    if received_at_col is None:
        received_at = F.lit(0).cast("long")
    elif isinstance(received_at_col, int):
        received_at = F.lit(received_at_col).cast("long")
    elif isinstance(received_at_col, str):
        received_at = F.col(received_at_col).cast("long")
    else:
        received_at = received_at_col.cast("long")

    # bind host/https once as real columns (multi-use below: the PSL
    # branches of for_domain alone reference host ~16 times — inlining a
    # derived url expression that many times risks janino's 64 KB method
    # limit and re-parses the url per use at run time)
    df = df.withColumn("__sc_host", url_host(url)).withColumn(
        "__sc_https", url_scheme(url) == F.lit("https")
    )
    host = F.col("__sc_host")
    https = F.col("__sc_https")

    first = F.trim(F.substring_index(header, ";", 1))
    has_eq = F.locate("=", first) > 0
    name = F.substring_index(first, "=", 1)
    value = F.when(has_eq, F.substring(first, F.locate("=", first) + 1, 100000))

    dom_attr_raw = _attr_value(header, "domain")
    # leading dot ignored (Cookie.php:269-271)
    dom_attr = F.lower(F.regexp_replace(dom_attr_raw, r"^\.", ""))
    default_domain = for_domain(host)
    domain = F.coalesce(dom_attr, default_domain)
    domain_via_attr = dom_attr.isNotNull()

    path = _attr_value(header, "path")
    expires_raw = _attr_value(header, "expires")
    expires_ts = _expires_ts(expires_raw)
    # PHP (int) cast: leading integer or 0 ('; Max-Age=abc' -> 0)
    max_age_raw = _attr_value(header, "max-age")
    max_age_digits = F.regexp_extract(max_age_raw, r"^\s*([+-]?\d+)", 1)
    max_age = F.when(
        max_age_raw.isNotNull(),
        # PHP (int) cast: leading integer, else 0; guard the empty-string
        # cast (ANSI mode throws on malformed casts)
        F.when(max_age_digits == "", F.lit(0)).otherwise(
            max_age_digits.cast("long")
        ),
    )
    secure = _flag(header, "secure")
    http_only = _flag(header, "httponly")
    same_site_raw = _attr_value(header, "samesite")
    same_site_ok = F.lower(same_site_raw).isin("strict", "lax", "none")
    same_site = F.when(
        same_site_raw.isNotNull() & same_site_ok, F.initcap(F.lower(same_site_raw))
    ).otherwise(F.lit("Lax"))

    secure_prefix = name.startswith("__Secure-")
    host_prefix = name.startswith("__Host-")

    invalid = (
        F.when(host == "", "Url where cookie was received from has no host or domain")
        .when(~has_eq, "Invalid cookie string")
        .when(
            dom_attr.isNotNull() & ~host.contains(dom_attr),
            "Setting cookie for this domain is not allowed",
        )
        .when(secure & ~https, "Secure flag on non-https document url")
        .when(
            same_site_raw.isNotNull() & ~same_site_ok,
            "Invalid value for attribute SameSite",
        )
        .when(
            expires_raw.isNotNull() & expires_ts.isNull(),
            "unparseable expires date",
        )
        .when(
            (secure_prefix | host_prefix) & ~https,
            "Cookie is prefixed with __Secure- or __Host- but was not sent via https",
        )
        .when(
            (secure_prefix | host_prefix) & ~secure,
            "Cookie is prefixed with __Secure- or __Host- but Secure flag was not sent",
        )
        .when(
            host_prefix & domain_via_attr,
            "Cookie with __Host- prefix must not contain a Domain attribute",
        )
        .when(
            host_prefix & ~F.coalesce(path == F.lit("/"), F.lit(False)),
            "Cookie with __Host- prefix must have a Path attribute with value /",
        )
        .otherwise(F.lit(None))
    )

    return df.select(
        "*",
        name.alias("cookie_name"),
        value.alias("cookie_value"),
        domain.alias("cookie_domain"),
        domain_via_attr.alias("domain_via_attr"),
        path.alias("cookie_path"),
        expires_ts.alias("expires_ts"),
        max_age.alias("max_age"),
        received_at.alias("received_at"),
        secure.alias("secure"),
        http_only.alias("http_only"),
        same_site.alias("same_site"),
        host.alias("received_from_host"),
        invalid.alias("invalid_reason"),
    ).drop("__sc_host", "__sc_https")


# ---------------------------------------------------------------------------
# shouldBeSentTo (Cookie.php:66-78) as a Column predicate
# ---------------------------------------------------------------------------


def should_send_col(target_url: Column, now_s: int | Column = 0) -> Column:
    """Predicate over parsed-cookie columns (as produced by
    :func:`parse_set_cookie`) deciding whether the cookie goes onto a
    request for ``target_url``.  Use after a jar join.

    Inlines the url parse into every predicate — fine when ``target_url``
    is a plain column.  When it is a derived expression, prefer
    :func:`jar_matches`, which binds the parsed pieces once (a deep url
    expression repeated per predicate blows janino's 64 KB method limit
    and re-parses the url per predicate at run time)."""
    return should_send_parts(
        url_host(target_url), url_scheme(target_url), url_path(target_url), now_s
    )


def should_send_parts(
    t_host: Column, t_scheme: Column, t_path: Column,
    now_s: int | Column = 0,
) -> Column:
    """shouldBeSentTo over pre-parsed target pieces (host, scheme, path)."""
    now = F.lit(now_s) if isinstance(now_s, int) else now_s
    c_domain = F.col("cookie_domain")
    c_path = F.col("cookie_path")

    domain_ok = t_host.contains(c_domain)  # substring quirk, Cookie.php:73
    host_prefix = F.col("cookie_name").startswith("__Host-")
    host_ok = ~host_prefix | (t_host == F.col("received_from_host"))
    secure_ok = (
        ~F.col("secure")
        | (t_scheme == "https")
        | t_host.isin("localhost", "127.0.0.1")
    )
    path_ok = c_path.isNull() | (c_path == "") | (
        t_path.startswith(c_path)
        & ((t_path == c_path) | (c_path == "/") | t_path.startswith(F.concat(c_path, F.lit("/"))))
    )
    has_expiry = F.col("expires_ts").isNotNull() | F.col("max_age").isNotNull()
    expired = has_expiry & (
        (F.col("expires_ts").isNotNull() & (now >= F.col("expires_ts")))
        | (
            F.col("max_age").isNotNull()
            & ((F.col("max_age") <= 0) | (now > F.col("received_at") + F.col("max_age")))
        )
    )
    return domain_ok & host_ok & secure_ok & path_ok & ~expired


def build_jar(parsed: DataFrame, ord_col: str = "ord") -> DataFrame:
    """CookieJar::addFrom (CookieJar.php:43-64): drop invalid cookies, key
    by the received-from registrable domain, keep the LAST cookie per
    (jar_domain, name) in arrival order."""
    from pyspark.sql import Window

    jar = parsed.filter(F.col("invalid_reason").isNull()).withColumn(
        "jar_domain", for_domain(F.col("received_from_host"))
    )
    w = Window.partitionBy("jar_domain", "cookie_name").orderBy(
        F.col(ord_col).desc()
    )
    return (
        jar.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .drop("__rn")
    )


def jar_matches(
    jar: DataFrame, requests: DataFrame, url_col: str = "url", now_s: int = 0
) -> DataFrame:
    """CookieJar::getFor (CookieJar.php:95-112): jar-domain equality
    (registrable domain of the target) then the shouldBeSentTo predicate.
    The jar is tiny relative to the request stream -> broadcast join; the
    request side never shuffles."""
    t_url = F.col(url_col)
    # bind the parsed target pieces ONCE as real columns; everything below
    # references attributes, not re-inlined parse trees.  With the parse
    # chain duplicated per predicate (~19 copies incl. for_domain's PSL
    # branches), a derived url expression blew janino's 64 KB method limit
    # (SortExec fell back to interpreted mode), and even a plain url column
    # got re-parsed per predicate per row.  CollapseProject keeps multi-use
    # non-cheap aliases as a separate Project, so codegen stays linear.
    reqs = (
        requests.withColumn("__t_host", url_host(t_url))
        .withColumn("__t_scheme", url_scheme(t_url))
        .withColumn("__t_path", url_path(t_url))
        .withColumn("__for_domain", for_domain(F.col("__t_host")))
    )
    joined = reqs.join(
        F.broadcast(jar), F.col("__for_domain") == F.col("jar_domain"), "inner"
    )
    return joined.filter(
        should_send_parts(
            F.col("__t_host"), F.col("__t_scheme"), F.col("__t_path"), now_s
        )
    ).drop("__t_host", "__t_scheme", "__t_path", "__for_domain")


# ---------------------------------------------------------------------------
# Python twin for the in-task fetch jar (fetch.py politeness loop)
# ---------------------------------------------------------------------------

_EXPIRES_PY_RE = re.compile(r"^\s*[A-Za-z]+,\s*")
_TZ_PY_RE = re.compile(r"\s+[A-Za-z+\-0-9:]+\s*$")
_MAXAGE_PY_RE = re.compile(r"^\s*([+-]?\d+)")


def _registrable_or_host(host: str) -> str:
    from .fetch import registrable_domain_py

    if re.match(r"^\d+\.\d+\.\d+\.\d+$", host) or "." not in host:
        return host
    return registrable_domain_py(host)


def _split_url(url: str) -> tuple[str, str, str]:
    scheme, _, rest = url.partition("://")
    hostport, slash, after = rest.partition("/")
    path_q = (slash + after) if slash else ""
    path = path_q.split("?", 1)[0].split("#", 1)[0]
    return scheme.lower(), hostport.split(":", 1)[0].lower(), path


def parse_expires_py(value: str) -> int | None:
    core = _EXPIRES_PY_RE.sub("", value)
    core = _TZ_PY_RE.sub("", core)
    core = re.sub(r"^(\d{1,2})-([A-Za-z]{3})-(\d{4})", r"\1 \2 \3", core)
    try:
        dt = datetime.strptime(core, "%d %b %Y %H:%M:%S")
    except ValueError:
        return None
    return int(dt.replace(tzinfo=timezone.utc).timestamp())


@dataclass
class PyCookie:
    name: str
    value: str
    domain: str
    path: str | None
    expires_ts: int | None
    max_age: int | None
    received_at: int
    secure: bool
    received_from_host: str

    def should_send(self, url: str, now_s: int = 0) -> bool:
        scheme, host, path = _split_url(url)
        if self.domain not in host:
            return False
        if self.name.startswith("__Host-") and host != self.received_from_host:
            return False
        if self.secure and scheme != "https" and host not in ("localhost", "127.0.0.1"):
            return False
        if self.path:
            p = self.path
            if not (
                path.startswith(p)
                and (path == p or p == "/" or path.startswith(p + "/"))
            ):
                return False
        if self.expires_ts is not None and now_s >= self.expires_ts:
            return False
        if self.max_age is not None and (
            self.max_age <= 0 or now_s > self.received_at + self.max_age
        ):
            return False
        return True


def parse_set_cookie_py(
    url: str, header: str, received_at: int = 0
) -> PyCookie | None:
    """Python twin of :func:`parse_set_cookie`; returns None on any
    invalid_reason (the batch layer's drop)."""
    scheme, host, _ = _split_url(url)
    if not host:
        return None
    first = header.split(";", 1)[0].strip()
    if "=" not in first:
        return None
    name, value = first.split("=", 1)

    attrs: dict[str, str] = {}
    flags: set[str] = set()
    for part in header.split(";")[1:]:
        part = part.strip()
        if "=" in part:
            k, v = part.split("=", 1)
            attrs.setdefault(k.lower(), v)
            if k.lower() in ("secure", "httponly"):
                flags.add(k.lower())
        else:
            flags.add(part.lower())

    dom_attr = attrs.get("domain")
    if dom_attr is not None:
        dom_attr = dom_attr.lstrip(".") if dom_attr.startswith(".") else dom_attr
        if dom_attr.lower() not in host:
            return None
        domain, via_attr = dom_attr.lower(), True
    else:
        domain, via_attr = _registrable_or_host(host), False

    secure = "secure" in flags
    if secure and scheme != "https":
        return None
    ss = attrs.get("samesite")
    if ss is not None and ss.lower() not in ("strict", "lax", "none"):
        return None
    expires_ts = None
    if "expires" in attrs:
        expires_ts = parse_expires_py(attrs["expires"].rstrip())
        if expires_ts is None:
            return None
    max_age = None
    if "max-age" in attrs:
        m = _MAXAGE_PY_RE.match(attrs["max-age"])
        max_age = int(m.group(1)) if m else 0
    path = attrs.get("path")
    if path is not None:
        path = path.rstrip()

    if name.startswith(("__Secure-", "__Host-")):
        if scheme != "https" or not secure:
            return None
    if name.startswith("__Host-"):
        if via_attr or path != "/":
            return None

    return PyCookie(
        name=name,
        value=value,
        domain=domain,
        path=path,
        expires_ts=expires_ts,
        max_age=max_age,
        received_at=received_at,
        secure=secure,
        received_from_host=host,
    )


class PyCookieJar:
    """Per-task jar (reference loader jar, CookieJar.php:14-112)."""

    def __init__(self) -> None:
        self._jar: dict[str, dict[str, PyCookie]] = {}

    def add_from(self, url: str, headers, received_at: int = 0) -> None:
        _, host, _ = _split_url(url)
        if not host:
            return
        dom = _registrable_or_host(host)
        for h in headers:
            c = parse_set_cookie_py(url, h, received_at)
            if c is not None:
                self._jar.setdefault(dom, {})[c.name] = c

    def flush(self) -> None:
        self._jar = {}

    def get_for(self, url: str, now_s: int = 0) -> list[PyCookie]:
        _, host, _ = _split_url(url)
        dom = _registrable_or_host(host)
        return [
            c
            for c in self._jar.get(dom, {}).values()
            if c.should_send(url, now_s)
        ]

    def cookie_header(self, url: str, now_s: int = 0) -> str | None:
        cookies = self.get_for(url, now_s)
        if not cookies:
            return None
        return "; ".join(f"{c.name}={c.value}" for c in cookies)
