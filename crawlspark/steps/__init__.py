"""Step-algebra helpers that don't fit the bigger modules.

Maps the reference's remaining step surface onto Column expressions:
- TemplateString [crwl:var] substitution (src/Utils/TemplateString.php:12-31)
- UTF-8 BOM strip on text inputs (src/Steps/Step.php:302-309)
- DomQuery first/last/nth/even/odd selection (src/Steps/Html/DomQuery.php:83-120)
- Html::schemaOrg JSON-LD extraction (src/Steps/Html/SchemaOrg.php:55-105)
- 429/503 retry policy (src/Loader/Http/Politeness/RetryErrorResponseHandler.php)
- Gzip sniff/encode/decode (src/Utils/Gzip.php:12-43)
"""

from __future__ import annotations

import gzip as _gzip
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, BinaryType, StringType

BOM = "﻿"


def template_resolve(template: str, **vars_: Column) -> Column:
    """``[crwl:name]`` substitution, built at plan time into a concat
    (the reference resolves per-row at run time; our variables are columns)."""
    parts = re.split(r"\[crwl:([A-Za-z0-9_]+)\]", template)
    cols: list[Column] = []
    for i, p in enumerate(parts):
        if i % 2 == 0:
            if p:
                cols.append(F.lit(p))
        else:
            if p not in vars_:
                raise KeyError(f"template var [crwl:{p}] not provided")
            cols.append(vars_[p].cast("string"))
    return F.concat(*cols) if cols else F.lit("")


def strip_bom(text: Column) -> Column:
    """Drop a leading UTF-8 BOM (reference strips it from any text input)."""
    return F.when(
        text.startswith(BOM), F.substring(text, 2, 2147483647)
    ).otherwise(text)


def dom_select(matches: Column, which: str, n: int | None = None) -> Column:
    """Select from an array of matched nodes like DomQuery first/last/nth/
    even/odd (1-based 'nth'; 'even'/'odd' by 0-based position like the
    reference's CSS-style semantics)."""
    if which == "first":
        return F.element_at(matches, 1)
    if which == "last":
        return F.element_at(matches, -1)
    if which == "nth":
        return F.element_at(matches, n)
    if which == "even":
        # positions 2,4,... (1-based even) — reference's even()
        return F.filter(matches, lambda x, i: (i + 1) % 2 == 0)
    if which == "odd":
        return F.filter(matches, lambda x, i: (i + 1) % 2 == 1)
    raise ValueError(which)


_LDJSON_RE = re.compile(
    r'<script[^>]*type\s*=\s*["\']application/ld\+json["\'][^>]*>(.*?)</script>',
    re.IGNORECASE | re.DOTALL,
)


@pandas_udf(ArrayType(StringType()))
def extract_ldjson_udf(bodies: pd.Series) -> pd.Series:
    """All JSON-LD script blocks in document order (raw JSON strings;
    parse downstream with from_json/get_json_object)."""
    return bodies.map(lambda b: [m.strip() for m in _LDJSON_RE.findall(b)] if b else [])


# 429/503 retry policy: wait 10 s then 60 s, Retry-After honored up to 60 s,
# abort after 2 failed retries (RetryErrorResponseHandler.php:18-30,49-102)
RETRY_WAITS_MS = (10_000, 60_000)
RETRY_AFTER_CAP_MS = 60_000


def retry_schedule_cols(status: Column, retry_after_s: Column) -> list[Column]:
    retryable = status.isin(429, 503)
    ra_ms = F.least(retry_after_s * 1000, F.lit(RETRY_AFTER_CAP_MS))
    use_ra = retryable & retry_after_s.isNotNull() & (retry_after_s > 0)
    wait1 = F.when(use_ra, ra_ms).otherwise(
        F.when(retryable, F.lit(RETRY_WAITS_MS[0])).otherwise(F.lit(0))
    )
    wait2 = F.when(use_ra, ra_ms).otherwise(
        F.when(retryable, F.lit(RETRY_WAITS_MS[1])).otherwise(F.lit(0))
    )
    aborts = retryable  # after both retries fail the crawl aborts
    return [
        wait1.cast("long").alias("retry_wait1_ms"),
        wait2.cast("long").alias("retry_wait2_ms"),
        aborts.alias("aborts_after_retries"),
    ]


@pandas_udf(BinaryType())
def gzip_encode_udf(data: pd.Series) -> pd.Series:
    return data.map(lambda b: _gzip.compress(bytes(b), mtime=0) if b is not None else None)


@pandas_udf(BinaryType())
def gzip_decode_udf(data: pd.Series) -> pd.Series:
    """Gzip-magic sniff like the reference: non-gzip bytes pass through."""

    def one(b):
        if b is None:
            return None
        bb = bytes(b)
        if bb[:2] == b"\x1f\x8b":
            return _gzip.decompress(bb)
        return bb

    return data.map(one)


def merge_headers_df(left, right, id_col: str = "row_id"):
    """HttpHeaders::merge / addTo as a distributed DataFrame op.

    Reference: src/Utils/HttpHeaders.php:27-61 — result starts from ``left``;
    a right-side header whose name is absent is taken whole; for a name
    present on both sides, right values are appended in order but only if
    not already present (strict equality).

    Both inputs are the exploded header representation
    ``(id_col, header_name, pos, value)`` (``normalize`` at
    HttpHeaders.php:12-20 is exactly this explosion: every value becomes its
    own row).  Output has the same shape with ``pos`` re-ranked 1..n per
    header.  Two window passes over the same (id, name) partitioning — one
    Exchange, no Python.
    """
    from pyspark.sql import Window

    l = left.select(id_col, "header_name", "pos", "value").withColumn(
        "side", F.lit(0)
    )
    r = right.select(id_col, "header_name", "pos", "value").withColumn(
        "side", F.lit(1)
    )
    u = l.unionByName(r)
    dupw = Window.partitionBy(id_col, "header_name", "value").orderBy("side", "pos")
    rankw = Window.partitionBy(id_col, "header_name").orderBy("side", "pos")
    # left rows are kept whole (merge never touches the base array, even if
    # it repeats a value); only right rows dedup — against left AND earlier
    # right rows (addTo's in_array check, HttpHeaders.php:50-58)
    return (
        u.withColumn("dup_rn", F.row_number().over(dupw))
        .filter((F.col("side") == 0) | (F.col("dup_rn") == 1))
        .withColumn("pos", F.row_number().over(rankw).cast("long"))
        .select(id_col, "header_name", "pos", "value")
    )


def retry_filter(
    status: Column,
    only: list[int] | None = None,
    except_: list[int] | None = None,
) -> Column:
    """RetryManager::shallBeRetried (src/Loader/Http/Cache/RetryManager.php:
    43-49): status >= 400, not in ``except``, and in ``only`` when set."""
    cond = status >= 400
    if except_:
        cond = cond & ~status.isin(except_)
    if only:
        cond = cond & status.isin(only)
    return cond


def proxy_for(ord_col: Column, proxies: list[str]) -> Column:
    """ProxyManager::getProxy round-robin (src/Loader/Http/ProxyManager.php:
    32-45): the k-th request (0-based) uses proxies[k % n]; a single proxy
    is always returned as-is."""
    if len(proxies) == 1:
        return F.lit(proxies[0])
    arr = F.array(*[F.lit(p) for p in proxies])
    return F.element_at(arr, (ord_col % len(proxies) + 1).cast("int"))


def alt_svc_info(value: Column) -> Column:
    """Parse an ``Alt-Svc`` response header (RFC 7838) into the fields a
    fetch scheduler actually uses: struct(cleared, n_endpoints, h3,
    h3_ma).  ``h3`` is true when any alternative advertises HTTP/3
    (protocol-id ``h3`` or a draft ``h3-NN``) — the signal to prefer a
    QUIC connection pool for the host on the next wave; ``h3_ma`` is
    that alternative's freshness lifetime (``ma=`` seconds, spec default
    86400 when absent).  ``Alt-Svc: clear`` invalidates all cached
    alternatives.  Null/empty headers parse as no alternatives.

    Pure JVM regexp expressions — a narrow map that fuses into the
    response scan; the per-host rollup (any h3, max ma) is then one
    map-side-combined groupBy.  The reference's HttpLoader keeps no
    connection-level state at all (one request at a time,
    src/Loader/Http/HttpLoader.php) — at 10^10 URLs, routing refetches
    onto still-fresh h3 endpoints is how a fleet amortizes handshakes.
    """
    v = F.trim(F.coalesce(value, F.lit("")))
    cleared = F.lower(v) == "clear"
    # endpoints: comma-separated `proto="authority"` members (params after ';')
    n_endpoints = F.when(
        cleared | (v == ""), F.lit(0)
    ).otherwise(
        F.size(F.filter(
            F.split(v, ","),
            lambda e: e.rlike(r'^\s*[A-Za-z0-9!#$%&\'*+.^_`|~-]+=.+'),
        ))
    ).cast("int")
    h3_entry = F.regexp_extract(
        v, r'(?:^|,)\s*(h3(?:-\d+)?="[^"]*"(?:\s*;\s*[A-Za-z0-9_-]+=[^,;]+)*)', 1
    )
    h3 = (~cleared) & (h3_entry != "")
    ma = F.regexp_extract(h3_entry, r';\s*ma=("?)(\d+)\1', 2)
    h3_ma = F.when(
        h3, F.when(ma != "", ma.cast("long")).otherwise(F.lit(86400))
    ).cast("long")
    return F.struct(
        cleared.alias("cleared"),
        n_endpoints.alias("n_endpoints"),
        h3.alias("h3"),
        h3_ma.alias("h3_ma"),
    )


def csv_type_sniff(text: Column, sep: str = ",") -> Column:
    """Schema inference over a crawled CSV body (the ingestion step
    after ``Csv::parseString`` gets you rows: decide per column whether
    the strings are really ints / decimals / ISO dates, and how
    consistently).  Inference rule per column: empty cells are ignored
    for typing (but counted); 'int' if every non-empty cell is an
    optionally-signed integer, else 'decimal' if every cell is numeric,
    else 'date' for uniform YYYY-MM-DD, else 'string'.

    Header = first line; returns an ARRAY of
    struct(col_name, n_values, n_empty, inferred) — one per header
    column, doc-local HOFs only (nested transforms), no shuffle, no
    UDF.  Rows with fewer cells than the header contribute empties.
    ``sep`` is a literal separator, not a regex — '|' and '.' are safe.
    """
    import re as _re

    sep = _re.escape(sep)
    lines = F.filter(
        F.split(F.coalesce(text, F.lit("")), r"\r?\n"),
        lambda l: F.trim(l) != "",
    )
    header = F.split(F.element_at(lines, 1), sep)
    data = F.slice(lines, 2, 1 << 20)
    ncols = F.size(header)

    def col_stats(j):
        # try_element_at: a short row simply lacks the cell (NULL), it
        # must not abort the job under ANSI mode
        vals = F.transform(
            data, lambda l: F.trim(F.try_element_at(F.split(l, sep), j))
        )
        nonempty = F.filter(vals, lambda v: v.isNotNull() & (v != ""))
        n_vals = F.size(nonempty)
        all_int = F.forall(nonempty, lambda v: v.rlike(r"^-?\d+$"))
        all_num = F.forall(
            nonempty, lambda v: v.rlike(r"^-?\d+(\.\d+)?$"))
        all_date = F.forall(
            nonempty, lambda v: v.rlike(r"^\d{4}-\d{2}-\d{2}$"))
        inferred = (
            F.when(n_vals == 0, F.lit("empty"))
            .when(all_int, F.lit("int"))
            .when(all_num, F.lit("decimal"))
            .when(all_date, F.lit("date"))
            .otherwise(F.lit("string"))
        )
        return F.struct(
            F.trim(F.element_at(header, j)).alias("col_name"),
            n_vals.cast("int").alias("n_values"),
            (F.size(vals) - n_vals).cast("int").alias("n_empty"),
            inferred.alias("inferred"),
        )

    return F.when(F.size(lines) >= 1, F.transform(
        F.sequence(F.lit(1), ncols), col_stats
    )).otherwise(F.array().cast(
        "array<struct<col_name:string,n_values:int,"
        "n_empty:int,inferred:string>>"))
