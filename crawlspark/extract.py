"""Vectorized extraction from fetched page bodies.

No HTML parser library ships in this container, so the HTML path is a
compiled-regex extractor inside Arrow pandas_udfs (batched, no per-row
Python-object churn beyond the regex scan itself).  Semantics mirror the
reference's GetLink/GetLinks + Document handling:

- anchors in document order with their position (reference extracts links in
  document order, src/Steps/Loading/HttpCrawl.php:294-331),
- link text normalized: tags stripped, whitespace collapsed, trimmed
  (reference: src/Steps/Dom/Node.php:108-120),
- ``<base href>`` honored for relative resolution (reference:
  src/Steps/Html/GetLink.php:43-288),
- non-http(s) schemes (mailto:, tel:, javascript:, data:) dropped
  (GetLink.php link filtering),
- sitemap ``<urlset><url><loc>`` extraction tolerates attribute-heavy
  ``<urlset>`` tags (reference: src/Steps/Sitemap/GetUrlsFromSitemap.php:47-90,
  attribute-stripping at 66-71).

XML-only inputs can also use Spark's native ``F.xpath`` (JVM-side); the
sitemap helper below offers both.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

LINK_SCHEMA = ArrayType(
    StructType(
        [
            StructField("href", StringType()),
            StructField("text", StringType()),
            StructField("pos", IntegerType()),
        ]
    )
)

_BASE_RE = re.compile(
    r"<base\s[^>]*?href\s*=\s*(?:([\"'])(.*?)\1|([^\s>]+))", re.IGNORECASE
)
# canonical <link> detection is two-phase (find tags, then parse attributes
# left-to-right) rather than one regex: a single pattern can't stop
# 'rel=canonical' INSIDE an unquoted href value ('<link href=/p?rel=canonical-x>')
# from satisfying the rel clause, nor distinguish rel="canonicalize".
# Quote-aware tag body so href="/p?a=b>c" cannot truncate the tag.
_LINK_TAG_RE = re.compile(
    r"<link(?=[\s/>])(?:\"[^\"]*\"|'[^']*'|[^>\"'])*>",
    re.IGNORECASE | re.DOTALL,
)
_ATTR_RE = re.compile(
    r"([a-zA-Z][\w-]*)\s*=\s*(?:([\"'])(.*?)\2|([^\s>]+))", re.DOTALL
)
# a tag must start with a letter, '/', '!' or '?' — a stray '<' followed by
# anything else is character DATA in the HTML5 tokenizer ('1<2' is text),
# so the text normalizer must not swallow it (soup differential, r5)
_TAG_RE = re.compile(r"<[/!?a-zA-Z][^>]*>")
_WS_RE = re.compile(r"\s+")
# non-text spans a DOM's textContent excludes: comments, CDATA, and
# script/style CONTENT (cssq.find_elements returns real-DOM innerHTML that
# preserves these, so text normalization must drop them itself).  Composed
# from cssq's shared grammar constants so element matching and text
# normalization can never disagree about where a soup span ends.
from . import cssq as _cssq  # noqa: E402  (shared soup-span grammar)

_NONTEXT_RE = re.compile(
    _cssq.COMMENT_SPAN
    + "|" + _cssq.CDATA_SPAN
    + "|" + _cssq.RAWTEXT_OPEN + r".*?(?:</\1\s*>|\Z)",
    re.DOTALL | re.IGNORECASE,
)
_LOC_RE = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.IGNORECASE | re.DOTALL)
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL)
_META_RE = re.compile(
    r"<meta\s[^>]*?(?:name|property)\s*=\s*(?:([\"'])(.*?)\1|([^\s>]+))[^>]*?"
    r"content\s*=\s*(?:([\"'])(.*?)\4|([^\s>]+))",
    re.IGNORECASE | re.DOTALL,
)

BAD_SCHEMES = ("mailto:", "tel:", "javascript:", "data:", "ftp:")


def normalize_text(s: str) -> str:
    """Reference text normalization: strip tags, collapse whitespace, trim.
    Comment / CDATA / script / style spans are dropped first — a DOM's
    textContent never includes them (Node.php text semantics)."""
    return _WS_RE.sub(" ", _TAG_RE.sub("", _NONTEXT_RE.sub("", s or ""))).strip()


# --------------------------------------------------------------------------
# linear quote-aware tag tokenizer: the anchor scan must survive real-web
# tag soup the way a browser DOM does (reference parses with a real DOM,
# src/Steps/Dom/HtmlDocument.php:63-86).  One regex pass that surfaces only
# the INTERESTING tokens — comments/CDATA/doctype, <a> open/close,
# script/style raw-text opens, and the rare boring tag whose QUOTED
# attribute embeds a spoofed "<a ..." — so the C engine skips the ~90% of
# tags that cannot affect link extraction instead of yielding a Python
# iteration per <div>.  Quoted attribute values may contain '>' / '<';
# unclosed and nested anchors close implicitly like the HTML5 tree builder.
_Q = r"\"[^\"]*\"|'[^']*'"
_CORE_TOKENS = (
    r"<!--.*?(?:-->|\Z)"                       # comment (unterminated -> EOF)
    r"|<!\[CDATA\[.*?(?:\]\]>|\Z)"
    r"|<![^>]*>"                               # doctype / declaration
    r"|<(/?)(a|script|style)(?![a-zA-Z0-9:-])" # tags that matter
    rf"((?:{_Q}|[^>\"'])*)>"                   # attrs; quotes may hold > <
)
_TOKEN_RE = re.compile(_CORE_TOKENS, re.DOTALL | re.IGNORECASE)
# full variant additionally consumes a boring tag whose QUOTED attribute
# value embeds "<a ..." so the spoofed anchor is never scanned as markup.
# That backtracking branch costs ~7x on spoof-free pages (measured: 61 ->
# 8.8 MB/s raw), so it only runs for documents the cheap hint scan below
# flags — a C-speed single pass that over-approximates "an attribute value
# opening with a quote whose run contains <a".
_TOKEN_SPOOF_RE = re.compile(
    _CORE_TOKENS
    + rf"|<[a-zA-Z][a-zA-Z0-9:-]*(?:{_Q}|[^>\"'])*?"
    + rf"(?:\"[^\"]*</?a[\s/>][^\"]*\"|'[^']*</?a[\s/>][^']*')"
    + rf"(?:{_Q}|[^>\"'])*>",
    re.DOTALL | re.IGNORECASE,
)
# the hint (and the spoof branch above) cover BOTH '<a' and '</a' inside a
# quoted value: a spoofed '</a>' (e.g. <img alt="</a>"> while a link is
# open) would otherwise end the open anchor early and leak the rest of the
# boring tag into the following text (ADVICE r4)
_SPOOF_HINT_RE = re.compile(
    r"=\s*(?:\"[^\"]*</?a[\s/>]|'[^']*</?a[\s/>])", re.DOTALL | re.IGNORECASE
)
_RAWTEXT_CLOSE = {
    "script": re.compile(r"</script\s*>", re.IGNORECASE),
    "style": re.compile(r"</style\s*>", re.IGNORECASE),
}


def _parse_attrs(s: str) -> dict:
    """Attribute dict from a tag's attr string: first occurrence wins
    (HTML5 duplicate-attribute rule) and entity references in values are
    decoded, as a DOM getAttribute() would."""
    import html as _html

    attrs: dict = {}
    for m in _ATTR_RE.finditer(s):
        name = m.group(1).lower()
        if name not in attrs:
            val = m.group(3) if m.group(3) is not None else m.group(4)
            attrs[name] = _html.unescape(val) if "&" in val else val
    return attrs


def _extract_links_one(body: str) -> list[dict]:
    if not body:
        return []
    import html as _html

    out: list[dict] = []
    open_link: dict | None = None
    text_parts: list[str] = []
    pos = 0

    def close_link():
        nonlocal open_link
        if open_link is not None:
            txt = "".join(text_parts)
            if "&" in txt:
                txt = _html.unescape(txt)
            open_link["text"] = normalize_text(txt)
            out.append(open_link)
            open_link = None

    token_re = (
        _TOKEN_SPOOF_RE if _SPOOF_HINT_RE.search(body) else _TOKEN_RE
    )
    i = 0
    n = len(body)
    while i < n:
        m = token_re.search(body, i)
        if m is None:
            if open_link is not None:
                text_parts.append(body[i:])
            break
        if open_link is not None and m.start() > i:
            text_parts.append(body[i:m.start()])
        i = m.end()
        name = m.group(2)
        if name is None:
            continue  # comment / CDATA / doctype: contributes nothing
        name = name.lower()
        closing = m.group(1) == "/"
        if not closing and name in _RAWTEXT_CLOSE:
            # raw-text content model: skip to the matching close tag
            c = _RAWTEXT_CLOSE[name].search(body, i)
            i = c.end() if c else n
            continue
        if name != "a":
            continue
        if closing:
            close_link()
            continue
        # a new <a> implicitly closes an open one (HTML5 tree builder)
        close_link()
        href = _parse_attrs(m.group(3)).get("href")
        if href is None:
            continue
        open_link = {"href": href, "text": "", "pos": pos}
        pos += 1
        text_parts = []
    close_link()
    return out


@pandas_udf(LINK_SCHEMA)
def extract_links_udf(bodies: pd.Series) -> pd.Series:
    return bodies.map(_extract_links_one)


@pandas_udf(StringType())
def extract_base_href_udf(bodies: pd.Series) -> pd.Series:
    def one(b):
        if not b:
            return None
        m = _BASE_RE.search(b)
        if not m:
            return None
        return m.group(2) if m.group(2) is not None else m.group(3)

    return bodies.map(one)


def _canonical_one(b: str) -> str | None:
    for tag in _LINK_TAG_RE.finditer(b):
        attrs = _parse_attrs(tag.group(0))
        # rel is a space-separated token list per the HTML spec; exact-token
        # match so rel="canonicalize" does not count
        if "canonical" in (attrs.get("rel") or "").lower().split():
            return attrs.get("href")
    return None


@pandas_udf(StringType())
def extract_canonical_udf(bodies: pd.Series) -> pd.Series:
    return bodies.map(lambda b: _canonical_one(b) if b else None)


@pandas_udf(StringType())
def extract_title_udf(bodies: pd.Series) -> pd.Series:
    def one(b):
        if not b:
            return None
        m = _TITLE_RE.search(b)
        return normalize_text(m.group(1)) if m else None

    return bodies.map(one)


@pandas_udf(MapType(StringType(), StringType()))
def extract_meta_udf(bodies: pd.Series) -> pd.Series:
    def one(b):
        if not b:
            return {}
        return {
            (m.group(2) if m.group(2) is not None else m.group(3)):
            (m.group(5) if m.group(5) is not None else m.group(6))
            for m in _META_RE.finditer(b)
        }

    return bodies.map(one)


@pandas_udf(ArrayType(StringType()))
def extract_sitemap_locs_udf(bodies: pd.Series) -> pd.Series:
    return bodies.map(lambda b: _LOC_RE.findall(b) if b else [])


def sitemap_locs_xpath(body: Column) -> Column:
    """Native JVM alternative: strip <urlset ...> attributes first (the
    reference does the same to survive attribute-heavy urlset tags), then
    xpath out the <loc> values."""
    cleaned = F.regexp_replace(body, r"<urlset[^>]*>", "<urlset>")
    cleaned = F.regexp_replace(cleaned, r"<\?xml[^>]*\?>|<\?xml-stylesheet[^>]*\?>", "")
    return F.xpath(cleaned, F.lit("urlset/url/loc/text()"))


def resolve_url(base_url: str, base_href: str | None, href: str) -> str | None:
    """Resolve an extracted href against the page URL (honoring <base href>),
    returning None for non-http(s) or unresolvable links."""
    if href is None:
        return None
    h = href.strip()
    if not h or h.lower().startswith(BAD_SCHEMES):
        return None
    base = base_url
    if base_href:
        base = urljoin(base_url, base_href)
    try:
        absu = urljoin(base, h)
        parts = urlsplit(absu)
    except ValueError:
        return None
    if parts.scheme not in ("http", "https") or not parts.netloc:
        return None
    return absu


RESOLVED_LINK_SCHEMA = ArrayType(
    StructType(
        [
            StructField("url", StringType()),
            StructField("text", StringType()),
            StructField("pos", IntegerType()),
        ]
    )
)


def make_selector_links_udf(selector: str):
    """Raw (href, text, pos) arrays for <a> elements matched DIRECTLY by the
    CSS selector (reference GetLink.php:90-97,185-191: selector matches that
    are not anchors are ignored).  Regex-backed CSS subset (crawlspark.cssq)."""
    from . import cssq

    cssq.parse_selector(selector)  # fail fast, like InvalidDomQueryException

    @pandas_udf(LINK_SCHEMA)
    def selector_links(bodies: pd.Series) -> pd.Series:
        from . import cssq

        def one(b):
            if not b:
                return []
            out = []
            for tag, attrs, inner in cssq.find_elements(b, selector):
                if tag.lower() != "a":
                    continue
                href = cssq._attr(attrs, "href")
                if href is None:
                    continue
                out.append(
                    {"href": href, "text": normalize_text(inner), "pos": len(out)}
                )
            return out

        return bodies.map(one)

    return selector_links


def make_resolve_links_udf(keep_fragment: bool):
    """Arrow pandas_udf resolving raw (href,text,pos) arrays against their
    page URL + base href; drops bad schemes; strips fragments unless kept
    (reference default drops fragments, HttpCrawl.php:466-473)."""

    @pandas_udf(RESOLVED_LINK_SCHEMA)
    def resolve_links(
        urls: pd.Series, base_hrefs: pd.Series, links: pd.Series
    ) -> pd.Series:
        out_rows = []
        for url, bhref, lnks in zip(urls, base_hrefs, links):
            res = []
            if lnks is not None:
                for l in lnks:
                    r = resolve_url(url, bhref, l["href"])
                    if r is None:
                        continue
                    if not keep_fragment:
                        r = r.split("#", 1)[0]
                    res.append({"url": r, "text": l["text"], "pos": int(l["pos"])})
            out_rows.append(res)
        return pd.Series(out_rows)

    return resolve_links


def sitemap_locs_auto(body_binary: Column) -> Column:
    """Sitemap <loc> extraction tolerant of gzipped bodies (.xml.gz).

    The reference transparently gunzips sitemap responses before parsing
    (Utils/Gzip.php:12-43 magic-byte sniff, used by the step's
    validateAndSanitizeToXmlDocumentInstance).  Here: sniff the 1f8b magic
    on the binary column, route gzipped bodies through the Arrow decode
    UDF, plain ones straight to the native xpath path."""
    from .steps import gzip_decode_udf

    is_gz = F.substring(body_binary, 1, 2) == bytes([0x1F, 0x8B])
    text = F.when(
        is_gz, gzip_decode_udf(body_binary).cast("string")
    ).otherwise(body_binary.cast("string"))
    return sitemap_locs_xpath(text)


# --------------------------------------------------------------------------
# main-content extraction (boilerplate block removal)
# --------------------------------------------------------------------------

BLOCK_SPLIT_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|td|article|section|header|footer|nav|aside"
    r"|ul|ol|table|tr|br)[^>]*>"
)
ANCHOR_TEXT_RE = r"(?i)<a[^>]*>(.*?)</a>"
ANY_TAG_RE = r"<[^>]+>"


def main_content_blocks(
    df,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_len: int = 20,
    max_link_density_permille: int = 500,
):
    """jusText-style main-content extraction (Pomikálek 2011's block
    heuristic, reduced to its two load-bearing signals): split the page
    into blocks at block-level tags, then keep blocks whose cleaned text
    is long enough AND whose link density (anchor chars / text chars) is
    below the threshold — navigation, footers, and link farms fail one of
    the two.  The reference extracts by explicit selector
    (src/Steps/Html.php); this is the selector-free variant a crawl uses
    when no site-specific schema exists.

    Pure HOF Column expressions (split -> per-block struct transform ->
    filter -> ordered join) — a narrow map stage; the density comparison
    is integer permille so the SQL oracle replays it exactly.

    Returns (id, main_text, n_blocks, n_good).
    """
    html = F.col(html_col)
    blocks = F.split(html, BLOCK_SPLIT_RE)

    def block_struct(x):
        clean = F.trim(
            F.regexp_replace(
                F.regexp_replace(x, ANY_TAG_RE, " "), r"\s+", " "
            )
        )
        link_chars = F.aggregate(
            F.regexp_extract_all(x, F.lit(ANCHOR_TEXT_RE), 1),
            F.lit(0),
            lambda acc, s: acc + F.length(s),
        )
        return F.struct(clean.alias("t"), link_chars.alias("lc"))

    bl = F.filter(
        F.transform(blocks, block_struct), lambda b: b["t"] != ""
    )
    good = F.filter(
        bl,
        lambda b: (F.length(b["t"]) >= min_len)
        & (1000 * b["lc"] <= max_link_density_permille * F.length(b["t"])),
    )
    return df.select(
        F.col(id_col),
        F.array_join(F.transform(good, lambda b: b["t"]), "\n").alias(
            "main_text"
        ),
        F.size(bl).cast("long").alias("n_blocks"),
        F.size(good).cast("long").alias("n_good"),
    )


# --------------------------------------------------------------------------
# image-crawl extraction: <img srcset> candidates + Google image sitemaps
# --------------------------------------------------------------------------

def img_srcset_candidates(
    body: Column,
    page_url: Column,
    max_width: int = 800,
) -> Column:
    """Per-page `<img>` candidate selection for an image crawler: parse
    every img tag's ``src`` / ``srcset`` (HTML spec §4.8.4.3 width
    descriptors ``"url1 320w, url2 640w"``) and pick ONE fetch URL per
    image under a pixel budget — the largest candidate whose width fits
    ``max_width``, else the smallest available (never upscale the
    budget), else the bare ``src``.

    Everything is JVM higher-order functions over regexp_extract_all (no
    UDF, no shuffle): at 100 TB of HTML this stays inside whole-stage
    codegen next to the scan.  Relative candidate URLs are resolved with
    the same cheap scheme/authority arithmetic as the fixture corpus
    (absolute ``http...`` kept, ``/path`` joined to the page authority,
    bare names joined to the page directory); full RFC 3986 resolution
    lives in :func:`resolve_url` for real-page paths.

    Returns array<struct<img_ord:int, chosen_url:string, chosen_w:long,
    n_candidates:int>> — one entry per img tag in document order.
    """
    tag_arr = F.regexp_extract_all(body, F.lit(r"(?i)<img[^>]*>"), 0)
    authority = F.regexp_extract(page_url, r"^(https?://[^/]+)", 1)
    base_dir = F.regexp_replace(page_url, r"[^/]*$", "")

    def resolve(u: Column) -> Column:
        return (
            F.when(u.rlike("^https?://"), u)
            .when(u.startswith("/"), F.concat(authority, u))
            .otherwise(F.concat(base_dir, u))
        )

    def parse_tag(tag: Column, i: Column) -> Column:
        src = F.regexp_extract(tag, r'(?i)\bsrc\s*=\s*"([^"]*)"', 1)
        srcset = F.regexp_extract(tag, r'(?i)\bsrcset\s*=\s*"([^"]*)"', 1)
        cands = F.when(
            srcset != "",
            F.transform(
                F.split(srcset, ","),
                lambda e: F.struct(
                    F.regexp_extract(F.trim(e), r"^(\S+)", 1).alias("url"),
                    F.nullif(
                        F.regexp_extract(F.trim(e), r"\s(\d+)w$", 1), F.lit("")
                    ).cast("long").alias("w"),
                ),
            ),
        ).otherwise(
            F.array(F.struct(src.alias("url"),
                             F.lit(None).cast("long").alias("w")))
        )
        fits = F.filter(cands, lambda c: c["w"].isNotNull()
                        & (c["w"] <= max_width))
        sized = F.filter(cands, lambda c: c["w"].isNotNull())
        best = F.when(
            F.size(fits) > 0,
            F.element_at(F.array_sort(
                F.transform(fits, lambda c: F.struct(
                    c["w"].alias("w"), c["url"].alias("url")))), -1),
        ).when(
            F.size(sized) > 0,
            F.element_at(F.array_sort(
                F.transform(sized, lambda c: F.struct(
                    c["w"].alias("w"), c["url"].alias("url")))), 1),
        ).otherwise(
            F.struct(F.lit(None).cast("long").alias("w"),
                     src.alias("url"))
        )
        return F.struct(
            i.cast("int").alias("img_ord"),
            resolve(best["url"]).alias("chosen_url"),
            best["w"].alias("chosen_w"),
            F.size(cands).cast("int").alias("n_candidates"),
        )

    # transform's (element, index) lambda — NOT sequence(0, size-1) +
    # zip_with, whose descending [0, -1] on an imageless page would pad
    # the empty tag array with two phantom null-url structs.
    return F.transform(tag_arr, lambda tag, i: parse_tag(tag, i))


def sitemap_image_entries(body: Column) -> Column:
    """Google image-sitemap extraction: per <url> block, the page <loc>
    plus every <image:image> child's <image:loc> / <image:caption> —
    the crawl entry point that yields (page, image, caption) rows
    directly, before any HTML fetch (sitemaps.org image extension;
    extends the reference's plain Sitemap::getUrlsFromSitemap,
    src/Steps/Loading/Sitemap.php:27-61 which only reads <loc>).

    Pure JVM: split on <url> blocks keeps each page's images aligned
    with its own <loc> (two flat xpath() calls would lose the pairing
    when image counts vary per page); regexp_extract_all + arrays_zip
    inside each block.  Returns array<struct<page_url, image_url,
    caption>> — one entry per image.
    """
    blocks = F.split(body, "<url>")
    per_block = F.transform(
        blocks,
        lambda seg: F.transform(
            F.arrays_zip(
                F.regexp_extract_all(
                    seg, F.lit(r"(?s)<image:loc>\s*(.*?)\s*</image:loc>"), 1
                ).alias("image_url"),
                F.regexp_extract_all(
                    seg,
                    F.lit(r"(?s)<image:caption>\s*(.*?)\s*</image:caption>"),
                    1,
                ).alias("caption"),
            ),
            lambda z: F.struct(
                F.regexp_extract(seg, r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
                 .alias("page_url"),
                z["image_url"].alias("image_url"),
                z["caption"].alias("caption"),
            ),
        ),
    )
    return F.flatten(F.filter(per_block, lambda a: F.size(a) > 0))


def extract_hreflang(body: Column) -> Column:
    """``<link rel="alternate" hreflang="..." href="...">`` extraction —
    the language-variant declaration (RFC 8288 + Google hreflang):
    a page's alternate set links every language edition of the same
    content.  Crawl use: fetch ONE edition per cluster for training
    data (the rest are translations, near-dup in structure), or route
    editions to per-language pipelines.

    JVM-only: regexp_extract_all over link tags carrying hreflang,
    then per-tag attribute pulls (order-tolerant for the two attrs).
    Returns array<struct<hreflang:string, url:string>>.
    """
    tags = F.regexp_extract_all(
        body, F.lit(r"(?i)<link\s[^>]*hreflang\s*=[^>]*>"), 0
    )
    return F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, r'(?i)hreflang\s*=\s*"([^"]*)"', 1)
             .alias("hreflang"),
            F.regexp_extract(t, r'(?i)href\s*=\s*"([^"]*)"', 1).alias("url"),
        ),
    )


def image_caption_pairs(body: Column, page_url: Column) -> Column:
    """(image_url, caption) pair mining from page HTML — the harvest
    step of a LAION-style image+caption crawl (the input_hint table's
    rows are born here).  Caption priority per figure-wrapped image:
    ``<figcaption>`` beats the img's ``alt`` attribute (figcaption is
    authored as a caption; alt is accessibility text) — standing
    practice in web-scale image-text corpus construction; bare images
    fall back to alt.  Images with NO caption source are dropped (an
    uncaptioned image can't train an image-text pair).

    JVM-only: figure blocks first (regexp_extract_all over
    ``<figure>...</figure>``, non-greedy), then bare img tags NOT inside
    a figure (computed by subtracting the figure-claimed img tags from
    the page's full img set — arrays, no second scan).  Relative URLs
    resolve with the page-authority arithmetic of
    :func:`img_srcset_candidates`.

    Returns array<struct<image_url:string, caption:string,
    source:string>> with source in ('figcaption', 'alt').
    """
    authority = F.regexp_extract(page_url, r"^(https?://[^/]+)", 1)
    base_dir = F.regexp_replace(page_url, r"[^/]*$", "")

    def resolve(u: Column) -> Column:
        return (
            F.when(u.rlike("^https?://"), u)
            .when(u.startswith("/"), F.concat(authority, u))
            .otherwise(F.concat(base_dir, u))
        )

    figures = F.regexp_extract_all(
        body, F.lit(r"(?is)<figure[^>]*>.*?</figure>"), 0
    )
    fig_pairs = F.filter(
        F.transform(
            figures,
            lambda fig: F.struct(
                F.regexp_extract(
                    fig, r'(?i)<img\s[^>]*src\s*=\s*"([^"]*)"', 1
                ).alias("u"),
                F.trim(F.regexp_extract(
                    fig, r"(?is)<figcaption[^>]*>(.*?)</figcaption>", 1
                )).alias("cap"),
                F.regexp_extract(
                    fig, r'(?i)<img\s[^>]*alt\s*=\s*"([^"]*)"', 1
                ).alias("alt"),
            ),
        ),
        lambda p: p["u"] != "",
    )
    fig_imgs = F.transform(fig_pairs, lambda p: p["u"])
    all_imgs = F.regexp_extract_all(
        body, F.lit(r"(?i)<img\s[^>]*>"), 0
    )
    bare = F.filter(
        F.transform(
            all_imgs,
            lambda t: F.struct(
                F.regexp_extract(t, r'(?i)\bsrc\s*=\s*"([^"]*)"', 1)
                 .alias("u"),
                F.regexp_extract(t, r'(?i)\balt\s*=\s*"([^"]*)"', 1)
                 .alias("alt"),
            ),
        ),
        lambda p: (p["u"] != "") & ~F.array_contains(fig_imgs, p["u"]),
    )
    from_figs = F.transform(
        fig_pairs,
        lambda p: F.struct(
            resolve(p["u"]).alias("image_url"),
            F.when(p["cap"] != "", p["cap"]).otherwise(p["alt"])
             .alias("caption"),
            F.when(p["cap"] != "", F.lit("figcaption"))
             .otherwise(F.lit("alt")).alias("source"),
        ),
    )
    from_bare = F.transform(
        bare,
        lambda p: F.struct(
            resolve(p["u"]).alias("image_url"),
            p["alt"].alias("caption"),
            F.lit("alt").alias("source"),
        ),
    )
    return F.filter(
        F.concat(from_figs, from_bare),
        lambda p: p["caption"] != "",
    )


def og_image_meta(body: Column) -> Column:
    """OpenGraph / Twitter-card hero-image metadata: og:image (+ width/
    height when present) with twitter:image as fallback — the page's
    nominated representative image, the second caption-pair source
    after :func:`image_caption_pairs` (og:title/og:description serve as
    the caption text).  Returns struct<image_url:string, width:long,
    height:long, title:string> (image_url null when the page nominates
    nothing).
    """
    def meta(prop: str) -> Column:
        pat = (r'(?i)<meta\s[^>]*(?:property|name)\s*=\s*"' + prop
               + r'"[^>]*content\s*=\s*"([^"]*)"')
        return F.regexp_extract(body, pat, 1)

    og = meta("og:image")
    tw = meta("twitter:image")
    url = F.when(og != "", og).when(tw != "", tw)
    return F.struct(
        url.alias("image_url"),
        F.nullif(meta("og:image:width"), F.lit("")).cast("long")
         .alias("width"),
        F.nullif(meta("og:image:height"), F.lit("")).cast("long")
         .alias("height"),
        F.nullif(meta("og:title"), F.lit("")).alias("title"),
    )


def discover_feeds(body: Column) -> Column:
    """RSS/Atom autodiscovery links (``<link rel="alternate"
    type="application/rss+xml|atom+xml" href=...>``) — feeds are the
    cheapest recrawl signal a site offers: one small fetch lists every
    new content URL with timestamps, so feed-discovered hosts can skip
    speculative BFS re-expansion entirely.  Returns
    array<struct<feed_url:string, kind:string>> with kind 'rss'/'atom'.
    JVM regexp over link tags; attribute order tolerant for type/href.
    """
    tags = F.regexp_extract_all(
        body,
        F.lit(r'(?i)<link\s[^>]*type\s*=\s*"application/(?:rss|atom)\+xml"'
              r"[^>]*>"),
        0,
    )
    return F.filter(
        F.transform(
            tags,
            lambda t: F.struct(
                F.regexp_extract(t, r'(?i)href\s*=\s*"([^"]*)"', 1)
                 .alias("feed_url"),
                F.when(
                    F.lower(t).contains("application/rss+xml"), F.lit("rss")
                ).otherwise(F.lit("atom")).alias("kind"),
            ),
        ),
        lambda p: p["feed_url"] != "",
    )


def feed_items(body: Column) -> Column:
    """Feed entry extraction for both syndication dialects: RSS
    ``<item>`` (link/title/pubDate element text) and Atom ``<entry>``
    (``<link href="...">`` attribute, title, updated).  The per-item
    block split keeps each item's fields aligned (the same
    misalignment hazard as sitemap_image_entries).  Returns
    array<struct<url:string, title:string, published:string>>.
    """
    def items_of(block_pat: str, link_expr, title_pat: str,
                 date_pat: str) -> Column:
        blocks = F.regexp_extract_all(body, F.lit(block_pat), 0)
        return F.transform(
            blocks,
            lambda b: F.struct(
                link_expr(b).alias("url"),
                F.trim(F.regexp_extract(b, title_pat, 1)).alias("title"),
                F.trim(F.regexp_extract(b, date_pat, 1)).alias("published"),
            ),
        )
    rss = items_of(
        r"(?is)<item>.*?</item>",
        lambda b: F.regexp_extract(b, r"(?is)<link>\s*(.*?)\s*</link>", 1),
        r"(?is)<title>(.*?)</title>",
        r"(?is)<pubDate>(.*?)</pubDate>",
    )
    atom = items_of(
        r"(?is)<entry>.*?</entry>",
        lambda b: F.regexp_extract(
            b, r'(?i)<link\s[^>]*href\s*=\s*"([^"]*)"', 1),
        r"(?is)<title>(.*?)</title>",
        r"(?is)<updated>(.*?)</updated>",
    )
    return F.filter(F.concat(rss, atom), lambda p: p["url"] != "")


def amp_canonical_fold(pages: "DataFrame", url_col: str = "url",
                       body_col: str = "body") -> "DataFrame":
    """AMP-edition folding: an AMP page (``<link rel="amphtml">`` on the
    canonical, ``<link rel="canonical">`` back from the AMP copy) is the
    same document twice — crawl hygiene folds each AMP URL onto its
    canonical before dedup/seen accounting, exactly like the engine's
    canonical-link dedup (engine.py) but as a standalone batch operator.

    Per page: canon_target = the page's rel=canonical href (if any);
    fold_url = canon_target when it differs from the page URL (an AMP or
    otherwise non-canonical edition), else the page's own URL.  Returns
    (url, fold_url, is_alternate).  Narrow map, no UDF.
    """
    canon = F.regexp_extract(
        F.col(body_col),
        r'(?i)<link\s[^>]*rel\s*=\s*"canonical"[^>]*href\s*=\s*"([^"]*)"',
        1,
    )
    fold = F.when((canon != "") & (canon != F.col(url_col)), canon
                  ).otherwise(F.col(url_col))
    return pages.select(
        F.col(url_col).alias("url"),
        fold.alias("fold_url"),
        (fold != F.col(url_col)).alias("is_alternate"),
    )


def meta_refresh(body: Column) -> Column:
    """``<meta http-equiv="refresh" content="5;url=/next">`` extraction —
    the third redirect mechanism after 3xx statuses and rel=canonical:
    crawlers must honor it or they index interstitial stub pages and
    miss the real content.  Returns struct<delay_s:long, url:string>
    (url null when the tag only reloads the page itself; struct null
    when absent).  Attribute-order tolerant, case-insensitive; the URL
    part accepts the spec's optional quotes around the target.
    """
    # attribute order varies in the wild: try http-equiv-first, then
    # content-first, take whichever matched
    fwd = F.regexp_extract(
        body,
        r'(?i)<meta\s[^>]*http-equiv\s*=\s*"refresh"[^>]*'
        r'content\s*=\s*"([^"]*)"',
        1,
    )
    bwd = F.regexp_extract(
        body,
        r'(?i)<meta\s[^>]*content\s*=\s*"([^"]*)"[^>]*'
        r'http-equiv\s*=\s*"refresh"',
        1,
    )
    content = F.when(fwd != "", fwd).otherwise(bwd)
    delay = F.nullif(
        F.regexp_extract(content, r"^\s*(\d+)", 1), F.lit("")
    ).cast("long")
    url = F.nullif(
        F.regexp_extract(content, r"(?i);\s*url\s*=\s*'?([^'\"]+?)'?\s*$", 1),
        F.lit(""),
    )
    return F.when(
        content != "",
        F.struct(delay.alias("delay_s"), url.alias("url")),
    )


def site_icons(body: Column, page_url: Column,
               target_px: int = 180) -> Column:
    """Site icon selection (``<link rel="icon" sizes="32x32">``,
    ``apple-touch-icon``): pick the smallest declared icon that meets
    ``target_px`` on the short side, else the largest available, else
    the ``/favicon.ico`` convention — the thumbnail/branding asset an
    image crawl stores per site.  Returns struct<icon_url:string,
    declared_px:long, source:string> with source 'link' or 'default'.
    Attribute parsing mirrors img_srcset_candidates; sizes="any"
    (SVG) and missing sizes count as px null and lose to sized icons
    that fit, but win over nothing.
    """
    authority = F.regexp_extract(page_url, r"^(https?://[^/]+)", 1)

    def resolve(u: Column) -> Column:
        return (
            F.when(u.rlike("^https?://"), u)
            .when(u.startswith("/"), F.concat(authority, u))
            .otherwise(F.concat(
                F.regexp_replace(page_url, r"[^/]*$", ""), u))
        )

    tags = F.regexp_extract_all(
        body,
        F.lit(r'(?i)<link\s[^>]*rel\s*=\s*"(?:shortcut\s+)?icon"[^>]*>'
              r'|<link\s[^>]*rel\s*=\s*"apple-touch-icon"[^>]*>'),
        0,
    )
    cands = F.filter(
        F.transform(
            tags,
            lambda t: F.struct(
                F.regexp_extract(t, r'(?i)href\s*=\s*"([^"]*)"', 1)
                 .alias("u"),
                F.nullif(
                    F.regexp_extract(t, r'(?i)sizes\s*=\s*"(\d+)x\d+"', 1),
                    F.lit(""),
                ).cast("long").alias("px"),
            ),
        ),
        lambda c: c["u"] != "",
    )
    fitting = F.filter(
        cands, lambda c: c["px"].isNotNull() & (c["px"] >= target_px)
    )
    sized = F.filter(cands, lambda c: c["px"].isNotNull())
    by_px = lambda arr: F.transform(  # noqa: E731
        arr, lambda c: F.struct(c["px"].alias("px"), c["u"].alias("u"))
    )
    pick = (
        F.when(F.size(fitting) > 0,
               F.element_at(F.array_sort(by_px(fitting)), 1))
        .when(F.size(sized) > 0,
              F.element_at(F.array_sort(by_px(sized)), -1))
        .when(F.size(cands) > 0,
              F.struct(F.lit(None).cast("long").alias("px"),
                       F.element_at(cands, 1)["u"].alias("u")))
    )
    return F.when(
        pick.isNotNull(),
        F.struct(
            resolve(pick["u"]).alias("icon_url"),
            pick["px"].alias("declared_px"),
            F.lit("link").alias("source"),
        ),
    ).otherwise(
        F.struct(
            F.concat(authority, F.lit("/favicon.ico")).alias("icon_url"),
            F.lit(None).cast("long").alias("declared_px"),
            F.lit("default").alias("source"),
        )
    )


def hidden_links(body: Column) -> Column:
    """Honeypot link extraction — anchors a human cannot see
    (``style="display:none"`` / ``visibility:hidden`` on the anchor
    itself, or ``hidden`` attribute): sites plant these to catch naive
    bots, and following one flags the crawler (and often poisons the
    session).  The frontier must SUBTRACT these from expansion the same
    way it subtracts rel=nofollow.  Returns array<string> of hrefs.
    JVM regexp over anchor tags; inline-style detection only (computed
    CSS needs a browser — the headless stage handles stylesheet-hidden
    links).
    """
    tags = F.regexp_extract_all(
        body,
        F.lit(r'(?is)<a(?=\s)[^>]*?(?:style\s*=\s*"[^"]*'
              r'(?:display\s*:\s*none|visibility\s*:\s*hidden)[^"]*"'
              r'|\shidden(?:\s|>|=))[^>]*>'),
        0,
    )
    return F.filter(
        F.transform(
            tags,
            lambda t: F.regexp_extract(t, r'(?i)href\s*=\s*"([^"]*)"', 1),
        ),
        lambda u: u != "",
    )


def sitemap_video_entries(body: Column) -> Column:
    """Video-sitemap extraction (sitemaps.org video extension):
    per <url> block, the page <loc> with every <video:video> child's
    content_loc / title / duration — the media-crawl analog of
    :func:`sitemap_image_entries`, same block-split alignment
    discipline.  Returns array<struct<page_url, video_url, title,
    duration_s:long>>.
    """
    blocks = F.split(body, "<url>")
    per_block = F.transform(
        blocks,
        lambda seg: F.transform(
            F.arrays_zip(
                F.regexp_extract_all(
                    seg,
                    F.lit(r"(?s)<video:content_loc>\s*(.*?)"
                          r"\s*</video:content_loc>"), 1
                ).alias("video_url"),
                F.regexp_extract_all(
                    seg,
                    F.lit(r"(?s)<video:title>\s*(.*?)\s*</video:title>"), 1
                ).alias("title"),
                F.regexp_extract_all(
                    seg,
                    F.lit(r"(?s)<video:duration>\s*(\d+)"
                          r"\s*</video:duration>"), 1
                ).alias("duration"),
            ),
            lambda z: F.struct(
                F.regexp_extract(seg, r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
                 .alias("page_url"),
                z["video_url"].alias("video_url"),
                z["title"].alias("title"),
                z["duration"].cast("long").alias("duration_s"),
            ),
        ),
    )
    return F.flatten(F.filter(per_block, lambda a: F.size(a) > 0))


def feed_enclosures(body: Column) -> Column:
    """RSS ``<enclosure url type length>`` extraction — the podcast /
    media-payload side of feed ingestion (:func:`feed_items` gives the
    article links; enclosures give the audio/video files with declared
    MIME type and byte size, which feeds straight into the byte-budget
    wave).  Per-item block alignment as everywhere.  Returns
    array<struct<item_url, media_url, media_type, length_bytes:long>>.
    """
    items = F.regexp_extract_all(body, F.lit(r"(?is)<item>.*?</item>"), 0)
    per_item = F.transform(
        items,
        lambda it: F.struct(
            F.regexp_extract(it, r"(?is)<link>\s*(.*?)\s*</link>", 1)
             .alias("item_url"),
            F.regexp_extract(
                it, r'(?i)<enclosure\s[^>]*url\s*=\s*"([^"]*)"', 1)
             .alias("media_url"),
            F.regexp_extract(
                it, r'(?i)<enclosure\s[^>]*type\s*=\s*"([^"]*)"', 1)
             .alias("media_type"),
            F.nullif(
                F.regexp_extract(
                    it, r'(?i)<enclosure\s[^>]*length\s*=\s*"(\d+)"', 1),
                F.lit(""),
            ).cast("long").alias("length_bytes"),
        ),
    )
    return F.filter(per_item, lambda e: e["media_url"] != "")


# ---------------------------------------------------------------------------
# resolution-variant image-URL folding

_VARIANT_EXTS = "jpg|jpeg|png|webp"
# the three suffix conventions CDNs/CMSes put between stem and extension
_VARIANT_RX = (
    rf"(-\d{{2,4}}x\d{{2,4}}|_\d{{2,4}}w|@[23]x)(\.(?:{_VARIANT_EXTS}))$"
)
_ORIGINAL_RANK = 1_000_000_000


def fold_image_variants(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Fold resolution-variant image URLs onto one canonical fetch.

    Image CDNs serve the same asset under many URLs — WordPress-style
    ``stem-300x200.jpg`` crops, width descriptors ``stem_640w.jpg``
    (the srcset convention applied to filenames), and DPR editions
    ``stem@2x.jpg``.  Fetching every edition multiplies image-frontier
    volume by the variant count for zero new pixels (reference analog:
    GetLink's URL normalization only folds query/fragment variants,
    src/Steps/Html/GetLink.php:43-288 — filename editions pass through).

    Per stem keep ONE url by declared-resolution rank:
    ``@kx`` DPR editions (k x the design size, the largest pixels) >
    the unsuffixed original > the largest declared downscale width.

    Apply AFTER URL canonicalization: the suffix patterns anchor at the
    end of the path, so a trailing query string (already sorted/stripped
    by canon.canonicalize_expr upstream) would otherwise hide an edition.

    Plan: narrow regex projections + one map-side-combined groupBy on the
    stem (max_by struct) — no window, no shuffle beyond the one exact
    groupBy; hot stems are impossible by construction (a stem's family is
    the handful of editions a page declares).
    """
    u = F.col(url_col)
    wp_w = F.regexp_extract(u, rf"-(\d{{2,4}})x\d{{2,4}}\.(?:{_VARIANT_EXTS})$", 1)
    desc_w = F.regexp_extract(u, rf"_(\d{{2,4}})w\.(?:{_VARIANT_EXTS})$", 1)
    dpr = F.regexp_extract(u, rf"@([23])x\.(?:{_VARIANT_EXTS})$", 1)
    rank = (
        F.when(dpr != "", dpr.cast("long") * _ORIGINAL_RANK)
        .when(wp_w != "", wp_w.cast("long"))
        .when(desc_w != "", desc_w.cast("long"))
        .otherwise(F.lit(_ORIGINAL_RANK))
    )
    stem = F.regexp_replace(u, _VARIANT_RX, "$2")
    return (
        urls.select(stem.alias("stem"), u.alias("__u"), rank.alias("__r"))
        .groupBy("stem")
        .agg(
            F.count("*").cast("long").alias("n_variants"),
            F.max_by("__u", F.struct(F.col("__r"), F.col("__u"))).alias(
                "chosen_url"
            ),
            F.max("__r").cast("long").alias("chosen_rank"),
        )
    )


def img_fetch_priority(body: Column) -> Column:
    """Per-image fetch priority from the page's own hints — the order an
    image frontier should schedule a page's assets (browser resource
    prioritization, WHATWG fetchpriority + loading attributes):

    - ``fetchpriority="high"``            -> 0 (author-declared LCP)
    - first image without contrary hints  -> 1 (likely LCP candidate)
    - other undecorated images            -> 2
    - ``fetchpriority="low"`` or
      ``loading="lazy"``                  -> 3 (below the fold by intent)

    JVM higher-order functions over regexp_extract_all, same plan family
    as :func:`img_srcset_candidates` — stays in whole-stage codegen next
    to the scan.  Returns array<struct<img_ord:int, url:string,
    priority:int>> in document order.
    """
    tag_arr = F.regexp_extract_all(body, F.lit(r"(?i)<img[^>]*>"), 0)

    def fp_of(tag: Column) -> Column:
        return F.lower(
            F.regexp_extract(tag, r'(?i)\bfetchpriority\s*=\s*"([^"]*)"', 1)
        )

    def lazy_of(tag: Column) -> Column:
        return (
            F.lower(
                F.regexp_extract(tag, r'(?i)\bloading\s*=\s*"([^"]*)"', 1)
            )
            == "lazy"
        )

    # the likely-LCP slot belongs to the FIRST image without contrary
    # hints — not blindly to index 0: a lazy tracking pixel or logo in
    # first position must not eat the hero image's priority
    und_flags = F.transform(
        tag_arr,
        lambda t: (fp_of(t) != "high") & (fp_of(t) != "low") & ~lazy_of(t),
    )
    first_und = F.array_position(und_flags, F.lit(True))  # 1-based, 0=none

    def parse_tag(tag: Column, i: Column) -> Column:
        src = F.regexp_extract(tag, r'(?i)\bsrc\s*=\s*"([^"]*)"', 1)
        fp = fp_of(tag)
        prio = (
            F.when(fp == "high", F.lit(0))
            .when((fp == "low") | lazy_of(tag), F.lit(3))
            .when((i + 1).cast("long") == first_und, F.lit(1))
            .otherwise(F.lit(2))
        )
        return F.struct(
            i.cast("int").alias("img_ord"),
            src.alias("url"),
            prio.cast("int").alias("priority"),
        )

    return F.transform(tag_arr, lambda tag, i: parse_tag(tag, i))


def sitemap_news_entries(body: Column) -> Column:
    """News-sitemap extraction (Google News sitemap extension — the
    third sitemaps.org media extension next to
    :func:`sitemap_image_entries` / :func:`sitemap_video_entries`):
    per <url> block, the page <loc> with the <news:news> child's
    publication name / language / publication_date / title.  News
    sitemaps are the freshness backbone of a crawl — entries younger
    than 2 days, recrawled on a fast cadence — so the frontier needs
    them parsed as typed rows, not raw XML.  Returns
    array<struct<page_url, publication, language, pub_date, title>>.
    Same block-split alignment discipline as the video extension; the
    reference's sitemap step yields whole-block data with no news
    awareness (src/Steps/Sitemap/GetUrlsFromSitemap.php:52-78).
    """
    blocks = F.split(body, "<url>")
    per_block = F.transform(
        blocks,
        lambda seg: F.transform(
            F.arrays_zip(
                F.regexp_extract_all(
                    seg,
                    F.lit(r"(?s)<news:name>\s*(.*?)\s*</news:name>"), 1
                ).alias("publication"),
                F.regexp_extract_all(
                    seg,
                    F.lit(r"(?s)<news:language>\s*(.*?)"
                          r"\s*</news:language>"), 1
                ).alias("language"),
                F.regexp_extract_all(
                    seg,
                    F.lit(r"(?s)<news:publication_date>\s*(.*?)"
                          r"\s*</news:publication_date>"), 1
                ).alias("pub_date"),
                F.regexp_extract_all(
                    seg,
                    F.lit(r"(?s)<news:title>\s*(.*?)\s*</news:title>"), 1
                ).alias("title"),
            ),
            lambda z: F.struct(
                F.regexp_extract(seg, r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
                 .alias("page_url"),
                z["publication"].alias("publication"),
                z["language"].alias("language"),
                z["pub_date"].alias("pub_date"),
                z["title"].alias("title"),
            ),
        ),
    )
    return F.flatten(F.filter(per_block, lambda a: F.size(a) > 0))


def license_signals(body: Column) -> Column:
    """Page license extraction — the rights signal an image+caption
    training pipeline must carry per sample (the LAION-class compliance
    requirement: keep only what the rights metadata permits, and keep
    the evidence).  Three public conventions, most-explicit first:

    1. ``<a rel="license" href=...>`` (the microformats rel-license
       convention),
    2. ``<meta itemprop="license" content=...>`` / schema.org license
       property in the page head,
    3. a JSON-LD ``"license": "<url>"`` member.

    Returns struct<license_url:string, source:string> with source in
    ``rel``/``itemprop``/``jsonld``/``none`` (first match in that
    order).  Pure JVM regexp over the scan; classification of the URL
    into a rights class is :func:`classify_license` so the two stages
    stay independently testable.
    """
    rel = F.regexp_extract(
        body,
        r'(?is)<a\s[^>]*rel\s*=\s*"license"[^>]*href\s*=\s*"([^"]+)"', 1,
    )
    rel2 = F.regexp_extract(
        body,
        r'(?is)<a\s[^>]*href\s*=\s*"([^"]+)"[^>]*rel\s*=\s*"license"', 1,
    )
    itemprop = F.regexp_extract(
        body,
        r'(?is)<meta\s[^>]*itemprop\s*=\s*"license"[^>]*'
        r'content\s*=\s*"([^"]+)"', 1,
    )
    jsonld = F.regexp_extract(
        body, r'(?is)"license"\s*:\s*"([^"]+)"', 1,
    )
    rel_any = F.when(rel != "", rel).otherwise(rel2)
    url = (
        F.when(rel_any != "", rel_any)
        .when(itemprop != "", itemprop)
        .when(jsonld != "", jsonld)
    )
    source = (
        F.when(rel_any != "", "rel")
        .when(itemprop != "", "itemprop")
        .when(jsonld != "", "jsonld")
        .otherwise("none")
    )
    return F.struct(url.alias("license_url"), source.alias("source"))


def classify_license(url: Column) -> Column:
    """Map a license URL to a rights class a curation pipeline can
    filter on: creativecommons.org/licenses/<code>/ -> ``cc-<code>``
    (by, by-sa, by-nc, by-nc-sa, by-nd, by-nc-nd),
    /publicdomain/zero/ -> ``cc0``, /publicdomain/mark/ -> ``pdm``,
    any other URL -> ``other``, null/empty -> ``none``.  The
    train-eligibility call (cc0/pdm/by/by-sa yes, -nc/-nd no) stays at
    the policy layer — this op only normalizes the evidence.
    """
    u = F.lower(F.coalesce(url, F.lit("")))
    cc = F.regexp_extract(
        u, r"creativecommons\.org/licenses/([a-z-]+)/", 1
    )
    return (
        F.when(u == "", "none")
        .when(u.contains("creativecommons.org/publicdomain/zero"), "cc0")
        .when(u.contains("creativecommons.org/publicdomain/mark"), "pdm")
        .when(cc != "", F.concat(F.lit("cc-"), cc))
        .otherwise("other")
    )


def css_background_images(
    pages: DataFrame,
    body_col: str = "body",
) -> DataFrame:
    """CSS ``background-image`` URL extraction — the image references the
    <img>-tag extractors (extract_links/img_srcset_candidates/og_images)
    never see: hero banners, lazy-load placeholders and sprite sheets are
    routinely delivered as ``style="background-image: url(...)"`` inline
    attributes or ``background:`` shorthand inside ``<style>`` blocks.
    The reference's GetLink steps stop at href/src
    (src/Steps/Html/GetLink.php), so an image crawl scoped by them
    under-fetches exactly the highest-weight marketing assets.

    Pure JVM: regexp_extract_all over the raw HTML for ``url(...)``
    tokens inside (a) style attributes and (b) <style> elements;
    quotes stripped, ``data:`` URIs excluded (they carry no fetch).
    Returns one row per (page, occurrence): (doc/ord lineage columns
    pass through, css_url, css_source 'inline'|'style_block').
    """
    b = F.col(body_col)
    url_in = r"url\(\s*['\"]?([^'\")\s]+)['\"]?\s*\)"
    inline = F.regexp_extract_all(
        b,
        F.lit(r"(?is)style\s*=\s*\"[^\"]*?" + url_in + r"[^\"]*?\""),
        1,
    )
    blocks = F.array_compact(F.flatten(F.transform(
        F.regexp_extract_all(
            b, F.lit(r"(?is)<style[^>]*>(.*?)</style>"), 1),
        lambda css: F.regexp_extract_all(css, F.lit(url_in), 1),
    )))
    pairs = F.concat(
        F.transform(inline, lambda u: F.struct(
            u.alias("css_url"), F.lit("inline").alias("css_source"))),
        F.transform(blocks, lambda u: F.struct(
            u.alias("css_url"), F.lit("style_block").alias("css_source"))),
    )
    keep = [c for c in pages.columns if c != body_col]
    return (
        pages.select(*keep, F.explode(pairs).alias("__c"))
        .select(*keep, F.col("__c.css_url").alias("css_url"),
                F.col("__c.css_source").alias("css_source"))
        .filter(~F.col("css_url").startswith("data:"))
    )


def mixed_content_audit(
    pages: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
) -> DataFrame:
    """Mixed-content audit for https pages: plaintext ``http://``
    subresources, split into the two classes browsers distinguish
    (MDN/W3C mixed-content spec) — BLOCKABLE (script / stylesheet
    link: never loaded, so the fetch scheduler must not even queue
    them) and UPGRADABLE (img / audio / video: browsers rewrite to
    https, so the crawler should fetch the https twin and record the
    upgrade).  An image crawl that ignores this either wastes fetches
    on URLs no browser would load or misses the pixels browsers
    actually display.

    Pure JVM: regexp_extract_all per tag class over the raw HTML;
    http pages pass through with zeros (mixed content is defined
    only on secure contexts).  Returns one row per page:
    (.. lineage .., n_blockable, n_upgradable, upgraded array —
    the https rewrites of the upgradable URLs, fetch candidates).
    """
    b = F.col(body_col)
    https_page = F.col(url_col).startswith("https://")
    script = F.regexp_extract_all(
        b, F.lit(r"(?i)<script[^>]*\ssrc\s*=\s*[\"'](http://[^\"']+)"), 1)
    sheet = F.regexp_extract_all(
        b, F.lit(r"(?i)<link[^>]*\shref\s*=\s*[\"'](http://[^\"']+)"), 1)
    media = F.regexp_extract_all(
        b, F.lit(r"(?i)<(?:img|audio|video|source)[^>]*"
                 r"\ssrc\s*=\s*[\"'](http://[^\"']+)"), 1)
    empty = F.array().cast("array<string>")
    blockable = F.when(https_page, F.concat(script, sheet)).otherwise(empty)
    upgradable = F.when(https_page, media).otherwise(empty)
    keep = [c for c in pages.columns if c != body_col]
    return pages.select(
        *keep,
        F.size(blockable).cast("long").alias("n_blockable"),
        F.size(upgradable).cast("long").alias("n_upgradable"),
        F.transform(
            upgradable,
            lambda u: F.concat(F.lit("https://"), F.substring(u, 8, 100000)),
        ).alias("upgraded"),
    )


def html_tables(body: Column) -> Column:
    """Extract HTML <table> contents as array<struct<table_ord:int,
    row_ord:int, col_ord:int, cell:string>> — the tabular payload an
    LLM-data pipeline either converts to markdown or drops (tables are
    the #1 source of low-quality linearized text; either way it must
    FIND them first).  The reference's DomQuery can select cells one
    selector at a time (src/Steps/Dom/DomQuery.php); this emits every
    cell of every table positionally in one pass.

    Pure JVM expressions (same regex discipline as the rest of the
    extraction layer — no HTML parser in the container): split on
    <table boundaries, per table split rows on <tr, per row pull
    <td>/<th> bodies, strip residual tags, collapse whitespace.
    Nested tables are out of scope (flagged upstream by tag-balance
    audits); header cells count as cells.
    """
    tables = F.slice(
        F.split(body, r"(?i)<table[\s>]"), 2, 1 << 20)
    rows_of = lambda t: F.slice(
        F.split(F.substring_index(t, "</table", 1), r"(?i)<tr[\s>]"),
        2, 1 << 20)
    cells_of = lambda r: F.transform(
        F.regexp_extract_all(
            F.substring_index(r, "</tr", 1),
            F.lit(r"(?is)<t[dh][^>]*>(.*?)</t[dh]\s*>"), 1),
        lambda c: F.trim(F.regexp_replace(
            F.regexp_replace(c, r"(?s)<[^>]*>", " "), r"\s+", " ")),
    )
    per_table = F.transform(
        tables,
        lambda t, ti: F.transform(
            rows_of(t),
            lambda r, ri: F.transform(
                cells_of(r),
                lambda c, ci: F.struct(
                    ti.cast("int").alias("table_ord"),
                    ri.cast("int").alias("row_ord"),
                    ci.cast("int").alias("col_ord"),
                    c.alias("cell"),
                ),
            ),
        ),
    )
    return F.flatten(F.flatten(per_table))


def sri_audit(body: Column) -> Column:
    """Subresource-Integrity audit of a page (W3C SRI): count the
    <script src> and rel=stylesheet <link> subresources, how many
    carry an ``integrity`` attribute, and which hash algorithms
    appear.  For a crawler building a training corpus this is a page
    trust signal (SRI-disciplined sites are maintained sites) and,
    combined with the mixed-content audit, the transport-security
    triage for re-hosting page snapshots.

    Pure JVM regex (same discipline as the extraction layer).
    Returns struct<n_subresources:int, n_with_sri:int,
    algos:array<string>> — algos sorted distinct among
    sha256/sha384/sha512.
    """
    scripts = F.regexp_extract_all(
        body, F.lit(r"(?is)<script\b[^>]*\bsrc\s*=[^>]*>"), 0)
    links = F.regexp_extract_all(
        body,
        F.lit(r"(?is)<link\b[^>]*rel\s*=\s*[\"']?stylesheet[^>]*>"), 0)
    tags = F.concat(scripts, links)
    with_sri = F.filter(
        tags, lambda t: t.rlike(r"(?i)\bintegrity\s*=\s*[\"']sha"))
    algos = F.array_sort(F.array_distinct(F.flatten(F.transform(
        with_sri,
        lambda t: F.regexp_extract_all(
            t, F.lit(r"(?i)\b(sha256|sha384|sha512)-"), 1),
    ))))
    return F.struct(
        F.size(tags).cast("int").alias("n_subresources"),
        F.size(with_sri).cast("int").alias("n_with_sri"),
        algos.alias("algos"),
    )


def heading_outline(body: Column) -> Column:
    """Heading outline audit — the h1..h6 sequence in document order
    plus the structural violations quality raters look at: missing
    h1, multiple h1s, and level SKIPS (h2 -> h4) that mark generated
    or scraped markup.  Clean outlines correlate with hand-authored
    content; an LLM-data pipeline uses this as a cheap page-structure
    prior next to the text-ratio signals.

    Pure JVM: one regexp pass for the tags, HOF fold for the maximum
    downward jump.  Returns struct<levels:array<int>, n_h1:int,
    max_skip:int, well_formed:boolean> — well_formed = exactly one
    h1, no skip > 1.
    """
    levels = F.transform(
        F.regexp_extract_all(body, F.lit(r"(?i)<h([1-6])[\s>]"), 1),
        lambda s: s.cast("int"),
    )
    n_h1 = F.size(F.filter(levels, lambda x: x == 1)).cast("int")
    jumps = F.when(
        F.size(levels) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(levels) - 1),
            lambda i: F.get(levels, i) - F.get(levels, i - 1),
        ),
    ).otherwise(F.array().cast("array<int>"))
    max_skip = F.greatest(
        F.lit(0),
        F.aggregate(jumps, F.lit(0),
                    lambda acc, j: F.greatest(acc, j)),
    ).cast("int")
    return F.struct(
        levels.alias("levels"),
        n_h1.alias("n_h1"),
        max_skip.alias("max_skip"),
        ((n_h1 == 1) & (max_skip <= 1)).alias("well_formed"),
    )


def picture_sources(body: Column) -> Column:
    """<picture> responsive-source extraction — the modern-format
    negotiation that happens in MARKUP rather than Accept headers:
    each <picture> lists <source type="image/avif|webp" ...> in
    priority order with an <img> fallback, and a crawler harvesting
    image+caption pairs must fetch the variant a real client would
    pick, or it archives a JPEG while users see the AVIF.

    Per <picture> block (split + regex, same discipline as
    html_tables): the ordered source types and srcsets plus the
    fallback <img src>.  Returns array<struct<pic_ord:int,
    source_ord:int, mime:string, url:string>> — the fallback rides as
    mime 'fallback' with source_ord after the sources.
    """
    pics = F.slice(F.split(body, r"(?i)<picture[\s>]"), 2, 1 << 20)

    def per_pic(p: Column, pi: Column) -> Column:
        block = F.substring_index(p, "</picture", 1)
        srcs = F.regexp_extract_all(
            block,
            F.lit(r'(?is)<source[^>]*type\s*=\s*["\']([^"\']+)["\']'
                  r'[^>]*srcset\s*=\s*["\']([^"\',\s]+)'), 0)
        parsed = F.transform(
            srcs,
            lambda tag, si: F.struct(
                pi.cast("int").alias("pic_ord"),
                si.cast("int").alias("source_ord"),
                F.regexp_extract(
                    tag, r'(?i)type\s*=\s*["\']([^"\']+)["\']', 1)
                .alias("mime"),
                F.regexp_extract(
                    tag, r'(?i)srcset\s*=\s*["\']([^"\',\s]+)', 1)
                .alias("url"),
            ),
        )
        fb = F.regexp_extract(
            block, r'(?is)<img[^>]*src\s*=\s*["\']([^"\']+)["\']', 1)
        fb_struct = F.when(
            fb != "",
            F.array(F.struct(
                pi.cast("int").alias("pic_ord"),
                F.size(srcs).cast("int").alias("source_ord"),
                F.lit("fallback").alias("mime"),
                fb.alias("url"),
            )),
        ).otherwise(F.array().cast(
            "array<struct<pic_ord:int,source_ord:int,"
            "mime:string,url:string>>"))
        return F.concat(parsed, fb_struct)

    return F.flatten(F.transform(pics, per_pic))


def iframe_audit(body: Column, page_host: Column) -> Column:
    """Iframe embed audit — third-party iframes are where ads,
    trackers and consent walls live, and a page that is MOSTLY
    iframes has no first-party content worth training on.  Counts
    embeds, how many are third-party (src host differs from the
    page's), and how many carry a ``sandbox`` attribute (the
    trust-boundary signal).

    Pure regex.  Returns struct<n_iframes:int, n_third_party:int,
    n_sandboxed:int>.
    """
    tags = F.regexp_extract_all(
        body, F.lit(r"(?is)<iframe\b[^>]*>"), 0)
    src_host = lambda t: F.lower(F.regexp_extract(
        t, r'(?i)src\s*=\s*["\'][a-z]+://([^/"\':]+)', 1))
    third = F.filter(
        tags,
        lambda t: (src_host(t) != "")
        & (src_host(t) != F.lower(page_host)),
    )
    sandboxed = F.filter(
        tags, lambda t: t.rlike(r"(?i)\bsandbox\b"))
    return F.struct(
        F.size(tags).cast("int").alias("n_iframes"),
        F.size(third).cast("int").alias("n_third_party"),
        F.size(sandboxed).cast("int").alias("n_sandboxed"),
    )


REFERRER_POLICIES = (
    "no-referrer", "no-referrer-when-downgrade", "origin",
    "origin-when-cross-origin", "same-origin", "strict-origin",
    "strict-origin-when-cross-origin", "unsafe-url",
)


def referrer_policy_audit(body: Column) -> Column:
    """Referrer-policy audit (W3C Referrer Policy): which policy the
    page declares via <meta name="referrer">, whether it is a KNOWN
    token, and whether it leaks full URLs cross-origin
    (``unsafe-url``, or the legacy default
    ``no-referrer-when-downgrade`` which sends the full referrer to
    any https target) — for a crawler that republishes page snapshots
    the leaky policies mark pages whose URLs were probably visible to
    third parties.

    Returns struct<declared:string, known:boolean, leaky:boolean> —
    declared NULL when absent (UAs then default to
    strict-origin-when-cross-origin, which is not leaky).
    """
    raw = F.lower(F.regexp_extract(
        body,
        r'(?is)<meta\s[^>]*name\s*=\s*["\']referrer["\'][^>]*'
        r'content\s*=\s*["\']([^"\']*)["\']', 1))
    declared = F.when(raw != "", raw)
    known = declared.isin(*REFERRER_POLICIES)
    leaky = declared.isin("unsafe-url", "no-referrer-when-downgrade")
    return F.struct(
        declared.alias("declared"),
        F.when(declared.isNotNull(), known).alias("known"),
        F.coalesce(leaky, F.lit(False)).alias("leaky"),
    )


def srcset_sizes_select(
    srcset: Column,
    sizes: Column,
    viewport_px: int = 430,
    dpr_centi: int = 100,
) -> Column:
    """Evaluate an <img sizes>/<srcset> pair the way a browser does at
    layout time — the step :func:`img_srcset_candidates` leaves to the
    client: the ``sizes`` attribute is an ordered list of
    ``(media-condition) length`` clauses (first matching wins, last
    clause unconditional), the chosen slot width times the device
    pixel ratio picks the smallest w-descriptor candidate that still
    covers it.  Supported conditions: ``(max-width: Npx)`` /
    ``(min-width: Npx)``; lengths ``Nvw`` / ``Npx`` (the forms that
    cover real-world markup).

    Pure JVM HOFs; DPR in centi-units keeps the slot math integer.
    Returns struct<slot_px:long, need_px:long, chosen_url:string,
    chosen_w:long> — chosen NULL when srcset has no w-descriptor
    covering the need and no larger fallback (callers then take the
    largest available).
    """
    clauses = F.transform(
        F.split(sizes, ","),
        lambda c: F.struct(
            F.nullif(F.regexp_extract(
                c, r"\(max-width:\s*(\d+)px\)", 1), F.lit(""))
            .cast("long").alias("maxw"),
            F.nullif(F.regexp_extract(
                c, r"\(min-width:\s*(\d+)px\)", 1), F.lit(""))
            .cast("long").alias("minw"),
            F.nullif(F.regexp_extract(
                c, r"(\d+)\s*vw", 1), F.lit("")).cast("long")
            .alias("vw"),
            F.nullif(F.regexp_extract(
                c, r"(\d+)\s*px(?!\))", 1), F.lit("")).cast("long")
            .alias("px"),
        ),
    )
    vp = F.lit(int(viewport_px))
    matching = F.filter(
        clauses,
        lambda cl: (
            (cl["maxw"].isNull() | (vp <= cl["maxw"]))
            & (cl["minw"].isNull() | (vp >= cl["minw"]))
        ),
    )
    first = F.get(matching, 0)
    slot = F.coalesce(
        first["px"],
        (first["vw"] * vp / 100).cast("long"),
        vp,
    )
    need = (slot * int(dpr_centi) / 100).cast("long")
    cands = F.transform(
        F.split(srcset, ","),
        lambda c: F.struct(
            F.regexp_extract(F.trim(c), r"^(\S+)", 1).alias("url"),
            F.nullif(F.regexp_extract(F.trim(c), r"\s(\d+)w$", 1),
                     F.lit("")).cast("long").alias("w"),
        ),
    )
    covering = F.filter(
        cands, lambda c: c["w"].isNotNull() & (c["w"] >= need))
    chosen = F.get(
        F.array_sort(
            covering,
            lambda a, b: F.when(a["w"] < b["w"], -1)
            .when(a["w"] > b["w"], 1).otherwise(0),
        ),
        0,
    )
    return F.struct(
        slot.alias("slot_px"),
        need.alias("need_px"),
        chosen["url"].alias("chosen_url"),
        chosen["w"].alias("chosen_w"),
    )


def webmanifest_icons(manifest_json: Column) -> Column:
    """Web-app-manifest icon extraction — the PWA manifest's icons
    array is the richest favicon source a crawler gets (explicit
    sizes + purpose), and the declared ``name`` is a site-title
    candidate cleaner than <title> tag soup.  JSON parsing stays
    JVM-side (from_json on the fields used — no UDF).

    Returns struct<name:string, n_icons:int, best_icon_src:string,
    best_icon_px:long> — best = the icon with the largest declared
    square size; icons without a parseable size lose to any sized
    one.
    """
    schema = ("struct<name:string,"
              "icons:array<struct<src:string,sizes:string>>>")
    parsed = F.from_json(manifest_json, schema)
    icons = F.coalesce(
        parsed["icons"],
        F.array().cast("array<struct<src:string,sizes:string>>"))
    sized = F.transform(
        icons,
        lambda i: F.struct(
            F.coalesce(
                F.nullif(F.regexp_extract(i["sizes"], r"^(\d+)x\d+", 1),
                         F.lit("")).cast("long"),
                F.lit(-1).cast("long"),
            ).alias("px"),
            i["src"].alias("src"),
        ),
    )
    best = F.get(F.reverse(F.array_sort(sized)), 0)
    return F.struct(
        parsed["name"].alias("name"),
        F.size(icons).cast("int").alias("n_icons"),
        best["src"].alias("best_icon_src"),
        F.when(best["px"] >= 0, best["px"]).alias("best_icon_px"),
    )


def title_template_suffix(
    pages: "DataFrame",
    host_col: str = "host",
    title_col: str = "title",
    min_pages: int = 3,
    min_suffix_len: int = 4,
) -> "DataFrame":
    """Per-host title-template mining — CMS templates append a site
    suffix to every <title> (``Article Name - Example News``), and
    stripping it yields the clean document titles a caption/metadata
    pipeline wants.  The longest common SUFFIX across a host's titles
    falls out of a classic trick: reverse the titles, and the longest
    common prefix of the lexicographic MIN and MAX reversed strings
    equals the common prefix of ALL of them — so two min/max
    aggregates replace any pairwise comparison.

    The LCP length itself is one JVM HOF (count of leading equal
    positions).  Hosts under ``min_pages`` or with an LCP shorter
    than ``min_suffix_len`` report suffix NULL (no confident
    template).  Returns (host, n_pages, template_suffix, suffix_len).
    """
    from pyspark.sql import DataFrame  # noqa: F401

    r = F.reverse(F.col(title_col))
    agg = pages.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.min(r).alias("__lo"),
        F.max(r).alias("__hi"),
    )
    lo, hi = F.col("__lo"), F.col("__hi")
    upto = F.least(F.length(lo), F.length(hi))
    eqs = F.filter(
        F.sequence(F.lit(1), upto.cast("int")),
        lambda i: F.substring(lo, 1, i.cast("int"))
        == F.substring(hi, 1, i.cast("int")),
    )
    lcp = F.coalesce(F.array_max(eqs), F.lit(0)).cast("long")
    suffix = F.reverse(F.substring(lo, 1, lcp.cast("int")))
    ok = (F.col("n_pages") >= int(min_pages)) & (
        lcp >= int(min_suffix_len))
    return agg.select(
        "host", "n_pages",
        F.when(ok, suffix).alias("template_suffix"),
        F.when(ok, lcp).alias("suffix_len"),
    )


def svg_security_audit(body: Column) -> Column:
    """SVG active-content audit — SVG is XML that executes: <script>
    blocks, on* event handlers, <foreignObject> (arbitrary HTML), and
    external href loads all run when an SVG is INLINED into a page,
    so a crawler re-hosting crawled vector images must know which are
    passive drawings and which are programs (the reason GitHub et al.
    serve user SVGs from sandboxed domains).

    Pure regex counts.  Returns struct<n_scripts:int,
    n_event_handlers:int, n_foreign_objects:int, n_external_refs:int,
    passive:boolean>.
    """
    n_scripts = F.size(F.regexp_extract_all(
        body, F.lit(r"(?is)<script\b"), 0)).cast("int")
    n_handlers = F.size(F.regexp_extract_all(
        body, F.lit(r"(?i)\son[a-z]+\s*="), 0)).cast("int")
    n_foreign = F.size(F.regexp_extract_all(
        body, F.lit(r"(?is)<foreignObject\b"), 0)).cast("int")
    n_ext = F.size(F.regexp_extract_all(
        body,
        F.lit(r"(?i)\b(?:xlink:)?href\s*=\s*[\"']https?://"), 0)
    ).cast("int")
    passive = ((n_scripts == 0) & (n_handlers == 0)
               & (n_foreign == 0) & (n_ext == 0))
    return F.struct(
        n_scripts.alias("n_scripts"),
        n_handlers.alias("n_event_handlers"),
        n_foreign.alias("n_foreign_objects"),
        n_ext.alias("n_external_refs"),
        passive.alias("passive"),
    )


def price_extract(body: Column) -> Column:
    """Price mention extraction — the cheap commerce-page classifier:
    how many money amounts a page shows, in which currency, and the
    min/max (a product page shows one tight cluster, a category page
    dozens, an article usually none).  Handles $/€/£ prefix forms
    with thousands separators and suffix ISO codes (``129.00 USD``).

    Amounts in MICROS (integer, 10^-6 units) to dodge float money.
    Returns struct<n_prices:int, currency:string — the modal symbol,
    min_micros:long, max_micros:long>; currency NULL when no price.
    """
    pat = (r"(?:([$€£])\s?(\d{1,3}(?:,\d{3})*(?:\.\d{1,2})?)"
           r"|(\d{1,3}(?:,\d{3})*(?:\.\d{1,2})?)\s?(USD|EUR|GBP))")
    hits = F.regexp_extract_all(body, F.lit(pat), 0)
    parse_amt = lambda h: F.regexp_replace(
        F.regexp_extract(h, r"(\d{1,3}(?:,\d{3})*(?:\.\d{1,2})?)", 1),
        ",", "").cast("decimal(18,6)")
    micros = F.transform(
        hits, lambda h: (parse_amt(h) * 1_000_000).cast("long"))
    syms = F.transform(
        hits,
        lambda h: F.coalesce(
            F.nullif(F.regexp_extract(h, r"^([$€£])", 1), F.lit("")),
            F.regexp_extract(h, r"(USD|EUR|GBP)$", 1),
        ),
    )
    # modal symbol: count per distinct symbol via nested filter
    modal = F.get(
        F.array_sort(
            F.transform(
                F.array_distinct(syms),
                lambda s: F.struct(
                    (-F.size(F.filter(syms, lambda x: x == s)))
                    .alias("negc"),
                    s.alias("s"),
                ),
            )
        ),
        0,
    )["s"]
    return F.struct(
        F.size(hits).cast("int").alias("n_prices"),
        F.when(F.size(hits) > 0, modal).alias("currency"),
        F.array_min(micros).alias("min_micros"),
        F.array_max(micros).alias("max_micros"),
    )


def ld_breadcrumbs(body: Column) -> Column:
    """JSON-LD BreadcrumbList extraction — the page's declared place
    in the site hierarchy (depth + leaf name), which doubles as a
    caption-context source ("Electronics > Cameras > X100") and a
    crawl-scoping signal (depth-1 pages are hubs).  Parses the first
    ld+json block whose @type is BreadcrumbList with from_json on the
    fields used; no UDF.

    Returns struct<depth:int, leaf_name:string, trail:string> — NULLs
    when the page declares none.
    """
    block = F.regexp_extract(
        body,
        r'(?is)<script[^>]*type\s*=\s*["\']application/ld\+json["\']'
        r"[^>]*>(.*?)</script>", 1)
    schema = ("struct<`@type`:string,itemListElement:array<"
              "struct<position:int,name:string>>>")
    parsed = F.from_json(block, schema)
    is_bc = parsed["@type"] == "BreadcrumbList"
    items = F.when(is_bc, parsed["itemListElement"])
    names = F.transform(
        F.array_sort(
            F.transform(items, lambda i: F.struct(
                i["position"].alias("p"), i["name"].alias("n")))),
        lambda s: s["n"],
    )
    return F.struct(
        F.when(is_bc, F.size(items)).cast("int").alias("depth"),
        F.when(is_bc, F.element_at(names, -1)).alias("leaf_name"),
        F.when(is_bc, F.array_join(names, " > ")).alias("trail"),
    )


def form_audit(body: Column) -> Column:
    """Page form-function audit: login (password input), search (a
    q/search text input), newsletter (lone email input), upload
    (file input) — the page-function router that keeps login walls
    and search results OUT of a training corpus (both are
    crawl-traps: infinite personalized variants, no durable content).

    Pure regex per form-relevant input type.  Returns
    struct<n_forms:int, has_login:boolean, has_search:boolean,
    has_upload:boolean, has_email_capture:boolean>.
    """
    forms = F.size(F.regexp_extract_all(
        body, F.lit(r"(?i)<form\b"), 0)).cast("int")
    has = lambda p: F.size(F.regexp_extract_all(body, F.lit(p), 0)) > 0
    login = has(r"(?i)<input[^>]*type\s*=\s*[\"']?password")
    search = has(r"(?i)<input[^>]*name\s*=\s*[\"']?(q|s|query|search)\b")
    upload = has(r"(?i)<input[^>]*type\s*=\s*[\"']?file")
    email = has(r"(?i)<input[^>]*type\s*=\s*[\"']?email")
    return F.struct(
        forms.alias("n_forms"),
        login.alias("has_login"),
        search.alias("has_search"),
        upload.alias("has_upload"),
        (email & ~login).alias("has_email_capture"),
    )


def access_barriers(body: Column) -> Column:
    """Access-barrier detection — the four walls that make a fetched
    page WORTHLESS as training data even though the fetch returned
    200: an anti-bot challenge interstitial (Cloudflare chl markers,
    reCAPTCHA/hCaptcha embeds), a paywall (Schema.org
    ``isAccessibleForFree: false``, common paywall container ids), a
    cookie-consent manager wall (OneTrust/Cookiebot/Didomi CMP
    scripts), and an RTA adult-content rating.  A crawl-quality
    dashboard tracks these rates per host; the curator drops or
    re-fetches accordingly.

    Pure regex presence tests.  Returns struct<challenge:boolean,
    paywall:boolean, consent_cmp:boolean, rta_rated:boolean,
    clean:boolean>.
    """
    has = lambda p: F.size(F.regexp_extract_all(body, F.lit(p), 0)) > 0
    challenge = has(
        r"(?i)(cf-chl|cf_chl|challenge-platform|www\.google\.com/"
        r"recaptcha|hcaptcha\.com/1/api\.js|cf-turnstile)")
    paywall = has(
        r'(?i)("isAccessibleForFree"\s*:\s*"?false|id="?paywall'
        r"|piano\.io|tinypass\.com)")
    consent = has(
        r"(?i)(otSDKStub|cookielaw\.org|consent\.cookiebot\.com"
        r"|sdk\.privacy-center\.org|didomi)")
    rta = has(r"RTA-5042-1996-1400-1577-RTA")
    clean = ~(challenge | paywall | consent | rta)
    return F.struct(
        challenge.alias("challenge"),
        paywall.alias("paywall"),
        consent.alias("consent_cmp"),
        rta.alias("rta_rated"),
        clean.alias("clean"),
    )


def link_rel_rollup(body: Column) -> Column:
    """Outlink rel-attribute rollup — the page's endorsement profile:
    what share of its <a> links carry ``nofollow`` / ``ugc`` /
    ``sponsored`` (Google's link-intent taxonomy).  A page whose links
    are mostly sponsored is an advertorial; mostly-ugc marks forums
    and comment sections — both route differently in a quality mix,
    and the FOLLOWED remainder is what the link graph should weight.

    One anchor-tag pass, per-rel filtered counts.  Returns
    struct<n_links:int, n_nofollow:int, n_ugc:int, n_sponsored:int,
    followed_permille:long> — NULL permille for linkless pages.
    """
    anchors = F.regexp_extract_all(
        body, F.lit(r"(?is)<a\b[^>]*>"), 0)
    rel_of = lambda t: F.lower(F.regexp_extract(
        t, r'(?i)\brel\s*=\s*["\']([^"\']*)["\']', 1))
    cnt = lambda token: F.size(F.filter(
        anchors,
        lambda t: rel_of(t).rlike(r"(^|\s)" + token + r"(\s|$)")))
    n = F.size(anchors)
    n_nf, n_ugc, n_sp = cnt("nofollow"), cnt("ugc"), cnt("sponsored")
    followed = F.filter(
        anchors,
        lambda t: ~rel_of(t).rlike(r"(^|\s)(nofollow|ugc|sponsored)(\s|$)"),
    )
    return F.struct(
        n.cast("int").alias("n_links"),
        n_nf.cast("int").alias("n_nofollow"),
        n_ugc.cast("int").alias("n_ugc"),
        n_sp.cast("int").alias("n_sponsored"),
        F.when(n > 0, (F.size(followed) * 1000 / n)).cast("long")
        .alias("followed_permille"),
    )


def microdata_summary(html: Column) -> Column:
    """Schema.org MICRODATA surface summary (the attribute-based sibling
    of the JSON-LD path that ``Html::schemaOrg`` covers —
    reference src/Steps/Html/SchemaOrg.php handles only ld+json; the
    microdata vocabulary rides ``itemscope``/``itemtype``/``itemprop``
    attributes instead): struct(n_itemscopes, first_itemtype, n_props,
    n_distinct_props).  Counting is regex-level over tags (this
    container's no-lxml discipline): an ``itemprop`` outside any
    ``itemscope`` still counts toward n_props — disclosed flat-harvest
    semantics, nesting is not resolved.

    Pure JVM regexp expressions; narrow map, fuses into the scan.
    """
    h = F.coalesce(html, F.lit(""))
    n_scopes = F.size(
        F.regexp_extract_all(h, F.lit(r"<[^>]*\sitemscope(?=[\s>/])"), 0)
    ).cast("int")
    first_type = F.nullif(
        F.regexp_extract(h, r'\sitemtype="([^"]*)"', 1), F.lit("")
    )
    props = F.regexp_extract_all(h, F.lit(r'\sitemprop="([^"]*)"'), 1)
    return F.struct(
        n_scopes.alias("n_itemscopes"),
        first_type.alias("first_itemtype"),
        F.size(props).cast("int").alias("n_props"),
        F.size(F.array_distinct(props)).cast("int").alias("n_distinct_props"),
    )


_VOID_ELEMENTS = [
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
]


def dom_depth_stats(html: Column) -> Column:
    """Maximum element-nesting depth + tag accounting from one tag scan
    — the structural-complexity signal for render-cost triage and
    template clustering (a 60-deep <div> pyramid is a layout-abuse /
    generated-page tell; articles sit around 10-15).

    One regexp_extract_all pass over the tags, then a single aggregate
    fold tracking (current_depth, max_depth): opening tags push unless
    void/self-closing, closing tags pop (floored at 0 — stray closers
    don't go negative).  Regex-level scan, same no-lxml discipline as
    the rest of extract.py: CDATA/comments/script bodies containing
    literal tags will be counted (disclosed).  Returns struct(n_tags,
    max_depth, unbalanced) — ``unbalanced`` when the scan ends at
    nonzero depth.
    """
    h = F.coalesce(html, F.lit(""))
    tags = F.regexp_extract_all(
        h, F.lit(r"(?i)</?([a-z][a-z0-9]*)[^>]*>?"), 0
    )
    void_arr = F.array(*[F.lit(v) for v in _VOID_ELEMENTS])
    name_of = lambda t: F.lower(  # noqa: E731
        F.regexp_extract(t, r"(?i)</?([a-z][a-z0-9]*)", 1)
    )
    delta = lambda t: (  # noqa: E731
        F.when(t.startswith("</"), F.lit(-1))
        .when(
            t.endswith("/>") | F.array_contains(void_arr, name_of(t)),
            F.lit(0),
        )
        .otherwise(F.lit(1))
    )
    fold = F.aggregate(
        tags,
        F.struct(F.lit(0).alias("d"), F.lit(0).alias("mx")),
        lambda acc, t: F.struct(
            F.greatest(acc.getField("d") + delta(t), F.lit(0)).alias("d"),
            F.greatest(
                acc.getField("mx"),
                F.greatest(acc.getField("d") + delta(t), F.lit(0)),
            ).alias("mx"),
        ),
    )
    return F.struct(
        F.size(tags).cast("int").alias("n_tags"),
        fold.getField("mx").cast("int").alias("max_depth"),
        (fold.getField("d") != 0).alias("unbalanced"),
    )


def tracker_ids(html: Column) -> Column:
    """Extract third-party analytics/ads account identifiers from page
    source — Google Analytics (``UA-XXXX-Y``), GA4 (``G-XXXXXXX``),
    Tag Manager (``GTM-XXXX``) and AdSense publisher ids
    (``ca-pub-NNNN`` / ``pub-NNNN``).  Shared account ids across hosts
    are among the strongest OPERATOR-clustering signals a crawl has
    (one org, many doorway domains — the follow-up join is a groupBy on
    the id, same shape as favicon clustering), and ad-network ids feed
    spam/link-farm triage.

    Returns array<struct<kind, id>> (distinct, order by appearance not
    guaranteed).  Pure regexp_extract_all — narrow map.
    """
    h = F.coalesce(html, F.lit(""))
    mk = lambda kind, rx: F.transform(  # noqa: E731
        F.array_distinct(F.regexp_extract_all(h, F.lit(rx), 1)),
        lambda x: F.struct(F.lit(kind).alias("kind"), x.alias("id")),
    )
    return F.concat(
        mk("ga", r"\b(UA-\d{4,10}-\d{1,4})\b"),
        mk("ga4", r"\b(G-[A-Z0-9]{6,12})\b"),
        mk("gtm", r"\b(GTM-[A-Z0-9]{4,9})\b"),
        mk("adsense", r"\b(?:ca-)?(pub-\d{8,20})\b"),
    )


CMS_SIGNALS = [
    ("wordpress", r"(?i)/wp-content/|<meta name=\"generator\" content=\"WordPress"),
    ("drupal", r"(?i)/sites/default/files/|<meta name=\"generator\" content=\"Drupal"),
    ("joomla", r"(?i)/media/jui/|<meta name=\"generator\" content=\"Joomla"),
    ("shopify", r"(?i)cdn\.shopify\.com"),
    ("wix", r"(?i)static\.wixstatic\.com"),
    ("squarespace", r"(?i)static1\.squarespace\.com"),
    ("ghost", r"(?i)<meta name=\"generator\" content=\"Ghost"),
]


def cms_fingerprint(html: Column) -> Column:
    """CMS identification from page source: the ``<meta generator>``
    tag when sites ship it, asset-path fingerprints when they strip it
    (the usual hardening).  First matching signal in a fixed priority
    order wins; 'unknown' otherwise.  Platform mix per host/TLD is a
    crawl-planning input (render cost, template dedup expectations,
    paginator family) and a corpus-datasheet column.

    One regexp per signal, fixed chain — narrow map.
    """
    h = F.coalesce(html, F.lit(""))
    out = None
    for name, rx in reversed(CMS_SIGNALS):
        cond = h.rlike(rx)
        out = F.when(cond, F.lit(name)) if out is None else F.when(
            cond, F.lit(name)).otherwise(out)
    return F.coalesce(out, F.lit("unknown"))


def json_feed_summary(body: Column) -> Column:
    """JSON Feed (jsonfeed.org v1/v1.1) summary — the JSON sibling of
    the RSS/Atom feed parsers: struct(version_ok, feed_title, n_items,
    first_item_url).  A feed endpoint is a high-yield discovery source
    (every item is a canonical content URL with a date), and JSON Feed
    is what static-site generators increasingly emit.

    Pure ``get_json_object``/``json_array_length`` JVM expressions —
    no schema inference pass, narrow map.
    """
    b = F.coalesce(body, F.lit(""))
    version = F.get_json_object(b, "$.version")
    return F.struct(
        F.coalesce(version.rlike(r"^https://jsonfeed\.org/version/1"),
                   F.lit(False)).alias("version_ok"),
        F.get_json_object(b, "$.title").alias("feed_title"),
        F.coalesce(F.json_array_length(F.get_json_object(b, "$.items")),
                   F.lit(0)).cast("int").alias("n_items"),
        F.get_json_object(b, "$.items[0].url").alias("first_item_url"),
    )


def twitter_card_summary(html: Column) -> Column:
    """Twitter/X Card meta audit: struct(card_type, has_title,
    has_description, has_image, complete) — the social-preview
    completeness check alongside the OpenGraph audit (many sites set
    og:* but forget twitter:*; the card fields also provide alt
    caption-harvest sources for image payloads).

    name= and property= attribute spellings both accepted (the wild
    web uses both); regex-level parse, narrow map.
    """
    h = F.coalesce(html, F.lit(""))
    meta = lambda key: F.nullif(F.regexp_extract(  # noqa: E731
        h,
        r'(?is)<meta[^>]+(?:name|property)=["\']twitter:' + key
        + r'["\'][^>]*content=["\']([^"\']*)["\']',
        1,
    ), F.lit(""))
    card = meta("card")
    title = meta("title")
    desc = meta("description")
    img = meta("image")
    return F.struct(
        card.alias("card_type"),
        title.isNotNull().alias("has_title"),
        desc.isNotNull().alias("has_description"),
        img.isNotNull().alias("has_image"),
        (card.isNotNull() & title.isNotNull() & desc.isNotNull()
         & img.isNotNull()).alias("complete"),
    )


# (value-unit, factor-to-base-milliunits) — base units: meters, grams,
# seconds; factors exact integers so normalization is SQL-replayable
QUANTITY_UNITS = [
    ("km", "length", 1_000_000), ("m", "length", 1_000),
    ("cm", "length", 10), ("mm", "length", 1),
    ("kg", "mass", 1_000_000), ("g", "mass", 1_000), ("mg", "mass", 1),
    ("h", "time", 3_600_000), ("min", "time", 60_000),
    ("s", "time", 1_000), ("ms", "time", 1),
]


def quantity_mentions(text: Column) -> Column:
    """Unit-bearing quantity extraction: integer values immediately
    followed by a metric unit token ('5 km', '250mg', '90 min') are
    normalized into base milli-units (length->mm, mass->mg, time->ms)
    — the knowledge-extraction primitive for recipe/product/spec pages,
    and a numeracy-density signal for corpus routing.  INTEGER values
    only (decimal quantities would need decimal milli-parsing; kept
    out deliberately — exactness first), longest-unit-first matching
    so '5 mm' never half-matches 'm'.

    Returns array<struct<value, unit, dim, base_milli>>.
    """
    h = F.coalesce(text, F.lit(""))
    units_sorted = sorted(QUANTITY_UNITS, key=lambda u: -len(u[0]))
    alt = "|".join(u for u, _, _ in units_sorted)
    matches = F.regexp_extract_all(
        h, F.lit(r"(?<![\w.])(\d{1,12}) ?(" + alt + r")(?![A-Za-z])"), 0
    )
    def entry(m):
        val = F.regexp_extract(m, r"^(\d+)", 1).cast("long")
        unit = F.regexp_extract(m, r"([A-Za-z]+)$", 1)
        dim = None
        factor = None
        for u, d, f in units_sorted:
            cond = unit == u
            dim = F.when(cond, F.lit(d)) if dim is None else F.when(
                cond, F.lit(d)).otherwise(dim)
            factor = F.when(cond, F.lit(f)) if factor is None else F.when(
                cond, F.lit(f)).otherwise(factor)
        return F.struct(
            val.alias("value"), unit.alias("unit"), dim.alias("dim"),
            (val * factor.cast("long")).alias("base_milli"),
        )
    return F.transform(matches, entry)


def scholarly_ids(text: Column) -> Column:
    """Academic-identifier detection: DOIs (``10.NNNN/suffix``) and
    arXiv ids (new ``2403.12345`` form with the explicit ``arXiv:``
    prefix, and the old ``math.GT/0309136`` form) — the router for
    scholarly content (different dedup expectations, citation-graph
    building, license posture).  Returns struct(n_dois, first_doi,
    n_arxiv, first_arxiv).
    """
    h = F.coalesce(text, F.lit(""))
    doi_rx = r"\b(10\.\d{4,9}/[^\s\"<>]+)"
    arxiv_rx = r"\barXiv:(\d{4}\.\d{4,5}(?:v\d+)?|[a-z-]+(?:\.[A-Z]{2})?/\d{7})"
    dois = F.regexp_extract_all(h, F.lit(doi_rx), 1)
    arx = F.regexp_extract_all(h, F.lit(arxiv_rx), 1)
    return F.struct(
        F.size(dois).cast("int").alias("n_dois"),
        F.element_at(F.when(F.size(dois) > 0, dois), 1).alias("first_doi"),
        F.size(arx).cast("int").alias("n_arxiv"),
        F.element_at(F.when(F.size(arx) > 0, arx), 1).alias("first_arxiv"),
    )


_MONTHS = ["January", "February", "March", "April", "May", "June",
           "July", "August", "September", "October", "November",
           "December"]


def date_mentions(text: Column) -> Column:
    """Publication-date inference from body text — the fallback when a
    page ships no <meta> date, no JSON-LD datePublished and no sitemap
    lastmod (most of the long-tail web): struct(n_dates, first_iso,
    has_ambiguous_dmy).  Recognized forms: ISO ``YYYY-MM-DD``,
    long-form ``Month D, YYYY`` (normalized to ISO via a month-name
    CASE chain + lpad), and ``NN/NN/YYYY`` — the last only COUNTED and
    flagged ambiguous when both fields are <= 12 (the US/EU trap; an
    unflagged guess would poison freshness scheduling).  ``first_iso``
    prefers the first ISO hit, then the first long-form hit.

    Pure regexp + string arithmetic, narrow map.
    """
    h = F.coalesce(text, F.lit(""))
    iso = F.regexp_extract_all(
        h, F.lit(r"\b(\d{4}-\d{2}-\d{2})\b"), 1)
    month_alt = "|".join(_MONTHS)
    longform = F.regexp_extract_all(
        h, F.lit(r"\b(?:" + month_alt + r") \d{1,2}, \d{4}\b"), 0)
    slash = F.regexp_extract_all(
        h, F.lit(r"\b(\d{1,2})/(\d{1,2})/\d{4}\b"), 0)
    def lf_to_iso(lf):
        day = F.regexp_extract(lf, r" (\d{1,2}),", 1)
        year = F.regexp_extract(lf, r", (\d{4})$", 1)
        mon = None
        for i, mname in enumerate(_MONTHS):
            cond = lf.startswith(mname)
            expr = F.lit(f"{i + 1:02d}")
            mon = F.when(cond, expr) if mon is None else F.when(
                cond, expr).otherwise(mon)
        return F.concat(year, F.lit("-"), mon, F.lit("-"),
                        F.lpad(day, 2, "0"))
    first_long = F.when(
        F.size(longform) > 0, lf_to_iso(F.element_at(longform, 1)))
    ambiguous = F.exists(
        slash,
        lambda s: (F.regexp_extract(s, r"^(\d{1,2})/", 1).cast("int")
                   <= 12)
        & (F.regexp_extract(s, r"/(\d{1,2})/", 1).cast("int") <= 12),
    )
    return F.struct(
        (F.size(iso) + F.size(longform) + F.size(slash)).cast("int")
        .alias("n_dates"),
        F.coalesce(
            F.when(F.size(iso) > 0, F.element_at(iso, 1)), first_long
        ).alias("first_iso"),
        F.coalesce(ambiguous, F.lit(False)).alias("has_ambiguous_dmy"),
    )


def a11y_audit(html: Column) -> Column:
    """Accessibility-surface audit: struct(n_aria, n_landmarks,
    n_inputs, n_labeled_inputs, n_positive_tabindex, score_permille).
    Beyond compliance, a11y structure is a strong PAGE QUALITY signal
    for corpus curation (hand-built accessible pages correlate with
    editorial care; `tabindex` > 0 correlates with dark-pattern forms)
    and landmark roles segment boilerplate for the main-content
    extractor.

    ``score_permille``: labeled-input share when inputs exist, else
    1000 when landmarks or aria usage present, else 0.  Regex-level
    counts, narrow map.
    """
    h = F.coalesce(html, F.lit(""))
    n_aria = F.regexp_count(h, F.lit(r"\saria-[a-z]+=")).cast("int")
    n_land = F.regexp_count(
        h,
        F.lit(r"(?i)<(main|nav|aside|header|footer)\b"
              r"|role=\"(main|navigation|banner|contentinfo)\""),
    ).cast("int")
    n_inputs = F.regexp_count(
        h, F.lit(r"(?i)<input\b(?![^>]*type=\"hidden\")")).cast("int")
    labeled = F.regexp_count(
        h,
        F.lit(r"(?i)<input\b(?![^>]*type=\"hidden\")"
              r"[^>]*\s(aria-label|aria-labelledby|id)="),
    ).cast("int")
    pos_tab = F.regexp_count(
        h, F.lit(r"tabindex=\"[1-9]\d*\"")).cast("int")
    score = (
        F.when(n_inputs > 0,
               F.floor(labeled * 1000 / n_inputs).cast("long"))
        .when((n_land > 0) | (n_aria > 0), F.lit(1000))
        .otherwise(F.lit(0))
    ).cast("long")
    return F.struct(
        n_aria.alias("n_aria"),
        n_land.alias("n_landmarks"),
        n_inputs.alias("n_inputs"),
        labeled.alias("n_labeled_inputs"),
        pos_tab.alias("n_positive_tabindex"),
        score.alias("score_permille"),
    )


def sitemap_hreflang_links(xml: Column) -> Column:
    """Sitemap-level hreflang alternates (the ``xhtml:link
    rel="alternate"`` form inside <url> entries — Google's recommended
    channel for large sites, and the only one a crawler can read
    WITHOUT fetching every page): array<struct<loc, hreflang, href>>,
    one entry per (url, alternate) pair.

    Regex-level scan over the <url> blocks (no-lxml discipline):
    each block's <loc> is paired with every xhtml:link it contains.
    """
    h = F.coalesce(xml, F.lit(""))
    blocks = F.regexp_extract_all(
        h, F.lit(r"(?s)<url>(.*?)</url>"), 1)

    def per_block(b):
        loc = F.regexp_extract(b, r"<loc>([^<]*)</loc>", 1)
        links = F.regexp_extract_all(
            b,
            F.lit(r'<xhtml:link[^>]*rel="alternate"[^>]*'
                  r'hreflang="([^"]*)"[^>]*href="([^"]*)"'),
            0,
        )
        return F.transform(
            links,
            lambda l: F.struct(
                loc.alias("loc"),
                F.regexp_extract(l, r'hreflang="([^"]*)"', 1)
                .alias("hreflang"),
                F.regexp_extract(l, r'href="([^"]*)"', 1).alias("href"),
            ),
        )

    return F.flatten(F.transform(blocks, per_block))


def noai_meta_signals(html: Column, x_robots: Column | None = None) -> Column:
    """AI-training opt-out META directives — the page-level complement
    of the robots.txt agent matrix (ai_agents_policy): the de-facto
    ``noai`` / ``noimageai`` tokens in <meta name="robots"> (and any
    named-bot meta), plus the same tokens in an X-Robots-Tag header
    when provided.  A governance-complete pipeline honors BOTH
    channels; pages are routed out of text and/or image training sets
    respectively.

    Returns struct(noai, noimageai, channel in
    {'meta','header','both',null}).
    """
    h = F.coalesce(html, F.lit(""))
    meta_content = F.lower(F.concat_ws(
        ",",
        F.regexp_extract_all(
            h,
            F.lit(r'(?i)<meta[^>]+name="[^"]*robots[^"]*"[^>]*'
                  r'content="([^"]*)"'),
            1,
        ),
    ))
    hdr = F.lower(F.coalesce(
        x_robots if x_robots is not None else F.lit(""), F.lit("")))
    tok = lambda s, t: s.rlike(  # noqa: E731
        r"(^|[,\s])" + t + r"($|[,\s])")
    meta_noai = tok(meta_content, "noai")
    meta_noimg = tok(meta_content, "noimageai")
    hdr_noai = tok(hdr, "noai")
    hdr_noimg = tok(hdr, "noimageai")
    any_meta = meta_noai | meta_noimg
    any_hdr = hdr_noai | hdr_noimg
    channel = (
        F.when(any_meta & any_hdr, F.lit("both"))
        .when(any_meta, F.lit("meta"))
        .when(any_hdr, F.lit("header"))
    )
    return F.struct(
        (meta_noai | hdr_noai).alias("noai"),
        (meta_noimg | hdr_noimg).alias("noimageai"),
        channel.alias("channel"),
    )


def opml_feed_urls(xml: Column) -> Column:
    """OPML reading-list parse (the subscription-exchange format blog
    rolls and podcast apps export): array<struct<title, xml_url,
    html_url>> — every outline that carries an ``xmlUrl`` is a feed
    subscription, and an imported reading list is one of the
    highest-precision discovery seed sources a crawler gets (every
    entry is a known-good, content-bearing feed).

    Attribute order tolerant (title/text before or after xmlUrl);
    regex-level parse, narrow map.
    """
    h = F.coalesce(xml, F.lit(""))
    outlines = F.regexp_extract_all(
        h, F.lit(r"<outline\b[^>]*\bxmlUrl=\"[^\"]*\"[^>]*/?>"), 0)
    attr = lambda o, name: F.nullif(  # noqa: E731
        F.regexp_extract(o, r'\b' + name + r'="([^"]*)"', 1), F.lit(""))
    return F.transform(
        outlines,
        lambda o: F.struct(
            F.coalesce(attr(o, "title"), attr(o, "text")).alias("title"),
            attr(o, "xmlUrl").alias("xml_url"),
            attr(o, "htmlUrl").alias("html_url"),
        ),
    )


def noscript_share(html: Column) -> Column:
    """JS-dependence probe from markup alone: struct(n_noscript,
    noscript_chars, total_chars, share_permille) — a page whose
    meaningful content sits INSIDE <noscript> (or that ships a large
    enable-JavaScript fallback) renders empty for a non-executing
    crawler, which is exactly when the render-budget triage should
    route it to the browser pool instead of the cheap fetcher.

    One regexp pass for the noscript bodies; integer permille.
    """
    h = F.coalesce(html, F.lit(""))
    bodies = F.regexp_extract_all(
        h, F.lit(r"(?is)<noscript[^>]*>(.*?)</noscript>"), 1)
    ns_chars = F.coalesce(
        F.aggregate(
            F.transform(bodies, lambda b: F.length(b).cast("long")),
            F.lit(0).cast("long"), lambda a, x: a + x,
        ), F.lit(0).cast("long"))
    total = F.length(h).cast("long")
    return F.struct(
        F.size(bodies).cast("int").alias("n_noscript"),
        ns_chars.alias("noscript_chars"),
        total.alias("total_chars"),
        F.when(total > 0,
               F.floor(ns_chars * 1000 / total).cast("long"))
        .otherwise(F.lit(0)).alias("share_permille"),
    )


def schema_types(html: Column) -> Column:
    """Structured-data TYPE census input: every schema.org type a page
    declares, across BOTH syntaxes — JSON-LD ``"@type"`` values and
    microdata ``itemtype`` URLs (reduced to the bare type name).  The
    corpus-level rollup (groupBy type) is the coverage census a
    knowledge-extraction pipeline plans against: how many Products,
    Recipes, Articles, Events the crawl actually holds.

    Returns array<string> of distinct type names, sorted.
    """
    h = F.coalesce(html, F.lit(""))
    ld = F.regexp_extract_all(
        h, F.lit(r'"@type"\s*:\s*"([A-Za-z][A-Za-z0-9]*)"'), 1)
    micro = F.regexp_extract_all(
        h, F.lit(r'itemtype="https?://schema\.org/'
                 r'([A-Za-z][A-Za-z0-9]*)"'), 1)
    return F.array_sort(F.array_distinct(F.concat(ld, micro)))


def sitemap_news_entries(body: Column) -> Column:
    """News-sitemap extraction (Google News sitemap extension): per
    <url> block, the page <loc> with its <news:news> child's publication
    name / language / publication_date / title — the freshness-crawl
    feed (news sitemaps cap at 1000 URLs and 2 days of history, so a
    news-aware frontier polls them on a fast cadence and boosts these
    URLs' priority).  Same block-split alignment discipline as
    :func:`sitemap_video_entries`; a <url> without a news extension
    contributes nothing.  Returns array<struct<page_url, publication,
    language, pub_date, title>>, all strings (dates stay ISO strings —
    the scheduler parses them once, with refine_datetime).
    """
    blocks = F.split(body, "<url>")
    per_block = F.transform(
        blocks,
        lambda seg: F.transform(
            F.arrays_zip(
                F.regexp_extract_all(
                    seg,
                    F.lit(r"(?s)<news:name>\s*(.*?)\s*</news:name>"), 1
                ).alias("publication"),
                F.regexp_extract_all(
                    seg,
                    F.lit(r"(?s)<news:language>\s*(.*?)"
                          r"\s*</news:language>"), 1
                ).alias("language"),
                F.regexp_extract_all(
                    seg,
                    F.lit(r"(?s)<news:publication_date>\s*(.*?)"
                          r"\s*</news:publication_date>"), 1
                ).alias("pub_date"),
                F.regexp_extract_all(
                    seg,
                    F.lit(r"(?s)<news:title>\s*(.*?)\s*</news:title>"), 1
                ).alias("title"),
            ),
            lambda z: F.struct(
                F.regexp_extract(seg, r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
                 .alias("page_url"),
                z["publication"].alias("publication"),
                z["language"].alias("language"),
                z["pub_date"].alias("pub_date"),
                z["title"].alias("title"),
            ),
        ),
    )
    return F.flatten(F.filter(per_block, lambda a: F.size(a) > 0))
