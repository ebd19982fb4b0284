"""Mini CSS-selector engine over raw HTML/XML strings (regex-backed).

The container has no lxml, so the DOM-flavored operators (IsEmptyInHtml /
IsEmptyInXml stop rules, SimpleWebsitePaginator's pagination-links selector —
reference: src/Steps/Loading/Http/Paginators/StopRules/IsEmptyInDom.php:24-56,
SimpleWebsitePaginator.php:110-140) run on a deliberately small selector
subset that covers the reference's own test usage (`.pagination`,
`.nextPageLink`, `#id`, `tag`, `tag.class`, and one descendant combinator
`A B`):

- simple selector: ``tag``, ``.class``, ``#id``, ``tag.class``, ``tag#id``
- descendant combinator: ``A B`` (one level of nesting search)

Matching is a linear scan that counts same-tag nesting to find the element's
closing tag, so inner HTML extraction is exact for well-formed markup.
Everything here runs inside Arrow-batched pandas_udfs — per-partition Python,
never per-row plan nodes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class SimpleSelector:
    tag: str | None = None  # None = any tag
    cls: str | None = None
    id: str | None = None


_SIMPLE_RE = re.compile(
    r"^([a-zA-Z][a-zA-Z0-9_-]*)?(?:\.([\w-]+)|#([\w-]+))?$"
)


def parse_selector(sel: str) -> list[SimpleSelector]:
    """Parse into a descendant chain (outermost first).  Raises ValueError
    on syntax outside the supported subset — mirrors the reference's
    InvalidDomQueryException for bad selectors (DomQuery.php)."""
    parts = sel.strip().split()
    out = []
    for p in parts:
        m = _SIMPLE_RE.match(p)
        if not m or not p:
            raise ValueError(f"unsupported CSS selector: {sel!r}")
        out.append(SimpleSelector(tag=m.group(1), cls=m.group(2), id=m.group(3)))
    if not out:
        raise ValueError("empty CSS selector")
    return out


_TAG_OPEN_RE = re.compile(r"<([a-zA-Z][a-zA-Z0-9_-]*)((?:\s[^>]*?)?)(/?)>", re.DOTALL)
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


def _attr(attrs: str, name: str) -> str | None:
    # anchor the attribute NAME start: without (?<![\w-]) a lookup of 'href'
    # would match inside 'data-href' / 'xhref' and return the wrong value
    m = re.search(
        r"(?<![\w-])" + re.escape(name)
        + r"""\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
        attrs,
        re.IGNORECASE,
    )
    if not m:
        return None
    return next(g for g in m.groups() if g is not None)


def _matches(sel: SimpleSelector, tag: str, attrs: str) -> bool:
    if sel.tag and tag.lower() != sel.tag.lower():
        return False
    if sel.cls is not None:
        classes = (_attr(attrs, "class") or "").split()
        if sel.cls not in classes:
            return False
    if sel.id is not None and _attr(attrs, "id") != sel.id:
        return False
    return True


def _element_end(source: str, open_match: re.Match, tag: str) -> int:
    """Index just past the element's closing tag (nesting-aware); for void /
    self-closed elements, just past the open tag."""
    if open_match.group(3) == "/" or tag.lower() in _VOID_TAGS:
        return open_match.end()
    depth = 1
    pat = re.compile(r"<(/?)" + re.escape(tag) + r"(?=[\s/>])[^>]*>", re.IGNORECASE)
    pos = open_match.end()
    while depth:
        m = pat.search(source, pos)
        if not m:
            return len(source)  # unclosed: element runs to EOF
        pos = m.end()
        if m.group(1):
            depth -= 1
        elif not m.group(0).endswith("/>"):
            depth += 1
    return pos


def find_elements(source: str, sel: str) -> list[tuple[str, str, str]]:
    """All elements matching the selector, document order:
    (tag, attrs-string, inner-source).  Descendant chains search inside the
    previous level's matched elements."""
    chain = parse_selector(sel)
    # regions carry their absolute offset into `source` so a descendant
    # level can dedup by element position: when nested ancestors BOTH match
    # the previous level (e.g. 'div p' on <div><div><p>), their inner
    # regions overlap and the same element would otherwise be returned once
    # per ancestor; CSS (and the reference DomQuery) match each element once
    regions: list[tuple[int, str]] = [(0, source)]
    for level, s in enumerate(chain):
        hits: list[tuple[int, str, str, str, int]] = []
        seen_pos: set[int] = set()
        for off, region in regions:
            for m in _TAG_OPEN_RE.finditer(region):
                tag = m.group(1)
                if not _matches(s, tag, m.group(2)):
                    continue
                abs_start = off + m.start()
                if abs_start in seen_pos:
                    continue
                seen_pos.add(abs_start)
                end = _element_end(region, m, tag)
                close_len = (
                    0
                    if (m.group(3) == "/" or tag.lower() in _VOID_TAGS)
                    else len(tag) + 3
                )
                inner = region[m.end(): max(m.end(), end - close_len)]
                hits.append((abs_start, tag, m.group(2), inner, off + m.end()))
        # true document order even when overlapping regions interleave
        hits.sort(key=lambda h: h[0])
        if level < len(chain) - 1:
            regions = [(h[4], h[3]) for h in hits]
        else:
            return [(t, a, i) for _p, t, a, i, _io in hits]
    return []


def inner_htmls(source: str, sel: str) -> list[str]:
    return [inner for _t, _a, inner in find_elements(source, sel)]


_HREF_A_RE = re.compile(
    r"<a(\s[^>]*?)?>", re.IGNORECASE | re.DOTALL
)


def pagination_link_hrefs(source: str, sel: str) -> list[str]:
    """SimpleWebsitePaginator link discovery: for each element matching the
    selector, take the element itself if it is an ``<a href>`` (href not
    starting with '#'), plus every ``<a href>`` inside it, document order
    (reference: SimpleWebsitePaginator.php:110-183)."""
    out: list[str] = []
    for tag, attrs, inner in find_elements(source, sel):
        if tag.lower() == "a":
            href = _attr(attrs, "href")
            if href and not href.startswith("#"):
                out.append(href)
        for m in _HREF_A_RE.finditer(inner):
            href = _attr(m.group(1) or "", "href")
            if href and not href.startswith("#"):
                out.append(href)
    return out
