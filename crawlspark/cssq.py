"""Mini CSS-selector engine over raw HTML/XML strings (regex-backed).

The container has no lxml, so the DOM-flavored operators (IsEmptyInHtml /
IsEmptyInXml stop rules, SimpleWebsitePaginator's pagination-links selector —
reference: src/Steps/Loading/Http/Paginators/StopRules/IsEmptyInDom.php:24-56,
SimpleWebsitePaginator.php:110-140) run on a deliberately small selector
subset that covers the reference's own test usage:

- CSS: ``tag``, ``.class``, ``#id``, ``tag.class``, ``tag#id``,
  ``[attr]``/``[attr=v]``/``[attr*=v]``, descendant (``A B``) and child
  (``A > B``) combinators
- XPath (reference Html/XPathQuery.php; every form its tests use):
  ``//tag``, ``//*``, ``[@attr='v']``, ``[contains(@attr,'v')]``,
  ``//a/b`` child steps — ``parse_selector`` routes any selector starting
  with ``/`` through :func:`parse_xpath`, so every DOM-flavored operator
  (Dom step, stop rules, paginators, GetLinks selector) accepts both
  syntaxes, like the reference's DomQuery

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
    cls: str | None = None  # CSS class-TOKEN membership
    id: str | None = None
    # generic attribute predicates: (name, op, value) with op '=' (exact
    # attribute equality — XPath [@a='v'] / CSS [a=v]) or '*=' (substring —
    # XPath contains(@a,'v') / CSS [a*=v])
    attrs: tuple = ()
    # True = element must be a DIRECT child of the previous level's match
    # (XPath '/' step, CSS '>' combinator); False = any descendant
    child: bool = False


_SIMPLE_RE = re.compile(
    r"^([a-zA-Z][a-zA-Z0-9_-]*|\*)?(?:\.([\w-]+)|#([\w-]+))?((?:\[[^\]]*\])*)$"
)
_CSS_ATTR_RE = re.compile(r"^\[\s*([\w-]+)\s*(?:(\*?=)\s*(?:'([^']*)'|\"([^\"]*)\"|([^\s\]]+)))?\s*\]$")


def _parse_css_part(p: str, sel: str, child: bool) -> SimpleSelector:
    m = _SIMPLE_RE.match(p)
    if not m or not p:
        raise ValueError(f"unsupported CSS selector: {sel!r}")
    tag = m.group(1)
    attrs = []
    for br in re.findall(r"\[[^\]]*\]", m.group(4) or ""):
        am = _CSS_ATTR_RE.match(br)
        if not am:
            raise ValueError(f"unsupported attribute selector in {sel!r}")
        if am.group(2) is None:  # bare [attr] = attribute present
            attrs.append((am.group(1), "*=", ""))
        else:
            val = next(g for g in am.groups()[2:] if g is not None)
            attrs.append((am.group(1), am.group(2), val))
    return SimpleSelector(
        tag=None if tag in (None, "*") else tag,
        cls=m.group(2), id=m.group(3), attrs=tuple(attrs), child=child,
    )


def parse_selector(sel: str) -> list[SimpleSelector]:
    """Parse into a matcher chain (outermost first).  Accepts the CSS
    subset (``tag``/``.class``/``#id``/``[attr]``/``[attr=v]``/``[attr*=v]``,
    descendant and ``>`` child combinators) and — when the string starts
    with ``/`` — the XPath subset the reference's DomQuery supports
    (Html/XPathQuery.php): ``//tag``, ``/child`` steps, ``[@attr='v']``,
    ``[contains(@attr,'v')]``, ``*``.  Raises ValueError on syntax outside
    the subset — mirrors the reference's InvalidDomQueryException."""
    if sel.lstrip().startswith("/"):
        return parse_xpath(sel)
    parts = sel.strip().split()
    out: list[SimpleSelector] = []
    child = False
    for p in parts:
        if p == ">":
            if not out or child:
                raise ValueError(f"misplaced '>' in selector: {sel!r}")
            child = True
            continue
        out.append(_parse_css_part(p, sel, child))
        child = False
    if child or not out:
        raise ValueError(f"empty or dangling CSS selector: {sel!r}")
    return out


_XPATH_STEP_RE = re.compile(r"^(\*|[a-zA-Z][\w-]*)((?:\[[^\]]*\])*)$")
_XPATH_PRED_EQ_RE = re.compile(r"^\[@([\w-]+)\s*=\s*(?:'([^']*)'|\"([^\"]*)\")\]$")
_XPATH_PRED_CONTAINS_RE = re.compile(
    r"^\[contains\(\s*@([\w-]+)\s*,\s*(?:'([^']*)'|\"([^\"]*)\")\s*\)\]$"
)


def parse_xpath(xp: str) -> list[SimpleSelector]:
    """XPath subset -> matcher chain: ``//a[@id='x']/b//c[contains(@class,
    'v')]``.  ``//`` = descendant step, ``/`` = direct-child step; the
    matching engine enforces both exactly (depth-tracked scan)."""
    s = xp.strip()
    out: list[SimpleSelector] = []
    i = 0
    while i < len(s):
        if s[i] != "/":
            raise ValueError(f"unsupported XPath (expected '/'): {xp!r}")
        if s.startswith("//", i):
            child, i = False, i + 2
        else:
            child, i = True, i + 1
        j = s.find("/", i)
        # '/' inside a [...] predicate belongs to the step, not a separator
        while j != -1 and s.count("[", i, j) != s.count("]", i, j):
            j = s.find("/", j + 1)
        step, i = (s[i:], len(s)) if j == -1 else (s[i:j], j)
        m = _XPATH_STEP_RE.match(step)
        if not m or not step:
            raise ValueError(f"unsupported XPath step {step!r} in {xp!r}")
        attrs = []
        sel_id = None
        for br in re.findall(r"\[[^\]]*\]", m.group(2) or ""):
            pm = _XPATH_PRED_EQ_RE.match(br)
            if pm:
                name = pm.group(1)
                val = pm.group(2) if pm.group(2) is not None else pm.group(3)
                if name == "id":
                    sel_id = val
                else:
                    attrs.append((name, "=", val))
                continue
            pm = _XPATH_PRED_CONTAINS_RE.match(br)
            if pm:
                val = pm.group(2) if pm.group(2) is not None else pm.group(3)
                attrs.append((pm.group(1), "*=", val))
                continue
            raise ValueError(f"unsupported XPath predicate {br!r} in {xp!r}")
        out.append(SimpleSelector(
            tag=None if m.group(1) == "*" else m.group(1),
            id=sel_id, attrs=tuple(attrs), child=child,
        ))
    if not out:
        raise ValueError("empty XPath")
    return out


def split_target_spec(spec: str) -> tuple[str, str]:
    """Split an extract-target spec ``'SEL @attr'`` into (selector, attr).
    Splits on the LAST ``' @'`` so ``@`` inside XPath predicates survives
    (``\"//a[@id='two'] @href\"`` -> (``//a[@id='two']``, ``href``)); a bare
    leading ``@attr`` targets the base node itself."""
    s = spec.strip()
    if s.startswith("@"):
        return "", s[1:].strip()
    if " @" in s:
        sel, _, attr = s.rpartition(" @")
        return sel.strip(), attr.strip()
    return s, ""


# quote-aware attr body: a quoted attribute value may contain '>' without
# ending the tag (tag-soup hardening, same discipline as extract.py's
# tokenizer)
_QATTRS = r"(?:\"[^\"]*\"|'[^']*'|[^>\"'])"
_TAG_OPEN_RE = re.compile(
    rf"<([a-zA-Z][a-zA-Z0-9_-]*)((?:\s{_QATTRS}*?)?)(/?)>", re.DOTALL
)
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# masking pre-pass: comments, CDATA, and script/style CONTENT become runs
# of spaces of the SAME length (offsets preserved — the region/dedup logic
# below is position-based), so markup inside them can never match a
# selector, exactly as in a browser DOM.  Unterminated constructs swallow
# to EOF like the HTML5 tokenizer.
# shared soup-span grammar pieces — extract.py composes its textContent
# drop-regex from the SAME constants so comment/CDATA/raw-text semantics
# can never diverge between element matching and text normalization
COMMENT_SPAN = r"<!--.*?(?:-->|\Z)"
CDATA_SPAN = r"<!\[CDATA\[.*?(?:\]\]>|\Z)"
RAWTEXT_OPEN = rf"<(script|style)(?=[\s/>]){_QATTRS}*>"
_MASK_RE = re.compile(
    COMMENT_SPAN
    + "|" + CDATA_SPAN
    + rf"|({RAWTEXT_OPEN})"
    r"(.*?)(</\2\s*>|\Z)",
    re.DOTALL | re.IGNORECASE,
)


def _mask_soup(source: str) -> str:
    def repl(m: "re.Match[str]") -> str:
        if m.group(1) is None:  # comment / CDATA: blank the whole span
            return " " * len(m.group(0))
        return m.group(1) + " " * len(m.group(3)) + m.group(4)

    return _MASK_RE.sub(repl, source)


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
    for name, op, val in sel.attrs:
        got = _attr(attrs, name)
        if got is None:
            return False
        if op == "=" and got != val:
            return False
        if op == "*=" and val not in got:
            return False
    return True


def _element_end(source: str, open_end: int, tag: str,
                 self_closed: bool) -> tuple[int, bool]:
    """(index where the element's INNER source ends, whether a real closing
    tag was found) — nesting-aware; for void / self-closed elements the
    inner is empty (returns ``open_end``).  The inner end is the closing
    tag match's START index, so junk-bearing close tags like ``</div  >``
    never leak fragments into the inner source (ADVICE r4).  An unclosed
    element runs to EOF with NO closing tag."""
    if self_closed:
        return open_end, False
    depth = 1
    pat = re.compile(
        r"<(/?)" + re.escape(tag) + rf"(?=[\s/>]){_QATTRS}*>", re.IGNORECASE
    )
    pos = open_end
    while depth:
        m = pat.search(source, pos)
        if not m:
            return len(source), False  # unclosed: element runs to EOF
        pos = m.end()
        if m.group(1):
            depth -= 1
            if not depth:
                return m.start(), True
        elif not m.group(0).endswith("/>"):
            depth += 1
    return pos, True  # unreachable


_ANY_TAG_RE = re.compile(
    rf"<(/?)([a-zA-Z][a-zA-Z0-9_-]*)((?:\s{_QATTRS}*?)?)(/?)>", re.DOTALL
)


def _iter_matches(region: str, s: SimpleSelector):
    """(open_start, open_end, tag, attrs, attrs_span, self_closed) of
    elements matching ``s`` in document order; ``attrs`` is the (masked)
    attribute string the match predicates ran on, ``attrs_span`` its
    (start, end) offsets inside ``region`` so the caller can re-slice the
    UNMASKED original.  Descendant steps scan open tags anywhere; child
    steps track nesting depth and match only region-top-level elements
    (XPath '/' and CSS '>' exact semantics)."""
    if not s.child:
        for m in _TAG_OPEN_RE.finditer(region):
            tag = m.group(1)
            self_closed = m.group(3) == "/" or tag.lower() in _VOID_TAGS
            if _matches(s, tag, m.group(2)):
                yield (m.start(), m.end(), tag, m.group(2),
                       (m.start(2), m.end(2)), self_closed)
        return
    depth = 0
    for m in _ANY_TAG_RE.finditer(region):
        if m.group(1):  # closing tag
            depth = max(0, depth - 1)
            continue
        tag, attrs = m.group(2), m.group(3) or ""
        self_closed = m.group(4) == "/" or tag.lower() in _VOID_TAGS
        if depth == 0 and _matches(s, tag, attrs):
            span = (m.start(3), m.end(3)) if m.group(3) is not None else (m.end(2), m.end(2))
            yield m.start(), m.end(), tag, attrs, span, self_closed
        if not self_closed:
            depth += 1


def find_elements(source: str, sel: str) -> list[tuple[str, str, str]]:
    """All elements matching the selector (CSS or XPath subset), document
    order: (tag, attrs-string, inner-source).  Each chain level searches
    inside the previous level's matched elements (child steps only at the
    region's top nesting level).

    Matching and element-boundary detection run on the _mask_soup'd text
    (comments / CDATA / script / style content blanked so markup inside
    them can never match, exactly as in a browser DOM), but the RETURNED
    attrs and inner source are sliced from the ORIGINAL string via the
    preserved offsets — a real DOM's innerHTML keeps comment and script
    text, and the mask is length-preserving so offsets map 1:1 (ADVICE r4)."""
    chain = parse_selector(sel)
    masked = _mask_soup(source)
    # regions carry their absolute offset into the document so a descendant
    # level can dedup by element position: when nested ancestors BOTH match
    # the previous level (e.g. 'div p' on <div><div><p>), their inner
    # regions overlap and the same element would otherwise be returned once
    # per ancestor; CSS (and the reference DomQuery) match each element once
    regions: list[tuple[int, str]] = [(0, masked)]
    for level, s in enumerate(chain):
        # per hit: (abs_start, tag, attrs_abs_span, inner_abs_span)
        hits: list[tuple[int, str, tuple[int, int], tuple[int, int]]] = []
        seen_pos: set[int] = set()
        for off, region in regions:
            for start, open_end, tag, _attrs, aspan, self_closed in _iter_matches(region, s):
                abs_start = off + start
                if abs_start in seen_pos:
                    continue
                seen_pos.add(abs_start)
                inner_end, _closed = _element_end(region, open_end, tag, self_closed)
                hits.append((
                    abs_start, tag,
                    (off + aspan[0], off + aspan[1]),
                    (off + open_end, off + inner_end),
                ))
        # true document order even when overlapping regions interleave
        hits.sort(key=lambda h: h[0])
        if level < len(chain) - 1:
            # next level still matches on MASKED text
            regions = [(i0, masked[i0:i1]) for _p, _t, _a, (i0, i1) in hits]
        else:
            return [
                (t, source[a0:a1], source[i0:i1])
                for _p, t, (a0, a1), (i0, i1) in hits
            ]
    return []


def inner_htmls(source: str, sel: str) -> list[str]:
    return [inner for _t, _a, inner in find_elements(source, sel)]


_HREF_A_RE = re.compile(
    rf"<a((?:\s{_QATTRS}*?)?)>", re.IGNORECASE | re.DOTALL
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
        # inner now preserves comment/script text (real-DOM innerHTML);
        # re-mask before scanning so commented-out anchors stay invisible
        for m in _HREF_A_RE.finditer(_mask_soup(inner)):
            href = _attr(m.group(1) or "", "href")
            if href and not href.startswith("#"):
                out.append(href)
    return out
