"""Differential test: the regex-backed CSS engine (crawlspark.cssq) vs an
independent stdlib html.parser implementation, over randomized well-formed
documents.  No Spark involved — pure engine correctness."""

import random
from html.parser import HTMLParser

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlspark import cssq


class _RefFinder(HTMLParser):
    """Reference implementation: DOM-walk with an explicit stack, collecting
    (tag, classes, id, inner-range) for every element."""

    VOID = cssq._VOID_TAGS

    def __init__(self, source: str):
        super().__init__(convert_charrefs=False)
        self.source = source
        self.stack = []  # (tag, attrs, inner_start)
        self.elements = []  # (tag, attrs dict, inner, depth_path)
        self.feed(source)
        # unclosed elements run to EOF, like cssq
        while self.stack:
            tag, attrs, start, path = self.stack.pop()
            self.elements.append((tag, attrs, self.source[start:], path))

    def handle_starttag(self, tag, attrs):
        if tag in self.VOID:
            self.elements.append(
                (tag, dict(attrs), "", [t for t, *_ in self.stack])
            )
            return
        end = self.getpos()
        # inner starts right after this open tag: find '>' from current index
        idx = self.source.index(">", self._offset()) + 1
        self.stack.append((tag, dict(attrs), idx, [t for t, *_ in self.stack]))

    def handle_startendtag(self, tag, attrs):
        self.elements.append((tag, dict(attrs), "", [t for t, *_ in self.stack]))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i][0] == tag:
                t, attrs, start, path = self.stack.pop(i)
                inner_end = self._offset()
                self.elements.append((t, attrs, self.source[start:inner_end], path))
                break

    def _offset(self) -> int:
        line, col = self.getpos()
        off = 0
        for _ in range(line - 1):
            off = self.source.index("\n", off) + 1
        return off + col


def ref_find(source: str, sel: str):
    """Reference matcher for SINGLE simple selectors (the descendant
    combinator is covered by unit tests)."""
    (s,) = cssq.parse_selector(sel)
    els = _RefFinder(source).elements

    def matches(tag, attrs):
        if s.tag and tag.lower() != s.tag.lower():
            return False
        if s.cls is not None and s.cls not in (attrs.get("class") or "").split():
            return False
        if s.id is not None and attrs.get("id") != s.id:
            return False
        return True

    return [(t, a, inner) for t, a, inner, _p in els if matches(t, a)]


TAGS = ["div", "span", "p", "section", "b"]
CLASSES = ["pagination", "item", "next", "box"]


def _gen_doc(rng: random.Random, depth=0) -> str:
    n = rng.randint(1, 3 if depth else 4)
    parts = []
    for _ in range(n):
        tag = rng.choice(TAGS)
        cls = rng.choice(CLASSES + [None, None])
        ident = f"e{rng.randint(0, 99)}" if rng.random() < 0.2 else None
        attrs = ""
        if cls:
            attrs += f' class="{cls} extra"' if rng.random() < 0.3 else f' class="{cls}"'
        if ident:
            attrs += f' id="{ident}"'
        inner = (
            _gen_doc(rng, depth + 1)
            if depth < 2 and rng.random() < 0.5
            else f"text{rng.randint(0, 9)}"
        )
        parts.append(f"<{tag}{attrs}>{inner}</{tag}>")
    return "".join(parts)


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=60, deadline=None)
def test_cssq_single_selector_matches_htmlparser(seed):
    rng = random.Random(seed)
    doc = _gen_doc(rng)
    for sel in [".pagination", ".item", "div", "span.next",
                "#e" + str(rng.randint(0, 99))]:
        got = [
            (t.lower(), inner) for t, _a, inner in cssq.find_elements(doc, sel)
        ]
        ref = [(t.lower(), inner) for t, _a, inner in ref_find(doc, sel)]
        assert sorted(got) == sorted(ref), (sel, doc)


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=40, deadline=None)
def test_cssq_inner_content_nesting_exact(seed):
    """Inner source of matched elements must be nesting-exact — the regex
    scan counts same-tag depth, the reference uses a real parse stack."""
    rng = random.Random(seed)
    doc = _gen_doc(rng)
    got = {
        inner for t, _a, inner in cssq.find_elements(doc, "div")
    }
    ref = {inner for t, _a, inner in ref_find(doc, "div")}
    assert got == ref, doc


# ---------------------------------------------------------------------------
# Soup-mutation differential (VERDICT r4 item 5): mutate well-formed docs
# with unclosed tags, stray '<'/'>', comments, and duplicate attributes —
# the soup classes where stdlib html.parser still defines a tree — and diff
# BOTH cssq.find_elements and the link tokenizer against html.parser.
# ---------------------------------------------------------------------------

_CLOSE_RE_TXT = r"</(?:div|span|p|section|b)\s*>"


def _first_wins(attrs):
    """HTML5 duplicate-attribute rule (first occurrence wins) — html.parser
    reports duplicates in order, dict() would keep the LAST."""
    out = {}
    for k, v in attrs:
        out.setdefault(k, v)
    return out


def _text_positions(doc: str) -> list[int]:
    """Indices that are OUTSIDE any tag/comment (safe text insertion points)."""
    import re as _re

    pos, depth_tag = [], False
    in_comment = False
    i = 0
    while i < len(doc):
        if not in_comment and doc.startswith("<!--", i):
            in_comment = True
            i += 4
            continue
        if in_comment:
            if doc.startswith("-->", i):
                in_comment = False
                i += 3
            else:
                i += 1
            continue
        c = doc[i]
        if c == "<":
            depth_tag = True
        elif c == ">":
            depth_tag = False
            i += 1
            continue
        if not depth_tag and c not in "<>":
            pos.append(i)
        i += 1
    return pos or [len(doc)]


def _mutate(rng: random.Random, doc: str) -> str:
    import re as _re

    for _ in range(rng.randint(1, 3)):
        kind = rng.randrange(5)
        if kind == 0:  # drop one closing tag -> unclosed element
            closes = list(_re.finditer(_CLOSE_RE_TXT, doc))
            if closes:
                m = rng.choice(closes)
                doc = doc[:m.start()] + doc[m.end():]
        elif kind == 1:  # stray '<' in text (not followed by a letter)
            p = rng.choice(_text_positions(doc))
            doc = doc[:p] + f" 1<{rng.randint(0, 9)} " + doc[p:]
        elif kind == 2:  # stray '>' in text
            p = rng.choice(_text_positions(doc))
            doc = doc[:p] + " > " + doc[p:]
        elif kind == 3:  # comment containing spoofed markup
            p = rng.choice(_text_positions(doc))
            doc = (doc[:p]
                   + f"<!-- <div class=item>c{rng.randint(0, 9)}</div> -->"
                   + doc[p:])
        else:  # duplicate attribute on a random open tag
            opens = list(_re.finditer(r"<(div|span|p|section|b)\b", doc))
            if opens:
                m = rng.choice(opens)
                ins = m.end()
                doc = (doc[:ins]
                       + f' class="dup{rng.randint(0, 9)}"' + doc[ins:])
    return doc


def ref_find_soup(source: str, sel: str):
    """ref_find with the HTML5 first-attribute-wins rule."""
    (s,) = cssq.parse_selector(sel)
    els = _RefFinderSoup(source).elements

    def matches(tag, attrs):
        if s.tag and tag.lower() != s.tag.lower():
            return False
        if s.cls is not None and s.cls not in (attrs.get("class") or "").split():
            return False
        if s.id is not None and attrs.get("id") != s.id:
            return False
        return True

    return [(t, a, inner) for t, a, inner, _p in els if matches(t, a)]


class _RefFinderSoup(_RefFinder):
    def handle_starttag(self, tag, attrs):
        super().handle_starttag(tag, [(k, v) for k, v in _first_wins(attrs).items()])

    def handle_startendtag(self, tag, attrs):
        super().handle_startendtag(
            tag, [(k, v) for k, v in _first_wins(attrs).items()]
        )


@given(st.integers(min_value=0, max_value=100_000))
@settings(max_examples=600, deadline=None)
def test_cssq_soup_mutation_matches_htmlparser(seed):
    rng = random.Random(seed)
    doc = _mutate(rng, _gen_doc(rng))
    for sel in [".pagination", ".item", "div", "span.next", ".dup3"]:
        got = [
            (t.lower(), inner) for t, _a, inner in cssq.find_elements(doc, sel)
        ]
        ref = [(t.lower(), inner) for t, _a, inner in ref_find_soup(doc, sel)]
        assert sorted(got) == sorted(ref), (sel, doc)


class _RefLinks(HTMLParser):
    """Independent link extractor: <a href> anchors with implicit close on a
    new <a> (HTML5 tree builder), text = concatenated character data inside
    the anchor, first-attribute-wins."""

    def __init__(self, source: str):
        super().__init__(convert_charrefs=True)
        self.links = []
        self._open = None  # (href, [text chunks])
        self.feed(source)
        self.close()
        self._emit()

    def _emit(self):
        if self._open is not None:
            href, chunks = self._open
            import re as _re

            text = _re.sub(r"\s+", " ", "".join(chunks)).strip()
            self.links.append((href, text))
            self._open = None

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._emit()
            href = _first_wins(attrs).get("href")
            if href is not None:
                self._open = (href, [])

    def handle_endtag(self, tag):
        if tag == "a":
            self._emit()

    def handle_data(self, data):
        if self._open is not None:
            self._open[1].append(data)


@given(st.integers(min_value=0, max_value=100_000))
@settings(max_examples=600, deadline=None)
def test_link_tokenizer_soup_mutation_matches_htmlparser(seed):
    from crawlspark.extract import _extract_links_one

    rng = random.Random(seed)
    parts = []
    for i in range(rng.randint(1, 6)):
        kind = rng.randrange(4)
        if kind == 0:
            parts.append(
                f'<a href="/p{rng.randint(0, 99)}">link {i}'
                + ("</a>" if rng.random() < 0.8 else "")
            )
        elif kind == 1:
            parts.append(f"<b>bold {i}</b> plain {i}")
        elif kind == 2:
            parts.append(
                f'<a href="/q{i}">t<span class=x>u{i}</span>v</a>'
            )
        else:
            parts.append(f"<div class=box>d{i}</div>")
    doc = _mutate(rng, "".join(parts))
    got = [(l["href"], l["text"]) for l in _extract_links_one(doc)]
    ref = _RefLinks(doc).links
    assert got == ref, doc
