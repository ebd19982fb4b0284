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
