"""Adversarial tag-soup goldens for the link extractor (VERDICT r3 item
6): expectations are what a browser DOM yields — the reference parses
with a real DOM (src/Steps/Dom/HtmlDocument.php:63-86), so tag soup must
not spawn phantom links or drop real ones."""

import pytest

from crawlspark.extract import _canonical_one, _extract_links_one

CASES = [
    # (name, html, [(href, text), ...] browser-DOM expectation)
    ("unclosed_eof", '<div><p>text<a href="/x">link', [("/x", "link")]),
    ("nested_anchor_implicit_close",
     '<a href="/1">one <a href="/2">two</a>', [("/1", "one"), ("/2", "two")]),
    ("comment_no_phantom",
     'before <!-- <a href="/no">c</a> --> after <a href="/yes">y</a>',
     [("/yes", "y")]),
    ("unterminated_comment_swallows",
     '<a href="/pre">p</a><!-- <a href="/no">never closed', [("/pre", "p")]),
    ("script_rawtext",
     '<script>var a = \'<a href="/no2">x</a>\';</script><a href="/ok">o</a>',
     [("/ok", "o")]),
    ("unterminated_script_swallows",
     '<a href="/pre">p</a><script>"<a href=/no>"', [("/pre", "p")]),
    ("style_rawtext",
     '<style>a[href="/s"] {}</style><a href=/t>t</a>', [("/t", "t")]),
    ("unquoted_attr", "<a href=/u>u</a>", [("/u", "u")]),
    ("uppercase_tag", '<A HREF="/UP">cap</A>', [("/UP", "cap")]),
    ("duplicate_attr_first_wins",
     '<a href="/first" href="/second">d</a>', [("/first", "d")]),
    ("gt_inside_quoted_attr",
     '<a title="a > b" href="/q">q</a>', [("/q", "q")]),
    ("newlines_inside_tag", '<a\n  href="/nl"\n>nl</a>', [("/nl", "nl")]),
    ("entity_decoded_href",
     '<a href="/p?a=1&amp;b=2">e</a>', [("/p?a=1&b=2", "e")]),
    ("numeric_entity_href",
     '<a href="&#47;num">n</a>', [("/num", "n")]),
    ("self_closing_slash_ignored", '<a href="/sc"/>text', [("/sc", "text")]),
    ("anchor_without_href_skipped",
     '<a name="anchor">n</a><a href="/h">h</a>', [("/h", "h")]),
    ("empty_href_kept", '<a href="">empty</a>', [("", "empty")]),
    ("anchor_spoofed_in_attribute",
     '<img alt="<a href=/fake>"><a href="/real">r</a>', [("/real", "r")]),
    ("comment_inside_link_text",
     "<a href=/x>he<!--c-->llo</a>", [("/x", "hello")]),
    ("entity_in_link_text",
     "<a href=/e>Fish &amp; Chips</a>", [("/e", "Fish & Chips")]),
    ("cdata_ignored",
     '<![CDATA[<a href="/no">]]><a href="/c">c</a>', [("/c", "c")]),
    ("doctype_and_decl_ignored",
     '<!DOCTYPE html><!ENTITY junk><a href="/d">d</a>', [("/d", "d")]),
    ("single_quoted_attr", "<a href='/sq'>s</a>", [("/sq", "s")]),
    ("whitespace_soup",
     "<a     href = '/ws'   data-x>w\n\n  s</a>", [("/ws", "w s")]),
]


@pytest.mark.parametrize("name,html,want", CASES, ids=[c[0] for c in CASES])
def test_tag_soup_links(name, html, want):
    got = [(l["href"], l["text"]) for l in _extract_links_one(html)]
    assert got == want


def test_tag_soup_positions_are_emission_order():
    html = '<a href="/0">a</a><a name=skip>x</a><a href="/1">b'
    got = _extract_links_one(html)
    assert [(l["pos"], l["href"]) for l in got] == [(0, "/0"), (1, "/1")]


def test_canonical_survives_gt_in_href_and_decodes_entities():
    assert _canonical_one(
        '<link rel="canonical" href="/p?a=b&amp;c=d>e">') == "/p?a=b&c=d>e"
    assert _canonical_one('<link rel="canonicalize" href="/no">') is None
    # unquoted href containing 'rel=canonical' must not satisfy rel
    assert _canonical_one('<link href=/p?rel=canonical-x>') is None


# ---- cssq tag-soup hardening (same browser-DOM expectations) -------------

CSSQ_CASES = [
    ("comment_no_phantom_element",
     'x<!-- <div class=a>no</div> --><div class=a>yes</div>', "div.a",
     [("div", "yes")]),
    ("script_rawtext_no_phantom",
     '<script>var s="<div class=a>no</div>"</script><div class=a>y</div>',
     "div.a", [("div", "y")]),
    ("style_rawtext_no_phantom",
     '<style>.a{content:"<p class=a>"}</style><p class=a>s</p>', "p.a",
     [("p", "s")]),
    ("unterminated_script_swallows",
     '<div class=a>pre</div><script>"<div class=a>', "div.a",
     [("div", "pre")]),
    ("gt_inside_quoted_attr",
     '<div class=a title="x > y">content</div>', "div.a",
     [("div", "content")]),
    ("unclosed_runs_to_eof",
     '<div class=a>text', "div.a", [("div", "text")]),
    ("cdata_masked",
     '<![CDATA[<div class=a>no</div>]]><div class=a>c</div>', "div.a",
     [("div", "c")]),
]


@pytest.mark.parametrize("name,html,sel,want", CSSQ_CASES,
                         ids=[c[0] for c in CSSQ_CASES])
def test_cssq_tag_soup(name, html, sel, want):
    from crawlspark import cssq

    got = [(t, i) for t, _a, i in cssq.find_elements(html, sel)]
    assert got == want


def test_cssq_masking_preserves_offsets_for_child_steps(spark=None):
    """The mask replaces comment/script spans with same-length space runs,
    so position-based child-step nesting still resolves correctly."""
    from crawlspark import cssq

    html = ('<ul><!-- <li class=x>ghost</li> --><li class=x>one</li>'
            '<script>"</ul>"</script><li class=x>two</li></ul>')
    got = [i for _t, _a, i in cssq.find_elements(html, "ul > li")]
    assert got == ["one", "two"]
