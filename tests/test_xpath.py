"""XPath-subset selector support (reference: src/Steps/Html/XPathQuery.php,
Dom::xPath; tests mirrored from tests/Steps/HtmlTest.php:58-77 'can also
extract data using XPath queries' and the CSS/XPath equivalence cases).

cssq.parse_selector routes any selector starting with '/' through the XPath
parser, so every DOM-flavored operator (Dom step, stop rules, paginators)
accepts both syntaxes like the reference's DomQuery.
"""

import pytest

from crawlspark import cssq

# same document as the reference's bookstore.html test fixture
BOOKSTORE = """<!DOCTYPE html>
<html lang="en">
    <head><title>Bookstore Example in HTML :)</title></head>
    <body>
        <div id="bookstore">
            <div class="book" data-category="cooking">
                <h3 class="title" lang="en">Everyday Italian</h3>
                <div class="author">Giada De Laurentiis</div>
                <span class="year">2005</span> - <span class="price">30.00</span>
            </div>
            <div class="book" data-category="children">
                <h3 class="title" lang="en">Harry Potter</h3>
                <div class="author">J K. Rowling</div>
                <span class="year">2005</span> - <span class="price">29.99</span>
            </div>
            <div class="book" data-category="web">
                <h3 class="title" lang="en">XQuery Kick Start</h3>
                <span class="author">James McGovern</span>,
                <span class="author">Per Bothner</span>
                <span class="year">2003</span> - <span class="price">49.99</span>
            </div>
            <div class="book" data-category="web" data-cover="paperback">
                <h3 class="title" lang="en">Learning XML</h3>
                <div class="author">Erik T. Ray</div>
                <span class="year">2003</span> - <span class="price">39.95</span>
            </div>
        </div>
    </body>
</html>"""


def _texts(source, sel):
    from crawlspark.extract import normalize_text

    return [normalize_text(i) for _t, _a, i in cssq.find_elements(source, sel)]


# --- parser ---------------------------------------------------------------

def test_xpath_parse_steps():
    chain = cssq.parse_selector("//div[@id='bookstore']/div[@class='book']")
    assert [s.child for s in chain] == [False, True]
    assert chain[0].tag == "div" and chain[0].id == "bookstore"
    assert chain[1].attrs == (("class", "=", "book"),)


def test_xpath_parse_contains_and_star():
    chain = cssq.parse_selector("//*[contains(@class, 'remove')]")
    assert chain[0].tag is None
    assert chain[0].attrs == (("class", "*=", "remove"),)


def test_xpath_rejects_unsupported():
    for bad in ("//a[position()=1]", "//a/..", "a//b", "//", "//a[@x=v]"):
        with pytest.raises(ValueError):
            cssq.parse_selector(bad)


def test_css_child_and_attr_selectors():
    chain = cssq.parse_selector("div#bookstore > div[data-category=web]")
    assert chain[1].child is True
    assert chain[1].attrs == (("data-category", "=", "web"),)
    with pytest.raises(ValueError):
        cssq.parse_selector("> a")


# --- matching (reference HtmlTest.php:58-77 equivalents) -------------------

def test_xpath_matches_like_the_reference_bookstore_case():
    books = cssq.find_elements(
        BOOKSTORE, "//div[@id='bookstore']/div[@class='book']"
    )
    assert len(books) == 4
    titles = [_texts(inner, "//h3[@class='title']")[0] for _t, _a, inner in books]
    assert titles == [
        "Everyday Italian", "Harry Potter", "XQuery Kick Start", "Learning XML",
    ]
    # //*[@class='author'] (any tag, exact attr) finds div AND span authors
    authors2 = _texts(books[2][2], "//*[@class='author']")
    assert authors2 == ["James McGovern", "Per Bothner"]
    years = [_texts(inner, "//span[@class='year']")[0] for _t, _a, inner in books]
    assert years == ["2005", "2005", "2003", "2003"]


def test_xpath_equals_css_on_the_same_document():
    assert _texts(BOOKSTORE, "//h3[@class='title']") == _texts(BOOKSTORE, "h3.title")
    assert _texts(BOOKSTORE, "//div[@id='bookstore']") == _texts(BOOKSTORE, "#bookstore")


def test_xpath_child_step_is_direct_child_only():
    html = "<div id='a'><p>top</p><section><p>nested</p></section></div>"
    assert _texts(html, "//div[@id='a']/p") == ["top"]
    assert _texts(html, "//div[@id='a']//p") == ["top", "nested"]
    assert _texts(html, "div > p") == ["top"]


def test_xpath_contains_attribute_match():
    html = "<ul><li class='keep x'>a</li><li class='remove-me'>b</li></ul>"
    assert _texts(html, "//li[contains(@class, 'remove')]") == ["b"]
    # exact attr equality does NOT match the multi-class value
    assert _texts(html, "//li[@class='keep']") == []
    assert _texts(html, "//li[@class='keep x']") == ["a"]


def test_css_attr_selectors_match():
    assert len(cssq.find_elements(BOOKSTORE, "div[data-cover]")) == 1
    assert len(cssq.find_elements(BOOKSTORE, "div[data-category=web]")) == 2
    assert len(cssq.find_elements(BOOKSTORE, "div[data-category*=child]")) == 1


# --- spec splitting (xpath with '@' inside predicates) ----------------------

def test_split_target_spec():
    assert cssq.split_target_spec(".link @href") == (".link", "href")
    assert cssq.split_target_spec("//a[@id='two'] @href") == ("//a[@id='two']", "href")
    assert cssq.split_target_spec("@html") == ("", "html")
    assert cssq.split_target_spec(".title") == (".title", "")


# --- end to end through the facade Dom step --------------------------------

def test_dom_step_accepts_xpath(spark):
    from pyspark.sql import functions as F
    from crawlspark.crawler import Dom

    df = spark.createDataFrame([(1,)], "i long").select(
        F.lit(0).cast("long").alias("_input_id"),
        F.lit(0).cast("long").alias("_ord"),
        F.struct(F.lit(BOOKSTORE).alias("body")).alias("value"),
    )
    step = Dom(each="//div[@id='bookstore']/div[@class='book']").extract({
        "title": "//h3[@class='title']",
        "year": "//span[@class='year']",
        "lang": "//h3[@class='title'] @lang",
    })
    rows = step.apply(df).select("value.*").collect()
    assert [r["title"] for r in rows] == [
        "Everyday Italian", "Harry Potter", "XQuery Kick Start", "Learning XML",
    ]
    assert [r["year"] for r in rows] == ["2005", "2005", "2003", "2003"]
    assert [r["lang"] for r in rows] == ["en", "en", "en", "en"]
