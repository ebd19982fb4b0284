"""Main-content block extraction: length + link-density heuristics."""

from crawlspark.extract import main_content_blocks


def test_main_content_keeps_long_low_link_blocks(spark):
    html = (
        "<nav>home about</nav>"
        "<p>this is the long organic body paragraph of the page.</p>"
        '<div><a href="/a">link</a> <a href="/b">farm</a> '
        '<a href="/c">of many anchors here</a></div>'
        "<p>tiny.</p>"
        "<footer>(c) corp</footer>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = main_content_blocks(df).collect()[0]
    assert r["main_text"] == (
        "this is the long organic body paragraph of the page."
    )
    assert r["n_good"] == 1
    # nav, body, link farm, tiny, footer all yield nonempty blocks
    assert r["n_blocks"] == 5


def test_main_content_link_density_is_permille_exact(spark):
    # 30 text chars, 16 anchor chars -> 533 permille > 500 -> dropped;
    # 14 anchor chars -> 466 permille -> kept
    base = "x" * 14
    dense = f'<p><a href="/y">{"z" * 16}</a>{base}</p>'
    sparse = f'<p><a href="/y">{"z" * 14}</a>{base}{"q" * 2}</p>'
    df = spark.createDataFrame(
        [(1, dense), (2, sparse)], "doc_id long, html string"
    )
    rows = {r["doc_id"]: r for r in main_content_blocks(df).collect()}
    assert rows[1]["n_good"] == 0
    assert rows[2]["n_good"] == 1


def test_main_content_empty_and_tagless(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "just bare text with no tags at all here")],
        "doc_id long, html string",
    )
    rows = {r["doc_id"]: r for r in main_content_blocks(df).collect()}
    assert rows[1]["main_text"] == "" and rows[1]["n_blocks"] == 0
    assert rows[2]["n_good"] == 1  # whole page is one good block
