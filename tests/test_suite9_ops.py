"""Round-2 part-7 operators: feed discovery/parse, AMP fold, CAS store."""

from pyspark.sql import functions as F

from crawlspark.extract import amp_canonical_fold, discover_feeds, feed_items
from crawlspark.sinks import content_store_stats


def test_discover_feeds_kinds_and_attr_order(spark):
    body = ('<link type="application/atom+xml" rel="alternate" '
            'href="http://x/a.xml">'
            '<link rel="alternate" href="http://x/r.xml" '
            'type="application/rss+xml">'
            '<link rel="stylesheet" type="text/css" href="/s.css">')
    got = (spark.range(1)
           .select(F.explode(discover_feeds(F.lit(body))).alias("f"))
           .select("f.*").collect())
    assert sorted((r.feed_url, r.kind) for r in got) == [
        ("http://x/a.xml", "atom"), ("http://x/r.xml", "rss")]


def test_feed_items_mixed_dialects_aligned(spark):
    body = ("<rss><item><link>http://x/1</link><title>one</title>"
            "<pubDate>d1</pubDate></item>"
            "<item><link>http://x/2</link><title>two</title>"
            "<pubDate>d2</pubDate></item></rss>"
            '<feed><entry><link href="http://x/3"/><title>three</title>'
            "<updated>u3</updated></entry></feed>")
    got = (spark.range(1)
           .select(F.explode(feed_items(F.lit(body))).alias("i"))
           .select("i.*").collect())
    assert sorted((r.url, r.title, r.published) for r in got) == [
        ("http://x/1", "one", "d1"), ("http://x/2", "two", "d2"),
        ("http://x/3", "three", "u3")]


def test_amp_fold_cases(spark):
    pages = spark.createDataFrame(
        [("http://w/amp/p1",
          '<link rel="canonical" href="http://w/p1">'),
         ("http://w/p2", '<link rel="canonical" href="http://w/p2">'),
         ("http://w/p3", "<html></html>")],
        "url STRING, body STRING")
    out = {r.url: r for r in amp_canonical_fold(pages).collect()}
    assert out["http://w/amp/p1"].fold_url == "http://w/p1"
    assert out["http://w/amp/p1"].is_alternate is True
    assert out["http://w/p2"].fold_url == "http://w/p2"
    assert out["http://w/p2"].is_alternate is False
    assert out["http://w/p3"].fold_url == "http://w/p3"


def test_content_store_stats(spark):
    pages = spark.createDataFrame(
        [("h1", 100), ("h1", 100), ("h1", 100), ("h2", 50)],
        "content_hash STRING, n_bytes LONG")
    out = {r.content_hash: r for r in content_store_stats(pages).collect()}
    assert out["h1"].n_refs == 3
    assert out["h1"].bytes_stored == 100 and out["h1"].bytes_saved == 200
    assert out["h2"].n_refs == 1 and out["h2"].bytes_saved == 0


def _luhn_py(s):
    total = 0
    for i, ch in enumerate(reversed(s), start=1):
        d = ord(ch) - 48
        if i % 2 == 0:
            d = 2 * d - 9 if d > 4 else 2 * d
        total += d
    return total % 10 == 0 and len(s) >= 13


def test_luhn_differential(spark):
    from crawlspark.textops.curate import luhn_valid
    cases = ["4111111111111111", "4111111111111112", "378282246310005",
             "5500005555555559", "999999999999999999", "1234567890123",
             "4222222222222"]
    df = spark.createDataFrame([(c,) for c in cases], "d STRING")
    rows = df.select("d", luhn_valid(F.col("d")).alias("v")).collect()
    for r in rows:
        assert r.v == _luhn_py(r.d), r.d


def test_scrub_credit_cards(spark):
    from crawlspark.textops.curate import scrub_credit_cards
    df = spark.createDataFrame(
        [(1, "card 4111111111111111 order 4111111111111112 tiny 555"),
         (2, "nothing")],
        "doc_id LONG, text STRING")
    out = {r.doc_id: r for r in scrub_credit_cards(df).collect()}
    assert out[1].clean_text == "card [CC] order 4111111111111112 tiny 555"
    assert out[1].n_cc == 1
    assert out[2].clean_text == "nothing" and out[2].n_cc == 0


def test_vocab_stats_hand_computed(spark):
    from crawlspark.textops.curate import vocab_stats
    df = spark.createDataFrame(
        [("en", "a a a b"), ("en", "a c"), ("de", "x y")],
        "lang STRING, text STRING")
    out = {r.lang: r for r in vocab_stats(df).collect()}
    # en: tokens 6 (a*4, b, c), types 3, hapax 2 (b, c), top 4
    assert out["en"].n_tokens == 6 and out["en"].n_types == 3
    assert out["en"].hapax_permille == 666
    assert out["en"].top_token_permille == 666
    assert out["de"].hapax_permille == 1000


def test_fold_www_dedup(spark):
    from crawlspark.canon import fold_www_dedup
    urls = spark.createDataFrame(
        [("http://www.a.test/p",), ("http://a.test/p",),
         ("http://www.only.test/q",)],
        "url STRING")
    out = {r.hostless_key: r for r in fold_www_dedup(urls).collect()}
    assert out["http://a.test/p"].url == "http://a.test/p"
    assert out["http://a.test/p"].n_variants == 2
    assert out["http://only.test/q"].url == "http://www.only.test/q"
    assert out["http://only.test/q"].n_variants == 1


def test_prune_frontier_three_cuts(spark):
    from crawlspark.scheduler import prune_frontier
    f = spark.createDataFrame(
        [("a.test", "http://a.test/p/1", 900),    # fresh, clean -> kept
         ("a.test", "http://a.test/p/2", 100),    # stale -> dropped
         ("dead.test", "http://dead.test/p/3", 900),  # dead host
         ("a.test", "http://a.test/cal/2020/1", 900)],  # trap template
        "host STRING, url STRING, enqueued_ts LONG")
    traps = spark.createDataFrame(
        [("a.test", "http://a.test/cal/N/N", True),
         ("a.test", "http://a.test/p/N", False)],   # non-trap must NOT cut
        "host STRING, template STRING, trap BOOLEAN")
    dead = spark.createDataFrame([("dead.test",)], "host STRING")
    out = prune_frontier(f, now_ts=1000, max_age_s=500,
                         trap_templates=traps, dead_hosts=dead)
    assert [r.url for r in out.collect()] == ["http://a.test/p/1"]


def test_filter_occupancy(spark):
    from crawlspark.seen import PartitionedSeenFilter, filter_occupancy
    f = PartitionedSeenFilter(spark, num_buckets=4, capacity_per_bucket=64)
    keys = spark.range(40).select(F.col("id").alias("k"))
    f.update(keys, "k")
    out = {r.bucket: r for r in
           filter_occupancy(f.states, 64).collect()}
    assert set(out) == {0, 1, 2, 3}
    for b in out.values():
        assert b.n_keys == 10
        assert b.load_permille == 10 * 1000 // 64
        assert b.saturated is False


def test_epoch_plan_hand_computed(spark):
    from crawlspark.textops.curate import epoch_plan
    src = spark.createDataFrame(
        [("web", 1000, 1), ("books", 50, 5)],
        "source STRING, n_docs LONG, weight LONG")
    out = {r.source: r for r in
           epoch_plan(src, total_docs_per_epoch=600).collect()}
    # web: 600*1//6 = 100 of 1000 -> 100 permille (subsample)
    assert out["web"].target_docs == 100
    assert out["web"].repeat_permille == 100
    # books: 600*5//6 = 500 of 50 -> 10000 permille (10 epochs' worth)
    assert out["books"].target_docs == 500
    assert out["books"].repeat_permille == 10_000
