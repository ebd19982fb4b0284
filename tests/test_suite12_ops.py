"""Round-2 part-10 operators: crawl diff, host migration, boilerplate."""

from pyspark.sql import functions as F

from crawlspark.canon import detect_host_migrations
from crawlspark.checkpoint import crawl_diff
from crawlspark.textops.quality import boilerplate_shingles


def test_crawl_diff_four_states(spark):
    prev = spark.createDataFrame(
        [("u1", "h1"), ("u2", "h2"), ("u3", "h3")],
        "url STRING, content_hash STRING")
    cur = spark.createDataFrame(
        [("u1", "h1"), ("u2", "h2x"), ("u4", "h4")],
        "url STRING, content_hash STRING")
    out = {r.url: r.change for r in crawl_diff(prev, cur).collect()}
    assert out == {"u1": "unchanged", "u2": "modified",
                   "u3": "removed", "u4": "added"}


def test_host_migration_thresholds(spark):
    rows = []
    # moved.test -> target.test: 6 permanent redirects (migrated)
    rows += [(f"http://moved.test/p{i}", f"http://target.test/p{i}", 301)
             for i in range(6)]
    # split.test: 3 to a, 3 to b (share 500 each -> not migrated)
    rows += [(f"http://split.test/a{i}", f"http://a.test/x{i}", 308)
             for i in range(3)]
    rows += [(f"http://split.test/b{i}", f"http://b.test/x{i}", 301)
             for i in range(3)]
    # tmp.test: 302s only -> excluded entirely
    rows += [(f"http://tmp.test/p{i}", f"http://t.test/p{i}", 302)
             for i in range(9)]
    # self.test: redirects within the host -> excluded
    rows += [(f"http://self.test/p{i}", f"http://self.test/q{i}", 301)
             for i in range(9)]
    df = spark.createDataFrame(rows, "src_url STRING, dst_url STRING,"
                                     " status INT")
    out = {(r.src_host, r.dst_host): r
           for r in detect_host_migrations(df).collect()}
    assert out[("moved.test", "target.test")].migrated is True
    assert out[("moved.test", "target.test")].share_permille == 1000
    assert out[("split.test", "a.test")].migrated is False
    assert ("tmp.test", "t.test") not in out
    assert all(k[0] != "self.test" for k in out)


def test_boilerplate_shingles(spark):
    docs = spark.createDataFrame(
        [("h", i, f"cookie banner text unique{i} word{i}") for i in range(4)]
        + [("tiny", 9, "cookie banner text below min docs")],
        "host STRING, doc_id LONG, text STRING")
    out = {(r.host, r.shingle): r
           for r in boilerplate_shingles(docs).collect()}
    assert ("h", "cookie banner text") in out
    assert out[("h", "cookie banner text")].share_permille == 1000
    # shingles containing unique words never flag; tiny hosts never flag
    assert all(h == "h" for h, _ in out)
    assert all("unique" not in s for _, s in out)
