"""Tests for stupid-backoff bigram scoring, URL front-coding stats,
and microdata summary."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F


def _backoff_py(docs, train_ids):
    """Pure-python twin of bigram_backoff_score."""
    uni, bi, t_tot = {}, {}, 0
    for i, text in docs:
        toks = text.split(" ")
        if i in train_ids:
            for w in toks:
                uni[w] = uni.get(w, 0) + 1
                t_tot += 1
            for a, b in zip(toks, toks[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
    out = {}
    for i, text in docs:
        toks = text.split(" ")
        costs = []
        for a, b in zip(toks, toks[1:]):
            if (a, b) in bi and a in uni:
                c = math.floor(-math.log(bi[(a, b)] / uni[a]) * 1_000_000)
            elif b in uni:
                c = math.floor(-math.log(0.4 * uni[b] / t_tot) * 1_000_000)
            else:
                c = 20_000_000
            costs.append(int(c))
        if costs:
            out[i] = (len(costs), sum(costs) // len(costs))
    return out


def test_bigram_backoff_differential(spark):
    from crawlspark.textops.quality import bigram_backoff_score

    docs = [
        (0, "a b a b c"),
        (1, "a b c d"),          # train
        (2, "c a x y"),          # 'x','y' OOV when training = {1,3}
        (3, "d c a b"),          # train
        (4, "b d"),              # bigram (b,d) unseen -> backoff to d
        (5, "q"),                # single token: no bigrams, no row
    ]
    train = {1, 3}
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    got = {
        r.doc_id: (r.n_bigrams, r.cost_micro_mean)
        for r in bigram_backoff_score(
            df, train_filter=F.col("doc_id").isin(*train)).collect()
    }
    expect = _backoff_py(docs, train)
    assert got == expect
    assert 5 not in got


def test_bigram_backoff_fixture_exercises_all_paths(spark):
    """The gate fixture must hit seen-bigram, backoff and OOV branches
    (otherwise the oracle proves less than claimed)."""
    from crawlspark.suite85 import _bigram_fixture
    from crawlspark.textops.quality import OOV_COST_MICRO

    d = _bigram_fixture(spark, "/root/testdata/sf0.001")
    toks = d.select("doc_id", F.split("text", " ").alias("tk"))
    pairs = toks.select(
        "doc_id",
        F.explode(F.transform(
            F.sequence(F.lit(2), F.size("tk")),
            lambda i: F.struct(
                F.element_at(F.col("tk"), i - 1).alias("prev"),
                F.element_at(F.col("tk"), i).alias("cur")),
        )).alias("p"),
    ).select("doc_id", "p.prev", "p.cur")
    train_b = pairs.filter(F.col("doc_id") % 2 == 0) \
        .select("prev", "cur").distinct()
    train_u = toks.filter(F.col("doc_id") % 2 == 0) \
        .select(F.explode("tk").alias("w")).distinct()
    held = pairs.filter(F.col("doc_id") % 2 != 0)
    n_seen = held.join(train_b, ["prev", "cur"], "left_semi").count()
    unseen = held.join(train_b, ["prev", "cur"], "left_anti")
    n_backoff = unseen.join(
        train_u.withColumnRenamed("w", "cur"), ["cur"], "left_semi").count()
    n_oov = unseen.join(
        train_u.withColumnRenamed("w", "cur"), ["cur"], "left_anti").count()
    assert n_seen > 0 and n_backoff > 0 and n_oov > 0, (
        n_seen, n_backoff, n_oov)


def test_url_front_coding_hand_case(spark):
    from crawlspark.canon import url_front_coding_stats

    rows = [
        Row(host="a", url="http://a/x/1"),
        Row(host="a", url="http://a/x/2"),   # lcp 11
        Row(host="a", url="http://a/x/2"),   # identical: lcp 12 (full)
        Row(host="a", url="zzz"),            # lcp 0
        Row(host="b", url="solo"),           # first row: lcp 0
    ]
    out = {r.host: r for r in
           url_front_coding_stats(spark.createDataFrame(rows)).collect()}
    a = out["a"]
    assert a.n_urls == 4
    assert a.url_bytes == 12 + 12 + 12 + 3
    assert a.saved_bytes == 0 + 11 + 12 + 0
    assert a.saved_permille == (1000 * 23) // 39
    b = out["b"]
    assert b.n_urls == 1 and b.saved_bytes == 0


def test_microdata_summary_cases(spark):
    from crawlspark.extract import microdata_summary

    cases = [
        ('<div itemscope itemtype="https://schema.org/Product">'
         '<span itemprop="name">X</span></div>', 1,
         "https://schema.org/Product", 1, 1),
        # itemscope as last attr before '>'
        ('<div itemscope><span itemprop="a">1</span>'
         '<span itemprop="a">2</span></div>', 1, None, 2, 1),
        # self-closing tag carrying itemscope
        ('<meta itemscope/>', 1, None, 0, 0),
        # no microdata; 'selfitemscope' must NOT count
        ('<div data-selfitemscope>x</div>', 0, None, 0, 0),
        (None, 0, None, 0, 0),
    ]
    df = spark.createDataFrame(
        [Row(i=i, h=h) for i, (h, *_) in enumerate(cases)],
        "i int, h string")
    out = {r.i: r for r in df.select(
        "i", microdata_summary(F.col("h")).alias("m")).select(
        "i", "m.*").collect()}
    for i, (h, n_scopes, ftype, n_props, n_distinct) in enumerate(cases):
        r = out[i]
        assert r.n_itemscopes == n_scopes, (i, h, r.n_itemscopes)
        assert r.first_itemtype == ftype, (i, h)
        assert r.n_props == n_props, (i, h)
        assert r.n_distinct_props == n_distinct, (i, h)
