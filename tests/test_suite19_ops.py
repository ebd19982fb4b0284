"""Round-2 part-17 operators: hreflang reciprocity (property test)."""

from pyspark.sql import functions as F


def test_hreflang_reciprocity_join(spark):
    from crawlspark.extract import extract_hreflang
    # A <-> B reciprocal; A -> C one-way; C declares nothing back
    pages = spark.createDataFrame(
        [("http://x/a",
          '<link rel="alternate" hreflang="de" href="http://x/b">'
          '<link rel="alternate" hreflang="xx" href="http://x/c">'),
         ("http://x/b",
          '<link rel="alternate" hreflang="en" href="http://x/a">'),
         ("http://x/c", "<html></html>")],
        "page_url STRING, body STRING")
    decls = pages.select(
        "page_url",
        F.explode(F.transform(extract_hreflang(F.col("body")),
                              lambda a: a["url"])).alias("alt_url"),
    )
    back = decls.select(F.col("page_url").alias("bp"),
                        F.col("alt_url").alias("ba")).distinct()
    out = decls.join(
        back, (decls["alt_url"] == back["bp"])
        & (decls["page_url"] == back["ba"]), "left"
    ).select("page_url", "alt_url", F.col("bp").isNotNull().alias("r"))
    got = {(r.page_url, r.alt_url): r.r for r in out.collect()}
    assert got[("http://x/a", "http://x/b")] is True
    assert got[("http://x/b", "http://x/a")] is True
    assert got[("http://x/a", "http://x/c")] is False


def test_image_safety_route_thresholds(spark):
    from crawlspark.mmcurate import (
        SAFETY_WEIGHTS_MICRO,
        image_safety_route,
    )

    def score_py(ph):
        return sum(SAFETY_WEIGHTS_MICRO[(ph >> (4 * k)) & 15]
                   for k in range(16))

    phs = [0, 0x1111111111111111, 0x0123456789ABCDEF, 77777777777]
    df = spark.createDataFrame([(f"i{i}", p) for i, p in enumerate(phs)],
                               "image_id STRING, phash LONG")
    out = {r.image_id: r for r in image_safety_route(df).collect()}
    for i, p in enumerate(phs):
        exp = score_py(p)
        r = out[f"i{i}"]
        assert r.safety_micro == exp
        exp_route = ("drop" if exp >= 60_000
                     else "review" if exp >= 20_000 else "keep")
        assert r.route == exp_route


def test_truncate_head_tail(spark):
    from crawlspark.textops.curate import truncate_head_tail
    long = " ".join(f"w{i}" for i in range(100))
    short = "just a few words"
    df = spark.createDataFrame([(1, long), (2, short)],
                               "doc_id LONG, text STRING")
    out = {r.doc_id: r for r in
           truncate_head_tail(df, head_tokens=5, tail_tokens=3).collect()}
    assert out[1].truncated is True
    assert out[1].text_out == "w0 w1 w2 w3 w4 ... w97 w98 w99"
    assert out[2].truncated is False and out[2].text_out == short


def test_indexnow_batching(spark):
    from crawlspark.sinks import indexnow_batches
    changed = spark.createDataFrame(
        [("h", f"http://h/{i:03d}") for i in range(7)]
        + [("g", "http://g/only")],
        "host STRING, url STRING")
    out = {(r.host, r.batch_no): r for r in
           indexnow_batches(changed, batch_max=3).collect()}
    assert out[("h", 0)].n_urls == 3
    assert out[("h", 0)].urls == [f"http://h/{i:03d}" for i in range(3)]
    assert out[("h", 1)].n_urls == 3
    assert out[("h", 2)].n_urls == 1     # short tail batch
    assert out[("g", 0)].n_urls == 1


def test_cloaking_needs_hash_and_skew(spark):
    from crawlspark.textops.quality import detect_cloaking
    bot = spark.createDataFrame(
        [("u1", "ha", 500), ("u2", "hx", 4000), ("u3", "same", 4000)],
        "url STRING, content_hash STRING, n_chars LONG")
    browser = spark.createDataFrame(
        [("u1", "hb", 4000),   # different hash + big skew -> cloaked
         ("u2", "hy", 4010),   # different hash, tiny skew -> nonce, clean
         ("u3", "same", 400)],  # same hash, big skew -> clean (no diff)
        "url STRING, content_hash STRING, n_chars LONG")
    out = {r.url: r.cloaked for r in
           detect_cloaking(bot, browser).collect()}
    assert out == {"u1": True, "u2": False, "u3": False}


def test_hidden_links_honeypots(spark):
    from crawlspark.extract import hidden_links
    body = ('<a href="/ok">v</a>'
            '<a style="display:none" href="/d">t</a>'
            '<a style="color:red; visibility:hidden" href="/v">t</a>'
            '<a hidden href="/h">t</a>'
            '<a hidden="hidden" href="/h2">t</a>'
            '<a aria-hidden="true" href="/aria">not-a-trap</a>')
    got = sorted(spark.range(1).select(
        hidden_links(F.lit(body)).alias("u")).head().u)
    assert got == ["/d", "/h", "/h2", "/v"]


def test_retry_after_both_forms(spark):
    from crawlspark.robots import retry_after_seconds
    now = 1_750_000_000
    df = spark.createDataFrame(
        [("120",), ("Fri, 13 Jun 2025 20:31:40 GMT",), ("soon",)],
        "h STRING")
    rows = df.select(
        retry_after_seconds(F.col("h"), now).alias("w")).collect()
    assert rows[0].w == 120
    # that date IS epoch 1749846700 (past) -> clamps to 0
    assert rows[1].w == 0
    assert rows[2].w is None


def test_warc_record_types(spark):
    from crawlspark.warc import warc_record_types
    f = spark.createDataFrame(
        [("u1", 100, "hA"), ("u2", 200, "hA"), ("u3", 150, "hA"),
         ("u4", 100, "hB")],
        "url STRING, fetch_ts LONG, content_hash STRING")
    out = {r.url: r for r in warc_record_types(f).collect()}
    # earliest fetch of hA is the response; later ones refer to it
    assert out["u1"].record_type == "response"
    assert out["u1"].refers_to_url is None
    assert out["u3"].record_type == "revisit"
    assert out["u3"].refers_to_url == "u1"
    assert out["u2"].refers_to_url == "u1"
    assert out["u4"].record_type == "response"


def test_bitext_candidates(spark):
    from crawlspark.textops.curate import bitext_candidates
    d = spark.createDataFrame(
        [("c1", 1, "en", 1000), ("c1", 2, "de", 1100), ("c1", 3, "fr", 100),
         ("c2", 4, "de", 500)],   # no pivot -> no pairs
        "cluster_key STRING, doc_id LONG, lang STRING, n_chars LONG")
    out = {(r.src_id, r.tgt_id): r for r in bitext_candidates(d).collect()}
    assert out[(1, 2)].plausible is True
    assert out[(1, 3)].plausible is False   # stub: ratio 100 permille
    assert all(k[0] == 1 for k in out)      # only pivot-anchored pairs


def test_cap_out_degree_preserves_true_degree(spark):
    from crawlspark.linkgraph import cap_out_degree
    edges = spark.createDataFrame(
        [("hub", f"d{i:02d}") for i in range(10)] + [("small", "x")],
        "src STRING, dst STRING")
    out = cap_out_degree(edges, cap=4).collect()
    hub = [r for r in out if r.src == "hub"]
    assert len(hub) == 4
    assert sorted(r.dst for r in hub) == ["d00", "d01", "d02", "d03"]
    # original degree survives for honest normalization downstream
    assert all(r.src_degree == 10 for r in hub)
    small = [r for r in out if r.src == "small"]
    assert len(small) == 1 and small[0].src_degree == 1


def test_retention_sweep(spark):
    from crawlspark.checkpoint import retention_sweep
    snaps = spark.createDataFrame(
        [("u", 100), ("u", 300), ("u", 200), ("v", 50)],
        "url STRING, fetch_ts LONG")
    out = {(r.url, r.fetch_ts): r for r in
           retention_sweep(snaps, keep_last=2).collect()}
    assert out[("u", 300)].keep is True and out[("u", 300)].capture_rank == 1
    assert out[("u", 200)].keep is True
    assert out[("u", 100)].keep is False
    assert out[("v", 50)].keep is True


def test_keepalive_connections(spark):
    from crawlspark.politeness import keepalive_connections
    sched = spark.createDataFrame(
        # h1: gaps 1s (reuse after first); h2: 9s gaps (churn each time)
        [("h1", 0, 500), ("h1", 1500, 2000), ("h1", 3000, 3500),
         ("h2", 0, 500), ("h2", 9500, 10_000)],
        "host STRING, fetch_start_ms LONG, fetch_end_ms LONG")
    out = {r.host: r for r in
           keepalive_connections(sched, keepalive_ms=5000).collect()}
    assert out["h1"].n_connections == 1
    assert out["h1"].churn_permille == 333
    assert out["h2"].n_connections == 2
    assert out["h2"].churn_permille == 1000


def test_detect_link_exchange(spark):
    from crawlspark.linkgraph import detect_link_exchange
    edges = ([("x", "y")] * 10 + [("y", "x")] * 9      # symmetric, heavy
             + [("a", "b")] * 20                        # one-way
             + [("c", "d")] * 10 + [("d", "c")] * 2)    # asymmetric
    df = spark.createDataFrame(edges, "src_host STRING, dst_host STRING")
    out = {(r.host_a, r.host_b): r for r in
           detect_link_exchange(df).collect()}
    assert out[("x", "y")].exchange is True
    assert out[("c", "d")].exchange is False   # symmetry 200 < 800
    assert ("a", "b") not in out               # no reverse direction


def test_cap_robots_body_line_safe(spark):
    from crawlspark.robots import cap_robots_body
    body = "User-agent: *\nDisallow: /admin-stuff\nDisallow: /late\n"
    df = spark.createDataFrame([(body,)], "b STRING")
    # cap lands inside '/admin-stuff': the WHOLE half-line must go, not
    # just its tail (a truncated prefix would parse as Disallow: /adm)
    got = df.select(cap_robots_body(F.col("b"), cap_bytes=30).alias("c")
                    ).head().c
    assert got == "User-agent: *\n"
    # under the cap: untouched
    got2 = df.select(cap_robots_body(F.col("b"), cap_bytes=9999).alias("c")
                     ).head().c
    assert got2 == body
    # no newline inside the cap at all -> nothing parseable survives
    df3 = spark.createDataFrame([("x" * 100,)], "b STRING")
    assert df3.select(cap_robots_body(F.col("b"), cap_bytes=10).alias("c")
                      ).head().c == ""


def test_sitemap_video_alignment(spark):
    from crawlspark.extract import sitemap_video_entries
    body = ("<urlset><url><loc>http://v/p1</loc>"
            "<video:video><video:content_loc>m1.mp4</video:content_loc>"
            "<video:title>one</video:title>"
            "<video:duration>30</video:duration></video:video></url>"
            "<url><loc>http://v/p2</loc></url>"  # no videos
            "</urlset>")
    got = (spark.range(1)
           .select(F.explode(sitemap_video_entries(F.lit(body))).alias("e"))
           .select("e.*").collect())
    assert len(got) == 1
    assert (got[0].page_url, got[0].video_url, got[0].duration_s) == (
        "http://v/p1", "m1.mp4", 30)


def test_feed_enclosures(spark):
    from crawlspark.extract import feed_enclosures
    body = ('<rss><item><link>http://p/e1</link>'
            '<enclosure url="http://c/a.mp3" type="audio/mpeg" '
            'length="123"/></item>'
            "<item><link>http://p/e2</link></item></rss>")
    got = (spark.range(1)
           .select(F.explode(feed_enclosures(F.lit(body))).alias("e"))
           .select("e.*").collect())
    assert len(got) == 1
    assert got[0].media_url == "http://c/a.mp3"
    assert got[0].media_type == "audio/mpeg"
    assert got[0].length_bytes == 123


def test_pagerank_warm_start_equivalence(spark):
    from crawlspark.linkgraph import pagerank
    n = 40
    cold = {r.doc: r.rank_scaled for r in
            pagerank(spark, n, iters=4).collect()}
    warm3 = pagerank(spark, n, iters=3)
    resumed = {r.doc: r.rank_scaled for r in pagerank(
        spark, n, iters=1,
        init_ranks=warm3.selectExpr("doc", "rank_scaled as r"),
    ).collect()}
    # integer arithmetic: 3+1 warm == 4 cold, bit for bit
    assert resumed == cold


def test_snippet_word_boundary(spark):
    import sys
    sys.path.insert(0, "/root/repo")
    from crawlspark.suite20 import q_snippets  # noqa: F401 (fixture reuse)
    from pyspark.sql import functions as FF
    # direct check of the fold semantics on controlled text
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "x " * 100)],
        "doc_id LONG, text STRING")
    toks = FF.filter(FF.split(FF.col("text"), r"\s+"), lambda w: w != "")
    prefix = FF.aggregate(
        toks,
        FF.struct(FF.lit("").alias("acc"), FF.lit(False).alias("stop")),
        lambda st, w: FF.when(
            st["stop"] | ((FF.length(st["acc"]) + FF.length(w) + 1) > 80),
            FF.struct(st["acc"].alias("acc"), FF.lit(True).alias("stop")),
        ).otherwise(FF.struct(
            FF.when(st["acc"] == "", w)
            .otherwise(FF.concat(st["acc"], FF.lit(" "), w)).alias("acc"),
            FF.lit(False).alias("stop"))),
    )
    out = {r.doc_id: r for r in df.select(
        "doc_id", prefix["acc"].alias("a"), prefix["stop"].alias("s")
    ).collect()}
    assert out[1].a == "alpha beta gamma" and out[1].s is False
    # 100 'x' tokens: 40 fit in 80 chars (40*2-1=79), 41st would hit 81
    assert out[2].s is True
    assert len(out[2].a) <= 80 and out[2].a.split(" ") == ["x"] * 40


def test_shard_integrity_violations(spark):
    from pyspark.sql import functions as FF
    assigned = spark.createDataFrame(
        [("d1", "s1"), ("d1", "s2"), ("d2", "s1"), ("d3", "s3"),
         ("d3", "s3")],  # same-shard twice is NOT a violation
        "doc STRING, shard STRING")
    dup = assigned.groupBy("doc").agg(
        FF.countDistinct("shard").alias("n")).filter(FF.col("n") > 1)
    assert [r.doc for r in dup.collect()] == ["d1"]


def test_retention_sweep_equal_ts_deterministic(spark):
    """Equal-timestamp captures (same wave / coarse clock) must get the
    SAME capture_rank on every run: the window tiebreaks on a full-row
    hash, not partition luck (ADVICE r2)."""
    from crawlspark.checkpoint import retention_sweep

    rows = [("http://t.test/p", 100, f"H{i}") for i in range(6)]
    df = spark.createDataFrame(
        rows, "url STRING, fetch_ts LONG, content_hash STRING")
    runs = []
    for n_part in (1, 4, 7):
        swept = retention_sweep(df.repartition(n_part), keep_last=3)
        runs.append(sorted(
            (r.content_hash, r.capture_rank, r.keep)
            for r in swept.collect()))
    assert runs[0] == runs[1] == runs[2]
    assert sum(1 for _, _, k in runs[0] if k) == 3
