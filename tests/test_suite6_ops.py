"""Round-2 part-4 operators: HITS hub/authority, conditional-GET
revalidation, overlapping token chunking, host reputation."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from crawlspark.linkgraph import HITS_SCALE, hits
from crawlspark.scheduler import host_reputation
from crawlspark.sinks import revalidation_outcomes, revalidation_plan
from crawlspark.textops.curate import chunk_tokens


# -- HITS --------------------------------------------------------------------

def _hits_py(n, edges, iters, scale=HITS_SCALE):
    """Pure-python replay of the integer HITS recurrence."""
    h = {v: scale // n for v in range(n)}
    a = {}
    for _ in range(iters):
        a_raw = {}
        for s, d in edges:
            a_raw[d] = a_raw.get(d, 0) + h[s]
        t = sum(a_raw.values())
        a = {v: a_raw.get(v, 0) * scale // t for v in range(n)}
        h_raw = {}
        for s, d in edges:
            h_raw[s] = h_raw.get(s, 0) + a[d]
        t = sum(h_raw.values())
        h = {v: h_raw.get(v, 0) * scale // t for v in range(n)}
    return a, h


def test_hits_differential_formula_graph(spark):
    """Spark HITS == pure-python integer replay on the n=50 formula graph."""
    n = 50
    edges = [
        (s, d)
        for s in range(n)
        for d in ((2 * s + 1) % n, (2 * s + 2) % n, (5 * s + 3) % n,
                  (s + 17) % n)
    ]
    exp_a, exp_h = _hits_py(n, edges, iters=2)
    rows = hits(spark, n, iters=2).collect()
    assert len(rows) == n
    for r in rows:
        assert r.auth_scaled == exp_a[r.doc], r
        assert r.hub_scaled == exp_h[r.doc], r


def test_hits_hub_authority_separation(spark):
    """A pure hub (points at everything, nothing points at it) gets hub
    score ~scale and authority 0; the targets split the authority mass."""
    edges = spark.createDataFrame(
        [Row(src=0, dst=1), Row(src=0, dst=2), Row(src=0, dst=3)]
    )
    rows = {r.doc: r for r in hits(spark, 4, iters=2,
                                   edges_df=edges).collect()}
    assert rows[0].auth_scaled == 0
    assert rows[0].hub_scaled == HITS_SCALE
    for v in (1, 2, 3):
        assert rows[v].hub_scaled == 0
        assert abs(rows[v].auth_scaled - HITS_SCALE // 3) <= 1


def test_hits_l1_normalized(spark):
    """Integer L1 normalization: per side, scores sum to scale within
    one floor-rounding unit per node."""
    n = 40
    agg = hits(spark, n, iters=2).agg(
        F.sum("auth_scaled").alias("a"), F.sum("hub_scaled").alias("h")
    ).head()
    assert HITS_SCALE - n <= agg.a <= HITS_SCALE
    assert HITS_SCALE - n <= agg.h <= HITS_SCALE


# -- conditional revalidation ------------------------------------------------

def _plan(spark, rows, now_ts=10_000, ttl_s=100):
    df = spark.createDataFrame(rows)
    return {
        r.url: r
        for r in revalidation_plan(df, now_ts=now_ts, ttl_s=ttl_s).collect()
    }


def test_revalidation_plan_actions(spark):
    rows = [
        Row(url="u-fresh", etag="e1", last_modified_ts=None, fetched_ts=9950),
        Row(url="u-etag", etag="e2", last_modified_ts=500, fetched_ts=9000),
        Row(url="u-lm", etag=None, last_modified_ts=700, fetched_ts=9000),
        Row(url="u-none", etag=None, last_modified_ts=None, fetched_ts=9000),
    ]
    p = _plan(spark, rows)
    assert p["u-fresh"].action == "fresh" and p["u-fresh"].cond_header is None
    # ETag wins over Last-Modified when both exist (RFC 9110 preference)
    assert p["u-etag"].action == "revalidate"
    assert p["u-etag"].cond_header == "If-None-Match"
    assert p["u-etag"].cond_value == "e2"
    assert p["u-lm"].cond_header == "If-Modified-Since"
    assert p["u-lm"].cond_value == "700"
    assert p["u-none"].action == "refetch" and p["u-none"].cond_header is None


def test_revalidation_outcomes(spark):
    cache = spark.createDataFrame([
        Row(url="u-304e", etag="e1", last_modified_ts=None, fetched_ts=0),
        Row(url="u-200e", etag="e2", last_modified_ts=None, fetched_ts=0),
        Row(url="u-304lm", etag=None, last_modified_ts=700, fetched_ts=0),
        Row(url="u-200lm", etag=None, last_modified_ts=700, fetched_ts=0),
        Row(url="u-fresh", etag="e9", last_modified_ts=None,
            fetched_ts=9_999),
    ])
    plan = revalidation_plan(cache, now_ts=10_000, ttl_s=100)
    server = spark.createDataFrame([
        Row(url="u-304e", cur_etag="e1", cur_modified_ts=0),
        Row(url="u-200e", cur_etag="CHANGED", cur_modified_ts=0),
        Row(url="u-304lm", cur_etag=None, cur_modified_ts=700),
        Row(url="u-200lm", cur_etag=None, cur_modified_ts=701),
        Row(url="u-fresh", cur_etag="e9", cur_modified_ts=0),
    ])
    out = {r.url: r for r in
           revalidation_outcomes(plan, server, now_ts=10_000).collect()}
    assert out["u-304e"].status == 304
    assert out["u-200e"].status == 200
    assert out["u-304lm"].status == 304
    assert out["u-200lm"].status == 200
    # fresh rows never reach the origin
    assert "u-fresh" not in out
    assert all(r.new_fetched_ts == 10_000 for r in out.values())


# -- chunk_tokens ------------------------------------------------------------

def test_chunk_overlap_reconstruction(spark):
    """Chunks at stride s reconstruct the doc: first chunk + the tail
    (tokens after the overlap) of every later chunk."""
    words = " ".join(f"w{i}" for i in range(75))
    df = spark.createDataFrame([Row(doc_id=1, text=words)])
    rows = sorted(
        chunk_tokens(df, chunk_size=32, stride=24).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts 0, 24, 48, 72 (72 < 75 so a short tail chunk exists)
    assert [r.start_tok for r in rows] == [0, 24, 48, 72]
    assert [r.n_tok for r in rows] == [32, 32, 27, 3]
    rebuilt = rows[0].chunk_text.split(" ")
    for r in rows[1:]:
        toks = r.chunk_text.split(" ")
        assert toks[: 32 - 24] == rebuilt[r.start_tok: r.start_tok + 8]
        rebuilt = rebuilt[: r.start_tok] + toks
    assert " ".join(rebuilt) == words


def test_chunk_exact_boundary_and_empty(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text=" ".join(f"w{i}" for i in range(24))),
        Row(doc_id=2, text="   "),
    ])
    rows = chunk_tokens(df, chunk_size=32, stride=24).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 24 tokens < 32: one chunk only (next start 24 >= n_tokens)
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_tok == 24
    # empty doc still yields one accounted (empty) chunk
    assert len(by_doc[2]) == 1
    assert by_doc[2][0].n_tok == 0 and by_doc[2][0].chunk_text == ""


# -- host_reputation ---------------------------------------------------------

def test_host_reputation_hand_computed(spark):
    pages = spark.createDataFrame(
        # h1: q 600/400, one error -> mean 500, err 500 permille
        [Row(host="h1", quality_permille=600, is_error=True,
             is_dup=False, is_trap=False),
         Row(host="h1", quality_permille=400, is_error=False,
             is_dup=False, is_trap=False),
         # h2: perfect
         Row(host="h2", quality_permille=900, is_error=False,
             is_dup=False, is_trap=False),
         # h3: all-bad single page
         Row(host="h3", quality_permille=100, is_error=True,
             is_dup=True, is_trap=True)]
    )
    out = {r.host: r for r in host_reputation(pages).collect()}
    assert out["h1"].mean_quality_permille == 500
    assert out["h1"].error_permille == 500
    # 500 - 300*500//1000 = 350
    assert out["h1"].reputation_permille == 350
    assert out["h2"].reputation_permille == 900
    # 100 - 300 - 300 - 400 < 0 -> clamped to 0
    assert out["h3"].reputation_permille == 0


def test_host_reputation_min_pages_null(spark):
    pages = spark.createDataFrame(
        [Row(host="big", quality_permille=500, is_error=False,
             is_dup=False, is_trap=False)] * 3
        + [Row(host="tiny", quality_permille=900, is_error=False,
               is_dup=False, is_trap=False)]
    )
    out = {r.host: r for r in host_reputation(pages, min_pages=2).collect()}
    assert out["big"].reputation_permille == 500
    # below the evidence floor: NULL, scheduler falls back to default tier
    assert out["tiny"].reputation_permille is None
    assert out["tiny"].n_pages == 1


# -- img_srcset_candidates ---------------------------------------------------

def _pick(spark, body, page="http://h.test/d/1/page.html", max_width=800):
    from crawlspark.extract import img_srcset_candidates
    return (
        spark.range(1)
        .select(F.explode(img_srcset_candidates(
            F.lit(body), F.lit(page), max_width=max_width)).alias("i"))
        .select("i.*")
        .collect()
    )


def test_srcset_budget_pick(spark):
    rows = _pick(spark, '<img src="/a.jpg" srcset="/a-320.jpg 320w, '
                        '/a-640.jpg 640w, /a-1280.jpg 1280w">')
    assert len(rows) == 1
    assert rows[0].chosen_url == "http://h.test/a-640.jpg"
    assert rows[0].chosen_w == 640 and rows[0].n_candidates == 3


def test_srcset_all_too_big_picks_smallest(spark):
    rows = _pick(spark, '<img srcset="/a-1600.jpg 1600w, /a-2000.jpg 2000w">')
    assert rows[0].chosen_w == 1600
    assert rows[0].chosen_url == "http://h.test/a-1600.jpg"


def test_srcset_density_descriptors_fall_back_to_src(spark):
    # x-descriptors carry no width -> no sized candidate -> bare src wins
    rows = _pick(spark, '<img src="/base.jpg" srcset="/a.jpg 1x, /b.jpg 2x">')
    assert rows[0].chosen_w is None
    assert rows[0].chosen_url == "http://h.test/base.jpg"


def test_srcset_relative_resolution_and_order(spark):
    body = ('<img src="/abs.png"><img src="rel.png">'
            '<img src="http://cdn.test/x.png">')
    rows = sorted(_pick(spark, body), key=lambda r: r.img_ord)
    assert [r.chosen_url for r in rows] == [
        "http://h.test/abs.png",
        "http://h.test/d/1/rel.png",
        "http://cdn.test/x.png",
    ]
    assert [r.img_ord for r in rows] == [0, 1, 2]


# -- sitemap_image_entries ---------------------------------------------------

def test_sitemap_images_alignment(spark):
    from crawlspark.extract import sitemap_image_entries
    body = ("<urlset>"
            "<url><loc>http://s.test/p1</loc>"
            "<image:image><image:loc>i1.jpg</image:loc>"
            "<image:caption>one</image:caption></image:image></url>"
            "<url><loc>http://s.test/p2</loc></url>"  # no images
            "<url><loc>http://s.test/p3</loc>"
            "<image:image><image:loc>i3a.jpg</image:loc>"
            "<image:caption>a</image:caption></image:image>"
            "<image:image><image:loc>i3b.jpg</image:loc>"
            "<image:caption>b</image:caption></image:image></url>"
            "</urlset>")
    rows = (
        spark.range(1)
        .select(F.explode(sitemap_image_entries(F.lit(body))).alias("e"))
        .select("e.*").collect()
    )
    got = sorted((r.page_url, r.image_url, r.caption) for r in rows)
    # p2 (imageless) contributes nothing; each image pairs with ITS page
    assert got == [
        ("http://s.test/p1", "i1.jpg", "one"),
        ("http://s.test/p3", "i3a.jpg", "a"),
        ("http://s.test/p3", "i3b.jpg", "b"),
    ]


# -- sniff_image_format ------------------------------------------------------

def test_sniff_image_format_magics(spark):
    from crawlspark.images import sniff_image_format
    cases = [
        ("FFD8FFE000104A464946", "jpeg"),
        ("89504E470D0A1A0A", "png"),
        ("474946383961", "gif"),
        ("524946462A000000574542505650", "webp"),
        ("424DAA00", "bmp"),
        ("52494646AA000000AAAAAAAA", "unknown"),  # RIFF but not WEBP
        ("00112233", "unknown"),
    ]
    df = spark.createDataFrame([(h, e) for h, e in cases], "hex STRING, exp STRING")
    rows = df.select(
        "exp", sniff_image_format(F.unhex(F.col("hex"))).alias("got")
    ).collect()
    for r in rows:
        assert r.got == r.exp, r


def test_srcset_imageless_page_empty_array(spark):
    """A page with zero <img> tags must yield an EMPTY candidate array,
    not two phantom structs from sequence(0,-1) zip_with padding
    (ADVICE r2)."""
    from crawlspark.extract import img_srcset_candidates
    n = (
        spark.range(1)
        .select(F.size(img_srcset_candidates(
            F.lit("<p>plain text, no images</p>"),
            F.lit("http://h.test/d/page.html"))).alias("n"))
        .collect()[0].n
    )
    assert n == 0
