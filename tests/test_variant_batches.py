"""Tests for round-3 part-2 ops: image variant folding, boilerplate
captions, fixed-size bucket batches."""

from pyspark.sql import functions as F

from crawlspark.extract import fold_image_variants
from crawlspark.mmcurate import bucket_batches, caption_boilerplate


def test_variant_fold_dpr_beats_original(spark):
    urls = spark.createDataFrame(
        [("https://c.ex/a.jpg",), ("https://c.ex/a@2x.jpg",),
         ("https://c.ex/a-300x200.jpg",)],
        "url STRING",
    )
    row = fold_image_variants(urls).collect()[0]
    assert row["stem"] == "https://c.ex/a.jpg"
    assert row["n_variants"] == 3
    assert row["chosen_url"] == "https://c.ex/a@2x.jpg"


def test_variant_fold_original_beats_downscales(spark):
    urls = spark.createDataFrame(
        [("https://c.ex/b.png",), ("https://c.ex/b_640w.png",),
         ("https://c.ex/b_1280w.png",)],
        "url STRING",
    )
    row = fold_image_variants(urls).collect()[0]
    assert row["chosen_url"] == "https://c.ex/b.png"
    assert row["n_variants"] == 3


def test_variant_fold_largest_downscale_without_original(spark):
    urls = spark.createDataFrame(
        [("https://c.ex/c-300x200.webp",), ("https://c.ex/c-600x400.webp",)],
        "url STRING",
    )
    row = fold_image_variants(urls).collect()[0]
    assert row["chosen_url"] == "https://c.ex/c-600x400.webp"
    assert row["chosen_rank"] == 600


def test_variant_fold_yearlike_suffix_is_not_a_variant(spark):
    # 'report-2024.jpg' has no WxH / _Nw / @kx shape -> its own stem
    urls = spark.createDataFrame(
        [("https://c.ex/report-2024.jpg",), ("https://c.ex/report.jpg",)],
        "url STRING",
    )
    out = {r["stem"] for r in fold_image_variants(urls).collect()}
    assert out == {"https://c.ex/report-2024.jpg", "https://c.ex/report.jpg"}


def test_caption_boilerplate_normalization_and_flag(spark):
    pairs = spark.createDataFrame(
        [("  Stock Photo ", 1), ("stock photo", 2), ("STOCK PHOTO", 3),
         ("mona lisa", 7), ("mona lisa", 7), ("mona lisa", 7)],
        "caption STRING, phash LONG",
    )
    rows = {r["caption_norm"]: r for r in
            caption_boilerplate(pairs, min_distinct_images=3).collect()}
    sp = rows["stock photo"]
    assert sp["n_pairs"] == 3 and sp["n_distinct_images"] == 3
    assert sp["is_boilerplate"]
    # one image reposted many times is NOT boilerplate alt-text
    ml = rows["mona lisa"]
    assert ml["n_pairs"] == 3 and ml["n_distinct_images"] == 1
    assert not ml["is_boilerplate"]


def test_bucket_batches_shape(spark):
    # 10 tall + 17 wide, batch=4 -> tall: 2 full batches + 2 dropped;
    # wide: 4 full + 1 dropped; batch_uid contiguous over buckets
    rows = [(f"t{i:02d}", "tall") for i in range(10)]
    rows += [(f"w{i:02d}", "wide") for i in range(17)]
    imgs = spark.createDataFrame(rows, "image_id STRING, bucket STRING")
    out = bucket_batches(imgs, batch_size=4).collect()

    kept = [r for r in out if r["kept"]]
    dropped = [r for r in out if not r["kept"]]
    assert len(dropped) == (10 % 4) + (17 % 4)
    assert all(r["batch_uid"] is None for r in dropped)

    by_batch = {}
    for r in kept:
        by_batch.setdefault(r["batch_uid"], []).append(r)
    assert sorted(by_batch) == list(range(2 + 4))  # contiguous global ids
    for members in by_batch.values():
        assert len(members) == 4
        assert sorted(m["slot"] for m in members) == [0, 1, 2, 3]
        assert len({m["bucket"] for m in members}) == 1  # never mixed


def test_bucket_batches_exact_multiple_drops_nothing(spark):
    imgs = spark.createDataFrame(
        [(f"x{i}", "square") for i in range(8)],
        "image_id STRING, bucket STRING",
    )
    out = bucket_batches(imgs, batch_size=4).collect()
    assert all(r["kept"] for r in out)
    assert {r["batch_uid"] for r in out} == {0, 1}


def test_compaction_plan(spark):
    from crawlspark.sinks import compaction_plan

    files = spark.createDataFrame(
        [("p0", "a", 3), ("p0", "b", 3), ("p0", "c", 3), ("p0", "d", 3),
         ("p0", "e", 100),            # over the small bar: excluded
         ("p1", "f", 3), ("p1", "g", 3), ("p1", "h", 9)],
        "partition STRING, file_id STRING, bytes LONG",
    )
    out = {(r["partition"], r["group_uid"]): r for r in
           compaction_plan(files, small_bytes=50, target_bytes=8).collect()}
    # p0: offsets 0,3,6 -> group 0 (a,b,c); d at offset 9 -> group 1,
    # singleton, dropped; e over the small bar, never packed.
    # p1: f:0, g:3, h:6 all under the 8-byte boundary -> one group,
    # global uid = p0's 2 local shards + 0 = 2.
    assert set(out) == {("p0", 0), ("p1", 2)}
    assert out[("p0", 0)]["file_ids"] == ["a", "b", "c"]
    assert out[("p0", 0)]["total_bytes"] == 9
    assert out[("p1", 2)]["file_ids"] == ["f", "g", "h"]
    assert out[("p1", 2)]["total_bytes"] == 15


def test_variant_fold_differential(spark):
    """Seeded random URL corpus vs a pure-Python reference of the
    variant-fold semantics (one Spark job, hypothesis-style coverage)."""
    import random
    import re

    rng = random.Random(20260819)
    exts = ["jpg", "jpeg", "png", "webp"]
    urls = []
    for i in range(400):
        stem = f"https://cdn{rng.randrange(3)}.ex/a/{rng.randrange(40)}"
        ext = rng.choice(exts)
        kind = rng.randrange(6)
        if kind == 0:
            u = f"{stem}-{rng.randrange(10, 2000)}x{rng.randrange(10, 2000)}.{ext}"
        elif kind == 1:
            u = f"{stem}_{rng.randrange(10, 2000)}w.{ext}"
        elif kind == 2:
            u = f"{stem}@{rng.choice([2, 3])}x.{ext}"
        elif kind == 3:
            u = f"{stem}-{rng.randrange(1900, 2030)}.{ext}"  # year-like
        else:
            u = f"{stem}.{ext}"
        urls.append(u)

    ORIG = 1_000_000_000

    def ref(u):
        m = re.search(r"@([23])x\.(?:jpg|jpeg|png|webp)$", u)
        if m:
            r = int(m.group(1)) * ORIG
        else:
            m2 = re.search(r"-(\d{2,4})x\d{2,4}\.(?:jpg|jpeg|png|webp)$", u)
            m3 = re.search(r"_(\d{2,4})w\.(?:jpg|jpeg|png|webp)$", u)
            r = (int(m2.group(1)) if m2 else
                 int(m3.group(1)) if m3 else ORIG)
        stem = re.sub(
            r"(-\d{2,4}x\d{2,4}|_\d{2,4}w|@[23]x)(\.(?:jpg|jpeg|png|webp))$",
            r"\2", u)
        return stem, r

    expect = {}
    for u in urls:
        stem, r = ref(u)
        n, best = expect.get(stem, (0, None))
        cand = (r, u)
        expect[stem] = (n + 1, cand if best is None or cand > best else best)

    from crawlspark.extract import fold_image_variants

    df = spark.createDataFrame([(u,) for u in urls], "url STRING")
    got = {r["stem"]: (r["n_variants"], (r["chosen_rank"], r["chosen_url"]))
           for r in fold_image_variants(df).collect()}
    assert got == expect


def test_cross_host_sitemap_admission(spark):
    from crawlspark.robots import cross_host_sitemap_admission

    entries = spark.createDataFrame(
        [("https://a.test/sm.xml", "https://a.test/p1"),     # same host
         ("https://a.test/sm.xml", "https://b.test/p2"),     # declared by b
         ("https://a.test/sm.xml", "https://c.test/p3"),     # undeclared
         ("https://a.test/sm.xml", "https://B.TEST/p4")],    # case-folded
        "sitemap_url STRING, listed_url STRING",
    )
    decls = spark.createDataFrame(
        [("b.test", "https://a.test/sm.xml"),
         ("c.test", "https://other.test/sm.xml")],  # wrong sitemap: no help
        "robots_host STRING, sitemap_url STRING",
    )
    out = {r["listed_url"]: (r["admitted"], r["reason"])
           for r in cross_host_sitemap_admission(entries, decls).collect()}
    assert out["https://a.test/p1"] == (True, "same_host")
    assert out["https://b.test/p2"] == (True, "robots_declared")
    assert out["https://c.test/p3"] == (False, "cross_host_undeclared")
    assert out["https://B.TEST/p4"] == (True, "robots_declared")


def test_aimd_concurrency_recurrence(spark):
    from crawlspark.politeness import aimd_concurrency

    # hand-traced: ok,ok,ok,FAIL,ok -> c: 2,3,4,2,3; peak 4; 1 halving
    hist = spark.createDataFrame(
        [("a", i, ok) for i, ok in
         enumerate([True, True, True, False, True])],
        "host STRING, ord LONG, ok BOOLEAN",
    )
    row = aimd_concurrency(hist, c_max=16).collect()[0]
    assert (row["final_c"], row["max_c"], row["n_halvings"]) == (3, 4, 1)


def test_aimd_concurrency_bounds(spark):
    from crawlspark.politeness import aimd_concurrency

    # 20 successes cap at c_max; 20 failures floor at 1
    rows = [("up", i, True) for i in range(20)]
    rows += [("down", i, False) for i in range(20)]
    hist = spark.createDataFrame(rows, "host STRING, ord LONG, ok BOOLEAN")
    out = {r["host"]: r for r in aimd_concurrency(hist, c_max=8).collect()}
    assert out["up"]["final_c"] == 8 and out["up"]["max_c"] == 8
    assert out["down"]["final_c"] == 1 and out["down"]["n_halvings"] == 20


def test_aimd_order_insensitive_to_input_shuffle(spark):
    from crawlspark.politeness import aimd_concurrency

    rows = [("a", i, (i * 3) % 4 != 0) for i in range(12)]
    base = {r["host"]: (r["final_c"], r["max_c"], r["n_halvings"])
            for r in aimd_concurrency(
                spark.createDataFrame(rows, "host STRING, ord LONG, ok BOOLEAN")
            ).collect()}
    import random
    shuf = rows[:]
    random.Random(7).shuffle(shuf)
    got = {r["host"]: (r["final_c"], r["max_c"], r["n_halvings"])
           for r in aimd_concurrency(
               spark.createDataFrame(shuf, "host STRING, ord LONG, ok BOOLEAN")
           ).collect()}
    assert got == base


def test_redirect_status_classification(spark):
    from crawlspark.engine import redirect_status

    # a->b->c (resolved), d->e->d (2-cycle), f->f (self-loop),
    # and a 12-node acyclic path (over the 10-hop cap -> too_many)
    rows = [("a", "b"), ("b", "c"), ("d", "e"), ("e", "d"), ("f", "f")]
    rows += [(f"p{i}", f"p{i+1}") for i in range(12)]
    pages = spark.createDataFrame(rows, "url STRING, redirect_to STRING")
    out = {r["fetch_url"]: r for r in redirect_status(pages).collect()}
    assert (out["a"]["status"], out["a"]["final_url"], out["a"]["hops"]) == (
        "resolved", "c", 2)
    assert out["b"]["final_url"] == "c"
    assert out["d"]["status"] == "loop" and out["d"]["final_url"] is None
    assert out["e"]["status"] == "loop"
    assert out["f"]["status"] == "loop" and out["f"]["hops"] == 10
    assert out["p0"]["status"] == "too_many_redirects"
    assert out["p0"]["hops"] == 10 and out["p0"]["final_url"] is None
    # deep enough in the path the cap is no longer hit: p2 -> ... -> p12
    assert out["p2"]["status"] == "resolved" and out["p2"]["hops"] == 10
    assert out["p3"]["status"] == "resolved" and out["p3"]["final_url"] == "p12"


def test_img_fetch_priority_rules(spark):
    from crawlspark.extract import img_fetch_priority

    body = (
        '<img src="/a.jpg" fetchpriority="high">'
        '<img src="/b.jpg">'
        '<img src="/c.jpg" loading="lazy">'
        '<img src="/d.jpg" fetchpriority="low">'
        '<img src="/e.jpg" loading="lazy" fetchpriority="high">'
    )
    df = spark.createDataFrame([(body,)], "body STRING")
    out = df.select(F.explode(img_fetch_priority(F.col("body")))
                    .alias("i")).select("i.*").collect()
    prios = {r["url"]: r["priority"] for r in out}
    assert prios["/a.jpg"] == 0          # author-declared high
    assert prios["/b.jpg"] == 1          # FIRST UNDECORATED image = LCP slot
    assert prios["/c.jpg"] == 3          # lazy
    assert prios["/d.jpg"] == 3          # low
    assert prios["/e.jpg"] == 0          # explicit high BEATS lazy

    lazy_first = spark.createDataFrame(
        [('<img src="/px.gif" loading="lazy"><img src="/hero.jpg">'
          '<img src="/more.jpg">',)], "body STRING")
    out_lf = {r["url"]: r["priority"] for r in lazy_first.select(
        F.explode(img_fetch_priority(F.col("body"))).alias("i"))
        .select("i.*").collect()}
    # a lazy tracking pixel in first position must not eat the LCP slot
    assert out_lf == {"/px.gif": 3, "/hero.jpg": 1, "/more.jpg": 2}

    first_plain = spark.createDataFrame(
        [('<img src="/x.jpg"><img src="/y.jpg">',)], "body STRING")
    out2 = {r["url"]: r["priority"] for r in first_plain.select(
        F.explode(img_fetch_priority(F.col("body"))).alias("i"))
        .select("i.*").collect()}
    assert out2 == {"/x.jpg": 1, "/y.jpg": 2}  # first undecorated = LCP

    empty = spark.createDataFrame([("<html>no images</html>",)],
                                  "body STRING")
    assert empty.select(
        F.size(img_fetch_priority(F.col("body"))).alias("n")
    ).collect()[0]["n"] == 0


def test_classify_image_hosts(spark):
    from crawlspark.linkgraph import classify_image_hosts

    edges = spark.createDataFrame(
        [("a.test", "a.test"),      # first party
         ("a.test", "img.cdn"), ("b.test", "img.cdn"), ("c.test", "img.cdn"),
         ("a.test", "img.cdn"),    # duplicate ref: distinct-counted once
         ("b.test", "leech.test")],  # single foreign ref
        "page_domain STRING, img_domain STRING",
    )
    out = [(r["page_domain"], r["img_domain"], r["n_ref_domains"],
            r["hotlink_class"])
           for r in classify_image_hosts(
               edges, shared_cdn_min_domains=3).collect()]
    assert ("a.test", "a.test", 0, "first_party") in out
    assert ("a.test", "img.cdn", 3, "shared_cdn") in out
    assert ("b.test", "leech.test", 1, "third_party") in out
    # a first-party edge to a domain OTHERS hotlink is still first-party
    edges2 = spark.createDataFrame(
        [("x.test", "x.test"), ("p.test", "x.test"), ("q.test", "x.test"),
         ("r.test", "x.test")],
        "page_domain STRING, img_domain STRING",
    )
    got = {(r["page_domain"], r["hotlink_class"]) for r in
           classify_image_hosts(edges2, shared_cdn_min_domains=3).collect()}
    assert ("x.test", "first_party") in got
    assert ("p.test", "shared_cdn") in got
