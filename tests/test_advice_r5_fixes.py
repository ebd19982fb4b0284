"""Round-5 ADVICE fixes, each pinned by a test:

1. suite3's semdedup query stays UNCAPPED (max_cluster_size=None) so it
   matches its uncapped DuckDB oracle at every scale factor.
2. cssq.find_elements returns real-DOM innerHTML: comments / CDATA /
   script content inside a matched element are preserved (sliced from the
   original source), while matching still runs on the masked text.
3. cssq inner extraction is exact for junk-bearing close tags (</div  >).
4. frontier checkpoint metadata carries the last WAVE size so the
   prefilter ratio gate engages correctly on the first post-resume wave.
5. extract link tokenizer survives a close-tag spoof ('</a>' inside a
   quoted attribute value of a boring tag).
"""

import inspect
import shutil
import tempfile

from crawlspark import cssq


def test_suite3_semdedup_is_explicitly_uncapped():
    from crawlspark import suite3

    src = inspect.getsource(suite3.q_semdedup)
    assert "max_cluster_size=None" in src, (
        "suite3.q_semdedup must opt out of the library cap — its oracle "
        "(ORACLE_SEMDEDUP) replays the uncapped rule"
    )


def test_semdedup_cap_semantics(spark):
    """Uncapped finds a duplicate whose higher-priority twin ranks past a
    tiny cap; the capped variant (by design) keeps it — proving suite3's
    query MUST run uncapped to match its uncapped oracle."""
    import numpy as np
    from pyspark.sql import functions as F

    from crawlspark import ann

    rng = np.random.default_rng(7)
    dim = 8
    rows = []
    # centroid 0 vector plus 30 progressively-less-similar cluster members
    base = np.eye(dim)[0]
    for i in range(30):
        v = base + rng.normal(0, 0.02 * (i + 1), dim)
        rows.append((i, [float(x) for x in v]))
    # a near-exact duplicate of member 25 (which ranks deep in the cluster)
    dup_src = dict(rows)[25]
    rows.append((99, [float(x) + 1e-6 for x in dup_src]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = {
        r.vec_id: r.kept
        for r in ann.semdedup(df, n_centroids=1, eps_permille=990,
                              max_cluster_size=None).collect()
    }
    capped = {
        r.vec_id: r.kept
        for r in ann.semdedup(df, n_centroids=1, eps_permille=990,
                              max_cluster_size=5).collect()
    }
    # uncapped: one of (25, 99) is dropped as the other's duplicate
    assert uncapped[25] != uncapped[99]
    # capped at 5: both survive — the comparator set stops at rank 5
    assert capped[25] and capped[99]


def test_cssq_inner_preserves_comments_and_script_text():
    html = ('<div class=a>x<!-- hidden --><script>f("</div>")</script>y</div>'
            '<div class=b>z</div>')
    got = [(t, i) for t, _a, i in cssq.find_elements(html, "div.a")]
    assert got == [("div", 'x<!-- hidden --><script>f("</div>")</script>y')]
    # masking still governs MATCHING: a selector-matching div inside a
    # comment is not an element
    html2 = '<!-- <div class=a>ghost</div> --><div class=a>real</div>'
    assert [i for _t, _a, i in cssq.find_elements(html2, "div.a")] == ["real"]


def test_cssq_attrs_sliced_from_original():
    # a comment between attributes is pathological but length-preserved by
    # the mask; returned attrs must be the ORIGINAL text
    html = '<p data-x="1">t</p>'
    (_t, attrs, _i), = cssq.find_elements(html, "p[data-x]")
    assert 'data-x="1"' in attrs


def test_cssq_child_step_still_exact_with_comments():
    html = ('<ul><!-- <li class=x>ghost</li> --><li class=x>one</li>'
            '<li class=x><!-- in -->two</li></ul>')
    got = [i for _t, _a, i in cssq.find_elements(html, "ul > li")]
    assert got == ["one", "<!-- in -->two"]


def test_cssq_junk_close_tag_leaves_no_fragment():
    assert cssq.inner_htmls('<div class=a>x</div  >', "div.a") == ["x"]
    assert cssq.inner_htmls('<div class=a><div>n</div  ></div\t>', "div.a") \
        == ["<div>n</div  >"]


def test_cssq_pagination_hrefs_ignore_commented_anchors():
    html = ('<nav class=p><a href="/1">1</a>'
            '<!-- <a href="/ghost">g</a> --><a href="/2">2</a></nav>')
    assert cssq.pagination_link_hrefs(html, ".p") == ["/1", "/2"]


def test_normalize_text_excludes_comment_and_script_content():
    from crawlspark.extract import normalize_text

    assert normalize_text(
        'a <!-- no > really --> b<script>var x = "<i>no</i>"</script> c'
    ) == "a b c"
    assert normalize_text("<style>.x{}</style>plain") == "plain"


def test_empty_in_dom_stop_rule_treats_comment_only_as_empty(spark):
    from pyspark.sql import functions as F

    from crawlspark.paginate import IsEmptyInHtmlRule

    rule = IsEmptyInHtmlRule(".items")
    df = spark.createDataFrame(
        [("<div class=items><!-- none --></div>",),
         ("<div class=items><span>x</span></div>",)],
        ["body"],
    )
    got = [r.s for r in df.select(rule.stop_col(F.col("body")).alias("s")).collect()]
    assert got == [True, False]


def test_close_tag_spoof_in_quoted_attr_does_not_end_anchor():
    from crawlspark.extract import _extract_links_one

    html = ('<a href="/x">text <img alt="</a>"> tail</a>'
            '<a href="/y">b</a>')
    got = [(l["href"], l["text"]) for l in _extract_links_one(html)]
    assert got == [("/x", "text tail"), ("/y", "b")]
    # single-quoted variant
    html2 = "<a href='/x'>t<span title='</a>'>u</span>v</a>"
    got2 = [(l["href"], l["text"]) for l in _extract_links_one(html2)]
    assert got2 == [("/x", "tuv")]


def test_resume_seeds_ratio_gate_with_last_wave_size(spark):
    """ADVICE r4 frontier fix: checkpoint metadata carries wave_cnt, and a
    resumed crawl whose true seen:wave ratio exceeds prefilter_min_ratio
    engages the seen-prefilter on the FIRST post-resume wave (the buggy
    base-seeded ratio≈1 would defer it past max_depth here)."""
    from crawlspark.checkpoint import CrawlCheckpoint
    from crawlspark.frontier import CrawlConfig, crawl_bfs_virtual
    from crawlspark.seen import PartitionedSeenFilter

    n = 50_000
    full = crawl_bfs_virtual(
        spark, n, CrawlConfig(max_depth=4, prefilter_min_seen=None)
    ).collect()
    per_depth: dict[int, int] = {}
    for r in full:
        per_depth[r.depth] = per_depth.get(r.depth, 0) + 1
    base4 = sum(per_depth.values())
    wave4 = per_depth[4]
    ratio4 = base4 / wave4
    assert ratio4 > 1.05, "graph must give a usable ratio for this test"

    d = tempfile.mkdtemp(prefix="ckpt-ratio-")
    try:
        pf = dict(
            prefilter_min_seen=base4,  # crossed exactly at the resume point
            prefilter_min_ratio=(1.0 + ratio4) / 2.0,  # 1 < R < true ratio
            prefilter_buckets=4,
            prefilter_capacity=1 << 17,
        )
        crawl_bfs_virtual(
            spark, n, CrawlConfig(max_depth=4, checkpoint_dir=d, **pf)
        ).count()
        meta = CrawlCheckpoint(d).latest()
        assert int(meta["wave_cnt"]) == wave4, meta
        before = PartitionedSeenFilter.engagements
        resumed = crawl_bfs_virtual(
            spark, n,
            CrawlConfig(max_depth=5, checkpoint_dir=d, resume=True, **pf),
        ).collect()
        assert PartitionedSeenFilter.engagements > before, (
            "prefilter must engage on the first post-resume wave "
            f"(seen:wave = {ratio4:.2f} >= min_ratio {pf['prefilter_min_ratio']:.2f})"
        )
        # and the resumed output still matches an uninterrupted crawl
        full5 = crawl_bfs_virtual(
            spark, n, CrawlConfig(max_depth=5, prefilter_min_seen=None)
        ).collect()
        assert sorted(map(tuple, resumed)) == sorted(map(tuple, full5))
    finally:
        shutil.rmtree(d, ignore_errors=True)
