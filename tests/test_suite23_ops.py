"""Round-3 part-3 operators: news sitemaps, EXIF orientation planning,
path-template mining, DNS resolver-cache planning."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# exif_orientation_plan
# --------------------------------------------------------------------------

def test_exif_plan_mapping(spark):
    from crawlspark.images import exif_orientation_plan

    rows = [(f"i{t}", t, 100, 80) for t in range(0, 9)] + [("inull", None, 100, 80)]
    df = spark.createDataFrame(
        rows, "image_id string, exif_orientation int, w long, h long"
    )
    got = {
        r["image_id"]: r
        for r in exif_orientation_plan(df).collect()
    }
    expect = {
        0: ("identity", False), 1: ("identity", False),
        2: ("flip_h", False), 3: ("rot180", False), 4: ("flip_v", False),
        5: ("transpose", True), 6: ("rot90_cw", True),
        7: ("transverse", True), 8: ("rot270_cw", True),
    }
    for t, (name, swaps) in expect.items():
        r = got[f"i{t}"]
        assert r["transform"] == name
        assert r["swaps_dims"] is swaps
        assert (r["out_w"], r["out_h"]) == ((80, 100) if swaps else (100, 80))
        assert r["needs_rewrite"] is (t not in (0, 1))
    # null tag -> spec's "treat as 1"
    r = got["inull"]
    assert r["transform"] == "identity" and r["needs_rewrite"] is False


def _pack(grids: np.ndarray) -> np.ndarray:
    """(n, 8, 8) bit grids -> int64 phash, bit (r, c) at weight 2^(8r+c)
    (the images-module convention)."""
    w = np.uint64(1) << (
        np.uint64(8) * np.arange(8, dtype=np.uint64)[:, None]
        + np.arange(8, dtype=np.uint64)[None, :]
    )
    return (grids.astype(np.uint64) * w).sum(axis=(1, 2),
                                             dtype=np.uint64).astype(np.int64)


def test_exif_transforms_preserve_canonical_phash(spark):
    """The docstring's companion invariant: every EXIF-tag pixel
    transform is a dihedral op, so dihedral_phash_struct's canonical
    phash is IDENTICAL before and after orientation normalization —
    upright-rewriting an image never splits a near-dup group."""
    from crawlspark.images import dihedral_phash_struct

    rng = np.random.default_rng(7)
    g = (rng.random((64, 8, 8)) < 0.5).astype(np.uint8)
    transforms = {
        1: g,
        2: g[:, :, ::-1],                      # flip_h
        3: g[:, ::-1, ::-1],                   # rot180
        4: g[:, ::-1, :],                      # flip_v
        5: g.swapaxes(1, 2),                   # transpose
        6: g.swapaxes(1, 2)[:, :, ::-1],       # rot90_cw
        7: g.swapaxes(1, 2)[:, ::-1, ::-1],    # transverse
        8: g.swapaxes(1, 2)[:, ::-1, :],       # rot270_cw
    }
    base = _pack(g)
    for tag, tg in transforms.items():
        both = pd.DataFrame({
            "i": np.arange(64), "a": base, "b": _pack(np.ascontiguousarray(tg)),
        })
        df = spark.createDataFrame(both)
        out = df.select(
            "i",
            dihedral_phash_struct(F.col("a"))["canonical_phash"].alias("ca"),
            dihedral_phash_struct(F.col("b"))["canonical_phash"].alias("cb"),
        ).collect()
        for r in out:
            assert r["ca"] == r["cb"], f"tag {tag} row {r['i']}"


# --------------------------------------------------------------------------
# mine_path_templates
# --------------------------------------------------------------------------

def test_path_template_folds(spark):
    from crawlspark.canon import mine_path_templates

    urls = [
        "https://EX.test/a/123/b?x=9#f",            # digits + query/frag
        "https://ex.test/a/777/b",                  # same template
        "https://ex.test/s/0123456789abcdef0",      # 17 hex -> {hex}
        "https://ex.test/s/0123456789abcde",        # 15 hex -> digits fold only
        "https://ex.test/u/01234567-89ab-cdef-0123-456789abcdef",  # uuid
        "https://ex.test/plain/page",               # no variables
        "https://ex.test",                          # no path at all
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r["host"], r["template"]): r["n_urls"]
        for r in mine_path_templates(df, min_count=2).collect()
    }
    assert got[("ex.test", "/a/{n}/b")] == 2
    assert got[("ex.test", "/s/{hex}")] == 1
    assert got[("ex.test", "/s/{n}abcde")] == 1
    assert got[("ex.test", "/u/{uuid}")] == 1
    assert got[("ex.test", "/plain/page")] == 1
    assert got[("ex.test", "")] == 1
    # only the dense family clears the generator bar
    gen = {
        r["template"]: r["is_generator"]
        for r in mine_path_templates(df, min_count=2).collect()
    }
    assert gen["/a/{n}/b"] is True and gen["/s/{hex}"] is False


# --------------------------------------------------------------------------
# dns_cache_plan
# --------------------------------------------------------------------------

def _naive_dns(ts_list, ttl):
    misses = 0
    expiry = None
    for t in sorted(ts_list):
        if expiry is None or t >= expiry:
            misses += 1
            expiry = t + ttl
    return misses


def test_dns_cache_plan_differential(spark):
    from crawlspark.politeness import dns_cache_plan

    rng = np.random.default_rng(11)
    hosts = [f"h{i}" for i in range(12)]
    rows = []
    for h in hosts:
        n = int(rng.integers(1, 40))
        ts = rng.integers(0, 5000, size=n)
        rows += [(h, int(t)) for t in ts]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "host string, ts_ms long").repartition(7)
    got = {r["host"]: r for r in dns_cache_plan(df, ttl_ms=700).collect()}
    by_host = {}
    for h, t in rows:
        by_host.setdefault(h, []).append(t)
    for h, ts in by_host.items():
        want = _naive_dns(ts, 700)
        assert got[h]["n_resolves"] == want, h
        assert got[h]["n_lookups"] == len(ts)
        assert got[h]["n_hits"] == len(ts) - want


def test_dns_cache_boundary(spark):
    """A lookup exactly at expiry misses (cache validity is [t, t+ttl));
    duplicate timestamps after the first are hits."""
    from crawlspark.politeness import dns_cache_plan

    df = spark.createDataFrame(
        [("h", 0), ("h", 0), ("h", 999), ("h", 1000), ("h", 1999)],
        "host string, ts_ms long",
    )
    r = dns_cache_plan(df, ttl_ms=1000).collect()[0]
    assert (r["n_lookups"], r["n_resolves"], r["n_hits"]) == (5, 2, 3)


# --------------------------------------------------------------------------
# sitemap_news_entries
# --------------------------------------------------------------------------

def test_sitemap_news_alignment(spark):
    from crawlspark.extract import sitemap_news_entries

    body = (
        "<urlset>"
        "<url><loc>http://n.test/a</loc><news:news>"
        "<news:publication><news:name>P</news:name>"
        "<news:language>en</news:language></news:publication>"
        "<news:publication_date>2026-08-19</news:publication_date>"
        "<news:title>T1</news:title></news:news></url>"
        "<url><loc>http://n.test/plain</loc></url>"  # no news -> nothing
        "<url><loc>http://n.test/b</loc><news:news>"
        "<news:publication><news:name>Q</news:name>"
        "<news:language>de</news:language></news:publication>"
        "<news:publication_date>2026-08-18</news:publication_date>"
        "<news:title>T2</news:title></news:news></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([(body,)], "body string")
    out = sorted(
        df.select(F.explode(sitemap_news_entries(F.col("body"))).alias("e"))
        .select("e.*").collect(),
        key=lambda r: r["page_url"],
    )
    assert [(r["page_url"], r["publication"], r["language"], r["pub_date"],
             r["title"]) for r in out] == [
        ("http://n.test/a", "P", "en", "2026-08-19", "T1"),
        ("http://n.test/b", "Q", "de", "2026-08-18", "T2"),
    ]
