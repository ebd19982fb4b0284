"""Golden tests for the BFS crawl spine, cross-checked against an
independent pure-Python reference implementation of the reference
crawler's semantics (reference: src/Steps/Loading/HttpCrawl.php:145-236)."""

import duckdb
import pytest

from crawlspark import graph
from crawlspark.frontier import CrawlConfig, crawl_bfs

from .conftest import SF_DIR


def py_reference_bfs(n: int, max_depth: int, seed: int = 0, max_outputs=None):
    """Sequential first-discovery BFS — mirrors the PHP generator loop."""

    def children(i):
        return [(2 * i + 1) % n, (2 * i + 2) % n, (5 * i + 3) % n, (i + 17) % n]

    def blocked(i):
        return i % graph.BLOCKED_MOD == graph.BLOCKED_RESIDUE

    out = [(seed, 0, 1)]
    seen = {seed}
    frontier = [seed]
    ord_ctr = 1
    for depth in range(1, max_depth + 1):
        nxt = []
        for parent in frontier:  # insertion order == ord order
            for c in children(parent):
                if c not in seen and not blocked(c) and c not in nxt:
                    nxt.append(c)
        # first-discovery order is exactly append order above
        frontier = []
        for c in nxt:
            seen.add(c)
            ord_ctr += 1
            out.append((c, depth, ord_ctr))
            frontier.append(c)
            if max_outputs and ord_ctr >= max_outputs:
                return out
        if not frontier:
            break
    return out


@pytest.fixture(scope="module")
def n_docs():
    return duckdb.sql(f"select count(*) from '{SF_DIR}/documents.parquet'").fetchone()[0]


def _spark_bfs(spark, **kw):
    df = crawl_bfs(spark, SF_DIR, CrawlConfig(**kw))
    return sorted(
        [(r.url, r.depth, r.ord) for r in df.collect()], key=lambda t: t[2]
    )


def _expected(n, **kw):
    rows = py_reference_bfs(n, kw.get("max_depth", 6), max_outputs=kw.get("max_outputs"))
    exp = []
    for doc, depth, o in rows:
        seg = "/x/" if doc % graph.BLOCKED_MOD == graph.BLOCKED_RESIDUE else "/d/"
        url = f"http://h{doc % graph.NHOSTS}.example.test{seg}{doc}"
        exp.append((url, depth, o))
    return exp


def test_bfs_matches_python_reference(spark, n_docs):
    got = _spark_bfs(spark, max_depth=4)
    exp = _expected(n_docs, max_depth=4)
    assert got == exp


def test_bfs_invariants(spark, n_docs):
    got = _spark_bfs(spark, max_depth=3)
    ords = [o for _, _, o in got]
    assert ords == list(range(1, len(got) + 1)), "ord must be contiguous crawl order"
    depths = [d for _, d, _ in got]
    assert depths == sorted(depths), "level-synchronous: ord order implies depth order"
    urls = [u for u, _, _ in got]
    assert len(set(urls)) == len(urls), "seen-set: no URL crawled twice"
    assert not any("/x/" in u for u in urls), "robots: blocked pages never fetched"


def test_bfs_max_outputs(spark, n_docs):
    got = _spark_bfs(spark, max_depth=6, max_outputs=25)
    assert len(got) == 25
    assert got == _expected(n_docs, max_depth=6, max_outputs=25)


def test_max_per_host_per_level_caps_and_defers(spark):
    from crawlspark.frontier import CrawlConfig, crawl_bfs_virtual
    from crawlspark import graph
    from pyspark.sql import functions as F

    cap = 3
    capped = crawl_bfs_virtual(
        spark, 500, CrawlConfig(max_depth=12, num_seeds=20,
                                max_per_host_per_level=cap)
    ).cache()
    # per (depth>0, host) never exceeds the cap (seeds at depth 0 are exempt)
    over = (
        capped.filter(F.col("depth") > 0)
        .groupBy("depth", "host").count()
        .filter(F.col("count") > cap).count()
    )
    assert over == 0
    # no URL crawled twice despite deferral re-enqueueing
    assert capped.select("url").distinct().count() == capped.count()
    # deferral preserves reachability: given extra depth to drain the
    # backlog, the capped crawl covers everything the uncapped one reaches
    uncapped = crawl_bfs_virtual(
        spark, 500, CrawlConfig(max_depth=12, num_seeds=20)
    )
    deep_capped = crawl_bfs_virtual(
        spark, 500, CrawlConfig(max_depth=40, num_seeds=20,
                                max_per_host_per_level=cap)
    )
    b = {r.url for r in uncapped.collect()}
    a_deep = {r.url for r in deep_capped.collect()}
    assert b <= a_deep
    capped.unpersist()


def test_max_outputs_truncates_seed_level(spark):
    """max_outputs < num_seeds must stop INSIDE the seed level (the
    reference stops the moment the budget is reached; regression: all
    seeds were emitted before the first budget check)."""
    from crawlspark.frontier import CrawlConfig, crawl_bfs_virtual

    out = crawl_bfs_virtual(
        spark, 1000, CrawlConfig(num_seeds=10, max_outputs=3, max_depth=4)
    ).collect()
    assert len(out) == 3
    assert sorted(r.ord for r in out) == [1, 2, 3]
