"""Property tests for the round-3 scheduler/packing operators: dual-budget
multimodal packing, consistent-hash ring disruption bounds, hedging edge
cases, lastmod trust degenerate hosts."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.fetch import consistent_ring_assign, hedged_fetch_plan
from crawlspark.politeness import sitemap_lastmod_trust
from crawlspark.textops.curate import pack_multimodal


def test_pack_multimodal_image_budget_closes_bins(spark):
    # tiny text cost, 2 images each: with image_capacity 4 the image
    # budget (not tokens) must close a bin every 2 docs
    df = spark.createDataFrame(
        [(i, 10, 2) for i in range(8)],
        "doc_id long, n_tokens long, n_images long")
    out = pack_multimodal(
        df, token_capacity=100000, image_capacity=4, image_token_cost=1)
    rows = out.collect()
    by_bin: dict[int, int] = {}
    for r in rows:
        by_bin[r.bin_id] = by_bin.get(r.bin_id, 0) + r.n_images
        # bin 0 starts with both budgets at 0 -> 'both'; afterwards the
        # image budget is strictly the binding one
        assert r.bound_by == ("both" if r.bin_id == 0 else "images")
    assert set(by_bin.values()) == {4}  # 8 docs x 2 imgs / cap 4 = 4 bins
    # and with a huge image budget the token dimension takes over
    out2 = pack_multimodal(
        df, token_capacity=24, image_capacity=10000, image_token_cost=1)
    assert all(r.bound_by == ("both" if r.bin_id == 0 else "tokens")
               for r in out2.collect())


def test_pack_multimodal_start_exclusive(spark):
    # one doc alone in the table lands in bin 0 regardless of size
    df = spark.createDataFrame(
        [(1, 999999, 99)], "doc_id long, n_tokens long, n_images long")
    r = pack_multimodal(df).collect()[0]
    assert (r.bin_id, r.bound_by) == (0, "both")


def test_ring_minimal_disruption(spark):
    hosts = spark.createDataFrame(
        [(f"host-{i}",) for i in range(300)], "host string")
    fleet = ["fa", "fb", "fc", "fd"]
    full = {r.host: r.fetcher
            for r in consistent_ring_assign(hosts, fleet).collect()}
    smaller = {r.host: r.fetcher
               for r in consistent_ring_assign(hosts, fleet[:-1]).collect()}
    moved = {h for h in full if full[h] != smaller[h]}
    # ONLY the lost fetcher's keys move: the CH property rendezvous
    # shares, but mod-N hashing lacks
    assert moved == {h for h, f in full.items() if f == "fd"}
    assert all(smaller[h] in fleet[:-1] for h in smaller)


def test_ring_load_cap(spark):
    hosts = spark.createDataFrame(
        [(f"host-{i}",) for i in range(100)], "host string")
    out = consistent_ring_assign(
        hosts, ["fa", "fb"], load_cap_permille=1000).collect()
    cap = -(-1000 * 100 // (1000 * 2))  # == fair share 50
    for r in out:
        assert r.would_spill == (r.rank_in_fetcher > cap)


def test_hedged_fetch_single_sample_host(spark):
    df = spark.createDataFrame(
        [("h0", 1, 500)], "host string, req_id long, latency_ms long")
    r = hedged_fetch_plan(df).collect()[0]
    # partner wraps to itself; delay = its own latency; nothing hedges
    assert (r.hedge_delay_ms, r.n_hedged, r.sum_hedged_ms) == (500, 0, 500)


def test_hedged_fetch_never_worse(spark):
    rows = [("h", i, 10 + (i * 37) % 400) for i in range(50)]
    df = spark.createDataFrame(
        rows, "host string, req_id long, latency_ms long")
    r = hedged_fetch_plan(df).collect()[0]
    assert r.sum_hedged_ms <= r.sum_latency_ms
    assert 0 <= r.hedge_rate_permille <= 1000


def test_lastmod_trust_no_claims_host(spark):
    # a host that never claims and never changes: precision undefined,
    # recall undefined -> coalesce(1000) -> trusted when n >= min
    df = spark.createDataFrame(
        [("h0", 10, 50, "a", "a")] * 25,
        "host string, lastmod_ts long, prev_fetch_ts long, "
        "prev_hash string, cur_hash string")
    r = sitemap_lastmod_trust(df, min_samples=20).collect()[0]
    assert r.precision_permille is None and r.recall_permille is None
    assert r.trust == "trusted"
    # same host below the sample floor is insufficient
    r2 = sitemap_lastmod_trust(
        df.limit(5), min_samples=20).collect()[0]
    assert r2.trust == "insufficient"
