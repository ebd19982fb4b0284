"""Edge-case tests for suite57 ops: Mercator dispatch invariants, HSTS
revocation/expiry/port semantics, TF-IDF cosine bounds."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from crawlspark.canon import hsts_policies, hsts_upgrade
from crawlspark.scheduler import mercator_dispatch
from crawlspark.textops.quality import tfidf_cosine_pairs


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_mercator_politeness_and_slots(spark):
    rows = [
        (f"http://h{k}/p{i}", f"h{k}", k % 3, 10 * k + i, 100 * (1 + k % 2))
        for k in range(7) for i in range(5)
    ]
    out = mercator_dispatch(
        spark.createDataFrame(
            rows, "url string, host string, priority long, "
                  "discovery_ord long, delay_ms long"),
        n_back=3,
    ).collect()
    # per-host: consecutive dispatches exactly delay_ms apart, seq order
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    for host, rs in by_host.items():
        rs.sort(key=lambda r: r.seq)
        delay = 100 * (1 + int(host[1:]) % 2)
        for a, b in zip(rs, rs[1:]):
            assert b.dispatch_ms - a.dispatch_ms == delay
    # slots: exactly n_back distinct, and hosts in one slot never overlap
    assert {r.slot for r in out} == {0, 1, 2}
    for slot in range(3):
        spans = sorted(
            (min(r.dispatch_ms for r in rs),
             max(r.dispatch_ms for r in rs) + 100 * (1 + int(h[1:]) % 2))
            for h, rs in by_host.items() if rs[0].slot == slot
        )
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 >= e1, "hosts sharing a back queue overlapped"
    # front queues: admission rank follows best priority desc
    ranks = {r.host: (r.admission_rank, ) for r in out}
    best = {f"h{k}": k % 3 for k in range(7)}
    ordered = sorted(ranks, key=lambda h: ranks[h])
    assert [best[h] for h in ordered] == sorted(
        (best[h] for h in ordered), reverse=True)
    # dispatch_ord is a permutation aligned with dispatch_ms
    ords = sorted(out, key=lambda r: r.dispatch_ord)
    assert [r.dispatch_ord for r in ords] == list(range(1, len(out) + 1))
    assert all(a.dispatch_ms <= b.dispatch_ms for a, b in zip(ords, ords[1:]))


def _pol(spark, rows, now):
    df = spark.createDataFrame(
        rows, "host string, sts string, observed_ts long")
    return hsts_policies(df, now_ts=now)


def test_hsts_revocation_expiry_and_ports(spark):
    pols = _pol(spark, [
        ("live.com", "max-age=1000; includeSubDomains", 500),
        ("dead.com", "max-age=0", 500),          # RFC revocation
        ("old.com", "max-age=100", 500),          # expired at now=1000
        ("junk.com", "includeSubDomains", 500),   # no max-age -> inactive
    ], now=1000)
    act = {r.host: r.active for r in pols.collect()}
    assert act == {"live.com": True, "dead.com": False,
                   "old.com": False, "junk.com": False}

    urls = spark.createDataFrame(
        [("http://live.com/a",), ("http://sub.live.com/b",),
         ("http://live.com:80/c",), ("http://live.com:8080/d",),
         ("http://dead.com/e",), ("http://old.com/f",),
         ("https://live.com/g",), ("http://evillive.com/h",)],
        "url string")
    got = {r.url: r for r in hsts_upgrade(urls, pols).collect()}
    assert got["http://live.com/a"].upgraded_url == "https://live.com/a"
    assert got["http://sub.live.com/b"].upgraded_url == \
        "https://sub.live.com/b"
    # RFC 6797 8.3: explicit :80 -> :443, other explicit ports kept
    assert got["http://live.com:80/c"].upgraded_url == \
        "https://live.com:443/c"
    assert got["http://live.com:8080/d"].upgraded_url == \
        "https://live.com:8080/d"
    for u in ("http://dead.com/e", "http://old.com/f",
              "https://live.com/g", "http://evillive.com/h"):
        assert not got[u].upgraded and got[u].upgraded_url == u


def test_tfidf_cosine_bounds(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, "alpha delta epsilon"), (4, "zeta eta theta")],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (3, 4)], "id_a long, id_b long")
    got = {(r.id_a, r.id_b): r for r in
           tfidf_cosine_pairs(docs, pairs).collect()}
    assert got[(1, 2)].cos_micro == 1_000_000      # identical docs
    assert got[(3, 4)].cos_micro == 0              # disjoint vocab
    assert got[(3, 4)].n_shared_terms == 0
    assert got[(1, 3)].n_shared_terms == 1         # shares only "alpha"
    assert 0 < got[(1, 3)].cos_micro < 1_000_000
