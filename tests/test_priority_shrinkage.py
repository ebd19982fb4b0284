"""priority_sample (DLT weighted sampling) differential vs a pure-Python
replay, plus beta-binomial host shrinkage semantics."""

from __future__ import annotations

import hashlib

from crawlspark.scheduler import host_quality_shrinkage
from crawlspark.textops.curate import (PRIORITY_EST_SCALE,
                                       PRIORITY_SCALE, priority_sample)


def _u(doc_id: int, salt: str = "prio") -> int:
    return int(hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8], 16) + 1


def _py_dlt(rows, k):
    """Pure-Python replay of the quantized DLT draw: rows = (id, stratum,
    w); returns {stratum: [(id, w, qk, rn, tau, est), ...]}."""
    out = {}
    by_s = {}
    for i, s, w in rows:
        by_s.setdefault(s, []).append((i, w, (w * PRIORITY_SCALE) // _u(i)))
    for s, items in by_s.items():
        items.sort(key=lambda t: (-t[2], t[0]))
        tau = items[k][2] if len(items) > k else None
        kept = []
        for rn, (i, w, qk) in enumerate(items[:k], start=1):
            est = max(w * PRIORITY_EST_SCALE, tau or 0)
            kept.append((i, w, qk, rn, tau, est))
        out[s] = kept
    return out


def test_priority_sample_differential(spark):
    rows = [(i, "en" if i % 3 else "de", 10 + (i * 37) % 990)
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    got = priority_sample(df, "lang", "w", 7).collect()
    want = _py_dlt(rows, 7)
    got_by_s = {}
    for r in got:
        got_by_s.setdefault(r["lang"], []).append(
            (r["doc_id"], r["weight"], r["qk"], r["rn"], r["tau_qk"],
             r["est_scaled"]))
    for s in want:
        assert sorted(got_by_s[s]) == sorted(want[s]), s


def test_priority_sample_small_stratum_keeps_all(spark):
    rows = [(i, "xx", 100) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    got = priority_sample(df, "lang", "w", 12).collect()
    assert len(got) == 5
    for r in got:
        assert r["tau_qk"] is None
        # below saturation the estimator is the EXACT weight
        assert r["est_scaled"] == 100 * PRIORITY_EST_SCALE


def test_priority_sample_subset_sum_estimate(spark):
    rows = [(i, "en", 10 + (i * 53) % 500) for i in range(400)]
    true_total = sum(w for _, _, w in rows)
    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    got = priority_sample(df, "lang", "w", 80).collect()
    est_total = sum(r["est_scaled"] for r in got) // PRIORITY_EST_SCALE
    # DLT subset-sum estimator: unbiased; this fixed draw lands well
    # within +-25% of the true total at k=80/n=400
    assert abs(est_total - true_total) < true_total // 4


def test_host_shrinkage_pulls_small_hosts(spark):
    rows = (
        [("big", i % 10 < 9) for i in range(1000)]   # 900 permille, n=1000
        + [("tiny", True), ("tiny", True)]           # 1000 permille, n=2
    )
    df = spark.createDataFrame(rows, "host string, is_good boolean")
    got = {r["host"]: r for r in
           host_quality_shrinkage(df, prior_strength=50).collect()}
    pg = got["big"]["global_permille"]
    assert pg == (1000 * 902) // 1002
    # exact integer posterior replay
    for h, n, k in (("big", 1000, 900), ("tiny", 2, 2)):
        assert got[h]["post_permille"] == (50 * pg + 1000 * k) // (50 + n)
    # tiny host shrinks far toward the corpus rate, big host barely moves
    assert abs(got["tiny"]["shrink_permille"]) > 80
    assert abs(got["big"]["shrink_permille"]) < 10
    # posterior sits between raw and global (floor-div tolerance 1)
    for h in ("big", "tiny"):
        lo = min(got[h]["raw_permille"], pg) - 1
        hi = max(got[h]["raw_permille"], pg) + 1
        assert lo <= got[h]["post_permille"] <= hi
