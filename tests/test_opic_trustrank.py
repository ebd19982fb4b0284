"""Round-3 graph operators: OPIC greedy cash-flow importance and
TrustRank seed-personalized trust — differential tests vs a pure-python
replay on hand-built graphs, plus conservation/starvation properties."""

from pyspark.sql import functions as F

from crawlspark.linkgraph import OPIC_SCALE, SCALE, opic, trustrank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src LONG, dst LONG")


# -- OPIC --------------------------------------------------------------------

def _opic_py(n, edges, waves, k, scale):
    """Pure-python replay of the greedy integer OPIC schedule."""
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    cash = {v: scale // n for v in range(n)}
    hist = {v: 0 for v in range(n)}
    for _ in range(waves):
        sel = sorted(range(n), key=lambda v: (-cash[v], v))[:k]
        inflow = {v: 0 for v in range(n)}
        for u in sel:
            dsts = out.get(u, [])
            if dsts:
                share = cash[u] // len(dsts)
                for d in dsts:
                    inflow[d] += share
        for u in sel:
            hist[u] += cash[u]
            cash[u] = 0
        for v in range(n):
            cash[v] += inflow[v]
    return {v: (cash[v], hist[v], cash[v] + hist[v]) for v in range(n)}


def test_opic_differential_hand_graph(spark):
    # 5 nodes: 0 is a hub everyone cites; 4 is a dangling sink
    pairs = [(0, 1), (0, 2), (1, 0), (2, 0), (3, 0), (3, 4), (1, 4)]
    n, waves, k = 5, 3, 2
    got = {
        r.doc: (r.cash, r.hist, r.importance)
        for r in opic(spark, n, waves=waves, k=k,
                      edges_df=_edges(spark, pairs)).collect()
    }
    want = _opic_py(n, pairs, waves, k, OPIC_SCALE)
    assert got == want


def test_opic_cash_conservation_minus_dust(spark):
    """Circulating CASH is conserved minus floor-div dust (< od per
    deal) — the paper's invariant (history is a flow RECORD and grows
    monotonically; only cash is money)."""
    n, waves, k = 40, 4, 3
    res = opic(spark, n, waves=waves, k=k).agg(
        F.sum("cash").alias("c"), F.sum("hist").alias("h")).collect()[0]
    initial = n * (OPIC_SCALE // n)
    assert res.c <= initial
    # each selected page deals to out-degree 4 -> dust < 4 per deal
    assert res.c >= initial - waves * k * 4
    # history only accumulates banked cash: positive once waves ran
    assert res.h > 0


def test_opic_hub_outranks_leaf(spark):
    pairs = [(1, 0), (2, 0), (3, 0), (0, 1)]
    got = {r.doc: r.importance
           for r in opic(spark, 4, waves=3, k=2,
                         edges_df=_edges(spark, pairs)).collect()}
    assert got[0] == max(got.values())


# -- TrustRank ---------------------------------------------------------------

def test_trustrank_unlinked_component_starves(spark):
    """Pages in a component no trusted seed links into must end with
    zero trust — the spam-farm starvation property."""
    # component A: 0 (seed, doc%50==0) <-> 1 ; component B: 2 <-> 3
    pairs = [(0, 1), (1, 0), (2, 3), (3, 2)]
    got = {r.doc: r.trust_scaled
           for r in trustrank(spark, 4, seed_mod=50, iters=3,
                              edges_df=_edges(spark, pairs)).collect()}
    assert got[2] == 0 and got[3] == 0
    assert got[0] > 0 and got[1] > 0


def test_trustrank_reach_bounded_by_iterations(spark):
    """On a directed ring seeded at doc 0, k iterations push trust at
    most k hops: hops 1..k hold trust, hops k+1.. hold exactly zero —
    distance-bounded propagation PageRank cannot express (its uniform
    teleport funds every page from iteration one)."""
    n = 8
    ring = [(i, (i + 1) % n) for i in range(n)]
    got = {r.doc: r.trust_scaled
           for r in trustrank(spark, n, seed_mod=50, iters=3,
                              edges_df=_edges(spark, ring)).collect()}
    assert all(got[h] > 0 for h in range(4))      # seed + 3 hops funded
    assert all(got[h] == 0 for h in range(4, n))  # beyond the wavefront


def test_trustrank_total_mass_bounded(spark):
    n = 100
    tot = trustrank(spark, n, seed_mod=50, iters=3).agg(
        F.sum("trust_scaled").alias("t")).collect()[0].t
    # mass <= scale (teleport re-issues <= (1-d) * scale per iter,
    # link term is contraction d): loose sanity bound
    assert 0 < tot <= SCALE
