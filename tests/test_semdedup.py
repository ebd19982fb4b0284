"""SemDeDup: embedding-cluster semantic dedup (ann.semdedup)."""

import math

from pyspark.sql import functions as F

from crawlspark import ann


def _toy(spark):
    # 2 clear clusters around e0 / e1 axes + planted near-dups
    rows = [
        (0, [1.0, 0.0, 0.0]),   # centroid A
        (1, [0.0, 1.0, 0.0]),   # centroid B
        (10, [0.9, 0.1, 0.0]),  # A member
        (11, [0.9, 0.1, 0.001]),  # near-dup of 10
        (12, [0.7, 0.3, 0.0]),  # A member, not a dup
        (20, [0.1, 0.9, 0.0]),  # B member
        (21, [0.1, 0.9, 0.002]),  # near-dup of 20
    ]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_semdedup_drops_one_per_pair_keeps_singletons(spark):
    out = {
        r["vec_id"]: r
        for r in ann.semdedup(_toy(spark), n_centroids=2, eps_permille=995).collect()
    }
    assert len(out) == 7
    # exactly one of each planted pair dropped
    assert out[10]["kept"] != out[11]["kept"]
    assert out[20]["kept"] != out[21]["kept"]
    # singletons + centroids kept
    for vid in (0, 1, 12):
        assert out[vid]["kept"], vid
    # cluster assignment: A members on centroid 0, B members on centroid 1
    assert {out[v]["cent_id"] for v in (10, 11, 12)} == {0}
    assert {out[v]["cent_id"] for v in (20, 21)} == {1}


def test_semdedup_priority_is_centroid_similarity(spark):
    # the member closer to its centroid survives (paper's keep rule)
    out = {
        r["vec_id"]: r
        for r in ann.semdedup(_toy(spark), n_centroids=2, eps_permille=995).collect()
    }
    pair = [(10, out[10]), (11, out[11])]
    kept = [v for v, r in pair if r["kept"]][0]
    dropped = [v for v, r in pair if not r["kept"]][0]
    assert out[kept]["centroid_sim_permille"] >= out[dropped]["centroid_sim_permille"]


def test_semdedup_differential_vs_bruteforce(spark):
    """Randomized differential: the triangular drop rule recomputed in
    plain Python must agree row-for-row."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(60):
        v = [rng.gauss(0, 1) for _ in range(8)]
        rows.append((i, v))
        if i % 11 == 0:  # plant a near-dup
            rows.append((1000 + i, [x + rng.gauss(0, 0.001) for x in v]))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    eps = 950
    ncent = 4
    got = {r["vec_id"]: r for r in ann.semdedup(df, n_centroids=ncent,
                                                eps_permille=eps).collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    cents = {i: v for i, v in rows if 0 <= i < ncent}
    ass, pm = {}, {}
    for i, v in rows:
        best = max(
            cents.items(),
            key=lambda c: (math.floor(cos(v, c[1]) * 1000), -c[0]),
        )
        ass[i] = best[0]
        pm[i] = math.floor(cos(v, best[1]) * 1000)
    vecs = dict(rows)
    for i, v in rows:
        dropped = any(
            ass[j] == ass[i]
            and j != i
            and (pm[j] > pm[i] or (pm[j] == pm[i] and j < i))
            and math.floor(cos(v, vecs[j]) * 1000) >= eps
            for j, _ in rows
        )
        assert got[i]["kept"] == (not dropped), i
        assert got[i]["cent_id"] == ass[i], i
        assert got[i]["centroid_sim_permille"] == pm[i], i


def _skew_fixture(spark, n_filler=12, dim=20):
    """One cluster whose members are mutually dissimilar (each row owns a
    private orthogonal dim) except a planted identical pair placed DEEP in
    the priority order — comparators capped at the top of the order cannot
    see it."""
    rows = [(0, [1.0] + [0.0] * (dim - 1))]  # centroid
    # fillers with descending centroid-sim a_i, mutual cos = a_i*a_j <= 0.25
    for i in range(n_filler):
        a = 0.5 - i * 0.02
        v = [a] + [0.0] * (dim - 1)
        v[2 + i] = (1 - a * a) ** 0.5
        rows.append((10 + i, v))
    # planted identical pair, centroid-sim 0.15 (ranks below every filler)
    for vid in (90, 91):
        v = [0.15] + [0.0] * (dim - 1)
        v[dim - 1] = (1 - 0.15 ** 2) ** 0.5
        rows.append((vid, v))
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_semdedup_cap_bounds_comparators(spark):
    """max_cluster_size genuinely restricts the pair join: the deep planted
    pair is invisible to a cap that stops above it (both kept), and one of
    the two is dropped as soon as the cap reaches its rank."""
    emb = _skew_fixture(spark)
    # uncapped: one of the identical pair dropped (lower id wins)
    unc = {r["vec_id"]: r["kept"] for r in ann.semdedup(
        emb, n_centroids=1, eps_permille=995, max_cluster_size=None
    ).collect()}
    assert unc[90] and not unc[91]
    # cap above the fillers but below the pair's rank: pair uncompared
    cap = {r["vec_id"]: r["kept"] for r in ann.semdedup(
        emb, n_centroids=1, eps_permille=995, max_cluster_size=5
    ).collect()}
    assert cap[90] and cap[91]
    # everything else identical between the two runs (cap is exact for
    # rows whose duplicates sit inside the cap — here: no other dups)
    assert {k: v for k, v in cap.items() if k not in (90, 91)} == \
           {k: v for k, v in unc.items() if k not in (90, 91)}
    # cap covering the whole cluster == uncapped
    full = {r["vec_id"]: r["kept"] for r in ann.semdedup(
        emb, n_centroids=1, eps_permille=995, max_cluster_size=100
    ).collect()}
    assert full == unc
