"""connected_components (large-star/small-star) vs a Python union-find.

The union-find is an independent single-node re-derivation of the same
semantics (transitive closure of the pair relation, min-id representative);
agreement on adversarial graph shapes — long paths (worst case for label
propagation), cycles, stars, random gnp, duplicate/self edges — validates
the distributed star formulation.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from crawlspark.textops import dedup


def _union_find(nodes, pairs):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative per component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(members) for r, members in comp.items() for n in members}


def _check(spark, pairs):
    nodes = sorted({x for p in pairs for x in p})
    expect = _union_find(nodes, pairs)
    df = spark.createDataFrame(pairs, "id_a LONG, id_b LONG")
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(df).collect()
    }
    assert got == expect


def test_path_graph_long_chain(spark):
    # 300-node path: diameter 299 — label propagation would need 299
    # rounds; the star alternation must finish inside the 30-round cap
    _check(spark, [(i, i + 1) for i in range(299)])


def test_cycles_and_stars(spark):
    pairs = [(i, (i + 1) % 40) for i in range(40)]          # one 40-cycle
    pairs += [(100, 100 + i) for i in range(1, 20)]          # star at 100
    pairs += [(500, 501), (501, 502), (502, 500)]            # triangle
    _check(spark, pairs)


def test_random_gnp_with_dupes_and_self_edges(spark):
    rng = random.Random(42)
    pairs = []
    for _ in range(350):
        a, b = rng.randrange(200), rng.randrange(200)
        pairs.append((a, b))  # self edges + duplicates + both orientations
    _check(spark, pairs)


def test_two_large_blocks_disjoint(spark):
    pairs = [(i, i + 1) for i in range(0, 99)]
    pairs += [(i, i + 1) for i in range(1000, 1099)]
    _check(spark, pairs)


def test_self_loop_only_node_still_returned(spark):
    """A node whose only edge is a self-loop appears in the pair table and
    must get (node, node) — the docstring contract (regression: the
    self-loop filter ran before the node set was built)."""
    _check(spark, [(5, 5), (1, 2)])


def test_assign_components_keeps_isolated_docs(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(10)], "doc_id LONG"
    )
    edges = spark.createDataFrame(
        [(1, 4), (4, 7), (2, 9)], "id_a LONG, id_b LONG"
    )
    out = {
        r["doc_id"]: r["component"]
        for r in dedup.assign_components(docs, edges).collect()
    }
    assert out == {0: 0, 1: 1, 4: 1, 7: 1, 2: 2, 9: 2,
                   3: 3, 5: 5, 6: 6, 8: 8}


def test_winnowing_guarantee_shared_substring(spark):
    """The winnowing guarantee (Schleimer et al. SIGMOD'03): two documents
    sharing a substring of length >= k + w - 1 share at least one
    fingerprint; disjoint-alphabet documents share none."""
    from crawlspark.textops import quality

    k, w = 8, 4
    shared = "zqxjvkwpbmfg"  # len 12 >= k + w - 1 = 11
    df = spark.createDataFrame(
        [
            (1, "aaaa " + shared + " bbbb cccc dddd"),
            (2, "eeee ffff " + shared + " gggg"),
            (3, "hhhh iiii jjjj kkkk llll mmmm nnnn"),
        ],
        "doc_id LONG, text STRING",
    )
    fps = quality.winnow_fingerprints(df, k=k, w=w).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_lsh_pairs_to_groups_composition(spark):
    """The production composition: MinHash-LSH pairs -> components ->
    keep-one-per-cluster, vs union-find over the SAME pair set."""
    texts = []
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    for i in range(30):
        words = base.split()
        if i % 3 == 1:
            words[3] = f"cat{i}"  # near-dup of the i-1 doc
        if i % 3 == 2:
            words[3] = f"cat{i - 1}"  # exact shingle-overlap with i-1
        texts.append((i, " ".join(words + [f"tail{i // 3}"])))
    df = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    pairs = dedup.minhash_lsh_pairs(df, jaccard_threshold=0.5)
    pair_rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    assert pair_rows, "LSH must find near-dups in this corpus"
    nodes = sorted({x for p in pair_rows for x in p})
    expect = _union_find(nodes, pair_rows)
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(
            spark.createDataFrame(pair_rows, "id_a LONG, id_b LONG")
        ).collect()
    }
    assert got == expect
