"""ngram_containment_pairs + robots_policy_diff unit semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawlspark.robots import robots_policy_diff
from crawlspark.textops.dedup import ngram_containment_pairs


def test_containment_excerpt_and_copy(spark):
    art = " ".join(f"w{i}" for i in range(20))
    exc = " ".join(f"w{i}" for i in range(5, 15))
    docs = spark.createDataFrame(
        [(0, art), (1, exc), (2, art), (3, "x0 x1 x2 x3 x4 x5")],
        ["doc_id", "text"],
    )
    rows = {(r["id_a"], r["id_b"]): r
            for r in ngram_containment_pairs(
                docs, df_cap=64, min_permille=750).collect()}
    # excerpt in article: 8 shared of 18/8 grams
    assert rows[(0, 1)]["relation"] == "b_in_a"
    assert rows[(0, 1)]["shared"] == 8
    assert rows[(0, 1)]["cont_b_permille"] == 1000
    # full copy: mutual
    assert rows[(0, 2)]["relation"] == "mutual_dup"
    assert rows[(0, 2)]["cont_a_permille"] == 1000
    assert (1, 2) in rows  # excerpt also contained in the copy
    assert not any(3 in k for k in rows)  # disjoint doc pairs with nobody


def test_containment_df_cap_drops_boilerplate(spark):
    # every doc shares the same 5-word tail; with df_cap=2 those grams
    # are dropped, so the only surviving relation is the planted copy
    tail = "b0 b1 b2 b3 b4"
    docs = spark.createDataFrame(
        [(i, f"u{i}a u{i}b u{i}c u{i}d " + tail) for i in range(6)]
        + [(6, "u0a u0b u0c u0d " + tail)],
        ["doc_id", "text"],
    )
    rows = ngram_containment_pairs(
        docs, df_cap=2, min_permille=750
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(0, 6)}
    assert rows[0]["relation"] == "mutual_dup"


def _rules(spark, rows):
    return spark.createDataFrame(
        rows, "host string, user_agent string, "
              "disallow_prefixes array<string>, allow_prefixes array<string>"
    )


def test_robots_policy_diff_transitions(spark):
    frontier = spark.createDataFrame(
        [("a.test", "/private/x"), ("a.test", "/pub/y"),
         ("b.test", "/private/x"), ("b.test", "/tmp/z")],
        ["host", "path"],
    )
    old = _rules(spark, [("a.test", "*", ["/private"], []),
                         ("b.test", "*", ["/private"], [])])
    new = _rules(spark, [("a.test", "*", ["/private", "/tmp"], []),
                         ("b.test", "*", [], [])])
    got = {(r["host"], r["path"]): r["transition"]
           for r in robots_policy_diff(frontier, old, new).collect()}
    assert got == {
        ("a.test", "/private/x"): "still_disallowed",
        ("a.test", "/pub/y"): "still_allowed",
        ("b.test", "/private/x"): "newly_allowed",
        ("b.test", "/tmp/z"): "still_allowed",
    }


def test_robots_policy_diff_purge_list(spark):
    # the actionable artifact: newly_disallowed rows only
    frontier = spark.createDataFrame(
        [("a.test", f"/tmp/{i}") for i in range(5)]
        + [("a.test", "/keep/ok")],
        ["host", "path"],
    )
    old = _rules(spark, [("a.test", "*", [], [])])
    new = _rules(spark, [("a.test", "*", ["/tmp"], [])])
    purge = (
        robots_policy_diff(frontier, old, new)
        .filter(F.col("transition") == "newly_disallowed")
    )
    assert purge.count() == 5
