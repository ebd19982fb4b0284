"""ExactSubstr duplicate spans + corpus-unigram LM scoring.

Hand-computed expectations on tiny frames, plus the scale-shape claims:
the coverage merge is a PARTITIONED window (per doc), and the unigram
total-token scalar joins in via broadcast.
"""

import math

from crawlspark.textops.dedup import duplicate_spans
from crawlspark.textops.quality import unigram_logprob


def test_duplicate_spans_merged_coverage(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e"),        # windows: abc bcd cde
            (2, "x a b c d y"),      # windows: xab abc bcd cdy
            (3, "q r s"),            # one unique window
            (4, "zz"),               # shorter than k -> no windows
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in duplicate_spans(df, k=3, min_docs=2).collect()}
    # 'a b c' and 'b c d' each appear in docs 1+2 -> duplicated
    r1 = rows[1]
    assert (r1["n_tokens"], r1["n_windows"]) == (5, 3)
    # dup windows at pos 1,2: [1,4) then [2,5) adds 1 -> 4 covered tokens
    assert (r1["n_dup_windows"], r1["dup_tokens"]) == (2, 4)
    r2 = rows[2]
    assert (r2["n_tokens"], r2["n_windows"]) == (6, 4)
    assert (r2["n_dup_windows"], r2["dup_tokens"]) == (2, 4)
    assert (rows[3]["n_dup_windows"], rows[3]["dup_tokens"]) == (0, 0)
    assert (rows[4]["n_windows"], rows[4]["dup_tokens"]) == (0, 0)


def test_duplicate_spans_disjoint_spans_sum(spark):
    # two copies of the same doc: every window duplicated, full coverage
    df = spark.createDataFrame(
        [(1, "p q r s t u"), (2, "p q r s t u"), (3, "lone words here only")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in duplicate_spans(df, k=3, min_docs=2).collect()}
    assert rows[1]["dup_tokens"] == 6 and rows[1]["n_dup_windows"] == 4
    assert rows[2]["dup_tokens"] == 6
    assert rows[3]["dup_tokens"] == 0


def test_duplicate_spans_window_is_partitioned(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], "doc_id long, text string"
    )
    plan = duplicate_spans(df)._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(doc_id" in plan  # never a global window


def test_unigram_logprob_exact_micronats(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    c_ab = math.floor(-math.log(2 / 5) * 1_000_000)  # a,b each occur twice
    c_c = math.floor(-math.log(1 / 5) * 1_000_000)
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["nll_micro_mean"] == c_ab  # all three tokens same cost
    assert rows[2]["n_tokens"] == 2
    assert rows[2]["nll_micro_mean"] == (c_ab + c_c) // 2


def test_unigram_logprob_total_broadcasts(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "b c")], "doc_id long, text string")
    plan = unigram_logprob(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
