"""BM25 top-terms: integer formula checked against a python re-derivation."""

import math

from crawlspark.textops.quality import bm25_top_terms


def _w_micro(tf, df, dl, n_docs, t_tokens):
    idf = math.floor(math.log(1 + (n_docs - df + 0.5) / (df + 0.5)) * 1_000_000)
    rel = (1000 * dl * n_docs) // t_tokens
    norm = 250 + (750 * rel) // 1000
    tff = (22000 * tf * 1_000_000) // (10000 * tf + 12 * norm)
    return (idf * tff) // 1_000_000


def test_bm25_exact_weights_and_ranks(spark):
    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry cherry cherry")],
        "doc_id long, text string",
    )
    rows = bm25_top_terms(df, top_k=3).collect()
    by_doc_term = {(r["doc_id"], r["term"]): r for r in rows}
    n_docs, t_tokens = 2, 7
    assert by_doc_term[(1, "apple")]["w_micro"] == _w_micro(2, 1, 3, n_docs, t_tokens)
    assert by_doc_term[(1, "banana")]["w_micro"] == _w_micro(1, 2, 3, n_docs, t_tokens)
    assert by_doc_term[(2, "cherry")]["w_micro"] == _w_micro(3, 1, 4, n_docs, t_tokens)
    # the corpus-wide term (banana) ranks below the distinctive terms
    assert by_doc_term[(1, "apple")]["rnk"] == 1
    assert by_doc_term[(2, "cherry")]["rnk"] == 1
    assert by_doc_term[(2, "banana")]["rnk"] == 2


def test_bm25_topk_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "e d c b a"), (2, "z y")], "doc_id long, text string"
    )
    rows = [r for r in bm25_top_terms(df, top_k=3).collect() if r["doc_id"] == 1]
    assert len(rows) == 3  # top_k caps the per-doc output
    # all five terms tie (tf=1, df=1, same dl) -> lexicographic tiebreak
    assert [r["term"] for r in sorted(rows, key=lambda r: r["rnk"])] == [
        "a", "b", "c",
    ]
