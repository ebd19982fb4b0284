"""Round-3 part-15 operators: postings d-gap/varint size planning and
doc-id reassignment savings."""

from pyspark.sql import functions as F


def test_varint_bytes_boundaries(spark):
    from crawlspark.textops.quality import varint_bytes

    # exact LEB128 boundaries for non-negative int64: 2^(7k)-1 is the
    # last k-byte value; int64 max needs 9 bytes
    cases = []
    for k in range(1, 9):
        cases.append(((1 << (7 * k)) - 1, k))
        cases.append((1 << (7 * k), k + 1))
    cases += [(0, 1), (1, 1), ((1 << 63) - 1, 9)]
    df = spark.createDataFrame(
        [(v, exp) for v, exp in cases], "v long, expected long"
    )
    bad = df.where(varint_bytes("v") != F.col("expected")).collect()
    assert bad == []


def test_postings_gap_stats_exact(spark):
    from crawlspark.textops.quality import postings_gap_stats

    # hand-computed: term 'a' in docs 0,1,200 -> gaps 0,1,199 -> varint
    # bytes 1+1+2 = 4; term 'b' in docs 1,200 -> gaps 1,199 -> 3 bytes;
    # term 'c' only in doc 200 (df=1, dropped by min_df=2)
    df = spark.createDataFrame(
        [(0, "a a"), (1, "a b"), (200, "  a\tb c ")],
        "doc_id long, text string",
    )
    got = {
        r["word"]: r
        for r in postings_gap_stats(df, min_df=2).collect()
    }
    assert set(got) == {"a", "b"}
    assert got["a"]["df"] == 3 and got["a"]["postings_bytes"] == 4
    assert got["a"]["first_doc"] == 0
    assert got["a"]["fixed_bytes"] == 24
    assert got["a"]["savings_permille"] == (1000 * 20) // 24
    assert got["b"]["df"] == 2 and got["b"]["postings_bytes"] == 3


def test_postings_empty_and_whitespace_only_docs(spark):
    from crawlspark.textops.quality import postings_gap_stats

    df = spark.createDataFrame(
        [(0, ""), (1, "   \t "), (2, "x y"), (3, "x")],
        "doc_id long, text string",
    )
    rows = postings_gap_stats(df, min_df=1).collect()
    assert {r["word"] for r in rows} == {"x", "y"}


def test_docid_remap_clusters_shrink_index(spark):
    from crawlspark.textops.quality import docid_remap_savings

    # two disjoint vocabularies interleaved by original id: remapping
    # by lang makes each term's postings a dense run -> strictly fewer
    # varint bytes.  Ids are spread out (stride 130) so original gaps
    # need 2 bytes while remapped gaps of 1 need 1 byte.
    rows = []
    for i in range(40):
        rows.append((130 * i, "en", "alpha beta"))
        rows.append((130 * i + 65, "de", "gamma delta"))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    r = docid_remap_savings(df, order_cols=["lang"]).collect()[0]
    assert r["n_terms"] == 4
    assert r["n_postings"] == 160
    assert r["remap_bytes"] < r["orig_bytes"]
    assert r["saved_bytes"] == r["orig_bytes"] - r["remap_bytes"]
    assert 0 < r["savings_permille"] < 1000
