"""C4 cleaning and the full Gopher rule set on hand-built documents."""

from crawlspark.textops.curate import c4_clean, gopher_rules


def test_c4_line_rules(spark):
    df = spark.createDataFrame(
        [
            (1, "good first sentence here.\nno punct line\nalso a keeper!\n"
                "uses javascript here.\nhi."),
        ],
        "doc_id long, text string",
    )
    r = c4_clean(df, min_sentences=2).collect()[0]
    # kept: the '.' and '!' lines; dropped: no-punct, javascript, 2-word stub
    assert r["n_lines_total"] == 5 and r["n_lines_kept"] == 2
    assert r["clean_text"] == "good first sentence here.\nalso a keeper!"
    assert r["n_sentences"] == 2 and r["keep_page"]


def test_c4_page_rules(spark):
    df = spark.createDataFrame(
        [
            (1, "lorem ipsum dolor sit amet."),
            (2, "some code follows {x}. another sentence here. and more."),
            (3, "one lonely sentence kept."),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in c4_clean(df, min_sentences=2).collect()}
    assert rows[1]["has_lorem_ipsum"] and not rows[1]["keep_page"]
    assert rows[2]["has_brace"] and not rows[2]["keep_page"]
    assert not rows[3]["keep_page"]  # only 1 sentence < 2


def test_gopher_rules_each_flag(spark):
    fluent = "the cats sat upon of mats and " * 8  # 56 words, mean len >= 3
    df = spark.createDataFrame(
        [
            (1, fluent + "end."),
            (2, "short text only."),                    # word count fails
            (3, fluent + "# " * 20),                    # symbol ratio fails
            # >90% of lines start with a bullet (10/10) -> rule fails
            (4, "\n".join(["- the cats sat upon of mats and"] * 10)),
            (5, fluent + " ".join(str(i) for i in range(40))),  # alpha fails
            (6, ("zz qq ww ee rr tt yy uu ii oo " * 6)),  # no stopwords
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_rules(df, min_words=30).collect()}
    assert rows[1]["keep"]
    assert not rows[2]["ok_word_count"] and not rows[2]["keep"]
    assert not rows[3]["ok_symbol_ratio"]
    assert not rows[4]["ok_bullet_lines"]
    assert not rows[5]["ok_alpha_words"]
    assert not rows[6]["ok_stopwords"]


def test_gopher_mean_word_len_bounds(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j " * 4 + "the of"),      # mean len 1: fail
            (2, "abcdefghijklmnop " * 40 + "the of"),        # mean len 16: fail
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_rules(df, min_words=10).collect()}
    assert not rows[1]["ok_mean_word_len"]
    assert not rows[2]["ok_mean_word_len"]


def test_winnow_plan_hashes_grams_once(spark):
    """Round-5 regression guard: the gram-hash expression must appear
    exactly once in the plan (inside the Generate that materializes the
    array).  The previous nested-HOF form let CollapseProject inline the
    O(L) gram transform into every window lambda — O(L^2) interpreted md5
    per document (the sf0.1 gate query ran 40+ minutes on one task)."""
    from crawlspark.textops import quality

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    plan = quality.winnow_fingerprints(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("md5") == 1, plan
    # and the window min is a real window aggregate, not an array slice
    assert "Window" in plan and "slice" not in plan, plan
