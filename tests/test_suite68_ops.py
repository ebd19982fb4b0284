"""Edge-case tests for suite68 ops: Gini closed forms, datasheet
empty corpus, lang-attr confidence gating."""

from __future__ import annotations

import pytest

from crawlspark.capacity import gini_coefficient
from crawlspark.textops.curate import corpus_datasheet
from crawlspark.textops.quality import lang_attr_mismatch


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_gini_closed_forms(spark):
    # perfectly equal -> 0
    eq = spark.createDataFrame([(f"h{i}", 10) for i in range(10)],
                               "host string, n long")
    assert gini_coefficient(eq).collect()[0].gini_milli == 0
    # one host holds everything -> (n-1)/n = 0.9
    one = spark.createDataFrame(
        [("h0", 1000)] + [(f"h{i}", 0) for i in range(1, 10)],
        "host string, n long")
    assert gini_coefficient(one).collect()[0].gini_milli == 900
    # zero total -> NULL
    z = spark.createDataFrame([("a", 0), ("b", 0)], "host string, n long")
    assert gini_coefficient(z).collect()[0].gini_milli is None


def test_datasheet_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "d e"), (4, "")],
        "doc_id long, text string")
    r = corpus_datasheet(docs).collect()[0]
    assert r.n_docs == 4 and r.n_tokens == 8
    assert r.vocab_size == 5
    assert r.n_exact_dup_docs == 1
    assert r.dup_permille == 250
    assert r.mean_tokens_milli == 2000


def test_lang_attr_confidence_gating(spark):
    pages = spark.createDataFrame([
        (1, '<html lang="en">', "der hund und das tier"),   # mismatch
        (2, '<html lang="en">', "zz qq ww"),                # other -> no
        (3, "<html>", "der hund und das tier"),             # undeclared
        (4, '<html lang="de">', "der hund und das tier"),   # agree
    ], "doc_id long, body string, text string")
    got = {r.id: r.mismatch for r in lang_attr_mismatch(pages).collect()}
    assert got == {1: True, 2: False, 3: False, 4: False}
