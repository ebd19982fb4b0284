"""Round-4 hardening: hll b-mismatch loud failure, literal CSV
separators, epoch-dialect rate-limit resets, a11y attribute-name
anchoring (data-id must not count as a label)."""

import pytest
from pyspark.sql import functions as F


def test_hll_estimate_b_mismatch_fails_loudly(spark):
    from crawlspark.sketch import hll_build, hll_estimate

    df = spark.range(2000).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("k"))
    regs = hll_build(df, "grp", "k", b=8)
    # matched b: fine
    est = hll_estimate(regs, b=8).collect()[0]
    assert 1500 < est.est < 2600
    # mismatched (smaller) b: must raise, not silently mis-estimate
    with pytest.raises(Exception, match="bucket"):
        hll_estimate(regs, b=6).collect()


def test_csv_type_sniff_literal_pipe_and_dot_sep(spark):
    from crawlspark.steps import csv_type_sniff

    d = spark.createDataFrame(
        [("a|b\n1|x\n2|y",), ], ["t"])
    out = d.select(csv_type_sniff(F.col("t"), sep="|").alias("c")) \
        .collect()[0].c
    assert [r.col_name for r in out] == ["a", "b"]
    assert [r.inferred for r in out] == ["int", "string"]

    d2 = spark.createDataFrame([("a.b\n1.x",)], ["t"])
    out2 = d2.select(csv_type_sniff(F.col("t"), sep=".").alias("c")) \
        .collect()[0].c
    assert [r.col_name for r in out2] == ["a", "b"]


def test_ratelimit_epoch_reset_dialect(spark):
    from crawlspark.fetch import ratelimit_headers_info

    d = spark.createDataFrame(
        [(600, 5, 1_756_000_045, 1_756_000_000),
         (600, 5, 30, 1_756_000_000)],
        ["l", "r", "s", "now"])
    # with now: epoch converted to a 45 s delta
    rows = d.select(ratelimit_headers_info(
        F.col("l"), F.col("r"), F.col("s"), now=F.col("now"))
        .alias("rl")).collect()
    assert rows[0].rl.reset_s == 45
    assert rows[0].rl.suggested_delay_ms == 9000
    assert rows[1].rl.reset_s == 30
    # without now: epoch reset nulled instead of an absurd delay
    rows2 = d.select(ratelimit_headers_info(
        F.col("l"), F.col("r"), F.col("s")).alias("rl")).collect()
    assert rows2[0].rl.reset_s is None
    assert rows2[0].rl.suggested_delay_ms is None
    assert rows2[1].rl.suggested_delay_ms == 6000


def test_a11y_data_id_is_not_a_label(spark):
    from crawlspark.extract import a11y_audit

    d = spark.createDataFrame(
        [('<form><input data-id="x" name="q">'
          '<input id="ok" name="r"></form>',)], ["h"])
    row = d.select(a11y_audit(F.col("h")).alias("a")).collect()[0].a
    assert row.n_inputs == 2
    assert row.n_labeled_inputs == 1
    assert row.score_permille == 500
