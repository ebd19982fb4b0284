"""Tests for the a11y audit."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_a11y_hidden_inputs_and_score(spark):
    from crawlspark.extract import a11y_audit

    cases = [
        # all inputs hidden -> no input denominator, no aria/landmark
        ('<input type="hidden"><input type="hidden">', 0, 0, 0, 0, 0),
        # three inputs, two labeled -> 666
        ('<input id="a"><input aria-labelledby="x"><input name="n">',
         1, 0, 3, 2, 666),
        # tabindex="0" and "-1" are fine; only positive flags
        ('<a tabindex="0">x</a><b tabindex="-1">y</b>'
         '<i tabindex="3">z</i>', 0, 0, 0, 0, 0),
    ]
    df = spark.createDataFrame(
        [Row(i=i, h=h) for i, (h, *_) in enumerate(cases)],
        "i int, h string")
    out = {r.i: r for r in df.select(
        "i", a11y_audit(F.col("h")).alias("a")).select(
        "i", "a.*").collect()}
    assert out[0].n_inputs == 0 and out[0].score_permille == 0
    assert out[1].n_inputs == 3 and out[1].n_labeled_inputs == 2
    assert out[1].score_permille == 666
    assert out[2].n_positive_tabindex == 1
