"""Round-3 part-8 operators: as-of join, bucketed interval join."""

from pyspark.sql import functions as F


def test_asof_tie_and_before_first(spark):
    from crawlspark.joins import asof_join

    snaps = spark.createDataFrame(
        [("h", 100, "old"), ("h", 200, "new"), ("g", 50, "g1")],
        "host string, ts long, policy string",
    )
    fetches = spark.createDataFrame(
        [("f1", "h", 99),    # before first snapshot -> null
         ("f2", "h", 100),   # exact tie -> snapshot applies
         ("f3", "h", 150),   # between -> old
         ("f4", "h", 500),   # after last -> new
         ("f5", "g", 60)],
        "fetch_id string, host string, fetch_ts long",
    )
    got = {
        r["fetch_id"]: r["policy"]
        for r in asof_join(fetches, snaps, key="host", left_ts="fetch_ts",
                           right_ts="ts", payload_cols=["policy"]).collect()
    }
    assert got == {"f1": None, "f2": "old", "f3": "old", "f4": "new",
                   "f5": "g1"}


def test_asof_keeps_all_left_rows_and_columns(spark):
    from crawlspark.joins import asof_join

    snaps = spark.createDataFrame([("h", 10, "p")],
                                  "host string, ts long, policy string")
    fetches = spark.createDataFrame(
        [("a", "h", 5, 7), ("b", "h", 15, 9)],
        "fetch_id string, host string, fetch_ts long, extra long",
    )
    out = asof_join(fetches, snaps, key="host", left_ts="fetch_ts",
                    right_ts="ts").collect()
    assert len(out) == 2
    by = {r["fetch_id"]: r for r in out}
    assert by["a"]["extra"] == 7 and by["a"]["policy"] is None
    assert by["b"]["policy"] == "p"


def test_interval_join_boundaries_and_stacking(spark):
    from crawlspark.joins import interval_join_bucketed

    windows = spark.createDataFrame(
        [("h", 1000, 2000), ("h", 1500, 3500), ("g", 0, 10)],
        "host string, start long, end long",
    )
    events = spark.createDataFrame(
        [("e0", "h", 999),    # just before -> 0
         ("e1", "h", 1000),   # inclusive start -> 1
         ("e2", "h", 1800),   # inside both -> 2
         ("e3", "h", 2000),   # inclusive end of w1, inside w2 -> 2
         ("e4", "h", 3500),   # inclusive end of w2 -> 1
         ("e5", "h", 3501),   # just after -> 0
         ("e6", "g", 5),      # other key -> 1
         ("e7", "x", 5)],     # key with no windows -> 0
        "event_id string, host string, ts long",
    )
    got = {
        r["event_id"]: r["n_windows"]
        for r in interval_join_bucketed(events, windows, key="host",
                                        bucket=700).collect()
    }
    assert got == {"e0": 0, "e1": 1, "e2": 2, "e3": 2, "e4": 1, "e5": 0,
                   "e6": 1, "e7": 0}


def test_interval_bucket_size_invariance(spark):
    """The bucket size is a performance knob, never a semantics knob."""
    from crawlspark.joins import interval_join_bucketed

    windows = spark.createDataFrame(
        [("h", i * 13, i * 13 + 40) for i in range(30)],
        "host string, start long, end long",
    )
    events = spark.createDataFrame(
        [(f"e{i}", "h", i * 7) for i in range(80)],
        "event_id string, host string, ts long",
    )
    outs = []
    for b in (5, 64, 10000):
        outs.append({
            r["event_id"]: r["n_windows"]
            for r in interval_join_bucketed(events, windows, key="host",
                                            bucket=b).collect()
        })
    assert outs[0] == outs[1] == outs[2]


def test_asof_null_payload_value_not_resurrected(spark):
    """A legitimately-NULL payload in the in-force snapshot must come
    through as NULL (DuckDB ASOF semantics), not be replaced by the
    previous snapshot's value; multi-column payloads must never tear
    across snapshots."""
    from crawlspark.joins import asof_join

    snaps = spark.createDataFrame(
        [("h", 10, "p1", "a1"), ("h", 20, None, "a2")],
        "host string, ts long, policy string, agent string",
    )
    fetches = spark.createDataFrame(
        [("f", "h", 25)], "fetch_id string, host string, fetch_ts long"
    )
    r = asof_join(fetches, snaps, key="host", left_ts="fetch_ts",
                  right_ts="ts").collect()[0]
    assert r["policy"] is None        # not 'p1'
    assert r["agent"] == "a2"         # fields from ONE snapshot, no tear
