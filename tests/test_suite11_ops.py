"""Round-2 part-9 operators: param mining, circuit breaker."""

from pyspark.sql import functions as F

from crawlspark.canon import mine_droppable_params
from crawlspark.fetch import circuit_breaker_state


def test_param_mining_witness_required(spark):
    pages = spark.createDataFrame(
        # sid varies, content constant per base -> droppable (witnessed)
        [("h", "http://h/p?x=1&sid=a", "c1"),
         ("h", "http://h/p?x=1&sid=b", "c1"),
         # x is content-bearing: same base (sid removed... no - base for x
         # keeps sid) -> singleton bases, no witness -> NOT droppable
         ("h", "http://h/p?x=2&sid=c", "c2")],
        "host STRING, url STRING, content_hash STRING")
    out = {r.param: r for r in mine_droppable_params(pages).collect()}
    assert out["sid"].droppable is True
    assert out["sid"].n_witnessed_bases >= 1
    assert out["x"].droppable is False


def test_param_mining_content_bearing_with_witness(spark):
    pages = spark.createDataFrame(
        # page IS witnessed (two urls share the page-stripped base) and
        # hashes differ -> not droppable even with evidence
        [("h", "http://h/p?page=1", "c1"),
         ("h", "http://h/p?page=2", "c2")],
        "host STRING, url STRING, content_hash STRING")
    out = {r.param: r for r in mine_droppable_params(pages).collect()}
    assert out["page"].n_witnessed_bases == 1
    assert out["page"].droppable is False


def test_circuit_breaker_states(spark):
    rows = []
    # healthy: 10 ok
    rows += [("ok.test", True, 1000 - i) for i in range(10)]
    # open: 6 recent failures, last failure just now
    rows += [("bad.test", False, 1000 - i) for i in range(6)]
    # half-open: 6 failures but last one 700s ago (> 600 cooldown)
    rows += [("cool.test", False, 300 - i) for i in range(6)]
    # outside window: failures too old to count
    rows += [("old.test", False, -5000)] * 8 + [("old.test", True, 990)]
    df = spark.createDataFrame(rows, "host STRING, ok BOOLEAN, fetch_ts LONG")
    out = {r.host: r for r in
           circuit_breaker_state(df, now_ts=1000, window_s=3600).collect()}
    assert out["ok.test"].state == "closed"
    assert out["bad.test"].state == "open"
    assert out["cool.test"].state == "half_open"
    # stale failures fell out of the window entirely
    assert out["old.test"].state == "closed" and out["old.test"].n_fail == 0


def test_param_mining_regex_metachar_names(spark):
    """Param names are data, not regex: 'ids[]' (PHP array params) and
    dotted names must mine cleanly instead of aborting the job with
    INVALID_PARAMETER_VALUE.PATTERN (ADVICE r2)."""
    pages = spark.createDataFrame(
        [("h", "http://h/p?ids[]=1&x=2", "c1"),
         ("h", "http://h/p?ids[]=9&x=2", "c1"),
         ("h", "http://h/p?ids[]=1&x=3", "c2"),
         ("h", "http://h/q?s.id=7", "c3")],
        "host STRING, url STRING, content_hash STRING")
    out = {r.param: r for r in mine_droppable_params(pages).collect()}
    # ids[] never changes content within a base -> droppable
    assert out["ids[]"].droppable is True
    # x flips the hash within its base -> content-bearing
    assert out["x"].droppable is False
    # dotted name parses as a literal, singleton base -> unwitnessed
    assert out["s.id"].droppable is False
