"""Edge-case tests for suite66 ops: rule order vs empty rules,
rebalance conservation, EXIF inline short values, SRI attr quoting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawlspark.extract import sri_audit
from crawlspark.images import exif_datetime_scan
from crawlspark.scheduler import apply_priority_rules, rebalance_transfers


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_priority_rules_order_and_empty(spark):
    urls = spark.createDataFrame([("http://h/a?page=1&x=/product/",)],
                                 "url string")
    rules = spark.createDataFrame(
        [(2, "/product/", 90), (1, r"\?page=", 10)],
        "rule_ord int, pattern string, priority int")
    r = apply_priority_rules(urls, rules).collect()[0]
    assert r.rule_ord == 1 and r.priority == 10  # rule 1 evaluated first
    empty = spark.createDataFrame([], "rule_ord int, pattern string,"
                                      " priority int")
    r2 = apply_priority_rules(urls, empty, default_priority=7).collect()[0]
    assert r2.rule_ord is None and r2.priority == 7


def test_rebalance_conserves_and_balances(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 500)) for i in range(50)]
    df = spark.createDataFrame(rows, "shard_id long, backlog long")
    plan = rebalance_transfers(df).collect()
    total = sum(b for _, b in rows)
    target_lo, target_hi = total // 50, total // 50 + 1
    after = dict(rows)
    for t in plan:
        assert t.amount > 0
        after[t.from_shard] -= t.amount
        after[t.to_shard] += t.amount
    assert all(target_lo <= v <= target_hi for v in after.values())


def test_exif_datetime_inline_short_value(spark):
    import struct

    # count = 4 -> the value sits INSIDE the value field, no offset
    e = "<"
    h = lambda fmt, *v: struct.pack(e + fmt, *v)
    b = (b"II*\x00" + h("I", 8)
         + h("H", 1) + h("HHII", 0x8769, 4, 1, 26) + h("I", 0)
         + h("H", 1) + h("HHI", 0x9003, 2, 4) + b"20x\x00" + h("I", 0))
    df = spark.createDataFrame([(1, b)], "id long, bytes binary")
    r = exif_datetime_scan(df).collect()[0]
    assert r.exif_has_subifd == 1
    assert r.exif_datetime_original == "20x"
    assert r.exif_capture_year is None  # not 4 leading digits


def test_sri_single_quotes_and_no_src(spark):
    body = ("<script>inline, no src</script>"
            "<script src='/a.js' integrity='sha512-XX'></script>"
            "<link rel=stylesheet href=/b.css>")
    df = spark.createDataFrame([(body,)], "body string")
    r = df.select(sri_audit(F.col("body")).alias("s")).collect()[0].s
    assert r.n_subresources == 2    # inline script not counted
    assert r.n_with_sri == 1
    assert r.algos == ["sha512"]
