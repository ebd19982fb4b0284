"""Edge-case tests for suite58 ops: alias folding thresholds, chroma
walk on fill bytes/truncation, retry budget floor, Hill estimator."""

from __future__ import annotations

import math

import pytest

from crawlspark.canon import host_alias_folding
from crawlspark.capacity import hill_alpha
from crawlspark.fetch import retry_budget
from crawlspark.images import jpeg_chroma_subsampling


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_host_alias_threshold_and_no_apex(spark):
    rows = (
        # www.a.com agrees 9/10 -> folds at 900 permille
        [("www.a.com", f"/p{i}", f"h{i}" if i else "zz") for i in range(10)]
        + [("a.com", f"/p{i}", f"h{i}") for i in range(10)]
        # m.a.com agrees 1/2 -> not folded
        + [("m.a.com", "/p0", "h0"), ("m.a.com", "/p1", "nope")]
        # www.ghost.com has no live apex -> no output row at all
        + [("www.ghost.com", "/x", "g")]
    )
    df = spark.createDataFrame(
        rows, "host string, path string, content_hash string")
    got = {r.host: r for r in host_alias_folding(df).collect()}
    assert set(got) == {"www.a.com", "m.a.com"}
    assert got["www.a.com"].folded and got["www.a.com"].n_agree == 9
    assert not got["m.a.com"].folded
    assert got["www.a.com"].canonical_host == "a.com"


def test_jpeg_chroma_fill_bytes_and_truncated_sof(spark):
    # fill byte FF before SOF marker (B.1.1.2), 4:2:0
    good = ("ffd8" + "ff"  # fill
            + "ffc0" + "0011" + "08" + "0010" + "0010"
            + "03" + "012200" + "021101" + "031101")
    # SOF declares 3 components but payload is cut mid-components
    trunc = "ffd8" + "ffc0" + "0011" + "08" + "0010" + "0010" + "03" + "0122"
    df = spark.createDataFrame(
        [(1, bytes.fromhex(good)), (2, bytes.fromhex(trunc))],
        "id long, bytes binary")
    got = {r.id: r for r in jpeg_chroma_subsampling(df).collect()}
    assert got[1].jpeg_subsampling == "4:2:0"
    assert got[1].jpeg_progressive == 0
    assert got[2].jpeg_subsampling is None
    assert got[2].jpeg_n_components is None


def test_retry_budget_floor_and_cap(spark):
    rows = (
        # h1 bucket 0: 0 successes, 5 failures -> only the floor (2) granted
        [("h1", i, False) for i in range(5)]
        # h2 bucket 0: 40 ok, 3 fail -> budget 2 + 40*0.1 = 6, all granted
        + [("h2", i, True) for i in range(40)]
        + [("h2", 50 + i, False) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "host string, ts long, ok boolean")
    got = {r.host: r for r in retry_budget(df).collect()}
    assert got["h1"].budget == 2 and got["h1"].granted == 2
    assert got["h1"].deferred == 3
    assert got["h2"].budget == 6 and got["h2"].granted == 3
    assert got["h2"].deferred == 0


def test_hill_alpha_exact_pareto(spark):
    # sizes x_k = 2^(10-k): exact ln-ratios, alpha should come out ~1/ln2
    sizes = spark.createDataFrame(
        [(2 ** (10 - i),) for i in range(10)], "n long")
    row = hill_alpha(sizes, k=5).collect()[0]
    assert row.k == 5
    assert row.x_tail == 2 ** 5
    # sum of ln(2^j) for j=1..5 = 15*ln2; alpha = 5/(15 ln2)
    expect = 5 / (15 * math.log(2))
    assert abs(row.alpha_milli / 1000 - expect) < 5e-3
