"""Edge-case tests for suite62 ops: ICO entry cap and tie-break,
homograph label boundaries, request-rate first-valid-wins, burstiness
closed forms."""

from __future__ import annotations

import struct

import pytest

from crawlspark.canon import homograph_risk
from crawlspark.images import ico_sniff
from crawlspark.politeness import interarrival_burstiness
from crawlspark.robots import parse_request_rate


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def _ico(kind, entries, pad=0):
    out = struct.pack("<HHH", 0, kind, len(entries))
    for w, h, bpp, size, off in entries:
        out += struct.pack("<BBBBHHII", w, h, 0, 0, 1, bpp, size, off)
    return out + b"\x00" * pad


def test_ico_bpp_tiebreak_and_entry_cap(spark):
    # equal area 16x16: deeper bpp wins
    tie = _ico(1, [(16, 16, 4, 4, 38), (16, 16, 24, 4, 42)], pad=8)
    # 12 entries declared but payload only holds 3 -> inspect first 3
    capped = _ico(1, [(8, 8, 8, 1, 54)] * 3)
    capped = capped[:6] + struct.pack("<H", 12)[0:0] + capped[6:]
    many = struct.pack("<HHH", 0, 1, 12) + capped[6:]
    df = spark.createDataFrame(
        [(1, tie), (2, many)], "id long, bytes binary")
    got = {r.id: r for r in ico_sniff(df).collect()}
    assert got[1].ico_best_bpp == 24 and got[1].ico_best_w == 16
    assert got[2].ico_n_images == 12  # declared count reported
    assert got[2].ico_best_w == 8     # only in-payload entries inspected


def test_homograph_digits_and_hyphens_neutral(spark):
    df = spark.createDataFrame(
        [("x1-2.com",), ("аb.com",), ("ab.ру",)], "host string")
    got = {r.host: r for r in homograph_risk(df).collect()}
    assert not got["x1-2.com"].homograph_risk
    assert got["аb.com"].homograph_risk           # cyr+lat in one label
    assert not got["ab.ру"].homograph_risk        # cross-label only
    assert got["ab.ру"].scripts_in_host == 2


def test_request_rate_first_valid_wins(spark):
    robots = spark.createDataFrame(
        [("a.com", "Request-rate: bogus\nRequest-rate: 4/20\n"
                   "Request-rate: 1/1\n")],
        "host string, body string")
    r = parse_request_rate(robots).collect()[0]
    assert (r.rate_requests, r.rate_seconds) == (4, 20)
    assert r.rate_delay_ms == 5000
    assert r.visit_from_min is None


def test_burstiness_closed_forms(spark):
    rows = (
        # perfectly paced: gaps 10,10,10 -> cv2 = 0
        [("even", t) for t in (0, 10, 20, 30)]
        # bursty: gaps 1,1,28 -> mean 10, var = (81+81+324)/3 = 162
        + [("burst", t) for t in (0, 1, 2, 30)]
        # single event -> no gaps -> absent
        + [("lone", 5)]
    )
    df = spark.createDataFrame(rows, "host string, ts long")
    got = {r.host: r for r in interarrival_burstiness(df).collect()}
    assert set(got) == {"even", "burst"}
    assert got["even"].cv2_milli == 0
    assert got["burst"].cv2_milli == 1620  # 162/100 = 1.62
