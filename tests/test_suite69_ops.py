"""Edge-case tests for suite69 ops: never-emitted window deltas, lane
degeneration to k=1, family-fold suffix forms."""

from __future__ import annotations

import pytest

from crawlspark.images import pad_alignment_cost, resolution_family_fold
from crawlspark.politeness import parallel_throttle_schedule
from crawlspark.streaming import late_correction_deltas


@pytest.fixture(scope="module")
def spark():
    from crawlspark.session import get_spark

    return get_spark(cores=4)


def test_late_deltas_unseen_window(spark):
    fin = spark.createDataFrame([("a", 0, 5)],
                                "key string, window_start long,"
                                " n_events long")
    late = spark.createDataFrame(
        [("a", 0), ("a", 0), ("a", 60), ("b", 0)],
        "key string, window_start long")
    got = {(r.key, r.window_start): r for r in
           late_correction_deltas(fin, late).collect()}
    assert got[("a", 0)].new_n == 7 and got[("a", 0)].was_emitted
    assert got[("a", 60)].old_n == 0 and not got[("a", 60)].was_emitted
    assert got[("b", 0)].delta == 1


def test_parallel_throttle_k1_matches_sequential(spark):
    f = spark.createDataFrame(
        [("h", i, 100) for i in range(5)],
        "host string, ord long, delay_ms long")
    got = sorted(parallel_throttle_schedule(f, connections=1).collect(),
                 key=lambda r: r.ord)
    assert [r.dispatch_ms for r in got] == [0, 100, 200, 300, 400]
    assert all(r.lane == 0 for r in got)
    got3 = sorted(parallel_throttle_schedule(f, connections=3).collect(),
                  key=lambda r: r.ord)
    assert [r.dispatch_ms for r in got3] == [0, 0, 0, 100, 100]
    assert [r.lane for r in got3] == [0, 1, 2, 0, 1]


def test_pad_alignment_exact_multiple(spark):
    df = spark.createDataFrame([(1, 128, 64)], "id long, w long, h long")
    r = pad_alignment_cost(df).collect()[0]
    assert (r.pad_w, r.pad_h) == (128, 64)
    assert r.waste_permille == 0


def test_family_fold_suffix_forms(spark):
    urls = [
        "http://c/a/pic-640x480.png",
        "http://c/a/pic_1280x720.png",   # underscore form, same family
        "http://c/a/pic-300w.png",
        "http://c/a/pic@2x.png",
        "http://c/a/pic.png",
        "http://c/b/pic-640x480.png",    # different directory = family
        "http://c/a/unrelated-99.png",   # -99 is not a size suffix
    ]
    df = spark.createDataFrame([(u,) for u in urls], "image_url string")
    got = {r.family_key: r for r in resolution_family_fold(df).collect()}
    assert got["http://c/a/pic"].n_variants == 5
    assert got["http://c/a/pic"].best_w == 1280
    assert got["http://c/a/pic"].best_url == "http://c/a/pic_1280x720.png"
    assert got["http://c/b/pic"].n_variants == 1
    assert "http://c/a/unrelated-99" in got
