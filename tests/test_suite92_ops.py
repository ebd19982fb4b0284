"""Tests for hard-negative mining and typosquat screening."""

from pyspark.sql import Row


def test_hard_negative_pairs_jaccard_classes(spark):
    from crawlspark.mmcurate import hard_negative_pairs

    pairs = spark.createDataFrame([
        Row(id_a="a", id_b="b", hamming=2),
        Row(id_a="a", id_b="c", hamming=3),
        Row(id_a="d", id_b="e", hamming=1),
    ])
    caps = spark.createDataFrame([
        Row(image_id="a", caption="red cat on mat"),
        Row(image_id="b", caption="RED cat ON mat"),    # case-folded: same
        Row(image_id="c", caption="blue dog by tree"),  # disjoint
        Row(image_id="d", caption="x y z"),
        Row(image_id="e", caption="x y q"),             # 2/4 = 500
    ])
    out = {(r.id_a, r.id_b): r for r in
           hard_negative_pairs(pairs, caps).collect()}
    assert out[("a", "b")].caption_jaccard_permille == 1000
    assert out[("a", "b")].hard_negative is False
    assert out[("a", "c")].caption_jaccard_permille == 0
    assert out[("a", "c")].hard_negative is True
    assert out[("d", "e")].caption_jaccard_permille == 500
    assert out[("d", "e")].hard_negative is False  # 500 >= 300 threshold


def test_typosquat_hosts_edits_and_exclusions(spark):
    from crawlspark.canon import typosquat_hosts

    hosts = spark.createDataFrame(
        [Row(host=h) for h in [
            "paypa1.com",      # substitution, dist 1
            "paypal.com",      # brand itself: excluded
            "paypall.com",     # insertion, dist 1
            "paypa.com",       # deletion, dist 1... 'paypal.com'->'paypa.com' is 1 deletion
            "pay-pal.com",     # dist 1 insertion of '-'
            "bank.com",        # far
        ]])
    out = {(r.host, r.brand): r.dist for r in typosquat_hosts(
        hosts, ["paypal.com"], max_dist=1).collect()}
    assert ("paypa1.com", "paypal.com") in out
    assert ("paypall.com", "paypal.com") in out
    assert ("paypa.com", "paypal.com") in out
    assert ("pay-pal.com", "paypal.com") in out
    assert all(h != "paypal.com" for h, _ in out)
    assert ("bank.com", "paypal.com") not in out
