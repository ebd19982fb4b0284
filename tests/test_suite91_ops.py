"""Tests for lang-path pair mining and quality drift."""

from pyspark.sql import Row


def test_lang_path_pairs_hand_case(spark):
    from crawlspark.canon import lang_path_pairs

    rows = [
        Row(host="a", url="https://a/en/post/1"),
        Row(host="a", url="https://a/de/post/1"),
        Row(host="a", url="https://a/de/post/1"),   # dup URL: one lang
        Row(host="a", url="https://a/fr/other"),    # residual alone
        Row(host="a", url="https://a/xx/post/1"),   # 'xx' not a lang code
        Row(host="a", url="https://a/env/post/1"),  # 3-letter seg: not lang
        Row(host="b", url="https://b/en/post/1"),   # other host: no pair
        Row(host="a", url="https://a/en"),          # bare lang, no residual
        Row(host="a", url="https://a/de"),
    ]
    out = {(r.host, r.residual): r for r in
           lang_path_pairs(spark.createDataFrame(rows)).collect()}
    assert ("a", "/post/1") in out
    assert out[("a", "/post/1")].langs == ["de", "en"]
    assert ("b", "/post/1") not in out
    # bare /en and /de share the empty residual -> legitimate pair
    assert out.get(("a", "")) is not None
    assert len(out) == 2


def test_quality_drift_trends(spark):
    from crawlspark.textops.quality import quality_drift

    rows = []
    for day in range(5):
        rows.append(Row(source="up", day=day, score=10 + day))
        rows.append(Row(source="down", day=day, score=100 - 2 * day))
        rows.append(Row(source="flat", day=day, score=7))
    rows.append(Row(source="one", day=3, score=5))
    out = {r.source: r for r in
           quality_drift(spark.createDataFrame(rows)).collect()}
    assert out["up"].trend == "improving"
    # exact slope check: mean_milli = (10+day)*1000; slope num/den == 1000
    assert out["up"].slope_num / out["up"].slope_den == 1000.0
    assert out["down"].trend == "declining"
    assert out["down"].slope_num / out["down"].slope_den == -2000.0
    assert out["flat"].trend == "flat" and out["flat"].slope_num == 0
    assert out["one"].trend == "insufficient"
