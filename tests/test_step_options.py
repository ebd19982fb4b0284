"""BaseStep option surface: keep/keepAs/keepFromInput/keepInputAs,
useInputKey, outputKey, uniqueOutputs(key), excludeFromGroupOutput,
Crawler outputHook / runAndTraverse (BaseStep.php:124-229, Step.php:82-87,
Crawler.php:175-241)."""

import json

import pytest

from crawlspark import fixture
from crawlspark.crawler import (
    Crawler, GetLinks, Group, HttpGet, JsonGet, PreRunValidationError,
    Refine, Title,
)

B = fixture.B


def test_keep_as_and_keep_input_as(spark):
    pages = fixture.pages_df(spark)
    out = (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(HttpGet(pages))
        .add_step(GetLinks().keep_as("link"))
        .run()
        .orderBy("ord")
        .collect()
    )
    assert out[0].link == out[0].value  # keepAs carries the output value


def test_keep_named_keys_of_record_output(spark):
    out = (
        Crawler(spark)
        .input(json.dumps({"a": "1", "b": "2", "c": "3"}))
        .add_step(JsonGet(a="a", b="b", c="c").keep(["a", "c"]))
        .run()
        .collect()
    )
    r = out[0]
    assert r.a == "1" and r.c == "3"
    assert "b" not in r.asDict()


def test_keep_from_input_snapshots_pre_step_value(spark):
    pages = fixture.pages_df(spark)
    out = (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(HttpGet(pages))
        .add_step(Title().keep_input_as("page"))
        .run()
        .collect()
    )
    # the kept value is the INPUT of Title (the response struct), not the
    # title string
    assert out[0].page.url == f"{B}/crawling/main"


def test_use_input_key_and_output_key(spark):
    out = (
        Crawler(spark)
        .input(json.dumps({"txt": "  hello  ", "other": "x"}))
        .add_step(JsonGet(txt="txt", other="other"))
        .add_step(Refine(lambda v: v).use_input_key("txt"))
        .run()
        .collect()
    )
    assert out[0].value == "  hello  "  # step consumed only the txt key
    out2 = (
        Crawler(spark)
        .input(json.dumps({"a": "1", "b": "2"}))
        .add_step(JsonGet(a="a", b="b").output_key("b"))
        .run()
        .collect()
    )
    assert out2[0].value == "2"  # record collapsed to the named key


def test_use_input_key_on_scalar_rejected_pre_run(spark):
    c = (
        Crawler(spark)
        .input("plain string")
        .add_step(Refine(lambda v: v).use_input_key("txt"))
    )
    with pytest.raises(PreRunValidationError, match="useInputKey"):
        c.run()


def test_bare_keep_of_scalar_output_rejected_pre_run(spark):
    pages = fixture.pages_df(spark)
    c = (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(HttpGet(pages))
        .add_step(Title().keep())  # Title yields scalar
    )
    with pytest.raises(PreRunValidationError, match="keep"):
        c.run()


def test_unique_outputs_by_key(spark):
    rows = [{"k": "x", "v": str(i)} for i in range(3)] + [{"k": "y", "v": "9"}]
    out = (
        Crawler(spark)
        .inputs([json.dumps(r) for r in rows])
        .add_step(JsonGet(k="k", v="v").unique_outputs("k"))
        .run()
        .orderBy("ord")
        .collect()
    )
    # first occurrence per key survives (uniqueOutputs('k'))
    assert [(r.value.k, r.value.v) for r in out] == [("x", "0"), ("y", "9")]


def test_exclude_from_group_output(spark):
    pages = fixture.pages_df(spark)
    out = (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(HttpGet(pages))
        .add_step(Group(
            title=Title(),
            links=GetLinks().exclude_from_group_output(),
        ))
        .run()
        .collect()
    )
    fields = out[0].value.asDict()
    assert "title" in fields and "links" not in fields


def test_output_hook_sees_every_step(spark):
    pages = fixture.pages_df(spark)
    seen = []
    (
        Crawler(spark)
        .input(f"{B}/crawling/main")
        .add_step(HttpGet(pages))
        .add_step(Title())
        .output_hook(lambda i, step, df: seen.append((i, type(step).__name__)))
        .run()
        .collect()
    )
    assert seen == [(0, "HttpGet"), (1, "Title")]


def test_run_and_traverse_executes_store(spark, tmp_path):
    from crawlspark.crawler import JsonFileStore

    pages = fixture.pages_df(spark)
    store = JsonFileStore(str(tmp_path / "out"))
    (
        Crawler(spark)
        .input(f"{B}/crawling/sub1")
        .add_step(HttpGet(pages))
        .add_step(Title().keep_as("t"))
        .set_store(store)
        .run_and_traverse()
    )
    written = spark.read.json(str(tmp_path / "out")).collect()
    assert len(written) == 1 and written[0].t
