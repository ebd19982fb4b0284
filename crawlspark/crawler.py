"""The fluent Crawler facade — the reference's user-facing API, Spark-side.

Reference shape (src/Crawler.php:128-165,203-220):

    $crawler->input($seed);
    $crawler->addStep(Http::get())
            ->addStep(Html::getLinks())
            ->addStep(...);
    foreach ($crawler->run() as $result) ...

Here the identical chain *declares* a DataFrame plan instead of driving a
generator pipeline — Catalyst pipelines the narrow steps exactly like the
reference's generators do (SURVEY.md §4), and the whole chain stays one
logical plan until `run()`:

    results = (Crawler(spark, pages=corpus_df)
               .input("http://www.example.com/crawling/main")
               .add_step(HttpGet())
               .add_step(GetLinks())
               .add_step(Where(lambda v: v.contains("sub")))
               .add_step(Keep("link"))
               .run())

Internal row = the reference's Io tuple (src/Io.php:7-23) as columns:
  _input_id  which seed this row descends from
  _ord       stable output position (document order for link explosions)
  value      the Io value (string, or response struct after HttpGet)
  keep_*     carried-along result data (Io.keep)
"""

from __future__ import annotations

import re as _re
import time as _time

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import extract


class PreRunValidationError(Exception):
    """Invalid step chain, detected BEFORE any Spark job runs (reference:
    PreRunValidationException, src/Crawler.php:312-333)."""


class Step:
    """Operator: transform the (Io-shaped) DataFrame.  Mirror of
    src/Steps/Step.php:40-67 — but a plan rewrite, not a generator.

    ``input_kind``/``output_kind`` drive the pre-run chain validation
    (src/Steps/BaseStep.php:266-314 via StepOutputType): kinds are
    'scalar' (a bare string value), 'response' (the struct HttpGet yields),
    'record' (any keyed struct), or 'any'.
    """

    input_kind: str = "any"

    def output_kind(self, input_kind: str) -> str:
        return input_kind  # default: pass the value through unchanged

    def apply(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    # builder options shared by all steps (BaseStep.php)
    def __init__(self):
        self._max_outputs: int | None = None
        self._unique: bool = False
        self._unique_key: str | None = None
        self._use_input_key: str | None = None
        self._keep_keys: list[str] | None | bool = False  # False = off
        self._keep_as: str | None = None
        self._keep_from_input: list[str] | None | bool = False
        self._keep_input_as: str | None = None
        self._output_key: str | None = None
        self._exclude_from_group = False

    def max_outputs(self, n: int):
        self._max_outputs = n
        return self

    def unique_outputs(self, key: str | None = None):
        # uniqueOutputs(?key) (BaseStep.php:192-197): with a key, identity
        # is that key of a record output
        self._unique = True
        self._unique_key = key
        return self

    def use_input_key(self, key: str):
        """useInputKey (BaseStep.php:178-183): the step consumes one key
        of a record input instead of the whole record."""
        self._use_input_key = key
        return self

    def keep(self, keys: str | list[str] | None = None):
        """keep() (BaseStep.php:124-133): carry output data into the
        Result — all record fields when keys is None, else the named
        ones.  Scalar outputs need keep_as (pre-run validated)."""
        self._keep_keys = [keys] if isinstance(keys, str) else keys
        return self

    def keep_as(self, key: str):
        self._keep_as = key  # keepAs (BaseStep.php:135-140)
        return self

    def keep_from_input(self, keys: str | list[str] | None = None):
        """keepFromInput (BaseStep.php:145-151): carry the step's INPUT
        data into the Result (all fields / named fields of the record)."""
        self._keep_from_input = [keys] if isinstance(keys, str) else keys
        return self

    def keep_input_as(self, key: str):
        self._keep_input_as = key  # keepInputAs (BaseStep.php:156-161)
        return self

    def output_key(self, key: str):
        """outputKey (BaseStep.php:222-227): yield only the named key of
        a record output (record -> scalar)."""
        self._output_key = key
        return self

    def exclude_from_group_output(self):
        self._exclude_from_group = True  # Step.php:82-87
        return self

    # -- run()-loop hooks (Crawler.run drives these around apply) --
    def _pre_apply(self, df: DataFrame) -> DataFrame:
        names = _value_struct_names(df)
        # keepFromInput/keepInputAs snapshot the INPUT value before the
        # step rewrites it; keep_* columns ride along through any apply
        if self._keep_input_as is not None:
            df = df.withColumn(
                f"keep_{self._keep_input_as}", F.col("value")
            )
        if self._keep_from_input is not False:
            keys = self._keep_from_input
            if keys is None:
                keys = names
            for k in keys:
                df = df.withColumn(f"keep_{k}", F.col("value")[k])
        if self._use_input_key is not None:
            df = df.withColumn(
                "value", F.col("value")[self._use_input_key]
            )
        return df

    def _post_apply(self, df: DataFrame) -> DataFrame:
        names = _value_struct_names(df)
        if self._keep_as is not None:
            df = df.withColumn(f"keep_{self._keep_as}", F.col("value"))
        if self._keep_keys is not False:
            keys = self._keep_keys
            if keys is None:
                keys = names
            for k in keys:
                df = df.withColumn(f"keep_{k}", F.col("value")[k])
        if self._output_key is not None:
            df = df.withColumn("value", F.col("value")[self._output_key])
        return df

    def _post(self, df: DataFrame) -> DataFrame:
        if self._unique:  # uniqueOutputs (BaseStep.php:185-197)
            if self._unique_key is not None:
                from pyspark.sql import Window

                w = Window.partitionBy(
                    F.col("value")[self._unique_key]
                ).orderBy("_input_id", "_ord")
                df = (
                    df.withColumn("_uq", F.row_number().over(w))
                    .filter("_uq = 1")
                    .drop("_uq")
                )
            else:
                df = df.dropDuplicates(["value"])
        if self._max_outputs is not None:  # maxOutputs (BaseStep.php:726-736)
            df = (
                df.orderBy("_input_id", "_ord")
                .limit(self._max_outputs)
            )
        return df


def _value_struct_names(df: DataFrame) -> list[str]:
    vt = df.schema["value"].dataType
    return list(vt.names) if isinstance(vt, T.StructType) else []


def _template_col(df: DataFrame, template: str) -> Column:
    """TemplateString::resolve against the value record's fields
    (src/Utils/TemplateString.php:12-45): ``[crwl:name]`` -> field value,
    quoted names unquoted, unknown names -> '' (the reference substitutes
    an empty string).  Built at plan time into one concat."""
    names = set(_value_struct_names(df))
    parts = _re.split(r"\[crwl:(.+?)\]", template)
    cols: list[Column] = []
    for i, p in enumerate(parts):
        if i % 2 == 0:
            if p:
                cols.append(F.lit(p))
        else:
            var = p.strip()
            if len(var) >= 2 and var[0] == var[-1] and var[0] in ("'", '"'):
                var = var[1:-1]
            var = var.replace("\\'", "'").replace('\\"', '"')
            if var in names:
                cols.append(
                    F.coalesce(F.col("value")[var].cast("string"), F.lit(""))
                )
            else:
                cols.append(F.lit(""))
    return F.concat(*cols) if cols else F.lit("")


def _merge_header_maps(maps: list[Column]) -> Column:
    """HttpHeaders::merge semantics on map columns: same header name from
    two sources -> values joined with ', ' (the HTTP list form), else
    whichever side has it (src/Utils/HttpHeaders.php merge/addTo)."""
    merged = maps[0]
    for m in maps[1:]:
        merged = F.map_zip_with(
            merged, m,
            lambda k, v1, v2: F.when(
                v1.isNotNull() & v2.isNotNull(), F.concat_ws(", ", v1, v2)
            ).otherwise(F.coalesce(v1, v2)),
        )
    return merged


class LoadingError(Exception):
    """stopOnErrorResponse() hit an error response (reference
    LoadingException via HttpLoader::loadOrFail, HttpLoader.php:173-199)."""


class HttpGet(Step):
    """Http::get() against the page corpus (the deterministic loader;
    a live deployment swaps fetch.fetch_stage in).  value: url string or
    record -> response struct (url, status, body).  Error responses
    (>=400) are suppressed unless yield_error_responses
    (HttpBase.php:260-277).

    Full HttpBase option surface (HttpBase.php:66-221):
    - ``use_input_key_as_url/body/header/headers`` pull request
      properties out of record inputs;
    - a record input with a ``url``/``uri`` field is used automatically
      (getUrlFromArrayInput, HttpBase.php:349-356);
    - ``static_url`` resolves a ``[crwl:key]`` TemplateString per row;
    - constructor ``body``/``headers`` values resolve templates too
      (resolveVarsInRequestProperties, HttpBase.php:466-483);
    - ``stop_on_error_response`` fails the whole run on any error
      response (loadOrFail) — the batch analog raises LoadingError;
    - ``cache=ResponseCache`` probes before the load and upserts after
      (HttpLoader.php:543-609), ``skip_cache()`` bypasses the probe for
      this step (HttpBase.php:171-176), ``write_only_cache`` never
      probes but still writes (HttpLoader.php:270-275), and
      ``cache_url_filter`` gates what is written
      (cacheOnlyWhereUrl, HttpLoader.php:277-285).

    When request-shaping options are used, the response struct carries
    the resolved ``req_body``/``req_headers`` so downstream steps (and
    tests) can observe the request that would go on the wire."""

    input_kind = "any"

    def output_kind(self, input_kind: str) -> str:
        return "response"

    def __init__(
        self,
        pages: DataFrame,
        yield_error_responses: bool = False,
        method: str = "GET",
        body: str | None = None,
        headers: dict[str, str] | None = None,
        cache=None,
        write_only_cache: bool = False,
        cache_url_filter: Column | None = None,
    ):
        super().__init__()
        self.pages = pages
        self.yield_errors = yield_error_responses
        self.method = method
        self.body = body
        self.headers = dict(headers or {})
        self.cache = cache
        self.write_only_cache = write_only_cache
        self.cache_url_filter = cache_url_filter
        self._stop_on_error = False
        self._static_url: str | None = None
        self._use_as_url: str | None = None
        self._use_as_body: str | None = None
        self._use_as_header: dict[str, str] = {}
        self._use_as_headers: str | None = None
        self._skip_cache = False

    # --- fluent options (each returns self, like the reference) ---
    def stop_on_error_response(self):
        self._stop_on_error = True
        return self

    def use_input_key_as_url(self, key: str):
        self._use_as_url = key
        return self

    def use_input_key_as_body(self, key: str):
        self._use_as_body = key
        return self

    def use_input_key_as_header(self, key: str, as_header: str | None = None):
        self._use_as_header[key] = as_header or key
        return self

    def use_input_key_as_headers(self, key: str):
        self._use_as_headers = key
        return self

    def static_url(self, url: str):
        self._static_url = url
        return self

    def skip_cache(self):
        self._skip_cache = True
        return self

    # --- request shaping ---
    def _url_col(self, df: DataFrame) -> Column:
        names = _value_struct_names(df)
        if self._static_url is not None:
            return _template_col(df, self._static_url)
        if self._use_as_url is not None:
            if self._use_as_url not in names:
                raise PreRunValidationError(
                    f"use_input_key_as_url({self._use_as_url!r}): input is "
                    "not a record with that key"
                )
            return F.col("value")[self._use_as_url].cast("string")
        for auto in ("url", "uri"):  # HttpBase.php:349-356
            if auto in names:
                return F.col("value")[auto].cast("string")
        return F.col("value").cast("string")

    def _req_body_col(self, df: DataFrame) -> Column | None:
        names = _value_struct_names(df)
        if self._use_as_body is not None:
            if self._use_as_body not in names:
                raise PreRunValidationError(
                    f"use_input_key_as_body({self._use_as_body!r}): input "
                    "is not a record with that key"
                )
            return F.col("value")[self._use_as_body].cast("string")
        if self.body is not None:
            return (
                _template_col(df, self.body)
                if names
                else F.lit(self.body)
            )
        return None

    def _req_headers_col(self, df: DataFrame) -> Column | None:
        names = _value_struct_names(df)
        maps: list[Column] = []
        if self.headers:
            entries: list[Column] = []
            for h, v in self.headers.items():
                entries.append(F.lit(h))
                entries.append(_template_col(df, v) if names else F.lit(v))
            maps.append(F.create_map(*entries))
        if self._use_as_header:
            entries = []
            for key, header_name in self._use_as_header.items():
                if key not in names:
                    raise PreRunValidationError(
                        f"use_input_key_as_header({key!r}): input is not a "
                        "record with that key"
                    )
                entries.append(F.lit(header_name))
                entries.append(F.col("value")[key].cast("string"))
            maps.append(F.create_map(*entries))
        if self._use_as_headers is not None:
            if self._use_as_headers not in names:
                raise PreRunValidationError(
                    f"use_input_key_as_headers({self._use_as_headers!r}): "
                    "input is not a record with that key"
                )
            maps.append(F.col("value")[self._use_as_headers])
        if not maps:
            return None
        return _merge_header_maps(maps)

    def apply(self, df: DataFrame) -> DataFrame:
        work = df.withColumn("_req_url", self._url_col(df))
        req_body = self._req_body_col(df)
        req_headers = self._req_headers_col(df)

        p = self.pages.select(
            F.col("url").alias("_p_url"), "status",
            F.col("body").cast("string").alias("_body"),
        )

        cache_hits = None
        to_load = work
        if self.cache is not None and not self._skip_cache and not self.write_only_cache:
            from .sinks import request_key

            keyed = work.withColumn(
                "_rk_cache", request_key(self.method, F.col("_req_url"))
            )
            live = self.cache.read().select(
                F.col("request_key").alias("_rk_cache"),
                F.col("status").alias("_c_status"),
                F.col("body").cast("string").alias("_c_body"),
            )
            cache_hits = (
                keyed.join(F.broadcast(live), "_rk_cache", "inner")
                .withColumn("status", F.col("_c_status"))
                .withColumn("_body", F.col("_c_body"))
                .drop("_rk_cache", "_c_status", "_c_body")
            )
            to_load = keyed.join(
                F.broadcast(live.select("_rk_cache")), "_rk_cache", "left_anti"
            ).drop("_rk_cache")

        loaded = to_load.join(p, to_load["_req_url"] == p["_p_url"], "inner").drop(
            "_p_url"
        )

        if self.cache is not None:
            from .sinks import request_key

            # upsert what was actually loaded (HttpLoader.php:543-609);
            # checkpoint first so the upstream chain doesn't run twice —
            # and so the probe's lazy parquet read is materialized BEFORE
            # merge() swaps the cache files underneath it
            if cache_hits is not None:
                cache_hits = cache_hits.localCheckpoint(eager=True)
            loaded = loaded.localCheckpoint(eager=True)
            responses = loaded.select(
                request_key(self.method, F.col("_req_url")).alias("request_key"),
                F.col("_req_url").alias("url"),
                "status",
                F.col("_body").cast("binary").alias("body"),
                F.lit(int(_time.time())).alias("stored_at"),
            )
            self.cache.merge(responses, url_filter=self.cache_url_filter)

        out = loaded if cache_hits is None else loaded.unionByName(cache_hits)

        if self._stop_on_error:
            # loadOrFail (HttpLoader.php:173-199): any error response
            # fails the run.  One cheap existence probe.
            err = out.filter(F.col("status") >= 400).select("_req_url", "status")
            first = err.limit(1).collect()
            if first:
                raise LoadingError(
                    f"Failed to load {first[0]['_req_url']}: "
                    f"status {first[0]['status']}"
                )
        if not self.yield_errors:
            out = out.filter(F.col("status") < 400)

        resp_fields = [
            F.col("_req_url").alias("url"),
            F.col("status").alias("status"),
            F.col("_body").alias("body"),
        ]
        if req_body is not None:
            resp_fields.append(req_body.alias("req_body"))
        if req_headers is not None:
            resp_fields.append(req_headers.alias("req_headers"))
        out = out.withColumn("value", F.struct(*resp_fields)).drop(
            "_req_url", "status", "_body"
        )
        return self._post(out)


class _LinkStep(Step):
    """Shared option surface of Html::getLink/getLinks
    (GetLink.php:36-163): an optional CSS selector (matched elements must BE
    <a> tags — non-anchors are ignored, GetLink.php:185-191), host/domain
    scoping relative to the page URL, explicit host/domain allow-lists, and
    withoutFragment() (the reference KEEPS fragments by default,
    GetLink.php:36)."""

    input_kind = "response"

    def output_kind(self, input_kind: str) -> str:
        return "scalar"

    def __init__(self, selector: str | None = None):
        super().__init__()
        self.selector = selector
        self._same_domain: bool | None = None
        self._same_host: bool | None = None
        self._domains: list[str] | None = None
        self._hosts: list[str] | None = None
        self._with_fragment = True

    def on_same_domain(self):
        self._same_domain = True
        return self

    def not_on_same_domain(self):
        self._same_domain = False
        return self

    def on_domain(self, domains):
        self._domains = [domains] if isinstance(domains, str) else list(domains)
        return self

    def on_same_host(self):
        self._same_host = True
        return self

    def not_on_same_host(self):
        self._same_host = False
        return self

    def on_host(self, hosts):
        self._hosts = [hosts] if isinstance(hosts, str) else list(hosts)
        return self

    def without_fragment(self):
        self._with_fragment = False
        return self

    def _resolved_links(self) -> Column:
        """array<struct<url,text,pos>> of resolved links passing every
        configured criterion (matchesAdditionalCriteria, GetLink.php:205-236),
        document order."""
        from .canon import registrable_domain

        raw = (
            extract.make_selector_links_udf(self.selector)(F.col("value.body"))
            if self.selector
            else extract.extract_links_udf(F.col("value.body"))
        )
        resolve = extract.make_resolve_links_udf(keep_fragment=True)
        links = resolve(
            F.col("value.url"),
            extract.extract_base_href_udf(F.col("value.body")),
            raw,
        )
        page_host = F.lower(F.parse_url(F.col("value.url"), F.lit("HOST")))
        page_dom = registrable_domain(page_host)

        def ok(l) -> Column:
            lh = F.lower(F.parse_url(l["url"], F.lit("HOST")))
            cond = F.lit(True)
            if self._same_domain is True:
                cond = cond & (registrable_domain(lh) == page_dom)
            elif self._same_domain is False:
                cond = cond & (registrable_domain(lh) != page_dom)
            if self._same_host is True:
                cond = cond & (lh == page_host)
            elif self._same_host is False:
                cond = cond & (lh != page_host)
            if self._domains is not None:
                cond = cond & registrable_domain(lh).isin(*self._domains)
            if self._hosts is not None:
                cond = cond & lh.isin(*self._hosts)
            return cond

        links = F.filter(links, ok)
        if not self._with_fragment:
            links = F.transform(
                links,
                lambda l: F.struct(
                    F.substring_index(l["url"], "#", 1).alias("url"),
                    l["text"].alias("text"),
                    l["pos"].alias("pos"),
                ),
            )
        return links


class GetLinks(_LinkStep):
    """Html::getLinks() — all matching <a> hrefs resolved against the page
    URL, document order, one output per link (GetLinks.php:16-33); value:
    response struct -> url string."""

    def apply(self, df: DataFrame) -> DataFrame:
        out = (
            df.withColumn("_links", self._resolved_links())
            .select(
                "*", F.posexplode("_links").alias("_lpos", "_link")
            )
            .withColumn("_ord", F.col("_ord") * 1000 + F.col("_lpos"))
            .withColumn("value", F.col("_link.url"))
            .drop("_links", "_lpos", "_link")
        )
        return self._post(out)


class Title(Step):
    """Html::metaData()['title'] — value: response struct -> title string."""

    input_kind = "response"

    def output_kind(self, input_kind: str) -> str:
        return "scalar"

    def apply(self, df: DataFrame) -> DataFrame:
        return self._post(
            df.withColumn("value", extract.extract_title_udf(F.col("value.body")))
        )


class Where(Step):
    """where(Filter) — drop rows whose value fails the predicate
    (Filterable.php:16-78).  fn: Column -> boolean Column."""

    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def apply(self, df: DataFrame) -> DataFrame:
        return self._post(df.filter(self.fn(F.col("value"))))


class Refine(Step):
    """refineOutput(fn) — value: fn(value) (BaseStep.php:199-220)."""

    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def apply(self, df: DataFrame) -> DataFrame:
        return self._post(df.withColumn("value", self.fn(F.col("value"))))


class Keep(Step):
    """keepAs(alias) — copy the current value into the final Result under
    ``alias``; ``Keep()`` with NO alias is the reference's keep(): spread the
    current RECORD's fields into the Result (BaseStep.php:124-161).  A bare
    keep() on a scalar-yielding step is rejected by the pre-run validation
    (BaseStep.php:272-282: scalar outputs need a key)."""

    def __init__(self, alias: str | None = None):
        super().__init__()
        self.alias = alias

    def apply(self, df: DataFrame) -> DataFrame:
        if self.alias is not None:
            return self._post(df.withColumn(f"keep_{self.alias}", F.col("value")))
        out = df
        for fld in df.schema["value"].dataType.fields:
            out = out.withColumn(f"keep_{fld.name}", F.col(f"value.{fld.name}"))
        return self._post(out)


class JsonFileStore:
    """src/Stores/JsonFileStore.php:24-37 — Results written as JSON files."""

    def __init__(self, path: str, mode: str = "append"):
        self.path = path
        self.mode = mode

    def store(self, results: DataFrame) -> None:
        from .sinks import write_json_store

        write_json_store(results, self.path, self.mode)


class SimpleCsvFileStore:
    """src/Stores/SimpleCsvFileStore.php:24-79 — CSV with ' | '-joined
    array columns, exactly like the reference."""

    def __init__(self, path: str, mode: str = "append"):
        self.path = path
        self.mode = mode

    def store(self, results: DataFrame) -> None:
        from pyspark.sql import types as T

        from .sinks import write_csv_store

        df = results
        vt = df.schema["value"].dataType if "value" in df.columns else None
        if isinstance(vt, T.StructType):
            # CSV is flat: spread the record's fields like the reference
            # spreads Result properties (SimpleCsvFileStore.php:44-61)
            others = [c for c in df.columns if c != "value"]
            fields = [
                F.col(f"value.{f.name}").alias(f.name)
                for f in vt.fields
                if f.name not in others
            ]
            df = df.select(*others, *fields)
        write_csv_store(df, self.path, self.mode)


class Crawler:
    """Crawler::input/inputs/addStep/run (src/Crawler.php) — with
    ``set_store``: every Result row also goes to the store while run()
    still returns them (Crawler.php:303-306)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._inputs: list = []
        self._steps: list[Step] = []
        self._store = None
        self._output_hooks: list = []

    def set_store(self, store):
        self._store = store  # Crawler::setStore (StoreInterface)
        return self

    def output_hook(self, callback):
        """Crawler::outputHook (Crawler.php:236-241).  The reference calls
        the closure per output row; the batch analog calls it once per
        step with (step_index, step, outputs_df) — same observability,
        no per-row driver loop."""
        self._output_hooks.append(callback)
        return self

    def input(self, value):
        self._inputs.append(value)  # Crawler.php:128-134
        return self

    def inputs(self, values):
        self._inputs.extend(values)  # Crawler.php:139-143
        return self

    def add_step(self, step: Step):
        self._steps.append(step)  # Crawler.php:150-165
        return self

    def _validate_steps(self) -> None:
        """validateSteps analog (src/Crawler.php:312-333 +
        src/Steps/BaseStep.php:266-314): reject invalid chains BEFORE any
        Spark job — input-kind mismatches and bare keep() of scalar
        outputs raise :class:`PreRunValidationError` with the step number."""
        kind = "scalar"  # initial inputs are strings
        for i, step in enumerate(self._steps):
            eff_kind = kind
            if step._use_input_key is not None:
                if kind not in ("record", "response", "any"):
                    raise PreRunValidationError(
                        f"Pre-Run validation error in step number {i + 1}: "
                        f"useInputKey({step._use_input_key!r}) needs a "
                        f"record input but the previous step yields "
                        f"{kind!r} outputs"
                    )
                eff_kind = "scalar"
            need = getattr(step, "input_kind", "any")
            if need != "any" and eff_kind != need:
                raise PreRunValidationError(
                    f"Pre-Run validation error in step number {i + 1}: "
                    f"{type(step).__name__} expects {need!r} input but the "
                    f"previous step yields {eff_kind!r} outputs"
                )
            if isinstance(step, Keep) and step.alias is None and kind == "scalar":
                raise PreRunValidationError(
                    f"Pre-Run validation error in step number {i + 1}: "
                    "keeping data from a step that yields scalar value "
                    "outputs requires a key — use Keep('name') "
                    "(reference keepAs(), BaseStep.php:266-282)"
                )
            if step._keep_from_input is not False and step._keep_from_input is None \
                    and kind == "scalar":
                raise PreRunValidationError(
                    f"Pre-Run validation error in step number {i + 1}: "
                    "keepFromInput() of a scalar input requires a key — "
                    "use keep_input_as('name') (BaseStep.php:283-297)"
                )
            kind = step.output_kind(eff_kind)
            if step._keep_keys is not False and step._keep_keys is None \
                    and kind in ("scalar",):
                raise PreRunValidationError(
                    f"Pre-Run validation error in step number {i + 1}: "
                    "keep() of a scalar output requires a key — use "
                    "keep_as('name') (BaseStep.php:266-282)"
                )
            if step._output_key is not None:
                kind = "scalar"

    def run(self) -> DataFrame:
        """Build the plan and return the Results DataFrame: one row per
        final output, kept columns (Io.keep) de-prefixed, plus ``value``
        and the stable output order ``ord`` (Crawler.php:282-307).
        Raises :class:`PreRunValidationError` on an invalid chain before
        any Spark job starts."""
        self._validate_steps()
        df = self.spark.createDataFrame(
            [(i, i, v) for i, v in enumerate(self._inputs)],
            "_input_id LONG, _ord LONG, value STRING",
        )
        for i, step in enumerate(self._steps):
            df = step._pre_apply(df)
            df = step.apply(df)
            df = step._post_apply(df)
            for hook in self._output_hooks:
                hook(i, step, df)
        keeps = [c for c in df.columns if c.startswith("keep_")]
        cols = [F.col(c).alias(c[len("keep_"):]) for c in keeps]
        # distributed rank over the (seed, document-order) key — no
        # single-partition window even for huge result sets.  _ord keys are
        # distinct per _input_id by construction (posexplode positions).
        from .ranks import global_rank

        df = df.withColumn("_rk", F.col("_input_id") * F.lit(10**12) + F.col("_ord"))
        ranked = global_rank(df, "_rk", out="ord")
        results = ranked.select(*cols, "value", F.col("ord").cast("long"))
        if self._store is not None:
            # materialize once: the store write would otherwise execute the
            # whole chain and the caller's first action would re-execute it
            results = results.localCheckpoint(eager=True)
            self._store.store(results)
        return results

    def run_and_traverse(self) -> None:
        """Crawler::runAndTraverse (Crawler.php:175-181): execute the
        chain for its side effects (store writes, hooks) without handing
        results back — one noop-sink action, nothing on the driver."""
        self.run().write.mode("overwrite").format("noop").save()

    def run_and_dump(self, n: int = 20) -> None:
        """Crawler::runAndDump (Crawler.php:186-198): run and print the
        first results (debug helper)."""
        self.run().orderBy("ord").show(n, truncate=80)


class GetLink(_LinkStep):
    """Html::getLink() — only the FIRST matching link (GetLink.php:43-288,
    same option surface as GetLinks); value: response struct -> url string
    (rows with no matching link drop)."""

    def apply(self, df: DataFrame) -> DataFrame:
        out = (
            # try_element_at: an empty match array is a dropped row, not an
            # ANSI INVALID_ARRAY_INDEX error
            df.withColumn("_first", F.try_element_at(self._resolved_links(), F.lit(1)))
            .filter(F.col("_first").isNotNull())
            .withColumn("value", F.col("_first.url"))
            .drop("_first")
        )
        return self._post(out)


class MetaData(Step):
    """Html::metaData() (MetaData.php:36-61) — value: response struct ->
    struct(title, meta map)."""

    input_kind = "response"

    def output_kind(self, input_kind: str) -> str:
        return "record"

    def apply(self, df: DataFrame) -> DataFrame:
        out = df.withColumn(
            "value",
            F.struct(
                extract.extract_title_udf(F.col("value.body")).alias("title"),
                extract.extract_meta_udf(F.col("value.body")).alias("meta"),
            ),
        )
        return self._post(out)


class Group(Step):
    """Group — run sub-steps on the SAME input and zip the k-th outputs
    into one record (src/Steps/Group.php:44-67,146-157).  Common case
    (each sub-step yields one value per input) = one select with N
    expressions; each sub-step contributes a named field."""

    def __init__(self, **branches: Step):
        super().__init__()
        self.branches = branches

    def output_kind(self, input_kind: str) -> str:
        return "record"

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window

        # the zip key is the input row's (_input_id, _ord) — deterministic
        # under shuffles, unlike monotonically_increasing_id() on an
        # unmaterialized plan (which can re-evaluate differently per branch
        # subtree).  Steps rewrite _ord, so snapshot it under _g_ord first.
        base = df.withColumn("_g_in", F.col("_input_id")).withColumn(
            "_g_ord", F.col("_ord")
        )
        gkey = ["_g_in", "_g_ord"]
        # each branch: (gkey, _k, <name>) with _k = the branch's per-input
        # output ordinal; zip = FULL OUTER join on (gkey, _k), so unequal
        # branch lengths pad with null exactly like the reference's
        # per-ordinal combination (Group.php:146-157)
        ordw = Window.partitionBy(*gkey).orderBy("_ord")
        zipped = None
        for name, step in self.branches.items():
            b = (
                step.apply(base)
                .select(*gkey, "_ord", "value")
                .withColumn("_k", F.row_number().over(ordw))
                .select(*gkey, "_k", F.col("value").alias(name))
            )
            zipped = b if zipped is None else zipped.join(
                b, on=gkey + ["_k"], how="full_outer"
            )
        keeps = [c for c in base.columns if c.startswith("keep_")]
        out = (
            base.select("_input_id", "_ord", *gkey, *keeps)
            .join(zipped, gkey, "inner")
            .withColumn("_ord", F.col("_ord") * 1000 + F.col("_k"))
            .withColumn("value", F.struct(*[
                F.col(n) for n, s in self.branches.items()
                if not s._exclude_from_group  # Step.php:82-87
            ]))
            .drop(*self.branches.keys(), "_k", *gkey)
        )
        return self._post(out)


class HttpCrawl(Step):
    """Http::crawl() — the whole-site BFS as a chainable step
    (HttpCrawl.php:19-180): value: seed url string -> response struct per
    yielded page, in exact crawl order.  Wraps engine.crawl_site; builder
    options mirror the reference's."""

    input_kind = "scalar"

    def output_kind(self, input_kind: str) -> str:
        return "record"

    def __init__(self, pages: DataFrame, robots: DataFrame | None = None,
                 **cfg_kwargs):
        super().__init__()
        self.pages = pages
        self.robots = robots
        self.cfg_kwargs = cfg_kwargs

    def apply(self, df: DataFrame) -> DataFrame:
        from .engine import SiteCrawlConfig, crawl_site

        spark = df.sparkSession
        from .ranks import global_rank

        # ALL seeds go through ONE frontier (engine multi-seed crawl_site):
        # no driver-side seed collect, no per-seed loop — 1,000 seeds is one
        # BFS with per-seed scoping/ordering.  An empty input yields an
        # empty result with the output schema (no IndexError).
        #
        # seed_id must be unique PER ROW, not per _input_id: a multi-output
        # upstream step (GetLinks, JsonEach, ...) emits several seed rows
        # with the same _input_id, and collapsing them onto one seed_id
        # would merge distinct sub-crawls — per-seed sameHost scoping then
        # leaks links across seeds.  (_input_id, _ord) is unique by
        # construction, so the run()-style composite is a per-row key.
        row_key = (F.col("_input_id") * F.lit(10**12) + F.col("_ord")).alias(
            "seed_id"
        )
        seeds = df.select(row_key, F.col("value").alias("url"))
        crawled = crawl_site(
            spark, self.pages, seeds,
            SiteCrawlConfig(**self.cfg_kwargs), robots=self.robots,
        ).filter(F.col("yielded"))
        out = crawled.select(
            "seed_id",
            F.col("ord").alias("__crawl_ord"),
            F.struct(
                F.col("effective_url").alias("url"),
                F.col("url").alias("requested_url"),
                F.col("depth").alias("depth"),
            ).alias("value"),
        )
        # rebuild (_input_id, _ord): _input_id reverts to the ORIGINAL input
        # id (keeps/grouping lineage), _ord becomes a dense global rank over
        # (seed_id, crawl ord) — lexicographic in (upstream order, crawl
        # order), so per-seed output blocks keep the upstream row order and
        # the composite _rk in run() stays collision-free
        out = global_rank(out, ["seed_id", "__crawl_ord"], out="__r")
        keeps = [c for c in df.columns if c.startswith("keep_")]
        seed_rows = df.select(
            row_key, F.col("_input_id").alias("__orig_input"), *keeps
        )
        out = (
            out.join(seed_rows, "seed_id")
            .select(
                F.col("__orig_input").alias("_input_id"),
                F.col("__r").alias("_ord"),
                "value",
                *keeps,
            )
        )
        return self._post(out)


class JsonGet(Step):
    """Json::get(mapping) — dot-notation property extraction from a JSON
    value (src/Steps/Json.php:19-38); value: json string -> struct of the
    mapped properties."""

    input_kind = "scalar"

    def output_kind(self, input_kind: str) -> str:
        return "record"

    def __init__(self, **mapping: str):
        super().__init__()
        self.mapping = mapping  # out_name -> dot path

    def apply(self, df: DataFrame) -> DataFrame:
        fields = [
            F.get_json_object(F.col("value"), "$." + path).alias(name)
            for name, path in self.mapping.items()
        ]
        return self._post(df.withColumn("value", F.struct(*fields)))


class JsonEach(Step):
    """Json::each(path) — one output per element of a JSON array subtree
    (src/Steps/Json.php:50-79); value: json string -> element json string."""

    input_kind = "scalar"

    def __init__(self, path: str = ""):
        super().__init__()
        self.path = path

    def apply(self, df: DataFrame) -> DataFrame:
        arr = F.from_json(
            F.get_json_object(F.col("value"), "$." + self.path)
            if self.path else F.col("value"),
            "array<string>",
        )
        out = (
            df.select("*", F.posexplode(arr).alias("_jpos", "_jel"))
            .withColumn("_ord", F.col("_ord") * 1000 + F.col("_jpos"))
            .withColumn("value", F.col("_jel"))
            .drop("_jpos", "_jel")
        )
        return self._post(out)


class Csv(Step):
    """Csv::parseString with positional column mapping, skipFirstLine and
    quoted-field handling (src/Steps/Csv.php:27-42,96-157 — separator,
    enclosure and escape are configurable like the reference's
    separator/enclosure/escape); value: multi-line csv string -> struct of
    mapped columns, one output per data line.  Parsing is JVM-side
    ``from_csv`` (no regex-split: separators inside enclosures stay literal,
    and metacharacter separators like '|' need no escaping)."""

    input_kind = "scalar"

    def output_kind(self, input_kind: str) -> str:
        return "record"

    def __init__(self, columns: dict[int, str], skip_first_line: bool = False,
                 sep: str = ",", enclosure: str = '"', escape: str = "\\"):
        super().__init__()
        self.columns = columns
        self.skip_first = skip_first_line
        self.sep = sep
        self.enclosure = enclosure
        self.escape = escape

    def apply(self, df: DataFrame) -> DataFrame:
        lines = F.split(F.col("value"), "\n")
        out = df.select("*", F.posexplode(lines).alias("_lpos", "_line"))
        if self.skip_first:
            out = out.filter(F.col("_lpos") > 0)
        width = max(self.columns) + 1
        schema = ", ".join(f"_c{i} STRING" for i in range(width))
        parsed = F.from_csv(
            F.col("_line"), schema,
            {"sep": self.sep, "quote": self.enclosure, "escape": self.escape},
        )
        out = out.withColumn("_parsed", parsed)
        fields = [
            F.col(f"_parsed._c{idx}").alias(name)
            for idx, name in sorted(self.columns.items())
        ]
        out = (
            out.withColumn("_ord", F.col("_ord") * 10000 + F.col("_lpos"))
            .withColumn("value", F.struct(*fields))
            .drop("_lpos", "_line", "_parsed")
        )
        return self._post(out)


class Dom(Step):
    """Dom extraction step (src/Steps/Dom.php:44-160 + Html/DomQuery.php):
    select base nodes with a CSS selector (``each``/``first``/``last``/root)
    and extract a record per node via a mapping of name -> selector spec.

    Spec grammar (subset of the reference's CssSelector targets,
    DomQuery.php:122-156): ``".title"`` = normalized text of the first
    descendant match; ``".link @href"`` = attribute; ``".box @html"`` =
    inner HTML.  value: response struct -> record struct, one output per
    matched node in document order (Dom::each semantics).
    """

    input_kind = "response"

    def output_kind(self, input_kind: str) -> str:
        return "record"

    def __init__(self, each: str | None = None, first: str | None = None,
                 last: str | None = None):
        super().__init__()
        if sum(x is not None for x in (each, first, last)) > 1:
            raise ValueError("use only one of each/first/last")
        self.base = each or first or last
        self.mode = "each" if each else ("first" if first else
                                         ("last" if last else "root"))
        self.mapping: dict[str, str] = {}
        if self.base:
            from . import cssq

            cssq.parse_selector(self.base)

    def extract(self, mapping: dict[str, str]):
        from . import cssq

        for spec in mapping.values():
            sel, _attr = cssq.split_target_spec(spec)
            if sel:  # empty selector = the base node itself
                cssq.parse_selector(sel)
        self.mapping = dict(mapping)
        return self

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, StringType, StructField, StructType

        names = list(self.mapping)
        specs = dict(self.mapping)
        base_sel, mode = self.base, self.mode
        schema = ArrayType(StructType([StructField(n, StringType()) for n in names]))

        @pandas_udf(schema)
        def extract_nodes(bodies: pd.Series) -> pd.Series:
            from . import cssq, extract as ex

            def target(inner: str, spec: str):
                sel, attr = cssq.split_target_spec(spec)
                hits = cssq.find_elements(inner, sel) if sel else [
                    (None, "", inner)
                ]
                if not hits:
                    return None
                tag, attrs, node_inner = hits[0]
                if not attr:
                    return ex.normalize_text(node_inner)
                if attr == "html":
                    return node_inner
                return cssq._attr(attrs, attr)

            def one(b):
                if not b:
                    return []
                if mode == "root":
                    nodes = [b]
                else:
                    nodes = [inner for _t, _a, inner in
                             cssq.find_elements(b, base_sel)]
                    if mode == "first":
                        nodes = nodes[:1]
                    elif mode == "last":
                        nodes = nodes[-1:]
                return [{n: target(node, specs[n]) for n in names}
                        for node in nodes]

            return bodies.map(one)

        out = (
            df.withColumn("_nodes", extract_nodes(F.col("value.body")))
            .select("*", F.posexplode("_nodes").alias("_npos", "_node"))
            .withColumn("_ord", F.col("_ord") * 1000 + F.col("_npos"))
            .withColumn("value", F.col("_node"))
            .drop("_nodes", "_npos", "_node")
        )
        return self._post(out)


class Paginate(Step):
    """Http::get()->paginate(SimpleWebsitePaginator) as a chainable step
    (src/Steps/Loading/Http/Paginate.php + SimpleWebsitePaginator.php):
    value: start url string -> one response struct per visited page, FIFO
    discovery order, per-input chains advancing together in one batched
    loop.  ``stop_rule`` takes any :mod:`crawlspark.paginate` StopRule."""

    input_kind = "scalar"

    def output_kind(self, input_kind: str) -> str:
        return "response"

    def __init__(self, pages: DataFrame, selector: str | None = None,
                 max_pages: int = 1000, stop_rule=None,
                 query_params: "list | None" = None):
        """``selector`` -> SimpleWebsitePaginator; ``query_params`` (a list
        of :func:`crawlspark.paginate.increase`/``decrease`` ops) ->
        QueryParamsPaginator::paramsInUrl() (Paginator::queryParams(),
        QueryParamsPaginator.php:28-38)."""
        super().__init__()
        if (selector is None) == (query_params is None):
            raise ValueError("pass exactly one of selector / query_params")
        self.pages = pages
        self.selector = selector
        self.max_pages = max_pages
        self.stop_rule = stop_rule
        self.query_params = query_params

    def apply(self, df: DataFrame) -> DataFrame:
        from .paginate import paginate_query_params, website_paginate
        from .ranks import global_rank

        # chain_id must be unique PER ROW (same reasoning as HttpCrawl):
        # a multi-output upstream step would otherwise merge distinct chains
        # onto one chain_id — colliding (chain_id, page_ord) pairs and a
        # row-multiplying keeps join
        row_key = (F.col("_input_id") * F.lit(10**12) + F.col("_ord")).alias(
            "chain_id"
        )
        chains = df.select(row_key, F.col("value").alias("url"))
        if self.query_params is not None:
            visited = paginate_query_params(
                df.sparkSession, self.pages, chains, ops=self.query_params,
                max_pages=self.max_pages, stop_rule=self.stop_rule,
            )
        else:
            visited = website_paginate(
                df.sparkSession, self.pages, chains, self.selector,
                max_pages=self.max_pages, stop_rule=self.stop_rule,
            )
        p = self.pages.select(
            F.col("url").alias("_p_url"), F.col("status").alias("_p_status"),
            F.col("body").cast("string").alias("_p_body"),
        )
        out = (
            visited.join(p, visited["url"] == p["_p_url"], "inner")
            .select(
                "chain_id",
                F.col("page_ord").alias("__page_ord"),
                F.struct(
                    F.col("url").alias("url"),
                    F.col("_p_status").alias("status"),
                    F.col("_p_body").alias("body"),
                ).alias("value"),
            )
        )
        # dense global _ord over (chain, page) — lexicographic in (upstream
        # row order, page order); _input_id reverts to the original input id
        out = global_rank(out, ["chain_id", "__page_ord"], out="__r")
        keeps = [c for c in df.columns if c.startswith("keep_")]
        chain_rows = df.select(
            row_key, F.col("_input_id").alias("__orig_input"), *keeps
        )
        out = (
            out.join(chain_rows, "chain_id")
            .select(
                F.col("__orig_input").alias("_input_id"),
                F.col("__r").alias("_ord"),
                "value",
                *keeps,
            )
        )
        return self._post(out)


class BotUserAgent:
    """src/UserAgents/BotUserAgent.php — robots.txt rules BIND for bots."""

    is_bot = True

    def __init__(self, product: str, info_uri: str | None = None,
                 version: str | None = None):
        self.product = product
        self.info_uri = info_uri
        self.version = version

    def __str__(self) -> str:  # "Mozilla/5.0 (compatible; Product/1.0; +uri)"
        parts = [self.product + (f"/{self.version}" if self.version else "")]
        if self.info_uri:
            parts.append(f"+{self.info_uri}")
        return f"Mozilla/5.0 (compatible; {'; '.join(parts)})"


class UserAgent:
    """src/UserAgents/UserAgent.php — a non-bot agent; robots rules are NOT
    enforced (RobotsTxtHandler.php:43-52 only gates bot agents)."""

    is_bot = False

    def __init__(self, agent: str):
        self.agent = agent

    def __str__(self) -> str:
        return self.agent


class HttpCrawler(Crawler):
    """src/HttpCrawler.php + AnonymousHttpCrawlerBuilder: a Crawler bound to
    a loader (here: the page corpus + robots rules) and a user agent.  The
    bound step factories save passing the corpus to every step:

        HttpCrawler.make(spark, pages, robots=rules,
                         user_agent=BotUserAgent("MyBot"))
            .input(seed).add_step_get().add_step_crawl(max_depth=2).run()
    """

    def __init__(self, spark: SparkSession, pages: DataFrame,
                 robots: DataFrame | None = None,
                 user_agent: "BotUserAgent | UserAgent | None" = None):
        super().__init__(spark)
        self.pages = pages
        self.robots = robots
        self.user_agent = user_agent or BotUserAgent("crawlspark")

    @classmethod
    def make(cls, spark: SparkSession, pages: DataFrame, **kw) -> "HttpCrawler":
        return cls(spark, pages, **kw)

    def add_step_get(self, **kw):
        return self.add_step(HttpGet(self.pages, **kw))

    def add_step_crawl(self, **kw):
        kw.setdefault("user_agent_is_bot", self.user_agent.is_bot)
        # robots GROUP selection needs the UA string (longest matching
        # token wins, '*' fallback) — without it every group merges
        kw.setdefault("user_agent", str(self.user_agent))
        return self.add_step(HttpCrawl(self.pages, robots=self.robots, **kw))

    def add_step_paginate(self, selector: str, **kw):
        return self.add_step(Paginate(self.pages, selector, **kw))


class SubCrawler(Step):
    """subCrawlerFor(for, builder) (src/Steps/BaseStep.php:316-390): for each
    record output, feed the ``field`` property (a value or an array of
    values) into a sub step-chain and replace the property with the ordered
    ARRAY of sub-results (null when the sub-crawl yields nothing).

    Deviation from the reference noted: the reference collapses a
    single-result sub-crawl to a bare object; a Spark column has one static
    type, so the property is always an array here.  All parents' sub-crawls
    advance together — one distributed chain application, no per-row loop.
    """

    input_kind = "record"

    def __init__(self, field: str, *steps: Step):
        super().__init__()
        self.field = field
        self.steps = list(steps)

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import types as T

        vt = df.schema["value"].dataType
        fld = F.col(f"value.{self.field}")
        is_arr = isinstance(vt[self.field].dataType, T.ArrayType)
        arr = fld if is_arr else F.when(fld.isNotNull(), F.array(fld))
        parent = df.withColumn("_sc_ord", F.col("_ord"))
        sub = parent.select(
            "_input_id", "_sc_ord", F.posexplode(arr).alias("_pos", "_sv")
        ).select(
            "_input_id",
            "_sc_ord",
            # composite ord keeps sub-rows of different parents distinct for
            # order-sensitive sub-steps (parent _ord is unique per input)
            (F.col("_sc_ord") * 100000 + F.col("_pos")).alias("_ord"),
            F.col("_sv").alias("value"),
        )
        for step in self.steps:
            sub = step.apply(sub)
        collected = (
            sub.groupBy("_input_id", "_sc_ord")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_ord", "value"))),
                    lambda s: s["value"],
                ).alias("_sub_results")
            )
        )
        out = parent.join(collected, ["_input_id", "_sc_ord"], "left")
        new_value = F.struct(
            *[
                (F.col("_sub_results") if f.name == self.field
                 else F.col(f"value.{f.name}")).alias(f.name)
                for f in vt.fields
            ]
        )
        out = out.withColumn("value", new_value).drop("_sc_ord", "_sub_results")
        return self._post(out)
