"""Round-2 continuation queries: training-data curation operators.

PII scrubbing, Gopher-style repetition signals, deterministic hash sampling,
and language-stratified sampling (crawlspark.textops.curate) — the curation
stages a crawl->training-data pipeline runs after dedup/quality.  Same
contract as :mod:`crawlspark.suite` (queries() + oracle_sql()), merged by
``__spark_entry__``.

Reference scope note: crwlrsoft/crawler stops at extraction
(src/Steps/Html.php, src/Steps/Refiners/*); these are the post-extraction
curation layer the assignment adds on top.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops import curate
from .textops.dedup import BASE_HASH_SQL


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# PII scrubbing (emails / IPv4s / phone numbers -> placeholders + counts)
# --------------------------------------------------------------------------

def _pii_text(doc: Column) -> Column:
    """Deterministic PII-laced text from doc_id: ~1/3 of docs get an email,
    ~1/4 an IPv4, ~1/5 a phone number, prepended to the document words."""
    s = doc.cast("string")
    email = F.when(
        doc % 3 == 0,
        F.concat(F.lit("mail bob."), s, F.lit("@ex-"), (doc % 7).cast("string"),
                 F.lit(".org ")),
    ).otherwise(F.lit(""))
    ip = F.when(
        doc % 4 == 0,
        F.concat(F.lit("host 10."), (doc % 250).cast("string"), F.lit(".0."),
                 (doc % 9).cast("string"), F.lit(" ")),
    ).otherwise(F.lit(""))
    phone = F.when(
        doc % 5 == 0,
        F.concat(F.lit("tel +49-555-"), ((doc % 9000) + 1000).cast("string"),
                 F.lit(" ")),
    ).otherwise(F.lit(""))
    return F.concat(email, ip, phone, F.substring(F.col("text"), 1, 64))


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over a deterministically PII-laced corpus: emails /
    IPv4s / phone numbers replaced by placeholders, per-doc match counts
    kept.  Pure JVM regexp expressions — a narrow map stage that fuses into
    the scan at 100 TB (no UDF, no shuffle)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", _pii_text(F.col("doc_id")).alias("text")
    )
    return curate.pii_scrub(d)


_PII_TEXT_SQL = """
  CASE WHEN doc_id % 3 = 0 THEN 'mail bob.' || CAST(doc_id AS VARCHAR)
       || '@ex-' || CAST(doc_id % 7 AS VARCHAR) || '.org ' ELSE '' END
  || CASE WHEN doc_id % 4 = 0 THEN 'host 10.' || CAST(doc_id % 250 AS VARCHAR)
       || '.0.' || CAST(doc_id % 9 AS VARCHAR) || ' ' ELSE '' END
  || CASE WHEN doc_id % 5 = 0 THEN 'tel +49-555-'
       || CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' ' ELSE '' END
  || substr(text, 1, 64)
"""

ORACLE_PII_SCRUB = f"""
WITH src AS (SELECT doc_id, {_PII_TEXT_SQL} AS t FROM documents),
cnt AS (
  SELECT doc_id, t,
         CAST(len(regexp_extract_all(t, '{curate.EMAIL_RE}')) AS BIGINT) AS n_email,
         CAST(len(regexp_extract_all(t, '{curate.IPV4_RE}')) AS BIGINT) AS n_ip,
         CAST(len(regexp_extract_all(t, '{curate.PHONE_RE}')) AS BIGINT) AS n_phone
  FROM src
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(t, '{curate.EMAIL_RE}', '<EMAIL>', 'g'),
           '{curate.IPV4_RE}', '<IP>', 'g'),
         '{curate.PHONE_RE}', '<PHONE>', 'g') AS clean_text,
       n_email, n_ip, n_phone,
       n_email + n_ip + n_phone AS n_pii
FROM cnt
"""


# --------------------------------------------------------------------------
# Gopher-style repetition signals (Rae et al. 2021 repetition filters)
# --------------------------------------------------------------------------

def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition signals: duplicate-word ratio (array-side, no
    shuffle) and most-frequent unigram/bigram share (explode -> map-side
    combined groupBy), integer permille, plus the Gopher keep verdict."""
    return curate.repetition_signals(_docs(spark, sf_dir))


ORACLE_REPETITION = f"""
WITH w AS (
  SELECT doc_id, str_split(text, ' ') AS ws FROM documents
),
base AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
         CAST(len(list_distinct(ws)) AS BIGINT) AS nd, ws
  FROM w
),
uni AS (
  SELECT doc_id, MAX(c) AS mu FROM (
    SELECT doc_id, tok, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(ws) AS tok FROM w)
    GROUP BY doc_id, tok
  ) GROUP BY doc_id
),
bgl AS (
  SELECT doc_id,
         [ws[i] || ' ' || ws[i + 1] for i in range(1, len(ws))] AS bgs
  FROM w WHERE len(ws) >= 2
),
bi AS (
  SELECT doc_id, MAX(c) AS mb FROM (
    SELECT doc_id, bg, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(bgs) AS bg FROM bgl)
    GROUP BY doc_id, bg
  ) GROUP BY doc_id
),
j AS (
  SELECT base.doc_id, n, nd,
         CAST(FLOOR((n - nd) * 1000 / n) AS BIGINT) AS dup_pm,
         CAST(FLOOR(COALESCE(mu, 0) * 1000 / n) AS BIGINT) AS uni_pm,
         CAST(FLOOR(COALESCE(mb, 0) * 1000 / GREATEST(n - 1, 1)) AS BIGINT)
           AS bi_pm
  FROM base LEFT JOIN uni USING (doc_id) LEFT JOIN bi USING (doc_id)
)
SELECT doc_id, n AS n_words, nd AS n_distinct_words,
       dup_pm AS dup_word_permille,
       uni_pm AS top_unigram_permille,
       bi_pm AS top_bigram_permille,
       uni_pm <= {curate.TOP_UNIGRAM_MAX_PERMILLE}
         AND bi_pm <= {curate.TOP_BIGRAM_MAX_PERMILLE} AS keep
FROM j
"""


# --------------------------------------------------------------------------
# Deterministic hash sampling + language-stratified sampling
# --------------------------------------------------------------------------

_SAMPLE_PERMILLE = 125
_STRATA_K = 20


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 12.5% hash sample of documents: salted key-hash bucket
    < permille.  Unlike df.sample it is stable under repartitioning and
    resume; a pure narrow filter (fuses into the scan, zero shuffle)."""
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return curate.hash_sample(d, "doc_id", _SAMPLE_PERMILLE)


ORACLE_HASH_SAMPLE = f"""
SELECT doc_id, lang,
       {BASE_HASH_SQL.format(x="'s1' || CAST(doc_id AS VARCHAR)")} % 1000
         AS sample_bucket
FROM documents
WHERE {BASE_HASH_SQL.format(x="'s1' || CAST(doc_id AS VARCHAR)")} % 1000
      < {_SAMPLE_PERMILLE}
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deterministic top-k docs per language: rank = salted id-hash,
    two-phase (per-partition top-k then exact window on survivors) so no
    stratum funnels through a single task at 100 TB."""
    return curate.stratified_sample(_docs(spark, sf_dir), "lang", _STRATA_K)


ORACLE_STRATIFIED = f"""
WITH r AS (
  SELECT lang, doc_id,
         {BASE_HASH_SQL.format(x="'strat' || CAST(doc_id AS VARCHAR)")}
           AS rank_hash
  FROM documents
),
rn AS (
  SELECT lang, doc_id, rank_hash,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY rank_hash, doc_id) AS BIGINT) AS rn
  FROM r
)
SELECT * FROM rn WHERE rn <= {_STRATA_K}
"""


# --------------------------------------------------------------------------
# Sequence packing (fixed token-budget training bins)
# --------------------------------------------------------------------------

_PACK_CAPACITY = 512


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: docs laid out in deterministic salted-hash order,
    running token prefix sum, bin boundary wherever the total crosses a
    capacity multiple.  Two-phase distributed prefix sum (per-partition
    partials + broadcast offsets) — no single-partition window over the
    corpus."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
    )
    return curate.pack_sequences(d, capacity=_PACK_CAPACITY)


ORACLE_PACK = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
         {BASE_HASH_SQL.format(x="'pack' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (
           ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(FLOOR((cum_tokens - n_tokens) / {_PACK_CAPACITY}) AS BIGINT)
         AS bin_id
FROM c
"""


# --------------------------------------------------------------------------
# Source-mix rebalancing (down-sample sources to target shares)
# --------------------------------------------------------------------------

_MIX = {"src0": 1000, "src1": 500, "src2": 250, "src3": 125}


def q_rebalance_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix rebalancing: per-source keep-permille compiled into a
    literal map filter (narrow, fuses into the scan); sources missing from
    the mix are dropped.  Same salted-hash draw as hash_sample, so the
    subset is stable under re-runs and repartitioning."""
    d = _docs(spark, sf_dir).select("doc_id", "source")
    return curate.rebalance_sources(d, _MIX)


def _oracle_rebalance() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {p}" for s, p in _MIX.items()
    )
    bucket = BASE_HASH_SQL.format(x="'mix' || CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, source, {bucket} % 1000 AS sample_bucket
FROM documents
WHERE {bucket} % 1000 < CASE source {cases} ELSE 0 END
"""


# --------------------------------------------------------------------------
# Product-quantization ANN (compressed-corpus similarity search)
# --------------------------------------------------------------------------

_PQ = {"n_queries": 10, "k": 5, "m": 4, "ks": 8}


def q_ann_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoder: each corpus vector -> m argmin-L2 subspace codes against
    a deterministic codebook (first ks corpus vectors).  m small ints
    replace the float vector — the compression that fits 10^10-vector ANN
    in cluster RAM.  Narrow map stage, broadcast codebook, no shuffle."""
    from . import ann as _ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    enc = _ann.pq_encode(emb, n_queries=_PQ["n_queries"], m=_PQ["m"], ks=_PQ["ks"])
    # integer-stable projection for the hash compare
    return enc.select(
        "neighbor_id",
        *[
            F.element_at(F.col("codes"), j + 1).cast("long").alias(f"code_{j}")
            for j in range(_PQ["m"])
        ],
    )


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-k: queries exact, corpus reconstructed
    from its codes (== the classic per-subspace LUT sum); ranks by
    (approx L2^2 asc, id asc).  Corpus side carries only (id, codes)."""
    from . import ann as _ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = _ann.pq_topk(emb, **_PQ)
    return out.select("query_id", F.col("rank").alias("nn_rank"), "neighbor_id")


def q_ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC refine: PQ asymmetric distance builds a per-query shortlist
    (k=25 here), then the exact L2 is recomputed for just those candidates
    and the true top-k re-ranked — the production PQ composition (the
    full-precision vectors are fetched only for |Q| * shortlist rows)."""
    from . import ann as _ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = _ann.pq_topk_rerank(
        emb, n_queries=_PQ["n_queries"], k=_PQ["k"], shortlist=25,
        m=_PQ["m"], ks=_PQ["ks"],
    )
    return out.select("query_id", F.col("rank").alias("nn_rank"), "neighbor_id")


def _pq_oracle_common() -> str:
    nq, ks, m = _PQ["n_queries"], _PQ["ks"], _PQ["m"]
    # 64-dim embeddings, m subspaces -> sub = 16 dims, 1-based slices
    return f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cb AS (SELECT list(v ORDER BY vec_id) AS cents, len(any_value(v)) // {m} AS sub
       FROM e WHERE vec_id >= {nq} AND vec_id < {nq + ks}),
enc AS (
  SELECT c.vec_id AS neighbor_id, c.v,
         [ CAST(list_position(
             [ list_sum([ (c.v[i] - cc[i]) * (c.v[i] - cc[i])
                          for i in range((j-1)*sub + 1, j*sub + 1) ])
               for cc in cents ],
             list_min(
             [ list_sum([ (c.v[i] - cc[i]) * (c.v[i] - cc[i])
                          for i in range((j-1)*sub + 1, j*sub + 1) ])
               for cc in cents ])
           ) - 1 AS INT)
           for j in range(1, {m} + 1) ] AS codes
  FROM (SELECT * FROM e WHERE vec_id >= {nq}) c, cb
)
"""


def _oracle_pq_codes() -> str:
    cols = ", ".join(
        f"CAST(codes[{j + 1}] AS BIGINT) AS code_{j}" for j in range(_PQ["m"])
    )
    return f"WITH {_pq_oracle_common()} SELECT neighbor_id, {cols} FROM enc"


def _oracle_pq_topk() -> str:
    nq, k, m = _PQ["n_queries"], _PQ["k"], _PQ["m"]
    return f"""
WITH {_pq_oracle_common()},
recon AS (
  SELECT neighbor_id,
         flatten([ cents[codes[j] + 1][((j-1)*sub + 1):(j*sub)]
                   for j in range(1, {m} + 1) ]) AS vq
  FROM enc, cb
),
s AS (
  SELECT q.vec_id AS query_id, r.neighbor_id,
         list_sum([ (q.v[i] - r.vq[i]) * (q.v[i] - r.vq[i])
                    for i in range(1, len(q.v) + 1) ]) AS dist
  FROM (SELECT * FROM e WHERE vec_id < {nq}) q, recon r
),
rk AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, neighbor_id ASC) AS rnk
  FROM s
)
SELECT query_id, CAST(rnk AS BIGINT) AS nn_rank, neighbor_id
FROM rk WHERE rnk <= {k}
"""


def _oracle_pq_rerank(shortlist: int = 25) -> str:
    nq, k, m = _PQ["n_queries"], _PQ["k"], _PQ["m"]
    return f"""
WITH {_pq_oracle_common()},
recon AS (
  SELECT neighbor_id,
         flatten([ cents[codes[j] + 1][((j-1)*sub + 1):(j*sub)]
                   for j in range(1, {m} + 1) ]) AS vq
  FROM enc, cb
),
s AS (
  SELECT q.vec_id AS query_id, r.neighbor_id,
         list_sum([ (q.v[i] - r.vq[i]) * (q.v[i] - r.vq[i])
                    for i in range(1, len(q.v) + 1) ]) AS dist
  FROM (SELECT * FROM e WHERE vec_id < {nq}) q, recon r
),
short AS (
  SELECT query_id, neighbor_id
  FROM (SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dist ASC, neighbor_id ASC) AS rnk
        FROM s)
  WHERE rnk <= {shortlist}
),
ex AS (
  SELECT sh.query_id, sh.neighbor_id,
         list_sum([ (q.v[i] - c.v[i]) * (q.v[i] - c.v[i])
                    for i in range(1, len(q.v) + 1) ]) AS dist
  FROM short sh
  JOIN e c ON c.vec_id = sh.neighbor_id
  JOIN e q ON q.vec_id = sh.query_id
)
SELECT query_id, CAST(rnk AS BIGINT) AS nn_rank, neighbor_id
FROM (SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dist ASC, neighbor_id ASC) AS rnk
      FROM ex)
WHERE rnk <= {k}
"""


# --------------------------------------------------------------------------
# Full cookie semantics (src/Loader/Http/Cookies/Cookie.php:43-335,
# CookieJar.php:25-130) — parse + validation + jar send-matching.
#
# Oracle style: planted ground truth.  The Spark side PARSES deterministic
# Set-Cookie header strings generated from doc_id residues; the DuckDB
# oracle re-derives every expected output (domain, expiry epoch,
# invalid_reason, send decision) directly from the residue arithmetic —
# an independent derivation, not a second parser.
# --------------------------------------------------------------------------

_COOKIE_NOW = 1_700_000_000  # fixed 'now' (2023-11-14T22:13:20Z): determinism
_EXP_PAST = "Wed, 23-Feb-2022 10:13:41 GMT"  # epoch 1645611221 (dashed fmt)
_EXP_FUTURE = "Fri, 01 Jan 2100 00:00:00 GMT"  # epoch 4102444800


def _cookie_fixture(d: DataFrame) -> DataFrame:
    """(doc_id, url, set_cookie): one deterministic Set-Cookie header per
    document, spanning schemes, subdomains, prefixes and every attribute."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    scheme = F.when(doc % 2 == 0, F.lit("https")).otherwise(F.lit("http"))
    sub = (
        F.when(doc % 3 == 0, F.lit("www."))
        .when(doc % 3 == 1, F.lit("sub.domain."))
        .otherwise(F.lit(""))
    )
    host = F.concat(sub, F.lit("h"), (doc % 10).cast("string"), F.lit(".example.test"))
    upath = (
        F.when(doc % 4 == 0, F.lit("/a/b"))
        .when(doc % 4 == 1, F.lit("/a"))
        .when(doc % 4 == 2, F.lit("/"))
        .otherwise(F.lit(""))
    )
    url = F.concat(scheme, F.lit("://"), host, upath)
    name = (
        F.when(doc % 7 == 0, F.concat(F.lit("__Host-c"), s))
        .when(doc % 7 == 1, F.concat(F.lit("__Secure-c"), s))
        .otherwise(F.concat(F.lit("c"), s))
    )
    dom_attr = F.when(
        doc % 5 == 0,
        F.concat(
            F.lit("; Domain="),
            F.when(
                doc % 10 < 5,
                F.concat(F.lit("h"), (doc % 10).cast("string"), F.lit(".example.test")),
            ).otherwise(F.lit("evil.test")),
        ),
    ).otherwise(F.lit(""))
    path_attr = (
        F.when(doc % 7 == 0, F.lit("; Path=/"))
        .when(doc % 4 == 1, F.lit("; Path=/a"))
        .otherwise(F.lit(""))
    )
    secure_attr = F.when(doc % 3 != 2, F.lit("; Secure")).otherwise(F.lit(""))
    max_age_attr = F.when(
        doc % 6 == 0,
        F.when(doc % 12 == 0, F.lit("; Max-Age=600")).otherwise(F.lit("; Max-Age=-1")),
    ).otherwise(F.lit(""))
    expires_attr = F.when(
        doc % 6 == 3,
        F.when(doc % 12 == 3, F.lit(f"; Expires={_EXP_PAST}")).otherwise(
            F.lit(f"; Expires={_EXP_FUTURE}")
        ),
    ).otherwise(F.lit(""))
    samesite_attr = F.when(
        doc % 9 == 0,
        F.when(doc % 18 == 0, F.lit("; SameSite=Strict")).otherwise(
            F.lit("; SameSite=Bogus")
        ),
    ).otherwise(F.lit(""))
    httponly_attr = F.when(doc % 8 == 0, F.lit("; HttpOnly")).otherwise(F.lit(""))
    header = F.concat(
        name, F.lit("=v"), s, dom_attr, path_attr, secure_attr,
        max_age_attr, expires_attr, samesite_attr, httponly_attr,
    )
    # materialize the synthesized columns (fixture-only): without the
    # lineage cut, parse_set_cookie's validity predicate gets pushed down
    # THROUGH these projections, substituting the full url/header synth
    # expressions per use — the fully-inlined filter exceeds janino's
    # 64 KB method limit and drops the stage to interpreted eval.  A real
    # stored table presents plain columns and never hits this.
    return d.select(
        "doc_id", url.alias("url"), header.alias("set_cookie")
    ).localCheckpoint(eager=False)


# shared residue arithmetic for the DuckDB oracle (c = cookie doc_id alias)
_C_NAME = (
    "CASE WHEN {c} % 7 = 0 THEN '__Host-c' || {c} "
    "WHEN {c} % 7 = 1 THEN '__Secure-c' || {c} ELSE 'c' || {c} END"
)
_C_INVALID = """
CASE
  WHEN {c} % 5 = 0 AND {c} % 10 >= 5
    THEN 'Setting cookie for this domain is not allowed'
  WHEN {c} % 3 != 2 AND {c} % 2 = 1
    THEN 'Secure flag on non-https document url'
  WHEN {c} % 9 = 0 AND {c} % 18 != 0
    THEN 'Invalid value for attribute SameSite'
  WHEN {c} % 7 IN (0, 1) AND {c} % 2 = 1
    THEN 'Cookie is prefixed with __Secure- or __Host- but was not sent via https'
  WHEN {c} % 7 IN (0, 1) AND {c} % 3 = 2
    THEN 'Cookie is prefixed with __Secure- or __Host- but Secure flag was not sent'
  WHEN {c} % 7 = 0 AND {c} % 5 = 0
    THEN 'Cookie with __Host- prefix must not contain a Domain attribute'
  ELSE NULL
END"""


def q_cookie_set_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse + validate one Set-Cookie header per document — every
    attribute (Domain/Path/Expires/Max-Age/Secure/HttpOnly/SameSite), the
    __Secure-/__Host- prefix rules, and the reference's
    InvalidCookieException family as an invalid_reason column.  Pure JVM
    regexp/substring expressions: a narrow map that fuses into the scan."""
    from . import cookies as ck

    d = _docs(spark, sf_dir).select("doc_id")
    parsed = ck.parse_set_cookie(_cookie_fixture(d), received_at_col=_COOKIE_NOW)
    return parsed.select(
        "doc_id", "cookie_name", "cookie_value", "cookie_domain",
        "cookie_path", "expires_ts", "max_age", "secure", "http_only",
        "same_site", "invalid_reason",
    ).orderBy("doc_id")


ORACLE_COOKIE_PARSE = f"""
SELECT
  doc_id,
  {_C_NAME.format(c="doc_id")} AS cookie_name,
  'v' || doc_id AS cookie_value,
  CASE WHEN doc_id % 5 = 0 THEN
    CASE WHEN doc_id % 10 < 5
         THEN 'h' || (doc_id % 10) || '.example.test'
         ELSE 'evil.test' END
  ELSE 'example.test' END AS cookie_domain,
  CASE WHEN doc_id % 7 = 0 THEN '/'
       WHEN doc_id % 4 = 1 THEN '/a'
       ELSE NULL END AS cookie_path,
  CASE WHEN doc_id % 6 = 3 THEN
    CASE WHEN doc_id % 12 = 3 THEN 1645611221 ELSE 4102444800 END
  ELSE NULL END AS expires_ts,
  CASE WHEN doc_id % 6 = 0 THEN
    CASE WHEN doc_id % 12 = 0 THEN 600 ELSE -1 END
  ELSE NULL END AS max_age,
  doc_id % 3 != 2 AS secure,
  doc_id % 8 = 0 AS http_only,
  CASE WHEN doc_id % 18 = 0 THEN 'Strict' ELSE 'Lax' END AS same_site,
  {_C_INVALID.format(c="doc_id")} AS invalid_reason
FROM documents
ORDER BY doc_id
"""


def q_cookie_send_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CookieJar end to end: build the jar from the valid subset of the
    fixture (registrable-domain keyed, invalid cookies dropped), then
    match every cookie against every document's target request with the
    full shouldBeSentTo predicate (domain containment, __Host- exact
    host, Secure vs scheme, path-prefix, Expires/Max-Age at a fixed
    'now').  The jar is broadcast; the request stream never shuffles."""
    from . import cookies as ck

    d = _docs(spark, sf_dir).select("doc_id")
    jar_src = _cookie_fixture(d.filter(F.col("doc_id") % 13 == 5))
    parsed = ck.parse_set_cookie(jar_src, received_at_col=_COOKIE_NOW)
    jar = ck.build_jar(parsed, ord_col="doc_id")

    doc = F.col("doc_id")
    t_scheme = F.when(doc % 3 != 1, F.lit("https")).otherwise(F.lit("http"))
    t_sub = (
        F.when(doc % 3 == 0, F.lit("www."))
        .when(doc % 3 == 1, F.lit("sub.domain."))
        .otherwise(F.lit(""))
    )
    t_host = F.concat(
        t_sub, F.lit("h"), (doc % 10).cast("string"), F.lit(".example.test")
    )
    t_path = (
        F.when(doc % 4 == 0, F.lit("/a/b"))
        .when(doc % 4 == 1, F.lit("/a"))
        .when(doc % 4 == 2, F.lit("/"))
        .otherwise(F.lit(""))
    )
    reqs = d.select(
        F.col("doc_id").alias("req_doc"),
        F.concat(t_scheme, F.lit("://"), t_host, t_path).alias("target"),
    )
    sent = ck.jar_matches(jar, reqs, url_col="target", now_s=_COOKIE_NOW)
    return sent.select("req_doc", "cookie_name").orderBy("req_doc", "cookie_name")


ORACLE_COOKIE_SEND = f"""
WITH jar AS (
  SELECT doc_id AS c FROM documents
  WHERE doc_id % 13 = 5
    AND ({_C_INVALID.format(c="doc_id")}) IS NULL
)
SELECT r.doc_id AS req_doc, {_C_NAME.format(c="c")} AS cookie_name
FROM documents r CROSS JOIN jar
WHERE
  -- domain containment (substring quirk, Cookie.php:73): an attribute
  -- domain 'hM.example.test' is contained iff the request's host digit
  -- matches; the default 'example.test' is contained in every host
  (CASE WHEN c % 5 = 0 THEN r.doc_id % 10 = c % 10 ELSE TRUE END)
  -- __Host- prefix: exact received-host match (same digit AND same sub)
  AND (c % 7 != 0 OR (r.doc_id % 10 = c % 10 AND r.doc_id % 3 = c % 3))
  -- Secure cookie -> https target (fixture has no localhost)
  AND (c % 3 = 2 OR r.doc_id % 3 != 1)
  -- path rule: '/' needs any non-empty path; '/a' needs /a or /a/...
  AND (CASE WHEN c % 7 = 0 THEN r.doc_id % 4 IN (0, 1, 2)
            WHEN c % 4 = 1 THEN r.doc_id % 4 IN (0, 1)
            ELSE TRUE END)
  -- expiry at now=received_at: Max-Age=-1 and past Expires are dead
  AND NOT ((c % 6 = 0 AND c % 12 != 0) OR (c % 6 = 3 AND c % 12 = 3))
ORDER BY req_doc, cookie_name
"""


def q_http_request_shaping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HttpBase request shaping (HttpBase.php:93-143,194-198,466-483):
    useInputKeyAsUrl pulls the URL out of a record input; constructor
    body and header values resolve [crwl:key] TemplateStrings per row;
    error responses are suppressed.  One equi-join against the corpus +
    narrow maps — no UDF, no extra shuffle."""
    from .crawler import HttpGet

    doc = F.col("doc_id")
    s = doc.cast("string")
    d = _docs(spark, sf_dir).select("doc_id")
    pages = d.select(
        F.concat(F.lit("http://api.test/item/"), s).alias("url"),
        F.when(doc % 7 == 0, F.lit(404)).otherwise(F.lit(200)).alias("status"),
        F.lit(None).cast("string").alias("redirect_to"),
        F.lit("application/json").alias("content_type"),
        F.concat(F.lit("b"), s).alias("body"),
    )
    io = d.select(
        doc.alias("_input_id"),
        doc.alias("_ord"),
        F.struct(
            F.concat(F.lit("http://api.test/item/"), s).alias("link"),
            F.concat(F.lit("t"), s).alias("tok"),
        ).alias("value"),
    )
    http = HttpGet(
        pages, body="q=[crwl:tok]", headers={"X-Tok": "pre-[crwl:tok]"}
    ).use_input_key_as_url("link")
    out = http.apply(io)
    return out.select(
        F.col("_input_id").alias("doc_id"),
        F.col("value.url").alias("url"),
        F.col("value.status").alias("status"),
        F.col("value.body").alias("body"),
        F.col("value.req_body").alias("req_body"),
        F.element_at(F.col("value.req_headers"), "X-Tok").alias("x_tok"),
    ).orderBy("doc_id")


ORACLE_HTTP_SHAPING = """
SELECT doc_id,
       'http://api.test/item/' || doc_id AS url,
       200 AS status,
       'b' || doc_id AS body,
       'q=t' || doc_id AS req_body,
       'pre-t' || doc_id AS x_tok
FROM documents
WHERE doc_id % 7 != 0
ORDER BY doc_id
"""


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table with PLANTED semantic
    near-duplicates (natural max intra-cluster cosine in this corpus is
    ~0.49, so ground truth is planted like the phash bit-flip fixture):
    every vec_id%9==0 gets a variant (id = -(vec_id+1)) whose last
    coordinate is shifted by +0.5 — cosine to its source stays far above
    the 0.8 threshold, everything else far below.  The operator must
    keep exactly one of each planted pair (the centroid-closer one) and
    keep all singletons."""
    from . import ann as _ann2

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    variants = emb.filter(F.col("vec_id") % 9 == 0).select(
        (-(F.col("vec_id") + 1)).alias("vec_id"),
        F.concat(
            F.slice("embedding", 1, 63),
            F.array(F.element_at("embedding", 64) + F.lit(0.5)),
        ).alias("embedding"),
    )
    allv = emb.unionByName(variants)
    # max_cluster_size=None explicitly: this query's DuckDB oracle
    # (ORACLE_SEMDEDUP) replays the UNCAPPED rule, so the Spark side must
    # stay uncapped at every scale factor (ADVICE r4, medium).  The capped
    # variant with a matching capped oracle lives in suite110.q_semdedup_capped.
    return _ann2.semdedup(
        allv, n_centroids=8, eps_permille=800, max_cluster_size=None
    ).orderBy("vec_id")


ORACLE_SEMDEDUP = """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
vart AS (
  SELECT -(vec_id + 1) AS vec_id,
         list_append(v[1:63], v[64] + 0.5) AS v
  FROM base WHERE vec_id % 9 = 0
),
e AS (SELECT * FROM base UNION ALL SELECT * FROM vart),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id >= 0 AND vec_id < 8),
ass AS (
  SELECT vec_id, v, cent_id, pm FROM (
    SELECT e.vec_id, e.v, c.cent_id,
           CAST(floor(list_cosine_similarity(e.v, c.cv) * 1000) AS BIGINT) AS pm,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY CAST(floor(list_cosine_similarity(e.v, c.cv) * 1000) AS BIGINT) DESC,
                      c.cent_id
           ) AS rn
    FROM e CROSS JOIN cent c)
  WHERE rn = 1
),
drp AS (
  SELECT DISTINCT a.vec_id FROM ass a JOIN ass b
    ON a.cent_id = b.cent_id AND a.vec_id != b.vec_id
   AND (b.pm > a.pm OR (b.pm = a.pm AND b.vec_id < a.vec_id))
   AND floor(list_cosine_similarity(a.v, b.v) * 1000) >= 800
)
SELECT a.vec_id, a.cent_id, a.pm AS centroid_sim_permille,
       d.vec_id IS NULL AS kept
FROM ass a LEFT JOIN drp d ON a.vec_id = d.vec_id
ORDER BY a.vec_id
"""


_BOILER_TOP = "subscribe to our newsletter today now"
_BOILER_BOT = "all rights reserved worldwide forever inc"


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup (RefinedWeb line-dedup): documents are
    re-chunked into 6-word paragraphs, with boilerplate paragraphs
    planted on residues (doc%3 gets a newsletter banner, doc%4==1 a
    copyright footer).  Frequent paragraphs (>= 5 distinct docs) must be
    stripped from every doc while organic paragraphs survive in order.
    The oracle replays chunking, counting and reassembly in SQL."""
    from .textops.dedup import paragraph_dedup

    doc = F.col("doc_id")
    d = _docs(spark, sf_dir).select("doc_id", "text")
    words = F.split(F.col("text"), " ")
    # nullif(''): DuckDB's array_to_string([]) is NULL (skipped by
    # concat_ws), Spark's array_join([]) is '' — align on NULL
    chunks = [
        F.nullif(F.array_join(F.slice(words, 1 + 6 * i, 6), " "), F.lit(""))
        for i in range(4)
    ]
    parts = [
        F.when(doc % 3 == 0, F.lit(_BOILER_TOP)).otherwise(F.lit(None)),
        *chunks,
        F.when(doc % 4 == 1, F.lit(_BOILER_BOT)).otherwise(F.lit(None)),
    ]
    ptext = F.concat_ws("\n\n", *parts)  # concat_ws skips NULLs
    fixture = d.select("doc_id", ptext.alias("text"))
    return paragraph_dedup(fixture, min_docs=5).orderBy("doc_id")


ORACLE_PARAGRAPH_DEDUP = f"""
WITH fixture AS (
  SELECT doc_id,
    concat_ws(chr(10)||chr(10),
      CASE WHEN doc_id % 3 = 0 THEN '{_BOILER_TOP}' END,
      array_to_string((string_split(text, ' '))[1:6], ' '),
      array_to_string((string_split(text, ' '))[7:12], ' '),
      array_to_string((string_split(text, ' '))[13:18], ' '),
      array_to_string((string_split(text, ' '))[19:24], ' '),
      CASE WHEN doc_id % 4 = 1 THEN '{_BOILER_BOT}' END
    ) AS text
  FROM documents
),
paras AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10)||chr(10))) AS para,
         generate_subscripts(string_split(text, chr(10)||chr(10)), 1) AS pos
  FROM fixture
),
freq AS (
  SELECT para FROM paras GROUP BY para HAVING COUNT(DISTINCT doc_id) >= 5
),
kept AS (
  SELECT p.* FROM paras p WHERE p.para NOT IN (SELECT para FROM freq)
)
SELECT t.doc_id,
       COALESCE(k.clean_text, '') AS clean_text,
       COALESCE(k.n_kept, 0) AS n_kept,
       t.n_total - COALESCE(k.n_kept, 0) AS n_removed
FROM (SELECT doc_id, COUNT(*) AS n_total FROM paras GROUP BY doc_id) t
LEFT JOIN (
  SELECT doc_id, string_agg(para, chr(10)||chr(10) ORDER BY pos) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
) k ON t.doc_id = k.doc_id
ORDER BY t.doc_id
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: documents with doc_id%17==0 act as the
    held-out evaluation set; every training doc sharing an 8-gram with
    them is flagged.  The small word vocabulary makes organic collisions
    plentiful, so the oracle (full SQL replay of shingling + distinct +
    matching) checks real overlap structure, not a planted bit."""
    from .textops.curate import decontaminate

    d = _docs(spark, sf_dir).select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 17 == 0)
    return decontaminate(d, bench, n=8).orderBy("doc_id")


ORACLE_DECONTAMINATE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT DISTINCT doc_id,
         array_to_string(ws[i:i+7], ' ') AS gram
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
        FROM w WHERE len(ws) >= 8)
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0),
hits AS (
  SELECT g.doc_id, COUNT(*) AS n
  FROM g JOIN bench USING (gram)
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n, 0) AS n_contaminated_ngrams,
       COALESCE(h.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
ORDER BY d.doc_id
"""


def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate spans (Lee et al. ExactSubstr, windowed
    to 8-token grams): the small synthetic vocabulary makes organic
    cross-doc window collisions plentiful, so the oracle (full SQL replay
    of windowing, distinct-doc counting, semi-join flagging and
    merged-interval coverage) exercises real overlap structure."""
    from .textops.dedup import duplicate_spans

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return duplicate_spans(d, k=8, min_docs=2).orderBy("doc_id")


ORACLE_DUPLICATE_SPANS = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g0 AS (
  SELECT doc_id, i AS pos, array_to_string(ws[i:i+7], ' ') AS gram
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 7)) AS i
        FROM w WHERE len(ws) >= 8)
),
g AS (SELECT doc_id, pos, {BASE_HASH_SQL.format(x='gram')} AS gh FROM g0),
dup AS (
  SELECT gh FROM g GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2
),
f AS (SELECT doc_id, pos FROM g WHERE gh IN (SELECT gh FROM dup)),
cov AS (
  SELECT doc_id, pos,
         GREATEST(0, (pos + 8) - GREATEST(COALESCE(
           MAX(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), pos)
         ) AS c
  FROM f
),
per AS (
  SELECT doc_id, COUNT(*) AS n_dup_windows, SUM(c) AS dup_tokens
  FROM cov GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.ws) AS BIGINT) AS n_tokens,
       CAST(GREATEST(len(t.ws) - 7, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens
FROM w t LEFT JOIN per p ON t.doc_id = p.doc_id
ORDER BY t.doc_id
"""


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram LM perplexity proxy (CCNet filter): per-token
    -ln p(w) quantized to integer micro-nats before the per-doc mean, so
    the value is bit-stable under any partitioning and the oracle replays
    the whole two-pass plan (count -> cost -> mean) in SQL."""
    from .textops.quality import unigram_logprob

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return unigram_logprob(d).orderBy("doc_id")


ORACLE_UNIGRAM_LOGPROB = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
cnt AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
tot AS (SELECT SUM(c) AS t FROM cnt),
per AS (
  SELECT doc_id,
         CAST(floor(-ln(c::DOUBLE / t::DOUBLE) * 1000000) AS BIGINT) AS cost
  FROM toks JOIN cnt USING (w) CROSS JOIN tot
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(floor(SUM(cost)::DOUBLE / COUNT(*)) AS BIGINT) AS nll_micro_mean
FROM per GROUP BY doc_id ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pii_scrub": q_pii_scrub,
        "repetition_signals": q_repetition_signals,
        "hash_sample": q_hash_sample,
        "stratified_sample": q_stratified_sample,
        "pack_sequences": q_pack_sequences,
        "rebalance_sources": q_rebalance_sources,
        "ann_pq_codes": q_ann_pq_codes,
        "ann_pq_topk": q_ann_pq_topk,
        "ann_pq_rerank": q_ann_pq_rerank,
        "cookie_set_parse": q_cookie_set_parse,
        "cookie_send_full": q_cookie_send_full,
        "http_request_shaping": q_http_request_shaping,
        "semdedup": q_semdedup,
        "paragraph_dedup": q_paragraph_dedup,
        "decontaminate": q_decontaminate,
        "duplicate_spans": q_duplicate_spans,
        "unigram_logprob": q_unigram_logprob,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pii_scrub": ORACLE_PII_SCRUB,
        "repetition_signals": ORACLE_REPETITION,
        "hash_sample": ORACLE_HASH_SAMPLE,
        "stratified_sample": ORACLE_STRATIFIED,
        "pack_sequences": ORACLE_PACK,
        "rebalance_sources": _oracle_rebalance(),
        "ann_pq_codes": _oracle_pq_codes(),
        "ann_pq_topk": _oracle_pq_topk(),
        "ann_pq_rerank": _oracle_pq_rerank(),
        "cookie_set_parse": ORACLE_COOKIE_PARSE,
        "cookie_send_full": ORACLE_COOKIE_SEND,
        "http_request_shaping": ORACLE_HTTP_SHAPING,
        "semdedup": ORACLE_SEMDEDUP,
        "paragraph_dedup": ORACLE_PARAGRAPH_DEDUP,
        "decontaminate": ORACLE_DECONTAMINATE,
        "duplicate_spans": ORACLE_DUPLICATE_SPANS,
        "unigram_logprob": ORACLE_UNIGRAM_LOGPROB,
    }
