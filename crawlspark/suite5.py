"""Round-2 continuation queries, part 3: URL tracking-param hygiene,
temperature-scaled source mixing, the host-bucketed results-table sink
(write -> partition-pruned read roundtrip), and frozen-table BPE encoding.

Every query follows the house rules: deterministic fixtures derived from
the parquet tables, DuckDB oracles replaying the identical computation in
ANSI SQL, aligned column names/types on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import graph, sinks
from .canon import canonicalize_expr, strip_tracking_params
from .textops.bpe import bpe_encode_col, bpe_encode_oracle_sql
from .textops.curate import temperature_sample


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# url_strip_tracking — tracking/session-param strip on canonical URLs
# --------------------------------------------------------------------------

def q_url_strip_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canonicalize -> strip utm_*/gclid/fbclid/... query params and the
    ;jsessionid path matrix param (crawl identity hygiene: every surviving
    alias is a duplicate fetch + seen-set entry at 10^10 URLs).  Four URL
    shapes by doc_id % 4: clean / tracking-only query / mixed query /
    jsessionid path + mixed query.  Pure Column expressions; the oracle
    states the expected string arithmetically."""
    doc = F.col("doc_id")
    s = doc.cast("string")
    base = F.concat(
        F.lit("HTTP://H"), (doc % 10).cast("string"),
        F.lit(".Example.TEST/p/"), s,
    )
    shape = doc % 4
    raw = (
        F.when(shape == 0, base)
        .when(shape == 1, F.concat(
            base, F.lit("?utm_source=s"), (doc % 5).cast("string"),
            F.lit("&gclid=g"), s))
        .when(shape == 2, F.concat(
            base, F.lit("?z="), (doc % 7).cast("string"),
            F.lit("&utm_campaign=c&a="), (doc % 3).cast("string")))
        .otherwise(F.concat(
            base, F.lit(";JSESSIONID=S"), s,
            F.lit("?fbclid=f"), s, F.lit("&id="), (doc % 9).cast("string")))
    )
    return _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        strip_tracking_params(canonicalize_expr(raw)).alias("url_clean"),
    )


ORACLE_STRIP_TRACKING = """
SELECT doc_id,
  'http://h' || CAST(doc_id % 10 AS VARCHAR) || '.example.test/p/' ||
  CAST(doc_id AS VARCHAR) ||
  CASE CAST(doc_id % 4 AS INTEGER)
    WHEN 2 THEN '?a=' || CAST(doc_id % 3 AS VARCHAR)
             || '&z=' || CAST(doc_id % 7 AS VARCHAR)
    WHEN 3 THEN '?id=' || CAST(doc_id % 9 AS VARCHAR)
    ELSE ''
  END AS url_clean
FROM documents
"""


# --------------------------------------------------------------------------
# temperature_sample — T=0.5 source mixing with data-derived rates
# --------------------------------------------------------------------------

def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixing over a skewed synthetic source split
    (60/30/10): keep-rate per source = sqrt(n_s/n_max) in permille,
    derived from the observed counts in integer arithmetic (count ->
    1-row max -> broadcast rate table -> salted-hash keep filter)."""
    doc = F.col("doc_id")
    src = (
        F.when(doc % 10 < 6, F.lit("web"))
        .when(doc % 10 < 9, F.lit("books"))
        .otherwise(F.lit("code"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), src.alias("source"))
    return temperature_sample(d, source_col="source", id_col="doc_id").select(
        "doc_id", "source", "keep_permille", "sample_bucket"
    )


ORACLE_TEMPERATURE = """
WITH src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 6 THEN 'web'
              WHEN doc_id % 10 < 9 THEN 'books'
              ELSE 'code' END AS source
  FROM documents
), c AS (
  SELECT source, COUNT(*) AS n FROM src GROUP BY source
), m AS (
  SELECT MAX(n) AS nmax FROM c
), r AS (
  SELECT source,
         CAST(FLOOR(SQRT(CAST(((1000000 * n) // nmax) AS DOUBLE))) AS BIGINT)
           AS keep_permille
  FROM c, m
), b AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5('temp' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 1000 AS sample_bucket
  FROM src
)
SELECT b.doc_id, b.source, r.keep_permille, b.sample_bucket
FROM b JOIN r USING (source)
WHERE sample_bucket < keep_permille
"""


# --------------------------------------------------------------------------
# results_table — host-bucketed Iceberg-layout sink, write -> pruned read
# --------------------------------------------------------------------------

def q_results_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end sink roundtrip: write the page corpus host-bucketed +
    crawl-order-clustered (sinks.write_results_table), read ONE host back
    through the bucket-pruned path, return its rows.  The oracle states
    the same host slice directly — equality proves the layout write and
    the pruned read both preserve content."""
    pages = graph.pages(spark, sf_dir).withColumn("ord", F.col("doc"))
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = f"/tmp/crawlspark_results_table_{tag}"
    sinks.write_results_table(
        pages.select("doc", "url", "host", "ord"), path, num_buckets=8
    )
    back = sinks.read_results_for_host(
        spark, path, "h3.example.test", num_buckets=8
    )
    return back.select(F.col("doc").alias("doc_id"), "url", "ord")


ORACLE_RESULTS_TABLE = f"""
WITH p AS (SELECT doc_id AS doc FROM documents)
SELECT doc AS doc_id, {graph._URL_SQL} AS url, doc AS ord
FROM p WHERE doc % 10 = 3
"""


# --------------------------------------------------------------------------
# bpe_encode — frozen merge table applied corpus-wide, UDF-free
# --------------------------------------------------------------------------

# Frozen tokenizer artifact: 16 merges trained once on the gate corpus
# (bpe_train over sf0.01 documents.text; training itself is oracle'd by
# q:bpe_merges' differential test).  Shipped as literals — encoding with a
# FIXED vocabulary over varying corpora is the production op.
FROZEN_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
    ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
    ("a", "</w>"), ("g", "</w>"), ("y", "</w>"), ("a", "r"),
]
_BPE_ROUNDS = 2


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the frozen BPE merge table to every document — pure Column
    expressions (paren-framed symbol string + one literal replace per
    merge per sweep), so the encoder fuses into the scan: no UDF, no
    shuffle, narrow at any scale."""
    toks = bpe_encode_col(F.col("text"), FROZEN_MERGES, rounds=_BPE_ROUNDS)
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.array_join(toks, " ").alias("bpe_tokens"),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
    )


def _bpe_encode_oracle() -> str:
    expr = bpe_encode_oracle_sql("text", FROZEN_MERGES, rounds=_BPE_ROUNDS)
    return f"""
SELECT doc_id,
       array_to_string({expr}, ' ') AS bpe_tokens,
       CAST(len({expr}) AS BIGINT) AS n_bpe_tokens
FROM documents
"""


# --------------------------------------------------------------------------
# pack_bpe — composition: frozen-table BPE tokenize -> sequence packing
# --------------------------------------------------------------------------

_PACK_BPE_CAPACITY = 256


def q_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenize->pack composition with REAL tokenizer counts: BPE-encode
    every document with the frozen merge table (UDF-free Column fold), then
    pack the resulting n_bpe_tokens into fixed-budget training bins via the
    two-phase distributed prefix sum.  Whitespace counts (q:pack_sequences)
    are the approximation; this is what the training pipeline actually
    packs on."""
    from .textops.curate import pack_sequences

    toks = bpe_encode_col(F.col("text"), FROZEN_MERGES, rounds=_BPE_ROUNDS)
    d = _docs(spark, sf_dir).select(
        "doc_id", F.size(toks).cast("long").alias("n_tokens")
    )
    return pack_sequences(
        d, capacity=_PACK_BPE_CAPACITY, order_salt="packbpe"
    )


def _pack_bpe_oracle() -> str:
    expr = bpe_encode_oracle_sql("text", FROZEN_MERGES, rounds=_BPE_ROUNDS)
    return f"""
WITH t AS (
  SELECT doc_id, CAST(len({expr}) AS BIGINT) AS n_tokens,
         CAST(('0x' || substr(md5('packbpe' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS h
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (
           ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(FLOOR((cum_tokens - n_tokens) / {_PACK_BPE_CAPACITY}) AS BIGINT)
         AS bin_id
FROM c
"""


# --------------------------------------------------------------------------
# ip_group_admission — server-level politeness over the page corpus
# --------------------------------------------------------------------------

def q_ip_group_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-server admission: hosts grouped by deterministic fake-DNS hash
    (a resolver table at deploy time), each group admits its first
    ``budget`` URLs in crawl order, the rest defer to the next wave.
    Fixture fans the corpus out over 40 virtual hosts (doc % 40) so
    groups genuinely share servers."""
    from .politeness import ip_group_admission

    doc = F.col("doc_id")
    d = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat(F.lit("v"), (doc % 40).cast("string"),
                 F.lit(".example.test")).alias("host"),
        doc.alias("ord"),
    )
    return ip_group_admission(d, budget=10, n_groups=8).select(
        "doc_id", "host", "ip_group", "ip_seq", "admitted"
    )


ORACLE_IP_GROUP = """
WITH d AS (
  SELECT doc_id,
         'v' || CAST(doc_id % 40 AS VARCHAR) || '.example.test' AS host,
         doc_id AS ord
  FROM documents
), g AS (
  SELECT *,
         CAST(('0x' || substr(md5('dns' || host), 1, 8)) AS BIGINT) % 8
           AS ip_group
  FROM d
)
SELECT doc_id, host, ip_group,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY ip_group ORDER BY ord, host) AS BIGINT) AS ip_seq,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY ip_group ORDER BY ord, host) AS BIGINT) <= 10
         AS admitted
FROM g
"""


# --------------------------------------------------------------------------
# quality_classifier — fastText-style hashed linear model, frozen artifact
# --------------------------------------------------------------------------

def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: the shipped hashed-linear weight
    table scored over every document, keep decided by integer
    cross-multiplication — pure Column HOFs, no UDF, no shuffle."""
    from .textops.quality import classifier_score

    return classifier_score(_docs(spark, sf_dir))


def _quality_classifier_oracle() -> str:
    from .textops.quality import FT_BUCKETS, FT_WEIGHTS_MICRO

    wlist = "list_value(" + ", ".join(str(x) for x in FT_WEIGHTS_MICRO) + ")"
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(str_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(COALESCE(list_sum(list_transform(toks,
           t -> list_extract({wlist},
             CAST(CAST(('0x' || substr(md5('ft' || t), 1, 8)) AS BIGINT)
                  % {FT_BUCKETS} + 1 AS INTEGER)))), 0) AS BIGINT)
           AS score_sum_micro
  FROM t
)
SELECT doc_id, n_tokens, score_sum_micro,
       score_sum_micro >= 0 AS keep
FROM s
"""


# --------------------------------------------------------------------------
# lsh_incremental — dedup-index maintenance for a continuously-crawled corpus
# --------------------------------------------------------------------------

def q_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH: the standing corpus (doc_id % 3 != 0) is
    already indexed; a new crawl batch (doc_id % 3 == 0 plus near-dup
    variants of every doc_id % 10 == 1 at -(doc_id+1)) is signed, probed
    against the index buckets, and exact-Jaccard verified — emitting only
    pairs with a NEW side.  Replayable band keys, no bucket cap, so the
    DuckDB oracle reproduces the candidate set bit-for-bit."""
    from .textops import dedup as _dedup

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    doc = F.col("doc_id")
    index = docs.filter(doc % 3 != 0)
    new_batch = docs.filter(doc % 3 == 0).unionByName(
        docs.filter(doc % 10 == 1).select(
            (-doc - 1).alias("doc_id"),
            F.concat("text", F.lit(" ztail")).alias("text"),
        )
    )
    return _dedup.minhash_lsh_incremental_pairs(
        index, new_batch, k=8, bands=4, jaccard_threshold=0.5,
        replayable_band_key=True,
    )


def _oracle_lsh_incremental() -> str:
    from .textops import dedup as _dedup

    p = _dedup.HASH_P
    shingle = (
        "list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] "
        "for i in range(1, len(w) - 1)])"
    )
    md5h = "CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)"
    sig_cols = ", ".join(
        f"list_min(list_transform(hs, h -> "
        f"({_dedup.MINHASH_A[i]}*h + {_dedup.MINHASH_B[i]}) % {p})) AS m{i}"
        for i in range(8)
    )
    bkeys = ", ".join(
        f"CAST(m{2 * i} AS VARCHAR) || ',' || CAST(m{2 * i + 1} AS VARCHAR)"
        for i in range(4)
    )
    band_eq = " OR ".join(
        f"a.bkeys[{i + 1}] = b.bkeys[{i + 1}]" for i in range(4)
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, text, (doc_id % 3 = 0) AS is_new FROM documents
  UNION ALL
  SELECT -doc_id - 1, text || ' ztail', TRUE
  FROM documents WHERE doc_id % 10 = 1
),
sh AS (
  SELECT doc_id, is_new, {shingle} AS s_list
  FROM (SELECT doc_id, is_new, str_split(text, ' ') AS w FROM corpus)
),
h AS (
  SELECT doc_id, is_new, s_list,
         list_transform(s_list, s -> {md5h}) AS hs FROM sh
),
sig AS (SELECT doc_id, is_new, s_list, {sig_cols} FROM h),
banded AS (SELECT doc_id, is_new, s_list, [{bkeys}] AS bkeys FROM sig),
cand AS (
  SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS id_a,
                  GREATEST(a.doc_id, b.doc_id) AS id_b
  FROM banded a JOIN banded b
    ON a.is_new AND a.doc_id <> b.doc_id AND ({band_eq})
),
v AS (
  SELECT c.id_a, c.id_b, sa.s_list AS sa, sb.s_list AS sb
  FROM cand c
  JOIN banded sa ON sa.doc_id = c.id_a
  JOIN banded sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b,
       CAST(floor(1000 * len(list_intersect(sa, sb))
                  / len(list_distinct(sa || sb))) AS BIGINT) AS jaccard_permille
FROM v
WHERE floor(1000 * len(list_intersect(sa, sb))
            / len(list_distinct(sa || sb))) >= 500
"""


# --------------------------------------------------------------------------
# dedup_keep_best — quality-aware representative selection per dedup group
# --------------------------------------------------------------------------

def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup drop policy end to end: transitive near-dup groups (the
    closed-form block graph from q:dedup_components, chased by the
    large-star/small-star CC) crossed with the hashed-linear quality
    score — each group keeps its highest-scoring member (ties -> lowest
    id).  The oracle replays components (recursive CTE), the classifier
    sum, and the ranking window."""
    from .textops import dedup as _dedup
    from .textops.quality import classifier_score

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    doc = F.col("doc_id")
    blk = doc - doc % 64
    ids = docs.select("doc_id")
    e1 = ids.select(doc.alias("id_a"), (blk + (5 * doc + 3) % 64).alias("id_b"))
    e2 = ids.filter(doc % 3 == 0).select(
        doc.alias("id_a"), (blk + (17 * doc + 11) % 64).alias("id_b")
    )
    edges = (
        e1.union(e2)
        .filter(F.col("id_a") != F.col("id_b"))
        .join(ids.select(doc.alias("id_b")), "id_b", "semi")
    )
    cc = _dedup.connected_components(edges)
    assign = ids.join(cc, ids["doc_id"] == cc["node"], "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("component")
    )
    scores = classifier_score(docs).select(
        "doc_id", F.col("score_sum_micro").alias("score")
    )
    return _dedup.keep_best_representative(assign, scores).select(
        "doc_id", "component", "score", "rank_in_group", "keep"
    )


def _oracle_dedup_keep_best() -> str:
    from .textops.quality import FT_BUCKETS, FT_WEIGHTS_MICRO

    wlist = "list_value(" + ", ".join(str(x) for x in FT_WEIGHTS_MICRO) + ")"
    return f"""
WITH RECURSIVE
n AS (SELECT doc_id FROM documents),
e0 AS (
  SELECT doc_id AS a, (doc_id // 64) * 64 + (5 * doc_id + 3) % 64 AS b FROM n
  UNION ALL
  SELECT doc_id, (doc_id // 64) * 64 + (17 * doc_id + 11) % 64
  FROM n WHERE doc_id % 3 = 0
),
e AS (SELECT a, b FROM e0 WHERE a <> b AND b IN (SELECT doc_id FROM n)),
sym AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM n
  UNION
  SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.node
),
comp AS (SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node),
t AS (
  SELECT doc_id,
         list_filter(str_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
),
s AS (
  SELECT doc_id,
         CAST(COALESCE(list_sum(list_transform(toks,
           t -> list_extract({wlist},
             CAST(CAST(('0x' || substr(md5('ft' || t), 1, 8)) AS BIGINT)
                  % {FT_BUCKETS} + 1 AS INTEGER)))), 0) AS BIGINT) AS score
  FROM t
),
j AS (
  SELECT c.doc_id, c.component, s.score
  FROM comp c JOIN s ON s.doc_id = c.doc_id
)
SELECT doc_id, component, score,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY component ORDER BY score DESC, doc_id)
         AS BIGINT) AS rank_in_group,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY component ORDER BY score DESC, doc_id)
         AS BIGINT) = 1 AS keep
FROM j
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "url_strip_tracking": q_url_strip_tracking,
        "temperature_sample": q_temperature_sample,
        "results_table": q_results_table,
        "bpe_encode": q_bpe_encode,
        "pack_bpe": q_pack_bpe,
        "ip_group_admission": q_ip_group_admission,
        "quality_classifier": q_quality_classifier,
        "lsh_incremental": q_lsh_incremental,
        "dedup_keep_best": q_dedup_keep_best,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "url_strip_tracking": ORACLE_STRIP_TRACKING,
        "temperature_sample": ORACLE_TEMPERATURE,
        "results_table": ORACLE_RESULTS_TABLE,
        "bpe_encode": _bpe_encode_oracle(),
        "pack_bpe": _pack_bpe_oracle(),
        "ip_group_admission": ORACLE_IP_GROUP,
        "quality_classifier": _quality_classifier_oracle(),
        "lsh_incremental": _oracle_lsh_incremental(),
        "dedup_keep_best": _oracle_dedup_keep_best(),
    }
