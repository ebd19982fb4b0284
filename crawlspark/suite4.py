"""Round-2 continuation queries, part 2: WARC archive ingestion + CDX.

The WARC fixture is synthesized deterministically from the documents table
(request/response record pairs, 10 docs per archive file), so the DuckDB
oracle replays BOTH the fixture construction and the full parse (record
split, WARC/HTTP header extraction, body recovery) in SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import warc
from .extract import BLOCK_SPLIT_RE as _BLOCK_RE_SQL  # oracle shares the regex
from .textops.dedup import BASE_HASH_SQL

_CR = warc.CRLF
_CR2 = warc.CRLF2


def _warc_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WARC archive fixture: per doc a response record (404
    on doc%13==0) preceded by a request record for doc%5==0; 10 docs per
    file, concatenated in doc order."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    doc = F.col("doc_id")
    s = doc.cast("string")
    uri = F.concat(F.lit("https://h"), (doc % 7).cast("string"),
                   F.lit(".example.com/p/"), s)
    body = F.concat(F.lit("<html>"), F.substring("text", 1, 40), F.lit("</html>"))
    status = F.when(doc % 13 == 0, F.lit("404")).otherwise(F.lit("200"))
    date = F.concat(F.lit("2026-08-18T00:00:0"), (doc % 10).cast("string"), F.lit("Z"))
    resp = F.concat(
        F.lit("WARC/1.0" + _CR + "WARC-Type: response" + _CR + "WARC-Target-URI: "),
        uri,
        F.lit(_CR + "WARC-Date: "), date,
        F.lit(_CR + "Content-Length: "), F.length(body).cast("string"),
        F.lit(_CR2 + "HTTP/1.1 "), status,
        F.lit(" OK" + _CR + "Content-Type: text/html; charset=utf-8" + _CR2),
        body, F.lit(_CR2),
    )
    req = F.when(
        doc % 5 == 0,
        F.concat(
            F.lit("WARC/1.0" + _CR + "WARC-Type: request" + _CR
                  + "WARC-Target-URI: "),
            uri,
            F.lit(_CR2 + "GET /p/"), s,
            F.lit(" HTTP/1.1" + _CR + "Host: h"), (doc % 7).cast("string"),
            F.lit(".example.com" + _CR2),
        ),
    ).otherwise(F.lit(""))
    recs = d.select(doc, F.floor(doc / 10).cast("long").alias("file_id"),
                    F.concat(req, resp).alias("rec"))
    return recs.groupBy("file_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "rec"))),
                lambda x: x["rec"],
            ),
        ).alias("warc")
    )


def q_warc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC record parse over the synthesized archives: record split on the
    version line, WARC header fields, HTTP status/content-type peel, body
    recovery with terminator strip — all JVM expressions (warc.parse_warc);
    the oracle rebuilds the archives AND re-parses them in SQL."""
    return warc.parse_warc(_warc_files(spark, sf_dir)).orderBy("file_id", "rec_pos")


def q_warc_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX index over the parsed archives: SURT keys, body digests, record
    positions for the response records (warc.cdx_index)."""
    return warc.cdx_index(warc.parse_warc(_warc_files(spark, sf_dir))).orderBy(
        "surt", "target_uri", "file_id", "rec_pos"
    )


# the fixture + parse replay shared by both oracles
_FIXTURE_AND_PARSE = f"""
c AS (SELECT chr(13)||chr(10) AS cr, chr(13)||chr(10)||chr(13)||chr(10) AS cr2),
base AS (
  SELECT doc_id, doc_id // 10 AS file_id,
         'https://h' || (doc_id % 7) || '.example.com/p/' || doc_id AS uri,
         '<html>' || substr(text, 1, 40) || '</html>' AS body,
         CASE WHEN doc_id % 13 = 0 THEN '404' ELSE '200' END AS status,
         '2026-08-18T00:00:0' || (doc_id % 10) || 'Z' AS dt
  FROM documents
),
rec AS (
  SELECT doc_id, file_id,
    CASE WHEN doc_id % 5 = 0 THEN
      'WARC/1.0' || cr || 'WARC-Type: request' || cr || 'WARC-Target-URI: '
      || uri || cr2 || 'GET /p/' || doc_id || ' HTTP/1.1' || cr
      || 'Host: h' || (doc_id % 7) || '.example.com' || cr2
    ELSE '' END
    || 'WARC/1.0' || cr || 'WARC-Type: response' || cr || 'WARC-Target-URI: '
    || uri || cr || 'WARC-Date: ' || dt
    || cr || 'Content-Length: ' || length(body) || cr2 || 'HTTP/1.1 ' || status
    || ' OK' || cr || 'Content-Type: text/html; charset=utf-8' || cr2
    || body || cr2 AS r
  FROM base CROSS JOIN c
),
files AS (
  SELECT file_id, string_agg(r, '' ORDER BY doc_id) AS warc
  FROM rec GROUP BY file_id
),
segs AS (
  SELECT file_id, gs - 1 AS rec_pos, seg FROM (
    SELECT file_id,
           unnest(string_split(warc, 'WARC/1.0' || cr)) AS seg,
           generate_subscripts(string_split(warc, 'WARC/1.0' || cr), 1) AS gs
    FROM files CROSS JOIN c
  ) WHERE gs >= 2
),
peeled AS (
  SELECT file_id, rec_pos,
         split_part(seg, cr2, 1) AS hdr,
         substr(seg, length(split_part(seg, cr2, 1)) + 5) AS payload,
         cr2
  FROM segs CROSS JOIN c
),
parsed AS (
  SELECT file_id, rec_pos,
    NULLIF(regexp_extract(hdr, 'WARC-Type: ([^\\r\\n]+)', 1), '') AS warc_type,
    NULLIF(regexp_extract(hdr, 'WARC-Target-URI: ([^\\r\\n]+)', 1), '') AS target_uri,
    NULLIF(regexp_extract(hdr, 'WARC-Date: ([^\\r\\n]+)', 1), '') AS warc_date,
    CAST(NULLIF(regexp_extract(hdr, 'Content-Length: ([^\\r\\n]+)', 1), '') AS BIGINT)
      AS content_length,
    CAST(NULLIF(regexp_extract(payload, '^HTTP/1\\.[01] (\\d{{3}})', 1), '') AS INTEGER)
      AS http_status,
    CASE WHEN regexp_extract(payload, '^HTTP/1\\.[01] (\\d{{3}})', 1) != '' THEN
      NULLIF(regexp_extract(split_part(payload, cr2, 1),
                            'Content-Type: ([^\\r\\n]+)', 1), '')
    END AS content_type,
    CASE WHEN regexp_extract(payload, '^HTTP/1\\.[01] (\\d{{3}})', 1) != '' THEN
      regexp_replace(substr(payload, length(split_part(payload, cr2, 1)) + 5),
                     '[\\r\\n]+$', '')
    ELSE regexp_replace(payload, '[\\r\\n]+$', '')
    END AS body
  FROM peeled
)
"""

ORACLE_WARC_PARSE = f"""
WITH {_FIXTURE_AND_PARSE}
SELECT file_id, rec_pos, warc_type, target_uri, warc_date, content_length,
       http_status, content_type, body
FROM parsed
ORDER BY file_id, rec_pos
"""

ORACLE_WARC_CDX = f"""
WITH {_FIXTURE_AND_PARSE}
SELECT
  array_to_string(list_reverse(string_split(lower(
    regexp_extract(target_uri, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), '.')), ',')
  || ')' ||
  CASE WHEN regexp_extract(target_uri, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) = ''
       THEN '/' ELSE lower(regexp_extract(target_uri,
            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)) END AS surt,
  target_uri, warc_date, file_id, rec_pos,
  {BASE_HASH_SQL.format(x='body')} AS digest,
  CAST(length(body) AS BIGINT) AS length
FROM parsed
WHERE warc_type = 'response'
ORDER BY surt, target_uri, file_id, rec_pos
"""


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard packing (mmcurate.shard_assign) over a
    documents-derived fixture (bucket = doc%3, size = text length,
    4 KiB target): offset-based packing per bucket + global shard
    numbering, replayed exactly by the SQL windows."""
    from . import mmcurate

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id"),
        F.element_at(F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("bucket"),
        F.length("text").alias("nbytes"),
    )
    return mmcurate.shard_assign(
        d, size_col="nbytes", bucket_col="bucket", id_col="doc_id",
        target_bytes=4096,
    ).orderBy("doc_id")


ORACLE_SHARD_ASSIGN = """
WITH d AS (
  SELECT doc_id,
         ['a','b','c'][(doc_id % 3 + 1)::INT] AS bucket,
         length(text)::BIGINT AS nbytes
  FROM documents
),
rows_ AS (
  SELECT doc_id, bucket, nbytes,
         COALESCE(SUM(nbytes) OVER (PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM d
),
sh AS (SELECT *, before // 4096 AS shard_ix FROM rows_),
counts AS (SELECT bucket, MAX(shard_ix) + 1 AS n_shards FROM sh GROUP BY bucket),
bases AS (
  SELECT bucket, COALESCE(SUM(n_shards) OVER (ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
  FROM counts
)
SELECT s.doc_id, s.bucket,
       s.shard_ix::BIGINT AS shard_ix,
       (b.base + s.shard_ix)::BIGINT AS shard_uid,
       (s.before - s.shard_ix * 4096)::BIGINT AS offset_in_shard
FROM sh s JOIN bases b USING (bucket)
ORDER BY s.doc_id
"""


def q_image_patchify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patch extraction over the synthesized image table: per-image
    patch count and channel-mean aggregates.  The pixel payload comes from
    the deterministic fake codec (not SQL-replayable), so this is a
    rows-only gate entry; the per-patch values are pytest-verified against
    hand-decoded pixels (tests/test_patchify_shards.py)."""
    from . import images

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 200)
    imgs = images.generate_images(spark, sf_dir, docs=docs)
    return (
        images.patchify(imgs, patch=8)
        .groupBy("image_id")
        .agg(
            F.count("*").cast("long").alias("n_patches"),
            F.sum("mean_r_milli").alias("sum_r_milli"),
            F.sum("mean_g_milli").alias("sum_g_milli"),
            F.sum("mean_b_milli").alias("sum_b_milli"),
        )
        .orderBy("image_id")
    )


def _chunk(words, start: int, n: int):
    """6-word text chunk as one fixture line (empty-safe on both engines)."""
    return F.array_join(F.slice(words, start, n), " ")


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line/page cleaning over a planted fixture: per doc 5 lines built
    from its words — line1 ends '.', (doc%11==0 adds 'lorem ipsum'), line2
    has no terminal punctuation (doc%13==0 also adds '{'), line3 ends '?',
    line4 ends '!' unless doc%4==1 which mentions javascript, line5 is a
    2-word stub.  The oracle replays line filtering, sentence counting and
    the page rules with list expressions."""
    from .textops.curate import c4_clean

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    doc, words = F.col("doc_id"), F.split(F.col("text"), " ")
    line1 = F.concat(
        _chunk(words, 1, 6),
        F.when(doc % 11 == 0, F.lit(" lorem ipsum.")).otherwise(F.lit(".")),
    )
    line2 = F.concat(
        _chunk(words, 7, 6),
        F.when(doc % 13 == 0, F.lit(" {")).otherwise(F.lit("")),
    )
    line3 = F.concat(_chunk(words, 13, 6), F.lit("?"))
    line4 = F.concat(
        _chunk(words, 19, 6),
        F.when(doc % 4 == 1, F.lit(" uses javascript.")).otherwise(F.lit("!")),
    )
    fixture = d.select(
        "doc_id",
        F.concat_ws("\n", line1, line2, line3, line4, F.lit("so short."))
        .alias("text"),
    )
    return c4_clean(fixture, min_sentences=3).orderBy("doc_id")


ORACLE_C4_CLEAN = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
fixture AS (
  SELECT doc_id,
    COALESCE(array_to_string(ws[1:6], ' '), '')
      || CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum.' ELSE '.' END
    || chr(10) ||
    COALESCE(array_to_string(ws[7:12], ' '), '')
      || CASE WHEN doc_id % 13 = 0 THEN ' {' ELSE '' END
    || chr(10) ||
    COALESCE(array_to_string(ws[13:18], ' '), '') || '?'
    || chr(10) ||
    COALESCE(array_to_string(ws[19:24], ' '), '')
      || CASE WHEN doc_id % 4 = 1 THEN ' uses javascript.' ELSE '!' END
    || chr(10) || 'so short.' AS text
  FROM w
),
ln AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM fixture
),
kept AS (
  SELECT doc_id, text, lines,
    list_filter(lines, x ->
      regexp_matches(x, '[.!?"]$')
      AND len(list_filter(string_split(x, ' '), ww -> ww != '')) >= 3
      AND NOT contains(lower(x), 'javascript')
    ) AS kl
  FROM ln
),
agg AS (
  SELECT doc_id,
         COALESCE(array_to_string(kl, chr(10)), '') AS clean_text,
         len(lines)::BIGINT AS n_lines_total,
         len(kl)::BIGINT AS n_lines_kept,
         len(regexp_extract_all(COALESCE(array_to_string(kl, chr(10)), ''),
                                '[.!?]'))::BIGINT AS n_sentences,
         contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
         contains(text, '{') AS has_brace
  FROM kept
)
SELECT doc_id, clean_text, n_lines_total, n_lines_kept, n_sentences,
       has_lorem_ipsum, has_brace,
       (NOT has_lorem_ipsum AND NOT has_brace AND n_sentences >= 3)
         AS keep_page
FROM agg ORDER BY doc_id
"""


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Gopher rule set over a planted fixture: per doc 4 lines with a
    variable-length first line (5 + doc%40 words), a stopword prefix on
    even docs, bullets on doc%6==0, a trailing ellipsis on doc%7==0,
    '#' symbols on doc%9==0, and a numeric-word run on doc%17==0, so every
    rule's verdict varies across the corpus.  The oracle replays all seven
    rules with integer cross-multiplication."""
    from .textops.curate import gopher_rules

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    doc, words = F.col("doc_id"), F.split(F.col("text"), " ")
    # doc%6==0 docs are ALL-bullet (4/4 lines > 90% -> rule fails);
    # everyone else has zero bullet lines
    bullet = F.when(doc % 6 == 0, F.lit("- ")).otherwise(F.lit(""))
    line1 = F.concat(
        bullet,
        F.when(doc % 2 == 0, F.lit("the of and ")).otherwise(F.lit("zz ")),
        F.array_join(F.slice(words, 1, (F.lit(5) + doc % 40).cast("int")), " "),
    )
    line2 = F.concat(bullet, _chunk(words, 7, 6))
    line3 = F.concat(
        bullet,
        _chunk(words, 13, 6),
        F.when(doc % 7 == 0, F.lit("...")).otherwise(F.lit("")),
    )
    line4 = F.concat(
        bullet,
        _chunk(words, 19, 6),
        F.when(doc % 9 == 0, F.lit(" ## # ##")).otherwise(F.lit("")),
        F.when(doc % 17 == 0, F.lit(" 1 2 3 4 5 6 7 8 9 10 11 12"))
        .otherwise(F.lit("")),
    )
    fixture = d.select(
        "doc_id", F.concat_ws("\n", line1, line2, line3, line4).alias("text")
    )
    return gopher_rules(fixture, min_words=30).orderBy("doc_id")


ORACLE_GOPHER_RULES = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
fixture AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 6 = 0 THEN '- ' ELSE '' END)
      || (CASE WHEN doc_id % 2 = 0 THEN 'the of and ' ELSE 'zz ' END)
      || COALESCE(array_to_string(ws[1:(5 + doc_id % 40)::INT], ' '), '')
    || chr(10) ||
    (CASE WHEN doc_id % 6 = 0 THEN '- ' ELSE '' END)
      || COALESCE(array_to_string(ws[7:12], ' '), '')
    || chr(10) ||
    (CASE WHEN doc_id % 6 = 0 THEN '- ' ELSE '' END)
      || COALESCE(array_to_string(ws[13:18], ' '), '')
      || (CASE WHEN doc_id % 7 = 0 THEN '...' ELSE '' END)
    || chr(10) ||
    (CASE WHEN doc_id % 6 = 0 THEN '- ' ELSE '' END)
      || COALESCE(array_to_string(ws[19:24], ' '), '')
      || (CASE WHEN doc_id % 9 = 0 THEN ' ## # ##' ELSE '' END)
      || (CASE WHEN doc_id % 17 = 0 THEN ' 1 2 3 4 5 6 7 8 9 10 11 12'
          ELSE '' END)
    AS text
  FROM w
),
m AS (
  SELECT doc_id, text,
    list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS wrds,
    string_split(text, chr(10)) AS lines
  FROM fixture
),
n AS (
  SELECT doc_id,
    len(wrds)::BIGINT AS nw,
    list_sum(list_transform(wrds, x -> length(x)))::BIGINT AS total_chars,
    len(regexp_extract_all(text, '#|\\.\\.\\.'))::BIGINT AS n_sym,
    len(lines)::BIGINT AS nl,
    len(list_filter(lines, x -> regexp_matches(x, '^\\s*[-*•]')))::BIGINT
      AS n_bullet,
    len(list_filter(lines, x -> suffix(x, '...')))::BIGINT AS n_ellipsis,
    len(list_filter(wrds, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT
      AS n_alpha,
    len(list_distinct(list_intersect(list_transform(wrds, x -> lower(x)),
        ['the','be','to','of','and','that','have','with'])))::BIGINT AS n_stop
  FROM m
)
SELECT doc_id, nw AS n_words,
  (nw >= 30 AND nw <= 100000) AS ok_word_count,
  (3 * nw <= total_chars AND total_chars <= 10 * nw) AS ok_mean_word_len,
  (10 * n_sym <= nw) AS ok_symbol_ratio,
  (10 * n_bullet <= 9 * nl) AS ok_bullet_lines,
  (10 * n_ellipsis <= 3 * nl) AS ok_ellipsis_lines,
  (5 * n_alpha >= 4 * nw) AS ok_alpha_words,
  (n_stop >= 2) AS ok_stopwords,
  ((nw >= 30 AND nw <= 100000)
   AND (3 * nw <= total_chars AND total_chars <= 10 * nw)
   AND (10 * n_sym <= nw)
   AND (10 * n_bullet <= 9 * nl)
   AND (10 * n_ellipsis <= 3 * nl)
   AND (5 * n_alpha >= 4 * nw)
   AND (n_stop >= 2)) AS keep
FROM n ORDER BY doc_id
"""


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights with docs doc_id%10==0 as the target
    domain: hashed-bigram LM log-ratio per doc, micro-nat quantized; the
    oracle replays feature hashing, Laplace counts and the weight sum."""
    from .textops.curate import dsir_weights

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    target = d.filter(F.col("doc_id") % 10 == 0)
    return dsir_weights(d, target).orderBy("doc_id")


ORACLE_DSIR = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS gram
  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
        FROM w WHERE len(ws) >= 2)
),
f AS (SELECT doc_id, {BASE_HASH_SQL.format(x='gram')} % 10007 AS b FROM g),
cr AS (SELECT b, COUNT(*) AS c_r FROM f GROUP BY b),
ct AS (SELECT b, COUNT(*) AS c_t FROM f WHERE doc_id % 10 = 0 GROUP BY b),
tot AS (SELECT (SELECT SUM(c_r) FROM cr) AS tr, (SELECT SUM(c_t) FROM ct) AS tt),
wt AS (
  SELECT cr.b,
    CAST(floor(ln(
      ((COALESCE(c_t, 0) + 1) * (tr + 10007))::DOUBLE /
      ((COALESCE(c_r, 0) + 1) * (tt + 10007))::DOUBLE
    ) * 1000000) AS BIGINT) AS w_micro
  FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN tot
)
SELECT f.doc_id, COUNT(*) AS n_feats,
       CAST(SUM(w_micro) AS BIGINT) AS logw_micro
FROM f JOIN wt USING (b)
GROUP BY f.doc_id ORDER BY f.doc_id
"""


def q_bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 BM25 term weights (integer-exact scaling); the
    oracle replays tf/df/dl, the scaled idf and tf-normalization, and the
    partitioned top-k window."""
    from .textops.quality import bm25_top_terms

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return bm25_top_terms(d, top_k=3).orderBy("doc_id", "rnk")


ORACLE_BM25 = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                            x -> x != '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
sc AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS t_tokens FROM dl),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf,
    CAST(floor(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * 1000000) AS BIGINT)
      AS idf,
    (1000 * dl * n_docs) // t_tokens AS rel
  FROM tf JOIN dl USING (doc_id) CROSS JOIN sc JOIN dfq USING (term)
),
s2 AS (SELECT *, 250 + (750 * rel) // 1000 AS norm FROM s),
s3 AS (
  SELECT doc_id, term, tf,
    (idf * ((22000 * tf * 1000000) // (10000 * tf + 12 * norm))) // 1000000
      AS w_micro
  FROM s2
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY w_micro DESC, term) AS rnk
  FROM s3
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
       CAST(w_micro AS BIGINT) AS w_micro, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk
"""


def q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate block removal over planted HTML (nav, link-dense block
    on doc%5==0, tiny block, footer around two organic paragraphs); the
    oracle replays block splitting, tag stripping, link-density permille
    and ordered reassembly in SQL."""
    from .extract import main_content_blocks

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    doc, words = F.col("doc_id"), F.split(F.col("text"), " ")
    c1, c2 = _chunk(words, 1, 6), _chunk(words, 7, 6)
    html = F.concat(
        F.lit('<nav>home about</nav><p>'), c1, F.lit(".</p>"),
        F.when(
            doc % 5 == 0,
            F.concat(F.lit('<p><a href="/x">'), c2, F.lit("</a></p>")),
        ).otherwise(F.concat(F.lit("<p>"), c2, F.lit(".</p>"))),
        F.lit("<p>tiny.</p><footer>(c) example</footer>"),
    )
    return main_content_blocks(
        d.select("doc_id", html.alias("html"))
    ).orderBy("doc_id")


ORACLE_MAIN_CONTENT = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
fixture AS (
  SELECT doc_id,
    '<nav>home about</nav><p>'
      || COALESCE(array_to_string(ws[1:6], ' '), '') || '.</p>'
    || CASE WHEN doc_id % 5 = 0 THEN
         '<p><a href="/x">' || COALESCE(array_to_string(ws[7:12], ' '), '')
         || '</a></p>'
       ELSE
         '<p>' || COALESCE(array_to_string(ws[7:12], ' '), '') || '.</p>'
       END
    || '<p>tiny.</p><footer>(c) example</footer>' AS html
  FROM w
),
seg AS (
  SELECT doc_id, gs AS pos, s FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(html, '{_BLOCK_RE_SQL}')) AS s,
           generate_subscripts(
             regexp_split_to_array(html, '{_BLOCK_RE_SQL}'), 1) AS gs
    FROM fixture)
),
cl AS (
  SELECT doc_id, pos,
    trim(regexp_replace(regexp_replace(s, '<[^>]+>', ' ', 'g'),
                        '\\s+', ' ', 'g')) AS t,
    COALESCE(list_sum(list_transform(
      regexp_extract_all(s, '(?i)<a[^>]*>(.*?)</a>', 1),
      x -> length(x))), 0) AS lc
  FROM seg
),
ne AS (SELECT *, (length(t) >= 20 AND 1000 * lc <= 500 * length(t)) AS good
       FROM cl WHERE t != '')
SELECT doc_id,
  COALESCE(string_agg(CASE WHEN good THEN t END, chr(10) ORDER BY pos), '')
    AS main_text,
  COUNT(*)::BIGINT AS n_blocks,
  CAST(SUM(CASE WHEN good THEN 1 ELSE 0 END) AS BIGINT) AS n_good
FROM ne GROUP BY doc_id ORDER BY doc_id
"""


_ANCHOR_SET = ["click here", "read more", "details", "homepage", "see docs"]


def q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target anchor-text profiles over the formula link graph with
    deterministic anchor phrases ((src+dst)%5 picks one of five); the
    oracle replays the two-level count, top-k window and ordered join."""
    from . import graph
    from .linkgraph import anchor_texts

    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    e = graph.edges(spark, sf_dir, n)
    anchor = F.element_at(
        F.array(*[F.lit(a) for a in _ANCHOR_SET]),
        ((F.col("src") + F.col("dst")) % 5 + 1).cast("int"),
    )
    links = e.select("dst", anchor.alias("anchor"))
    return anchor_texts(links, top_k=2).orderBy("dst")


ORACLE_ANCHOR_TEXTS = f"""
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
e AS (
  SELECT d.doc_id AS src,
         CASE p.pos
           WHEN 0 THEN (2*d.doc_id + 1) % nn.c
           WHEN 1 THEN (2*d.doc_id + 2) % nn.c
           WHEN 2 THEN (5*d.doc_id + 3) % nn.c
           ELSE (d.doc_id + 17) % nn.c
         END AS dst
  FROM documents d CROSS JOIN nn
  CROSS JOIN (VALUES (0),(1),(2),(3)) AS p(pos)
),
a AS (
  SELECT dst,
    {str(_ANCHOR_SET).replace('"', "'")}[((src + dst) % 5 + 1)::INT] AS anchor
  FROM e
),
c AS (SELECT dst, anchor, COUNT(*) AS n FROM a GROUP BY dst, anchor),
v AS (SELECT dst, COUNT(*)::BIGINT AS n_anchor_variants FROM c GROUP BY dst),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY dst ORDER BY n DESC, anchor) AS rnk
  FROM c
),
t AS (
  SELECT dst, string_agg(anchor, ' | ' ORDER BY rnk) AS top_anchors
  FROM r WHERE rnk <= 2 GROUP BY dst
)
SELECT v.dst, v.n_anchor_variants, t.top_anchors
FROM v JOIN t USING (dst) ORDER BY dst
"""


def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-adaptive re-crawl scheduling over a synthesized fetch
    history (6 fetches per URL; content changes for the first doc%6
    fetches then freezes, so the unchanged streak varies 0..5 across the
    corpus); the oracle replays the change detection, streak, and
    bit-shift backoff."""
    from .politeness import recrawl_schedule

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    doc = F.col("doc_id")
    ks = spark.range(6).select(F.col("id").alias("k"))
    h = d.crossJoin(F.broadcast(ks)).select(
        F.concat(F.lit("https://h"), (doc % 7).cast("string"),
                 F.lit(".example.com/p/"), doc.cast("string")).alias("url"),
        (doc * 100000 + F.col("k") * 1000).alias("fetch_ts"),
        F.least(F.col("k"), doc % 6).cast("long").alias("content_hash"),
    )
    return recrawl_schedule(h).orderBy("url")


ORACLE_RECRAWL = """
WITH h AS (
  SELECT 'https://h' || (doc_id % 7) || '.example.com/p/' || doc_id AS url,
         doc_id * 100000 + k * 1000 AS ts,
         LEAST(k, doc_id % 6) AS ch
  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS k)
),
r AS (
  SELECT url, ts, ch,
         ROW_NUMBER() OVER (PARTITION BY url ORDER BY ts) AS rn,
         (ROW_NUMBER() OVER (PARTITION BY url ORDER BY ts) = 1
          OR ch != LAG(ch) OVER (PARTITION BY url ORDER BY ts)) AS changed
  FROM h
),
a AS (
  SELECT url, COUNT(*)::BIGINT AS n_fetches,
         CAST(SUM(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT)
           AS n_changes,
         MAX(ts) AS last_ts,
         MAX(CASE WHEN changed THEN rn END) AS last_chg
  FROM r GROUP BY url
)
SELECT url, n_fetches, n_changes,
       (n_fetches - last_chg)::BIGINT AS unchanged_streak,
       LEAST(CAST(2592000 AS BIGINT),
             CAST(3600 AS BIGINT)
               << LEAST(n_fetches - last_chg, 15)::INT)::BIGINT
         AS next_interval_s,
       (last_ts
        + LEAST(CAST(2592000 AS BIGINT),
                CAST(3600 AS BIGINT)
                  << LEAST(n_fetches - last_chg, 15)::INT))::BIGINT
         AS next_fetch_ts
FROM a ORDER BY url
"""


def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt TEXT parsing (crwlr/robots-txt package semantics, RFC
    9309 grouping): synthesized robots.txt bodies per host — comments,
    pre-group stray rules, consecutive-UA headers, case-insensitive
    directive names, empty Disallow, conditional Crawl-delay — parsed by
    robots.parse_robots_txt; the oracle reconstructs the expected rules
    directly from the generating arithmetic."""
    from .robots import parse_robots_txt

    hosts = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select((F.col("doc_id") % 40).alias("i"))
        .distinct()
    )
    i = F.col("i")
    s = i.cast("string")
    body = F.concat_ws(
        "\n",
        F.concat(F.lit("# robots for host "), s),
        F.lit("Disallow: /stray"),
        F.lit(""),
        F.lit("User-agent: *"),
        F.concat(F.lit("Disallow: /private/"), s, F.lit("/")),
        F.concat(F.lit("Allow: /private/"), s, F.lit("/ok  # inline comment")),
        F.when(i % 2 == 0, F.concat(F.lit("Crawl-delay: "),
                                    ((i % 5) + 1).cast("string"))),
        F.concat(F.lit("Sitemap: http://h"), s, F.lit(".example.com/s.xml")),
        F.lit(""),
        F.lit("User-agent: googlebot"),
        F.concat(F.lit("User-agent: bot-"), s),
        F.concat(F.lit("DISALLOW: /g"), s),
        F.lit("Disallow:"),
        F.when(i % 3 == 0, F.concat(F.lit("Allow: /g"), s, F.lit("/ok"))),
    )
    texts = hosts.select(
        F.concat(F.lit("h"), s, F.lit(".example.com")).alias("host"),
        body.alias("body"),
    )
    p = parse_robots_txt(texts)
    return p.select(
        "host",
        "user_agent",
        F.array_join("disallow_prefixes", "|").alias("dis_rules"),
        F.array_join("allow_prefixes", "|").alias("alw_rules"),
        F.array_join("sitemaps", "|").alias("sitemap_urls"),
        F.col("crawl_delay").cast("double").alias("crawl_delay_s"),
    ).orderBy("host", "user_agent")


ORACLE_ROBOTS_PARSE = """
WITH h AS (SELECT DISTINCT doc_id % 40 AS i FROM documents),
g AS (
  SELECT i, 'h' || i || '.example.com' AS host,
         '/private/' || i || '/' AS dis1, '/private/' || i || '/ok' AS alw1,
         CASE WHEN i % 2 = 0 THEN CAST((i % 5) + 1 AS DOUBLE) END AS delay1,
         '/g' || i AS dis2,
         CASE WHEN i % 3 = 0 THEN '/g' || i || '/ok' ELSE '' END AS alw2,
         'http://h' || i || '.example.com/s.xml' AS sm
  FROM h
)
SELECT host, '*' AS user_agent, dis1 AS dis_rules, alw1 AS alw_rules,
       sm AS sitemap_urls, delay1 AS crawl_delay_s FROM g
UNION ALL
SELECT host, 'googlebot', dis2, alw2, sm, NULL FROM g
UNION ALL
SELECT host, 'bot-' || i, dis2, alw2, sm, NULL FROM g
"""


def _sched_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frontier fixture for the scheduler queries: one URL per
    document, 13 hosts, integer priority/ts derived from doc_id."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    doc = F.col("doc_id")
    return d.select(
        F.concat(F.lit("https://h"), (doc % 13).cast("string"),
                 F.lit(".example.com/p/"), doc.cast("string")).alias("url"),
        F.concat(F.lit("h"), (doc % 13).cast("string")).alias("host"),
        ((doc * 7) % 100).cast("long").alias("priority"),
        (doc % 997).cast("long").alias("crawl_ts"),
    )


def q_host_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl-budget allocation: proportional integer split of a
    global fetch budget over host weights (backlog sizes here) with
    min/max clamps — floor division keeps it bit-exact."""
    from .scheduler import allocate_host_budgets

    stats = _sched_frontier(spark, sf_dir).groupBy("host").agg(
        F.count("*").alias("weight")
    )
    return allocate_host_budgets(
        stats, total_budget=400, min_budget=5, max_budget=60
    ).orderBy("host")


ORACLE_HOST_BUDGETS = """
WITH f AS (SELECT 'h' || (doc_id % 13) AS host FROM documents),
s AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS w FROM f GROUP BY host),
t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM s)
SELECT host,
       CAST(LEAST(GREATEST((400 * w) // tw, 5), 60) AS BIGINT) AS budget
FROM s, t ORDER BY host
"""


def q_frontier_wave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority wave selection — the distributed pop of the reference's
    sequential crawl loop (HttpCrawl.php:203-236): per-host rank by
    (priority DESC, ts, url), cut at the allocated host budget, then an
    exact global top-300 via the two-phase distributed rank (no
    single-partition window)."""
    from .scheduler import allocate_host_budgets, select_wave

    f = _sched_frontier(spark, sf_dir)
    budgets = allocate_host_budgets(
        f.groupBy("host").agg(F.count("*").alias("weight")),
        total_budget=400, min_budget=5, max_budget=60,
    )
    wave = select_wave(f, budgets=budgets, wave_size=300)
    return wave.select(
        "url", "host", "priority", "host_seq", "wave_rank"
    ).orderBy("wave_rank")


ORACLE_FRONTIER_WAVE = """
WITH f AS (
  SELECT 'https://h' || (doc_id % 13) || '.example.com/p/' || doc_id AS url,
         'h' || (doc_id % 13) AS host,
         CAST((doc_id * 7) % 100 AS BIGINT) AS priority,
         CAST(doc_id % 997 AS BIGINT) AS crawl_ts
  FROM documents
),
s AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS w FROM f GROUP BY host),
t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM s),
b AS (SELECT host, CAST(LEAST(GREATEST((400 * w) // tw, 5), 60) AS BIGINT)
        AS budget FROM s, t),
h AS (
  SELECT f.*, CAST(ROW_NUMBER() OVER (
           PARTITION BY host ORDER BY priority DESC, crawl_ts, url
         ) AS BIGINT) AS host_seq
  FROM f
),
c AS (SELECT h.* FROM h JOIN b USING (host) WHERE host_seq <= budget)
SELECT url, host, priority, host_seq,
       CAST(ROW_NUMBER() OVER (ORDER BY priority DESC, crawl_ts, url)
            AS BIGINT) AS wave_rank
FROM c
QUALIFY wave_rank <= 300
"""


def q_url_traps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spider-trap detection by URL template mining: every 4th doc is a
    calendar-trap URL on one host (all collapsing to one template =
    1000 permille of that host), the rest spread over 3 hosts x 17
    letter-keyed sections (~59 permille per template).  The oracle
    replays the template collapse (regexp chain) and the integer
    cross-multiplied share rule."""
    from .scheduler import detect_url_traps

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    doc = F.col("doc_id")
    sec = F.substring(F.lit("abcdefghijklmnopq"), (doc % 17).cast("int") + 1, 1)
    f = d.select(
        F.when(doc % 4 == 0, F.lit("trap.example.com"))
        .otherwise(F.concat(F.lit("h"), (doc % 3).cast("string"))).alias("host"),
        F.when(
            doc % 4 == 0,
            F.concat(F.lit("https://trap.example.com/cal?y=2026&m="),
                     (doc % 12).cast("string"), F.lit("&d="),
                     (doc % 28).cast("string")),
        ).otherwise(
            F.concat(F.lit("https://h"), (doc % 3).cast("string"),
                     F.lit(".example.com/"), sec, F.lit("/p/"),
                     doc.cast("string"))
        ).alias("url"),
    )
    return detect_url_traps(f, min_host_urls=100).orderBy("host", "template")


ORACLE_URL_TRAPS = """
WITH f AS (
  SELECT CASE WHEN doc_id % 4 = 0 THEN 'trap.example.com'
              ELSE 'h' || (doc_id % 3) END AS host,
         CASE WHEN doc_id % 4 = 0
              THEN 'https://trap.example.com/cal?y=2026&m=' || (doc_id % 12)
                   || '&d=' || (doc_id % 28)
              ELSE 'https://h' || (doc_id % 3) || '.example.com/'
                   || substr('abcdefghijklmnopq', CAST(doc_id % 17 AS INT) + 1, 1)
                   || '/p/' || doc_id END AS url
  FROM documents
),
t AS (
  SELECT host,
         regexp_replace(regexp_replace(regexp_replace(
             url, '[0-9a-f]{10,}', 'H', 'g'),
             '[0-9]+', 'N', 'g'),
             '=[^&#=?]+', '=V', 'g') AS template
  FROM f
),
a AS (SELECT host, template, CAST(COUNT(*) AS BIGINT) AS n_urls
      FROM t GROUP BY host, template),
h AS (SELECT host, CAST(SUM(n_urls) AS BIGINT) AS host_urls
      FROM a GROUP BY host)
SELECT a.host, template, n_urls, host_urls,
       (host_urls >= 100 AND (n_urls > 10000
        OR n_urls * 1000 > host_urls * 500)) AS trap
FROM a JOIN h USING (host)
ORDER BY host, template
"""


def q_refresh_wave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed incremental-crawl scheduling: fetch history →
    recrawl_schedule (change-streak backoff) → due set at time T →
    allocate_host_budgets over the due backlog → select_wave (priority =
    observed change count, host-budget cut, global top-150).  The oracle
    replays the whole chain in SQL."""
    from .politeness import recrawl_schedule
    from .scheduler import allocate_host_budgets, select_wave

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    doc = F.col("doc_id")
    ks = spark.range(6).select(F.col("id").alias("k"))
    h = d.crossJoin(F.broadcast(ks)).select(
        F.concat(F.lit("https://h"), (doc % 7).cast("string"),
                 F.lit(".example.com/p/"), doc.cast("string")).alias("url"),
        (F.col("k") * 1000).alias("fetch_ts"),
        F.least(F.col("k"), doc % 6).cast("long").alias("content_hash"),
    )
    sched = recrawl_schedule(h)
    t_now = 5000 + 57600  # due iff unchanged_streak <= 4
    due = sched.filter(F.col("next_fetch_ts") <= t_now).select(
        "url",
        F.substring_index(F.substring_index("url", "/", 3), "/", -1)
        .alias("host"),
        F.col("n_changes").alias("priority"),
        F.col("next_fetch_ts").alias("crawl_ts"),
    )
    budgets = allocate_host_budgets(
        due.groupBy("host").agg(F.count("*").alias("weight")),
        total_budget=200, min_budget=5, max_budget=40,
    )
    wave = select_wave(due, budgets=budgets, wave_size=150)
    return wave.select(
        "url", "host", "priority", "crawl_ts", "host_seq", "wave_rank"
    ).orderBy("wave_rank")


ORACLE_REFRESH_WAVE = """
WITH hist AS (
  SELECT 'https://h' || (doc_id % 7) || '.example.com/p/' || doc_id AS url,
         'h' || (doc_id % 7) || '.example.com' AS host,
         k * 1000 AS ts, LEAST(k, doc_id % 6) AS ch
  FROM documents CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS k)
),
r AS (
  SELECT url, host, ts, ch,
         ROW_NUMBER() OVER (PARTITION BY url ORDER BY ts) AS rn,
         (ROW_NUMBER() OVER (PARTITION BY url ORDER BY ts) = 1
          OR ch != LAG(ch) OVER (PARTITION BY url ORDER BY ts)) AS changed
  FROM hist
),
a AS (
  SELECT url, ANY_VALUE(host) AS host, COUNT(*)::BIGINT AS n_fetches,
         CAST(SUM(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         MAX(ts) AS last_ts, MAX(CASE WHEN changed THEN rn END) AS last_chg
  FROM r GROUP BY url
),
due AS (
  SELECT url, host, n_changes AS priority,
         (last_ts + LEAST(CAST(2592000 AS BIGINT),
            CAST(3600 AS BIGINT)
              << LEAST(n_fetches - last_chg, 15)::INT))::BIGINT AS crawl_ts
  FROM a
  WHERE (last_ts + LEAST(CAST(2592000 AS BIGINT),
           CAST(3600 AS BIGINT)
             << LEAST(n_fetches - last_chg, 15)::INT)) <= 62600
),
s AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS w FROM due GROUP BY host),
t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM s),
b AS (SELECT host, CAST(LEAST(GREATEST((200 * w) // tw, 5), 40) AS BIGINT)
        AS budget FROM s, t),
hs AS (
  SELECT due.*, CAST(ROW_NUMBER() OVER (
           PARTITION BY host ORDER BY priority DESC, crawl_ts, url
         ) AS BIGINT) AS host_seq
  FROM due
),
c AS (SELECT hs.* FROM hs JOIN b USING (host) WHERE host_seq <= budget)
SELECT url, host, priority, crawl_ts, host_seq,
       CAST(ROW_NUMBER() OVER (ORDER BY priority DESC, crawl_ts, url)
            AS BIGINT) AS wave_rank
FROM c
QUALIFY wave_rank <= 150
"""


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training over the corpus vocabulary (8 merges).
    The merge sequence is data-dependent (each round's argmax feeds the
    next round's plan) so there is no static SQL replay — rows-only gate
    entry; the differential gate vs the textbook pure-Python BPE is
    tests/test_bpe.py."""
    from .textops.bpe import bpe_train_df

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    return bpe_train_df(d, n_merges=8)


def q_dom_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dom step driven by XPATH selectors (reference Html/XPathQuery.php;
    Dom::xPath — HtmlTest.php:58-77): child step ``/li`` excludes the
    section-nested item, ``contains(@class,...)`` matches the multi-class
    attribute, and the ``@href`` target splits correctly despite the ``@``
    inside the predicate.  Same engine as the CSS path (cssq), same
    Arrow-batched pandas_udf plan."""
    from .crawler import Dom

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    doc = F.col("doc_id")
    item = lambda v, cls: F.concat(  # noqa: E731
        F.lit(f'<li class="{cls}"><span class="name">n'), v.cast("string"),
        F.lit('</span><a class="lnk" href="/d/'), v.cast("string"),
        F.lit('">x</a></li>'),
    )
    body = F.concat(
        F.lit('<html><body><div id="list">'),
        item(doc * 3 + 1, "item first"),
        F.lit("<section>"), item(doc * 7 + 3, "item deep"), F.lit("</section>"),
        item(doc * 5 + 2, "item"),
        F.lit("</div></body></html>"),
    )
    io = d.select(
        doc.alias("_input_id"),
        doc.alias("_ord"),
        F.struct(
            F.lit("http://x.test/").alias("url"),
            F.lit(200).alias("status"),
            body.alias("body"),
        ).alias("value"),
    )
    step = Dom(each="//div[@id='list']/li[contains(@class, 'item')]").extract(
        {"name": "//span[@class='name']", "link": "//a[@class='lnk'] @href"}
    )
    return step.apply(io).select(
        F.col("_input_id").alias("doc_id"),
        (F.col("_ord") % 1000).cast("int").alias("pos"),
        F.col("value.name").alias("name"),
        F.col("value.link").alias("link"),
    )


ORACLE_DOM_XPATH = """
SELECT doc_id, CAST(0 AS INTEGER) AS pos,
       'n' || CAST(doc_id * 3 + 1 AS VARCHAR) AS name,
       '/d/' || CAST(doc_id * 3 + 1 AS VARCHAR) AS link
FROM documents
UNION ALL
SELECT doc_id, CAST(1 AS INTEGER) AS pos,
       'n' || CAST(doc_id * 5 + 2 AS VARCHAR) AS name,
       '/d/' || CAST(doc_id * 5 + 2 AS VARCHAR) AS link
FROM documents
"""


def q_caption_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score-style alignment filter (mmcurate.caption_alignment) over
    an input_hint-shaped pair table: image tower = stored phash bits, text
    tower = SimHash-style hashed caption bag-of-tokens, keep rule by
    integer cross-multiplication at the LAION 0.28 threshold.  The gate
    fixture derives phash arithmetically from doc_id (md5-based, so DuckDB
    replays the WHOLE chain value-exactly); the codec-path composition
    (real pixel-derived phash) is pytest-verified against a pure-Python
    twin in tests/test_mmcurate.py."""
    from . import images as _images
    from . import mmcurate as _mm
    from .textops.dedup import base_hash

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    doc_s = F.col("doc_id").cast("string")
    h1 = base_hash(F.concat(F.lit("ph1:"), doc_s)) % F.lit(2147483648)
    h2 = base_hash(F.concat(F.lit("ph2:"), doc_s))
    pairs = docs.select(
        F.concat(F.lit("img-"), doc_s).alias("image_id"),
        _images.ref_caption_col(F.col("text")).alias("caption"),
        (h1 * F.lit(4294967296) + h2).cast("long").alias("phash"),
    )
    return _mm.caption_alignment(pairs)


def _caption_alignment_oracle() -> str:
    from .suite2 import _ORACLE_CAPTION_SQL

    bh = BASE_HASH_SQL
    sign = f"(CASE WHEN (({bh.format(x='t')} >> 6) & 1) = 1 THEN 1 ELSE -1 END)"
    img_bit = (
        f"(CASE WHEN ((phash >> ({bh.format(x='t')} % 64)) & 1) = 1 "
        "THEN 1 ELSE -1 END)"
    )
    ph1 = bh.format(x="'ph1:' || CAST(doc_id AS VARCHAR)")
    ph2 = bh.format(x="'ph2:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH pairs AS (
  SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
         {_ORACLE_CAPTION_SQL} AS caption,
         ({ph1} % 2147483648) * 4294967296 + {ph2} AS phash
  FROM documents
),
tok AS (
  SELECT image_id, phash,
         list_filter(str_split(caption, ' '), x -> x <> '') AS toks
  FROM pairs
),
scored AS (
  SELECT image_id,
         CAST(len(toks) AS BIGINT) AS n_cap_tokens,
         CAST(COALESCE(list_sum(list_transform(toks,
              t -> {sign} * {img_bit})), 0) AS BIGINT) AS align_dot
  FROM tok
)
SELECT image_id, n_cap_tokens, align_dot,
       (n_cap_tokens > 0 AND 1000 * align_dot >= 280 * n_cap_tokens) AS keep
FROM scored
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank (3 power iterations, d=0.85) over the
    formula link graph — the frontier-prioritization / quality-weighting
    rank; the oracle unrolls the same iterations as chained CTEs."""
    from .linkgraph import pagerank

    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    return pagerank(spark, n, iters=3).orderBy("doc")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "warc_parse": q_warc_parse,
        "warc_cdx": q_warc_cdx,
        "shard_assign": q_shard_assign,
        "image_patchify": q_image_patchify,
        "c4_clean": q_c4_clean,
        "gopher_rules": q_gopher_rules,
        "pagerank": q_pagerank,
        "caption_alignment": q_caption_alignment,
        "dom_xpath": q_dom_xpath,
        "bpe_merges": q_bpe_merges,
        "dsir_weights": q_dsir_weights,
        "bm25_top_terms": q_bm25_top_terms,
        "main_content": q_main_content,
        "anchor_texts": q_anchor_texts,
        "recrawl_schedule": q_recrawl_schedule,
        "robots_parse": q_robots_parse,
        "host_budgets": q_host_budgets,
        "frontier_wave_select": q_frontier_wave,
        "url_traps": q_url_traps,
        "refresh_wave": q_refresh_wave,
    }


def oracle_sql() -> dict[str, str]:
    # image_patchify and bpe_merges are intentionally absent: fake-codec
    # pixels / data-dependent merge sequences are not SQL-expressible, so
    # the driver records the rows-only check for those two
    return {
        "warc_parse": ORACLE_WARC_PARSE,
        "warc_cdx": ORACLE_WARC_CDX,
        "shard_assign": ORACLE_SHARD_ASSIGN,
        "c4_clean": ORACLE_C4_CLEAN,
        "gopher_rules": ORACLE_GOPHER_RULES,
        "pagerank": _pagerank_oracle(),
        "caption_alignment": _caption_alignment_oracle(),
        "dom_xpath": ORACLE_DOM_XPATH,
        "dsir_weights": ORACLE_DSIR,
        "bm25_top_terms": ORACLE_BM25,
        "main_content": ORACLE_MAIN_CONTENT,
        "anchor_texts": ORACLE_ANCHOR_TEXTS,
        "recrawl_schedule": ORACLE_RECRAWL,
        "robots_parse": ORACLE_ROBOTS_PARSE,
        "host_budgets": ORACLE_HOST_BUDGETS,
        "frontier_wave_select": ORACLE_FRONTIER_WAVE,
        "url_traps": ORACLE_URL_TRAPS,
        "refresh_wave": ORACLE_REFRESH_WAVE,
    }


def _pagerank_oracle() -> str:
    from .linkgraph import pagerank_oracle_sql

    return pagerank_oracle_sql(iters=3)
