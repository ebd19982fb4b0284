"""Round-3 queries, part 11: positional HTML table extraction, shared
n-gram span dedup evidence, Yandex Host directive, PNG IHDR legality.
"""

from __future__ import annotations

import struct
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# html_table
# --------------------------------------------------------------------------

def q_html_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.html_tables over pages with doc%3 planted 2x2 tables
    (mixed td/th, a nested <b> to strip, padding whitespace); the
    oracle regenerates the expected positional cell rows
    arithmetically — tableless docs emit nothing."""
    from .extract import html_tables

    doc = F.col("doc_id")
    n = doc % 3

    def cell(ri: int, ci: int, ti) -> F.Column:
        return F.concat(F.lit(f"r{ri}c{ci}-"), doc.cast("string"),
                        F.lit("-"), ti.cast("string"))

    table = lambda ti: F.concat(
        F.lit('<table class="x"><tr><td>'), cell(0, 0, ti),
        F.lit("</td><td><b>"), cell(0, 1, ti),
        F.lit("</b></td></tr><tr><th>"), cell(1, 0, ti),
        F.lit("</th><td>  "), cell(1, 1, ti),
        F.lit("  </td></tr></table>"),
    )
    body = F.concat(
        F.lit("<html><p>no cells here</p>"),
        F.array_join(
            # sequence(1, 0) is the DESCENDING [1, 0] — guard n == 0
            F.transform(
                F.when(n > 0, F.sequence(F.lit(1), n))
                .otherwise(F.array().cast("array<bigint>")),
                lambda i: table(i - 1)),
            ""),
        F.lit("</html>"),
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                    body.alias("body"))
    return (
        d.select("doc_id", F.explode(html_tables(F.col("body")))
                 .alias("c"))
        .select("doc_id", "c.table_ord", "c.row_ord", "c.col_ord",
                "c.cell")
        .orderBy("doc_id", "table_ord", "row_ord", "col_ord")
    )


ORACLE_HTML_TABLE = """
SELECT d.doc_id,
       CAST(t.ti AS INTEGER) AS table_ord,
       CAST(r.ri AS INTEGER) AS row_ord,
       CAST(c.ci AS INTEGER) AS col_ord,
       'r' || r.ri || 'c' || c.ci || '-' || d.doc_id || '-' || t.ti AS cell
FROM documents d
JOIN generate_series(0, 2) t(ti) ON t.ti < d.doc_id % 3
CROSS JOIN generate_series(0, 1) r(ri)
CROSS JOIN generate_series(0, 1) c(ci)
ORDER BY d.doc_id, table_ord, row_ord, col_ord
"""


# --------------------------------------------------------------------------
# ngram_span
# --------------------------------------------------------------------------

def q_ngram_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.dedup.ngram_span_overlap on adjacent pairs (doc, doc+1)
    for doc%10==0, each planted with a shared 20-word passage between
    unique prefixes/suffixes: exactly 8 consecutive 13-grams match on
    one diagonal, so (n_matches, n_distinct_grams, longest_run) =
    (8, 8, 8) for every pair — a closed-form oracle independent of
    the operator's join/islands machinery."""
    from .textops.dedup import ngram_span_overlap

    doc = F.col("doc_id")
    grp = F.expr("doc_id div 10").cast("string")
    ds = doc.cast("string")
    shared = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(19)),
                    lambda j: F.concat(F.lit("s"), j.cast("string"),
                                       F.lit("g"), grp)),
        " ")
    text = F.concat(
        F.lit("a"), ds, F.lit(" b"), ds, F.lit(" c"), ds, F.lit(" "),
        shared,
        F.lit(" x"), ds, F.lit(" y"), ds, F.lit(" z"), ds,
    )
    docs = _docs(spark, sf_dir).select(doc.alias("doc_id"),
                                       text.alias("text"))
    a = docs.select(F.col("doc_id").alias("id_a"))
    b = docs.select(F.col("doc_id").alias("id_b"))
    pairs = (a.filter(F.col("id_a") % 10 == 0)
             .join(b, F.col("id_b") == F.col("id_a") + 1))
    return ngram_span_overlap(docs, pairs, n=13).orderBy("id_a")


ORACLE_NGRAM_SPAN = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(8 AS BIGINT) AS n_matches,
       CAST(8 AS BIGINT) AS n_distinct_grams,
       CAST(8 AS BIGINT) AS longest_run
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
WHERE a.doc_id % 10 = 0
ORDER BY id_a
"""


# --------------------------------------------------------------------------
# host_directive
# --------------------------------------------------------------------------

def q_host_directive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.parse_host_directive over 12 host robots bodies: self,
    differing mirror, scheme+port form, invalid (embedded space),
    absent, and multiple-first-wins; the oracle lists the expected
    canonical per case (invalid/absent hosts emit no row)."""
    from .robots import parse_host_directive

    doc = F.col("doc_id")
    k = doc % 12
    me = F.concat(F.lit("r"), k.cast("string"), F.lit(".com"))
    body = (
        F.when(k % 6 == 0, F.concat(F.lit("User-agent: *\nHost: "), me,
                                    F.lit("\n")))
        .when(k % 6 == 1, F.lit("Host: canonical.example\n"))
        .when(k % 6 == 2, F.concat(F.lit("host: HTTPS://MAIN"),
                                   k.cast("string"),
                                   F.lit(".COM:8080\nDisallow: /x\n")))
        .when(k % 6 == 3, F.lit("Host: bad value.com\n"))
        .when(k % 6 == 4, F.lit("User-agent: *\nDisallow: /\n"))
        .otherwise(F.concat(F.lit("Host: first"), k.cast("string"),
                            F.lit(".net\nHost: second.net\n")))
    )
    robots = _docs(spark, sf_dir).filter(doc < 12).select(
        me.alias("host"), body.alias("body"))
    return parse_host_directive(robots).orderBy("host")


ORACLE_HOST_DIRECTIVE = """
WITH r AS (
  SELECT doc_id % 12 AS k, 'r' || (doc_id % 12) || '.com' AS host
  FROM documents WHERE doc_id < 12
)
SELECT host,
       CASE k % 6
         WHEN 0 THEN host
         WHEN 1 THEN 'canonical.example'
         WHEN 2 THEN 'main' || k || '.com'
         ELSE 'first' || k || '.net'
       END AS canonical_host,
       CASE k % 6 WHEN 0 THEN FALSE ELSE TRUE END AS differs
FROM r
WHERE k % 6 IN (0, 1, 2, 5)
ORDER BY host
"""


# --------------------------------------------------------------------------
# png_ihdr
# --------------------------------------------------------------------------

def _ihdr_png(w: int, h: int, depth: int, color: int,
              interlace: int) -> str:
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                          interlace) + b"\x00" * 4).hex()


def q_png_ihdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.png_ihdr_validity over planted headers: legal truecolor
    8-bit, palette at an illegal 16-bit depth, illegal interlace 2,
    zero width, legal interlaced grayscale 4-bit, and a non-PNG; the
    oracle states the spec-table verdicts."""
    from .images import png_ihdr_validity

    doc = F.col("doc_id")
    m = doc % 6
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_ihdr_png(16, 16, 8, 2, 0)))
        .when(m == 2, F.lit(_ihdr_png(16, 16, 16, 3, 0)))
        .when(m == 3, F.lit(_ihdr_png(16, 16, 8, 2, 2)))
        .when(m == 4, F.lit(_ihdr_png(0, 16, 8, 2, 0)))
        .otherwise(F.lit(_ihdr_png(16, 16, 4, 0, 1)))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    # nullable boolean columns hash differently in the driver compare
    # (repo gotcha, cf. png_color_profile) -> emit 0/1 int
    return png_ihdr_validity(imgs).select(
        "doc_id", "ihdr_w", "ihdr_h", "ihdr_depth", "ihdr_color",
        "ihdr_interlace",
        F.col("ihdr_valid").cast("int").alias("ihdr_valid"),
    ).orderBy("doc_id")


ORACLE_PNG_IHDR = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 6 = 0 THEN NULL
                 WHEN doc_id % 6 = 4 THEN 0 ELSE 16 END AS BIGINT)
         AS ihdr_w,
       CAST(CASE WHEN doc_id % 6 = 0 THEN NULL ELSE 16 END AS BIGINT)
         AS ihdr_h,
       CAST(CASE doc_id % 6 WHEN 0 THEN NULL WHEN 2 THEN 16 WHEN 5 THEN 4
                 ELSE 8 END AS BIGINT) AS ihdr_depth,
       CAST(CASE doc_id % 6 WHEN 0 THEN NULL WHEN 2 THEN 3 WHEN 5 THEN 0
                 ELSE 2 END AS BIGINT) AS ihdr_color,
       CAST(CASE doc_id % 6 WHEN 0 THEN NULL WHEN 3 THEN 2 WHEN 5 THEN 1
                 ELSE 0 END AS BIGINT) AS ihdr_interlace,
       CAST(CASE WHEN doc_id % 6 = 0 THEN NULL
                 WHEN doc_id % 6 IN (1, 5) THEN 1 ELSE 0 END AS INTEGER)
         AS ihdr_valid
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "html_table": q_html_table,
        "ngram_span": q_ngram_span,
        "host_directive": q_host_directive,
        "png_ihdr": q_png_ihdr,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "html_table": ORACLE_HTML_TABLE,
        "ngram_span": ORACLE_NGRAM_SPAN,
        "host_directive": ORACLE_HOST_DIRECTIVE,
        "png_ihdr": ORACLE_PNG_IHDR,
    }
