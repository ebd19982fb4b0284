"""Deterministic synthetic web graph, derived from the ``documents`` table.

The crawl engine needs a web to crawl; the correctness gate needs a DuckDB
oracle over the SAME parquet inputs.  So the graph is a pure function of
``documents.doc_id`` expressible in both Spark DataFrame ops and ANSI SQL:

- page for doc ``i``:  ``http://h{i % NHOSTS}.example.test/d/{i}``
  (robots-blocked pages use path prefix ``/x/`` instead of ``/d/``)
- out-links of ``i`` (document order, n = count(documents)):
    pos 0 -> (2*i + 1) % n
    pos 1 -> (2*i + 2) % n          (binary-tree spine: full reachability)
    pos 2 -> (5*i + 3) % n
    pos 3 -> (i + 17)  % n
- robots: per-host ``Disallow: /x/``; a page is blocked iff
  ``i % BLOCKED_MOD == BLOCKED_RESIDUE``.
- simulated fetch latency: ``LATENCY_BASE_MS + (i * 37) % LATENCY_SPREAD_MS``
  (drives the politeness schedule).

This mirrors what the reference computes per fetched page — extract links in
document order, same-domain filter, robots gate (reference:
src/Steps/Loading/HttpCrawl.php:242-331, src/Loader/Http/Politeness/
RobotsTxtHandler.php:43-97) — with the fetch replaced by a deterministic
corpus, as the reference's own tests do with a fixture server
(reference: tests/_Integration/_Server/Crawling.php).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

NHOSTS = 10
OUT_DEGREE = 4
BLOCKED_MOD = 23
BLOCKED_RESIDUE = 11
LATENCY_BASE_MS = 100
LATENCY_SPREAD_MS = 900
# rank key = parent_ord * ORD_STRIDE + link_pos; stride must exceed OUT_DEGREE
ORD_STRIDE = 8

DOMAIN = "example.test"


def host_id_col(doc: Column) -> Column:
    return (doc % NHOSTS).cast("long")


def blocked_col(doc: Column) -> Column:
    return (doc % BLOCKED_MOD) == BLOCKED_RESIDUE


def url_col(doc: Column) -> Column:
    """URL string for a doc id — identical to oracle's URL expression."""
    path_seg = F.when(blocked_col(doc), F.lit("/x/")).otherwise(F.lit("/d/"))
    return F.concat(
        F.lit("http://h"),
        host_id_col(doc).cast("string"),
        F.lit("." + DOMAIN),
        path_seg,
        doc.cast("string"),
    )


def latency_ms_col(doc: Column) -> Column:
    return (F.lit(LATENCY_BASE_MS) + (doc * 37) % LATENCY_SPREAD_MS).cast("long")


def pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic page corpus: one row per document.

    Columns: doc, host_id, host, url, blocked, latency_ms.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    doc = F.col("doc_id")
    return docs.select(
        doc.alias("doc"),
        host_id_col(doc).alias("host_id"),
        F.concat(F.lit("h"), host_id_col(doc).cast("string"), F.lit("." + DOMAIN)).alias(
            "host"
        ),
        url_col(doc).alias("url"),
        blocked_col(doc).alias("blocked"),
        latency_ms_col(doc).alias("latency_ms"),
    )


def edges_from(docs: DataFrame, n: int) -> DataFrame:
    """Out-links (src, pos, dst) for a doc-id DataFrame with column ``src``."""
    spark = docs.sparkSession
    pos = spark.range(OUT_DEGREE).select(F.col("id").cast("int").alias("pos"))
    src = F.col("src")
    dst = (
        F.when(F.col("pos") == 0, (2 * src + 1) % n)
        .when(F.col("pos") == 1, (2 * src + 2) % n)
        .when(F.col("pos") == 2, (5 * src + 3) % n)
        .otherwise((src + 17) % n)
    )
    # positions table is tiny -> broadcast; the join is a narrow fan-out, no shuffle
    return docs.crossJoin(F.broadcast(pos)).select(src, F.col("pos"), dst.alias("dst"))


def edges(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """Out-links over the documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("src")
    )
    return edges_from(docs, n)


def virtual_docs(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """A deterministic n-doc id space for scale benchmarks (no parquet read;
    same graph formulas apply)."""
    parts = partitions or spark.sparkContext.defaultParallelism
    return spark.range(0, n, 1, parts).select(F.col("id").alias("src"))


# --------------------------------------------------------------------------
# DuckDB oracle: the same BFS, unrolled into chained CTEs (one per level) so
# per-level window functions are legal (recursive CTEs restrict them).
# --------------------------------------------------------------------------

_URL_SQL = (
    "'http://h' || CAST(doc % {nh} AS VARCHAR) || '.{dom}' || "
    "(CASE WHEN doc % {bm} = {br} THEN '/x/' ELSE '/d/' END) || CAST(doc AS VARCHAR)"
).format(nh=NHOSTS, dom=DOMAIN, bm=BLOCKED_MOD, br=BLOCKED_RESIDUE)

_HOST_SQL = "'h' || CAST(doc % {nh} AS VARCHAR) || '.{dom}'".format(nh=NHOSTS, dom=DOMAIN)


def bfs_oracle_sql(max_depth: int, seed_doc: int = 0) -> str:
    """ANSI-SQL oracle for crawl_bfs: unrolled level-synchronous BFS with
    first-discovery ordering, robots gate, and exact seen-set semantics."""
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS c FROM documents),",
        "edges AS (",
        "  SELECT d.doc_id AS src, p.pos,",
        "         CASE p.pos",
        "           WHEN 0 THEN (2*d.doc_id + 1) % nn.c",
        "           WHEN 1 THEN (2*d.doc_id + 2) % nn.c",
        "           WHEN 2 THEN (5*d.doc_id + 3) % nn.c",
        "           ELSE (d.doc_id + 17) % nn.c",
        "         END AS dst",
        "  FROM documents d CROSS JOIN nn",
        "  CROSS JOIN (VALUES (0),(1),(2),(3)) AS p(pos)",
        "),",
        f"l0 AS (SELECT CAST({seed_doc} AS BIGINT) AS doc,"
        " CAST(0 AS BIGINT) AS depth, CAST(1 AS BIGINT) AS ord),",
        "s0 AS (SELECT doc FROM l0),",
        "m0 AS (SELECT MAX(ord) AS mx FROM l0),",
    ]
    for d in range(1, max_depth + 1):
        p = d - 1
        parts += [
            f"c{d} AS (",
            f"  SELECT e.dst AS doc, MIN(l.ord * {ORD_STRIDE} + e.pos) AS rk",
            f"  FROM l{p} l JOIN edges e ON e.src = l.doc",
            f"  WHERE e.dst NOT IN (SELECT doc FROM s{p})",
            f"    AND e.dst % {BLOCKED_MOD} <> {BLOCKED_RESIDUE}",
            "  GROUP BY e.dst",
            "),",
            f"l{d} AS (SELECT doc, CAST({d} AS BIGINT) AS depth,",
            f"  CAST((SELECT mx FROM m{p}) + ROW_NUMBER() OVER (ORDER BY rk) AS BIGINT) AS ord",
            f"  FROM c{d}),",
            f"s{d} AS (SELECT doc FROM s{p} UNION ALL SELECT doc FROM l{d}),",
            f"m{d} AS (SELECT COALESCE(MAX(ord), (SELECT mx FROM m{p})) AS mx FROM l{d}),",
        ]
    union = " UNION ALL ".join(f"SELECT * FROM l{d}" for d in range(max_depth + 1))
    parts += [
        f"lv AS ({union})",
        f"SELECT {_URL_SQL} AS url, {_HOST_SQL} AS host, depth, ord",
        "FROM lv ORDER BY ord",
    ]
    return "\n".join(parts)
