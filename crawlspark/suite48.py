"""Round-3 queries, part 19: table-layout economics.

- zone_prune: zone-map scan-pruning evaluation — the same probe
  workload against x-sort and z-order layouts' file stats, scored as
  files-actually-scanned permille.
- cow_mor: copy-on-write vs merge-on-read maintenance costs for an
  update batch against per-file key ranges.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import cow_mor_plan, xsort_layout, zone_map_prune, zorder_layout

_ROWS_PER_FILE = 50
_BITS = 6
_SLAB = 8


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = F.col("doc_id")
    return _docs(spark, sf_dir).select(
        (doc % 64).alias("xb"),
        (F.expr("doc_id div 64") % 64).alias("yb"),
    )


def _probes(spark: SparkSession) -> DataFrame:
    rows = []
    for i in range(8):
        rows.append((i, _SLAB * i, _SLAB * i + _SLAB - 1, 0, 63))
        rows.append((8 + i, 0, 63, _SLAB * i, _SLAB * i + _SLAB - 1))
    return spark.createDataFrame(
        rows, "probe_id long, x_lo long, x_hi long, y_lo long, y_hi long"
    )


def q_zone_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sinks.zone_map_prune: 16 slab probes (8 x-slabs, 8 y-slabs)
    against the file stats of an x-sort layout and a z-order layout of
    the same (doc%64, doc div 64 % 64) points.  x-sort prunes x-slabs
    and reads everything for y-slabs; z-order prunes both — the oracle
    replays both layouts' boxes and the intersection counting."""
    pts = _pts(spark, sf_dir)
    probes = _probes(spark)
    xs = zone_map_prune(
        xsort_layout(pts, "xb", "yb", _ROWS_PER_FILE), probes, "xsort")
    zo = zone_map_prune(
        zorder_layout(pts, "xb", "yb", _ROWS_PER_FILE, bits=_BITS),
        probes, "zorder")
    return xs.unionAll(zo).orderBy("layout")


def _z_sql(x: str, y: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_PROBES_SQL = ", ".join(
    f"({i}, {_SLAB * i}, {_SLAB * i + _SLAB - 1}, 0, 63)" for i in range(8)
) + ", " + ", ".join(
    f"({8 + i}, 0, 63, {_SLAB * i}, {_SLAB * i + _SLAB - 1})"
    for i in range(8)
)

ORACLE_ZONE_PRUNE = f"""
WITH pts AS (
  SELECT CAST(doc_id % 64 AS BIGINT) AS x,
         CAST((doc_id // 64) % 64 AS BIGINT) AS y
  FROM documents
),
probes(probe_id, x_lo, x_hi, y_lo, y_hi) AS (VALUES {_PROBES_SQL}),
xf AS (
  SELECT (ROW_NUMBER() OVER (ORDER BY x, y) - 1) // {_ROWS_PER_FILE}
           AS file_id, x, y
  FROM pts
),
xstats AS (
  SELECT file_id, MIN(x) AS x_min, MAX(x) AS x_max,
         MIN(y) AS y_min, MAX(y) AS y_max
  FROM xf GROUP BY file_id
),
zf AS (
  SELECT (ROW_NUMBER() OVER (
            ORDER BY {_z_sql('x', 'y', _BITS)}, x, y) - 1)
           // {_ROWS_PER_FILE} AS file_id, x, y
  FROM pts
),
zstats AS (
  SELECT file_id, MIN(x) AS x_min, MAX(x) AS x_max,
         MIN(y) AS y_min, MAX(y) AS y_max
  FROM zf GROUP BY file_id
),
xs AS (
  SELECT 'xsort' AS layout,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM xstats) AS n_files,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM probes) AS n_probes,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM xstats f JOIN probes p
            ON f.x_min <= p.x_hi AND f.x_max >= p.x_lo
           AND f.y_min <= p.y_hi AND f.y_max >= p.y_lo) AS file_scans
),
zs AS (
  SELECT 'zorder' AS layout,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM zstats) AS n_files,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM probes) AS n_probes,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM zstats f JOIN probes p
            ON f.x_min <= p.x_hi AND f.x_max >= p.x_lo
           AND f.y_min <= p.y_hi AND f.y_max >= p.y_lo) AS file_scans
)
SELECT layout, n_files, n_probes, file_scans,
       (1000 * file_scans) // (n_files * n_probes) AS scan_permille
FROM (SELECT * FROM xs UNION ALL SELECT * FROM zs)
ORDER BY layout
"""


def q_cow_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sinks.cow_mor_plan: the table laid out by doc_id into 50-row
    files, update batch = every 37th doc_id.  Scattered sparse updates
    touch most files, so CoW rewrites nearly the whole table for ~3%
    of its rows — the read-out that says 'use MoR + periodic
    compaction' here.  The oracle replays file ranges, the range join,
    and both cost rollups."""
    docs = _docs(spark, sf_dir)
    stats = xsort_layout(
        docs.select(F.col("doc_id").alias("x"), F.lit(0).alias("y")),
        "x", "y", _ROWS_PER_FILE,
    )
    updates = docs.filter(F.col("doc_id") % 37 == 0).select(
        F.col("doc_id").alias("key"))
    return cow_mor_plan(stats, updates)


ORACLE_COW_MOR = f"""
WITH f AS (
  SELECT (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // {_ROWS_PER_FILE}
           AS file_id, doc_id
  FROM documents
),
stats AS (
  SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
         MIN(doc_id) AS x_min, MAX(doc_id) AS x_max
  FROM f GROUP BY file_id
),
u AS (SELECT doc_id AS k FROM documents WHERE doc_id % 37 = 0),
touched AS (
  SELECT s.file_id, s.n_rows, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM stats s JOIN u ON u.k >= s.x_min AND u.k <= s.x_max
  GROUP BY s.file_id, s.n_rows
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM stats) AS n_files,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM touched) AS files_touched,
       (SELECT CAST(SUM(n_rows) AS BIGINT) FROM stats) AS table_rows,
       (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) FROM touched)
         AS cow_rewrite_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS n_updates,
       (SELECT CAST(COALESCE(SUM(n_hits), 0) AS BIGINT) FROM touched)
         AS mor_delete_rows,
       (1000 * (SELECT CAST(COALESCE(SUM(n_rows), 0) AS BIGINT)
                FROM touched))
         // (SELECT CAST(SUM(n_rows) AS BIGINT) FROM stats)
         AS mor_read_amp_permille
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "zone_prune": q_zone_prune,
        "cow_mor": q_cow_mor,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "zone_prune": ORACLE_ZONE_PRUNE,
        "cow_mor": ORACLE_COW_MOR,
    }
