"""Round-3 queries, part 12: ICO favicon directory sniffing, IDN
homograph risk, Request-rate/Visit-time robots directives, and
inter-arrival burstiness.
"""

from __future__ import annotations

import struct
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------
# ico_sniff
# --------------------------------------------------------------------------

def _ico(kind: int, entries: list[tuple[int, int, int, int, int]],
         pad: int = 0) -> str:
    out = struct.pack("<HHH", 0, kind, len(entries))
    for w, h, bpp, size, off in entries:
        out += struct.pack("<BBBBHHII", w, h, 0, 0, 1, bpp, size, off)
    return (out + b"\x00" * pad).hex()


# two entries: 16x16@8 then 32x32@32 -> best is the 32px one; payload
# sized so both are exactly in bounds
_ICO_TWO = _ico(1, [(16, 16, 8, 10, 38), (32, 32, 32, 20, 48)], pad=30)
# cursor, single 256x256 (w=h=0) entry whose bytes run past the payload
_CUR_OOB = _ico(2, [(0, 0, 1, 999, 22)], pad=4)
# icon, single 48x48@4 entry exactly in bounds
_ICO_ONE = _ico(1, [(48, 48, 4, 8, 22)], pad=8)
# reserved word nonzero -> not an ICO
_NOT_ICO = "01000100010022002200"


def q_ico_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.ico_sniff over planted favicon payloads: a 2-entry icon
    (best = larger/deeper), an out-of-bounds 256px cursor, a 1-entry
    icon, a bad-reserved non-ICO and a GIF; the oracle states the
    directory read-outs per case."""
    from .images import ico_sniff

    doc = F.col("doc_id")
    m = doc % 5
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_ICO_TWO))
        .when(m == 2, F.lit(_CUR_OOB))
        .when(m == 3, F.lit(_ICO_ONE))
        .otherwise(F.lit(_NOT_ICO))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return ico_sniff(imgs).select(
        "doc_id", "ico_type", "ico_n_images", "ico_best_w", "ico_best_h",
        "ico_best_bpp", "ico_best_in_bounds",
    ).orderBy("doc_id")


ORACLE_ICO = """
SELECT doc_id,
       CASE doc_id % 5 WHEN 1 THEN 'icon' WHEN 2 THEN 'cursor'
            WHEN 3 THEN 'icon' END AS ico_type,
       CAST(CASE doc_id % 5 WHEN 1 THEN 2 WHEN 2 THEN 1 WHEN 3 THEN 1
            END AS BIGINT) AS ico_n_images,
       CAST(CASE doc_id % 5 WHEN 1 THEN 32 WHEN 2 THEN 256 WHEN 3 THEN 48
            END AS BIGINT) AS ico_best_w,
       CAST(CASE doc_id % 5 WHEN 1 THEN 32 WHEN 2 THEN 256 WHEN 3 THEN 48
            END AS BIGINT) AS ico_best_h,
       CAST(CASE doc_id % 5 WHEN 1 THEN 32 WHEN 2 THEN 1 WHEN 3 THEN 4
            END AS BIGINT) AS ico_best_bpp,
       CAST(CASE doc_id % 5 WHEN 1 THEN 1 WHEN 2 THEN 0 WHEN 3 THEN 1
            END AS INTEGER) AS ico_best_in_bounds
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# homograph
# --------------------------------------------------------------------------

def q_homograph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canon.homograph_risk over hosts mixing Latin/Cyrillic/Greek at
    label level: within-label mixing flags, cross-label (native label
    + latin TLD) does not; the oracle states the per-case verdicts."""
    from .canon import homograph_risk

    doc = F.col("doc_id")
    m = doc % 5
    ds = doc.cast("string")
    host = (
        F.when(m == 0, F.concat(F.lit("pure-latin"), ds, F.lit(".com")))
        .when(m == 1, F.concat(F.lit("аpple"), ds, F.lit(".com")))
        .when(m == 2, F.concat(F.lit("παρά"), ds,
                               F.lit(".gr")))
        .when(m == 3, F.concat(F.lit("mixed-αlpha"), ds,
                               F.lit(".net")))
        .otherwise(F.concat(F.lit("кир"), ds,
                            F.lit(".рф")))
    )
    urls = _docs(spark, sf_dir).select(host.alias("host"))
    return homograph_risk(urls).orderBy("host")


ORACLE_HOMOGRAPH = """
WITH h AS (
  SELECT doc_id, doc_id % 5 AS m,
         CASE doc_id % 5
           WHEN 0 THEN 'pure-latin' || doc_id || '.com'
           WHEN 1 THEN 'аpple' || doc_id || '.com'
           WHEN 2 THEN 'παρά' || doc_id || '.gr'
           WHEN 3 THEN 'mixed-αlpha' || doc_id || '.net'
           ELSE 'кир' || doc_id || '.рф'
         END AS host
  FROM documents
)
SELECT host,
       CAST(CASE WHEN m IN (1, 3) THEN 1 ELSE 0 END AS BIGINT)
         AS n_mixed_labels,
       CAST(CASE m WHEN 0 THEN 1 WHEN 4 THEN 1 ELSE 2 END AS BIGINT)
         AS scripts_in_host,
       m IN (1, 3) AS homograph_risk
FROM h
ORDER BY host
"""


# --------------------------------------------------------------------------
# request_rate
# --------------------------------------------------------------------------

def q_request_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.parse_request_rate over six directive families (plain
    rate, rate+window, visit-time only, all three floors, none,
    malformed); hosts declaring nothing valid emit no row."""
    from .robots import parse_request_rate

    doc = F.col("doc_id")
    k = doc % 6
    body = (
        F.when(k == 0, F.lit("User-agent: *\nRequest-rate: 1/5\n"))
        .when(k == 1, F.lit("Request-rate: 2/10 0600-0845\n"))
        .when(k == 2, F.lit("Visit-time: 2300-0500\n"))
        .when(k == 3, F.lit("Crawl-delay: 2\nRequest-rate: 3/7\n"
                            "Visit-time: 0000-1200\n"))
        .when(k == 4, F.lit("User-agent: *\nDisallow: /x\n"))
        .otherwise(F.lit("Request-rate: fast\n"))
    )
    robots = _docs(spark, sf_dir).filter(doc < 12).select(
        F.concat(F.lit("q"), doc.cast("string"), F.lit(".com"))
        .alias("host"),
        body.alias("body"),
    )
    return parse_request_rate(robots).orderBy("host")


ORACLE_REQUEST_RATE = """
WITH r AS (
  SELECT doc_id, doc_id % 6 AS k, 'q' || doc_id || '.com' AS host
  FROM documents WHERE doc_id < 12
)
SELECT host,
       CAST(CASE k WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 3 THEN 3 END
            AS BIGINT) AS rate_requests,
       CAST(CASE k WHEN 0 THEN 5 WHEN 1 THEN 10 WHEN 3 THEN 7 END
            AS BIGINT) AS rate_seconds,
       CAST(CASE k WHEN 0 THEN 5000 WHEN 1 THEN 5000 WHEN 3 THEN 2333
            END AS BIGINT) AS rate_delay_ms,
       CAST(CASE k WHEN 1 THEN 360 WHEN 2 THEN 1380 WHEN 3 THEN 0 END
            AS BIGINT) AS visit_from_min,
       CAST(CASE k WHEN 1 THEN 525 WHEN 2 THEN 300 WHEN 3 THEN 720 END
            AS BIGINT) AS visit_to_min
FROM r
WHERE k IN (0, 1, 2, 3)
ORDER BY host
"""


# --------------------------------------------------------------------------
# burstiness
# --------------------------------------------------------------------------

def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """politeness.interarrival_burstiness over the events log bucketed
    to 10 hosts, gaps in MILLISECONDS (unit chosen so the squared-gap
    sum stays integer-exact); the oracle replays the lag window and
    the exact sums, then the one double ratio."""
    from .politeness import interarrival_burstiness

    e = _events(spark, sf_dir).select(
        F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string"))
        .alias("host"),
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000").alias("ts"),
    )
    return interarrival_burstiness(e).orderBy("host")


ORACLE_BURSTINESS = """
WITH e AS (
  SELECT 'h' || (user_id % 10) AS host, epoch_us(ts) // 1000 AS ts
  FROM events
),
g AS (
  SELECT host, ts - LAG(ts) OVER (PARTITION BY host ORDER BY ts) AS gap
  FROM e
),
s AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(gap) AS BIGINT) AS sum_gap,
         CAST(SUM(gap * gap) AS BIGINT) AS s2
  FROM g WHERE gap IS NOT NULL GROUP BY host
)
SELECT host, n_gaps, sum_gap,
       CASE WHEN n_gaps >= 2 AND sum_gap > 0 THEN
         CAST(ROUND(1e3 * ((CAST(n_gaps AS DOUBLE) * s2
                            - CAST(sum_gap AS DOUBLE) * sum_gap)
                           / (CAST(sum_gap AS DOUBLE) * sum_gap)))
              AS BIGINT)
       END AS cv2_milli
FROM s
ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ico_sniff": q_ico_sniff,
        "homograph": q_homograph,
        "request_rate": q_request_rate,
        "burstiness": q_burstiness,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "ico_sniff": ORACLE_ICO,
        "homograph": ORACLE_HOMOGRAPH,
        "request_rate": ORACLE_REQUEST_RATE,
        "burstiness": ORACLE_BURSTINESS,
    }
