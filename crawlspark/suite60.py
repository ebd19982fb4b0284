"""Round-3 queries, part 10: order-free Merkle snapshot roots,
watermark lateness accounting, Unicode script mix routing, and PNG
chunk CRC verification.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# --------------------------------------------------------------------------
# merkle_root
# --------------------------------------------------------------------------

_ML = 4  # 16 leaves keeps the oracle's unrolled tree readable


def q_merkle_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """checkpoint.merkle_root over the doc_id key set with 16 leaves;
    the oracle replays the commutative leaf digests and the 4 unrolled
    combine levels in modular-arithmetic SQL."""
    from .checkpoint import merkle_root

    return merkle_root(_docs(spark, sf_dir), "doc_id", levels=_ML)


def _merkle_oracle() -> str:
    parts = [
        "WITH leaves0 AS (",
        "  SELECT doc_id % 16 AS b,",
        "         CAST(SUM((1103515245 * (doc_id % 2147483647) + 12345)",
        "                  % 2147483647) % 2147483647 AS BIGINT) AS v",
        "  FROM documents GROUP BY 1",
        "),",
        "l0 AS (",
        "  SELECT g.b, CAST(COALESCE(leaves0.v, 0) AS BIGINT) AS v",
        "  FROM generate_series(0, 15) g(b)",
        "  LEFT JOIN leaves0 ON leaves0.b = g.b",
        "),",
    ]
    for lvl in range(1, _ML + 1):
        p = lvl - 1
        parts += [
            f"l{lvl} AS (",
            f"  SELECT b // 2 AS b,",
            "         (1103515245 * MAX(CASE WHEN b % 2 = 0 THEN v END)",
            "          + 12345 * MAX(CASE WHEN b % 2 = 1 THEN v END) + 1)",
            "           % 2147483647 AS v",
            f"  FROM l{p} GROUP BY b // 2",
            "),",
        ]
    parts += [
        "nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)",
        f"SELECT CAST(l{_ML}.v AS BIGINT) AS root, nr.n AS n_rows,",
        "       CAST(16 AS BIGINT) AS n_leaves",
        f"FROM l{_ML} CROSS JOIN nr",
    ]
    return "\n".join(parts)


# --------------------------------------------------------------------------
# watermark_lateness
# --------------------------------------------------------------------------

_WM_DELAY_US = 300_000_000  # 5 min


def q_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming.watermark_lateness over events: 8 source partitions
    (user_id%8), arrival order = event_id, event time = ts; how many
    events a 5-minute watermark would drop per partition.  The oracle
    replays the exclusive running max per partition in window SQL."""
    from .streaming import watermark_lateness

    # backdate every 7th-ish event by up to 12 min so the 5-min
    # watermark actually drops stragglers (raw event ts is monotone in
    # arrival order -> zero lateness, which tests nothing)
    e = _events(spark, sf_dir).select(
        (F.col("user_id") % 8).alias("part"),
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - (F.col("event_id") % 7) * 120_000_000).alias("ts_us"),
        F.col("event_id").alias("arrival"),
    )
    return watermark_lateness(
        e, delay_us=_WM_DELAY_US).orderBy("part")


ORACLE_WATERMARK = f"""
WITH e AS (
  SELECT user_id % 8 AS part,
         epoch_us(ts) - (event_id % 7) * 120000000 AS ts_us,
         event_id AS arrival
  FROM events
),
w AS (
  SELECT part, ts_us,
         MAX(ts_us) OVER (PARTITION BY part ORDER BY arrival
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           - {_WM_DELAY_US} AS wm
  FROM e
)
SELECT part, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN ts_us < wm THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST((1000 * SUM(CASE WHEN ts_us < wm THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS late_permille,
       CAST(MAX(CASE WHEN ts_us < wm THEN wm - ts_us END) AS BIGINT)
         AS max_lateness_us
FROM w
GROUP BY part
ORDER BY part
"""


# --------------------------------------------------------------------------
# script_mix
# --------------------------------------------------------------------------

def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.quality.script_mix over a 40-char Latin prefix of each
    doc plus a planted non-Latin tail per doc%5 (Cyrillic, Greek, Han,
    Arabic); the oracle recomputes the per-script character counts
    with RE2 script classes and replays the argmax/second-max vote."""
    from .textops.quality import script_mix

    doc = F.col("doc_id")
    m = doc % 5
    tail = (
        F.when(m == 1, F.lit(" Привет мир"))
        .when(m == 2, F.lit(" αβγδε κόσμος"))
        .when(m == 3, F.lit(" 你好世界汉字"))
        .when(m == 4, F.lit(" مرحبا بالعالم"))
        .otherwise(F.lit(""))
    )
    docs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"),
        F.concat(F.substring(F.col("text"), 1, 40), tail).alias("text"),
    )
    return script_mix(docs).orderBy("id")


ORACLE_SCRIPT_MIX = """
WITH d AS (
  SELECT doc_id AS id,
         substring(text, 1, 40) ||
         CASE doc_id % 5
           WHEN 1 THEN ' Привет мир'
           WHEN 2 THEN ' αβγδε κόσμος'
           WHEN 3 THEN ' 你好世界汉字'
           WHEN 4 THEN ' مرحبا بالعالم'
           ELSE '' END AS text
  FROM documents
),
c AS (
  SELECT id,
    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
         AS BIGINT) AS n_latin,
    CAST(length(text) - length(regexp_replace(text, '\\p{Cyrillic}', '',
         'g')) AS BIGINT) AS n_cyrillic,
    CAST(length(text) - length(regexp_replace(text, '\\p{Greek}', '',
         'g')) AS BIGINT) AS n_greek,
    CAST(length(text) - length(regexp_replace(text, '\\p{Han}', '',
         'g')) AS BIGINT) AS n_han,
    CAST(length(text) - length(regexp_replace(text, '\\p{Arabic}', '',
         'g')) AS BIGINT) AS n_arabic,
    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
         AS BIGINT) AS n_digit
  FROM d
),
v AS (
  SELECT *,
         n_latin + n_cyrillic + n_greek + n_han + n_arabic AS total,
         list_sort([n_latin, n_cyrillic, n_greek, n_han, n_arabic],
                   'DESC')[2] AS second
  FROM c
)
SELECT id, n_latin, n_cyrillic, n_greek, n_han, n_arabic, n_digit,
       CASE WHEN total = 0 THEN NULL
            WHEN n_latin >= n_cyrillic AND n_latin >= n_greek
                 AND n_latin >= n_han AND n_latin >= n_arabic
              THEN 'latin'
            WHEN n_cyrillic >= n_greek AND n_cyrillic >= n_han
                 AND n_cyrillic >= n_arabic THEN 'cyrillic'
            WHEN n_greek >= n_han AND n_greek >= n_arabic THEN 'greek'
            WHEN n_han >= n_arabic THEN 'han'
            ELSE 'arabic' END AS dominant_script,
       second > 0 AND second * 1000 >= 200 * total AS mixed
FROM v
ORDER BY id
"""


# --------------------------------------------------------------------------
# png_crc
# --------------------------------------------------------------------------

def _chunk(typ: bytes, data: bytes, corrupt: bool = False) -> bytes:
    crc = zlib.crc32(typ + data) & 0xFFFFFFFF
    if corrupt:
        crc ^= 1
    return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", crc)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_IHDR = struct.pack(">IIBBBBB", 16, 16, 8, 2, 0, 0, 0)
_PNG_OK = (_PNG_SIG + _chunk(b"IHDR", _IHDR)
           + _chunk(b"IEND", b"")).hex()
_PNG_BADCRC = (_PNG_SIG + _chunk(b"IHDR", _IHDR, corrupt=True)
               + _chunk(b"IEND", b"")).hex()
_PNG_TRUNC = (_PNG_SIG + _chunk(b"IHDR", _IHDR)
              + struct.pack(">I", 999) + b"IDAT").hex()
_PNG_NOEND = (_PNG_SIG + _chunk(b"IHDR", _IHDR)).hex()


def q_png_crc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.png_crc_check over planted payloads: valid PNG, one with
    a corrupted IHDR CRC, a mid-chunk truncation, a clean file missing
    IEND, and a non-PNG; the oracle states the expected verdicts per
    case."""
    from .images import png_crc_check

    doc = F.col("doc_id")
    m = doc % 5
    hexstr = (
        F.when(m == 0, F.lit("474946383961"))
        .when(m == 1, F.lit(_PNG_OK))
        .when(m == 2, F.lit(_PNG_BADCRC))
        .when(m == 3, F.lit(_PNG_TRUNC))
        .otherwise(F.lit(_PNG_NOEND))
    )
    imgs = _docs(spark, sf_dir).select(
        doc.alias("doc_id"), F.unhex(hexstr).alias("bytes"))
    return png_crc_check(imgs).select(
        "doc_id", "png_n_chunks", "png_n_bad_crc", "png_first_bad_type",
        "png_truncated", "png_has_iend",
    ).orderBy("doc_id")


ORACLE_PNG_CRC = """
SELECT doc_id,
       CAST(CASE doc_id % 5 WHEN 0 THEN NULL WHEN 1 THEN 2 WHEN 2 THEN 2
                 ELSE 1 END AS INTEGER) AS png_n_chunks,
       CAST(CASE doc_id % 5 WHEN 0 THEN NULL WHEN 2 THEN 1
                 ELSE 0 END AS INTEGER) AS png_n_bad_crc,
       CASE WHEN doc_id % 5 = 2 THEN 'IHDR' END AS png_first_bad_type,
       CAST(CASE doc_id % 5 WHEN 0 THEN NULL WHEN 3 THEN 1
                 ELSE 0 END AS INTEGER) AS png_truncated,
       CAST(CASE doc_id % 5 WHEN 0 THEN NULL WHEN 1 THEN 1 WHEN 2 THEN 1
                 ELSE 0 END AS INTEGER) AS png_has_iend
FROM documents
ORDER BY doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "merkle_root": q_merkle_root,
        "watermark_lateness": q_watermark_lateness,
        "script_mix": q_script_mix,
        "png_crc": q_png_crc,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "merkle_root": _merkle_oracle(),
        "watermark_lateness": ORACLE_WATERMARK,
        "script_mix": ORACLE_SCRIPT_MIX,
        "png_crc": ORACLE_PNG_CRC,
    }
