"""Round-3 queries, part 4: container-header dimension sniffing
(dim-lie / decompression-bomb gates), IDN host folding, per-host
transfer-integrity accounting.

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the construction (header dims are STATED from the
fixture arithmetic, never re-parsed — a byte-offset bug in the sniffer
cannot hide in the oracle), integer-exact columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# image_header_sniff — dims from real container headers, bombs, dim lies
# --------------------------------------------------------------------------

_MAX_PIXELS = 178_956_970


def _be32hex(c: Column) -> Column:
    return F.lpad(F.hex(c), 8, "0")


def q_image_header_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """images.sniff_header_dims over REAL container-header prefixes built
    byte-for-byte in the fixture: PNG IHDR (doc%4==0, big-endian dims),
    GIF89a logical screen (doc%4==1, little-endian u16), BMP info header
    (doc%4==2, little-endian i32, negative = top-down on doc%8==2), and
    an unknown zlib-style magic (doc%4==3 -> null sniff).  Planted
    hazards: header dims = declared+1 on doc%5==0 (dim lie), a
    20000x20000 GIF on doc%16==1 (decompression bomb, precedence over
    the lie).  The oracle states every sniffed value from the same
    arithmetic."""
    from .images import sniff_header_dims

    doc = F.col("doc_id")
    w = (10 + doc % 90).cast("long")
    h = (20 + doc % 70).cast("long")
    bomb = doc % 16 == 1
    lie = doc % 5 == 0
    hw = F.when(bomb, F.lit(20000)).when(lie, w + 1).otherwise(w).cast("long")
    hh = F.when(bomb, F.lit(20000)).when(lie, h + 1).otherwise(h).cast("long")

    def le16(c: Column) -> Column:
        lo, hi = c % 256, (c - c % 256) / 256
        return F.concat(
            F.lpad(F.hex(lo.cast("long")), 2, "0"),
            F.lpad(F.hex(hi.cast("long")), 2, "0"),
        )

    def le32(c: Column) -> Column:
        lo, hi = c % 65536, (c - c % 65536) / 65536
        return F.concat(le16(lo.cast("long")), le16(hi.cast("long")))

    topdown = doc % 8 == 2
    bmp_h_stored = F.when(topdown, F.lit(1 << 32) - hh).otherwise(hh)
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        _be32hex(hw), _be32hex(hh),
    )
    gif_hex = F.concat(F.lit("474946383961"), le16(hw), le16(hh))
    bmp_hex = F.concat(
        F.lit("424D" + "00" * 12 + "28000000"),
        le32(hw), le32(bmp_h_stored),
    )
    unknown_hex = F.lit("78DA00112233445566778899AABBCCDDEEFF")
    body_hex = (
        F.when(doc % 4 == 0, png_hex)
        .when(doc % 4 == 1, gif_hex)
        .when(doc % 4 == 2, bmp_hex)
        .otherwise(unknown_hex)
    )
    imgs = _docs(spark, sf_dir).select(
        F.concat(F.lit("img-"), doc.cast("string")).alias("image_id"),
        F.unhex(body_hex).alias("bytes"),
        w.alias("w"), h.alias("h"),
    )
    out = sniff_header_dims(imgs, max_pixels=_MAX_PIXELS)
    # single routing column (bomb > lie > ok; unsniffed = unknown magic):
    # nullable booleans stringify differently in Spark vs DuckDB pandas
    # frames, so the gate output keeps the tri-state as a string
    gate = (
        F.when(F.col("sniff_fmt").isNull(), "unsniffed")
        .when(F.col("bomb"), "bomb")
        .when(F.col("dim_lie"), "dim_lie")
        .otherwise("ok")
    )
    return out.select(
        "image_id", "sniff_fmt", "sniff_w", "sniff_h", "bmp_topdown",
        gate.alias("gate"),
    )


ORACLE_IMAGE_HEADER_SNIFF = f"""
WITH i AS (
  SELECT doc_id,
         CAST(10 + doc_id % 90 AS BIGINT) AS w,
         CAST(20 + doc_id % 70 AS BIGINT) AS h,
         doc_id % 16 = 1 AS bomb_row, doc_id % 5 = 0 AS lie_row,
         doc_id % 4 AS fam
  FROM documents
),
j AS (
  SELECT doc_id, fam, w, h,
         CASE WHEN bomb_row THEN 20000 WHEN lie_row THEN w + 1
              ELSE w END AS hw,
         CASE WHEN bomb_row THEN 20000 WHEN lie_row THEN h + 1
              ELSE h END AS hh
  FROM i
)
SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id,
       CASE fam WHEN 0 THEN 'png' WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp'
            END AS sniff_fmt,
       CASE WHEN fam <= 2 THEN CAST(hw AS BIGINT) END AS sniff_w,
       CASE WHEN fam <= 2 THEN CAST(hh AS BIGINT) END AS sniff_h,
       fam = 2 AND doc_id % 8 = 2 AS bmp_topdown,
       CASE WHEN fam = 3 THEN 'unsniffed'
            WHEN hw * hh > {_MAX_PIXELS} THEN 'bomb'
            WHEN hw != w OR hh != h THEN 'dim_lie'
            ELSE 'ok' END AS gate
FROM j
"""


# --------------------------------------------------------------------------
# idn_hosts — punycode/Unicode authority folding
# --------------------------------------------------------------------------

# (unicode spelling, expected IDNA2003 ACE form) — ACE values verified
# against the stdlib codec at authoring time and restated in the oracle.
_IDN_CASES = [
    ("münchen.de", "xn--mnchen-3ya.de"),
    ("BÜCHER.example", "xn--bcher-kva.example"),
    ("пример.ru", "xn--e1afmkfd.ru"),
    ("例え.jp", "xn--r8jz45g.jp"),
    ("café.fr", "xn--caf-dma.fr"),
    ("ascii.test", "ascii.test"),
    ("xn--mnchen-3ya.de", "xn--mnchen-3ya.de"),
    ("MiXeD.Case.test", "mixed.case.test"),
]


def q_idn_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canon.idn_fold_hosts over the 8-case IDN matrix (doc%8 picks the
    spelling): Unicode hosts fold to their punycode ACE form, already-ACE
    and plain-ASCII hosts pass through lowercased; was_unicode marks the
    rows where folding changed more than case."""
    from .canon import idn_fold_hosts

    doc = F.col("doc_id")
    host = F.lit(None).cast("string")
    for i in range(len(_IDN_CASES) - 1, -1, -1):
        host = F.when(doc % 8 == i, F.lit(_IDN_CASES[i][0])).otherwise(host)
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), host.alias("host"))
    return idn_fold_hosts(d).select(
        "doc_id", "host", "host_ace", "was_unicode"
    )


def _oracle_idn() -> str:
    host_case = " ".join(
        f"WHEN {i} THEN '{u}'" for i, (u, _) in enumerate(_IDN_CASES)
    )
    ace_case = " ".join(
        f"WHEN {i} THEN '{a}'" for i, (_, a) in enumerate(_IDN_CASES)
    )
    return f"""
SELECT doc_id,
       CASE doc_id % 8 {host_case} END AS host,
       CASE doc_id % 8 {ace_case} END AS host_ace,
       CASE doc_id % 8 {ace_case} END !=
         lower(CASE doc_id % 8 {host_case} END) AS was_unicode
FROM documents
"""


# --------------------------------------------------------------------------
# transfer_accounting — truncation / over-read / undeclared per host
# --------------------------------------------------------------------------

def q_transfer_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fetch.transfer_accounting over a response log with planted
    anomalies: undeclared length on doc%7==0, truncation (-100 bytes) on
    doc%11==3, over-read (+7) on doc%13==5, clean otherwise (precedence
    in that order); the oracle replays the conditional sums."""
    from .fetch import transfer_accounting

    doc = F.col("doc_id")
    cl = F.when(doc % 7 != 0, (1000 + doc % 500).cast("long"))
    body = (
        F.when(doc % 7 == 0, (900 + doc % 100).cast("long"))
        .when(doc % 11 == 3, cl - 100)
        .when(doc % 13 == 5, cl + 7)
        .otherwise(cl)
    )
    log = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (doc % 10).cast("string")).alias("host"),
        cl.alias("content_length"),
        body.alias("body_bytes"),
    )
    return transfer_accounting(log).orderBy("host")


ORACLE_TRANSFER_ACCOUNTING = """
WITH r AS (
  SELECT 'h' || (doc_id % 10) AS host,
         CASE WHEN doc_id % 7 != 0 THEN 1000 + doc_id % 500 END AS cl,
         CASE WHEN doc_id % 7 = 0 THEN 900 + doc_id % 100
              WHEN doc_id % 11 = 3 THEN 1000 + doc_id % 500 - 100
              WHEN doc_id % 13 = 5 THEN 1000 + doc_id % 500 + 7
              ELSE 1000 + doc_id % 500 END AS body
  FROM documents
)
SELECT host, COUNT(*) AS n_responses,
       CAST(SUM(CASE WHEN cl IS NOT NULL AND body < cl THEN 1 ELSE 0 END)
            AS BIGINT) AS n_truncated,
       CAST(SUM(CASE WHEN cl IS NOT NULL AND body > cl THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overread,
       CAST(SUM(CASE WHEN cl IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_undeclared,
       CAST(SUM(COALESCE(cl, 0)) AS BIGINT) AS declared_bytes,
       CAST(SUM(body) AS BIGINT) AS actual_bytes
FROM r GROUP BY host ORDER BY host
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "image_header_sniff": q_image_header_sniff,
        "idn_hosts": q_idn_hosts,
        "transfer_accounting": q_transfer_accounting,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "image_header_sniff": ORACLE_IMAGE_HEADER_SNIFF,
        "idn_hosts": _oracle_idn(),
        "transfer_accounting": ORACLE_TRANSFER_ACCOUNTING,
    }
