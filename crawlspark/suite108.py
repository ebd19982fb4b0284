"""Round-3 queries, part 58: gibberish surface signals, noscript
dependence probe.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# gibberish — keyboard-mash surface statistics
# --------------------------------------------------------------------------

_GIB_TEXTS = [
    # natural prose: run 3 ('nst' in 'monster'), vowels in band
    "the monster ate seven apples today",
    # home-row mash
    "asdf asdf jkl asdf hahaha asdfghjkl",
    # consonant wall
    "zxcvbnmzxcvbnm qwrtypsdfghjklzxcvbnm yes",
    # too short to judge
    "ok go",
]


def q_gibberish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """textops.quality.gibberish_signals over prose / home-row mash /
    consonant wall / under-threshold short text — the oracle replays
    the letter-filter + run-length + permille arithmetic from
    hand-computed constants."""
    from .textops.quality import gibberish_signals

    doc = F.col("doc_id")
    m = doc % 4
    text = (
        F.when(m == 0, F.lit(_GIB_TEXTS[0]))
        .when(m == 1, F.lit(_GIB_TEXTS[1]))
        .when(m == 2, F.lit(_GIB_TEXTS[2]))
        .otherwise(F.lit(_GIB_TEXTS[3]))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), text.alias("text"))
    return gibberish_signals(d).orderBy("doc_id")


def _gib_expect():
    rows = []
    for i, t in enumerate(_GIB_TEXTS):
        letters = "".join(c for c in t.lower() if c.isalpha())
        n = len(letters)
        v = sum(1 for c in letters if c in "aeiou")
        h = sum(1 for c in letters if c in "asdfghjkl")
        run = best = 0
        for c in letters:
            run = run + 1 if c not in "aeiou" else 0
            best = max(best, run)
        vp = (1000 * v) // n if n else 0
        hp = (1000 * h) // n if n else 0
        susp = n >= 20 and (best >= 8 or vp < 250 or vp > 600 or hp >= 700)
        rows.append((i, n, best, vp, hp, susp))
    return rows


def _gib_oracle() -> str:
    vals = ",\n   ".join(
        f"({i}, {n}, {r}, {vp}, {hp}, {str(s).upper()})"
        for i, n, r, vp, hp, s in _gib_expect()
    )
    return f"""
WITH e(k, n_letters, max_consonant_run, vowel_permille,
       homerow_permille, suspicious) AS (
  VALUES
   {vals}
)
SELECT d.doc_id, CAST(e.n_letters AS BIGINT) AS n_letters,
       CAST(e.max_consonant_run AS BIGINT) AS max_consonant_run,
       CAST(e.vowel_permille AS BIGINT) AS vowel_permille,
       CAST(e.homerow_permille AS BIGINT) AS homerow_permille,
       e.suspicious
FROM documents d JOIN e ON d.doc_id % 4 = e.k
ORDER BY d.doc_id
"""


# --------------------------------------------------------------------------
# noscript_probe — JS-dependence share
# --------------------------------------------------------------------------

def q_noscript_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """extract.noscript_share over a JS-walled page (large noscript
    fallback), a tracking-pixel noscript, and none."""
    from .extract import noscript_share

    doc = F.col("doc_id")
    m = doc % 3
    body = (
        F.when(m == 0, F.lit(
            "<div id=app></div><noscript>Please enable JavaScript to "
            "view this application content.</noscript>"))
        .when(m == 1, F.lit(
            '<p>article text here</p><noscript><img src="/px.gif">'
            "</noscript>"))
        .otherwise(F.lit("<p>static page</p>"))
    )
    d = _docs(spark, sf_dir).select(doc.alias("doc_id"), body.alias("b"))
    out = d.select("doc_id", noscript_share(F.col("b")).alias("n"))
    return out.select(
        "doc_id", "n.n_noscript", "n.noscript_chars", "n.total_chars",
        "n.share_permille",
    ).orderBy("doc_id")


_NS_BODIES = [
    "<div id=app></div><noscript>Please enable JavaScript to "
    "view this application content.</noscript>",
    '<p>article text here</p><noscript><img src="/px.gif"></noscript>',
    "<p>static page</p>",
]
_NS_INNER = [
    "Please enable JavaScript to view this application content.",
    '<img src="/px.gif">',
    "",
]


def _ns_oracle() -> str:
    rows = []
    for i, (b, inner) in enumerate(zip(_NS_BODIES, _NS_INNER)):
        total = len(b)
        ns = len(inner)
        cnt = 1 if inner else 0
        share = (1000 * ns) // total if total else 0
        rows.append((i, cnt, ns, total, share))
    vals = ",\n   ".join(
        f"({i}, {c}, {ns}, {t}, {s})" for i, c, ns, t, s in rows)
    return f"""
WITH e(k, n_noscript, noscript_chars, total_chars, share_permille) AS (
  VALUES
   {vals}
)
SELECT d.doc_id, CAST(e.n_noscript AS INTEGER) AS n_noscript,
       CAST(e.noscript_chars AS BIGINT) AS noscript_chars,
       CAST(e.total_chars AS BIGINT) AS total_chars,
       CAST(e.share_permille AS BIGINT) AS share_permille
FROM documents d JOIN e ON d.doc_id % 3 = e.k
ORDER BY d.doc_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "gibberish": q_gibberish,
        "noscript_probe": q_noscript_probe,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "gibberish": _gib_oracle(),
        "noscript_probe": _ns_oracle(),
    }
