"""Text quality / language-id / token counting / fingerprinting.

Every formula is integer-exact (ratios as permille via integer division) so
DuckDB oracles replay bit-for-bit — no float fuzz in the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import base_hash

STOPWORDS = ["the", "a", "of", "and", "to"]

# marker-word sets for the n-gram language heuristic; prediction is the
# argmax of marker occurrences with a fixed tie order (en > de > fr > other)
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "fr": ["le", "et", "les"],
}


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a fixed substring via the length-difference trick
    (identical semantics in Spark and DuckDB)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


COUNT_SQL = "CAST((length({t}) - length(replace({t}, '{n}', ''))) / {l} AS BIGINT)"


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish estimate (ceil(chars/4), the classic
    4-chars-per-token heuristic) — both integer-exact."""
    t = F.col(text_col)
    ws = F.size(F.split(t, " ")).cast("long")
    bpe = F.ceil(F.length(t) / 4).cast("long")
    return df.select(
        "doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens_est"),
        F.length(t).cast("long").alias("n_chars"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / stopword-ratio quality signals, score in integer permille."""
    t = F.col(text_col)
    words = F.split(t, " ")
    n_words = F.size(words).cast("long")
    n_chars = F.length(t).cast("long")
    stop_cnt = F.size(F.filter(words, lambda w: w.isin(STOPWORDS))).cast("long")
    mean_word_len_milli = F.floor(n_chars * 1000 / n_words).cast("long")
    stop_permille = F.floor(stop_cnt * 1000 / n_words).cast("long")
    # crude quality: long-enough docs with some stopwords score higher
    score = (
        F.least(n_words, F.lit(100)) * 5
        + F.least(stop_permille, F.lit(300))
    ).cast("long")
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        stop_cnt.alias("stopword_cnt"),
        mean_word_len_milli.alias("mean_word_len_milli"),
        stop_permille.alias("stop_permille"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-count language heuristic with deterministic tie-breaking."""
    t = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scores = {
        lang: sum(
            (_count_occurrences(t, f" {m} ") for m in markers), F.lit(0).cast("long")
        )
        for lang, markers in LANG_MARKERS.items()
    }
    en, de, fr = scores["en"], scores["de"], scores["fr"]
    best = F.greatest(en, de, fr)
    pred = (
        F.when(best == 0, "other")
        .when(en == best, "en")
        .when(de == best, "de")
        .otherwise("fr")
    )
    return df.select(
        "doc_id",
        en.alias("score_en"), de.alias("score_de"), fr.alias("score_fr"),
        pred.alias("pred_lang"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: hash of the first 64 chars + length (a cheap
    rolling-hash stand-in, replayable in SQL)."""
    t = F.col(text_col)
    fp = base_hash(F.concat(F.substring(t, 1, 64), F.length(t).cast("string")))
    return df.select("doc_id", fp.alias("fingerprint"))
