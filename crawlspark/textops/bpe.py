"""Distributed BPE vocabulary training (Sennrich et al. 2016,
arXiv:1508.07909) — the tokenizer-training stage of a text pipeline.

The corpus first collapses to its VOCABULARY (word, count) — Zipf makes
this tiny relative to the corpus, so all subsequent iterations run over
the vocab relation, not the corpus.  Each merge round is:

1. adjacent-pair counts: one HOF transform + explode + map-side-combined
   groupBy((a, b)) weighted by word count,
2. argmax pair on the driver (ONE row per round — count desc, then
   lexicographic (a, b) for determinism),
3. apply the merge inside every word's symbol array with a pure
   ``F.aggregate`` fold (left-to-right, non-overlapping — textbook BPE),
   then ``localCheckpoint`` so the plan stays O(1) in merge count.

No UDF anywhere: the fold and pair extraction are Catalyst HOF
expressions.  The merge sequence is data-dependent (each round's argmax
feeds the next round's plan), so there is no static SQL replay — the
correctness gate is the differential test against the pure-Python
reference implementation below (tests/test_bpe.py), and the driver
records the rows-only check.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def _symbols(word):
    """Initial symbol array: characters + the end-of-word marker."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: word.substr(i, F.lit(1))
    )
    return F.concat(chars, F.array(F.lit(END)))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at("syms", i.cast("int")).alias("a"),
            F.element_at("syms", (i + 1).cast("int")).alias("b"),
        ),
    )
    return (
        vocab.filter(F.size("syms") >= 2)
        .select(F.col("cnt"), F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("n"))
    )


def _merge_fold(a: str, b: str):
    """Fold that merges every non-overlapping left-to-right (a, b) pair."""
    ab = a + b

    def step(acc, x):
        tail_is_a = (F.size(acc) > 0) & (
            F.element_at(acc, -1) == F.lit(a)
        ) & (x == F.lit(b))
        merged = F.concat(
            F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
        )
        return F.when(tail_is_a, merged).otherwise(
            F.concat(acc, F.array(x))
        )

    return step


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_count: int = 1,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    table as a list of dicts (rank, left, right, pair_count) — the
    artifact a tokenizer ships.  ``min_count`` floors the vocabulary
    (words rarer than it are dropped before training)."""
    words = df.select(
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
        ).alias("w")
    )
    vocab = (
        words.groupBy("w").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select(F.col("cnt"), _symbols(F.col("w")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[dict] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append({"rank": rank, "left": a, "right": b, "pair_count": n})
        init = F.array().cast("array<string>")
        vocab = vocab.select(
            "cnt", F.aggregate("syms", init, _merge_fold(a, b)).alias("syms")
        ).localCheckpoint(eager=True)
    return merges


def bpe_train_df(df: DataFrame, text_col: str = "text",
                 n_merges: int = 10) -> DataFrame:
    """:func:`bpe_train` as a DataFrame (rank, left, right, pair_count)."""
    rows = bpe_train(df, text_col=text_col, n_merges=n_merges)
    return df.sparkSession.createDataFrame(
        [(r["rank"], r["left"], r["right"], r["pair_count"]) for r in rows],
        "rank LONG, left STRING, right STRING, pair_count LONG",
    )


# -- encoder: apply a FROZEN merge table to a corpus ------------------------
#
# Training is data-dependent (no static SQL), but ENCODING with a fixed,
# shipped merge table is the production-shaped op (the tokenizer is frozen;
# the corpus varies) and it IS SQL-replayable, so it gets a full oracle.
#
# Representation trick: a doc becomes "(k)(e)(y)(</w>)(a)(g)(g)(</w>)..."
# — every symbol wrapped in parens.  One BPE merge (a, b) is then ONE
# literal string replace "(a)(b)" -> "(ab)": occurrences can't share
# characters, so engine-native non-overlapping left-to-right replace() is
# EXACTLY Sennrich's merge pass, bit-identical in Spark and DuckDB.
# Cross-word false merges are impossible because no trained merge has
# left == "</w>" (it's word-final by construction).  A full rank-order
# sweep can expose new occurrences of earlier merges, so the sweep runs
# ``rounds`` times; the differential test proves fixpoint at that depth.
# Everything is narrow Column expressions — fuses into the scan, no UDF,
# no shuffle, trivially right at 100 TB.


def wrap_symbols(text) -> "F.Column":
    """text -> '(c)(c)...(</w>)...' paren-framed symbol string."""
    clean = F.trim(F.regexp_replace(
        F.translate(text, "()", ""), r"\s+", " "
    ))
    wrapped = F.replace(
        F.regexp_replace(clean, r"(.)", r"($1)"), F.lit("( )"), F.lit(f"({END})")
    )
    return F.when(clean == "", F.lit("")).otherwise(
        F.concat(wrapped, F.lit(f"({END})"))
    )


def bpe_encode_col(text, merges: list[tuple[str, str]], rounds: int = 2):
    """Encode ``text`` with a frozen merge table; returns the token array.

    ``merges`` is the ranked [(left, right), ...] artifact from
    :func:`bpe_train`; ``rounds`` full sweeps bound the rank-restart loop
    of the textbook encoder.

    Exactness caveat (disclosed): a bounded rank-order sweep matches the
    textbook priority encoder unless the table contains a chain where a
    HIGHER-rank merge must fire before a LOWER-rank one becomes newly
    applicable (e.g. r0=(ab,c), r1=(a,b) on "abcd" with r2=(c,d): sweep
    gives [ab, cd], priority gives [abc, d]).  tests/test_bpe.py
    differential-asserts sweep == priority for the SHIPPED table on the
    gate corpus; for arbitrary tables use :func:`bpe_encode_exact_udf`.
    """
    s = wrap_symbols(text)
    for _ in range(rounds):
        for a, b in merges:
            s = F.replace(s, F.lit(f"({a})({b})"), F.lit(f"({a}{b})"))
    return F.regexp_extract_all(s, F.lit(r"\(([^()]+)\)"), 1)


def bpe_encode_oracle_sql(text_sql: str, merges: list[tuple[str, str]],
                          rounds: int = 2) -> str:
    """DuckDB expression replaying :func:`bpe_encode_col` bit-for-bit
    (token array as a VARCHAR[] via regexp_extract_all)."""
    clean = (
        f"trim(regexp_replace(replace(replace({text_sql}, '(', ''), ')', ''),"
        f" '\\s+', ' ', 'g'))"
    )
    wrapped = (
        f"replace(regexp_replace({clean}, '(.)', '(\\1)', 'g'),"
        f" '( )', '({END})')"
    )
    s = f"(CASE WHEN {clean} = '' THEN '' ELSE {wrapped} || '({END})' END)"
    for _ in range(rounds):
        for a, b in merges:
            s = f"replace({s}, '({a})({b})', '({a}{b})')"
    return f"regexp_extract_all({s}, '\\(([^()]+)\\)', 1)"


def bpe_encode_exact_udf(merges: list[tuple[str, str]]):
    """Exact textbook encoder as an Arrow-batched pandas_udf (the slow
    path for merge tables where the bounded sweep diverges — see
    :func:`bpe_encode_col`).  The merge table is captured in the closure
    (broadcast with the task), work is per-batch vectorized at the word
    level via a memo dict: Zipf means a batch encodes each distinct word
    once."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return None
            out: list[str] = []
            for w in t.replace("(", "").replace(")", "").split():
                if w not in memo:
                    memo[w] = bpe_encode_py(w, merges)
                out.extend(memo[w])
            return out

        return texts.map(one)

    return enc


def bpe_encode_py(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Textbook encoder twin: repeatedly apply the LOWEST-rank merge whose
    pair occurs, exhaustively, until no trained pair remains (the
    rank-restart loop the bounded sweep must converge to)."""
    rank = {(a, b): i for i, (a, b) in enumerate(merges)}
    out: list[str] = []
    for w in text.replace("(", "").replace(")", "").split():
        syms = list(w) + [END]
        while True:
            best, bi = None, None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            a, b = merges[best]
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        out.extend(syms)
    return out


# -- pure-Python reference (differential-test twin) -------------------------

def bpe_train_py(word_counts: dict[str, int], n_merges: int) -> list[tuple]:
    """Textbook BPE on a word->count dict; returns [(left, right, count)].
    Same tie-break (count desc, then lexicographic pair) as the Spark path.
    """
    vocab = {tuple(list(w) + [END]): c for w, c in word_counts.items()}
    out = []
    for _ in range(n_merges):
        counts: dict[tuple, int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        out.append((a, b, n))
        new_vocab = {}
        for syms, c in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return out
