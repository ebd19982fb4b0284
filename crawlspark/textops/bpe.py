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
