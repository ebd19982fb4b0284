"""BPE trainer: Spark HOF-fold path vs the pure-Python textbook twin."""

import random

from crawlspark.textops.bpe import bpe_train, bpe_train_py


def test_bpe_hand_case(spark):
    # classic Sennrich toy corpus
    corpus = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    merges = bpe_train(df, n_merges=4)
    got = [(m["left"], m["right"], m["pair_count"]) for m in merges]
    wc = {}
    for w in corpus[0].split():
        wc[w] = wc.get(w, 0) + 1
    assert got == bpe_train_py(wc, 4)
    # first merge must be the most frequent adjacent pair: 'es' appears in
    # newest(6) + widest(3) = 9 times; ties broken lexicographically
    assert got[0][:2] == ("e", "s") and got[0][2] == 9


def test_bpe_differential_random(spark):
    rng = random.Random(7)
    alphabet = "abcd"
    for trial in range(3):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(40)
        ]
        text = " ".join(words)
        df = spark.createDataFrame([(text,)], "text string")
        merges = bpe_train(df, n_merges=6)
        got = [(m["left"], m["right"], m["pair_count"]) for m in merges]
        wc = {}
        for w in words:
            wc[w] = wc.get(w, 0) + 1
        assert got == bpe_train_py(wc, 6), f"trial {trial}"


def test_bpe_stops_when_no_repeating_pair(spark):
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    assert bpe_train(df, n_merges=5) == []  # every pair count is 1
