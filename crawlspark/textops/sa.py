"""Distributed suffix-array construction by prefix doubling.

The real machinery behind ExactSubstr dedup (Lee et al. 2022,
arXiv:2107.06499 build suffix arrays over the concatenated corpus to
find every repeated substring; :func:`crawlspark.textops.dedup.
duplicate_spans` is the k-token windowed approximation — this module is
the exact structure).  Prefix doubling (Manber & Myers, SODA'90) is the
textbook distributed formulation: after round j every position carries
the rank of its 2^j-token prefix, and one round is

    pair  = (rank[pos], rank[pos + 2^j])      -- a self-equijoin on pos
    rank' = dense rank of the pair            -- distinct + two-phase
                                                 global rank + join back

log2(n) rounds, each built ONLY from sorts/joins/aggregations — exactly
the operations a shuffle engine does at 10^10 positions (contrast DC3 /
induced sorting, which are sequential-memory algorithms).  The dense
rank reuses :func:`crawlspark.ranks.global_rank` (range partition +
per-partition offsets — no single-partition window above the small-n
threshold), and every round ends in a ``localCheckpoint`` so the plan
stays O(1) in rounds instead of doubling.

The DuckDB oracle verifies the CONSTRUCTION against brute force: it
materializes every suffix string and sorts them directly — O(n^2)
comparisons, fine at gate scale, impossible at corpus scale; agreement
of the two is exactly the evidence the distributed algorithm earns its
complexity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ranks import global_rank


def suffix_array(
    tokens: DataFrame,
    pos_col: str = "pos",
    tok_col: str = "token",
    n: int | None = None,
) -> DataFrame:
    """Build the suffix array of a token stream: input (pos, token) with
    1-based contiguous positions, output (pos, sa_rank) where sa_rank is
    the 1-based lexicographic rank of the suffix starting at pos (ties
    between identical suffixes — possible only without a unique
    terminator — broken by position, which still yields a valid SA
    order).  Token comparison is string order on the token values.

    Missing ranks past the end of the stream compare LOWEST (rank 0),
    matching the convention that a proper prefix sorts before its
    extensions.
    """
    sa, _rounds = suffix_array_rounds(tokens, pos_col, tok_col, n)
    return sa


def suffix_array_rounds(
    tokens: DataFrame,
    pos_col: str = "pos",
    tok_col: str = "token",
    n: int | None = None,
):
    """Like :func:`suffix_array` but also returns the per-round rank
    tables — ``(sa, rounds)`` with ``rounds`` a list of (L, rank_df)
    where rank_df(pos, rank) densely ranks every position's prefix of
    length L (L = 1, 2, 4, ...).  The rounds list is exactly the
    structure the LCP binary descent needs; each table is
    localCheckpoint'ed, so holding all log(n) of them costs storage,
    not plan depth.
    """
    if n is None:
        n = tokens.count()
    tok_rank = global_rank(
        tokens.select(tok_col).distinct(), tok_col, out="__r"
    )
    cur = tokens.join(tok_rank, tok_col).select(
        F.col(pos_col).alias("pos"), F.col("__r").alias("rank")
    ).localCheckpoint(eager=False)
    rounds = [(1, cur)]
    k = 1
    while k < n:
        nxt = cur.select(
            (F.col("pos") - k).alias("pos"), F.col("rank").alias("__rk2")
        )
        paired = cur.join(nxt, "pos", "left").select(
            "pos", "rank", F.coalesce("__rk2", F.lit(0)).alias("__rk2")
        )
        dp = global_rank(
            paired.select("rank", "__rk2").distinct(),
            ["rank", "__rk2"], out="__nr",
        )
        cur = paired.join(dp, ["rank", "__rk2"]).select(
            "pos", F.col("__nr").alias("rank")
        ).localCheckpoint(eager=False)
        k *= 2
        rounds.append((k, cur))
        mx = cur.agg(F.max("rank").alias("m")).collect()[0].m
        if mx >= n:
            break
    sa = global_rank(cur, ["rank", "pos"], out="sa_rank").select(
        F.col("pos").alias(pos_col), F.col("sa_rank")
    ).localCheckpoint(eager=False)
    return sa, rounds


def lcp_array(
    tokens: DataFrame,
    pos_col: str = "pos",
    tok_col: str = "token",
    n: int | None = None,
) -> DataFrame:
    """LCP array — longest common prefix (in TOKENS) of each pair of
    lexicographically adjacent suffixes — entirely from the
    prefix-doubling rank tables, by the classic binary descent: walk L
    from the largest power of two down; whenever rank_L at (p + lcp)
    equals rank_L at (q + lcp), the suffixes agree on L more tokens.
    Per level that test is TWO equi-joins of the (n-1)-row adjacent-pair
    relation against the level's rank table — log(n) levels, no token
    re-comparison, no random access, nothing quadratic anywhere.  (The
    sequential world uses Kasai's O(n) walk — inherently serial; the
    descent is the distributed formulation.)

    LCP[i] (keyed by the SMALLER sa_rank of the pair) is the core
    repeated-substring primitive: max over the array = longest repeated
    token span in the corpus, and every adjacent pair with LCP >= k is
    an ExactSubstr duplication witness at span length k.

    Returns (sa_rank, pos, next_pos, lcp) for sa_rank in [1, n-1].
    """
    if n is None:
        n = tokens.count()
    sa, rounds = suffix_array_rounds(tokens, pos_col, tok_col, n)
    a = sa.select(F.col("sa_rank"), F.col(pos_col).alias("p"))
    b = sa.select((F.col("sa_rank") - 1).alias("sa_rank"),
                  F.col(pos_col).alias("q"))
    pairs = a.join(b, "sa_rank").select(
        "sa_rank", "p", "q", F.lit(0).cast("long").alias("lcp")
    )
    for L, r in sorted(rounds, key=lambda t: -t[0]):
        rp = r.select(F.col("pos").alias("__kp"),
                      F.col("rank").alias("__rp"))
        rq = r.select(F.col("pos").alias("__kq"),
                      F.col("rank").alias("__rq"))
        pairs = (
            pairs
            .withColumn("__kp", F.col("p") + F.col("lcp"))
            .withColumn("__kq", F.col("q") + F.col("lcp"))
            .join(rp, "__kp", "left")
            .join(rq, "__kq", "left")
            .withColumn(
                "lcp",
                F.when(
                    F.col("__rp").isNotNull()
                    & (F.col("__rp") == F.col("__rq")),
                    F.col("lcp") + L,
                ).otherwise(F.col("lcp")),
            )
            .select("sa_rank", "p", "q", "lcp")
            .localCheckpoint(eager=False)
        )
    return pairs.select(
        "sa_rank", F.col("p").alias("pos"), F.col("q").alias("next_pos"),
        "lcp",
    )


def bwt_runs(
    tokens: DataFrame,
    pos_col: str = "pos",
    tok_col: str = "token",
    n: int | None = None,
) -> DataFrame:
    """Burrows-Wheeler compressibility probe: the BWT permutes the
    token stream by suffix rank (bwt[i] = token BEFORE the i-th
    smallest suffix, cyclically), clustering equal tokens that share a
    following context — its RUN COUNT is a direct, model-free
    compressibility/repetitiveness measure of a corpus (the r in
    r-index literature).  Boilerplate-heavy crawl slices show far
    fewer runs per token than organic text.

    Adjacency in rank order is an equi-join on (sa_rank, sa_rank-1) —
    no global-order window.  Returns ONE row: (n, n_runs,
    runs_permille).
    """
    if n is None:
        n = tokens.count()
    sa = suffix_array(tokens, pos_col, tok_col, n=n)
    toks = tokens.select(F.col(pos_col).alias("__tp"),
                         F.col(tok_col).alias("__tv"))
    prev_pos = F.when(F.col(pos_col) == 1, F.lit(n)).otherwise(
        F.col(pos_col) - 1
    )
    bwt = sa.withColumn("__tp", prev_pos).join(toks, "__tp").select(
        F.col("sa_rank"), F.col("__tv").alias("bwt")
    )
    nxt = bwt.select((F.col("sa_rank") - 1).alias("sa_rank"),
                     F.col("bwt").alias("__nb"))
    eq = bwt.join(nxt, "sa_rank").filter(
        F.col("bwt") == F.col("__nb")
    ).count()
    n_runs = n - eq
    return tokens.sparkSession.createDataFrame(
        [(n, n_runs, (1000 * n_runs) // max(n, 1))],
        "n long, n_runs long, runs_permille long",
    )


def exact_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """ExactSubstr duplicated spans, EXACTLY (Lee et al. 2022 §4.1):
    concatenate the corpus into one token stream with a unique sentinel
    between documents, build the suffix array + LCP array, and every
    adjacent-suffix pair with lcp >= k witnesses a duplicated
    substring; the witness intervals [p, p+lcp) mapped back to
    documents and interval-merged per doc are precisely the maximal
    duplicated regions of length >= k — no windowed approximation
    (:func:`crawlspark.textops.dedup.duplicate_spans` is the k-gram
    window form; this is the suffix-structure ground truth it
    approximates).

    Sentinels are per-doc unique tokens, so no common prefix ever
    crosses a document boundary (two sentinels never match) — every
    witness interval lies inside one document by construction.  Doc
    offsets come from the two-phase distributed prefix sum; the final
    merge is a per-doc partitioned window.  Returns (id, span_start,
    span_end, span_len) — token indices, 1-based, end exclusive.
    """
    from pyspark.sql import Window

    from ..ranks import global_prefix_sum

    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    docs = df.select(F.col(id_col).alias("__id"), toks.alias("__tk"))
    docs = docs.withColumn("__cnt", F.size("__tk")).withColumn(
        "__cntp1", (F.col("__cnt") + 1).cast("long")
    )
    offs = global_prefix_sum(
        docs.select("__id", "__cntp1"), ["__id"], "__cntp1", out="__doc_off"
    )
    d = docs.join(offs.select("__id", "__doc_off"), "__id")
    body = d.select(
        F.col("__id"),
        F.posexplode("__tk").alias("__i0", "token"),
        F.col("__doc_off"),
    ).select(
        "__id",
        (F.col("__i0") + 1).alias("tok_idx"),
        (F.col("__doc_off") + F.col("__i0") + 1).alias("pos"),
        "token",
    )
    sentinels = d.select(
        F.col("__id"),
        F.lit(None).cast("long").alias("tok_idx"),
        (F.col("__doc_off") + F.col("__cnt") + 1).alias("pos"),
        F.concat(F.lit("⟂"), F.col("__id").cast("string"))
        .alias("token"),
    )
    stream = body.unionByName(sentinels).localCheckpoint(eager=False)
    n = stream.count()
    lcps = lcp_array(stream.select("pos", "token"), n=n)
    wit = lcps.filter(F.col("lcp") >= k)
    ivals = wit.select(
        F.col("pos").alias("p"), F.col("lcp")
    ).unionByName(
        wit.select(F.col("next_pos").alias("p"), F.col("lcp"))
    )
    mapped = ivals.join(
        body.select("__id", "tok_idx", F.col("pos").alias("p")), "p"
    ).select(
        F.col("__id"), F.col("tok_idx").alias("__s"),
        (F.col("tok_idx") + F.col("lcp")).alias("__e"),
    ).distinct()
    w_prev = (
        Window.partitionBy("__id").orderBy("__s", "__e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    island_start = F.when(
        F.col("__s") > F.coalesce(F.max("__e").over(w_prev), F.lit(0)),
        F.lit(1),
    ).otherwise(F.lit(0))
    w_run = (
        Window.partitionBy("__id").orderBy("__s", "__e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = mapped.withColumn("__isl", F.sum(island_start).over(w_run))
    return (
        grouped.groupBy("__id", "__isl")
        .agg(F.min("__s").alias("span_start"), F.max("__e").alias("span_end"))
        .select(
            F.col("__id").alias(id_col),
            F.col("span_start").cast("long"),
            F.col("span_end").cast("long"),
            (F.col("span_end") - F.col("span_start")).cast("long")
            .alias("span_len"),
        )
    )
