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
    if n is None:
        n = tokens.count()
    # round 0: dense rank of the single token
    tok_rank = global_rank(
        tokens.select(tok_col).distinct(), tok_col, out="__r"
    )
    cur = tokens.join(tok_rank, tok_col).select(
        F.col(pos_col).alias("pos"), F.col("__r").alias("rank")
    ).localCheckpoint(eager=False)
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
        mx = cur.agg(F.max("rank").alias("m")).collect()[0].m
        k *= 2
        if mx >= n:
            break
    # final tie-break by position (no-op when all ranks distinct)
    return global_rank(cur, ["rank", "pos"], out="sa_rank").select(
        F.col("pos").alias(pos_col), F.col("sa_rank")
    )
