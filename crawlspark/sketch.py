"""Count-min sketch over DataFrames — bounded-memory frequency summaries
for the frontier's hot-host accounting.

Why a sketch at all: exact per-host counts at 10^10-URL scale are a
groupBy over 10^8+ distinct hosts — fine as a batch job, too expensive to
keep CURRENT inside a scheduler loop that only needs "is this host hot
enough to salt / throttle".  A count-min sketch is d x w integer cells
(kilobytes), mergeable across partitions by cell-wise addition, never
undercounts, and overcounts only by collision mass (<= N/w in
expectation per row, min over d rows).  The reference has no corpus
view at all (per-request throttling only,
src/Loader/Http/Politeness/Throttler.php); this is the distributed
summary a 1000-executor scheduler would broadcast.

Hashes are pairwise-independent multiply-shift over a Mersenne prime:
h_i(k) = ((A_i * k + B_i) mod P) mod w, P = 2^31 - 1; k is reduced mod P
before the multiply so any 64-bit key stays overflow-free (same
function, modular arithmetic).  DELIBERATELY xxhash-free: every
operation is plain integer arithmetic a SQL oracle replays exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P = (1 << 31) - 1
# fixed coefficients (odd, < P) — stability across runs is part of the
# contract: a sketch built yesterday must merge with one built today
CMS_A = [1103515245, 22695477, 134775813, 1664525, 69069]
CMS_B = [12345, 1013904223, 1, 1013904242, 362437]


def _bucket(key, i: int, width: int):
    # key mod P before the multiply: same function (modular arithmetic),
    # but A*(k mod P) < 2^62 never overflows on 64-bit keys (see kmv_hash)
    return F.pmod(
        F.pmod(
            F.lit(CMS_A[i]) * F.pmod(key, F.lit(_P)) + F.lit(CMS_B[i]),
            F.lit(_P),
        ),
        F.lit(int(width)),
    ).cast("long")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch: one (row, bucket, cnt) relation of at most
    depth x width cells.  Shape: explode each input row into its d
    (row, bucket) cells, then ONE map-side-combined groupBy — partial
    aggregation does the merge that a cellwise array-add would do, so
    'build per partition then merge' is exactly what Spark executes.
    Any 64-bit key is accepted (reduced mod P before hashing).
    """
    k = F.col(key_col).cast("long")
    cells = F.array(*[
        F.struct(F.lit(i).alias("row"), _bucket(k, i, width).alias("bucket"))
        for i in range(int(depth))
    ])
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point estimates for a set of keys: join each key's d cells
    against the sketch, take the min.  The sketch side is O(d x w) —
    broadcast it; estimates NEVER undercount (min over rows of sums
    that each include the key's true mass), asserted in tests.
    """
    k = F.col(key_col).cast("long")
    probes = keys.select(
        key_col,
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"),
                     _bucket(k, i, width).alias("bucket"))
            for i in range(int(depth))
        ])).alias("c"),
    ).select(key_col, F.col("c.row").alias("row"),
             F.col("c.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(cms), ["row", "bucket"], "left").select(
        key_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("est"))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch
# ---------------------------------------------------------------------------
#
# Bounded-memory DISTINCT counting, the companion to the count-min
# frequency cells above: per group keep only the k smallest hash values
# of the keys seen; |distinct| is then estimated from how deep into the
# hash space those k values reach (Bar-Yossef et al., "Counting distinct
# elements in a data stream", RANDOM'02; the KMV estimator analysed in
# Beyer et al., SIGMOD'07).  Exact per-host distinct-URL counts at
# 10^10-URL scale are a full shuffle over every URL; the KMV sketch is
# <= k rows per host, mergeable by "union then re-take the k smallest"
# — which is exactly a map-side-combined groupBy in Spark — and never
# degrades below exactness while a group has < k distinct keys.
#
# Same deliberately-SQL-replayable hash family as the CMS: h(x) =
# (A*x + B) mod P over the Mersenne prime P = 2^31 - 1, plain integer
# arithmetic on both engines.  Estimator (integer-exact): with the k-th
# smallest hash at h_k, est = (k-1) * P div (h_k + 1); below saturation
# the sketch holds every distinct hash, so est = n_kept exactly.

KMV_A = CMS_A[0]
KMV_B = CMS_B[0]


def kmv_hash(key):
    """The sketch hash: (A*key + B) mod P, P = 2^31-1, for ANY 64-bit
    key: reducing the key mod P BEFORE the multiply keeps the product
    under A*P < 2^62 (no ANSI overflow on 10^10-scale node ids or
    negative xxhash64 fingerprints) and is the mathematically identical
    function — (A*(k mod P) + B) mod P == (A*k + B) mod P — so SQL
    oracles replaying the plain form on small keys still match."""
    return F.pmod(
        F.lit(KMV_A) * F.pmod(key.cast("long"), F.lit(_P)) + F.lit(KMV_B),
        F.lit(_P),
    )


def kmv_build(df: DataFrame, group_col: str, key_col: str, k: int = 64) -> DataFrame:
    """Build per-group KMV sketches: (grp, h) rows, at most ``k`` per
    group, h the smallest k distinct key-hashes.  One partitioned
    row_number over the distinct hashes — the distinct() is map-side
    combined, so a hot host reduces to its distinct hashes before the
    rank; state is O(groups x k) forever after.
    """
    from pyspark.sql import Window

    hashed = df.select(
        F.col(group_col).alias("grp"),
        kmv_hash(F.col(key_col)).alias("h"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .drop("rn")
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Merge two sketch relations: union, dedup, re-take the k smallest
    per group.  merge(build(X), build(Y)) == build(X ∪ Y) exactly
    (asserted in tests) — the property that lets every partition build
    its own sketch and a single reduce produce the global one."""
    from pyspark.sql import Window

    u = a.unionByName(b).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    return (
        u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .drop("rn")
    )


def kmv_estimates(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Per-group distinct estimates from the sketch rows:
    (grp, n_kept, kth_hash, est) — exact (= n_kept) below saturation,
    (k-1) * P div (kth_hash + 1) at saturation.  Never a float."""
    return sketch.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("h").cast("long").alias("kth_hash"),
    ).select(
        "grp", "n_kept", "kth_hash",
        F.when(
            F.col("n_kept") < int(k), F.col("n_kept")
        ).otherwise(
            F.expr(f"({int(k) - 1} * {_P}L) div (kth_hash + 1)")
        ).cast("long").alias("est"),
    )


def kmv_overlap(
    a: DataFrame,
    b: DataFrame,
    key_col: str = "key",
    k: int = 64,
) -> DataFrame:
    """KMV set algebra between two key sets — the sketch answer to
    "how much of wave B did wave A already crawl?" at 10^10-URL scale,
    where the exact answer is a full shuffle join of both snapshots.

    Estimators (all integer-exact, SQL-replayable):

    - est_a / est_b / est_union: the KMV distinct estimator on each
      set and on their union (merge = union-then-re-min, so the union
      sketch is exact sketch algebra, not a rescan);
    - jaccard_permille: the k-minimum-values Jaccard estimator
      (Broder's MinHash argument, Beyer et al. SIGMOD'07 §5) — of the
      k smallest hashes of A ∪ B, the fraction present in BOTH sets;
    - est_intersection: jaccard * est_union (the standard composition;
      unbiased where inclusion-exclusion on three noisy estimates is
      not).

    Plan shape: each side reduces to <= k rows via per-partition
    distinct + global TakeOrderedAndProject(k) — bounded at any input
    size, no single-partition window; the membership probes join the
    k-row k-min block (broadcast) against the two <= k-row sketches.

    Returns ONE row: (n_kmin, kmin_in_both, jaccard_permille, est_a,
    est_b, est_union, est_intersection).
    """
    def _sketch(df: DataFrame) -> DataFrame:
        return (
            df.select(kmv_hash(F.col(key_col)).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(int(k))
        )

    ha = _sketch(a).persist()
    hb = _sketch(b).persist()
    union_kmin = (
        ha.unionByName(hb).distinct().orderBy("h").limit(int(k))
    )
    flagged = (
        union_kmin
        .join(F.broadcast(ha.withColumn("in_a", F.lit(1))), "h", "left")
        .join(F.broadcast(hb.withColumn("in_b", F.lit(1))), "h", "left")
    )

    def _est(sk: DataFrame, name: str) -> DataFrame:
        return kmv_estimates(
            sk.select(F.lit(name).alias("grp"), "h"), k=k
        ).select(F.col("est").alias(name))

    jac = flagged.agg(
        F.count("*").cast("long").alias("n_kmin"),
        F.sum(
            (F.coalesce(F.col("in_a"), F.lit(0))
             * F.coalesce(F.col("in_b"), F.lit(0))).cast("long")
        ).alias("kmin_in_both"),
    ).withColumn(
        "jaccard_permille",
        F.expr("(1000 * kmin_in_both) div n_kmin"),
    )
    out = (
        jac.crossJoin(_est(ha, "est_a"))
        .crossJoin(_est(hb, "est_b"))
        .crossJoin(_est(union_kmin, "est_union"))
        .withColumn(
            "est_intersection",
            F.expr("(jaccard_permille * est_union) div 1000"),
        )
    )
    return out.select(
        "n_kmin", "kmin_in_both", "jaccard_permille",
        "est_a", "est_b", "est_union", "est_intersection",
    )
