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


# ---------------------------------------------------------------------------
# HyperLogLog register relation
# ---------------------------------------------------------------------------
#
# The third sketch of the family: where KMV keeps the k smallest hashes,
# HLL (Flajolet et al., AofA'07) keeps per bucket only the MAXIMUM
# leading-zero run — m integer registers per group, mergeable by
# cellwise max, which in DataFrame form is exactly a map-side-combined
# groupBy(grp, bucket).agg(max(rho)).  Spark's own approx_count_distinct
# IS HLL++ — but its state lives inside an opaque aggregation buffer
# that cannot be persisted, merged across crawl waves, or unioned with
# yesterday's registers.  The REGISTER RELATION here is the persistable
# form: store (grp, bucket, rho) per wave, merge waves by groupBy-max,
# estimate at read time — the incremental-distinct shape a 10^10-URL
# frontier needs (distinct URLs per host across all history, without
# ever re-scanning history).
#
# Hashing: NOT the CMS/KMV affine family — (A*k+B) mod P is
# equidistributed but has no avalanche, and HLL's max-leading-zero
# statistic reads exactly the fine bit structure an affine map gets
# wrong (measured: +70% bias on 50k sequential keys).  HLL uses the
# repo's other SQL-replayable hash, the md5 32-bit prefix
# (textops.dedup.base_hash), which is avalanche-quality on both
# engines.  With b bucket bits the remaining word has W = 32 - b
# usable bits: bucket = h mod 2^b, w = h div 2^b,
# rho = W - len(bin(w)) + 1 for w > 0 (bin() — minimal binary string —
# exists in BOTH Spark and DuckDB, making the leading-zero count plain
# integer/string arithmetic), and rho = W + 1 for w = 0.  The estimator
# is the raw HLL harmonic mean, integer-quantized: with K = 32,
# denom = sum over registers of 2^(K - rho) plus 2^K per never-touched
# bucket (K = 32 > max rho, so every term is a positive integer),
# est = alpha_permyriad * m^2 * 2^K div (10000 * denom).  No
# small-range linear-counting correction — that is a read-time float
# polish, deliberately left out of the mergeable relation (documented
# divergence from HLL++; the tests pin the asymptotic regime).  b <= 8
# keeps every intermediate under 2^63 (overflow-checked in tests).

_HLL_ALPHA_PERMYRIAD = {16: 6730, 32: 6970, 64: 7090}  # else 7213 (m>=128)


def hll_rho(h, b: int):
    """Leading-zero rank of the post-bucket word: h div 2^b == 0 -> W+1,
    else W - length(bin(word)) + 1, W = 32 - b."""
    # h is nonnegative (< 2^32), so a right shift IS integer div by 2^b
    word = F.shiftright(h.cast("long"), b)
    wbits = 32 - b
    return F.when(word == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits) - F.length(F.bin(word)) + 1
    ).cast("int")


def hll_build(df: DataFrame, group_col: str, key_col: str, b: int = 6) -> DataFrame:
    """Per-group HLL registers: (grp, bucket, rho) with rho the max
    leading-zero rank seen in the bucket.  ONE map-side-combined groupBy
    — partial aggregation merges per-partition register arrays exactly
    as a cellwise max would.  Untouched buckets are absent rows (the
    estimator charges them 2^K each); register count per group is
    <= m = 2^b regardless of group size.

    Pass the SAME ``b`` to :func:`hll_estimate` — the register relation
    does not carry it (see the loud-failure guard there)."""
    from .textops.dedup import base_hash

    if not 4 <= b <= 8:
        raise ValueError("b must be in [4, 8] (integer-exact estimator range)")
    h = base_hash(F.col(key_col).cast("string"))
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.pmod(h, F.lit(1 << b)).cast("int").alias("bucket"),
            hll_rho(h, b).alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b_sk: DataFrame) -> DataFrame:
    """Merge two register relations (e.g. yesterday's seen-set registers
    with today's wave): union -> groupBy max.  Lossless: merge(build(A),
    build(B)) == build(A union B) by max associativity — asserted
    bit-for-bit in tests."""
    return (
        a.select("grp", "bucket", "rho")
        .unionByName(b_sk.select("grp", "bucket", "rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, b: int = 6) -> DataFrame:
    """Integer-exact raw-HLL estimate per group: (grp, n_registers,
    est).  K = 32 scaling; absent buckets contribute 2^K each via
    (m - n_registers) * 2^K added to the summed denominator.

    ``b`` MUST match the ``b`` the registers were built with
    (:func:`hll_build`) — the register relation does not carry it.  A
    mismatch is caught loudly at execution time: any bucket id >= 2^b
    proves the registers were built with a larger ``b`` and the job
    fails with a clear message instead of silently returning a wrong
    cardinality.  (The converse — estimating with a LARGER ``b`` than
    the build — is structurally undetectable from bucket ids alone;
    keep build/estimate paired through one config value.)
    """
    m = 1 << b
    alpha = _HLL_ALPHA_PERMYRIAD.get(m, 7213)
    k_scale = 1 << 32
    return (
        registers.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_registers"),
            F.sum(F.expr("shiftleft(1L, 32 - rho)"))
            .cast("long").alias("__denom_hit"),
            F.max("bucket").cast("long").alias("__max_bucket"),
        )
        .select(
            "grp",
            "n_registers",
            F.when(
                F.col("__max_bucket") >= m,
                F.assert_true(
                    F.lit(False),
                    F.lit(
                        f"hll_estimate(b={b}): register relation has "
                        f"bucket >= {m}; registers were built with a "
                        "larger b than the estimate was asked for"
                    ),
                ).cast("long"),
            ).otherwise(F.expr(
                f"({alpha}L * {m}L * {m}L * {k_scale}L) div "
                f"(10000L * (__denom_hit + ({m}L - n_registers) * {k_scale}L))"
            )).alias("est"),
        )
    )
