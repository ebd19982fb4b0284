"""Capacity planning for 100 TB crawls: partition sizing + skew forecast.

At cluster scale the two knobs that decide whether a crawl wave runs or
falls over are (a) how many shuffle partitions each stage gets relative
to its byte volume and (b) how unevenly those bytes land on reducers.
This module computes both FROM DATA, the way an AQE-style planner would:

- ``partition_sizing``: per group (host / source), total bytes and the
  number of target-sized partitions that volume needs, plus the
  AQE-style classification (``split`` when a single group exceeds the
  skewed-partition threshold, ``coalesce`` when it is a small fraction
  of the target, ``ok`` otherwise).  This is exactly the arithmetic
  behind ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` /
  ``skewedPartitionThresholdInBytes``, surfaced as a plan so a crawl
  operator can size ``spark.sql.shuffle.partitions`` before the big
  shuffle instead of discovering OOM mid-wave.

- ``shuffle_skew_forecast``: forecast per-reducer byte load under a
  sorted round-robin (LPT-flavoured) assignment of groups to ``P``
  buckets — heaviest group to bucket 0, next to bucket 1, ... wrapping.
  Reports each bucket's forecast bytes and its load factor vs the ideal
  ``total/P``.  Hash partitioning can stack two hot hosts on one
  reducer; rank-round-robin bounds the max bucket by
  ``max(heaviest group, ~total/P + heaviest)`` and is what the salted
  repartition in the frontier approximates.

- ``capacity_summary``: one-row cluster-sizing read-out — total bytes,
  recommended shuffle partitions (integer-exact ceil), the forecast max
  reducer load under round-robin, and the skew ratio max/ideal.

All arithmetic is integer-exact (``(n + t - 1) div t`` ceils, no float
rounding) so the DuckDB oracle reproduces it bit-for-bit.  Everything
is plain DataFrame expressions — one groupBy per plan, one small window
over the per-group aggregate (|groups| rows, not |data| rows), nothing
per-row in Python.

reference: crwlrsoft/crawler has no cluster planner (single PHP process,
src/Crawler.php:251-276); this module is part of the engine-side scale
additions the north_rule asks for (explicit partitioning / skew
handling for a 10^10-URL frontier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def partition_sizing(
    df: DataFrame,
    group_col: str,
    bytes_col: str,
    target_bytes: int,
    small_frac_pct: int = 20,
) -> DataFrame:
    """Per-group byte volume -> partitions needed at ``target_bytes``.

    ``parts_needed`` = integer ceil(total_bytes / target_bytes), min 1.
    ``size_class``: ``split`` if the group alone is > 2x target (AQE's
    skewed-partition rule: one hash bucket would blow the advisory
    size and must be split), ``coalesce`` if < small_frac_pct% of
    target (many such groups should share a partition), else ``ok``.
    """
    t = int(target_bytes)
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(bytes_col).cast("long").alias("total_bytes"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    parts = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"(total_bytes + {t - 1}) div {t}"),
    )
    return agg.select(
        "grp",
        "total_bytes",
        "n_rows",
        parts.alias("parts_needed"),
        F.when(F.col("total_bytes") > F.lit(2 * t), F.lit("split"))
        .when(
            F.col("total_bytes") * F.lit(100) < F.lit(small_frac_pct * t),
            F.lit("coalesce"),
        )
        .otherwise(F.lit("ok"))
        .alias("size_class"),
    )


def shuffle_skew_forecast(
    df: DataFrame,
    group_col: str,
    bytes_col: str,
    num_buckets: int,
) -> DataFrame:
    """Forecast per-reducer bytes under sorted round-robin placement.

    Groups are ranked by total bytes descending (group name as the
    deterministic tiebreak) and assigned bucket ``(rank-1) % P``.  The
    window runs over the per-group AGGREGATE (|groups| rows), not the
    data, so the single-partition window is bounded by the number of
    hosts — the same bounded-funnel discipline as ranks.py.

    ``load_pct_of_ideal`` is integer-exact: bucket_bytes * 100 * P /
    total_bytes, floored.
    """
    p = int(num_buckets)
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(bytes_col).cast("long").alias("grp_bytes")
    )
    w = Window.orderBy(F.col("grp_bytes").desc(), F.col("grp"))
    placed = agg.withColumn(
        "bucket", ((F.row_number().over(w) - F.lit(1)) % F.lit(p)).cast("int")
    )
    per_bucket = placed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("grp_bytes").alias("bucket_bytes"),
        F.max("grp_bytes").alias("heaviest_group_bytes"),
    )
    total = placed.agg(F.sum("grp_bytes").alias("total_bytes"))
    return per_bucket.crossJoin(F.broadcast(total)).select(
        "bucket",
        "n_groups",
        "bucket_bytes",
        "heaviest_group_bytes",
        F.expr(f"(bucket_bytes * 100 * {p}) div total_bytes").alias(
            "load_pct_of_ideal"
        ),
    )


def capacity_summary(
    df: DataFrame,
    group_col: str,
    bytes_col: str,
    target_bytes: int,
    num_buckets: int,
) -> DataFrame:
    """One-row sizing read-out for a wave: totals, recommended shuffle
    partition count, and the round-robin max-reducer forecast."""
    t = int(target_bytes)
    fore = shuffle_skew_forecast(df, group_col, bytes_col, num_buckets)
    totals = df.agg(
        F.sum(bytes_col).cast("long").alias("total_bytes"),
        F.countDistinct(group_col).alias("n_groups"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    skew = fore.agg(
        F.max("bucket_bytes").alias("max_bucket_bytes"),
        F.max("load_pct_of_ideal").alias("max_load_pct_of_ideal"),
    )
    return totals.crossJoin(F.broadcast(skew)).select(
        "total_bytes",
        "n_groups",
        "n_rows",
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"(total_bytes + {t - 1}) div {t}"),
        ).alias("recommended_shuffle_partitions"),
        "max_bucket_bytes",
        "max_load_pct_of_ideal",
    )


def hill_alpha(
    sizes: DataFrame,
    size_col: str = "n",
    k: int = 100,
) -> DataFrame:
    """Hill tail-index estimate of the host-size distribution — the
    number that says HOW skewed the crawl actually is (Hill, Ann.
    Statist. 1975; web host sizes are famously Zipf-ish with alpha
    near 1).  Capacity planning consumes it directly: alpha < 1 means
    the top hosts hold a diverging share of all URLs, so per-host
    politeness (not fleet size) bounds crawl time and salting the top
    buckets is mandatory, while alpha >> 1 means adding executors
    scales nearly linearly.

        alpha_hat = k / sum_{i=1..k} ln(x_(i) / x_(k+1))

    over the k largest sizes x_(1) >= ... >= x_(k+1).  Per-row LN is
    quantized to MICRO units before the sum, so the aggregate is
    integer-exact (summation-order-proof) and SQL-replayable; only the
    final division is floating point.  The input is the per-host
    aggregate (hosts << URLs); the top-(k+1) cut is a sort-limit on
    that small relation — rows beyond k+1 never shuffle.

    Returns one row (k, x_tail, sum_ln_micro, alpha_milli).
    """
    topk = (
        sizes.select(F.col(size_col).cast("long").alias("x"))
        .orderBy(F.desc("x"))
        .limit(int(k) + 1)
    )
    tail = topk.orderBy("x").limit(1).select(F.col("x").alias("x_tail"))
    joined = topk.crossJoin(F.broadcast(tail)).filter(
        F.col("x") > F.col("x_tail"))
    ln_micro = F.round(
        1e6 * F.log(F.col("x").cast("double") / F.col("x_tail")), 0
    ).cast("long")
    return (
        joined.groupBy("x_tail")
        .agg(F.count(F.lit(1)).alias("k"),
             F.sum(ln_micro).cast("long").alias("sum_ln_micro"))
        .select(
            "k", "x_tail", "sum_ln_micro",
            F.round(
                1e3 * F.col("k").cast("double")
                / (F.col("sum_ln_micro").cast("double") / 1e6), 0
            ).cast("long").alias("alpha_milli"),
        )
    )


def gini_coefficient(
    sizes: DataFrame,
    key_col: str = "host",
    size_col: str = "n",
) -> DataFrame:
    """Gini coefficient of a size distribution — the one-number
    inequality read-out next to :func:`hill_alpha`'s tail exponent:
    G near 0 means bytes/URLs spread evenly across hosts (fleet
    parallelism wins), G near 1 means a handful of hosts hold nearly
    everything (per-host politeness is the wall and salting/budget
    caps are mandatory).

        G = (2 * sum(i * x_(i)) - (n + 1) * sum(x)) / (n * sum(x))

    over sizes sorted ascending with 1-based ranks.  Ranks come from
    the two-phase :func:`crawlspark.ranks.global_rank` on the
    (size, key) composite (distinct by construction — NO
    single-partition window), both sums are integer-exact, and only
    the final ratio is floating point.  Returns one row (n, total,
    gini_milli); NULL gini for empty/zero-total input.
    """
    from .ranks import global_rank

    s = sizes.select(F.col(key_col).alias("k"),
                     F.col(size_col).cast("long").alias("x"))
    ranked = global_rank(s, ["x", "k"], out="i")
    sums = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("total"),
        F.sum(F.col("i") * F.col("x")).cast("long").alias("s1"),
    )
    g = (
        (2.0 * F.col("s1") - (F.col("n") + 1.0) * F.col("total"))
        / (F.col("n").cast("double") * F.col("total"))
    )
    return sums.select(
        "n", "total",
        F.when((F.col("n") > 0) & (F.col("total") > 0),
               F.round(1e3 * g, 0).cast("long")).alias("gini_milli"),
    )


CRAWL_STAGES = (
    # stage, rows_factor (x frontier), bytes_per_row, shuffles
    ("expand", 4.0, 24, 1),        # 4-way explode -> groupBy-min combine
    ("dedup_min", 4.0, 24, 0),     # map-side partial of the same shuffle
    ("seen_antijoin", 1.0, 16, 1), # candidates vs seen on doc key
    ("global_rank", 1.0, 24, 1),   # two-phase range partition
    ("politeness_wave", 1.0, 48, 1),  # host-bucket repartition + sort
    ("fetch_results", 1.0, 65536, 0),  # mapInPandas, no shuffle
    ("image_validate", 1.0, 65536, 0),  # fused Arrow stage
    ("sink_append", 1.0, 65536, 0),     # partitioned write
)


def crawl_scale_plan(
    spark,
    frontier_rows: int,
    executors: int = 1000,
    cores_per_executor: int = 4,
    target_partition_bytes: int = 128 << 20,
    prefilter_cut_permille: int = 800,
) -> "DataFrame":
    """The 100 TB crawl-DAG plan AS A TABLE — per BFS-loop stage, the
    row/byte volumes, whether it shuffles, the partition count the
    sizing rule picks, and the per-core wave count on the given fleet:
    the numbers a capacity review reads off `.explain()` plus math,
    emitted as data so the review is a QUERY, not a meeting.  The
    stage model mirrors frontier.py's loop (4-way expand, map-side
    combined dedup, the cuckoo-prefiltered anti-join — its exchange
    volume cut applied as measured in BENCH — two-phase rank, the
    host-bucket politeness sort) and the image pipeline's fused Arrow
    stages.

    Everything integer; one literal-relation DataFrame (stage count
    rows — driver-built by design).  Returns (stage, rows, bytes,
    shuffles, shuffle_bytes, n_partitions, partitions_per_core_wave).
    """
    total_cores = int(executors) * int(cores_per_executor)
    rows_out = []
    for stage, rf, bpr, sh in CRAWL_STAGES:
        rows = int(frontier_rows * rf)
        byts = rows * bpr
        shuffle_bytes = byts * sh
        if stage == "seen_antijoin":
            shuffle_bytes = (shuffle_bytes
                             * (1000 - int(prefilter_cut_permille))
                             // 1000)
        n_part = max(
            total_cores,
            -(-shuffle_bytes // int(target_partition_bytes))
            if shuffle_bytes else total_cores,
        )
        waves = -(-n_part // total_cores)
        rows_out.append((stage, rows, byts, sh, shuffle_bytes,
                         int(n_part), int(waves)))
    return spark.createDataFrame(
        rows_out,
        "stage string, rows long, bytes long, shuffles int, "
        "shuffle_bytes long, n_partitions long, "
        "partitions_per_core_wave long",
    )


def encoding_advisor(
    df: "DataFrame",
    columns: list[str],
    part_col: str,
    order_col: str,
    dict_max_distinct_permille: int = 100,
    rle_min_run_permille: int = 500,
) -> "DataFrame":
    """Parquet encoding advisor over a table sample: per column, the two
    signals that decide physical encoding at write time — cardinality
    (dictionary pages win while the dictionary stays small relative to
    the data) and local run structure (RLE wins when adjacent rows
    repeat under the table's write order).  At a 10^10-row results
    table the difference between DICTIONARY and PLAIN on a hot string
    column is the difference between scanning gigabytes and terabytes;
    this advisor is the job you run on one day's sample before fixing
    the sink's layout.

    ``run_permille`` is measured within (part_col ORDER BY order_col)
    windows — the same clustered order a bucketed `WRITE ORDERED BY`
    sink produces, and a PARTITIONED window (no global sort funnel).
    Returns one row per column: (col_name, n_rows, n_distinct,
    distinct_permille, run_permille, recommended).
    """
    from pyspark.sql import Window

    # ONE table pass: every column's string view + repeat flag ride the
    # same (part, order) window (one physical sort), one aggregate holds
    # all per-column stats, and stack() unpivots — a per-column loop of
    # scans/sorts would pay the full I/O once per advised column
    w = Window.partitionBy(part_col).orderBy(order_col)
    proj = df.select(
        F.col(part_col), F.col(order_col),
        *[F.col(c).cast("string").alias(f"__v_{i}")
          for i, c in enumerate(columns)],
    )
    for i in range(len(columns)):
        proj = proj.withColumn(
            f"__r_{i}",
            F.col(f"__v_{i}") == F.lag(f"__v_{i}").over(w),
        )
    agg = proj.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        *[F.countDistinct(f"__v_{i}").cast("long").alias(f"__d_{i}")
          for i in range(len(columns))],
        *[F.sum(F.when(F.col(f"__r_{i}"), 1).otherwise(0)).cast("long")
          .alias(f"__rep_{i}")
          for i in range(len(columns))],
    )
    stack_args = ", ".join(
        f"'{c}', __d_{i}, __rep_{i}" for i, c in enumerate(columns)
    )
    stats = agg.select(
        F.col("__n").alias("n_rows"),
        F.expr(f"stack({len(columns)}, {stack_args})")
        .alias("col_name", "n_distinct", "__n_rep"),
    )
    return stats.select(
        "col_name", "n_rows", "n_distinct",
        F.expr("(1000 * n_distinct) div n_rows").alias("distinct_permille"),
        F.expr("(1000 * __n_rep) div n_rows").alias("run_permille"),
    ).withColumn(
        "recommended",
        F.when(F.col("distinct_permille") < dict_max_distinct_permille,
               F.lit("dictionary"))
        .when(F.col("run_permille") > rle_min_run_permille, F.lit("rle"))
        .otherwise(F.lit("plain")),
    )
