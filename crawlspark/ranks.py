"""Distributed exact global ranking.

Reproducing the reference crawler's sequential crawl order requires a total
order over each BFS level (reference: src/Steps/Loading/HttpCrawl.php:203-236
iterates the frontier in first-discovery order).  A naive
``row_number() OVER (ORDER BY k)`` collapses the level to one partition — fine
for thousands of URLs, fatal for 10^10.  ``global_rank`` computes the same
exact rank with a two-phase plan that stays distributed:

1. range-repartition by the key (so partition i holds keys < partition i+1),
2. per-partition counts -> prefix-sum offsets (tiny, driver-side),
3. intra-partition row_number + offset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# below this many rows, a single-partition window is cheaper than two extra jobs
SMALL_LEVEL_ROWS = 250_000


def global_rank(
    df: DataFrame,
    key: "str | list[str]",
    out: str = "rank",
    num_rows: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Add 1-based dense global rank ``out`` ordered by ``key`` (one column
    or a composite list ordered lexicographically).

    Assumes key values are distinct (the BFS rank key is distinct by
    construction: min over a set of unique (parent_ord, pos) pairs).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if num_rows is not None and num_rows <= SMALL_LEVEL_ROWS:
        w = Window.orderBy(*keys)
        return df.withColumn(out, F.row_number().over(w).cast("long"))

    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *[F.col(k) for k in keys]).persist()
    try:
        return _with_partition_offsets(
            ranged,
            order_cols=keys,
            out=out,
            part_val=F.count(F.lit(1)),
            row_val=lambda w: F.row_number().over(w),
        )
    finally:
        ranged.unpersist()


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    out: str = "prefix",
    num_rows: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Add EXCLUSIVE running sum of ``val_col`` over the total order given by
    ``order_cols`` (distinct composite keys assumed) — the distributed
    replacement for ``sum(...) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING
    TO -1)``, which collapses to a single partition.  Same two-phase shape as
    :func:`global_rank`: range-partition on the order key, per-partition
    sums -> driver prefix offsets, intra-partition running sum + offset."""
    if num_rows is not None and num_rows <= SMALL_LEVEL_ROWS:
        w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, -1)
        return df.withColumn(
            out, F.coalesce(F.sum(F.col(val_col).cast("long")).over(w), F.lit(0))
        )
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *[F.col(c) for c in order_cols]).persist()
    try:
        v = F.col(val_col).cast("long")
        inclusive = _with_partition_offsets(
            ranged,
            order_cols=order_cols,
            out=out,
            part_val=F.sum(v),
            row_val=lambda w: F.sum(v).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        # exclusive = inclusive - own contribution
        return inclusive.withColumn(out, F.col(out) - v)
    finally:
        ranged.unpersist()


def _with_partition_offsets(ranged: DataFrame, order_cols, out: str,
                            part_val, row_val) -> DataFrame:
    """Shared two-phase machinery: per-partition aggregate ``part_val`` ->
    driver-side prefix offsets (tiny: one row per partition) -> broadcast
    offsets + intra-partition window ``row_val``.  Input must already be
    range-partitioned on ``order_cols``; returns a localCheckpointed DF."""
    sizes = (
        ranged.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(part_val.alias("__v"))
        .collect()
    )
    totals = {r["__pid"]: r["__v"] for r in sizes}
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += int(totals[pid] or 0)
    spark = ranged.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "__pid INT, __off LONG"
        )
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out_df = (
        ranged.withColumn("__pid", F.spark_partition_id())
        .join(off_df, "__pid")
        .withColumn(out, (F.col("__off") + row_val(w)).cast("long"))
        .drop("__pid", "__off")
    )
    # materialize once, then release the range-partitioned intermediate;
    # callers get an already-checkpointed DF (no second materialization)
    return out_df.localCheckpoint(eager=True)


def global_rank_and_prefix(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    rank_out: str = "rank",
    prefix_out: str = "prefix",
    num_rows: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Both the 1-based global rank AND the INCLUSIVE running sum of
    ``val_col`` over one total order, in a SINGLE two-phase pass: one
    range repartition, one per-partition aggregate carrying (count, sum)
    together, one intra-partition window computing both columns.  Use
    this when a consumer needs rank and prefix over the same key
    (water-filling) — two separate global_rank + global_prefix_sum
    calls pay the range shuffle and the driver offset round-trip twice.
    """
    v = F.col(val_col).cast("long")
    if num_rows is not None and num_rows <= SMALL_LEVEL_ROWS:
        w = Window.orderBy(*order_cols)
        wi = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return df.withColumn(
            rank_out, F.row_number().over(w).cast("long")
        ).withColumn(prefix_out, F.sum(v).over(wi).cast("long"))
    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(
        parts, *[F.col(c) for c in order_cols]
    ).persist()
    try:
        sizes = (
            ranged.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid")
            .agg(F.count("*").alias("__n"), F.sum(v).alias("__s"))
            .collect()
        )
        counts = {r["__pid"]: (int(r["__n"]), int(r["__s"] or 0))
                  for r in sizes}
        roff, soff = {}, {}
        racc = sacc = 0
        for pid in sorted(counts):
            roff[pid], soff[pid] = racc, sacc
            racc += counts[pid][0]
            sacc += counts[pid][1]
        spark = ranged.sparkSession
        off_df = F.broadcast(spark.createDataFrame(
            [(int(p), roff[p], soff[p]) for p in counts],
            "__pid INT, __roff LONG, __soff LONG",
        ))
        w = Window.partitionBy("__pid").orderBy(*order_cols)
        wi = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = (
            ranged.withColumn("__pid", F.spark_partition_id())
            .join(off_df, "__pid")
            .withColumn(rank_out,
                        (F.col("__roff") + F.row_number().over(w))
                        .cast("long"))
            .withColumn(prefix_out,
                        (F.col("__soff") + F.sum(v).over(wi)).cast("long"))
            .drop("__pid", "__roff", "__soff")
        )
        return out.localCheckpoint(eager=True)
    finally:
        ranged.unpersist()
