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
    key: str,
    out: str = "rank",
    num_rows: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Add 1-based dense global rank ``out`` ordered by unique column ``key``.

    Assumes ``key`` values are distinct (the BFS rank key is distinct by
    construction: min over a set of unique (parent_ord, pos) pairs).
    """
    if num_rows is not None and num_rows <= SMALL_LEVEL_ROWS:
        w = Window.orderBy(key)
        return df.withColumn(out, F.row_number().over(w).cast("long"))

    parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, F.col(key)).persist()
    try:
        sizes = (
            ranged.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid")
            .count()
            .collect()
        )
        counts = {r["__pid"]: r["count"] for r in sizes}
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        spark = df.sparkSession
        off_df = F.broadcast(
            spark.createDataFrame(
                [(int(p), int(o)) for p, o in offsets.items()], "__pid INT, __off LONG"
            )
        )
        w = Window.partitionBy("__pid").orderBy(key)
        out_df = (
            ranged.withColumn("__pid", F.spark_partition_id())
            .join(off_df, "__pid")
            .withColumn(out, (F.col("__off") + F.row_number().over(w)).cast("long"))
            .drop("__pid", "__off")
        )
        # materialize once, then release the range-partitioned intermediate;
        # callers get an already-checkpointed DF (no second materialization)
        out_df = out_df.localCheckpoint(eager=True)
        ranged.unpersist()
        return out_df
    except Exception:
        ranged.unpersist()
        raise
