"""Per-level crawl checkpoint/resume + lineage.

The reference keeps frontier/seen in process memory (HttpCrawl.php:45-53) —
a crash loses the crawl.  We add what north_rule prescribes: a snapshot per
BFS level (frontier offset, seen state, fetch metrics) with per-partition
lineage, so a killed crawl resumes exactly — identical final seen-set and
ordering (tested in tests/test_checkpoint.py).

Layout (parquet + JSON meta; an Iceberg catalog would swap in transparently
— the content layout is already table-per-concern):

    {dir}/meta.json                  latest completed level + counters
    {dir}/frontier/level={d}/        frontier (doc, ord) at level d
    {dir}/seen/level={d}/            full seen set after level d
    {dir}/results/level={d}/         emitted rows of level d
    {dir}/lineage/level={d}/         per-host_bucket row counts + offsets
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CrawlCheckpoint:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _p(self, kind: str, level: int) -> str:
        return f"{self.root}/{kind}/level={level}"

    # -- write --------------------------------------------------------------
    def save_level(
        self,
        level: int,
        frontier: DataFrame,
        seen: DataFrame,
        results: DataFrame,
        meta: dict,
    ) -> None:
        frontier.write.mode("overwrite").parquet(self._p("frontier", level))
        seen.write.mode("overwrite").parquet(self._p("seen", level))
        results.write.mode("overwrite").parquet(self._p("results", level))
        from .graph import host_id_col

        # host assignment comes from graph.host_id_col (single source of
        # truth: doc % NHOSTS) — a local constant would silently diverge if
        # NHOSTS changes and the lineage counts would stop matching the
        # actual per-host distribution
        lineage = (
            frontier.groupBy(host_id_col(F.col("doc")).alias("host_bucket"))
            .agg(F.count("*").alias("rows"), F.min("ord").alias("min_ord"),
                 F.max("ord").alias("max_ord"))
        )
        lineage.write.mode("overwrite").parquet(self._p("lineage", level))
        tmp = f"{self.root}/meta.json.tmp"
        # snapshot-log entry FIRST (atomic tmp+replace, same discipline as
        # meta.json): the level's full meta (counters included) so rollback
        # can restore the EXACT state.  Writing it before the meta.json
        # commit means a crash in between leaves an uncommitted level with
        # history (harmless) rather than a committed level without (which
        # could never be rolled back to).
        os.makedirs(f"{self.root}/meta_history", exist_ok=True)
        hist = f"{self.root}/meta_history/level={level}.json"
        with open(hist + ".tmp", "w") as f:
            json.dump({"level": level, **meta}, f)
        os.replace(hist + ".tmp", hist)
        with open(tmp, "w") as f:
            json.dump({"level": level, **meta}, f)
        os.replace(tmp, f"{self.root}/meta.json")  # atomic commit of the level

    def save_filter_states(self, level: int, states: DataFrame) -> None:
        """Snapshot the PartitionedSeenFilter's per-bucket cuckoo states
        (north_rule lineage: 'seen-filter state') so resume rehydrates the
        filter instead of rebuilding it from the full seen set."""
        states.write.mode("overwrite").parquet(self._p("seen_filter", level))

    def save_deferred(self, level: int, deferred: DataFrame) -> None:
        """Snapshot the per-host backlog (max_per_host_per_level excess)
        pending for the NEXT level: without it a crash+resume silently
        drops those URLs while an uninterrupted run would crawl them."""
        deferred.write.mode("overwrite").parquet(self._p("deferred", level))

    def load_deferred(self, spark: SparkSession, level: int) -> DataFrame | None:
        path = self._p("deferred", level)
        if not os.path.exists(path):
            return None
        df = spark.read.parquet(path)
        return df if df.limit(1).count() else None

    # -- read ---------------------------------------------------------------
    def load_filter_states(self, spark: SparkSession, level: int) -> DataFrame | None:
        path = self._p("seen_filter", level)
        if not os.path.exists(path):
            return None
        return spark.read.parquet(path)

    def latest(self) -> dict | None:
        path = f"{self.root}/meta.json"
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def load_frontier(self, spark: SparkSession, level: int) -> DataFrame:
        return spark.read.parquet(self._p("frontier", level))

    def load_seen(self, spark: SparkSession, level: int) -> DataFrame:
        return spark.read.parquet(self._p("seen", level))

    def load_results(self, spark: SparkSession, upto_level: int) -> DataFrame:
        dfs = [
            spark.read.parquet(self._p("results", d)) for d in range(upto_level + 1)
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    # -- snapshot management (Iceberg-table semantics on the stand-in) ------
    def snapshots(self) -> list[dict]:
        """Iceberg snapshot listing analog: one entry per committed level,
        flagged with whether it is the current table state.  (A real
        catalog exposes this as the `snapshots` metadata table; the
        level-keyed layout already IS the snapshot log.)"""
        import re as _re

        res_dir = f"{self.root}/results"
        if not os.path.isdir(res_dir):
            return []
        levels = sorted(
            int(m.group(1))
            for d in os.listdir(res_dir)
            if (m := _re.match(r"level=(\d+)$", d))
        )
        cur = (self.latest() or {}).get("level")
        return [{"level": d, "is_current": d == cur} for d in levels]

    def rollback(self, level: int) -> None:
        """Iceberg `rollback_to_snapshot` analog: make ``level`` the
        current state again and expire every later level's data across
        all concerns (frontier/seen/results/lineage/filter/deferred).
        A subsequent resume continues from exactly this snapshot —
        identical final ordering and seen set (tested)."""
        import shutil

        snaps = [s["level"] for s in self.snapshots()]
        if level not in snaps:
            raise ValueError(f"no snapshot at level {level}: have {snaps}")
        hist = f"{self.root}/meta_history/level={level}.json"
        if not os.path.exists(hist):
            raise ValueError(
                f"no meta history for level {level} — checkpoint predates "
                "snapshot logging; cannot restore counters exactly"
            )
        for kind in ("frontier", "seen", "results", "lineage",
                     "seen_filter", "deferred"):
            base = f"{self.root}/{kind}"
            if not os.path.isdir(base):
                continue
            for d in os.listdir(base):
                if d.startswith("level=") and int(d.split("=")[1]) > level:
                    shutil.rmtree(f"{base}/{d}", ignore_errors=True)
        with open(hist) as f:
            meta = json.load(f)
        tmp = f"{self.root}/meta.json.tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, f"{self.root}/meta.json")


def crawl_diff(
    prev: "DataFrame",
    cur: "DataFrame",
    url_col: str = "url",
    hash_col: str = "content_hash",
) -> "DataFrame":
    """Snapshot diff between two crawl generations — the change feed an
    incremental pipeline consumes instead of reprocessing the whole
    corpus: ``added`` (new URL), ``removed`` (gone), ``modified``
    (content hash changed), ``unchanged``.  Downstream, only
    added+modified re-enter extraction/dedup; removed tombstones the
    results table.

    One full-outer equi-join on url (both sides hash-partitioned the
    same way; at Iceberg scale this is the two-snapshot merge-on-read
    shape).  Returns (url, prev_hash, cur_hash, change).
    """
    p = prev.select(F.col(url_col).alias("url"),
                    F.col(hash_col).alias("prev_hash"))
    c = cur.select(F.col(url_col).alias("url"),
                   F.col(hash_col).alias("cur_hash"))
    j = p.join(c, "url", "full_outer")
    change = (
        F.when(F.col("prev_hash").isNull(), F.lit("added"))
        .when(F.col("cur_hash").isNull(), F.lit("removed"))
        .when(F.col("prev_hash") != F.col("cur_hash"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("url", "prev_hash", "cur_hash", change.alias("change"))


def retention_sweep(
    snapshots: "DataFrame",
    keep_last: int,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
) -> "DataFrame":
    """Archive retention: keep the newest ``keep_last`` captures per
    URL, tombstone the rest — the storage GC that bounds a continuously
    re-crawled archive (pair with :func:`crawl_diff`'s ``removed``
    tombstones and the CAS store's refcounts before actually deleting
    payload bytes).  One partitioned window per URL, newest-first; ties
    on fetch_ts (two captures in the same wave, clock-coarse stores)
    break on xxhash64 of the full row, so capture_rank/keep are
    deterministic across runs regardless of partition layout.  Returns
    every row annotated (capture_rank, keep) rather than dropping — the
    sweep job deletes ``NOT keep`` after the CAS refcount check.
    """
    from pyspark.sql import Window

    tiebreak = F.xxhash64(*[F.col(c) for c in snapshots.columns])
    w = Window.partitionBy(url_col).orderBy(F.desc(ts_col), F.desc(tiebreak))
    rank = F.row_number().over(w)
    return snapshots.select(
        "*",
        rank.cast("long").alias("capture_rank"),
    ).withColumn("keep", F.col("capture_rank") <= int(keep_last))


def snapshot_expiry(
    snapshots: "DataFrame",
    files: "DataFrame",
    horizon_ts: int,
    keep_last: int = 3,
    snap_col: str = "snapshot_id",
    ts_col: str = "commit_ts",
    file_col: str = "file_id",
) -> "DataFrame":
    """Iceberg-style snapshot expiry + orphan-file planning over the
    checkpoint lineage (north_rule: the crawl resumes from
    Iceberg-snapshot checkpoints — this is the maintenance job that
    keeps that table from growing without bound).  A snapshot is
    EXPIRABLE when it is older than ``horizon_ts`` AND not among the
    ``keep_last`` newest (the retained history a resume can still bind
    to, expireSnapshots(olderThan, retainLast) semantics).  A data file
    becomes an ORPHAN candidate when every snapshot referencing it is
    expirable — those are the bytes the sweep may actually delete;
    a file any live snapshot still references must stay.

    Returns per file: (file_id, n_refs, n_live_refs, orphaned).
    Plan: global top-``keep_last`` over |snapshots| rows (tiny relation,
    broadcast), then one groupBy on file_id over the manifest-membership
    table with the expirable flag joined in broadcast — the membership
    table is the big side and is touched once, map-side combined.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.desc(ts_col), F.desc(snap_col))
    ranked = snapshots.select(
        F.col(snap_col).alias("snap"),
        F.col(ts_col).alias("ts"),
        F.row_number().over(w).alias("__recent"),
    )
    flags = ranked.select(
        "snap",
        ((F.col("ts") < horizon_ts) & (F.col("__recent") > keep_last))
        .alias("expirable"),
    )
    m = files.select(
        F.col(file_col).alias("file_id"), F.col(snap_col).alias("snap")
    ).join(F.broadcast(flags), "snap", "left")
    return m.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_refs"),
        F.sum(F.when(~F.coalesce(F.col("expirable"), F.lit(False)), 1)
              .otherwise(0)).cast("long").alias("n_live_refs"),
    ).withColumn("orphaned", F.col("n_live_refs") == 0)


MERKLE_P = (1 << 31) - 1
MERKLE_A = 1103515245
MERKLE_B = 12345


def merkle_root(
    df: "DataFrame",
    key_col: str,
    levels: int = 8,
) -> "DataFrame":
    """Order-free Merkle root over a keyed relation — the integrity
    check the checkpoint lineage needs (north_rule: resume exactly
    from snapshots with per-partition lineage): two snapshots of the
    seen set are byte-identical iff their roots match, and a mismatch
    localizes to a subtree without comparing 10^10 rows.

    Leaves are 2^levels buckets of h(k) = (A*k + B) mod P summed mod P
    per bucket — a COMMUTATIVE leaf digest, so the tree is invariant
    to row order and partitioning (the property a distributed snapshot
    diff actually needs; a concatenation hash would depend on shuffle
    order).  Parents combine as (A*left + B*right + 1) mod P, so
    sibling order still matters structurally.  Plain modular
    arithmetic (NOT xxhash64) keeps every level SQL-replayable.

    Plan: one map-side-combined groupBy for the leaves, then
    ``levels`` tiny groupBys (max 2^levels rows — driver-loop over a
    broadcast-sized relation).  Returns one row (root, n_rows,
    n_leaves).
    """
    n_leaves = 1 << int(levels)
    k = F.col(key_col).cast("long")
    h = F.pmod(F.lit(MERKLE_A) * F.pmod(k, F.lit(MERKLE_P))
               + F.lit(MERKLE_B), F.lit(MERKLE_P))
    leaves = (
        df.select(F.pmod(k, F.lit(n_leaves)).alias("b"), h.alias("h"))
        .groupBy("b").agg(F.pmod(F.sum("h"), F.lit(MERKLE_P)).alias("v"))
    )
    n_rows = df.count()
    spark = df.sparkSession
    full = spark.range(n_leaves).select(F.col("id").alias("b")).join(
        leaves, "b", "left").select(
        "b", F.coalesce("v", F.lit(0)).cast("long").alias("v"))
    cur = full
    width = n_leaves
    while width > 1:
        width //= 2
        left = F.sum(F.when(F.col("b") % 2 == 0, F.col("v"))).alias("l")
        right = F.sum(F.when(F.col("b") % 2 == 1, F.col("v"))).alias("r")
        cur = (
            cur.groupBy((F.col("b") / 2).cast("long").alias("p"))
            .agg(left, right)
            .select(
                F.col("p").alias("b"),
                F.pmod(F.lit(MERKLE_A) * F.col("l")
                       + F.lit(MERKLE_B) * F.col("r") + 1,
                       F.lit(MERKLE_P)).alias("v"),
            )
        )
    return cur.select(
        F.col("v").alias("root"),
        F.lit(n_rows).cast("long").alias("n_rows"),
        F.lit(n_leaves).cast("long").alias("n_leaves"),
    )
