"""Measure the seen-prefilter crossover in the regime it exists for: the
MATURE crawl, where the accumulated seen set dwarfs each wave
(north-star: 10^10 seen URLs vs 10^6-10^7 candidates per politeness
wave).  There a plain left_anti must exchange + sort the huge seen
relation every wave; the filter path probes compact per-bucket states
and checks the few "maybe" rows with a broadcast-probe backstop that
only SCANS the seen relation (column-pruned, no exchange, no sort).

r3's evidence measured the opposite regime (seen = 20% of a synthetic
wave, both sides equally cheap to shuffle) — that is the EARLY-crawl
shape where the prefilter correctly stays disengaged
(CrawlConfig.prefilter_min_seen).

ABAB min-of-reps.  Usage:
  python3 scripts/prefilter_crossover.py [n_seen] [n_wave]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F



def timed(fn):
    t0 = time.time()
    r = fn()
    return time.time() - t0, r


def main(n_seen: int, n_wave: int) -> None:
    from crawlspark import graph
    from crawlspark.canon import canonicalize_expr, url_hash
    from crawlspark.seen import PartitionedSeenFilter
    from crawlspark.session import get_spark

    spark = get_spark(app_name="prefilter-crossover", cores=32)

    # ---- the persisted seen set: every URL crawled so far, as the engine
    # stores it (parquet of fingerprints; 5x wave overlap density comes from
    # seeding the wave inside the seen id-space below).  Path keyed by size
    # so a cached file from another configuration can never be reused.
    seen_path = f"/tmp/crossover_seen_{n_seen}.parquet"
    if not os.path.exists(seen_path):
        (
            graph.virtual_docs(spark, n_seen)
            .select(url_hash(canonicalize_expr(
                graph.url_col(F.col("src")))).alias("url_hash"))
            .write.mode("overwrite").parquet(seen_path)
        )
    seen = spark.read.parquet(seen_path)

    # ---- one politeness wave: wide rows (url/host/depth/latency ride into
    # the next level), 20% already-seen (ids inside [0, n_seen)), cached as
    # the BFS loop's per-level localCheckpoint does
    def wave_df():
        doc = F.col("src")
        # 1/5 of wave ids collide with the seen id-space, rest are fresh
        vid = F.when(doc % 5 == 0, doc % n_seen).otherwise(n_seen + doc)
        return graph.virtual_docs(spark, n_wave).select(
            doc.alias("doc"),
            graph.url_col(vid).alias("url"),
            F.concat(F.lit("h"), (doc % 65536).cast("string"),
                     F.lit("." + graph.DOMAIN)).alias("host"),
            (doc % 12).cast("long").alias("depth"),
            graph.latency_ms_col(doc).alias("latency_ms"),
        ).withColumn("url_hash", url_hash(canonicalize_expr(F.col("url"))))

    wave = wave_df().localCheckpoint(eager=True)

    # ---- filter maintenance (incremental in the loop; charged separately)
    sf = PartitionedSeenFilter(spark, num_buckets=128,
                               capacity_per_bucket=1 << 20)
    t_build, _ = timed(lambda: sf.update(seen, "url_hash"))

    def consume(df):
        # next level consumes the full row — forces wide columns through
        return df.agg(
            F.count("*"), F.sum(F.length("url")), F.sum("depth")
        ).collect()[0][0]

    def plain():
        return consume(wave.join(seen, "url_hash", "left_anti"))

    def pref():
        return consume(sf.prefiltered_antijoin(
            wave, seen, "url_hash", backstop="broadcast_probe",
            probe="narrow"))

    consume(wave.limit(1000).join(seen.limit(10), "url_hash", "left_anti"))

    t_plain = t_pref = float("inf")
    r_plain = r_pref = None
    for _ in range(2):
        t, r_plain = timed(plain)
        t_plain = min(t_plain, t)
        t, r_pref = timed(pref)
        t_pref = min(t_pref, t)
    assert r_plain == r_pref, (r_plain, r_pref)
    print(json.dumps({
        "n_seen": n_seen,
        "wave_n": n_wave,
        "seen_to_wave_ratio": round(n_seen / n_wave, 1),
        "row_shape": "url+host+depth+latency+hash wide wave; parquet seen",
        "filter_build_sec": round(t_build, 3),
        "survivors": int(r_plain),
        "antijoin_plain_sec": round(t_plain, 3),
        "antijoin_prefiltered_sec": round(t_pref, 3),
        "speedup": round(t_plain / t_pref, 2),
        "prefilter_wins": bool(t_pref < t_plain),
    }))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000)
