"""Continuous (streaming foreachBatch) crawl: cross-batch seen persistence,
batch-0 equivalence with the batch engine, and an independent pure-Python
BFS oracle replaying the same link recurrence + cumulative-seen semantics."""

import json
import os

from crawlspark import graph


N = 500  # graph size (doc id space)
DEPTH = 3


def _py_bfs(seeds, seen, n, max_depth):
    """Independent oracle: level-synchronous BFS with the frontier.py link
    recurrence and blocked filter, anti-joined against (and updating) the
    cumulative ``seen`` set.  Returns {(doc, depth)}."""
    blocked = lambda d: d % graph.BLOCKED_MOD == graph.BLOCKED_RESIDUE  # noqa: E731
    # seeds are not blocked-filtered (batch-engine parity)
    frontier = {s for s in seeds if s not in seen}
    out = set()
    for depth in range(max_depth + 1):
        if not frontier:
            break
        out |= {(d, depth) for d in frontier}
        seen |= frontier
        if depth == max_depth:
            break
        nxt = set()
        for d in frontier:
            for c in ((2 * d + 1) % n, (2 * d + 2) % n, (5 * d + 3) % n, (d + 17) % n):
                if not blocked(c) and c not in seen:
                    nxt.add(c)
        frontier = nxt
    return out


def _write_seeds(path, docs, mtime):
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps({"doc": d}) + "\n")
    os.utime(path, (mtime, mtime))


def test_continuous_crawl_matches_python_oracle(spark, tmp_path):
    from crawlspark.streaming import continuous_crawl

    seeds_dir = str(tmp_path / "seeds")
    state_dir = str(tmp_path / "state")
    os.makedirs(seeds_dir)
    # two seed files = two micro-batches (maxFilesPerTrigger=1); pinned
    # mtimes so the file source's batch order is deterministic
    _write_seeds(f"{seeds_dir}/b0.json", [1, 2], 1_000_000_000)
    _write_seeds(f"{seeds_dir}/b1.json", [2, 333], 1_000_000_100)

    continuous_crawl(spark, seeds_dir, state_dir, n=N, max_depth=DEPTH)

    rows = spark.read.parquet(f"{state_dir}/results").collect()
    got = {}
    for r in rows:
        got.setdefault(r["batch_id"], set()).add((r["doc"], r["depth"]))

    seen: set = set()
    want_b0 = _py_bfs([1, 2], seen, N, DEPTH)
    want_b1 = _py_bfs([2, 333], seen, N, DEPTH)
    assert got.get(0, set()) == want_b0
    assert got.get(1, set()) == want_b1
    # no doc crawled twice across the stream's lifetime
    all_docs = [r["doc"] for r in rows]
    assert len(all_docs) == len(set(all_docs))
    # persisted seen state == everything ever crawled
    seen_rows = {r["doc"] for r in spark.read.parquet(f"{state_dir}/seen").collect()}
    assert seen_rows == set(all_docs)


def test_batch0_equals_batch_engine(spark, tmp_path):
    """First batch from a contiguous seed range must equal frontier.crawl_bfs
    over the same seeds/depth — the continuous path degrades to exact batch
    semantics when there is no prior state."""
    from crawlspark.frontier import CrawlConfig, crawl_bfs_virtual
    from crawlspark.streaming import continuous_crawl

    seeds_dir = str(tmp_path / "seeds")
    state_dir = str(tmp_path / "state")
    os.makedirs(seeds_dir)
    _write_seeds(f"{seeds_dir}/b0.json", list(range(10, 20)), 1_000_000_000)

    continuous_crawl(spark, seeds_dir, state_dir, n=N, max_depth=DEPTH)
    got = {
        (r["doc"], r["depth"])
        for r in spark.read.parquet(f"{state_dir}/results").collect()
    }
    import re

    ref = {
        (int(re.search(r"/(\d+)$", r["url"]).group(1)), r["depth"])
        for r in crawl_bfs_virtual(
            spark, N, CrawlConfig(max_depth=DEPTH, seed_doc=10, num_seeds=10)
        ).collect()
    }
    assert got == ref
