"""Physical-plan scale audit over EVERY __spark_entry__.queries() entry.

For each gate query, build the DataFrame at a small SF and scan the
EXECUTED plan string for the hazards that kill a job at 100 TB even
though it passes at sandbox scale:

- ``Exchange SinglePartition``  — a global window / unpartitioned sort
  funnels the whole relation through one task;
- ``CartesianProduct``          — all-pairs blowup;
- ``BroadcastNestedLoopJoin``   — O(n*m) probe, acceptable ONLY when one
  side is a provably tiny literal relation;
- ``BatchEvalPython``           — row-at-a-time Python UDF in the plan
  (the north rule allows only Arrow-vectorized Python).

Known-safe occurrences are whitelisted HERE, each with the reason the
shape is bounded; anything else fails the audit.  Output: PLAN_AUDIT.md
with one row per query and a hazard summary; exit 1 on non-whitelisted
hazards.

Usage: python3 scripts/audit_plans.py [sf_dir] [only_query,...]
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, "/root/repo")

HAZARDS = {
    "single_partition": re.compile(r"Exchange SinglePartition"),
    "cartesian": re.compile(r"CartesianProduct"),
    "bnl_join": re.compile(r"BroadcastNestedLoopJoin"),
    "row_python": re.compile(r"BatchEvalPython"),
}

# query -> {hazard: justification}.  A whitelist entry means the hazard
# string APPEARS in the plan but the shape is bounded by construction.
WHITELIST: dict[str, dict[str, str]] = {
    # hosts x brand list: the build side is a LITERAL brand relation of
    # tens of rows broadcast to every task — bounded fan-out by
    # construction, same class as the ann query-block whitelists.
    "typosquats": {
        "bnl_join": "WL: distinct hosts x broadcast literal brand list"
    },
    # single-pass advisor ends in ONE scalar aggregate carrying every
    # per-column stat: partial aggregation reduces each task to one row
    # before the funnel — bounded by construction
    "encoding_advisor": {
        "single_partition": "scalar-agg funnel: one partial row per task"
    },
    # the round-robin placement window runs over the per-host AGGREGATE
    # (|hosts| rows after a map-side-combined groupBy), never the data;
    # bounded funnel, asserted in test_capacity (window above HashAggregate).
    "shuffle_skew_forecast": {
        "single_partition": "window over per-group aggregate (|hosts| rows)"
    },
    "capacity_summary": {
        "single_partition": "window over per-group aggregate (|hosts| rows)"
    },
    # ann brute force scores the corpus against a BROADCAST literal block
    # of <= a few hundred query vectors: the nested loop is k_q * n with
    # tiny k_q, the corpus side never shuffles (asserted in test_plans).
    "ann_brute_topk": {
        "bnl_join": "corpus x broadcast(<=256 query rows); bounded fan-out"
    },
    # the CH ring is F*vnodes LITERAL rows (a fleet config, <= a few
    # hundred) broadcast against hosts; the nested loop is |hosts| * ring
    # with a tiny ring — same bounded shape as the ANN codebook joins.
    "ch_ring_assign": {
        "bnl_join": "hosts x broadcast ring (fetchers*vnodes literal rows)"
    },
    # snapshot lineage is TABLE METADATA (one row per commit, <= ~1e5 for
    # any real Iceberg table): the recency window runs over that metadata
    # relation, never over data rows.
    "snapshot_expiry": {
        "single_partition": "window over snapshot metadata (<=1e5 rows/table)"
    },
    "embedding_cosine_pairs": {
        "bnl_join": "self-pairs within broadcast range-bucket; bucket-capped"
    },
    "semdedup": {
        "bnl_join": "corpus x broadcast(k<=64 centroid codebook)"
    },
    "semdedup_capped": {
        "bnl_join": "corpus x broadcast(k<=64 centroid codebook); the "
                    "pair join itself is an equi-join on cent_id with the "
                    "comparator side row_number-capped at max_cluster_size"
    },
    "ann_ivf_topk": {
        "bnl_join": "corpus x broadcast centroids (k<=64) for assignment"
    },
    "ann_pq_topk": {
        "bnl_join": "corpus x broadcast PQ codebooks (k*m<=512 rows)"
    },
    "ann_pq_rerank": {
        "bnl_join": "candidates x broadcast query block; candidates <= nprobe*cap"
    },
    "ann_pq_codes": {
        "bnl_join": "corpus x broadcast PQ codebooks (k*m<=512 rows)"
    },
    "ann_lsh_topk": {
        "bnl_join": "bucket-joined candidates x broadcast query block"
    },
    "decontaminate": {
        "bnl_join": "corpus x broadcast eval-benchmark n-grams (tiny)"
    },
    "knn_recall": {
        "bnl_join": "corpus x broadcast eval-query block (1/query_mod of an "
                    "eval SAMPLE, never the corpus); bounded fan-out"
    },
    "zone_prune": {
        "bnl_join": "file-stats x broadcast probe workload (tens of "
                    "predicates); stats side is |data|/rows_per_file"
    },
    "cow_mor": {
        "bnl_join": "file-stats x broadcast update batch (bounded per "
                    "maintenance cycle); range join on zone maps"
    },
    # cumulative shard-base offsets: a global running sum over ONE ROW PER
    # BUCKET (shard groups, O(1k)); data rows never pass the funnel.
    "shard_assign": {
        "single_partition": "running sum over one row per shard bucket"
    },
    # water line: two scalar aggregates (host count, max affordable rank)
    # each funnel ONE partial row per task; the per-host relation itself
    # flows through the distributed two-phase rank/prefix, never the funnel.
    "waterfill_budgets": {
        "single_partition": "bounded: scalar-agg funnel (n + water-line "
                            "struct, <=1 row per broadcast)"
    },
    "bucket_batches": {
        "single_partition": "batch-base running sum over one row per "
                            "aspect bucket (3 rows)"
    },
    "compaction_plan": {
        "single_partition": "shard_assign's group-base running sum over "
                            "one row per table partition"
    },
}

SMALL_INPUT_NOTE = (
    "sandbox SF can legitimately produce broadcast where scale would "
    "shuffle; the audit flags only shapes that stay hazardous at any size"
)

_MARKER = re.compile(r"^[\s:]*(\+-|:-)")
_SCALAR_AGG = re.compile(r"Aggregate\(key(?:s)?=\[\], functions=\[")
_SMALL_RANGE = re.compile(r"Range \((\d+), (\d+),")
_SMALL_TOPK = re.compile(r"(?:TakeOrderedAndProject|GlobalLimit|CollectLimit)"
                         r"\(?limit=(\d+)")


def _marker_pos(line: str) -> int:
    m = _MARKER.match(line)
    return m.start(1) if m else -1


def _subtree(lines: list[str], i: int) -> list[str]:
    """Lines strictly inside the subtree rooted at lines[i]."""
    p = _marker_pos(lines[i])
    out = []
    for ln in lines[i + 1:]:
        q = _marker_pos(ln)
        if q >= 0 and q <= p:
            break
        out.append(ln)
    return out


def _bounded_reason(sub: list[str]) -> str | None:
    """Why a broadcast/funnel subtree is bounded at any scale, or None."""
    for ln in sub:
        if _SCALAR_AGG.search(ln):
            return "scalar aggregate (<=1 row per broadcast)"
        m = _SMALL_RANGE.search(ln)
        if m and int(m.group(2)) - int(m.group(1)) <= 4096:
            return f"literal Range of {int(m.group(2)) - int(m.group(1))} rows"
        m = _SMALL_TOPK.search(ln)
        if m and int(m.group(1)) <= 4096:
            return f"distributed top-k, limit={m.group(1)}"
        if "LocalTableScan" in ln:
            return "driver-literal LocalTableScan relation"
    return None


def structurally_bounded(plan: str, hazard: str) -> str | None:
    """Return a justification iff EVERY occurrence of ``hazard`` in the
    plan is a shape that stays bounded at any input size:

    - ``single_partition``: the exchange's child is a no-group partial
      aggregate -> the funnel carries one row per upstream task, never
      data rows;
    - ``bnl_join``: the BroadcastExchange build side is a scalar
      aggregate, a tiny literal ``Range``, or a driver-literal
      ``LocalTableScan`` -> the nested loop is n x O(1).
    """
    lines = plan.splitlines()
    reasons = []
    for i, ln in enumerate(lines):
        if hazard == "single_partition" and "Exchange SinglePartition" in ln:
            nxt = lines[i + 1] if i + 1 < len(lines) else ""
            if _SCALAR_AGG.search(nxt) and "partial_" in nxt:
                reasons.append("scalar-agg funnel: one partial row per task")
            else:
                return None
        elif hazard == "bnl_join" and "BroadcastNestedLoopJoin" in ln:
            p = _marker_pos(ln)
            build = None
            for j in range(i + 1, len(lines)):
                q = _marker_pos(lines[j])
                if 0 <= q <= p:
                    break
                if q == p + 3 and "BroadcastExchange" in lines[j]:
                    build = _subtree(lines, j)
                    break
            why = _bounded_reason(build) if build is not None else None
            if why is None:
                return None
            reasons.append(why)
    return "; ".join(sorted(set(reasons))) if reasons else None


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    import __spark_entry__ as e
    from crawlspark.session import get_spark

    spark = get_spark(app_name="plan-audit", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    bad = []
    qs = e.queries()
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            plan = plan_of(qs[name](spark, sf_dir))
            err = None
        except Exception as ex:  # pragma: no cover - audit robustness
            plan, err = "", f"{type(ex).__name__}: {ex}"
        hits = {h: bool(rx.search(plan)) for h, rx in HAZARDS.items()}
        auto = {}
        flagged = set()
        for h, hit in hits.items():
            if not hit or h in WHITELIST.get(name, {}):
                continue
            why = structurally_bounded(plan, h)
            if why:
                auto[h] = why
            else:
                flagged.add(h)
        if err:
            flagged.add("error")
        rows.append((name, hits, sorted(flagged), round(time.time() - t0, 1),
                     err, auto))
        if flagged:
            bad.append(name)
        status = "FLAG " + ",".join(sorted(flagged)) if flagged else "ok"
        print(f"{name}: {status}", flush=True)

    if only:
        # subset runs are for iteration; only a full audit may replace
        # the committed report
        print(f"\n(subset run: PLAN_AUDIT.md left untouched)\n"
              f"AUDITED: {len(rows)}  FLAGGED: {len(bad)}"
              + (f"  -> {','.join(bad)}" if bad else ""))
        return 1 if bad else 0

    with open("/root/repo/PLAN_AUDIT.md", "w") as f:
        f.write("# PLAN AUDIT — physical-plan scale hazards, all gate "
                "queries\n\n")
        f.write(f"sf_dir: `{sf_dir}`; hazards scanned: "
                f"{', '.join(HAZARDS)}.\n\n{SMALL_INPUT_NOTE}.\n\n")
        f.write("| query | single_partition | cartesian | bnl_join | "
                "row_python | verdict |\n|---|---|---|---|---|---|\n")
        for name, hits, flagged, _, err, auto in rows:
            def cell(h):
                if not hits[h]:
                    return ""
                wl = WHITELIST.get(name, {}).get(h)
                if wl:
                    return f"WL: {wl}"
                if h in auto:
                    return f"bounded: {auto[h]}"
                return "**HIT**"
            verdict = ("ERROR: " + err) if err else (
                "**flagged**" if flagged else "ok")
            f.write(f"| {name} | {cell('single_partition')} | "
                    f"{cell('cartesian')} | {cell('bnl_join')} | "
                    f"{cell('row_python')} | {verdict} |\n")
        f.write(f"\n{len(rows)} queries audited, "
                f"{len(bad)} non-whitelisted: {', '.join(bad) or 'none'}\n")
    print(f"\nAUDITED: {len(rows)}  FLAGGED: {len(bad)}"
          + (f"  -> {','.join(bad)}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
