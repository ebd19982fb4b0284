"""Temporal join operators Spark lacks as built-ins — as-of join and
bucketed interval join — composed from exchanges + windows so Catalyst
still owns the physical plan (no Python anywhere).

Crawl motivation: compliance and scheduling are TEMPORAL joins.  "Was
this fetch allowed?" is not a join against today's robots.txt — it is a
join against the snapshot that was in force AT FETCH TIME (robots files
change; the reference re-reads robots.txt per run and has no history,
src/Loader/Http/Politeness/RobotsTxt.php).  "Did this fetch land in a
maintenance window?" is an interval-containment join.  Both must run at
10^10-row scale without a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks the LATEST right row of
    the same ``key`` with ``right_ts <= left_ts`` (exact tie: the right
    row applies).  Left rows older than every right row keep null
    payloads (left-join semantics).

    Shape — the distributed sort-merge trick, not a per-key loop: union
    both sides tagged (right rows sort BEFORE left rows at equal ts),
    then one window per key ordered by (ts, tag) carrying
    ``last(payload, ignorenulls=true)`` forward.  Cost: ONE Exchange on
    the key + an in-partition sort; payload state is O(1) per row.  Keys
    partition the work, so host-keyed crawl data inherits the politeness
    layer's skew handling (salt hot hosts upstream if one key dominates).
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    lcols = [c for c in left.columns]
    # the payload rides as ONE struct, not per-column: last(...,
    # ignorenulls) must distinguish "no snapshot yet" (struct NULL) from
    # "the in-force snapshot carries a NULL value" (field NULL inside a
    # non-null struct) — per-column carry would resurrect the previous
    # snapshot's value for a legitimately-null field and could stitch
    # fields of DIFFERENT snapshots into one output row
    pay_struct = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    struct_type = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}"
        for c in payload_cols
    ) + ">"
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__tag"),
        pay_struct.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in lcols],
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(struct_type).alias("__p"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "__tag",
        *[F.col(f"__l_{c}") for c in lcols],
        F.last("__p", ignorenulls=True).over(w).alias("__c"),
    )
    out = carried.filter(F.col("__tag") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col("__c")[c].alias(c) for c in payload_cols],
    )
    return out


def interval_join_bucketed(
    events: DataFrame,
    windows: DataFrame,
    key: str,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket: int = 1000,
) -> DataFrame:
    """Interval-containment join (event ts in [start, end], inclusive)
    via coarse time buckets — the standard scale rewrite of a range
    join.  A plain ``ON key AND ts BETWEEN start AND end`` join gives
    Spark only the equi-key to hash on, so every event meets every
    window of its key (O(events x windows/key) — fatal when a hot host
    has thousands of maintenance windows).  Bucketizing adds a second
    equi-column: each window explodes into the ``bucket``-sized time
    cells it overlaps, each event hashes to exactly one cell, and the
    BETWEEN refine runs only on cell-collisions.  Blowup is bounded:
    a window spanning S seconds adds S/bucket + 1 rows — pick bucket
    near the median window length.

    Returns events with ``n_windows`` (how many intervals contain the
    event; 0 for none — left semantics, no row loss).

    PRECONDITION: event rows must be unique (carry an event id) — the
    final regroup is keyed on all event columns, so byte-identical
    duplicate events would collapse into one output row.
    """
    ts = F.col(ts_col).cast("long")
    s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
    b = int(bucket)
    wx = windows.select(
        F.col(key).alias("__k"), s.alias("__s"), e.alias("__e"),
        F.explode(
            F.sequence(F.floor(s / b).cast("long"),
                       F.floor(e / b).cast("long"))
        ).alias("__cell"),
    )
    ev = events.withColumn("__cell", F.floor(ts / b).cast("long"))
    hits = (
        ev.join(
            wx,
            (ev[key] == wx["__k"]) & (ev["__cell"] == wx["__cell"]),
            "left",
        )
        .withColumn(
            "__hit",
            F.when(
                (ts >= F.col("__s")) & (ts <= F.col("__e")), 1
            ).otherwise(0),
        )
    )
    # events must carry a unique id among their columns: the regroup
    # below collapses byte-identical event rows into one
    return (
        hits.groupBy(*[F.col(c) for c in events.columns])
        .agg(F.sum("__hit").cast("long").alias("n_windows"))
    )


def skew_salt_plan(
    df: DataFrame,
    key_col: str,
    target_rows: int,
    max_salt: int = 64,
) -> DataFrame:
    """Proportional salting PLAN for a skewed join/aggregation key: how
    many salt sub-buckets each hot key needs so no reducer task sees
    more than ``target_rows`` of it.  AQE's skew-join split fires only
    on sort-merge joins at runtime; a plan computed from key counts is
    what you apply when the big side is re-used across waves (the seen
    anti-join, the per-host politeness queue) or when the join is hash
    based.  salt = ceil(n / target_rows) capped at ``max_salt`` — the
    cap bounds the small side's replication cost, which is salt copies
    per key (see :func:`salted_join`).

    Plan shape: one map-side-combined groupBy(key) count, then pure
    arithmetic; only keys that actually need salt (> 1) are returned,
    so the plan relation is as small as the skew is rare and safely
    broadcastable back onto the data path.

    Returns (key, n_rows, salt, max_bucket_rows) with max_bucket_rows =
    ceil(n / salt) — the worst task load after salting.
    """
    t = int(target_rows)
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    salt = F.least(
        F.lit(int(max_salt)).cast("long"),
        F.expr(f"(n_rows + {t - 1}) div {t}"),
    )
    return (
        counts.withColumn("salt", salt)
        .filter(F.col("salt") > 1)
        .withColumn(
            "max_bucket_rows", F.expr("(n_rows + salt - 1) div salt")
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    spread_col: str,
    target_rows: int,
    max_salt: int = 64,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: apply :func:`skew_salt_plan` so every hot
    key's big-side rows spread over ``salt`` sub-buckets and the small
    side is replicated ``salt`` times FOR THAT KEY ONLY.  Result set is
    exactly the plain join's (asserted in tests); what changes is the
    physical shape — the hot key's reducer work splits salt-ways
    instead of landing on one task.

    ``spread_col`` must be a deterministic per-row column (a unique id,
    a URL) — its hash picks the sub-bucket, so reruns are bit-stable
    (no rand(), which would break retry idempotency mid-stage).

    Cold keys keep salt-id 0 on both sides — one bucket, zero extra
    rows; the replication cost is sum(salt) over hot keys only.
    """
    plan = skew_salt_plan(big, key_col, target_rows, max_salt).select(
        "key", "salt"
    )
    b = big.join(
        F.broadcast(plan), big[key_col] == plan["key"], "left"
    ).drop("key").withColumn(
        "__salt_id",
        F.when(
            F.col("salt").isNotNull(),
            F.pmod(F.xxhash64(F.col(spread_col)), F.col("salt")),
        ).otherwise(F.lit(0).cast("long")),
    ).drop("salt")
    s = small.join(
        F.broadcast(plan), small[key_col] == plan["key"], "left"
    ).drop("key").withColumn(
        "__salt_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.coalesce(F.col("salt"), F.lit(1).cast("long")) - 1,
            )
        ),
    ).drop("salt")
    return b.join(s, [key_col, "__salt_id"], how).drop("__salt_id")
