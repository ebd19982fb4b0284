"""Link-graph analytics over the crawl: integer-exact PageRank.

Web-scale pipelines rank hosts/pages to prioritize the frontier and to
quality-weight training data (CommonCrawl publishes exactly this kind of
rank).  PageRank here is the classic synchronous power iteration expressed
as DataFrame joins:

- per iteration: edges ⋈ ranks on src as a SHUFFLE_HASH join (the compact
  ranks side builds the hash map; hinting away sort-merge avoids sorting
  the whole edge relation every iteration — measured 2x at 2M docs / 8M
  edges), then a map-side-combined groupBy(dst) sum, then a left join
  back onto the doc universe for teleport-only nodes,
- ``localCheckpoint`` per iteration keeps the plan O(1) in iteration count
  (same discipline as the BFS loop in frontier.py),
- ALL arithmetic is integer (ranks live in ``scale`` units; divisions are
  floor divisions), so results are bit-stable under any partitioning and a
  SQL oracle replays them exactly — the same determinism discipline as
  textops.quality.unigram_logprob.

At 10^10 edges the join on src is the cost center: store edges bucketed by
src so the per-iteration edge exchange disappears (here they are
materialized once with localCheckpoint), let AQE split skewed reducers,
and keep ranks compact (two longs per doc).  Dangling nodes (no
out-links) are handled by the teleport term only — the synthetic graph
has none (constant out-degree 4), but the operator computes out-degrees
from the edge list, not a constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import graph

SCALE = 10**12


def pagerank(
    spark: SparkSession,
    n: int,
    iters: int = 3,
    d_permille: int = 850,
    edges_df: DataFrame | None = None,
    scale: int = SCALE,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Synchronous PageRank over the n-doc link graph (or ``edges_df``
    with columns (src, dst)).  Returns (doc, rank_scaled) where
    rank_scaled is the rank in 1/``scale`` units after ``iters``
    iterations from the uniform start ``scale // n``:

        r'(v) = base + d * sum_{u->v} (r(u) // outdeg(u)) // 1000
        base  = (1000 - d) * (scale // n) // 1000
    """
    docs = spark.range(n).select(F.col("id").alias("doc"))
    e = (edges_df or graph.edges_from(docs.select(F.col("doc").alias("src")), n)
         ).select("src", "dst")
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    # materialize (edges ⋈ outdeg) ONCE; at cluster scale this relation
    # lives bucketed-by-src so iterations never re-exchange the edges
    e2 = e.join(outdeg, "src").repartition("src").localCheckpoint(eager=True)
    base = (1000 - d_permille) * (scale // n) // 1000
    # warm start (incremental recompute after a graph delta): resume the
    # power iteration from checkpointed ranks instead of uniform — k more
    # iterations from iteration j are bit-identical to j+k from scratch
    # (the update is deterministic integer arithmetic), proven in the
    # pagerank_warm gate query against the unrolled j+k oracle
    ranks = (
        init_ranks.select("doc", F.col("r").cast("long").alias("r"))
        if init_ranks is not None
        else docs.withColumn("r", F.lit(scale // n))
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (
            e2.join(
                ranks.withColumnRenamed("doc", "src").hint("SHUFFLE_HASH"),
                "src",
            )
            .select(F.col("dst"), F.expr("r div od").alias("c"))
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            docs.join(sums, docs.doc == sums.dst, "left")
            .select(
                "doc",
                (F.lit(base)
                 + F.expr(f"({d_permille} * coalesce(s, 0)) div 1000")
                 ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("doc", F.col("r").alias("rank_scaled"))


def anchor_texts(
    links: DataFrame,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    top_k: int = 3,
) -> DataFrame:
    """Per-target anchor-text profile: the ``top_k`` most frequent anchor
    strings pointing at each URL — the classic link feature for search
    indexing and query-generation corpora (anchor text describes the
    TARGET better than the target's own text).

    Two-level aggregation keeps hubs safe at scale: the first groupBy on
    (dst, anchor) is map-side combined (a hub with 10^8 in-links reduces
    to its distinct anchor strings before anything is collected), the
    top-k window is partitioned by dst, and only <= top_k rows per target
    are ever assembled into the profile string.

    Returns (dst, n_anchor_variants, top_anchors) with top_anchors the
    ``" | "``-joined top-k by (count desc, anchor asc).
    """
    from pyspark.sql import Window

    counts = links.groupBy(dst_col, anchor_col).agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy(dst_col).orderBy(
        F.desc("n"), F.asc(anchor_col)
    )
    ranked = counts.withColumn("rnk", F.row_number().over(w))
    variants = counts.groupBy(dst_col).agg(
        F.count("*").cast("long").alias("n_anchor_variants")
    )
    top = (
        ranked.filter(F.col("rnk") <= top_k)
        .groupBy(dst_col)
        .agg(
            F.concat_ws(
                " | ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rnk", anchor_col))
                    ),
                    lambda x: x[anchor_col],
                ),
            ).alias("top_anchors")
        )
    )
    return variants.join(top, dst_col)


def pagerank_oracle_sql(iters: int = 3, d_permille: int = 850,
                        scale: int = SCALE) -> str:
    """Unrolled-CTE SQL replay of :func:`pagerank` over the documents-sized
    formula graph (same chained-CTE discipline as graph.bfs_oracle_sql)."""
    dp = d_permille
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS c FROM documents),",
        "e AS (",
        "  SELECT d.doc_id AS src,",
        "         CASE p.pos",
        "           WHEN 0 THEN (2*d.doc_id + 1) % nn.c",
        "           WHEN 1 THEN (2*d.doc_id + 2) % nn.c",
        "           WHEN 2 THEN (5*d.doc_id + 3) % nn.c",
        "           ELSE (d.doc_id + 17) % nn.c",
        "         END AS dst",
        "  FROM documents d CROSS JOIN nn",
        "  CROSS JOIN (VALUES (0),(1),(2),(3)) AS p(pos)",
        "),",
        "od AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),",
        f"bs AS (SELECT ({scale} // c) AS r0,"
        f" ((1000 - {dp}) * ({scale} // c)) // 1000 AS base FROM nn),",
        "r0 AS (SELECT doc_id AS doc, (SELECT r0 FROM bs) AS r FROM documents),",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts += [
            f"s{i} AS (",
            f"  SELECT e.dst AS doc, CAST(SUM(r{p}.r // od.od) AS BIGINT) AS s",
            f"  FROM e JOIN od USING (src) JOIN r{p} ON r{p}.doc = e.src",
            "  GROUP BY e.dst",
            "),",
            f"r{i} AS (SELECT d.doc_id AS doc, CAST((SELECT base FROM bs)"
            f" + ({dp} * COALESCE(s{i}.s, 0)) // 1000 AS BIGINT) AS r",
            f"  FROM documents d LEFT JOIN s{i} ON s{i}.doc = d.doc_id),",
        ]
    parts += [
        f"fin AS (SELECT doc, r FROM r{iters})",
        "SELECT doc, r AS rank_scaled FROM fin ORDER BY doc",
    ]
    return "\n".join(parts)


HITS_SCALE = 10**9


def hits(
    spark: SparkSession,
    n: int,
    iters: int = 2,
    edges_df: DataFrame | None = None,
    scale: int = HITS_SCALE,
) -> DataFrame:
    """Integer-exact HITS (Kleinberg 1999) over the n-doc link graph (or
    ``edges_df`` with columns (src, dst)) — the hub/authority complement
    to :func:`pagerank` for frontier prioritization: authorities are the
    content pages worth fetching, hubs are the index/listing pages worth
    re-crawling for link discovery.

    Per iteration (synchronous update, L1 normalization):

        a_raw(v) = sum_{u->v} h(u);   a(v) = a_raw(v) * scale div sum(a_raw)
        h_raw(u) = sum_{u->v} a(v);   h(u) = h_raw(u) * scale div sum(h_raw)

    ALL arithmetic is int64 (``scale`` = 10^9 keeps the worst product
    a_raw * scale <= outdeg * scale^2 ~ 4e18 inside int64), so results
    are bit-stable under any partitioning and the SQL oracle replays them
    exactly — the same determinism discipline as :func:`pagerank`.

    Spark shape (scale notes for 10^10 edges):
    - the edge relation is materialized ONCE with ``localCheckpoint`` and
      reused by both half-iterations; on a cluster it would live bucketed
      by src (the hub join) with the dst join left to AQE,
    - both joins hint SHUFFLE_HASH: the score side is two longs per doc,
      always the small build side; sorting 10^10 edges per half-iteration
      (sort-merge) would dominate otherwise,
    - the L1 totals are single-row aggregates crossJoin-broadcast back —
      no driver round-trip, no collect,
    - ``localCheckpoint`` per half-iteration keeps the plan O(1) in
      iteration count (frontier.py discipline).
    """
    docs = spark.range(n).select(F.col("id").alias("doc"))
    e = (edges_df or graph.edges_from(docs.select(F.col("doc").alias("src")), n)
         ).select("src", "dst").localCheckpoint(eager=True)
    hubs = docs.withColumn("h", F.lit(scale // n)).localCheckpoint(eager=True)
    auths = None
    for _ in range(iters):
        a_raw = (
            e.join(hubs.withColumnRenamed("doc", "src").hint("SHUFFLE_HASH"),
                   "src")
            .groupBy("dst").agg(F.sum("h").alias("x"))
        )
        a_tot = a_raw.agg(
            F.greatest(F.sum("x"), F.lit(1)).alias("t")
        )  # >=1: an all-zero mass vector (floored normalization on a
        # huge graph) must yield zeros, not ANSI DIVIDE_BY_ZERO
        auths = (
            docs.join(a_raw, docs.doc == a_raw.dst, "left")
            .crossJoin(F.broadcast(a_tot))
            .select(
                "doc",
                F.expr(f"coalesce(x, 0L) * {scale} div t").alias("a"),
            )
            .localCheckpoint(eager=True)
        )
        h_raw = (
            e.join(auths.withColumnRenamed("doc", "dst").hint("SHUFFLE_HASH"),
                   "dst")
            .groupBy("src").agg(F.sum("a").alias("x"))
        )
        h_tot = h_raw.agg(F.greatest(F.sum("x"), F.lit(1)).alias("t"))
        hubs = (
            docs.join(h_raw, docs.doc == h_raw.src, "left")
            .crossJoin(F.broadcast(h_tot))
            .select(
                "doc",
                F.expr(f"coalesce(x, 0L) * {scale} div t").alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        auths.join(hubs, "doc")
        .select("doc", F.col("a").alias("auth_scaled"),
                F.col("h").alias("hub_scaled"))
    )


def hits_oracle_sql(iters: int = 2, scale: int = HITS_SCALE) -> str:
    """Unrolled-CTE SQL replay of :func:`hits` over the documents-sized
    formula graph (chained-CTE discipline of pagerank_oracle_sql; every
    SUM is cast back to BIGINT so DuckDB's HUGEINT promotion can't
    diverge from Spark's int64 arithmetic)."""
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS c FROM documents),",
        "e AS (",
        "  SELECT d.doc_id AS src,",
        "         CASE p.pos",
        "           WHEN 0 THEN (2*d.doc_id + 1) % nn.c",
        "           WHEN 1 THEN (2*d.doc_id + 2) % nn.c",
        "           WHEN 2 THEN (5*d.doc_id + 3) % nn.c",
        "           ELSE (d.doc_id + 17) % nn.c",
        "         END AS dst",
        "  FROM documents d CROSS JOIN nn",
        "  CROSS JOIN (VALUES (0),(1),(2),(3)) AS p(pos)",
        "),",
        f"h0 AS (SELECT d.doc_id AS doc, CAST({scale} // nn.c AS BIGINT) AS h"
        "  FROM documents d CROSS JOIN nn),",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts += [
            f"ar{i} AS (SELECT e.dst AS doc, CAST(SUM(h{p}.h) AS BIGINT) AS x",
            f"  FROM e JOIN h{p} ON h{p}.doc = e.src GROUP BY e.dst),",
            f"at{i} AS (SELECT CAST(SUM(x) AS BIGINT) AS t FROM ar{i}),",
            f"a{i} AS (SELECT d.doc_id AS doc,",
            f"  CAST(COALESCE(ar{i}.x, 0) * {scale} // (SELECT t FROM at{i})"
            "   AS BIGINT) AS a",
            f"  FROM documents d LEFT JOIN ar{i} ON ar{i}.doc = d.doc_id),",
            f"hr{i} AS (SELECT e.src AS doc, CAST(SUM(a{i}.a) AS BIGINT) AS x",
            f"  FROM e JOIN a{i} ON a{i}.doc = e.dst GROUP BY e.src),",
            f"ht{i} AS (SELECT CAST(SUM(x) AS BIGINT) AS t FROM hr{i}),",
            f"h{i} AS (SELECT d.doc_id AS doc,",
            f"  CAST(COALESCE(hr{i}.x, 0) * {scale} // (SELECT t FROM ht{i})"
            "   AS BIGINT) AS h",
            f"  FROM documents d LEFT JOIN hr{i} ON hr{i}.doc = d.doc_id),",
        ]
    parts += [
        f"fin AS (SELECT a{iters}.doc, a{iters}.a, h{iters}.h",
        f"  FROM a{iters} JOIN h{iters} ON h{iters}.doc = a{iters}.doc)",
        "SELECT doc, a AS auth_scaled, h AS hub_scaled FROM fin ORDER BY doc",
    ]
    return "\n".join(parts)


DEGREE_CAP_DEFAULT = 5_000


def cap_out_degree(
    edges: DataFrame,
    cap: int = DEGREE_CAP_DEFAULT,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Supernode guard for graph jobs: a page with 10^6 outlinks (a
    sitemap dump, a calendar, a link farm) turns every edges⋈ranks
    shuffle partition it lands in into a straggler and floods PageRank
    with near-zero contributions.  Keep each source's first ``cap``
    out-edges in deterministic (dst) order and drop the rest — rank
    quality is unaffected (contributions of r/10^6 are noise) while
    the worst partition shrinks by orders of magnitude.

    One partitioned window on src.  Returns the surviving edges plus
    ``src_degree`` (the ORIGINAL degree, so downstream out-degree
    normalization still divides by the true fan-out — dropping edges
    must not inflate the survivors' contribution).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(src_col)
    ranked = (
        edges.withColumn("src_degree",
                         F.count("*").over(w).cast("long"))
        .withColumn("__r", F.row_number().over(w.orderBy(dst_col)))
    )
    return ranked.filter(F.col("__r") <= int(cap)).drop("__r")


LINK_EXCHANGE_MIN_EDGES = 5
LINK_EXCHANGE_MIN_RECIP_PERMILLE = 800


def detect_link_exchange(
    host_edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Link-exchange (reciprocal linking scheme) detection at host
    granularity: host pairs that send each other heavy, nearly
    symmetric link traffic are trading rank, not citing content —
    PageRank should damp the pair's edges before they launder
    authority in both directions.

    Aggregate to (src, dst) counts first (the raw edge list never
    self-joins), then ONE equi-join of the aggregated relation against
    its own reversal; flag pairs where both directions have >= 5 edges
    and the smaller direction is >= 80% of the larger.  Each unordered
    pair reports once (src < dst).  Returns (host_a, host_b, a_to_b,
    b_to_a, symmetry_permille, exchange).
    """
    pair = (
        host_edges.filter(F.col(src_col) != F.col(dst_col))
        .groupBy(src_col, dst_col)
        .agg(F.count("*").alias("n"))
    )
    rev = pair.select(
        F.col(src_col).alias("__r_src"), F.col(dst_col).alias("__r_dst"),
        F.col("n").alias("n_rev"),
    )
    j = pair.join(
        rev,
        (F.col(src_col) == F.col("__r_dst"))
        & (F.col(dst_col) == F.col("__r_src")),
    ).filter(F.col(src_col) < F.col(dst_col))
    sym = F.expr("(1000 * least(n, n_rev)) div greatest(n, n_rev)")
    exchange = (
        (F.col("n") >= LINK_EXCHANGE_MIN_EDGES)
        & (F.col("n_rev") >= LINK_EXCHANGE_MIN_EDGES)
        & (sym >= LINK_EXCHANGE_MIN_RECIP_PERMILLE)
    )
    return j.select(
        F.col(src_col).alias("host_a"),
        F.col(dst_col).alias("host_b"),
        F.col("n").cast("long").alias("a_to_b"),
        F.col("n_rev").cast("long").alias("b_to_a"),
        sym.cast("long").alias("symmetry_permille"),
        exchange.alias("exchange"),
    )


OPIC_SCALE = 10**12


def opic(
    spark: SparkSession,
    n: int,
    waves: int = 4,
    k: int | None = None,
    edges_df: DataFrame | None = None,
    scale: int = OPIC_SCALE,
) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda &
    Cobena, WWW 2003): the crawl-native importance estimator that needs
    NO full-graph power iteration.  Every page carries ``cash`` and
    ``hist``; each wave the crawler greedily fetches the ``k`` pages
    holding the most cash, banks that cash into their history, and
    deals it equally to their out-links.  ``hist + cash`` converges to
    (unnormalized) page importance WHILE the crawl runs — importance
    estimates arrive wave-by-wave instead of after an offline PageRank
    over the finished graph (the reference has no ranking at all; its
    frontier is FIFO, src/Steps/Loading/HttpCrawl.php:45-53).

    Determinism/exactness: integer arithmetic throughout (cash in
    1/``scale`` units, floor-div distribution), selection ties break on
    doc id, so a SQL oracle replays the greedy schedule bit-exactly —
    same discipline as :func:`pagerank`.

    Scale shape (10^10-doc frontier): the per-wave top-k is
    TakeOrderedAndProject (per-partition heaps, k rows to the driver —
    never a global sort or single-partition window); the selected set
    (<= k rows) broadcasts into both the flag join and the edge join,
    so each wave's only wide op is the map-side-combined inflow
    groupBy(dst); state localCheckpoints per wave keeping the plan O(1)
    in wave count.  Dangling selected pages bank their cash but deal
    nothing (the virtual-page redistribution of the paper is a teleport
    refinement, not needed on the dangling-free synthetic graph).

    Returns (doc, cash, hist, importance) with importance = cash + hist.
    """
    docs = spark.range(n).select(F.col("id").alias("doc"))
    e = (edges_df or graph.edges_from(
        docs.select(F.col("doc").alias("src")), n)).select("src", "dst")
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    e2 = e.join(outdeg, "src").repartition("src").localCheckpoint(eager=True)
    if k is None:
        k = max(n // 20, 1)
    st = docs.select(
        "doc",
        F.lit(scale // n).cast("long").alias("cash"),
        F.lit(0).cast("long").alias("hist"),
    ).localCheckpoint(eager=True)
    for _ in range(waves):
        sel = (
            st.orderBy(F.desc("cash"), F.asc("doc")).limit(k)
            .select("doc", F.col("cash").alias("__scash"))
        )
        inflow = (
            e2.join(
                F.broadcast(sel.select(F.col("doc").alias("src"),
                                       F.col("__scash"))),
                "src",
            )
            .select("dst", F.expr("__scash div od").alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("inflow"))
        )
        st = (
            st.join(F.broadcast(sel.select("doc").withColumn(
                "__sel", F.lit(True))), "doc", "left")
            .join(inflow, st.doc == inflow.dst, "left")
            .select(
                "doc",
                (F.when(F.col("__sel").isNotNull(), F.lit(0))
                 .otherwise(F.col("cash"))
                 + F.coalesce(F.col("inflow"), F.lit(0))
                 ).cast("long").alias("cash"),
                (F.col("hist")
                 + F.when(F.col("__sel").isNotNull(), F.col("cash"))
                 .otherwise(F.lit(0))).cast("long").alias("hist"),
            )
            .localCheckpoint(eager=True)
        )
    return st.select(
        "doc", "cash", "hist",
        (F.col("cash") + F.col("hist")).cast("long").alias("importance"),
    )


def opic_oracle_sql(waves: int = 4, scale: int = OPIC_SCALE) -> str:
    """Unrolled-CTE SQL replay of :func:`opic` over the documents-sized
    formula graph (k = greatest(n // 20, 1), same greedy schedule)."""
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS c FROM documents),",
        "kk AS (SELECT GREATEST(c // 20, 1) AS k FROM nn),",
        "e AS (",
        "  SELECT d.doc_id AS src,",
        "         CASE p.pos",
        "           WHEN 0 THEN (2*d.doc_id + 1) % nn.c",
        "           WHEN 1 THEN (2*d.doc_id + 2) % nn.c",
        "           WHEN 2 THEN (5*d.doc_id + 3) % nn.c",
        "           ELSE (d.doc_id + 17) % nn.c",
        "         END AS dst",
        "  FROM documents d CROSS JOIN nn",
        "  CROSS JOIN (VALUES (0),(1),(2),(3)) AS p(pos)",
        "),",
        "od AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),",
        f"st0 AS (SELECT doc_id AS doc, (SELECT {scale} // c FROM nn) AS cash,"
        " CAST(0 AS BIGINT) AS hist FROM documents),",
    ]
    for i in range(1, waves + 1):
        p = i - 1
        parts += [
            f"sel{i} AS (SELECT doc, cash, hist,",
            "  ROW_NUMBER() OVER (ORDER BY cash DESC, doc)"
            " <= (SELECT k FROM kk) AS sel",
            f"  FROM st{p}),",
            f"inf{i} AS (SELECT e.dst AS doc,",
            "  CAST(SUM(s.cash // od.od) AS BIGINT) AS inflow",
            f"  FROM sel{i} s JOIN e ON e.src = s.doc JOIN od USING (src)",
            "  WHERE s.sel GROUP BY e.dst),",
            f"st{i} AS (SELECT s.doc,",
            "  CAST(CASE WHEN s.sel THEN 0 ELSE s.cash END"
            f" + COALESCE(i.inflow, 0) AS BIGINT) AS cash,",
            "  CAST(s.hist + CASE WHEN s.sel THEN s.cash ELSE 0 END"
            " AS BIGINT) AS hist",
            f"  FROM sel{i} s LEFT JOIN inf{i} i USING (doc)),",
        ]
    parts += [
        f"fin AS (SELECT doc, cash, hist FROM st{waves})",
        "SELECT doc, cash, hist, CAST(cash + hist AS BIGINT) AS importance",
        "FROM fin ORDER BY doc",
    ]
    return "\n".join(parts)


def trustrank(
    spark: SparkSession,
    n: int,
    seed_mod: int = 50,
    iters: int = 3,
    d_permille: int = 850,
    edges_df: DataFrame | None = None,
    scale: int = SCALE,
) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB 2004):
    personalized PageRank whose teleport mass lands ONLY on a vetted
    seed whitelist, so trust decays with link distance from known-good
    pages and spam farms (which no trusted page links to) starve — the
    frontier-demotion complement to :func:`pagerank` (spam_propagation
    is the one-hop version; this is the fixpoint).

    Same integer discipline as pagerank: trust in 1/``scale`` units,
    floor-div distribution, bit-stable under any partitioning.  Seeds =
    docs with ``doc % seed_mod == 0`` (a deterministic stand-in for the
    human-vetted list); t0 = scale // |T| on seeds, 0 elsewhere;

        t'(v) = d * sum_{u->v} (t(u) // od(u)) // 1000
                + [v in T] * (1000 - d) * (scale // |T|) // 1000

    Scale shape: identical to pagerank — SHUFFLE_HASH edge join against
    the compact trust relation, map-side-combined groupBy(dst),
    localCheckpoint per iteration; the seed flag is an arithmetic
    predicate, not a join.  Returns (doc, trust_scaled).
    """
    docs = spark.range(n).select(F.col("id").alias("doc"))
    e = (edges_df or graph.edges_from(
        docs.select(F.col("doc").alias("src")), n)).select("src", "dst")
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    e2 = e.join(outdeg, "src").repartition("src").localCheckpoint(eager=True)
    n_seeds = (n + seed_mod - 1) // seed_mod  # docs 0, m, 2m, ... < n
    seed = (F.col("doc") % seed_mod == 0).cast("long")
    base = (1000 - d_permille) * (scale // n_seeds) // 1000
    ranks = docs.select(
        "doc", (seed * (scale // n_seeds)).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (
            e2.join(
                ranks.withColumnRenamed("doc", "src").hint("SHUFFLE_HASH"),
                "src",
            )
            .select(F.col("dst"), F.expr("r div od").alias("c"))
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            docs.join(sums, docs.doc == sums.dst, "left")
            .select(
                "doc",
                (seed * base
                 + F.expr(f"({d_permille} * coalesce(s, 0)) div 1000")
                 ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("doc", F.col("r").alias("trust_scaled"))


def trustrank_oracle_sql(seed_mod: int = 50, iters: int = 3,
                         d_permille: int = 850, scale: int = SCALE) -> str:
    """Unrolled-CTE SQL replay of :func:`trustrank` over the
    documents-sized formula graph."""
    dp = d_permille
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS c FROM documents),",
        f"ns AS (SELECT (c + {seed_mod} - 1) // {seed_mod} AS t FROM nn),",
        "e AS (",
        "  SELECT d.doc_id AS src,",
        "         CASE p.pos",
        "           WHEN 0 THEN (2*d.doc_id + 1) % nn.c",
        "           WHEN 1 THEN (2*d.doc_id + 2) % nn.c",
        "           WHEN 2 THEN (5*d.doc_id + 3) % nn.c",
        "           ELSE (d.doc_id + 17) % nn.c",
        "         END AS dst",
        "  FROM documents d CROSS JOIN nn",
        "  CROSS JOIN (VALUES (0),(1),(2),(3)) AS p(pos)",
        "),",
        "od AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),",
        f"bs AS (SELECT ({scale} // t) AS r0,"
        f" ((1000 - {dp}) * ({scale} // t)) // 1000 AS base FROM ns),",
        f"r0 AS (SELECT doc_id AS doc, CAST(CASE WHEN doc_id % {seed_mod} = 0"
        " THEN (SELECT r0 FROM bs) ELSE 0 END AS BIGINT) AS r"
        " FROM documents),",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        parts += [
            f"s{i} AS (",
            f"  SELECT e.dst AS doc, CAST(SUM(r{p}.r // od.od) AS BIGINT) AS s",
            f"  FROM e JOIN od USING (src) JOIN r{p} ON r{p}.doc = e.src",
            "  GROUP BY e.dst",
            "),",
            f"r{i} AS (SELECT d.doc_id AS doc,"
            f" CAST(CASE WHEN d.doc_id % {seed_mod} = 0"
            " THEN (SELECT base FROM bs) ELSE 0 END"
            f" + ({dp} * COALESCE(s{i}.s, 0)) // 1000 AS BIGINT) AS r",
            f"  FROM documents d LEFT JOIN s{i} ON s{i}.doc = d.doc_id),",
        ]
    parts += [
        f"fin AS (SELECT doc, r FROM r{iters})",
        "SELECT doc, r AS trust_scaled FROM fin ORDER BY doc",
    ]
    return "\n".join(parts)


def classify_image_hosts(
    edges: DataFrame,
    page_col: str = "page_domain",
    img_col: str = "img_domain",
    shared_cdn_min_domains: int = 3,
) -> DataFrame:
    """Hotlink/CDN classification of image-host references, data-driven:
    an image domain referenced by MANY distinct page domains is shared
    infrastructure (a CDN — fetch it, it serves real assets); one
    referenced by a single foreign domain is a hotlink/third-party embed
    (fetch policy usually skips or deprioritizes it); same registrable
    domain is first-party.  No CDN allowlist needed — the reference
    structure itself identifies shared hosts, which is how crawl
    operators actually discover CDNs.

    ``edges``: (page_col, img_col) REGISTRABLE domains per image
    reference (derive via canon.registrable_domain upstream).
    Returns edges + ``n_ref_domains`` (distinct foreign page domains of
    the image domain) + ``hotlink_class``.

    Plan: one two-level distinct aggregate over (img, page) pairs — the
    mega-hot CDN keys combine map-side — broadcast back onto the edges
    (the domain-class relation is O(domains), tiny next to edges).
    """
    fp = F.col(page_col) == F.col(img_col)
    foreign = edges.filter(~fp).select(img_col, page_col).distinct()
    refs = foreign.groupBy(img_col).agg(
        F.count("*").cast("long").alias("n_ref_domains")
    )
    out = edges.join(F.broadcast(refs), img_col, "left")
    n = F.coalesce(F.col("n_ref_domains"), F.lit(0))
    cls = (
        F.when(fp, F.lit("first_party"))
        .when(n >= shared_cdn_min_domains, F.lit("shared_cdn"))
        .otherwise(F.lit("third_party"))
    )
    return out.select(
        *edges.columns,
        n.alias("n_ref_domains"),
        cls.alias("hotlink_class"),
    )


def host_mirrors(
    pages: DataFrame,
    host_col: str = "host",
    fp_col: str = "content_fp",
    max_hosts_per_fp: int = 16,
    mirror_permille: int = 800,
    min_shared: int = 10,
) -> DataFrame:
    """Cross-host mirror detection by shared content fingerprints — a
    site served under several hosts (www/apex split the www-fold
    missed, regional mirrors, scraper clones) wastes its whole crawl
    budget a second time unless the pair is detected and collapsed to
    one preferred host.  A host pair is a mirror candidate when the
    DISTINCT fingerprints they share cover >= ``mirror_permille`` of
    the SMALLER host's corpus (containment, not Jaccard — a small
    full mirror of a big site must score 1000, not |small|/|big|)
    and the absolute overlap clears ``min_shared``.

    Scale shape: the pair generation is a self-equi-join ON THE
    FINGERPRINT (hash join at any scale), with the classic supernode
    guard first — fingerprints on more than ``max_hosts_per_fp``
    distinct hosts are boilerplate (empty pages, error templates,
    parked-domain bodies) and are dropped BEFORE pairing, exactly the
    degree-cap discipline of :func:`cap_supernode_edges`; without it a
    parked-page fingerprint shared by 10^6 hosts explodes into 10^12
    pairs.  Everything else is map-side-combined aggregation; the
    result relation is O(candidate pairs).
    """
    hf = pages.select(host_col, fp_col).distinct()
    fp_hosts = (
        hf.groupBy(fp_col)
        .agg(F.countDistinct(host_col).alias("__nh"))
        .filter(F.col("__nh") <= F.lit(int(max_hosts_per_fp)))
        .select(fp_col)
    )
    hf2 = hf.join(fp_hosts, fp_col)  # supernode fps gone
    # corpus sizes AFTER the boilerplate drop, so numerator and
    # denominator of the containment ratio count the same universe
    sizes = hf2.groupBy(host_col).agg(
        F.countDistinct(fp_col).alias("n_fps")
    )
    a = hf2.select(F.col(host_col).alias("host_a"), F.col(fp_col).alias("f"))
    b = hf2.select(F.col(host_col).alias("host_b"), F.col(fp_col).alias("f"))
    shared = (
        a.join(b, "f")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col(host_col).alias("host_a"),
                      F.col("n_fps").alias("n_a"))
    sb = sizes.select(F.col(host_col).alias("host_b"),
                      F.col("n_fps").alias("n_b"))
    out = (
        shared.join(sa, "host_a").join(sb, "host_b")
        .withColumn(
            "containment_permille",
            F.expr("(1000 * n_shared) div least(n_a, n_b)").cast("long"),
        )
        .withColumn(
            "is_mirror",
            (F.col("containment_permille") >= F.lit(int(mirror_permille)))
            & (F.col("n_shared") >= F.lit(int(min_shared))),
        )
    )
    return out.select(
        "host_a", "host_b", "n_shared", "n_a", "n_b",
        "containment_permille", "is_mirror",
    )


# ---------------------------------------------------------------------------
# ANF / HyperBall-style neighborhood function with KMV counters
# ---------------------------------------------------------------------------

def anf_counters(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    k: int = 8,
) -> DataFrame:
    """Approximate Neighbourhood Function: for every node v and radius
    r <= ``iters``, a bounded-memory estimate of |{w : dist(v, w) <= r}|
    over the OUT-edges (feed reversed edges for in-reachability).

    The scale story (Palmer et al. ANF, KDD'02; Boldi & Vigna HyperBall,
    2013): exact neighbourhood sets need O(n^2) state on a web graph —
    instead every node carries a mergeable distinct-counter, and one
    relational step per radius unions each node's counter with its
    successors' counters.  HyperBall uses HLL registers; we use the KMV
    k-min-hash counter from ``sketch.kmv_*`` because its union is plain
    "distinct + rank <= k" and its estimator plain integer division —
    both exactly replayable by the SQL oracle, with zero loss of the
    properties that matter at 10^10 nodes: state is O(n * k) rows total,
    each radius is ONE self-equi-join on the edge relation (shuffle on
    node id, skew-safe under AQE), and counters merge associatively so
    partial aggregation does the per-partition work map-side.

    Physical shape (measured, BENCH.md): each node's counter is ONE
    array<long> cell, so a radius is edge-join -> groupBy(node) with the
    k-min merge done by JVM higher-order functions
    (slice(array_sort(array_distinct(flatten(collect_list(...)))))) —
    one shuffle per radius and O(n) state rows.  The first cut kept
    (node, h) ROWS and paid distinct + row_number windows per radius
    (two extra shuffles of n*k rows): 35 s -> 11 s at 2M nodes / 8M
    edges / 2 radii on local[32].

    Returns (node, r, n_kept, est) for r in 0..iters; est is exact while
    the true ball has < k nodes (n_kept < k), else (k-1)*P div (h_k+1).

    reference: the reference engine has no graph analytics at all (its
    link handling stops at GetLinks, src/Steps/Html/GetLink.php) — this
    is part of the scheduler-side corpus analytics a web-scale frontier
    needs (prioritise by reach, spot crawl traps as low-expansion balls).
    """
    from .sketch import _P, kmv_hash

    e = edges.select(F.col("src").cast("long").alias("src"),
                     F.col("dst").cast("long").alias("dst"))
    kk = int(k)

    state = nodes.select(
        F.col("node").cast("long").alias("node"),
        F.array(kmv_hash(F.col("node"))).alias("hs"),
    ).localCheckpoint(eager=True)

    def _ests(s: DataFrame, r: int) -> DataFrame:
        return s.select(
            "node", F.lit(r).alias("r"),
            F.size("hs").cast("long").alias("n_kept"),
            F.element_at("hs", -1).cast("long").alias("kth_hash"),
        )

    snapshots = [_ests(state, 0)]
    for _ in range(int(iters)):
        pulled = (
            e.join(state.withColumnRenamed("node", "dst").hint("SHUFFLE_HASH"),
                   "dst")
            .select(F.col("src").alias("node"), "hs")
        )
        state = (
            state.unionByName(pulled)
            .groupBy("node")
            .agg(
                F.slice(
                    F.array_sort(F.array_distinct(
                        F.flatten(F.collect_list("hs"))
                    )),
                    1, kk,
                ).alias("hs")
            )
            .localCheckpoint(eager=True)  # plan stays O(1) in r
        )
        snapshots.append(_ests(state, len(snapshots)))

    allr = snapshots[0]
    for s in snapshots[1:]:
        allr = allr.unionByName(s)
    return allr.select(
        "node", "r", "n_kept",
        F.when(F.col("n_kept") < kk, F.col("n_kept"))
        .otherwise(F.expr(f"({kk - 1} * {_P}L) div (kth_hash + 1)"))
        .cast("long").alias("est"),
    )


def harmonic_centrality_from_anf(
    anf: DataFrame, iters: int = 3, scale: int = 1_000_000
) -> DataFrame:
    """Harmonic centrality estimate from ANF counters: HC(v) =
    sum_{r>=1} (N(v,r) - N(v,r-1)) / r — every node newly reached at
    radius r contributes 1/r (Boldi & Vigna, "Axioms for centrality").
    Integer micro-units: each radius term is (delta * scale) div r,
    summed; the growth deltas are >= 0 because the KMV union state only
    grows.  One conditional aggregation over the (node, r) rows —
    O(nodes) output, no window."""
    per_r = [
        F.max(F.when(F.col("r") == r, F.col("est"))).alias(f"e{r}")
        for r in range(int(iters) + 1)
    ]
    wide = anf.groupBy("node").agg(*per_r)
    hc = None
    for r in range(1, int(iters) + 1):
        term = F.expr(f"((e{r} - e{r-1}) * {int(scale)}L) div {r}")
        hc = term if hc is None else hc + term
    return wide.select("node", hc.cast("long").alias("hc_micros"))


# ---------------------------------------------------------------------------
# Label propagation, triangle counting, k-core peeling
# ---------------------------------------------------------------------------

def _symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected simple-graph view of a directed edge list: both
    orientations, self-loops dropped, duplicates collapsed."""
    e = edges.select(F.col("src").cast("long").alias("src"),
                     F.col("dst").cast("long").alias("dst"))
    return (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def label_propagation(
    nodes: DataFrame, edges: DataFrame, iters: int = 3
) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007)
    over the undirected view of ``edges``: every node starts as its own
    label; each round every node adopts the most frequent label among
    its neighbours, ties broken by the SMALLEST label — fully
    deterministic, so the SQL oracle replays it round for round (the
    classic async LPA is order-dependent; synchronous + min-tiebreak is
    the variant that makes sense on a shuffle-parallel engine).

    Per round: one edge equi-join, one map-side-combined (node, label)
    count, one partitioned top-1 window — state is O(n) rows, plans stay
    O(1) in rounds via localCheckpoint.  Isolated nodes keep their own
    label.  Returns (node, community).

    Scheduler use: communities over the host graph are the natural crawl
    sharding unit (co-schedule strongly-linked hosts on one executor
    pool so their frontier joins stay local).
    """
    from pyspark.sql import Window

    und = _symmetrize(edges).localCheckpoint(eager=True)
    labels = nodes.select(
        F.col("node").cast("long").alias("node"),
        F.col("node").cast("long").alias("community"),
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("community"))
    for _ in range(int(iters)):
        neigh = (
            und.join(
                labels.withColumnRenamed("node", "dst").hint("SHUFFLE_HASH"),
                "dst",
            )
            .select(F.col("src").alias("node"), "community")
        )
        best = (
            neigh.groupBy("node", "community")
            .agg(F.count("*").alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "community")
        )
        labels = (
            labels.select("node").join(best, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("community"), F.col("node")).alias("community"),
            )
            .localCheckpoint(eager=True)
        )
    return labels


def triangle_clustering(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    undirected view — the link-farm density signal (organic link
    neighbourhoods are sparse; paid-link clusters are near-cliques).

    The scale plan is the degree-ordered orientation (Suri &
    Vassilvitskii WWW'11 / Cohen's map-reduce triangles): orient every
    undirected edge from the (degree, id)-SMALLER endpoint to the larger,
    so every triangle is counted exactly once from its lowest vertex and
    — the part that matters at 10^10 edges — no reducer ever sees more
    than O(sqrt(m)) wedges per node: a celebrity host with 10^8 in-links
    has tiny ORIENTED out-degree unless its neighbours are just as hot.
    Wedge join + one closing-edge equi-join; no row-level Python.

    Returns (node, degree, triangles, lcc_permille) with lcc =
    2*T / (d*(d-1)) in integer permille (0 for degree < 2).
    """
    und = _symmetrize(edges)
    deg = und.groupBy("src").agg(F.count("*").alias("d")).select(
        F.col("src").alias("node"), F.col("d")
    )
    # orientation key: (degree, id) total order.  The destination's key
    # rides on the oriented edge (dd column) so the wedge stage compares
    # endpoint keys directly instead of re-joining the degree relation
    # against the (much larger) wedge set (55.3 s -> 25.2 s at 2M nodes
    # / 8M edges; BENCH.md "triangle counting")
    e = (
        und.join(deg.select(F.col("node").alias("src"),
                            F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("node").alias("dst"),
                         F.col("d").alias("dd")), "dst")
        .filter(
            (F.col("ds") < F.col("dd"))
            | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst", "dd")
    )
    a = e.select(F.col("src").alias("pivot"), F.col("dst").alias("v"),
                 F.col("dd").alias("dv"))
    b = e.select(F.col("src").alias("pivot"), F.col("dst").alias("w"),
                 F.col("dd").alias("dw"))
    # wedges from the pivot, ordered v < w in the SAME total order the
    # edges are oriented by -> the closing edge, if present, is (v, w)
    wedges = (
        a.join(b, "pivot")
        .filter(
            (F.col("dv") < F.col("dw"))
            | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
        )
        .select("pivot", "v", "w")
    )
    tri = wedges.join(
        e.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
    )
    per_node = (
        tri.select(F.explode(F.array("pivot", "v", "w")).alias("node"))
        .groupBy("node").agg(F.count("*").cast("long").alias("triangles"))
    )
    return (
        nodes.select(F.col("node").cast("long").alias("node"))
        .join(deg, "node", "left")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
            .alias("triangles"),
            F.when(
                F.coalesce(F.col("d"), F.lit(0)) < 2, F.lit(0)
            ).otherwise(
                F.expr("(2000 * coalesce(triangles, 0))"
                       " div (d * (d - 1))")
            ).cast("long").alias("lcc_permille"),
        )
    )


def kcore_peel(
    nodes: DataFrame, edges: DataFrame, k: int = 3, rounds: int = 3
) -> DataFrame:
    """Bounded k-core peeling over the undirected view: ``rounds``
    synchronized sweeps each dropping every node whose CURRENT degree is
    < k (Matula & Beck peeling, the parallel variant — each sweep is one
    degree groupBy + one semi-join on the surviving edge set).  A fixed
    round count keeps the operator a deterministic dataflow (full
    convergence is data-dependent; at web scale you run sweeps until a
    fixed point, each sweep exactly this job).  Dense k-cores of the
    host graph are the classic link-farm / paid-network candidates
    (survivors after peeling are hosts whose mutual linking is too dense
    to be organic).

    Returns (node, status, final_degree): status 'core' for survivors
    with their residual degree, 'peeled' with degree 0.
    """
    und = _symmetrize(edges).localCheckpoint(eager=True)
    alive = und
    for _ in range(int(rounds)):
        deg = alive.groupBy("src").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= int(k)).select("src")
        alive = (
            alive.join(keep, "src", "semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "semi")
            .localCheckpoint(eager=True)
        )
    fdeg = alive.groupBy("src").agg(F.count("*").cast("long").alias("fd"))
    return (
        nodes.select(F.col("node").cast("long").alias("node"))
        .join(fdeg.select(F.col("src").alias("node"), "fd"), "node", "left")
        .select(
            "node",
            F.when(F.col("fd").isNotNull(), F.lit("core"))
            .otherwise(F.lit("peeled")).alias("status"),
            F.coalesce(F.col("fd"), F.lit(0)).cast("long")
            .alias("final_degree"),
        )
    )


def community_modularity(
    labels: DataFrame, edges: DataFrame
) -> DataFrame:
    """Integer-exact Newman modularity per community over the undirected
    view — the quality read-out for :func:`label_propagation` (is the
    host clustering real structure or noise?).  The float definition
    Q = sum_c [ e_c/m - (d_c/2m)^2 ] is scaled by (2m)^2 so every term
    is exact 64-bit arithmetic:

        contrib_scaled_c = (2m) * (2 e_c) - d_c^2,   Q = sum / (2m)^2

    One labels join per edge endpoint (the label relation is O(n),
    broadcastable or shuffle-hashed), one map-side-combined groupBy per
    aggregate; output O(communities).

    Returns (community, n_nodes, internal_edges2, total_degree,
    contrib_scaled) where internal_edges2 = 2*e_c (both directions
    counted — the raw integer, no halving loss).
    """
    und = _symmetrize(edges)
    lab = labels.select(F.col("node").cast("long").alias("node"),
                        F.col("community").cast("long").alias("community"))
    m2_row = und.agg(F.count("*").cast("long").alias("m2"))  # = 2m
    src_lab = lab.select(F.col("node").alias("src"),
                         F.col("community").alias("c_src"))
    dst_lab = lab.select(F.col("node").alias("dst"),
                         F.col("community").alias("c_dst"))
    tagged = und.join(src_lab, "src").join(dst_lab, "dst")
    internal = (
        tagged.filter(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("community"))
        .agg(F.count("*").cast("long").alias("internal_edges2"))
    )
    degree = (
        tagged.groupBy(F.col("c_src").alias("community"))
        .agg(F.count("*").cast("long").alias("total_degree"))
    )
    sizes = lab.groupBy("community").agg(
        F.count("*").cast("long").alias("n_nodes")
    )
    return (
        sizes.join(internal, "community", "left")
        .join(degree, "community", "left")
        .crossJoin(F.broadcast(m2_row))
        .select(
            "community", "n_nodes",
            F.coalesce("internal_edges2", F.lit(0)).cast("long")
            .alias("internal_edges2"),
            F.coalesce("total_degree", F.lit(0)).cast("long")
            .alias("total_degree"),
            (F.col("m2") * F.coalesce(F.col("internal_edges2"), F.lit(0))
             - F.coalesce(F.col("total_degree"), F.lit(0))
             * F.coalesce(F.col("total_degree"), F.lit(0)))
            .cast("long").alias("contrib_scaled"),
        )
    )


def edge_partition_quality(
    edges: DataFrame,
    p: int = 16,
    grid: "tuple[int, int]" = (4, 4),
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Evaluate edge-partitioning strategies for the link graph BEFORE
    committing 10^10 edges to a layout: 1D hash by src, 1D hash by dst,
    and a 2D grid (PowerGraph/GraphX EdgePartition2D).  Two exact
    metrics per scheme:

    - balance_permille: 1000 * total_edges / (p * max_partition_edges)
      — 1000 is a perfectly level load; a hub vertex drags a 1D scheme
      down because ALL its edges hash to one partition, while the grid
      spreads them across a row/column of the grid;
    - repl_factor_permille: average number of distinct partitions that
      see each vertex (x1000) — the vertex-state replication cost of
      vertex-cut execution (Gonzalez et al., OSDI'12: 2D bounds it by
      2*sqrt(p)-1 per vertex; 1D-by-src bounds the SRC side at 1 but
      lets a hub's dst copies reach all p).

    The partition hash is the SQL-replayable (A*x + B) mod P family
    from :mod:`crawlspark.sketch` — deterministic, oracle-exact.

    Plan shape: per scheme one narrow projection to (part), a map-side
    combined groupBy(part) for loads, and one distinct over (vertex,
    part) pairs for replication — each a single bounded shuffle; no
    scheme ever materializes a re-partitioned copy of the edges.

    Returns 3 rows: (scheme, n_parts, n_edges, max_part_edges,
    balance_permille, n_vertices, sum_replicas, repl_factor_permille).
    """
    from .sketch import kmv_hash

    rows, cols = grid
    if rows * cols != p:
        raise ValueError(f"grid {grid} does not tile p={p}")
    hs = kmv_hash(F.col(src_col))
    hd = kmv_hash(F.col(dst_col))
    schemes = {
        "1d_src": F.pmod(hs, F.lit(p)),
        "1d_dst": F.pmod(hd, F.lit(p)),
        "2d_grid": F.pmod(hs, F.lit(rows)) * cols + F.pmod(hd, F.lit(cols)),
    }
    out = None
    for name, part_expr in schemes.items():
        tagged = edges.select(
            F.col(src_col).alias("s"),
            F.col(dst_col).alias("d"),
            part_expr.cast("long").alias("part"),
        )
        loads = tagged.groupBy("part").agg(
            F.count(F.lit(1)).cast("long").alias("load")
        ).agg(
            F.sum("load").alias("n_edges"),
            F.max("load").alias("max_part_edges"),
        )
        verts = (
            tagged.select(F.col("s").alias("v"), "part")
            .unionAll(tagged.select(F.col("d").alias("v"), "part"))
            .distinct()
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("k"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_vertices"),
                F.sum("k").cast("long").alias("sum_replicas"),
            )
        )
        row = loads.crossJoin(verts).select(
            F.lit(name).alias("scheme"),
            F.lit(p).cast("long").alias("n_parts"),
            "n_edges",
            "max_part_edges",
            F.expr(f"(1000 * n_edges) div ({p} * max_part_edges)")
            .alias("balance_permille"),
            "n_vertices",
            "sum_replicas",
            F.expr("(1000 * sum_replicas) div n_vertices")
            .alias("repl_factor_permille"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def _bfs_distances(
    edges: DataFrame,
    seed: int,
    max_depth: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Level-synchronous BFS distances from one seed: (doc, dist) for
    every vertex within ``max_depth`` hops.  Same loop discipline as
    :func:`pagerank` — per level one join + anti-join + distinct, and a
    ``localCheckpoint`` so the plan stays O(1) in depth."""
    spark = edges.sparkSession
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    frontier = spark.createDataFrame(
        [(seed, 0)], "doc long, dist long"
    ).localCheckpoint(eager=True)
    visited = frontier
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier.doc == e.s)
            .select(F.col("d").alias("doc"))
            .distinct()
            .join(visited.select("doc"), "doc", "left_anti")
            .withColumn("dist", F.lit(depth).cast("long"))
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def bowtie_classify(
    edges: DataFrame,
    universe: DataFrame,
    seed: int = 0,
    max_depth: int = 3,
    doc_col: str = "doc",
) -> DataFrame:
    """Broder bow-tie decomposition of the web graph relative to a core
    seed (Broder et al., "Graph structure in the Web", WWW 2000): OUT =
    reachable FROM the seed, IN = vertices that REACH the seed, CORE =
    both (the seed's strongly-connected neighborhood within the depth
    horizon), OTHER = neither (tendrils/disconnected).  Crawl planning
    reads this directly — seeds whose OUT component is small waste a
    frontier; a large IN that the crawl never enters is the coverage
    gap sitemaps must fill.

    Two BFS sweeps (forward on edges, backward on reversed edges),
    each the scale-safe per-level join/anti-join loop; classification
    is two left joins onto the universe — no per-vertex driver work.

    Returns (doc, fwd_dist, bwd_dist, cls) for every universe vertex;
    dists are null outside the horizon.
    """
    fwd = _bfs_distances(edges, seed, max_depth)
    bwd = _bfs_distances(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        seed, max_depth,
    )
    u = universe.select(F.col(doc_col).cast("long").alias("doc"))
    out = (
        u.join(fwd.withColumnRenamed("dist", "fwd_dist"), "doc", "left")
        .join(bwd.withColumnRenamed("dist", "bwd_dist"), "doc", "left")
    )
    cls = (
        F.when(F.col("fwd_dist").isNotNull()
               & F.col("bwd_dist").isNotNull(), "core")
        .when(F.col("fwd_dist").isNotNull(), "out")
        .when(F.col("bwd_dist").isNotNull(), "in")
        .otherwise("other")
    )
    return out.select("doc", "fwd_dist", "bwd_dist", cls.alias("cls"))


def degree_assortativity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Out-in degree assortativity of the link graph (Newman, PRL
    2002): the Pearson correlation, over directed edges, between the
    source's out-degree and the target's in-degree.  Positive r means
    hubs link to popular pages (core-periphery web), negative means
    hubs spray links at obscure pages (directory / spam farms) — a
    one-number shape check a crawl-quality dashboard wants next to
    the Hill tail index.

        r = (M*Sxy - Sx*Sy) / sqrt((M*Sxx - Sx^2) * (M*Syy - Sy^2))

    Everything up to the final divide is an exact BIGINT sum (two
    degree aggregates joined back onto edges — both joins are on the
    edge's own endpoints, co-partitioned equi-joins; degree relations
    are node-sized and broadcastable).  At 10^11-edge scale the five
    sums exceed int64 — promote to decimal(38) there; test-scale
    stays integer-exact.  Returns one row (m, sx, sy, sxy, sxx, syy,
    r_milli); r_milli NULL when either variance is zero.
    """
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    outd = e.groupBy("s").agg(F.count(F.lit(1)).alias("x"))
    ind = e.groupBy("d").agg(F.count(F.lit(1)).alias("y"))
    per_edge = (
        e.join(F.broadcast(outd), "s").join(F.broadcast(ind), "d")
        .select(F.col("x").cast("long").alias("x"),
                F.col("y").cast("long").alias("y"))
    )
    sums = per_edge.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    varx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    return sums.select(
        "m", "sx", "sy", "sxy", "sxx", "syy",
        F.when(
            (varx > 0) & (vary > 0),
            F.round(
                1e3 * num.cast("double")
                / (F.sqrt(varx.cast("double"))
                   * F.sqrt(vary.cast("double"))), 0
            ).cast("long"),
        ).alias("r_milli"),
    )


def canonical_chain_resolve(
    pages: DataFrame,
    url_col: str = "url",
    canonical_col: str = "canonical",
    max_hops: int = 4,
) -> DataFrame:
    """Resolve rel=canonical CHAINS — page A canonicals to B which
    canonicals to C: indexers (and the reference's canonical dedup,
    src/Steps/Loading/HttpCrawl.php canonical handling) honor only
    one hop, so a chain means A's signal never consolidates on C
    unless the crawler resolves it; a LOOP (A->B->A) means neither
    page has a trustworthy canonical at all.

    The canonical relation is functional (<= 1 out-edge per url), so
    resolution is ``max_hops`` self-joins — each hop one
    co-partitioned equi-join on the url key, no iteration state.
    Returns (url, final_url, hops, status) with status in
    {'self', 'direct', 'chain', 'loop', 'dangling_cap'}: 'self' for
    url == canonical, 'direct' one hop to a terminal, 'chain'
    resolved in 2..max_hops hops, 'loop' when the walk revisits the
    start, 'dangling_cap' when max_hops exhausts first.
    """
    edges = pages.select(
        F.col(url_col).alias("u"), F.col(canonical_col).alias("c"))
    cur = edges.select(
        F.col("u").alias("url"),
        F.col("c").alias("final_url"),
        F.when(F.col("u") == F.col("c"), F.lit(0)).otherwise(F.lit(1))
        .alias("hops"),
        (F.col("u") == F.col("c")).alias("done"),
        F.lit(False).alias("loop"),
    )
    for _ in range(int(max_hops) - 1):
        nxt = edges.select(F.col("u").alias("final_url"),
                           F.col("c").alias("__next"))
        cur = (
            cur.join(nxt, "final_url", "left")
            .select(
                "url",
                F.when(
                    ~F.col("done") & ~F.col("loop")
                    & F.col("__next").isNotNull()
                    & (F.col("__next") != F.col("final_url")),
                    F.col("__next"),
                ).otherwise(F.col("final_url")).alias("final_url"),
                F.when(
                    ~F.col("done") & ~F.col("loop")
                    & F.col("__next").isNotNull()
                    & (F.col("__next") != F.col("final_url")),
                    F.col("hops") + 1,
                ).otherwise(F.col("hops")).alias("hops"),
                (
                    F.col("done")
                    | F.col("__next").isNull()
                    | (F.col("__next") == F.col("final_url"))
                ).alias("done"),
                (
                    F.col("loop")
                    | (~F.col("done") & (F.col("__next") == F.col("url")))
                ).alias("loop"),
            )
        )
    status = (
        F.when(F.col("loop"), F.lit("loop"))
        .when(F.col("hops") == 0, F.lit("self"))
        .when(F.col("done") & (F.col("hops") == 1), F.lit("direct"))
        .when(F.col("done"), F.lit("chain"))
        .otherwise(F.lit("dangling_cap"))
    )
    return cur.select("url", "final_url",
                      F.col("hops").cast("long").alias("hops"),
                      status.alias("status"))
