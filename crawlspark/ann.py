"""Similarity search over embedding columns (array<float>).

- :func:`brute_topk` — exact cosine top-k: broadcast the (small) query set
  against the corpus, dot products via zip_with/aggregate (pure JVM
  expressions, no Python in the loop), rank per query.
- :func:`lsh_buckets` — sign-pattern LSH: a 2^bits bucketing from fixed
  coordinate-contrast hyperplanes; the scale path joins query and corpus on
  bucket before scoring (candidates shrink ~2^bits-fold).

At 100 TB the corpus side stays partitioned; only the query block is
broadcast.  For corpus x corpus ANN you'd IVF it: k-means coarse centroids
(Spark MLlib), assign, then per-centroid brute force.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LSH_BITS = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm2(a) * _norm2(b))


def brute_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query (id < n_queries) against the rest.

    Returns (query_id, rank, neighbor_id) — ranks 1..k by (cosine desc,
    neighbor_id asc).
    """
    q = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.filter(F.col(id_col) >= n_queries).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def lsh_bucket_expr(vec: Column, bits: int = LSH_BITS) -> Column:
    """Sign-pattern bucket: bit j = sign(v[4j]+v[4j+1]-v[4j+2]-v[4j+3]).

    Fixed coordinate-contrast hyperplanes — deterministic, replayable in SQL,
    and adequate for unit-scale embeddings (random hyperplanes would use a
    seeded Gaussian matrix; the plan shape is identical)."""
    b = F.lit(0).cast("long")
    for j in range(bits):
        proj = (
            F.element_at(vec, 4 * j + 1).cast("double")
            + F.element_at(vec, 4 * j + 2).cast("double")
            - F.element_at(vec, 4 * j + 3).cast("double")
            - F.element_at(vec, 4 * j + 4).cast("double")
        )
        b = b + F.when(proj > 0, F.lit(2 ** j)).otherwise(F.lit(0))
    return b


def lsh_buckets(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    return embeddings.select(
        F.col(id_col), lsh_bucket_expr(F.col(vec_col)).alias("bucket")
    )


def lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: score only same-bucket candidates (recall < 1 by design;
    compare against brute_topk for recall measurement)."""
    withb = embeddings.select(
        F.col(id_col), F.col(vec_col), lsh_bucket_expr(F.col(vec_col)).alias("bucket")
    )
    q = withb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    c = withb.filter(F.col(id_col) >= n_queries).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN (the classic inverted-file scale path): a coarse codebook
    partitions the corpus into cells; each query probes only its ``nprobe``
    nearest cells, so scored candidates shrink ~n_centroids/nprobe-fold.

    The codebook here is deterministic — the first ``n_centroids`` corpus
    vectors — so the whole computation replays exactly in SQL (the oracle);
    at real scale the codebook comes from MLlib KMeans ran once and the
    structure is identical: broadcast centroids, one narrow assignment pass
    over the partitioned corpus (no shuffle), then an equi-join on
    ``cent_id`` that AQE can skew-split if cells are unbalanced.

    Returns (query_id, rank, neighbor_id), ranks 1..k by (cosine desc, id).
    """
    cent = embeddings.filter(
        (F.col(id_col) >= n_queries) & (F.col(id_col) < n_queries + n_centroids)
    ).select(
        (F.col(id_col) - n_queries).alias("cent_id"), F.col(vec_col).alias("centv")
    )
    corpus = embeddings.filter(F.col(id_col) >= n_queries).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    # assignment: nearest centroid per corpus vector (ties -> lower cent_id)
    aw = Window.partitionBy("neighbor_id").orderBy(
        F.col("csim").desc(), F.col("cent_id").asc()
    )
    assigned = (
        corpus.crossJoin(F.broadcast(cent))
        .select(
            "neighbor_id", "cv", "cent_id",
            cosine(F.col("cv"), F.col("centv")).alias("csim"),
        )
        .withColumn("arn", F.row_number().over(aw))
        .filter(F.col("arn") == 1)
        .select("neighbor_id", "cv", "cent_id")
    )
    q = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    qw = Window.partitionBy("query_id").orderBy(
        F.col("qsim").desc(), F.col("cent_id").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id", "qv", "cent_id",
            cosine(F.col("qv"), F.col("centv")).alias("qsim"),
        )
        .withColumn("qrn", F.row_number().over(qw))
        .filter(F.col("qrn") <= nprobe)
        .select("query_id", "qv", "cent_id")
    )
    scored = assigned.join(F.broadcast(probes), "cent_id").select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance, doubles, summed in index order (so the DuckDB
    oracle's list_sum comprehension replays the identical IEEE sequence)."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _codebook_row(
    embeddings: DataFrame, n_queries: int, ks: int,
    id_col: str, vec_col: str,
) -> DataFrame:
    """One-row DF holding the PQ codebook: the ``ks`` corpus vectors with the
    smallest ids, ordered, as an array column (tiny — broadcast)."""
    return (
        embeddings.filter(
            (F.col(id_col) >= n_queries) & (F.col(id_col) < n_queries + ks)
        )
        .select(F.struct((F.col(id_col) - n_queries).alias("c"),
                         F.col(vec_col).alias("cv")).alias("e"))
        .agg(F.sort_array(F.collect_list("e")).alias("cb"))
    )


def pq_encode(
    embeddings: DataFrame,
    n_queries: int = 10,
    m: int = 4,
    ks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoder: split each corpus vector into ``m``
    subvectors; each subspace's code is the argmin-L2 entry of that
    subspace's codebook (ties -> lower code).  Returns
    (neighbor_id, codes array<int>) — m small ints per doc instead of the
    full float vector: the memory story that makes 10^10-vector ANN fit
    in cluster RAM (64 floats -> 4 bytes here; real deployments use m=8..64
    over 256-entry codebooks trained with k-means, same plan shape).
    Scheme: Jegou, Douze, Schmid, "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011 (public paper).

    Plan: the codebook rides in as a broadcast one-row array; encoding is a
    pure narrow map of array HOFs (no shuffle, no Python) over the
    partitioned corpus.
    """
    corpus = embeddings.filter(F.col(id_col) >= n_queries).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    cb = _codebook_row(embeddings, n_queries, ks, id_col, vec_col)

    def codes_expr(v: Column, cb_col: Column, sub_len: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.array_min(
                F.transform(
                    cb_col,
                    lambda e: F.struct(
                        _l2sq(
                            F.slice(v, (j * sub_len + 1).cast("int"), sub_len.cast("int")),
                            F.slice(e["cv"], (j * sub_len + 1).cast("int"), sub_len.cast("int")),
                        ).alias("d"),
                        e["c"].alias("c"),
                    ),
                )
            )["c"].cast("int"),
        )

    sub_len = (F.size(F.col("cv")) / m).cast("int")
    return corpus.crossJoin(F.broadcast(cb)).select(
        "neighbor_id",
        codes_expr(F.col("cv"), F.col("cb"), sub_len).alias("codes"),
    )


def pq_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    m: int = 4,
    ks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance top-k: corpus vectors are replaced by their
    quantized reconstructions (codebook entry per subspace — numerically
    identical to the classic per-subspace LUT sum, expressed as one L2 over
    the reconstruction), queries stay exact.  Returns
    (query_id, rank, neighbor_id), ranks 1..k by (approx dist asc, id asc).

    Scale shape: corpus side carries only (id, codes) — the compressed
    representation; reconstruction happens on the fly from the broadcast
    codebook inside the scoring map stage.  Only the query block is
    broadcast; the corpus never shuffles.
    """
    cb = _codebook_row(embeddings, n_queries, ks, id_col, vec_col)
    encoded = pq_encode(embeddings, n_queries, m, ks, id_col, vec_col)
    q = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    sub_len = (F.size(F.col("qv")) / m).cast("int")
    recon = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.slice(
                F.element_at(F.col("cb"), F.element_at(F.col("codes"), j + 1) + 1)["cv"],
                (j * sub_len + 1).cast("int"),
                sub_len.cast("int"),
            ),
        )
    )
    scored = (
        encoded.crossJoin(F.broadcast(cb))
        .crossJoin(F.broadcast(q))
        .select(
            "query_id", "neighbor_id",
            _l2sq(F.col("qv"), recon).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def pq_topk_rerank(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    shortlist: int = 100,
    m: int = 4,
    ks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC-style refine step: PQ asymmetric distance produces a per-query
    shortlist of ``shortlist`` candidates from the compressed corpus, then the
    exact L2 is recomputed for just those candidates and the true top-``k``
    re-ranked.  Returns (query_id, rank, neighbor_id) by (exact L2^2 asc,
    id asc).

    Scale shape: the expensive exact pass touches only |Q| * shortlist rows —
    the full-precision vectors are fetched for the shortlist via an equi-join
    on the corpus id (partition-pruned / bucketable at scale), never scanned
    whole.  This is the standard production composition (PQ scan -> exact
    rerank); PQ alone over an untrained first-``ks`` codebook is a coarse
    sieve, not a ranker.
    """
    cand = pq_topk(
        embeddings, n_queries=n_queries, k=shortlist, m=m, ks=ks,
        id_col=id_col, vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    corpus = embeddings.filter(F.col(id_col) >= n_queries).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    q = embeddings.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    exact = (
        cand.join(corpus, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", _l2sq(F.col("qv"), F.col("cv")).alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication over the embedding column
# ---------------------------------------------------------------------------


def semdedup(
    embeddings: DataFrame,
    n_centroids: int = 8,
    eps_permille: int = 800,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 10_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then inside each cluster drop every example that is
    semantically near-identical (cosine >= eps) to a higher-priority
    member, where priority is similarity-to-centroid (the paper's
    released pseudocode sorts cluster members by centroid similarity and
    drops a row when any earlier member is within eps).

    Scale shape (the reference crawler has no such operator; this is the
    training-data addendum):
    - codebook is deterministic here (the first ``n_centroids`` vectors)
      so the whole computation replays in SQL; at 100 TB the codebook
      comes from MLlib KMeans run once — the plan is identical;
    - assignment is a broadcast of the codebook + one narrow pass over
      the partitioned corpus (no shuffle);
    - the intra-cluster pair generation is an equi-join on ``cent_id``
      (AQE skew-splittable) whose comparison side is CAPPED at the
      ``max_cluster_size`` highest-priority members per cluster — the
      same discipline as minhash_lsh_pairs' max_bucket_size.  A skewed
      embedding space (boilerplate pages collapsing into one centroid)
      is then |cluster| x cap per cluster instead of |cluster|^2.  The
      cap is EXACT for every row whose own priority rank is within the
      cap (all its higher-priority comparators survive the cut); only
      rows deeper than the cap in an over-full cluster can miss a
      mid-ranked duplicate (false keep — recall loss confined to
      degenerate clusters, the standard web-dedup trade).  None =
      uncapped.  At real scale ALSO pick n_centroids so typical
      clusters stay bounded (the paper uses 11k clusters for 233M
      docs) — the cap is the guard rail, not the sizing strategy;
    - all comparisons happen on integer permille values so the DuckDB
      oracle replays them exactly.

    Returns (vec_id, cent_id, centroid_sim_permille, kept) for EVERY
    input row — kept=false rows are the semantic duplicates to drop.
    """
    cent = embeddings.filter(
        (F.col(id_col) >= 0) & (F.col(id_col) < n_centroids)
    ).select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("centv"))
    corpus = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    )
    aw = Window.partitionBy("vid").orderBy(
        F.col("csim_pm").desc(), F.col("cent_id").asc()
    )
    assigned = (
        corpus.crossJoin(F.broadcast(cent))
        .select(
            "vid", "v", "cent_id",
            F.floor(cosine(F.col("v"), F.col("centv")) * 1000)
            .cast("long").alias("csim_pm"),
        )
        .withColumn("arn", F.row_number().over(aw))
        .filter(F.col("arn") == 1)
        .drop("arn")
    )
    a = assigned.select(
        F.col("vid").alias("id_a"), F.col("v").alias("va"),
        "cent_id", F.col("csim_pm").alias("pa"),
    )
    b_src = assigned
    if max_cluster_size is not None:
        # priority rank within the cluster (same total order the drop rule
        # uses); only the top-cap members serve as comparators
        wc = Window.partitionBy("cent_id").orderBy(
            F.col("csim_pm").desc(), F.col("vid").asc()
        )
        b_src = (
            assigned.withColumn("__pr", F.row_number().over(wc))
            .filter(F.col("__pr") <= max_cluster_size)
            .drop("__pr")
        )
    b = b_src.select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"),
        "cent_id", F.col("csim_pm").alias("pb"),
    )
    higher_priority = (F.col("pb") > F.col("pa")) | (
        (F.col("pb") == F.col("pa")) & (F.col("id_b") < F.col("id_a"))
    )
    dropped = (
        a.join(b, "cent_id")
        .filter(
            (F.col("id_a") != F.col("id_b"))
            & higher_priority
            & (
                F.floor(cosine(F.col("va"), F.col("vb")) * 1000)
                >= F.lit(eps_permille)
            )
        )
        .select(F.col("id_a").alias("vid"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("_drop", F.lit(True)), "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cent_id",
            F.col("csim_pm").alias("centroid_sim_permille"),
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
        )
    )


def knn_label_eval(
    embeddings: DataFrame,
    query_mod: int = 10,
    ks: "tuple[int, ...]" = (1, 5, 10),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-space quality eval: kNN label recall/precision@k —
    the curation-side check that an embedding column is good enough to
    drive semantic dedup / ANN retrieval before 100 TB of it is built.
    Queries are the held-out rows (id % query_mod == 0); ground truth
    is the label column; a query "hits" at k when any of its top-k
    cosine neighbors (excluding itself) shares its label.

    Plan shape: the held-out query block is small by construction
    (1/query_mod of an eval SAMPLE, never the corpus) and is the
    broadcast side; the corpus side stays partitioned, per-query
    ranking is a window keyed by query id (no global window).  One
    scored pass serves every k (conditional aggregation), so adding
    cut-offs costs nothing.

    Returns one row per k: (k, n_queries, n_hits, recall_permille,
    n_matches, precision_permille) — integer-exact rollups of a
    double-cosine ranking, replayable in SQL.
    """
    kmax = max(ks)
    q = embeddings.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col(label_col).alias("qlabel"),
    )
    c = embeddings.filter(F.col(id_col) % query_mod != 0).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col(label_col).alias("clabel"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "qlabel", "neighbor_id", "clabel",
        cosine(F.col("qv"), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    ranked = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= kmax)
        .withColumn("match", (F.col("clabel") == F.col("qlabel")).cast("long"))
    )
    per_q = ranked.groupBy("query_id").agg(
        *[
            F.sum(F.when(F.col("rnk") <= kk, F.col("match")).otherwise(0))
            .alias(f"m{kk}")
            for kk in ks
        ]
    )
    tot = per_q.agg(
        F.count("*").cast("long").alias("n_queries"),
        *[x for kk in ks for x in (
            F.sum((F.col(f"m{kk}") > 0).cast("long")).alias(f"h{kk}"),
            F.sum(F.col(f"m{kk}")).cast("long").alias(f"t{kk}"),
        )],
    )
    stack_args = ", ".join(
        f"{kk}L, h{kk}, t{kk}" for kk in ks
    )
    return (
        tot.select(
            "n_queries",
            F.expr(
                f"stack({len(ks)}, {stack_args}) AS (k, n_hits, n_matches)"
            ),
        )
        .select(
            "k", "n_queries", "n_hits",
            F.expr("(1000 * n_hits) div n_queries").alias("recall_permille"),
            "n_matches",
            F.expr("(1000 * n_matches) div (n_queries * k)")
            .alias("precision_permille"),
        )
        .orderBy("k")
    )
