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
