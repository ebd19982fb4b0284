"""Round-3 queries, part 1: crawl-native importance (OPIC), trust
propagation (TrustRank).

House rules: deterministic fixtures from the parquet tables, DuckDB
oracles replaying the identical computation (integer-exact)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _n_docs(spark: SparkSession, sf_dir: str) -> int:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").count()


# --------------------------------------------------------------------------
# opic — greedy cash-flow importance, 4 waves over the formula graph
# --------------------------------------------------------------------------

def q_opic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC over the documents-sized formula graph: 4 greedy waves,
    k = n//20 fetches per wave — importance estimates produced DURING
    the crawl (see crawlspark.linkgraph.opic)."""
    from .linkgraph import opic

    n = _n_docs(spark, sf_dir)
    return opic(spark, n, waves=4)


def _oracle_opic() -> str:
    from .linkgraph import opic_oracle_sql

    return opic_oracle_sql(waves=4)


# --------------------------------------------------------------------------
# trustrank — personalized PageRank from a vetted seed whitelist
# --------------------------------------------------------------------------

def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank over the documents-sized formula graph: 3 iterations,
    seeds = doc % 50 == 0 (see crawlspark.linkgraph.trustrank)."""
    from .linkgraph import trustrank

    n = _n_docs(spark, sf_dir)
    return trustrank(spark, n, seed_mod=50, iters=3)


def _oracle_trustrank() -> str:
    from .linkgraph import trustrank_oracle_sql

    return trustrank_oracle_sql(seed_mod=50, iters=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "opic": q_opic,
        "trustrank": q_trustrank,
        "phash_dihedral": q_phash_dihedral,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "opic": _oracle_opic(),
        "trustrank": _oracle_trustrank(),
        "phash_dihedral": _oracle_phash_dihedral(),
    }


# --------------------------------------------------------------------------
# phash_dihedral — mirror/rotation-canonical image identity + grouping
# --------------------------------------------------------------------------

_W56 = 1 << 56
_U63 = str(1 << 63)
_U64 = str(1 << 64)


def _fixture_phash_col() -> "F.Column":
    """Deterministic 64-bit grid hash from doc_id: byte r of the hash is
    (doc_id*(2r+3) + 17r) % 256; the sign byte wraps two's-complement so
    Spark and DuckDB build the identical BIGINT without overflow."""
    doc = F.col("doc_id")

    def byte(r: int) -> "F.Column":
        return (doc * (2 * r + 3) + 17 * r) % 256

    v_low = byte(0)
    for r in range(1, 7):
        v_low = v_low + byte(r) * (1 << (8 * r))
    b7 = byte(7)
    return (
        v_low
        + F.when(b7 >= 128, (b7 - 256) * _W56).otherwise(b7 * _W56)
    ).cast("long")


def _fixture_phash_sql() -> str:
    terms = " + ".join(
        f"((doc_id * {2 * r + 3} + {17 * r}) % 256) * {1 << (8 * r)}"
        for r in range(7)
    )
    b7 = "((doc_id * 17 + 119) % 256)"
    return (f"({terms} + CASE WHEN {b7} >= 128 THEN ({b7} - 256) * {_W56}"
            f" ELSE {b7} * {_W56} END)")


def _orient_raw_sql(m: int, col: str = "phash") -> str:
    """Raw (unsigned, HUGEINT) value of dihedral orientation ``m`` of a
    64-bit grid hash column — generated from the SAME index maps the
    numpy UDF uses (crawlspark.images.dihedral_index_maps)."""
    from .images import dihedral_index_maps

    amap = dihedral_index_maps()[m]
    terms = []
    for out_idx, (rp, cp) in enumerate(amap):
        src = 8 * rp + cp
        terms.append(
            f"CAST((({col} >> {src}) & 1) AS HUGEINT) * "
            f"CAST('{1 << out_idx}' AS HUGEINT)"
        )
    return "(" + " + ".join(terms) + ")"


def _signed_sql(raw: str) -> str:
    return (f"CAST(CASE WHEN {raw} >= CAST('{_U63}' AS HUGEINT)"
            f" THEN {raw} - CAST('{_U64}' AS HUGEINT)"
            f" ELSE {raw} END AS BIGINT)")


def q_phash_dihedral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-repost grouping: each doc's grid phash plus, for
    doc_id % 4 == 0, a horizontally-mirrored twin; canonicalize under
    the dihedral group and group — twins MUST share canonical_phash
    (group_size 2) while raw phash separates them (see
    crawlspark.images.dihedral_phash_struct)."""
    from pyspark.sql import Window

    from .images import dihedral_phash_struct, phash_hflip

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", _fixture_phash_col().alias("phash"))
    )
    sid = F.col("doc_id").cast("string")
    base = d.select(
        F.concat(F.lit("img-"), sid).alias("image_id"), "phash"
    )
    mirrors = d.filter(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit("img-"), sid, F.lit("-m")).alias("image_id"),
        phash_hflip(F.col("phash")).alias("phash"),
    )
    u = base.unionByName(mirrors)
    res = u.select(
        "image_id", "phash", dihedral_phash_struct(F.col("phash")).alias("s")
    ).select(
        "image_id", "phash",
        F.col("s.canonical_phash").alias("canonical_phash"),
        F.col("s.n_orientations").alias("n_orientations"),
    )
    w = Window.partitionBy("canonical_phash")
    return res.withColumn(
        "group_size", F.count("*").over(w).cast("long")
    )


def _oracle_phash_dihedral() -> str:
    o_exprs = ", ".join(
        f"{_orient_raw_sql(m)} AS o{m}" for m in range(8)
    )
    o_list = ", ".join(f"o{m}" for m in range(8))
    hflip_signed = _signed_sql(_orient_raw_sql(1))
    return f"""
WITH d AS (SELECT doc_id, CAST({_fixture_phash_sql()} AS BIGINT) AS phash
           FROM documents),
u AS (
  SELECT 'img-' || CAST(doc_id AS VARCHAR) AS image_id, phash FROM d
  UNION ALL
  SELECT 'img-' || CAST(doc_id AS VARCHAR) || '-m', {hflip_signed}
  FROM d WHERE doc_id % 4 = 0
),
o AS (SELECT image_id, phash, {o_exprs} FROM u),
c AS (SELECT image_id, phash, LEAST({o_list}) AS l,
             len(list_distinct([{o_list}])) AS nor
      FROM o)
SELECT image_id, phash,
       {_signed_sql('l')} AS canonical_phash,
       CAST(nor AS INTEGER) AS n_orientations,
       CAST(COUNT(*) OVER (PARTITION BY l) AS BIGINT) AS group_size
FROM c
"""
