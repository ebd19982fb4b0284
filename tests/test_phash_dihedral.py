"""Dihedral-canonical phash: mirror/rotation-invariant image identity
(numpy UDF vs brute-force python, twin grouping, symmetry counting)."""

import numpy as np
from pyspark.sql import functions as F

from crawlspark.images import (
    dihedral_index_maps,
    dihedral_phash_struct,
    phash_hflip,
)


def _brute(ph: int):
    """Per-hash python replay straight from the index maps."""
    u = ph & ((1 << 64) - 1)
    bits = [(u >> k) & 1 for k in range(64)]
    vals = []
    for amap in dihedral_index_maps():
        v = 0
        for out_idx, (rp, cp) in enumerate(amap):
            v |= bits[8 * rp + cp] << out_idx
        vals.append(v)
    canon = min(vals)
    return (canon - (1 << 64) if canon >= (1 << 63) else canon,
            len(set(vals)))


def test_dihedral_matches_bruteforce(spark):
    hashes = [0, -1, 1, 0x0123456789ABCDEF, -0x123456789ABCDEF,
              0x8000000000000000 - (1 << 64), 42424242424242]
    df = spark.createDataFrame([(h,) for h in hashes], "phash LONG")
    got = {
        r.phash: (r.s.canonical_phash, r.s.n_orientations)
        for r in df.select(
            "phash", dihedral_phash_struct(F.col("phash")).alias("s")
        ).collect()
    }
    for h in hashes:
        assert got[h] == _brute(h), h


def test_mirror_twin_shares_canonical(spark):
    df = spark.createDataFrame([(0x0123456789ABCDEF,)], "phash LONG")
    flipped = df.select(phash_hflip(F.col("phash")).alias("phash"))
    both = df.unionByName(flipped)
    canons = [
        r.s.canonical_phash
        for r in both.select(
            dihedral_phash_struct(F.col("phash")).alias("s")).collect()
    ]
    assert len(canons) == 2 and canons[0] == canons[1]
    # and the raw hashes differ (flip really changed the grid)
    raws = [r.phash for r in both.collect()]
    assert raws[0] != raws[1]


def test_symmetric_grids_collapse_orientations(spark):
    # all-ones grid: every orientation identical -> 1
    # single centered-symmetric pattern: rot180-invariant -> <= 4
    all_ones = -1
    rows = [(all_ones,), (0,)]
    df = spark.createDataFrame(rows, "phash LONG")
    got = [
        r.s.n_orientations
        for r in df.select(
            dihedral_phash_struct(F.col("phash")).alias("s")).collect()
    ]
    assert got == [1, 1]


def test_canonical_is_group_invariant(spark):
    """Canonicalizing any orientation of a hash yields the same value —
    the property that makes it usable as a dedup key."""
    rng = np.random.default_rng(7)
    base = int(rng.integers(0, 2**63))
    u = base & ((1 << 64) - 1)
    bits = [(u >> k) & 1 for k in range(64)]
    variants = []
    for amap in dihedral_index_maps():
        v = 0
        for out_idx, (rp, cp) in enumerate(amap):
            v |= bits[8 * rp + cp] << out_idx
        variants.append(v - (1 << 64) if v >= (1 << 63) else v)
    df = spark.createDataFrame([(v,) for v in variants], "phash LONG")
    canons = {
        r.s.canonical_phash
        for r in df.select(
            dihedral_phash_struct(F.col("phash")).alias("s")).collect()
    }
    assert len(canons) == 1


def test_dihedral_null_phash_stays_null(spark):
    """NULL phash (decode failed) must yield NULL canonical values, not
    a garbage int64 that groups all corrupt rows as near-dups."""
    from pyspark.sql import functions as F

    from crawlspark.images import dihedral_phash_struct, phash_hflip

    df = spark.createDataFrame(
        [(1, 12345), (2, None), (3, -7)], "i long, ph long"
    )
    out = df.select(
        "i",
        dihedral_phash_struct(F.col("ph")).alias("c"),
        phash_hflip(F.col("ph")).alias("hf"),
    ).collect()
    by = {r["i"]: r for r in out}
    assert by[2]["c"]["canonical_phash"] is None
    assert by[2]["c"]["n_orientations"] is None
    assert by[2]["hf"] is None
    assert by[1]["c"]["canonical_phash"] is not None
    assert by[3]["hf"] is not None
