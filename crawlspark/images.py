"""Image payload path: the input_hint table
(image_id string, bytes binary, w int32, h int32, fmt string, caption string,
phash int64), with decode / validate / phash as batched Arrow stages.

No image codec library ships in this container, so the codec is a
clearly-marked deterministic stand-in (CODEC NOTE below); everything
Spark-side — schema, binary columns, mapInPandas batching, partitioning,
PSNR/caption validation — is real and is what would surround libjpeg/PIL in
production.

CODEC NOTE (deterministic fake, honest math):
- "png"  = zlib(raw RGB)                      -> lossless round-trip
- "jpeg" = zlib(quantize(raw, step=4))        -> lossy; uniform error in
  [-2,2), MSE ~ 1.25 -> PSNR ~ 47 dB (>= 40 dB gate holds by construction
  but is MEASURED per row, not assumed)
- "webp" = zlib(quantize(raw, step=6))        -> lossy, PSNR ~ 43 dB
A real decoder drops in by replacing _encode/_decode only.

Pixels are a deterministic function of image_id (seeded PCG64), so the
"reference payload" for the per-row invariant (decoded-pixel allclose /
PSNR >= 40 dB + caption equality, BASELINE.json input_hint) is reproducible
anywhere.

Captions take the reference text normalization (collapse whitespace + trim,
reference: src/Steps/Dom/Node.php:108-120).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# caption words split on JAVA \s (ASCII whitespace), NOT Python's Unicode
# str.split(): the pipeline's reference-caption rederivation is a Spark
# split(text, '\\s+') and the two must agree byte-for-byte on text
# containing Unicode whitespace (U+00A0 etc.)
_ASCII_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def caption_words(text: str | None) -> list[str]:
    # no .strip(): Python str.strip() removes UNICODE whitespace (U+00A0
    # etc.) which the Spark twin below cannot see — leading/trailing ASCII
    # runs already yield empty tokens that the filter drops
    return [w for w in _ASCII_WS_RE.split(text or "") if w]


def ref_caption_col(text) -> "F.Column":
    """Spark-side byte-for-byte twin of ``caption_words`` + join: ASCII-WS
    tokenization (Unicode whitespace stays INSIDE words), first
    CAPTION_WORDS words joined by single spaces.  Every re-derivation of
    the reference caption (pipeline caption_ok gate, oracle queries) must
    go through this one expression or the generator and the validator
    drift apart."""
    words = F.filter(
        F.split(text, "[ \\t\\n\\x0B\\f\\r]+"), lambda w: w != ""
    )
    return F.array_join(F.slice(words, 1, CAPTION_WORDS), " ")

IMAGE_SCHEMA = (
    "image_id STRING, bytes BINARY, w INT, h INT, fmt STRING, "
    "caption STRING, phash LONG"
)
QUANT_STEP = {"png": 1, "jpeg": 4, "webp": 6}
FMTS = ["png", "jpeg", "webp"]
CAPTION_WORDS = 10


def _pixels(image_id_num: int, w: int, h: int) -> np.ndarray:
    rng = np.random.default_rng(image_id_num)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _encode(px: np.ndarray, fmt: str) -> bytes:
    step = QUANT_STEP[fmt]
    if step > 1:
        px = ((px.astype(np.int32) + step // 2) // step * step).clip(0, 255).astype(np.uint8)
    return zlib.compress(px.tobytes(), level=1)


def _decode(b: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(zlib.decompress(b), dtype=np.uint8).reshape(h, w, 3)


_PHASH_WEIGHTS = 1 << np.arange(64, dtype=np.uint64)


def _phash64(px: np.ndarray) -> int:
    """Mean-hash: 8x8 grid of block means thresholded by the global mean.

    Vectorized: two ``np.add.reduceat`` passes compute all 64 block sums
    (same block boundaries and the same values as the per-block mean loop
    this replaces — sum/area == mean over the identical index ranges)."""
    h, w, _ = px.shape
    g = px.mean(axis=2)
    ys = np.linspace(0, h, 9, dtype=int)
    xs = np.linspace(0, w, 9, dtype=int)
    row_sums = np.add.reduceat(g, ys[:8], axis=0)
    sums = np.add.reduceat(row_sums, xs[:8], axis=1)
    areas = np.outer(np.diff(ys), np.diff(xs))
    blocks = sums / areas
    bits = (blocks > blocks.mean()).flatten()
    v = int((bits * _PHASH_WEIGHTS).sum())
    return v - (1 << 64) if v >= (1 << 63) else v


def dims_for(doc_id: int) -> tuple[int, int]:
    return 32 + doc_id % 32, 32 + doc_id % 24


def fmt_for(doc_id: int) -> str:
    return FMTS[doc_id % 3]


def generate_images(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Build the input_hint images table deterministically from documents.

    One mapInPandas pass: pixel synth + encode + phash per Arrow batch; no
    per-row Python at the DataFrame level.  Pass ``docs`` (doc_id, text) to
    generate for a SUBSET — e.g. only crawled documents — instead of paying
    the codec work for the whole corpus."""
    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = docs.select("doc_id", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                w, h = dims_for(doc_id)
                fmt = fmt_for(doc_id)
                px = _pixels(doc_id, w, h)
                caption = " ".join(caption_words(text)[:CAPTION_WORDS])
                enc = _encode(px, fmt)  # once: encode dominates the loop
                rows.append(
                    {
                        "image_id": f"img-{doc_id}",
                        "bytes": enc,
                        "w": w,
                        "h": h,
                        "fmt": fmt,
                        "caption": caption,
                        "phash": _phash64(px if fmt == "png" else _decode(enc, w, h)),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(gen, IMAGE_SCHEMA)


VALIDATE_SCHEMA = (
    "image_id STRING, fmt STRING, psnr_mdb LONG, lossless_ok BOOLEAN, "
    "phash_match BOOLEAN, caption STRING"
)


def validate_images(images: DataFrame) -> DataFrame:
    """Per-row invariant check vs the reference payload (regenerated from
    image_id): decoded-pixel allclose for lossless, PSNR (milli-dB) for
    lossy, phash equality.  Batched decode, no per-row Python rows."""

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                doc_id = int(r.image_id.split("-", 1)[1])
                ref = _pixels(doc_id, r.w, r.h)
                got = _decode(r.bytes, r.w, r.h)
                diff = got.astype(np.float64) - ref.astype(np.float64)
                mse = float((diff * diff).mean())
                if mse == 0.0:
                    psnr_mdb = 10_000_000  # lossless sentinel (1e4 dB)
                else:
                    psnr_mdb = int(round(1000 * 10 * np.log10(255.0 ** 2 / mse)))
                rows.append(
                    {
                        "image_id": r.image_id,
                        "fmt": r.fmt,
                        "psnr_mdb": psnr_mdb,
                        "lossless_ok": bool(mse == 0.0) if r.fmt == "png" else True,
                        "phash_match": _phash64(got) == r.phash,
                        "caption": r.caption,
                    }
                )
            yield pd.DataFrame(rows)

    return images.mapInPandas(check, VALIDATE_SCHEMA)


def phash_hamming(a, b):
    """Column expr: hamming distance between two phash columns."""
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))


def near_dup_images_by_phash(
    images: DataFrame,
    max_dist: int = 6,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate image pairs by phash hamming distance, banded with
    EXACT recall: the 64 bits split into max_dist+1 bands, so by pigeonhole
    any pair within max_dist differs in at most max_dist bands and must
    share at least one band verbatim — every qualifying pair enters the
    candidate join (a fixed 4x16-bit banding only guaranteed recall for
    distance <= 3).  Candidates then verify the true distance.

    Plan: one posexplode to (band_idx, band_val) rows, ONE self-join on
    the pair, distinct, verify — a single exchange of (max_dist+1)*n
    16-byte rows instead of max_dist+1 separate join stages.

    Scale note — ``max_bucket_size``: nb = max_dist+1 bands over 64 bits
    means bands of only 64/nb bits (9 at max_dist=6, so <= 1024 distinct
    values per band index), and candidate volume is sum(bucket^2) per
    band.  Real phash corpora cluster (most buckets tiny, boilerplate /
    monochrome images piling into a few), so the cap bounds the degenerate
    buckets exactly like minhash_lsh_pairs' cap: members dropped from an
    over-full bucket can still pair through their OTHER nb-1 bands, so
    recall loss is confined to pairs that are near-identical in every
    band.  None = uncapped (exact recall, only safe when n / 2^band_bits
    stays modest)."""
    band_vals = _phash_bands(max_dist)
    banded = images.select(
        "image_id", "phash", F.posexplode(band_vals).alias("bi", "bv")
    )
    if max_bucket_size is not None:
        wb = Window.partitionBy("bi", "bv").orderBy("image_id")
        banded = (
            banded.withColumn("__r", F.row_number().over(wb))
            .filter(F.col("__r") <= max_bucket_size)
            .drop("__r")
        )
    a = banded.select(
        F.col("image_id").alias("id_a"), F.col("phash").alias("ph_a"), "bi", "bv"
    )
    b = banded.select(
        F.col("image_id").alias("id_b"), F.col("phash").alias("ph_b"), "bi", "bv"
    )
    pairs = (
        a.join(b, ["bi", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
    )
    dist = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return pairs.select("id_a", "id_b", dist.alias("hamming")).filter(
        F.col("hamming") <= max_dist
    )


CODEC_ROUNDTRIP_SCHEMA = (
    "image_id STRING, fmt STRING, psnr_mdb LONG, lossless_ok BOOLEAN, "
    "phash LONG"
)


PATCH_SCHEMA = (
    "image_id STRING, py INT, px INT, patch BINARY, "
    "mean_r_milli LONG, mean_g_milli LONG, mean_b_milli LONG"
)


def patchify(images: DataFrame, patch: int = 8) -> DataFrame:
    """ViT-style patch extraction: cut each decoded image into
    ``patch x patch`` non-overlapping RGB patches (partial edge patches
    dropped, as ViT does) and emit one row per patch with the raw patch
    bytes plus per-channel milli-means (integer-quantized so downstream
    comparisons are bit-stable).

    One Arrow-batched ``mapInPandas`` stage: decode + a single numpy
    reshape/transpose produces ALL patches of an image at once (no
    per-patch Python), and the per-channel means are one vectorized
    reduction over the (ny, nx, P, P, 3) block view.  Output volume is
    ~1x the decoded pixels, so the stage is narrow — patch rows inherit
    the input partitioning and flow straight into a training-shard
    writer without a shuffle."""
    cols = images.select("image_id", "bytes", "w", "h")

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = patch
        for pdf in batches:
            out: dict[str, list] = {
                "image_id": [], "py": [], "px": [], "patch": [],
                "mean_r_milli": [], "mean_g_milli": [], "mean_b_milli": [],
            }
            for image_id, b, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"]
            ):
                w, h = int(w), int(h)
                arr = _decode(bytes(b), w, h)
                ny, nx = h // p, w // p
                if ny == 0 or nx == 0:
                    continue
                blocks = (
                    arr[: ny * p, : nx * p]
                    .reshape(ny, p, nx, p, 3)
                    .transpose(0, 2, 1, 3, 4)
                )  # (ny, nx, p, p, 3)
                # integer milli-means: sum*1000 // area — exact, no float
                sums = blocks.sum(axis=(2, 3), dtype=np.int64)
                milli = (sums * 1000 // (p * p)).reshape(ny * nx, 3)
                flat = np.ascontiguousarray(blocks).reshape(ny * nx, -1)
                npatch = ny * nx
                out["image_id"].extend([image_id] * npatch)
                out["py"].extend(np.repeat(np.arange(ny), nx).tolist())
                out["px"].extend(np.tile(np.arange(nx), ny).tolist())
                out["patch"].extend(flat[r].tobytes() for r in range(npatch))
                out["mean_r_milli"].extend(milli[:, 0].tolist())
                out["mean_g_milli"].extend(milli[:, 1].tolist())
                out["mean_b_milli"].extend(milli[:, 2].tolist())
            yield pd.DataFrame(out)

    return cols.mapInPandas(cut, PATCH_SCHEMA)


def codec_roundtrip_virtual(spark: SparkSession, n: int) -> DataFrame:
    """Fused synth + encode + decode + validate in ONE mapInPandas stage.

    The chained ``validate_images(generate_images_virtual(...))`` shape moves
    every image's bytes JVM->Python->JVM->Python (4 Arrow crossings); fusing
    the two stages keeps the pixels inside one Python worker — measured ~7x
    faster at equal cores, and its CPU footprint equals the core count
    (the chained shape runs two Python workers per task).  This is the shape
    the real fetch+decode stage uses: validate at generation, ship only the
    verdict."""
    ids = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                w, h = dims_for(doc_id)
                fmt = fmt_for(doc_id)
                px = _pixels(doc_id, w, h)
                got = _decode(_encode(px, fmt), w, h)
                diff = got.astype(np.float64) - px.astype(np.float64)
                mse = float((diff * diff).mean())
                psnr_mdb = (
                    10_000_000 if mse == 0.0
                    else int(round(1000 * 10 * np.log10(255.0 ** 2 / mse)))
                )
                rows.append(
                    {
                        "image_id": f"img-{doc_id}",
                        "fmt": fmt,
                        "psnr_mdb": psnr_mdb,
                        "lossless_ok": bool(mse == 0.0) if fmt == "png" else True,
                        "phash": _phash64(got),
                    }
                )
            yield pd.DataFrame(rows)

    return ids.mapInPandas(work, CODEC_ROUNDTRIP_SCHEMA)


def generate_images_virtual(spark: SparkSession, n: int) -> DataFrame:
    """Images over a virtual id space (scale benchmarking — the codec work
    is identical, no parquet dependency)."""
    ids = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                w, h = dims_for(doc_id)
                fmt = fmt_for(doc_id)
                px = _pixels(doc_id, w, h)
                enc = _encode(px, fmt)  # once: encode dominates the loop
                rows.append(
                    {
                        "image_id": f"img-{doc_id}",
                        "bytes": enc,
                        "w": w,
                        "h": h,
                        "fmt": fmt,
                        "caption": f"virtual image {doc_id}",
                        "phash": _phash64(
                            px if fmt == "png" else _decode(enc, w, h)
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, IMAGE_SCHEMA)


def sniff_image_format(bytes_col) -> "F.Column":
    """Magic-byte MIME sniff of an image ``binary`` column — the trust-
    nothing check an image crawler runs before decode (Content-Type and
    file extensions lie; WHATWG MIME-sniffing §6.1 image patterns):

        FF D8 FF            -> jpeg
        89 50 4E 47         -> png
        47 49 46 38         -> gif
        52 49 46 46 .. 57 45 42 50 (RIFF....WEBP) -> webp
        42 4D               -> bmp

    Pure JVM (hex of the first 16 bytes + prefix tests) so it fuses into
    the scan — no UDF, no decode, no Python.  Returns 'unknown' for
    anything else; rows where this disagrees with the table's declared
    ``fmt`` are quarantined before the (expensive, Arrow-batched) decode
    stage ever sees them.
    """
    if isinstance(bytes_col, str):
        bytes_col = F.col(bytes_col)
    head = F.hex(F.substring(bytes_col, 1, 16))
    return (
        F.when(head.startswith("FFD8FF"), F.lit("jpeg"))
        .when(head.startswith("89504E47"), F.lit("png"))
        .when(head.startswith("47494638"), F.lit("gif"))
        .when(
            head.startswith("52494646")
            & (F.substring(head, 17, 8) == "57454250"),
            F.lit("webp"),
        )
        .when(head.startswith("424D"), F.lit("bmp"))
        .otherwise(F.lit("unknown"))
    )


def _phash_bands(max_dist: int) -> "F.Column":
    """array of (max_dist+1) band values for the 64-bit phash column —
    shared by the batch near-dup join and the incremental index."""
    nb = max_dist + 1
    widths = [64 // nb + (1 if i < 64 % nb else 0) for i in range(nb)]
    starts = [sum(widths[:i]) for i in range(nb)]
    return F.array(*[
        F.shiftrightunsigned(F.col("phash"), starts[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1 if widths[i] < 64 else -1)
        )
        for i in range(nb)
    ])


def phash_band_index(
    images: DataFrame,
    max_dist: int = 6,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """The phash LSH index as a persistable relation — the image-side
    twin of textops.dedup.banded_signatures: (image_id, phash, bi, bv)
    rows, one per band.  Write it partitioned/bucketed by (bi, bv) and a
    nightly crawl batch probes it without re-banding the archive.
    Pigeonhole recall as in :func:`near_dup_images_by_phash`: any pair
    within ``max_dist`` shares at least one of the max_dist+1 bands.

    ``max_bucket_size`` caps degenerate buckets exactly like the batch
    operator (monochrome/boilerplate images pile into a few band values
    and would blow the probe join at archive scale); capped members can
    still pair through their other bands, so recall loss is confined to
    pairs near-identical in every band.  None = uncapped.
    """
    banded = images.select(
        "image_id", "phash",
        F.posexplode(_phash_bands(max_dist)).alias("bi", "bv"),
    )
    if max_bucket_size is not None:
        wb = Window.partitionBy("bi", "bv").orderBy("image_id")
        banded = (
            banded.withColumn("__r", F.row_number().over(wb))
            .filter(F.col("__r") <= max_bucket_size)
            .drop("__r")
        )
    return banded


def phash_incremental_pairs(
    index: DataFrame,
    new_images: DataFrame,
    max_dist: int = 6,
) -> DataFrame:
    """Incremental image near-dup: band ONLY the new crawl batch and
    probe the standing band index (new-vs-old) plus the batch itself
    (new-vs-new) — the archive is never re-banded or re-joined against
    itself, so a day's batch costs O(|batch| x bucket occupancy), not
    O(|archive|).  Same discipline as
    textops.dedup.minhash_lsh_incremental_pairs: emits exactly the pairs
    that involve at least one new image; old-archive ∪ incremental =
    full-batch pairs (lossless decomposition, proven in tests).

    Returns (id_a, id_b, hamming) with id_a < id_b, hamming <= max_dist.
    """
    nb = phash_band_index(new_images, max_dist=max_dist)
    standing = index.unionByName(nb)
    a = nb.select(F.col("image_id").alias("id_x"),
                  F.col("phash").alias("ph_x"), "bi", "bv")
    b = standing.select(F.col("image_id").alias("id_y"),
                        F.col("phash").alias("ph_y"), "bi", "bv")
    pairs = (
        a.join(b, ["bi", "bv"])
        .filter(F.col("id_x") != F.col("id_y"))
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
            F.when(F.col("id_x") < F.col("id_y"), F.col("ph_x"))
             .otherwise(F.col("ph_y")).alias("ph_a"),
            F.when(F.col("id_x") < F.col("id_y"), F.col("ph_y"))
             .otherwise(F.col("ph_x")).alias("ph_b"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return pairs.select("id_a", "id_b", dist.alias("hamming")).filter(
        F.col("hamming") <= max_dist
    )


THUMB_MIN_SIDE = 64


def thumbnail_pyramid_plan(
    images: DataFrame,
    min_side: int = THUMB_MIN_SIDE,
) -> DataFrame:
    """Thumbnail-pyramid planning — the serving-side prep an image
    corpus runs after validation: per image, the halving levels
    (w/2^k, h/2^k) down to (exclusive) ``min_side`` on the short edge,
    with the byte estimate 3*w*h per level (raw RGB before codec).
    Level 0 is the original.  Pure HOF fan-out over (w, h) — the decode
    work this plan drives is the expensive Arrow stage, the plan itself
    is free.  Returns (image_id, level, w, h, est_bytes).
    """
    # integer-exact level list: every k (halvings) where the short edge
    # still meets min_side — level 0 (the original) always qualifies
    dims = F.expr(
        "transform("
        "  filter(sequence(0, 12),"
        f"    k -> (least(w, h) div shiftleft(1, k)) >= {int(min_side)}"
        "        OR k = 0),"
        "  k -> struct(CAST(w div shiftleft(1, k) AS BIGINT) AS w,"
        "              CAST(h div shiftleft(1, k) AS BIGINT) AS h))"
    )
    return images.select(
        "image_id",
        F.posexplode(dims).alias("level", "d"),
    ).select(
        "image_id",
        F.col("level").cast("int").alias("level"),
        F.col("d.w").cast("int").alias("w"),
        F.col("d.h").cast("int").alias("h"),
        (F.col("d.w") * F.col("d.h") * 3).cast("long").alias("est_bytes"),
    )


# --------------------------------------------------------------------------
# dihedral-canonical phash: mirror/rotation-invariant image identity
# --------------------------------------------------------------------------

_DIHEDRAL_MAPS = None


def _dihedral_grids(bits: np.ndarray) -> list[np.ndarray]:
    """The 8 dihedral-group orientations of (n, 8, 8) bit grids, in the
    FIXED order the oracle SQL generator replays: identity, hflip,
    vflip, rot180, transpose, transpose+hflip, transpose+vflip,
    transpose+rot180."""
    t = bits.swapaxes(1, 2)
    return [
        bits, bits[:, :, ::-1], bits[:, ::-1, :], bits[:, ::-1, ::-1],
        t, t[:, :, ::-1], t[:, ::-1, :], t[:, ::-1, ::-1],
    ]


def dihedral_index_maps() -> list[list[tuple[int, int]]]:
    """For each orientation, the source (row, col) feeding output bit
    (r, c) in row-major order — consumed by the oracle SQL generator so
    SQL and numpy share ONE definition of the group."""
    maps = []
    for g in _dihedral_grids(np.arange(64, dtype=np.int64).reshape(1, 8, 8)):
        flat = g.reshape(64)
        maps.append([(int(v) // 8, int(v) % 8) for v in flat])
    return maps


def dihedral_phash_struct(phash_col) -> "F.Column":
    """Mirror/rotation-canonical perceptual hash: reposted web images
    are routinely FLIPPED (memes, product shots, art mirrors), which
    scrambles a raw 64-bit grid hash — every dihedral variant of the
    image yields a different phash and near-dup banding misses the
    pair.  Canonicalizing the HASH costs nothing at fetch time: the
    8x8 bit grid of the mean-hash commutes with the image's dihedral
    transforms, so min over the 8 grid permutations (as unsigned
    64-bit values) is a flip/rotation-invariant identity.

    One Arrow-vectorized pandas_udf over the int64 column — unpack to
    (n, 8, 8) bit grids, 8 numpy views, repack with disjoint-bit
    weights, unsigned min; no per-row Python.  At 10^10 images this is
    a narrow scan-fused stage.

    Returns struct<canonical_phash:long, n_orientations:int> —
    n_orientations counts DISTINCT variants (1/2/4 for self-symmetric
    grids; symmetric logos collapse hard).
    """
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("canonical_phash LONG, n_orientations INT")
    def canon(ph: pd.Series) -> pd.DataFrame:
        # NULL phash (decode failed, hash never computed) must come out
        # NULL: a blind int64 cast of the NaN-bearing batch would emit
        # garbage (INT64_MIN) and group all such rows as "near-dups"
        isna = ph.isna().to_numpy()
        k = ph.fillna(0).to_numpy(dtype=np.int64).astype(np.uint64)
        if len(k) == 0 or isna.all():
            return pd.DataFrame({
                "canonical_phash": pd.array([None] * len(k), dtype="Int64"),
                "n_orientations": pd.array([None] * len(k), dtype="Int32"),
            })
        shifts = (np.uint64(8) * np.arange(8, dtype=np.uint64))
        rows = (k[:, None] >> shifts) & np.uint64(0xFF)
        bits = ((rows[:, :, None] >> np.arange(8, dtype=np.uint64))
                & np.uint64(1)).astype(np.uint8)  # (n, row, col)
        w = np.uint64(1) << (
            np.uint64(8) * np.arange(8, dtype=np.uint64)[:, None]
            + np.arange(8, dtype=np.uint64)[None, :]
        )
        vals = np.stack(
            [ (g.astype(np.uint64) * w).sum(axis=(1, 2), dtype=np.uint64)
              for g in _dihedral_grids(bits) ],
            axis=1,
        )  # (n, 8) raw uint64 per orientation
        s = np.sort(vals, axis=1)
        nor = (1 + (s[:, 1:] != s[:, :-1]).sum(axis=1)).astype(np.int32)
        cp = pd.array(s[:, 0].astype(np.int64), dtype="Int64")
        no = pd.array(nor, dtype="Int32")
        cp[isna] = None
        no[isna] = None
        return pd.DataFrame({"canonical_phash": cp, "n_orientations": no})

    return canon(phash_col)


def phash_hflip(phash_col) -> "F.Column":
    """The horizontal-mirror variant of a 64-bit grid phash (orientation
    1 of :func:`dihedral_phash_struct`) — fixture/test helper for
    planting mirrored reposts."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("long")
    def flip(ph: pd.Series) -> pd.Series:
        isna = ph.isna().to_numpy()
        k = ph.fillna(0).to_numpy(dtype=np.int64).astype(np.uint64)
        shifts = (np.uint64(8) * np.arange(8, dtype=np.uint64))
        rows = (k[:, None] >> shifts) & np.uint64(0xFF)
        bits = ((rows[:, :, None] >> np.arange(8, dtype=np.uint64))
                & np.uint64(1)).astype(np.uint8)
        g = bits[:, :, ::-1]
        w = np.uint64(1) << (
            np.uint64(8) * np.arange(8, dtype=np.uint64)[:, None]
            + np.arange(8, dtype=np.uint64)[None, :]
        )
        v = (g.astype(np.uint64) * w).sum(axis=(1, 2), dtype=np.uint64)
        out = pd.array(v.astype(np.int64), dtype="Int64")
        out[isna] = None
        return pd.Series(out)

    return flip(phash_col)


# EXIF orientation tag (1..8) -> the dihedral op that uprights the pixels.
# Tags 5-8 transpose the raster, so width/height swap; tag 1 is a no-op.
_EXIF_TRANSFORMS = {
    1: ("identity", False),
    2: ("flip_h", False),
    3: ("rot180", False),
    4: ("flip_v", False),
    5: ("transpose", True),
    6: ("rot90_cw", True),
    7: ("transverse", True),
    8: ("rot270_cw", True),
}


def exif_orientation_plan(
    imgs: DataFrame,
    orientation_col: str = "exif_orientation",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Upright-normalization planning from the EXIF orientation tag —
    cameras store the raster sensor-side-up and record how to display it
    (tag 1..8 of the TIFF/EXIF spec); a training table must normalize
    BEFORE patchify/resize or a rotated image trains as a different
    picture.  Adds, per image: the dihedral transform to apply
    (``identity``/``flip_h``/``rot180``/``flip_v``/``transpose``/
    ``rot90_cw``/``transverse``/``rot270_cw``), whether dims swap
    (tags 5-8 transpose the raster, so the stored w x h become
    out_h x out_w), the upright dims, and ``needs_rewrite``
    (tag present and != 1 — the share of the table the normalization
    pass must actually touch).  Unknown / out-of-range / null tags map
    to identity per the spec's "treat as 1" guidance.

    The companion invariant: :func:`dihedral_phash_struct`'s canonical
    phash is unchanged by ANY of these transforms (they are exactly the
    dihedral group the canonicalization minimizes over), so orientation
    normalization never splits a near-dup group — asserted in tests.

    Pure JVM CASE expressions in whole-stage codegen — the plan is a
    narrow map over the image table; the byte-level rewrite itself is
    the images codec path (:func:`decode_validate_reencode`).
    """
    tag0 = F.col(orientation_col).cast("int")
    tag = F.when(tag0.between(1, 8), tag0).otherwise(F.lit(1))
    transform = F.lit(None).cast("string")
    for t in range(8, 0, -1):
        name, _ = _EXIF_TRANSFORMS[t]
        transform = F.when(tag == t, F.lit(name)).otherwise(transform)
    swaps = tag.isin(5, 6, 7, 8)
    w, h = F.col(w_col).cast("long"), F.col(h_col).cast("long")
    return (
        imgs.withColumn("transform", transform)
        .withColumn("swaps_dims", swaps)
        .withColumn("out_w", F.when(swaps, h).otherwise(w))
        .withColumn("out_h", F.when(swaps, w).otherwise(h))
        .withColumn("needs_rewrite", tag != 1)
    )


def _be32(b, off: int) -> "F.Column":
    """Big-endian u32 at 1-based byte offset ``off`` of a binary column —
    hex() the 4-byte slice, conv base-16; stays in whole-stage codegen."""
    return F.conv(F.hex(F.substring(b, off, 4)), 16, 10).cast("long")


def _le16(b, off: int) -> "F.Column":
    lo = F.conv(F.hex(F.substring(b, off, 1)), 16, 10).cast("long")
    hi = F.conv(F.hex(F.substring(b, off + 1, 1)), 16, 10).cast("long")
    return lo + F.lit(256) * hi


def _le32(b, off: int) -> "F.Column":
    return (
        _le16(b, off) + F.lit(65536) * _le16(b, off + 2)
    )


def sniff_header_dims(
    imgs: DataFrame,
    bytes_col: str = "bytes",
    declared_w: str = "w",
    declared_h: str = "h",
    max_pixels: int = 178_956_970,  # Pillow's decompression-bomb default
) -> DataFrame:
    """Container-header dimension sniffing — read w x h from the FIRST
    BYTES of the payload (PNG IHDR big-endian at offset 17/21, GIF
    logical screen little-endian u16 at 7/9, BMP via the DIB header-size
    discriminator — INFOHEADER-family i32 at 19/23, OS/2 COREHEADER u16
    at 19/21) without decoding a single pixel.  Two gates a
    fetch pipeline needs BEFORE spending decode CPU:

    - ``dim_lie``: header dims disagree with the declared (HTML/sitemap/
      API) dims — hotlink-protection placeholders, soft-404 images,
      CDN-rewritten assets;
    - ``bomb``: header pixel count past ``max_pixels`` (Pillow's
      MAX_IMAGE_PIXELS default) — a 100-byte body declaring a
      billion-pixel raster must be quarantined unopened.

    All pure JVM: binary substring -> hex -> conv arithmetic in
    whole-stage codegen, no Python in the scan.  BMP heights may be
    negative (top-down rows); abs() is taken and the sign recorded.
    Unknown magics pass through with null sniffed dims (the fake-codec
    zlib payloads land here — CODEC NOTE at module top).
    """
    b = F.col(bytes_col)
    # magic match AND the header long enough to hold the dims — a
    # truncated 2-byte 'BM' prefix must sniff as unknown, not as a BMP
    # with garbage dims
    blen = F.length(b)
    is_png = (F.hex(F.substring(b, 1, 8)) == "89504E470D0A1A0A") & (
        blen >= 24
    )
    is_gif = (F.substring(b, 1, 4).cast("string") == "GIF8") & (blen >= 10)
    is_bmp = (F.substring(b, 1, 2).cast("string") == "BM") & (blen >= 26)
    # DIB header size at offset 15 discriminates the two families: 12 =
    # BITMAPCOREHEADER (OS/2) with UNSIGNED u16 dims at 19/21 and no
    # top-down convention; anything else (40/52/56/108/124) is the
    # INFOHEADER family with i32 dims at 19/23
    bmp_core = _le32(b, 15) == 12
    bmp_w = F.when(bmp_core, _le16(b, 19)).otherwise(_le32(b, 19))
    bmp_h_raw = F.when(bmp_core, _le16(b, 21)).otherwise(_le32(b, 23))
    # i32le sign: values >= 2^31 are negative (top-down row order)
    bmp_neg = ~bmp_core & (bmp_h_raw >= F.lit(1 << 31))
    bmp_h = F.when(bmp_neg, F.lit(1 << 32) - bmp_h_raw).otherwise(bmp_h_raw)
    sniff_fmt = (
        F.when(is_png, "png").when(is_gif, "gif").when(is_bmp, "bmp")
    )
    sw = (
        F.when(is_png, _be32(b, 17))
        .when(is_gif, _le16(b, 7))
        .when(is_bmp, bmp_w)
    )
    sh = (
        F.when(is_png, _be32(b, 21))
        .when(is_gif, _le16(b, 9))
        .when(is_bmp, bmp_h)
    )
    dw, dh = F.col(declared_w).cast("long"), F.col(declared_h).cast("long")
    return (
        imgs.withColumn("sniff_fmt", sniff_fmt)
        .withColumn("sniff_w", sw)
        .withColumn("sniff_h", sh)
        .withColumn("bmp_topdown",
                    F.when(is_bmp, bmp_neg).otherwise(F.lit(False)))
        .withColumn(
            "dim_lie",
            F.when(sw.isNull(), F.lit(None).cast("boolean"))
            .otherwise((sw != dw) | (sh != dh)),
        )
        .withColumn(
            "bomb",
            # try_multiply, not *: a crafted 4294967295 x 4294967295
            # header overflows BIGINT and under ANSI mode a plain
            # multiply would kill the job on exactly the rows this gate
            # exists to quarantine; overflow == certainly past the cap
            F.when(sw.isNull(), F.lit(None).cast("boolean")).otherwise(
                F.try_multiply(sw, sh).isNull()
                | (F.try_multiply(sw, sh) > F.lit(int(max_pixels)))
            ),
        )
    )


def bytes_per_pixel_outliers(
    imgs: DataFrame,
    bytes_col: str = "nbytes",
    fmt_col: str = "fmt",
    w_col: str = "w",
    h_col: str = "h",
    high_x: int = 3,
    low_x: int = 3,
) -> DataFrame:
    """Compression-efficiency outlier gate — bytes-per-pixel is a cheap,
    decode-free corruption signal: a "jpeg" at 30x the format-typical
    bytes/pixel is usually not a photo (appended payloads, mislabeled
    raw/bmp, decompression bombs the header sniff missed), and one at
    1/30x is usually a placeholder or a truncated body.  Flags rows
    outside [median/low_x, median*high_x] of their FORMAT's
    bytes-per-pixel distribution.

    The median is the exact lower-median order statistic (partitioned
    row_number at rank (n+1) div 2), not an approximate or interpolated
    percentile — integer-exact, deterministic, gate-replayable; bpp is
    kept in permille so everything stays in BIGINT arithmetic.  Shape:
    one window partitioned by format (a handful of partitions — formats
    are few; acceptable because the per-format relation is what it is)
    plus a broadcast join of the O(formats) median table back to the
    rows.
    """
    px = F.try_multiply(F.col(w_col).cast("long"), F.col(h_col).cast("long"))
    # floor(double) is exact here: 1000*bytes stays far below 2^53 for
    # any real image payload, and px is ANSI-safe via try_multiply
    bpp = F.when(
        px.isNotNull() & (px > 0),
        F.floor(F.lit(1000) * F.col(bytes_col).cast("long") / px),
    ).cast("long")
    rows = imgs.withColumn("bpp_permille", bpp)
    from pyspark.sql import Window

    w = Window.partitionBy("__f").orderBy("__b")
    ranked = rows.filter(F.col("bpp_permille").isNotNull()).select(
        F.col(fmt_col).alias("__f"), F.col("bpp_permille").alias("__b")
    ).withColumn("__rn", F.row_number().over(w))
    counts = ranked.groupBy("__f").agg(F.count(F.lit(1)).alias("__n"))
    med = (
        ranked.join(F.broadcast(counts), "__f")
        .filter(F.col("__rn") == F.expr("(__n + 1) div 2"))
        .select(F.col("__f").alias(fmt_col),
                F.col("__b").alias("fmt_median_bpp"))
    )
    out = rows.join(F.broadcast(med), fmt_col, "left")
    b, m = F.col("bpp_permille"), F.col("fmt_median_bpp")
    klass = (
        F.when(b.isNull() | m.isNull(), "unmeasurable")
        .when(b > m * F.lit(int(high_x)), "bloated")
        .when(b * F.lit(int(low_x)) < m, "tiny")
        .otherwise("ok")
    )
    return out.withColumn("bpp_class", klass)


def _byte(b, off: int) -> "F.Column":
    return F.conv(F.hex(F.substring(b, off, 1)), 16, 10).cast("long")


def sniff_webp_dims(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """WebP container-header dimension sniffing — the sibling of
    ``sniff_header_dims`` for the format that now carries most new web
    images.  All three WebP bitstream variants, dims straight from the
    first 30 bytes, no decode:

    - 'VP8 ' (lossy): 0x9D012A sync check, then 14-bit w/h in the two
      little-endian u16 after it (frame-tag offset 20, RFC 6386 §9.1);
    - 'VP8L' (lossless): 0x2F signature, then width-1 / height-1 as two
      14-bit fields bit-packed little-endian across the next 4 bytes;
    - 'VP8X' (extended): canvas width-1 / height-1 as 24-bit
      little-endian at payload offsets 4 and 7.

    Pure JVM substring -> hex -> conv arithmetic (whole-stage codegen),
    same discipline as the PNG/GIF/BMP sniffer: truncated or
    sync-less payloads come back with NULL dims and webp_variant NULL
    rather than garbage.  Adds (webp_variant, sniff_w, sniff_h).
    """
    b = F.col(bytes_col)
    blen = F.length(b)
    riff = (F.hex(F.substring(b, 1, 4)) == "52494646") & (
        F.hex(F.substring(b, 9, 4)) == "57454250"
    )
    tag = F.hex(F.substring(b, 13, 4))
    is_vp8 = (
        riff & (tag == "56503820") & (blen >= 30)
        & (F.hex(F.substring(b, 24, 3)) == "9D012A")
    )
    is_vp8l = (
        riff & (tag == "5650384C") & (blen >= 25)
        & (F.hex(F.substring(b, 21, 1)) == "2F")
    )
    is_vp8x = riff & (tag == "56503858") & (blen >= 30)

    def le16(off: int):
        return _byte(b, off) + 256 * _byte(b, off + 1)

    def le24(off: int):
        return (_byte(b, off) + 256 * _byte(b, off + 1)
                + 65536 * _byte(b, off + 2))

    vp8_w = le16(27).bitwiseAND(F.lit(0x3FFF))
    vp8_h = le16(29).bitwiseAND(F.lit(0x3FFF))
    b22, b23 = _byte(b, 22), _byte(b, 23)
    b24, b25 = _byte(b, 24), _byte(b, 25)
    vp8l_w = 1 + b22 + (b23 % 64) * 256
    # height-1 bits start at bit 14: low 2 bits live in b23's top bits
    vp8l_h = (
        1 + F.shiftright(b23.cast("int"), 6).cast("long")
        + b24 * 4 + (b25 % 16) * 1024
    )
    vp8x_w, vp8x_h = 1 + le24(25), 1 + le24(28)
    variant = (
        F.when(is_vp8, "vp8").when(is_vp8l, "vp8l").when(is_vp8x, "vp8x")
    )
    sw = (
        F.when(is_vp8, vp8_w).when(is_vp8l, vp8l_w).when(is_vp8x, vp8x_w)
    ).cast("long")
    sh = (
        F.when(is_vp8, vp8_h).when(is_vp8l, vp8l_h).when(is_vp8x, vp8x_h)
    ).cast("long")
    return (
        imgs.withColumn("webp_variant", variant)
        .withColumn("sniff_w", sw)
        .withColumn("sniff_h", sh)
    )


def jpeg_sof_dims(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """JPEG dimension sniffing — walk the marker segments of the header
    until the first SOF0-SOF3 frame and read (precision, height, width)
    without decoding.  Completes the no-decode sniffing family
    (PNG/GIF/BMP in sniff_header_dims, WebP in sniff_webp_dims): JPEG is
    the one format whose dims sit at a VARIABLE offset (after APPn/COM
    segments), so this is an Arrow-batched pandas UDF rather than
    substring arithmetic — one batch crossing, a bounded few-segment
    walk per value, never row-at-a-time Python in the JVM plan.

    Adds (jpeg_kind, sniff_w, sniff_h): kind 'baseline' (SOF0/1/3) or
    'progressive' (SOF2), NULLs for non-JPEG / truncated / malformed
    payloads.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("kind string, w long, h long")
    def scan(bs: pd.Series) -> pd.DataFrame:
        kinds, ws, hs = [], [], []
        for b in bs:
            kind = w = h = None
            if b is not None and len(b) >= 4 and b[0] == 0xFF and b[1] == 0xD8:
                i = 2
                while i + 8 < len(b):
                    if b[i] != 0xFF:
                        break
                    if b[i + 1] == 0xFF:
                        i += 1  # spec B.1.1.2 fill byte before a marker
                        continue
                    marker = b[i + 1]
                    if 0xC0 <= marker <= 0xC3:
                        h = (b[i + 5] << 8) | b[i + 6]
                        w = (b[i + 7] << 8) | b[i + 8]
                        kind = "progressive" if marker == 0xC2 else "baseline"
                        break
                    if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 \
                            or marker == 0x01:
                        i += 2  # standalone marker, no length field
                        continue
                    seglen = (b[i + 2] << 8) | b[i + 3]
                    if seglen < 2:
                        break
                    i += 2 + seglen
            kinds.append(kind)
            ws.append(w)
            hs.append(h)
        return pd.DataFrame({"kind": kinds, "w": pd.array(ws, dtype="Int64"),
                             "h": pd.array(hs, dtype="Int64")})

    out = imgs.withColumn("__sof", scan(F.col(bytes_col)))
    return (
        out.withColumn("jpeg_kind", F.col("__sof.kind"))
        .withColumn("sniff_w", F.col("__sof.w"))
        .withColumn("sniff_h", F.col("__sof.h"))
        .drop("__sof")
    )


QUADRANTS = ("tl", "tr", "bl", "br")


def quadrant_phashes(images: DataFrame) -> DataFrame:
    """Whole-image + per-quadrant perceptual hashes — the index that
    catches CROPPED reposts whole-image phash cannot: a crop that was
    one quadrant of the original hashes (as a whole) to exactly the
    original's quadrant hash, so crop detection becomes an equi-join
    instead of any pixel comparison.  One batched Arrow decode pass
    (same discipline as validate_images); quadrants are the floor-half
    splits, each >= 8px by the generator's dims so the 8x8 mean-hash
    grid is well-defined.

    Returns (image_id, phash_whole, phash_tl, phash_tr, phash_bl,
    phash_br).
    """

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                px = _decode(r.bytes, r.w, r.h)
                hh, wh = r.h // 2, r.w // 2
                rows.append({
                    "image_id": r.image_id,
                    "phash_whole": _phash64(px),
                    "phash_tl": _phash64(px[:hh, :wh]),
                    "phash_tr": _phash64(px[:hh, wh:]),
                    "phash_bl": _phash64(px[hh:, :wh]),
                    "phash_br": _phash64(px[hh:, wh:]),
                })
            yield pd.DataFrame(rows)

    schema = ("image_id STRING, phash_whole LONG, phash_tl LONG, "
              "phash_tr LONG, phash_bl LONG, phash_br LONG")
    return images.select("image_id", "bytes", "w", "h").mapInPandas(
        hashes, schema
    )


def detect_quadrant_crops(
    qp: DataFrame, supernode_cap: int = 16
) -> DataFrame:
    """Crop-repost pairs from the quadrant-hash index: candidate crop C
    of parent P at quadrant q whenever phash_whole(C) == phash_q(P),
    C != P.  Four equi-joins on 64-bit hash values (unioned via one
    melt + one join); flat/solid images whose hash repeats across more
    than ``supernode_cap`` images are dropped before pairing — the same
    degree-cap discipline as host_mirrors, so a site's blank spacer
    can never explode the join quadratically.

    Returns (crop_id, parent_id, quadrant).
    """
    quads = F.array(*[
        F.struct(F.lit(q).alias("quadrant"),
                 F.col(f"phash_{q}").alias("h"))
        for q in QUADRANTS
    ])
    parents = qp.select(
        F.col("image_id").alias("parent_id"), F.explode(quads).alias("e")
    ).select("parent_id", "e.quadrant", "e.h")
    wholes = qp.select(F.col("image_id").alias("crop_id"),
                       F.col("phash_whole").alias("h"))
    hot = (
        parents.groupBy("h").agg(F.count("*").alias("n"))
        .filter(F.col("n") > int(supernode_cap)).select("h")
    )
    safe = parents.join(hot, "h", "left_anti")
    return (
        wholes.join(safe, "h")
        .filter(F.col("crop_id") != F.col("parent_id"))
        .select("crop_id", "parent_id", "quadrant")
    )


def crop_to_quadrant(
    images: DataFrame, quadrant: str = "tl", id_prefix: str = "crop-"
) -> DataFrame:
    """Derive quadrant-crop rows from an images table: decode, slice the
    requested floor-half quadrant, re-encode LOSSLESSLY (so the crop's
    decoded pixels are bit-identical to the parent's decoded quadrant —
    the property quadrant_phashes' crop join relies on).  Returns
    (image_id, bytes, w, h) with ids ``id_prefix + parent_id``."""
    if quadrant not in QUADRANTS:
        raise ValueError(f"quadrant must be one of {QUADRANTS}")

    def crop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                px = _decode(r.bytes, r.w, r.h)
                hh, wh = r.h // 2, r.w // 2
                sl = {
                    "tl": px[:hh, :wh], "tr": px[:hh, wh:],
                    "bl": px[hh:, :wh], "br": px[hh:, wh:],
                }[quadrant]
                rows.append({
                    "image_id": id_prefix + r.image_id,
                    "bytes": _encode(np.ascontiguousarray(sl), "png"),
                    "w": int(sl.shape[1]), "h": int(sl.shape[0]),
                })
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "w", "h").mapInPandas(
        crop, "image_id STRING, bytes BINARY, w INT, h INT"
    )


PNG_COLOR_TYPES = {0: "grayscale", 2: "truecolor", 3: "palette",
                   4: "grayscale_alpha", 6: "truecolor_alpha"}


def png_color_profile(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """PNG bit-depth / color-type from the IHDR tail (bytes 25-26 after
    magic + length + 'IHDR' + w + h) — no decode.  Palette (type 3) and
    low-bit-depth PNGs are disproportionately logos, spacers, and UI
    chrome, so this is a cheap pre-decode junk signal for image-caption
    curation; interlace (byte 29) matters for progressive rendering
    stats.  Same substring->hex->conv codegen as sniff_header_dims;
    non-PNG or truncated payloads come back NULL.

    Adds (png_bit_depth, png_color_type, png_interlaced) — color type
    as a NAME string, interlaced as 0/1 int (never a nullable boolean
    in gate output).
    """
    b = F.col(bytes_col)
    is_png = (F.hex(F.substring(b, 1, 8)) == "89504E470D0A1A0A") & (
        F.length(b) >= 29
    )
    depth = F.when(is_png, _byte(b, 25))
    ctype_n = F.when(is_png, _byte(b, 26))
    ctype = F.when(is_png, (
        F.when(ctype_n == 0, "grayscale")
        .when(ctype_n == 2, "truecolor")
        .when(ctype_n == 3, "palette")
        .when(ctype_n == 4, "grayscale_alpha")
        .when(ctype_n == 6, "truecolor_alpha")
        .otherwise("invalid")
    ))
    inter = F.when(is_png, (_byte(b, 29) == 1).cast("int"))
    return (
        imgs.withColumn("png_bit_depth", depth.cast("long"))
        .withColumn("png_color_type", ctype)
        .withColumn("png_interlaced", inter.cast("int"))
    )


# ---------------------------------------------------------------------------
# Image quality gates: sharpness / entropy / dominant color
# ---------------------------------------------------------------------------

QUALITY_FAMILIES = ["flat", "ramp", "checker", "stripes"]
QUALITY_W, QUALITY_H = 64, 32


def _quality_pixels(family: str, w: int, h: int) -> np.ndarray:
    """Planted pixel family with CLOSED-FORM quality metrics (all three
    channels equal, so every metric is exact integer arithmetic):

    - flat     all 77                   -> Laplacian 0, entropy 0 bits
    - ramp     v(x,y) = x  (w <= 256)   -> Laplacian 0 (linear), entropy
                                           log2(w) bits, two 3-bit buckets
    - checker  200 * ((x+y) % 2)        -> |4-neigh Laplacian| = 800 at
                                           every interior pixel, 1 bit
    - stripes  96 * (x % 2)             -> |Laplacian| = 192, 1 bit
    """
    xs = np.arange(w, dtype=np.int32)[None, :].repeat(h, axis=0)
    ys = np.arange(h, dtype=np.int32)[:, None].repeat(w, axis=1)
    if family == "flat":
        g = np.full((h, w), 77, dtype=np.uint8)
    elif family == "ramp":
        g = (xs % 256).astype(np.uint8)
    elif family == "checker":
        g = (200 * ((xs + ys) % 2)).astype(np.uint8)
    else:  # stripes
        g = (96 * (xs % 2)).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)


def planted_quality_images(docs: DataFrame) -> DataFrame:
    """Deterministic quality-test corpus: per doc one 64x32 PNG from the
    ``doc_id % 4`` planted family.  Same batched construction discipline
    as generate_images (one mapInPandas stage, encode inside the batch)."""
    docs = docs.select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                family = QUALITY_FAMILIES[doc_id % 4]
                px = _quality_pixels(family, QUALITY_W, QUALITY_H)
                rows.append(
                    {
                        "image_id": f"img-{doc_id}",
                        "bytes": _encode(px, "png"),
                        "w": QUALITY_W,
                        "h": QUALITY_H,
                        "fmt": "png",
                        "family": family,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        "image_id STRING, bytes BINARY, w INT, h INT, fmt STRING, "
        "family STRING",
    )


QUALITY_SCHEMA = (
    "image_id STRING, sharp_energy LONG, interior LONG, "
    "entropy_mbits LONG, top_bucket LONG, top_share_permille LONG"
)


def image_quality_stats(images: DataFrame) -> DataFrame:
    """Per-image training-data quality metrics in ONE fused Arrow stage
    (decode + all three metrics per batch — the same single-crossing
    discipline as codec_roundtrip_virtual):

    - sharp_energy: sum of |4p - up - down - left - right| (4-neighbour
      Laplacian, channel 0) over interior pixels — the blur gate.  A
      box-blurred copy of any image scores strictly lower; flat banners
      and linear gradients score exactly 0.
    - entropy_mbits: Shannon entropy of the channel-0 byte histogram in
      milli-bits (k equally-frequent values -> exactly 1000*log2(k)).
      Near-zero entropy = single-colour placeholder / tracking pixel.
    - top_bucket / top_share_permille: 3-bit-per-channel (512-bucket)
      colour quantization; the dominant bucket's floor-permille share
      (ties -> smallest bucket id, np.bincount argmax order).  Share
      1000 = solid colour, the classic junk-image gate.

    All integer read-outs so distributed re-runs and the DuckDB oracle
    agree bit-for-bit; no per-row Python at the DataFrame level."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                px = _decode(r.bytes, r.w, r.h)
                g = px[:, :, 0].astype(np.int64)
                if r.w >= 3 and r.h >= 3:
                    lap = (
                        4 * g[1:-1, 1:-1]
                        - g[:-2, 1:-1] - g[2:, 1:-1]
                        - g[1:-1, :-2] - g[1:-1, 2:]
                    )
                    sharp = int(np.abs(lap).sum())
                    interior = (r.w - 2) * (r.h - 2)
                else:
                    sharp, interior = 0, 0
                counts = np.bincount(g.ravel(), minlength=256)
                n = g.size
                p = counts[counts > 0] / n
                entropy_mbits = int(round(-1000.0 * float((p * np.log2(p)).sum())))
                q = (px.astype(np.int64) >> 5)
                buckets = (q[:, :, 0] << 6) | (q[:, :, 1] << 3) | q[:, :, 2]
                bcounts = np.bincount(buckets.ravel(), minlength=512)
                top = int(bcounts.argmax())
                rows.append(
                    {
                        "image_id": r.image_id,
                        "sharp_energy": sharp,
                        "interior": int(interior),
                        "entropy_mbits": entropy_mbits,
                        "top_bucket": top,
                        "top_share_permille": int(1000 * int(bcounts[top]) // n),
                    }
                )
            yield pd.DataFrame(rows)

    return images.mapInPandas(stats, QUALITY_SCHEMA)


# ---------------------------------------------------------------------------
# Container sniffers #2: GIF animation walk + ISO-BMFF (AVIF/HEIC) box walk
# ---------------------------------------------------------------------------


def gif_animation(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """GIF data-stream walk — frame count, per-frame delays, and loop
    count WITHOUT LZW decode.  Static dims come free at a fixed offset
    (sniff_header_dims); whether a GIF is a 40 MB animation or a 1-frame
    logo does not: frames are variable-offset blocks behind optional
    extensions and local color tables.  A crawler needs this before
    archiving (animation = fetch-cost / autoplay-abuse signal; the
    NETSCAPE loop count separates banners from stickers).

    Walk per GIF89a App. Spec: header + logical screen descriptor
    (+ global color table 3*2^(N+1) bytes when flagged), then blocks:
    0x21 extensions (0xF9 graphic control carries the le16 centisecond
    delay; 0xFF application, NETSCAPE2.0 sub-block 01 carries the le16
    loop count; all end with a 0x00-terminated sub-block chain), 0x2C
    image descriptors (9-byte body, optional local color table, LZW min
    code byte, sub-block chain) — each one frame — until the 0x3B
    trailer.

    Arrow-batched pandas UDF (one batch crossing; the walk is bounded by
    the payload length, no per-row Python in the JVM plan).  Adds
    (gif_kind '87a'/'89a', gif_frames, gif_animated 0/1,
    gif_min_delay_cs, gif_total_delay_cs, gif_loop_count,
    gif_complete 0/1).  Non-GIF payloads -> all NULL; a stream that ends
    before the 0x3B trailer (truncated fetch) keeps its counted frames
    but gets gif_complete = 0.  Loop count NULL when no NETSCAPE
    extension (plays once), 0 means loop forever.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "kind string, frames long, animated int, min_delay long, "
        "total_delay long, loops long, complete int"
    )
    def walk(bs: pd.Series) -> pd.DataFrame:
        out = {k: [] for k in ("kind", "frames", "animated", "min_delay",
                               "total_delay", "loops", "complete")}

        def emit(kind=None, frames=None, animated=None, min_delay=None,
                 total_delay=None, loops=None, complete=None):
            out["kind"].append(kind)
            out["frames"].append(frames)
            out["animated"].append(animated)
            out["min_delay"].append(min_delay)
            out["total_delay"].append(total_delay)
            out["loops"].append(loops)
            out["complete"].append(complete)

        for b in bs:
            if b is None or len(b) < 13 or b[:3] != b"GIF" \
                    or b[3:6] not in (b"87a", b"89a"):
                emit()
                continue
            kind = b[3:6].decode("ascii")
            i = 6 + 7  # header + 7-byte logical screen descriptor
            packed = b[10]  # LSD packed field (GCT flag + size bits)
            if packed & 0x80:
                i += 3 * (1 << ((packed & 0x07) + 1))  # global color table
            frames = 0
            delays: list[int] = []
            pending_delay = None
            loops = None
            complete = 0

            def skip_subblocks(j: int) -> int:
                # 0x00-terminated chain of (len, data) sub-blocks;
                # returns -1 on truncation
                while True:
                    if j >= len(b):
                        return -1
                    n = b[j]
                    if n == 0:
                        return j + 1
                    j += 1 + n
            while i < len(b):
                tag = b[i]
                if tag == 0x3B:  # trailer
                    complete = 1
                    break
                if tag == 0x21:  # extension
                    if i + 2 > len(b):
                        break
                    label = b[i + 1]
                    if label == 0xF9 and i + 7 < len(b) and b[i + 2] == 4:
                        pending_delay = b[i + 4] | (b[i + 5] << 8)
                    if label == 0xFF and i + 13 < len(b) and b[i + 2] == 11 \
                            and b[i + 3:i + 14] == b"NETSCAPE2.0":
                        j = i + 14
                        if j + 3 < len(b) and b[j] == 3 and b[j + 1] == 1:
                            loops = b[j + 2] | (b[j + 3] << 8)
                    i = skip_subblocks(i + 2)
                    if i < 0:
                        break
                    continue
                if tag == 0x2C:  # image descriptor = one frame
                    if i + 10 > len(b):
                        break
                    fpacked = b[i + 9]
                    i += 10
                    if fpacked & 0x80:
                        i += 3 * (1 << ((fpacked & 0x07) + 1))
                    i += 1  # LZW minimum code size
                    i = skip_subblocks(i)
                    if i < 0:
                        break
                    frames += 1
                    delays.append(pending_delay if pending_delay is not None
                                  else 0)
                    pending_delay = None
                    continue
                break  # unknown block tag: stop, stream is malformed
            emit(
                kind=kind,
                frames=frames,
                animated=1 if frames > 1 else 0,
                min_delay=min(delays) if frames > 1 else None,
                total_delay=sum(delays) if frames > 1 else None,
                loops=loops,
                complete=complete,
            )
        return pd.DataFrame({
            "kind": out["kind"],
            "frames": pd.array(out["frames"], dtype="Int64"),
            "animated": pd.array(out["animated"], dtype="Int32"),
            "min_delay": pd.array(out["min_delay"], dtype="Int64"),
            "total_delay": pd.array(out["total_delay"], dtype="Int64"),
            "loops": pd.array(out["loops"], dtype="Int64"),
            "complete": pd.array(out["complete"], dtype="Int32"),
        })

    g = imgs.withColumn("__gif", walk(F.col(bytes_col)))
    return (
        g.withColumn("gif_kind", F.col("__gif.kind"))
        .withColumn("gif_frames", F.col("__gif.frames"))
        .withColumn("gif_animated", F.col("__gif.animated"))
        .withColumn("gif_min_delay_cs", F.col("__gif.min_delay"))
        .withColumn("gif_total_delay_cs", F.col("__gif.total_delay"))
        .withColumn("gif_loop_count", F.col("__gif.loops"))
        .withColumn("gif_complete", F.col("__gif.complete"))
        .drop("__gif")
    )


def isobmff_meta(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """ISO-BMFF box walk for the post-JPEG image formats (AVIF / HEIC):
    brand from `ftyp`, spatial extents from the `ispe` property, pixel
    depth from `pixi` — no decode, no codec library.  AVIF is already
    double-digit share of large-site image bytes and none of the
    fixed-offset sniffers (sniff_header_dims / sniff_webp_dims) can see
    inside it: dims live behind a 4-level container chain
    meta(full box) -> iprp -> ipco -> ispe whose offsets depend on
    sibling boxes, so this is the bounded-walk pandas UDF family like
    jpeg_sof_dims.

    Handles 32-bit sizes, size==1 largesize (64-bit), size==0
    to-end-of-file, and unknown boxes (skipped by declared size).
    Adds (bmff_brand 4cc string, bmff_w, bmff_h, bmff_channels,
    bmff_bit_depth); anything absent or truncated -> NULL for that
    field, non-BMFF payloads -> all NULL (a payload is BMFF when its
    first box is a well-formed `ftyp`).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("brand string, w long, h long, channels long, depth long")
    def walk(bs: pd.Series) -> pd.DataFrame:
        brands, ws, hs, chs, deps = [], [], [], [], []

        def be32(b, i):
            return (b[i] << 24) | (b[i + 1] << 16) | (b[i + 2] << 8) | b[i + 3]

        def boxes(b, lo, hi):
            """Yield (type, body_lo, body_hi) for each box in [lo, hi)."""
            i = lo
            while i + 8 <= hi:
                size = be32(b, i)
                typ = b[i + 4:i + 8]
                body = i + 8
                if size == 1:
                    if i + 16 > hi:
                        return
                    size = (be32(b, i + 8) << 32) | be32(b, i + 12)
                    body = i + 16
                elif size == 0:
                    size = hi - i
                if size < body - i or i + size > hi:
                    return  # malformed / truncated: stop the walk
                yield typ, body, i + size
                i += size

        for b in bs:
            brand = w = h = ch = dep = None
            if b is not None and len(b) >= 16 and b[4:8] == b"ftyp":
                for typ, lo, hi in boxes(b, 0, len(b)):
                    if typ == b"ftyp" and hi - lo >= 4:
                        brand = b[lo:lo + 4].decode("ascii", "replace")
                    elif typ == b"meta" and hi - lo >= 4:
                        # meta is a FULL box: 4 bytes version/flags
                        for t2, lo2, hi2 in boxes(b, lo + 4, hi):
                            if t2 != b"iprp":
                                continue
                            for t3, lo3, hi3 in boxes(b, lo2, hi2):
                                if t3 != b"ipco":
                                    continue
                                for t4, lo4, hi4 in boxes(b, lo3, hi3):
                                    if t4 == b"ispe" and hi4 - lo4 >= 12:
                                        w = be32(b, lo4 + 4)
                                        h = be32(b, lo4 + 8)
                                    if t4 == b"pixi" and hi4 - lo4 >= 5:
                                        ch = b[lo4 + 4]
                                        if hi4 - lo4 >= 5 + ch:
                                            dep = b[lo4 + 5]
            brands.append(brand)
            ws.append(w)
            hs.append(h)
            chs.append(ch)
            deps.append(dep)
        return pd.DataFrame({
            "brand": brands,
            "w": pd.array(ws, dtype="Int64"),
            "h": pd.array(hs, dtype="Int64"),
            "channels": pd.array(chs, dtype="Int64"),
            "depth": pd.array(deps, dtype="Int64"),
        })

    g = imgs.withColumn("__bmff", walk(F.col(bytes_col)))
    return (
        g.withColumn("bmff_brand", F.col("__bmff.brand"))
        .withColumn("bmff_w", F.col("__bmff.w"))
        .withColumn("bmff_h", F.col("__bmff.h"))
        .withColumn("bmff_channels", F.col("__bmff.channels"))
        .withColumn("bmff_bit_depth", F.col("__bmff.depth"))
        .drop("__bmff")
    )


LETTERBOX_SCHEMA = (
    "image_id STRING, bar_top LONG, bar_bottom LONG, bar_left LONG, "
    "bar_right LONG, content_w LONG, content_h LONG"
)


def plant_letterbox(images: DataFrame) -> DataFrame:
    """Test/bench fixture: overwrite edge rows/columns with black bars
    on a deterministic subset (doc%4==0 gets top/bottom bars of
    2+doc%3 / 1+doc%2 rows; doc%4==1 gets left/right bars of
    1+doc%3 / 1+doc%2 columns), re-encoding in the image's own format.
    Black (0) is a fixed point of every QUANT_STEP rounding, so bars
    survive the lossy path bit-exactly."""

    def plant(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                d = int(r.image_id.split("-", 1)[1])
                px = _decode(r.bytes, r.w, r.h).copy()
                if d % 4 == 0:
                    px[: 2 + d % 3, :, :] = 0
                    px[r.h - (1 + d % 2):, :, :] = 0
                elif d % 4 == 1:
                    px[:, : 1 + d % 3, :] = 0
                    px[:, r.w - (1 + d % 2):, :] = 0
                out.append({
                    "image_id": r.image_id,
                    "bytes": _encode(px, r.fmt) if d % 4 in (0, 1)
                    else r.bytes,
                    "w": r.w, "h": r.h, "fmt": r.fmt,
                    "caption": r.caption, "phash": r.phash,
                })
            yield pd.DataFrame(out)

    return images.mapInPandas(plant, IMAGE_SCHEMA)


def detect_letterbox(images: DataFrame) -> DataFrame:
    """Letterbox/pillarbox detection: count contiguous UNIFORM rows from
    the top/bottom and uniform columns from the left/right edges (a bar
    row has one color across all pixels; real content — any photo or
    render — essentially never does).  Content dims = image dims minus
    bars: the crop a training pipeline should store instead of the
    padded frame, and the fix for aspect-bucket pollution (a 16:9 frame
    hiding a 4:3 content box trains in the wrong bucket).

    Arrow-batched mapInPandas; the scan is vectorized numpy per image
    (row/col ptp == 0), capped at half the frame so a solid image is
    not consumed twice.  Returns (image_id, bar_top, bar_bottom,
    bar_left, bar_right, content_w, content_h).
    """

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def run_len(uniform: np.ndarray, cap: int) -> int:
            n = 0
            for u in uniform[:cap]:
                if not u:
                    break
                n += 1
            return n

        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                px = _decode(r.bytes, r.w, r.h)
                flat_rows = px.reshape(r.h, -1)
                flat_cols = px.transpose(1, 0, 2).reshape(r.w, -1)
                row_uni = (flat_rows == flat_rows[:, :1]).all(axis=1)
                col_uni = (flat_cols == flat_cols[:, :1]).all(axis=1)
                top = run_len(row_uni, r.h // 2)
                bot = run_len(row_uni[::-1], r.h // 2)
                left = run_len(col_uni, r.w // 2)
                right = run_len(col_uni[::-1], r.w // 2)
                out.append({
                    "image_id": r.image_id,
                    "bar_top": top, "bar_bottom": bot,
                    "bar_left": left, "bar_right": right,
                    "content_w": r.w - left - right,
                    "content_h": r.h - top - bot,
                })
            yield pd.DataFrame(out)

    return images.mapInPandas(detect, LETTERBOX_SCHEMA)


TILE_SCHEMA = (
    "image_id STRING, n_tiles LONG, n_distinct_tiles LONG, "
    "is_tiled BOOLEAN"
)


def plant_sprite_sheets(images: DataFrame, mod: int = 7,
                        residue: int = 3) -> DataFrame:
    """Test/bench fixture: replace doc%mod==residue images with a sprite
    sheet — one 8x8 tile (from the image's own top-left corner) repeated
    across the full frame — re-encoded in the image's own format.
    QUANT_STEP rounding maps equal tiles to equal tiles, so tiling
    survives the lossy path."""

    def plant(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                d = int(r.image_id.split("-", 1)[1])
                b = r.bytes
                if d % mod == residue:
                    px = _decode(r.bytes, r.w, r.h)
                    tile = px[:8, :8, :]
                    reps = np.tile(tile, ((r.h + 7) // 8, (r.w + 7) // 8, 1))
                    b = _encode(reps[: r.h, : r.w, :], r.fmt)
                out.append({
                    "image_id": r.image_id, "bytes": b,
                    "w": r.w, "h": r.h, "fmt": r.fmt,
                    "caption": r.caption, "phash": r.phash,
                })
            yield pd.DataFrame(out)

    return images.mapInPandas(plant, IMAGE_SCHEMA)


def detect_sprite_sheets(images: DataFrame, tile: int = 8) -> DataFrame:
    """Sprite-sheet / tiled-texture detection: cut the full 8x8-aligned
    grid (floor(h/8) x floor(w/8) tiles), count DISTINCT tiles, and
    flag images whose whole grid is one repeated tile.  CSS sprite
    sheets, tiled backgrounds and texture atlases are worthless as
    image-caption training rows but sail through phash dedup (each
    sheet hashes uniquely) — this is the gate that catches the family.

    Batched mapInPandas; per image the tiles land in one numpy reshape
    and a set-of-bytes distinct count.  Returns (image_id, n_tiles,
    n_distinct_tiles, is_tiled)."""

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                px = _decode(r.bytes, r.w, r.h)
                th, tw = r.h // tile, r.w // tile
                grid = px[: th * tile, : tw * tile, :]
                tiles = (
                    grid.reshape(th, tile, tw, tile, 3)
                    .transpose(0, 2, 1, 3, 4)
                    .reshape(th * tw, -1)
                )
                uniq = len({t.tobytes() for t in tiles})
                out.append({
                    "image_id": r.image_id,
                    "n_tiles": th * tw,
                    "n_distinct_tiles": uniq,
                    "is_tiled": uniq == 1 and th * tw > 1,
                })
            yield pd.DataFrame(out)

    return images.mapInPandas(detect, TILE_SCHEMA)


# --------------------------------------------------------------------------
# round-3 container walks: animated WebP, APNG, TIFF, SVG, JPEG APPn
# --------------------------------------------------------------------------

def webp_animation(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Animated-WebP chunk walk — the VP8X/ANIM/ANMF sibling of
    :func:`gif_animation`: frame count, per-frame durations, loop count
    and feature flags without decoding a frame.  GIF is legacy; WebP is
    what image CDNs actually serve animations as today, and a crawler
    needs the same autoplay / fetch-cost signal there (reference scopes
    only static loading, src/Steps/Loading/Http.php — this is the image
    payload axis of the graft).

    Per the WebP container spec: RIFF header, first chunk ``VP8X``
    (feature flags byte — ICC 0x20, alpha 0x10, EXIF 0x08, XMP 0x04,
    animation 0x02 — then 24-bit LE canvas w-1 / h-1), then for
    animations an ``ANIM`` chunk (4-byte BGRA background + u16 LE loop
    count, 0 = forever) and one ``ANMF`` chunk per frame (24-bit LE
    frame x/2, y/2, w-1, h-1, then a 24-bit LE duration in ms).  Chunks
    are (4cc, u32 LE size, payload padded to even).

    Arrow-batched pandas UDF (variable chunk offsets, same family as
    gif_animation / isobmff_meta).  Adds (webp_animated 0/1,
    webp_frames, webp_loop_count, webp_min_dur_ms, webp_total_dur_ms,
    webp_has_alpha 0/1, webp_has_icc 0/1, webp_complete 0/1).  Static
    VP8/VP8L/VP8X-without-ANIM payloads get webp_animated = 0 with
    frames = 1; non-WebP payloads all NULL; a chunk that overruns the
    buffer stops the walk with webp_complete = 0 (counted frames kept).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "animated int, frames long, loops long, min_dur long, "
        "total_dur long, has_alpha int, has_icc int, complete int"
    )
    def walk(bs: pd.Series) -> pd.DataFrame:
        cols = ("animated", "frames", "loops", "min_dur", "total_dur",
                "has_alpha", "has_icc", "complete")
        out = {k: [] for k in cols}

        def emit(**kw):
            for k in cols:
                out[k].append(kw.get(k))

        def le(b, i, n):
            v = 0
            for k in range(n):
                v |= b[i + k] << (8 * k)
            return v

        for b in bs:
            if b is None or len(b) < 16 or b[:4] != b"RIFF" \
                    or b[8:12] != b"WEBP":
                emit()
                continue
            tag = b[12:16]
            if tag in (b"VP8 ", b"VP8L"):
                emit(animated=0, frames=1, has_alpha=0, has_icc=0,
                     complete=1)
                continue
            if tag != b"VP8X" or len(b) < 30:
                emit()
                continue
            flags = b[20]
            has_alpha = 1 if flags & 0x10 else 0
            has_icc = 1 if flags & 0x20 else 0
            anim_flag = 1 if flags & 0x02 else 0
            # walk chunks after the VP8X chunk (size at 16, payload 10)
            i = 20 + le(b, 16, 4) + (le(b, 16, 4) & 1)
            frames, durs, loops = 0, [], None
            complete = 1
            while i + 8 <= len(b):
                cc = b[i:i + 4]
                size = le(b, i + 4, 4)
                body = i + 8
                if body + size > len(b):
                    complete = 0  # truncated fetch mid-chunk
                    break
                if cc == b"ANIM" and size >= 6:
                    loops = le(b, body + 4, 2)
                elif cc == b"ANMF" and size >= 16:
                    frames += 1
                    durs.append(le(b, body + 12, 3))
                i = body + size + (size & 1)
            if not anim_flag:
                emit(animated=0, frames=1, has_alpha=has_alpha,
                     has_icc=has_icc, complete=complete)
                continue
            emit(animated=1 if frames > 1 else 0, frames=frames,
                 loops=loops,
                 min_dur=min(durs) if durs else None,
                 total_dur=sum(durs) if durs else None,
                 has_alpha=has_alpha, has_icc=has_icc, complete=complete)
        return pd.DataFrame({
            "animated": pd.array(out["animated"], dtype="Int32"),
            "frames": pd.array(out["frames"], dtype="Int64"),
            "loops": pd.array(out["loops"], dtype="Int64"),
            "min_dur": pd.array(out["min_dur"], dtype="Int64"),
            "total_dur": pd.array(out["total_dur"], dtype="Int64"),
            "has_alpha": pd.array(out["has_alpha"], dtype="Int32"),
            "has_icc": pd.array(out["has_icc"], dtype="Int32"),
            "complete": pd.array(out["complete"], dtype="Int32"),
        })

    g = imgs.withColumn("__aw", walk(F.col(bytes_col)))
    return (
        g.withColumn("webp_animated", F.col("__aw.animated"))
        .withColumn("webp_frames", F.col("__aw.frames"))
        .withColumn("webp_loop_count", F.col("__aw.loops"))
        .withColumn("webp_min_dur_ms", F.col("__aw.min_dur"))
        .withColumn("webp_total_dur_ms", F.col("__aw.total_dur"))
        .withColumn("webp_has_alpha", F.col("__aw.has_alpha"))
        .withColumn("webp_has_icc", F.col("__aw.has_icc"))
        .withColumn("webp_complete", F.col("__aw.complete"))
        .drop("__aw")
    )


def apng_animation(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """APNG detection via PNG chunk walk — ``acTL`` (animation control:
    u32 BE num_frames, u32 BE num_plays, 0 = forever) is only valid
    BEFORE the first ``IDAT``; per-frame delays come from each
    ``fcTL``'s u16 BE delay_num / delay_den (den 0 reads as 100 per
    spec).  A plain PNG and an APNG are byte-identical to fixed-offset
    sniffers (sniff_header_dims reads both as 'png'), so animation
    accounting needs this walk — same crawler rationale as
    gif_animation.

    Arrow-batched pandas UDF.  Adds (apng 0/1, apng_frames, apng_plays,
    apng_total_delay_ms — integer floor of 1000*num/den summed — and
    png_complete 0/1 = IEND reached).  Non-PNG payloads -> all NULL;
    a PNG whose acTL appears after IDAT is NOT an APNG (spec: ignore),
    apng = 0.  Delay arithmetic is integer-exact (floor division), so
    the DuckDB oracle can restate it.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("apng int, frames long, plays long, total_ms long, "
                "complete int")
    def walk(bs: pd.Series) -> pd.DataFrame:
        cols = ("apng", "frames", "plays", "total_ms", "complete")
        out = {k: [] for k in cols}

        def emit(**kw):
            for k in cols:
                out[k].append(kw.get(k))

        SIG = b"\x89PNG\r\n\x1a\n"

        def be(b, i, n):
            v = 0
            for k in range(n):
                v = (v << 8) | b[i + k]
            return v

        for b in bs:
            if b is None or len(b) < 16 or b[:8] != SIG:
                emit()
                continue
            i = 8
            frames = plays = None
            seen_idat = False
            actl_ok = False
            total_ms = 0
            complete = 0
            while i + 8 <= len(b):
                ln = be(b, i, 4)
                typ = b[i + 4:i + 8]
                body = i + 8
                if body + ln + 4 > len(b):
                    break  # truncated chunk (data + CRC overruns)
                if typ == b"IEND":
                    complete = 1
                    break
                if typ == b"IDAT":
                    seen_idat = True
                elif typ == b"acTL" and ln >= 8 and not seen_idat:
                    actl_ok = True
                    frames = be(b, body, 4)
                    plays = be(b, body + 4, 4)
                elif typ == b"fcTL" and ln >= 26 and actl_ok:
                    num = be(b, body + 20, 2)
                    den = be(b, body + 22, 2) or 100
                    total_ms += (1000 * num) // den
                i = body + ln + 4  # skip data + CRC
            if actl_ok:
                emit(apng=1, frames=frames, plays=plays,
                     total_ms=total_ms, complete=complete)
            else:
                emit(apng=0, complete=complete)
        return pd.DataFrame({
            "apng": pd.array(out["apng"], dtype="Int32"),
            "frames": pd.array(out["frames"], dtype="Int64"),
            "plays": pd.array(out["plays"], dtype="Int64"),
            "total_ms": pd.array(out["total_ms"], dtype="Int64"),
            "complete": pd.array(out["complete"], dtype="Int32"),
        })

    g = imgs.withColumn("__ap", walk(F.col(bytes_col)))
    return (
        g.withColumn("apng", F.col("__ap.apng"))
        .withColumn("apng_frames", F.col("__ap.frames"))
        .withColumn("apng_plays", F.col("__ap.plays"))
        .withColumn("apng_total_delay_ms", F.col("__ap.total_ms"))
        .withColumn("png_complete", F.col("__ap.complete"))
        .drop("__ap")
    )


def tiff_dims(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """TIFF IFD walk — dims and orientation from IFD0's tag entries in
    EITHER byte order ('II' little / 'MM' big, magic 42), the one header
    family where every field's endianness is data-dependent so a fixed
    substring expression cannot do it.  Scans (u16 entry count, then
    12-byte entries: tag u16, type u16, count u32, value-or-offset 4B)
    for ImageWidth 256, ImageLength 257, Orientation 274; SHORT(3)
    values read from the FIRST TWO bytes of the value field (spec:
    left-justified within the 4-byte slot in the file's byte order),
    LONG(4) from all four.  Camera originals and scanned-document
    payloads on the web are TIFF; EXIF blobs reuse this exact structure
    (exif_orientation_plan consumes the tag this walk extracts).

    Arrow-batched pandas UDF; entry walk bounded at 512 entries.  Adds
    (tiff_endian 'II'/'MM', sniff_w, sniff_h, tiff_orientation); non-
    TIFF / truncated -> NULLs.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("endian string, w long, h long, orient long")
    def walk(bs: pd.Series) -> pd.DataFrame:
        es, ws, hs, os_ = [], [], [], []
        for b in bs:
            endian = w = h = orient = None
            if b is not None and len(b) >= 8 and b[:2] in (b"II", b"MM"):
                little = b[:2] == b"II"

                def rd(i, n):
                    if i + n > len(b):
                        return None
                    chunk = b[i:i + n]
                    return int.from_bytes(
                        chunk, "little" if little else "big")

                if rd(2, 2) == 42:
                    endian = "II" if little else "MM"
                    ifd = rd(4, 4)
                    n = rd(ifd, 2) if ifd is not None else None
                    if n is not None:
                        for k in range(min(n, 512)):
                            e = ifd + 2 + 12 * k
                            tag, typ = rd(e, 2), rd(e + 2, 2)
                            if tag is None or typ is None:
                                break
                            if typ == 3:
                                val = rd(e + 8, 2)
                            elif typ == 4:
                                val = rd(e + 8, 4)
                            else:
                                continue
                            if tag == 256:
                                w = val
                            elif tag == 257:
                                h = val
                            elif tag == 274:
                                orient = val
            es.append(endian)
            ws.append(w)
            hs.append(h)
            os_.append(orient)
        return pd.DataFrame({
            "endian": es, "w": pd.array(ws, dtype="Int64"),
            "h": pd.array(hs, dtype="Int64"),
            "orient": pd.array(os_, dtype="Int64"),
        })

    g = imgs.withColumn("__tf", walk(F.col(bytes_col)))
    return (
        g.withColumn("tiff_endian", F.col("__tf.endian"))
        .withColumn("sniff_w", F.col("__tf.w"))
        .withColumn("sniff_h", F.col("__tf.h"))
        .withColumn("tiff_orientation", F.col("__tf.orient"))
        .drop("__tf")
    )


def svg_dims(docs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """SVG detection + intrinsic dims — the one image format that is
    TEXT: sniff the root ``<svg>`` element through optional XML
    declaration / comments / DOCTYPE, then read integer pixel dims from
    ``width``/``height`` attributes (bare or ``px``-suffixed), falling
    back to the 3rd/4th ``viewBox`` numbers.  A width in relative units
    (em/%/pt/mm...) has no pixel meaning without layout context, so it
    yields NULL dims with ``svg_relative_units`` = 1 rather than a
    guessed number.

    Unlike the binary walks this is pure JVM regexp over the decoded
    prefix (whole-stage codegen, no Python): SVG payloads on a crawl
    are small and the root tag sits in the first kilobyte.  Adds
    (is_svg 0/1, sniff_w, sniff_h, svg_relative_units 0/1).
    """
    head = F.decode(F.substring(F.col(bytes_col), 1, 2048), "UTF-8")
    is_svg = head.rlike(
        r"^\uFEFF?\s*(<\?xml[^>]*\?>\s*)?(<!--[\s\S]*?-->\s*)*"
        r"(<!DOCTYPE[^>]*>\s*)?<svg[\s>]")
    tag = F.regexp_extract(head, r"(?s)(<svg[^>]*>)", 1)
    w_attr = F.regexp_extract(
        tag, "\\bwidth\\s*=\\s*[\"']\\s*([0-9]+)(?:\\.[0-9]+)?"
             "\\s*(px)?\\s*[\"']", 1)
    h_attr = F.regexp_extract(
        tag, "\\bheight\\s*=\\s*[\"']\\s*([0-9]+)(?:\\.[0-9]+)?"
             "\\s*(px)?\\s*[\"']", 1)
    w_rel = F.regexp_extract(
        tag, "\\bwidth\\s*=\\s*[\"']\\s*[0-9.]+\\s*"
             "(em|ex|%|pt|pc|cm|mm|in)\\s*[\"']", 1)
    h_rel = F.regexp_extract(
        tag, "\\bheight\\s*=\\s*[\"']\\s*[0-9.]+\\s*"
             "(em|ex|%|pt|pc|cm|mm|in)\\s*[\"']", 1)
    vb_w = F.regexp_extract(
        tag, "\\bviewBox\\s*=\\s*[\"']\\s*[-0-9.]+[ ,]+[-0-9.]+[ ,]+"
             "([0-9]+)(?:\\.[0-9]+)?[ ,]+[0-9.]+\\s*[\"']", 1)
    vb_h = F.regexp_extract(
        tag, "\\bviewBox\\s*=\\s*[\"']\\s*[-0-9.]+[ ,]+[-0-9.]+[ ,]+"
             "[0-9.]+[ ,]+([0-9]+)(?:\\.[0-9]+)?\\s*[\"']", 1)
    rel = (w_rel != "") | (h_rel != "")
    sw = (
        F.when(~is_svg | rel, F.lit(None))
        .when(w_attr != "", w_attr)
        .when(vb_w != "", vb_w)
    ).cast("long")
    sh = (
        F.when(~is_svg | rel, F.lit(None))
        .when(h_attr != "", h_attr)
        .when(vb_h != "", vb_h)
    ).cast("long")
    return (
        docs.withColumn("is_svg", is_svg.cast("int"))
        .withColumn("sniff_w", sw)
        .withColumn("sniff_h", sh)
        .withColumn(
            "svg_relative_units",
            F.when(is_svg, rel.cast("int")).otherwise(F.lit(None)))
    )


def jpeg_app_segments(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """JPEG metadata-segment inventory — the color-management walk the
    SOF-dims walk (:func:`jpeg_sof_dims`) skips past: EXIF presence
    (APP1 ``Exif\\0\\0``), embedded ICC profile (APP2
    ``ICC_PROFILE\\0``, possibly split across chunks), the Adobe APP14
    transform byte, and the SOF component count.  Together these decide
    the color mode: 4 components with Adobe transform 2 is YCCK, with
    transform 0 / no APP14 is raw CMYK — payloads that most thumbnail
    stacks decode with inverted or shifted colors, so a training
    pipeline routes them through a color-managed path (or quarantines)
    BEFORE pixels hit the model.  1 component is grayscale; 3 is YCbCr
    unless Adobe says transform 0 (RGB).

    Arrow-batched pandas UDF, same marker walk discipline as
    jpeg_sof_dims (fill bytes, standalone markers, u16 BE segment
    lengths).  Adds (jpeg_has_exif, jpeg_has_icc, jpeg_icc_chunks,
    jpeg_adobe_transform, jpeg_ncomp, jpeg_color_mode); non-JPEG ->
    all NULL.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("has_exif int, has_icc int, icc_chunks long, "
                "adobe long, ncomp long, mode string")
    def walk(bs: pd.Series) -> pd.DataFrame:
        cols = ("has_exif", "has_icc", "icc_chunks", "adobe", "ncomp",
                "mode")
        out = {k: [] for k in cols}
        for b in bs:
            if b is None or len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
                for k in cols:
                    out[k].append(None)
                continue
            has_exif = 0
            icc_chunks = 0
            adobe = None
            ncomp = None
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                if b[i + 1] == 0xFF:
                    i += 1
                    continue
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                if marker in (0xD9, 0xDA):
                    break  # EOI / start-of-scan: metadata is over
                seglen = (b[i + 2] << 8) | b[i + 3]
                if seglen < 2 or i + 2 + seglen > len(b):
                    break
                body = b[i + 4:i + 2 + seglen]
                if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
                    has_exif = 1
                elif marker == 0xE2 and body[:12] == b"ICC_PROFILE\x00":
                    icc_chunks += 1
                elif marker == 0xEE and body[:5] == b"Adobe" \
                        and len(body) >= 12:
                    adobe = body[11]
                elif 0xC0 <= marker <= 0xC3 and len(body) >= 6:
                    ncomp = body[5]
                i += 2 + seglen
            if ncomp == 4:
                mode = "ycck" if adobe == 2 else "cmyk"
            elif ncomp == 3:
                mode = "rgb" if adobe == 0 else "ycbcr"
            elif ncomp == 1:
                mode = "gray"
            else:
                mode = None
            out["has_exif"].append(has_exif)
            out["has_icc"].append(1 if icc_chunks else 0)
            out["icc_chunks"].append(icc_chunks)
            out["adobe"].append(adobe)
            out["ncomp"].append(ncomp)
            out["mode"].append(mode)
        return pd.DataFrame({
            "has_exif": pd.array(out["has_exif"], dtype="Int32"),
            "has_icc": pd.array(out["has_icc"], dtype="Int32"),
            "icc_chunks": pd.array(out["icc_chunks"], dtype="Int64"),
            "adobe": pd.array(out["adobe"], dtype="Int64"),
            "ncomp": pd.array(out["ncomp"], dtype="Int64"),
            "mode": out["mode"],
        })

    g = imgs.withColumn("__js", walk(F.col(bytes_col)))
    return (
        g.withColumn("jpeg_has_exif", F.col("__js.has_exif"))
        .withColumn("jpeg_has_icc", F.col("__js.has_icc"))
        .withColumn("jpeg_icc_chunks", F.col("__js.icc_chunks"))
        .withColumn("jpeg_adobe_transform", F.col("__js.adobe"))
        .withColumn("jpeg_ncomp", F.col("__js.ncomp"))
        .withColumn("jpeg_color_mode", F.col("__js.mode"))
        .drop("__js")
    )


# Standard IJG luminance / chrominance quantization tables (Annex K of
# ITU-T T.81, as shipped in libjpeg jcparam.c) in ZIGZAG STORAGE ORDER
# is irrelevant here: the estimator sums all 64 entries, which is
# permutation-invariant, so natural order is fine.
STD_LUMA_QT = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)
STD_CHROMA_QT = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
)
STD_LUMA_SUM = sum(STD_LUMA_QT)  # 3688


def jpeg_dqt_quality(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """JPEG encode-quality estimation from the DQT quantization tables —
    the curation signal for silently re-compressed images: a 4000x3000
    photo saved at q=35 carries less information than its dimensions
    promise, and a caption-pair pipeline wants to rank or drop such
    rows BEFORE spending decode/embedding compute.  No pixel decode:
    the quality is recovered by inverting the IJG scaling formula
    (libjpeg jcparam.c jpeg_quality_scaling: scale = 5000/q below 50,
    200 - 2q at 50 and above) against the standard Annex K luminance
    table — the same table arithmetic ImageMagick/exiftool use for
    their 'estimated quality'.

    Arrow-batched pandas UDF marker walk (same family as
    jpeg_sof_dims): collect every 8-bit table in every DQT (FFDB)
    segment, sum the Tq=0 (luminance) one, then integer half-up
    arithmetic only — scale_est = (100*sum + S/2) div S with
    S = sum(std table), q_est = (200 - scale)/2 half-up when scale
    <= 100 else (5000/scale) half-up — so an oracle can restate the
    whole estimate in closed form.  Adds (dqt_sum, dqt_tables,
    jpeg_scale_est, jpeg_quality_est); NULLs when no luminance DQT
    is present (truncated / not a JPEG).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("s long, nt int, scale long, q long")
    def scan(bs: pd.Series) -> pd.DataFrame:
        sums, nts, scales, qs = [], [], [], []
        for b in bs:
            luma_sum = None
            n_tables = 0
            if b is not None and len(b) >= 4 and b[0] == 0xFF \
                    and b[1] == 0xD8:
                i = 2
                while i + 4 <= len(b):
                    if b[i] != 0xFF:
                        break
                    if b[i + 1] == 0xFF:
                        i += 1  # fill byte (T.81 B.1.1.2)
                        continue
                    marker = b[i + 1]
                    if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 \
                            or marker == 0x01:
                        i += 2
                        continue
                    if i + 4 > len(b):
                        break
                    seglen = (b[i + 2] << 8) | b[i + 3]
                    if seglen < 2:
                        break
                    if marker == 0xDB:
                        # one DQT segment may carry several tables
                        j, end = i + 4, min(i + 2 + seglen, len(b))
                        while j < end:
                            pq, tq = b[j] >> 4, b[j] & 0x0F
                            step = 128 if pq == 1 else 64
                            if j + 1 + step > end:
                                break
                            n_tables += 1
                            if tq == 0 and pq == 0 and luma_sum is None:
                                luma_sum = int(
                                    sum(b[j + 1:j + 1 + 64]))
                            j += 1 + step
                    if marker == 0xDA:
                        break  # entropy-coded data follows
                    i += 2 + seglen
            if luma_sum is None:
                sums.append(None); nts.append(n_tables or None)
                scales.append(None); qs.append(None)
                continue
            scale = (100 * luma_sum + STD_LUMA_SUM // 2) // STD_LUMA_SUM
            if scale <= 100:
                q = (200 - scale + 1) // 2
            else:
                q = (5000 + scale // 2) // scale
            sums.append(luma_sum); nts.append(n_tables)
            scales.append(scale); qs.append(q)
        return pd.DataFrame({
            "s": pd.array(sums, dtype="Int64"),
            "nt": pd.array(nts, dtype="Int32"),
            "scale": pd.array(scales, dtype="Int64"),
            "q": pd.array(qs, dtype="Int64"),
        })

    g = imgs.withColumn("__dqt", scan(F.col(bytes_col)))
    return (
        g.withColumn("dqt_sum", F.col("__dqt.s"))
        .withColumn("dqt_tables", F.col("__dqt.nt"))
        .withColumn("jpeg_scale_est", F.col("__dqt.scale"))
        .withColumn("jpeg_quality_est", F.col("__dqt.q"))
        .drop("__dqt")
    )


def exif_thumbnail_scan(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """EXIF IFD1 embedded-thumbnail detection — a privacy gate the
    EXIF strippers (exif_gps_scrub, exif_orientation_plan) miss: the
    thumbnail in IFD1 is a SECOND, independently-encoded copy of the
    picture, routinely carrying the pre-crop / pre-redact pixels, so a
    curation pipeline must know it exists (and whether its byte range
    is actually inside the payload) before re-publishing an image.

    Arrow-batched pandas UDF TIFF walk, both byte orders: header check
    (II*/MM*), IFD0 entry count, the next-IFD pointer after IFD0, then
    IFD1's JPEGInterchangeFormat (0x0201), JPEGInterchangeFormatLength
    (0x0202) and Compression (0x0103) tags.  SHORT values are read as
    16-bit from the value field's first bytes per TIFF 6.0 packing.

    Adds (exif_ifd0_entries, has_thumbnail, thumb_offset, thumb_len,
    thumb_compression, thumb_in_bounds); NULL family for non-TIFF.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n0 int, has int, toff long, tlen long, comp long, inb int")
    def scan(bs: pd.Series) -> pd.DataFrame:
        out = {k: [] for k in ("n0", "has", "toff", "tlen", "comp", "inb")}

        def push(n0=None, has=None, toff=None, tlen=None, comp=None,
                 inb=None):
            out["n0"].append(n0); out["has"].append(has)
            out["toff"].append(toff); out["tlen"].append(tlen)
            out["comp"].append(comp); out["inb"].append(inb)

        for b in bs:
            if b is None or len(b) < 8 or b[2:4] not in (b"\x2a\x00",
                                                         b"\x00\x2a"):
                push(); continue
            if b[:2] == b"II":
                order = "little"
            elif b[:2] == b"MM":
                order = "big"
            else:
                push(); continue

            def rd(off, width):
                if off + width > len(b):
                    return None
                return int.from_bytes(b[off:off + width], order)

            if rd(2, 2) != 42:
                push(); continue
            ifd0 = rd(4, 4)
            n0 = rd(ifd0, 2) if ifd0 is not None else None
            if n0 is None:
                push(); continue
            nxt = rd(ifd0 + 2 + 12 * n0, 4)
            if not nxt:
                push(n0=n0, has=0); continue
            n1 = rd(nxt, 2)
            if n1 is None:
                push(n0=n0, has=0); continue
            toff = tlen = comp = None
            for e in range(n1):
                base = nxt + 2 + 12 * e
                tag, typ = rd(base, 2), rd(base + 2, 2)
                if tag is None or typ is None:
                    break
                val = rd(base + 8, 2) if typ == 3 else rd(base + 8, 4)
                if tag == 0x0201:
                    toff = val
                elif tag == 0x0202:
                    tlen = val
                elif tag == 0x0103:
                    comp = val
            has = 1 if (toff is not None and tlen is not None) else 0
            inb = (1 if has and toff + tlen <= len(b) else 0) if has \
                else None
            push(n0=n0, has=has, toff=toff, tlen=tlen, comp=comp, inb=inb)
        return pd.DataFrame({
            "n0": pd.array(out["n0"], dtype="Int32"),
            "has": pd.array(out["has"], dtype="Int32"),
            "toff": pd.array(out["toff"], dtype="Int64"),
            "tlen": pd.array(out["tlen"], dtype="Int64"),
            "comp": pd.array(out["comp"], dtype="Int64"),
            "inb": pd.array(out["inb"], dtype="Int32"),
        })

    g = imgs.withColumn("__t", scan(F.col(bytes_col)))
    return (
        g.withColumn("exif_ifd0_entries", F.col("__t.n0"))
        .withColumn("has_thumbnail", F.col("__t.has"))
        .withColumn("thumb_offset", F.col("__t.toff"))
        .withColumn("thumb_len", F.col("__t.tlen"))
        .withColumn("thumb_compression", F.col("__t.comp"))
        .withColumn("thumb_in_bounds", F.col("__t.inb"))
        .drop("__t")
    )


# PNG Adam7 interlace pass grid: (x0, y0, dx, dy) per pass, spec 8.2
ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def adam7_plan(
    imgs: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    bpp_bytes: int = 3,
) -> DataFrame:
    """Adam7 interlace size accounting — the raw-stream cost of saving
    a PNG progressive: each of the 7 passes is its own sub-image with
    its own per-scanline filter byte, so interlacing ADDS bytes (more
    scanlines than the plain image), and for thumbnail-sized images the
    overhead is large enough that a thumbnailing sink (thumb_pyramid)
    should always write them non-interlaced.  This computes, per image,
    the exact pre-compression stream sizes from (w, h) alone.

    Pure JVM integer arithmetic (PNG spec 8.2 pass grid): pass size =
    rows * (1 + cols*bpp) with cols = ceil((w-x0)/dx), empty passes
    contribute nothing.  Adds (interlaced_bytes, plain_bytes,
    overhead_permille — truncating integer permille of the added bytes,
    nonempty_passes).
    """
    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    sizes, nonempty = [], []
    for (x0, y0, dx, dy) in ADAM7_PASSES:
        cols = F.when(w > x0, ((w - x0 + dx - 1) / dx).cast("long")) \
            .otherwise(F.lit(0))
        rows = F.when(h > y0, ((h - y0 + dy - 1) / dy).cast("long")) \
            .otherwise(F.lit(0))
        live = (cols > 0) & (rows > 0)
        sizes.append(F.when(live, rows * (1 + cols * bpp_bytes))
                     .otherwise(F.lit(0)))
        nonempty.append(F.when(live, 1).otherwise(0))
    inter = sizes[0]
    for s in sizes[1:]:
        inter = inter + s
    nep = nonempty[0]
    for x in nonempty[1:]:
        nep = nep + x
    plain = h * (1 + w * bpp_bytes)
    return imgs.select(
        "*",
        inter.cast("long").alias("interlaced_bytes"),
        plain.cast("long").alias("plain_bytes"),
        ((1000 * (inter - plain)) / plain).cast("long")
        .alias("overhead_permille"),
        nep.cast("int").alias("nonempty_passes"),
    )


def jpeg_chroma_subsampling(
    imgs: DataFrame, bytes_col: str = "bytes",
) -> DataFrame:
    """JPEG chroma-subsampling classification from the SOF component
    sampling factors — a curation gate the DQT quality estimate
    (jpeg_dqt_quality) can't see: a 4:2:0 image halved its chroma
    resolution in BOTH axes at encode time, which matters for
    color-critical training data and explains soft edges that PSNR on
    luma misses.  JFIF B.2.2: the SOF payload after (precision, h, w)
    carries n components of (id, H<<4|V, Tq); the luma H1xV1 against
    1x1 chroma gives the classic names.

    Same bounded marker walk as :func:`jpeg_sof_dims` (Arrow-batched
    pandas UDF, variable APPn offsets).  Adds (jpeg_n_components,
    jpeg_samp_h, jpeg_samp_v, jpeg_subsampling, jpeg_progressive):
    subsampling in {'gray','4:4:4','4:4:0','4:2:2','4:2:0','4:1:1',
    'other'}; NULL family for non-JPEG / malformed / SOF truncated.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    names = {(1, 1): "4:4:4", (1, 2): "4:4:0", (2, 1): "4:2:2",
             (2, 2): "4:2:0", (4, 1): "4:1:1"}

    @pandas_udf("nc int, sh int, sv int, sub string, prog int")
    def scan(bs: pd.Series) -> pd.DataFrame:
        ncs, shs, svs, subs, progs = [], [], [], [], []
        for b in bs:
            nc = sh = sv = sub = prog = None
            if b is not None and len(b) >= 4 and b[0] == 0xFF \
                    and b[1] == 0xD8:
                i = 2
                while i + 8 < len(b):
                    if b[i] != 0xFF:
                        break
                    if b[i + 1] == 0xFF:
                        i += 1
                        continue
                    marker = b[i + 1]
                    if 0xC0 <= marker <= 0xC3:
                        n = b[i + 9] if i + 9 < len(b) else None
                        comps = []
                        if n is not None and i + 10 + 3 * n <= len(b):
                            for c in range(n):
                                hv = b[i + 11 + 3 * c]
                                comps.append((hv >> 4, hv & 0x0F))
                        if comps:
                            nc = len(comps)
                            sh, sv = comps[0]
                            prog = 1 if marker == 0xC2 else 0
                            if nc == 1:
                                sub = "gray"
                            elif nc == 3 and all(
                                    c == (1, 1) for c in comps[1:]):
                                sub = names.get((sh, sv), "other")
                            else:
                                sub = "other"
                        break
                    if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7 \
                            or marker == 0x01:
                        i += 2
                        continue
                    seglen = (b[i + 2] << 8) | b[i + 3]
                    if seglen < 2:
                        break
                    i += 2 + seglen
            ncs.append(nc)
            shs.append(sh)
            svs.append(sv)
            subs.append(sub)
            progs.append(prog)
        return pd.DataFrame({
            "nc": pd.array(ncs, dtype="Int32"),
            "sh": pd.array(shs, dtype="Int32"),
            "sv": pd.array(svs, dtype="Int32"),
            "sub": subs,
            "prog": pd.array(progs, dtype="Int32"),
        })

    out = imgs.withColumn("__cs", scan(F.col(bytes_col)))
    return (
        out.withColumn("jpeg_n_components", F.col("__cs.nc"))
        .withColumn("jpeg_samp_h", F.col("__cs.sh"))
        .withColumn("jpeg_samp_v", F.col("__cs.sv"))
        .withColumn("jpeg_subsampling", F.col("__cs.sub"))
        .withColumn("jpeg_progressive", F.col("__cs.prog"))
        .drop("__cs")
    )


def png_crc_check(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """PNG chunk CRC-32 verification — the cheapest true integrity
    check a crawler can run on a payload before archiving it: every
    PNG chunk carries a CRC over (type || data), and a mismatch means
    the transfer truncated mid-body or the origin served a corrupt
    file (PNG spec 3.4/5.5).  sniff_header_dims trusts the bytes; this
    op actually checks them, so the pipeline can quarantine damage
    BEFORE the decode stage burns CPU on it.

    Arrow-batched pandas UDF chunk walk with zlib.crc32 (the exact
    polynomial the spec names).  Adds (png_n_chunks, png_n_bad_crc,
    png_first_bad_type, png_truncated, png_has_iend): NULL family for
    non-PNG payloads; a chunk that runs past the buffer sets truncated
    and stops the walk.
    """
    import zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sig = b"\x89PNG\r\n\x1a\n"

    @pandas_udf("n int, bad int, first string, trunc int, iend int")
    def scan(bs: pd.Series) -> pd.DataFrame:
        ns, bads, firsts, truncs, iends = [], [], [], [], []
        for b in bs:
            if b is None or len(b) < 8 or bytes(b[:8]) != sig:
                ns.append(None); bads.append(None); firsts.append(None)
                truncs.append(None); iends.append(None)
                continue
            i, n, bad, first, trunc, iend = 8, 0, 0, None, 0, 0
            while i + 12 <= len(b):
                ln = int.from_bytes(b[i:i + 4], "big")
                if i + 12 + ln > len(b):
                    trunc = 1
                    break
                typ = bytes(b[i + 4:i + 8])
                crc = int.from_bytes(b[i + 8 + ln:i + 12 + ln], "big")
                n += 1
                if zlib.crc32(b[i + 4:i + 8 + ln]) & 0xFFFFFFFF != crc:
                    bad += 1
                    if first is None:
                        first = typ.decode("latin1")
                if typ == b"IEND":
                    iend = 1
                    break
                i += 12 + ln
            else:
                if i != len(b):
                    trunc = 1
            ns.append(n); bads.append(bad); firsts.append(first)
            truncs.append(trunc); iends.append(iend)
        return pd.DataFrame({
            "n": pd.array(ns, dtype="Int32"),
            "bad": pd.array(bads, dtype="Int32"),
            "first": firsts,
            "trunc": pd.array(truncs, dtype="Int32"),
            "iend": pd.array(iends, dtype="Int32"),
        })

    g = imgs.withColumn("__c", scan(F.col(bytes_col)))
    return (
        g.withColumn("png_n_chunks", F.col("__c.n"))
        .withColumn("png_n_bad_crc", F.col("__c.bad"))
        .withColumn("png_first_bad_type", F.col("__c.first"))
        .withColumn("png_truncated", F.col("__c.trunc"))
        .withColumn("png_has_iend", F.col("__c.iend"))
        .drop("__c")
    )


# PNG spec 11.2.2: legal bit depths per color type
PNG_LEGAL_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                    4: (8, 16), 6: (8, 16)}


def png_ihdr_validity(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """IHDR legality check — the static-header companion of
    :func:`png_crc_check`: a PNG whose (color type, bit depth) pair is
    outside the spec's table 11.2.2, whose interlace byte is not 0/1,
    or whose dimensions are zero will crash or confuse decoders, and a
    crawler should quarantine it on header bytes alone.  Pure JVM
    substring arithmetic (fixed offsets: IHDR is required to be the
    first chunk, so w@16, h@20, depth@24, color@25, interlace@28).

    Adds (ihdr_w, ihdr_h, ihdr_depth, ihdr_color, ihdr_interlace,
    ihdr_valid); NULL family for non-PNG.
    """
    b = F.col(bytes_col)
    is_png = (F.length(b) >= 33) & (
        F.hex(F.substring(b, 1, 8)) == F.lit("89504E470D0A1A0A"))
    w = _be32(b, 17)
    h = _be32(b, 21)
    depth = _byte(b, 25)
    color = _byte(b, 26)
    interlace = _byte(b, 29)
    legal = F.lit(False)
    for ct, depths in PNG_LEGAL_DEPTHS.items():
        legal = legal | ((color == ct) & depth.isin(*depths))
    valid = (
        legal & interlace.isin(0, 1) & (w > 0) & (h > 0)
        & (F.hex(F.substring(b, 13, 4)) == F.lit("49484452"))
    )
    out = imgs
    for name, col in [("ihdr_w", w), ("ihdr_h", h), ("ihdr_depth", depth),
                      ("ihdr_color", color),
                      ("ihdr_interlace", interlace)]:
        out = out.withColumn(
            name, F.when(is_png, col).cast("long"))
    return out.withColumn(
        "ihdr_valid", F.when(is_png, valid))


ICO_MAX_ENTRIES = 8


def ico_sniff(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """ICO/CUR favicon directory sniffing — the one image container a
    crawler meets on EVERY host (favicon.ico): header (reserved=0,
    type 1=icon / 2=cursor, count), then 16-byte directory entries
    (w, h with 0 meaning 256, bpp, payload size/offset).  The best
    entry (largest area, then deepest bpp) is what a thumbnailer
    would extract; bounds-checking offset+size against the payload
    catches truncated favicons without decoding.

    Pure JVM substring arithmetic — the directory sits at FIXED
    offsets (entry i at byte 7 + 16*i), so unlike the JPEG walk no
    UDF is needed; entries beyond ``ICO_MAX_ENTRIES`` are counted but
    not inspected.  Adds (ico_type, ico_n_images, ico_best_w,
    ico_best_h, ico_best_bpp, ico_best_in_bounds); NULLs for
    non-ICO payloads.
    """
    b = F.col(bytes_col)
    typ_n = _le16(b, 3)
    count = _le16(b, 5)
    is_ico = (
        (F.length(b) >= 6) & (_le16(b, 1) == 0) & typ_n.isin(1, 2)
        & (count > 0)
    )
    entries = F.filter(
        F.array(*[
            F.struct(
                F.lit(i).alias("i"),
                F.when(_byte(b, 7 + 16 * i) == 0, F.lit(256))
                .otherwise(_byte(b, 7 + 16 * i)).alias("w"),
                F.when(_byte(b, 8 + 16 * i) == 0, F.lit(256))
                .otherwise(_byte(b, 8 + 16 * i)).alias("h"),
                _le16(b, 13 + 16 * i).alias("bpp"),
                _le32(b, 15 + 16 * i).alias("size"),
                _le32(b, 19 + 16 * i).alias("off"),
            )
            for i in range(ICO_MAX_ENTRIES)
        ]),
        lambda e: (e["i"] < count)
        & (F.length(b) >= 6 + 16 * (e["i"] + 1)),
    )
    best = F.get(
        F.array_sort(
            F.transform(entries, lambda e: F.struct(
                (-(e["w"] * e["h"])).alias("na"),
                (-e["bpp"]).alias("nb"),
                e["i"].alias("i"), e["w"].alias("w"), e["h"].alias("h"),
                e["bpp"].alias("bpp"), e["size"].alias("size"),
                e["off"].alias("off"),
            ))
        ),
        0,
    )
    out = imgs.withColumn("__best", F.when(is_ico, best))
    return (
        out.withColumn(
            "ico_type",
            F.when(is_ico, F.when(typ_n == 1, F.lit("icon"))
                   .otherwise(F.lit("cursor"))))
        .withColumn("ico_n_images", F.when(is_ico, count).cast("long"))
        .withColumn("ico_best_w", F.col("__best.w").cast("long"))
        .withColumn("ico_best_h", F.col("__best.h").cast("long"))
        .withColumn("ico_best_bpp", F.col("__best.bpp").cast("long"))
        .withColumn(
            "ico_best_in_bounds",
            F.when(
                F.col("__best").isNotNull(),
                (F.col("__best.off") + F.col("__best.size")
                 <= F.length(b)).cast("int"),
            ))
        .drop("__best")
    )


def jpeg_scan_structure(
    imgs: DataFrame, bytes_col: str = "bytes",
) -> DataFrame:
    """JPEG scan structure — SOS scan count and DRI restart interval
    without decoding: baseline images have exactly one scan,
    progressive ones re-traverse the image across many (more scans =
    more decode passes = higher CPU per byte in the thumbnail fleet),
    and a nonzero restart interval is what makes a truncated transfer
    PARTIALLY recoverable (decoders resync at RSTn markers).  Extends
    the :func:`jpeg_sof_dims` walk past the first SOF: entropy-coded
    segments after each SOS are skipped by scanning for the next
    0xFF-marker that is not a stuffed 0xFF00 or RST.

    Arrow-batched pandas UDF.  Adds (jpeg_n_scans, jpeg_restart_interval,
    jpeg_has_eoi); NULL family for non-JPEG.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("scans int, dri long, eoi int")
    def scan(bs: pd.Series) -> pd.DataFrame:
        out = {"scans": [], "dri": [], "eoi": []}
        for b in bs:
            if b is None or len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
                out["scans"].append(None)
                out["dri"].append(None)
                out["eoi"].append(None)
                continue
            i, scans, dri, eoi = 2, 0, None, 0
            n = len(b)
            # 2-byte bound, not 4: EOI is a standalone marker that may
            # be the last two bytes of the stream
            while i + 2 <= n:
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker == 0xFF:
                    i += 1
                    continue
                if marker == 0xD9:
                    eoi = 1
                    break
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7 \
                        or marker == 0x01:
                    i += 2
                    continue
                if i + 4 > n:
                    break
                seglen = (b[i + 2] << 8) | b[i + 3]
                if seglen < 2:
                    break
                if marker == 0xDD and seglen >= 4 and i + 6 <= n:
                    dri = (b[i + 4] << 8) | b[i + 5]
                if marker == 0xDA:
                    scans += 1
                    # skip entropy-coded data to the next real marker
                    j = i + 2 + seglen
                    while j + 1 < n:
                        if b[j] == 0xFF and b[j + 1] != 0x00 \
                                and not (0xD0 <= b[j + 1] <= 0xD7):
                            break
                        j += 1
                    i = j
                    continue
                i += 2 + seglen
            out["scans"].append(scans)
            out["dri"].append(dri)
            out["eoi"].append(eoi)
        return pd.DataFrame({
            "scans": pd.array(out["scans"], dtype="Int32"),
            "dri": pd.array(out["dri"], dtype="Int64"),
            "eoi": pd.array(out["eoi"], dtype="Int32"),
        })

    g = imgs.withColumn("__s", scan(F.col(bytes_col)))
    return (
        g.withColumn("jpeg_n_scans", F.col("__s.scans"))
        .withColumn("jpeg_restart_interval", F.col("__s.dri"))
        .withColumn("jpeg_has_eoi", F.col("__s.eoi"))
        .drop("__s")
    )


def png_text_chunks(
    imgs: DataFrame, bytes_col: str = "bytes", max_chunks: int = 16,
) -> DataFrame:
    """PNG tEXt metadata extraction — Software/Author/Comment keywords
    embedded by editors are an attribution and provenance signal (and
    occasionally a PII leak) that survives pixel-level dedup; a
    curation pipeline reads them BEFORE stripping.  Spec 11.3.4:
    keyword, NUL, Latin-1 text inside each tEXt chunk.

    Same chunk walk as :func:`png_crc_check` (CRCs not re-verified
    here).  Adds png_texts: array<struct<key:string, value:string>>
    in chunk order (capped at ``max_chunks``), NULL for non-PNG;
    empty array for PNGs without tEXt.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sig = b"\x89PNG\r\n\x1a\n"

    @pandas_udf("array<struct<key string, value string>>")
    def scan(bs: pd.Series) -> pd.Series:
        res = []
        for b in bs:
            if b is None or len(b) < 8 or bytes(b[:8]) != sig:
                res.append(None)
                continue
            i, found = 8, []
            while i + 12 <= len(b) and len(found) < max_chunks:
                ln = int.from_bytes(b[i:i + 4], "big")
                if i + 12 + ln > len(b):
                    break
                typ = bytes(b[i + 4:i + 8])
                if typ == b"tEXt":
                    data = bytes(b[i + 8:i + 8 + ln])
                    k, _, v = data.partition(b"\x00")
                    found.append(
                        {"key": k.decode("latin1"),
                         "value": v.decode("latin1")})
                if typ == b"IEND":
                    break
                i += 12 + ln
            res.append(found)
        return pd.Series(res)

    return imgs.withColumn("png_texts", scan(F.col(bytes_col)))


def exif_datetime_scan(
    imgs: DataFrame, bytes_col: str = "bytes",
) -> DataFrame:
    """EXIF ``DateTimeOriginal`` extraction (tag 0x9003 in the Exif
    sub-IFD reached through IFD0's 0x8769 pointer) — capture-time is
    the temporal axis of an image corpus: dataset date histograms,
    stale-stock detection, and the privacy question of whether a
    "current events" caption sits on a years-old photo all read this
    one field.  Completes the EXIF walk family (orientation, GPS,
    IFD1 thumbnail) with the two-level IFD chase.

    Both byte orders; ASCII value (count incl. NUL) fetched at its
    offset when > 4 bytes, per TIFF 6.0 value packing.  Adds
    (exif_has_subifd, exif_datetime_original, exif_capture_year);
    NULL family for non-TIFF payloads.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("has int, dt string, yr int")
    def scan(bs: pd.Series) -> pd.DataFrame:
        out = {"has": [], "dt": [], "yr": []}
        for b in bs:
            has = dt = yr = None
            ok = (b is not None and len(b) >= 8
                  and b[:2] in (b"II", b"MM"))
            if ok:
                order = "little" if b[:2] == b"II" else "big"

                def rd(off, width):
                    if off is None or off + width > len(b):
                        return None
                    return int.from_bytes(b[off:off + width], order)

                if rd(2, 2) == 42:
                    ifd0 = rd(4, 4)
                    n0 = rd(ifd0, 2) if ifd0 is not None else None
                    sub = None
                    if n0 is not None:
                        for e in range(n0):
                            base = ifd0 + 2 + 12 * e
                            if rd(base, 2) == 0x8769:
                                sub = rd(base + 8, 4)
                                break
                    has = 1 if sub is not None else 0
                    if sub is not None:
                        n1 = rd(sub, 2)
                        if n1 is not None:
                            for e in range(n1):
                                base = sub + 2 + 12 * e
                                if rd(base, 2) == 0x9003:
                                    cnt = rd(base + 4, 4) or 0
                                    off = (rd(base + 8, 4)
                                           if cnt > 4 else base + 8)
                                    if off is not None \
                                            and off + cnt <= len(b):
                                        raw = bytes(
                                            b[off:off + cnt]
                                        ).split(b"\x00")[0]
                                        dt = raw.decode(
                                            "ascii", "replace")
                                        if len(dt) >= 4 \
                                                and dt[:4].isdigit():
                                            yr = int(dt[:4])
                                    break
            out["has"].append(has)
            out["dt"].append(dt)
            out["yr"].append(yr)
        return pd.DataFrame({
            "has": pd.array(out["has"], dtype="Int32"),
            "dt": out["dt"],
            "yr": pd.array(out["yr"], dtype="Int32"),
        })

    g = imgs.withColumn("__e", scan(F.col(bytes_col)))
    return (
        g.withColumn("exif_has_subifd", F.col("__e.has"))
        .withColumn("exif_datetime_original", F.col("__e.dt"))
        .withColumn("exif_capture_year", F.col("__e.yr"))
        .drop("__e")
    )


def pad_alignment_cost(
    imgs: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    align: int = 64,
) -> DataFrame:
    """GPU batch pad-alignment accounting: training kernels want
    dimensions in multiples of the tile size (64 for most conv/ViT
    patch pipelines), so every image pays (ceil(w/a)*a, ceil(h/a)*a)
    padded pixels — the waste share decides whether to crop-snap
    instead of pad, and summed over a corpus it is real GPU-hours.
    Pure integer expressions.  Adds (pad_w, pad_h, px, padded_px,
    waste_permille).
    """
    a = int(align)
    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    pw = (F.ceil(w / a) * a).cast("long")
    ph = (F.ceil(h / a) * a).cast("long")
    px = (w * h).cast("long")
    ppx = (pw * ph).cast("long")
    return (
        imgs.withColumn("pad_w", pw)
        .withColumn("pad_h", ph)
        .withColumn("px", px)
        .withColumn("padded_px", ppx)
        .withColumn(
            "waste_permille",
            F.when(px > 0, F.expr("(1000 * (padded_px - px)) div px")),
        )
    )


def resolution_family_fold(
    imgs: DataFrame,
    url_col: str = "image_url",
) -> DataFrame:
    """Resolution-ladder family folding — CMSes publish the same
    picture as ``hero-1920x1080.jpg``, ``hero-800x450.jpg``,
    ``hero-300w.jpg``: byte-level and even phash dedup see distinct
    files, but the corpus needs ONE family row (keep the largest, the
    rest are derivatives).  The family key strips the size suffix
    from the filename stem; the fold keeps per-family counts and the
    best declared resolution.

    Suffix forms handled: ``-WxH`` / ``_WxH`` / ``-Nw`` / ``@2x``
    before the extension.  One narrow map + one map-side-combined
    groupBy.  Returns (family_key, n_variants, best_w, best_url) —
    best_w NULL when no variant declares a width (all bare).
    """
    u = F.col(url_col)
    stem = F.regexp_extract(u, r"([^/?#]+?)(?:\.[A-Za-z0-9]+)?(?:[?#].*)?$", 1)
    dir_ = F.regexp_extract(u, r"^(.*/)[^/?#]*(?:[?#].*)?$", 1)
    base = F.regexp_replace(
        stem, r"(?i)(?:[-_]\d{2,5}x\d{2,5}|[-_]\d{2,5}w|@\dx)$", "")
    wxh = F.regexp_extract(stem, r"(?i)[-_](\d{2,5})x\d{2,5}$", 1)
    nw = F.regexp_extract(stem, r"(?i)[-_](\d{2,5})w$", 1)
    width = F.when(wxh != "", wxh.cast("long")) \
        .when(nw != "", nw.cast("long"))
    tagged = imgs.select(
        u.alias("image_url"),
        F.concat(dir_, base).alias("family_key"),
        width.alias("__w"),
    )
    return (
        tagged.groupBy("family_key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_variants"),
            F.max("__w").alias("best_w"),
            # struct tiebreak: equal widths resolve to the max url, so
            # the fold is deterministic under any partitioning
            F.max_by(
                "image_url",
                F.struct(F.coalesce("__w", F.lit(-1)).alias("w"),
                         F.col("image_url").alias("u")),
            ).alias("best_url"),
        )
    )


def declared_dims_mismatch(
    imgs: DataFrame,
    attr_w_col: str = "attr_w",
    attr_h_col: str = "attr_h",
    sniff_w_col: str = "sniff_w",
    sniff_h_col: str = "sniff_h",
    tolerance_permille: int = 0,
) -> DataFrame:
    """Declared-vs-actual dimension audit: the width/height attributes
    a page ships against the dimensions sniffed from the payload
    header.  Disagreement is a triple signal — layout shift on render,
    a CDN silently recompressing, or a srcset fallback serving the
    wrong variant — and for caption pipelines the DECLARED aspect
    ratio is what the author captioned, so a mismatch flags the pair.

    A NULL on either side is 'unverifiable', equal dims (within
    ``tolerance_permille`` per axis) 'match', same aspect ratio but
    different scale 'scaled' (CDN resize — usually benign), otherwise
    'mismatch'.  Aspect compare is integer cross-multiplication.
    Pure expressions.  Adds (dims_verdict).
    """
    aw = F.col(attr_w_col).cast("long")
    ah = F.col(attr_h_col).cast("long")
    sw = F.col(sniff_w_col).cast("long")
    sh = F.col(sniff_h_col).cast("long")
    tol = int(tolerance_permille)
    if tol == 0:
        eq = lambda a, b: a == b
    else:
        eq = lambda a, b: ((a - b) * 1000).between(-tol * b, tol * b)
    verdict = (
        F.when(aw.isNull() | ah.isNull() | sw.isNull() | sh.isNull(),
               F.lit("unverifiable"))
        .when(eq(aw, sw) & eq(ah, sh), F.lit("match"))
        .when(aw * sh == ah * sw, F.lit("scaled"))
        .otherwise(F.lit("mismatch"))
    )
    return imgs.withColumn("dims_verdict", verdict)


def png_chunk_inventory(
    imgs: DataFrame, bytes_col: str = "bytes", max_chunks: int = 32,
) -> DataFrame:
    """Generic PNG chunk inventory — one walk, every audit: the
    ordered (type, length) list answers questions the dedicated
    checkers (CRC, tEXt, color profile) each re-walk for — has tRNS
    transparency?  iCCP profile?  acTL animation?  oversized ancillary
    baggage before IDAT?  Emitting the inventory ONCE and letting
    audits run as array expressions is the columnar way to ask all of
    them.

    Adds png_chunks: array<struct<ctype:string, clen:long>> (capped at
    ``max_chunks``), NULL for non-PNG.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sig = b"\x89PNG\r\n\x1a\n"

    @pandas_udf("array<struct<ctype string, clen long>>")
    def scan(bs: pd.Series) -> pd.Series:
        res = []
        for b in bs:
            if b is None or len(b) < 8 or bytes(b[:8]) != sig:
                res.append(None)
                continue
            i, found = 8, []
            while i + 8 <= len(b) and len(found) < max_chunks:
                ln = int.from_bytes(b[i:i + 4], "big")
                typ = bytes(b[i + 4:i + 8]).decode("latin1")
                found.append({"ctype": typ, "clen": ln})
                if typ == "IEND" or i + 12 + ln > len(b):
                    break
                i += 12 + ln
            res.append(found)
        return pd.Series(res)

    return imgs.withColumn("png_chunks", scan(F.col(bytes_col)))


def dds_sniff(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """DDS texture sniffing ('DDS ' magic; height/width LE at fixed
    offsets, FourCC compression in the pixel-format block) — game
    asset stores and 3D-model sites serve these, and a multimodal
    crawler wants the compression family (DXT1/3/5, DX10 extended)
    without a texture decoder.  Pure JVM substring arithmetic.

    Adds (dds_height, dds_width, dds_mipmaps, dds_fourcc); NULL
    family for non-DDS.
    """
    b = F.col(bytes_col)
    is_dds = (
        (F.length(b) >= 128)
        & (F.hex(F.substring(b, 1, 4)) == "44445320")
    )
    height = _le32(b, 13)
    width = _le32(b, 17)
    mip = _le32(b, 29)
    fourcc = F.decode(F.substring(b, 85, 4), "ISO-8859-1")
    return (
        imgs.withColumn("dds_height", F.when(is_dds, height).cast("long"))
        .withColumn("dds_width", F.when(is_dds, width).cast("long"))
        .withColumn("dds_mipmaps", F.when(is_dds, mip).cast("long"))
        .withColumn(
            "dds_fourcc",
            F.when(is_dds & fourcc.rlike(r"^[A-Za-z0-9 ]{4}$"), fourcc))
    )


def ai_provenance_sniff(imgs: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Provenance screening for crawled images — the curation gate a
    training-data pipeline runs to keep (or route) AI-GENERATED images:

    - ``has_c2pa``: a C2PA/Content-Credentials manifest is present —
      JUMBF superbox ('jumb' box type with the 'c2pa' label) embedded
      in a JPEG APP11 segment, or a PNG 'caBX' chunk.  Detection is a
      byte-substring scan of the decoded (ISO-8859-1, lossless
      byte<->char) stream, NOT a full JUMBF box parse — disclosed
      heuristic, same discipline as the other sniffers here; a C2PA
      manifest also does NOT imply AI (cameras sign too), which is why
      it is reported separately from ``gen_tool``.
    - ``gen_tool``: the highest-priority generator watermark present in
      metadata text (PNG tEXt 'parameters' blocks, EXIF Software tags):
      Stable Diffusion / Midjourney / DALL-E / Adobe Firefly / NovelAI.
    - ``ai_flagged``: gen_tool present (the actionable routing bit).

    Pure JVM expressions (decode + instr/locate) — narrow map over the
    payload scan, no Python.  At 100 TB this fuses into the same pass
    as the magic-sniff/validation stage.
    """
    b = F.col(bytes_col)
    s = F.decode(b, "ISO-8859-1")
    is_jpeg = F.hex(F.substring(b, 1, 2)) == "FFD8"
    is_png = F.hex(F.substring(b, 1, 8)) == "89504E470D0A1A0A"
    app11 = F.instr(s, "\xff\xeb") > 0  # the APP11 marker bytes as latin-1 chars
    jumbf_c2pa = (F.instr(s, "jumb") > 0) & (F.instr(s, "c2pa") > 0)
    has_c2pa = (is_jpeg & app11 & jumbf_c2pa) | (is_png & (F.instr(s, "caBX") > 0))
    tools = [
        ("Stable Diffusion", "stable-diffusion"),
        ("Midjourney", "midjourney"),
        ("DALL-E", "dall-e"),
        ("DALL·E", "dall-e"),
        ("Adobe Firefly", "firefly"),
        ("NovelAI", "novelai"),
    ]
    gen = None
    for needle, label in reversed(tools):
        cond = F.instr(s, needle) > 0
        gen = F.when(cond, F.lit(label)) if gen is None else F.when(
            cond, F.lit(label)
        ).otherwise(gen)
    return imgs.withColumn("has_c2pa", has_c2pa) \
        .withColumn("gen_tool", gen) \
        .withColumn("ai_flagged", gen.isNotNull())


DECODE_GUARD_MAX_MEGAPIXELS = 50
DECODE_GUARD_MAX_EXPANSION = 1000


def decode_admission(
    imgs: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    nbytes_col: str = "n_bytes",
    max_megapixels: int = DECODE_GUARD_MAX_MEGAPIXELS,
    max_expansion: int = DECODE_GUARD_MAX_EXPANSION,
) -> DataFrame:
    """Decompression-bomb admission gate, run BEFORE any decode work is
    scheduled: header-declared dimensions (from the fixed-offset
    sniffers — sniff_header_dims / jpeg / webp) bound the decoded
    footprint at w*h*3 bytes, and two integer rules reject the
    pathological tails that take down decode executors at 10^10 images:

    - ``too_large``: w*h exceeds ``max_megapixels`` (a 4 GB RGB
      allocation from a 200-byte PNG header is the classic bomb);
    - ``suspicious_ratio``: decoded/encoded expansion above
      ``max_expansion`` — legitimate photos sit around 10-30x, crafted
      deflate bombs reach 10^6.

    All comparisons are integer cross-multiplications (no floats);
    NULL dims (sniffer couldn't parse) -> 'unsniffed' routing, never a
    silent admit.  Narrow map; fuses into the header-sniff pass.
    Adds (decoded_bytes_est, too_large, suspicious_ratio, admission).
    """
    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    nb = F.col(nbytes_col).cast("long")
    too_large = (w * h) > max_megapixels * 1_000_000
    ratio_bad = (w * h * 3) > (max_expansion * F.greatest(nb, F.lit(1)))
    admission = (
        F.when(w.isNull() | h.isNull(), F.lit("unsniffed"))
        .when(too_large, F.lit("reject_too_large"))
        .when(ratio_bad, F.lit("reject_expansion"))
        .otherwise(F.lit("admit"))
    )
    return (
        imgs.withColumn("decoded_bytes_est", (w * h * 3))
        .withColumn("too_large", F.coalesce(too_large, F.lit(False)))
        .withColumn("suspicious_ratio", F.coalesce(ratio_bad, F.lit(False)))
        .withColumn("admission", admission)
    )


IMAGE_STATS_SCHEMA = (
    "image_id STRING, mean_permille LONG, contrast_permille LONG, "
    "sharpness_permille LONG, entropy_millibits LONG"
)


def image_pixel_stats(
    images: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Per-image pixel statistics for curation filters over raw RGB rows
    (w*h*3 uint8): mean intensity, contrast (population std), sharpness
    (mean |4-neighbour Laplacian| over the grayscale interior — the
    classic blur detector: near 0 on flat/defocused images), and byte
    entropy in millibits (information content; a solid color is 0, a
    uniform 256-value histogram is 8000).  A training-data pipeline cuts
    on these before paying for captioning/embedding: too dark, too flat,
    too blurry, or too empty.

    Complements :func:`image_quality_stats` (which decodes the fake-codec
    payloads and reads sharp-energy/entropy/dominant-colour gates): this
    variant consumes RAW RGB rows and reports the mean/contrast moments
    those gates don't.  All outputs are floor(x*1000) fixed-point LONGs
    so the DuckDB oracle replays them exactly on planted closed-form
    shapes.  One
    mapInPandas stage, numpy-vectorized per image (no per-pixel Python);
    narrow map, no shuffle — at 10^10 rows this rides the same
    partitioning as the image table scan.  (The reference crawler has no
    pixel ops; this is the training-data addendum beside
    validate_images.)
    """

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                w, h = int(getattr(r, w_col)), int(getattr(r, h_col))
                px = np.frombuffer(
                    bytes(getattr(r, bytes_col)), dtype=np.uint8
                ).reshape(h, w, 3).astype(np.float64)
                gray = px.mean(axis=2)
                mean = float(gray.mean())
                std = float(gray.std())
                if h >= 3 and w >= 3:
                    lap = (
                        gray[:-2, 1:-1] + gray[2:, 1:-1]
                        + gray[1:-1, :-2] + gray[1:-1, 2:]
                        - 4 * gray[1:-1, 1:-1]
                    )
                    sharp = float(np.abs(lap).mean())
                else:
                    sharp = 0.0
                counts = np.bincount(
                    np.frombuffer(bytes(getattr(r, bytes_col)),
                                  dtype=np.uint8),
                    minlength=256,
                ).astype(np.float64)
                p = counts[counts > 0] / counts.sum()
                ent = float(-(p * np.log2(p)).sum())
                rows.append({
                    "image_id": getattr(r, id_col),
                    "mean_permille": int(np.floor(mean * 1000)),
                    "contrast_permille": int(np.floor(std * 1000)),
                    "sharpness_permille": int(np.floor(sharp * 1000)),
                    "entropy_millibits": int(np.floor(ent * 1000)),
                })
            yield pd.DataFrame(rows)

    return images.mapInPandas(stats, IMAGE_STATS_SCHEMA)
